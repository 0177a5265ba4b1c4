"""Row gathers via one-hot matmul.

Per-lane gathers (``table[idx]``) are the TPU wavefront renderer's silent
tax: XLA lowers them to serial-ish dynamic-gathers (~1 element/cycle), so
nine 3-wide attribute gathers over a 262k wavefront cost ~6 ms — more
than the intersection sweep itself. For SMALL tables the MXU does the
same job for free: build a one-hot (N, T) matrix from an iota compare and
matmul it with the (T, C) table. At HIGHEST precision the result is
bit-exact (each output row is 1.0 * row + zeros) and the compare+matmul
fuse, so nothing big is materialized in HBM. Measured: 9 fused gathers
5.9 ms -> one-hot matmul under 0.05 ms at N=262k, T=38.

Only worth it on TPU and only for small T — large tables stream too much
MXU traffic (N*T). CPU native gathers are fast; keep them there.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# beyond this many rows the N*T one-hot traffic outweighs the gather cost
ONEHOT_MAX_ROWS = 512


def _use_onehot(n_rows: int) -> bool:
    return (0 < n_rows <= ONEHOT_MAX_ROWS
            and jax.default_backend() == 'tpu')


def take_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``table[idx]`` for a (T, C) or (T,) table and (N,) int indices.
    Exact (HIGHEST-precision one-hot matmul) on TPU for small tables,
    native gather otherwise. Out-of-range indices are clamped (matching
    jnp's TPU gather behavior)."""
    squeeze = table.ndim == 1
    tab = table[:, None] if squeeze else table
    T = tab.shape[0]
    if not _use_onehot(T):
        out = tab[idx]
        return out[..., 0] if squeeze else out
    idx = jnp.clip(idx, 0, T - 1)
    oh = (idx[:, None] == jnp.arange(T, dtype=idx.dtype)[None, :]) \
        .astype(jnp.float32)
    isint = jnp.issubdtype(tab.dtype, jnp.integer)
    src = tab.astype(jnp.float32)
    out = jax.lax.dot(oh, src, precision=jax.lax.Precision.HIGHEST)
    if isint:
        # integer payloads (ids < 2^24) survive the f32 path exactly
        out = jnp.round(out).astype(tab.dtype)
    return out[..., 0] if squeeze else out


def take_many(tables, idx):
    """Gather several (T, Ci)/(T,) tables that share one index array with
    a single fused one-hot matmul. Returns views split per table."""
    tabs = [t[:, None] if t.ndim == 1 else t for t in tables]
    T = tabs[0].shape[0]
    if not _use_onehot(T) or any(t.shape[0] != T for t in tabs):
        outs = [take_rows(t, idx) for t in tables]
        return outs
    anyint = any(jnp.issubdtype(t.dtype, jnp.integer) for t in tabs)
    big = jnp.concatenate([t.astype(jnp.float32) for t in tabs], axis=1)
    idx = jnp.clip(idx, 0, T - 1)
    oh = (idx[:, None] == jnp.arange(T, dtype=idx.dtype)[None, :]) \
        .astype(jnp.float32)
    out = jax.lax.dot(oh, big, precision=jax.lax.Precision.HIGHEST)
    res = []
    c = 0
    for orig, t in zip(tables, tabs):
        w = t.shape[1]
        piece = out[:, c:c + w]
        if jnp.issubdtype(t.dtype, jnp.integer):
            piece = jnp.round(piece).astype(t.dtype)
        res.append(piece[:, 0] if orig.ndim == 1 else piece)
        c += w
    return res


def onehot_dot(idx: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """``table[idx]`` as an explicit one-hot matmul with NO row cap.

    ``take_rows``' ONEHOT_MAX_ROWS=512 heuristic is about FAT tables
    (many columns), where the (N, T) x (T, C) MXU traffic overtakes the
    native gather. For NARROW tables (C small — e.g. the hierarchical
    lightcut's (F, 5M) member rows with F~1024, 5M~40) the dot stays
    cheap far beyond 512 rows: the one-hot operand is a fused
    iota-compare (never materialized in HBM) and the output is only
    (N, C). Exact at HIGHEST precision; int payloads < 2^24 survive the
    f32 path bit-exactly. Used on TPU; falls back to a native gather on
    CPU where gathers are fast."""
    squeeze = table.ndim == 1
    tab = table[:, None] if squeeze else table
    T = tab.shape[0]
    if jax.default_backend() != 'tpu':
        out = tab[jnp.clip(idx, 0, T - 1)]
        return out[..., 0] if squeeze else out
    idx = jnp.clip(idx, 0, T - 1)
    oh = (idx[:, None] == jnp.arange(T, dtype=idx.dtype)[None, :]) \
        .astype(jnp.float32)
    isint = jnp.issubdtype(tab.dtype, jnp.integer)
    out = jax.lax.dot(oh, tab.astype(jnp.float32),
                      precision=jax.lax.Precision.HIGHEST)
    if isint:
        out = jnp.round(out).astype(tab.dtype)
    return out[..., 0] if squeeze else out


def select_channel(spec: jnp.ndarray, channel: jnp.ndarray) -> jnp.ndarray:
    """Per-lane channel pick from (..., C) via one-hot masked reduce.
    ``take_along_axis`` lowers to a serial dynamic-gather on TPU (~2ms per
    call at 262k lanes even for C=3); the masked reduce is free VPU work."""
    C = spec.shape[-1]
    oh = jnp.arange(C) == channel[..., None]
    return jnp.sum(jnp.where(oh, spec, 0.0), axis=-1)


def select_row(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Per-lane row pick from (N, S) or (N, S, D) along axis 1 by (N,)
    indices — the one-hot form of take_along_axis for small S."""
    S = arr.shape[1]
    oh = jnp.arange(S) == idx[:, None]
    if arr.ndim == 3:
        return jnp.sum(jnp.where(oh[:, :, None], arr, 0.0), axis=1)
    return jnp.sum(jnp.where(oh, arr, 0.0), axis=1)
