"""Marginal 2D distributions over bilinear-interpolant grids.

TPU-native rebuild of the reference ``Marginal2D<Float, Dimension, true>``
(include/mitsuba/core/distr_2d.h:818-1436, the *continuous* variant used
by the measured BSDF): a 2D density given by bilinear interpolation of an
(h, w) grid, optionally conditioned on up to 3 extra parameters whose
slices are linearly interpolated. Supports ``sample`` (inverse-CDF warp of
a uniform square sample), ``invert`` (its exact inverse), and ``eval``.

Construction happens host-side in numpy, vectorized over all parameter
slices at once (the C++ per-slice loops at distr_2d.h:885-946 become array
cumsums); the sampling/eval functions are wavefront jnp with fixed-trip
binary searches and 2^D-corner parameter interpolation (the ``lookup``
recursion at distr_2d.h:1068-1087 unrolled).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax.numpy as jnp

from . import math as m


class Marginal2D(NamedTuple):
    data: jnp.ndarray        # (S, h, w) densities (normalized per slice)
    marg_cdf: jnp.ndarray    # (S, h-1)
    cond_cdf: jnp.ndarray    # (S, h, w-1)
    param_values: Tuple[jnp.ndarray, ...]   # D arrays of slice coordinates

    @property
    def h(self):
        return self.data.shape[1]

    @property
    def w(self):
        return self.data.shape[2]


def build(data: np.ndarray, param_values=(), normalize: bool = True
          ) -> Marginal2D:
    """data: (*param_res, h, w) densities. param_values: one coordinate
    array per leading axis."""
    param_values = tuple(np.asarray(p, np.float32) for p in param_values)
    h, w = data.shape[-2], data.shape[-1]
    d = np.asarray(data, np.float64).reshape(-1, h, w)
    scale_x = 0.5 / (w - 1)
    scale_y = 0.5 / (h - 1)
    cond = np.cumsum(scale_x * (d[:, :, :-1] + d[:, :, 1:]), axis=2)
    sums = cond[:, :, -1]                                    # (S, h)
    marg = np.cumsum(scale_y * (sums[:, :-1] + sums[:, 1:]), axis=1)
    if normalize:
        norm = 1.0 / np.maximum(marg[:, -1:], 1e-30)         # (S, 1)
        d = d * norm[:, :, None]
        cond = cond * norm[:, :, None]
        marg = marg * norm
    return Marginal2D(
        data=jnp.asarray(d, jnp.float32),
        marg_cdf=jnp.asarray(marg, jnp.float32),
        cond_cdf=jnp.asarray(cond, jnp.float32),
        param_values=tuple(jnp.asarray(p) for p in param_values))


def _param_setup(dist: Marginal2D, params):
    """Per-dim bracketing indices and lerp weights (distr_2d.h:242-280).
    Returns (idx list, weight-pair list, strides list)."""
    D = len(dist.param_values)
    assert len(params) == D, "parameter count mismatch"
    idxs, wts = [], []
    strides = []
    stride = 1
    res = [int(p.shape[0]) for p in dist.param_values]
    for n in reversed(res):
        strides.insert(0, stride)
        stride *= n
    for dim in range(D):
        pv = dist.param_values[dim]
        n = res[dim]
        if n == 1:
            idxs.append(jnp.zeros_like(jnp.asarray(params[dim],
                                                   jnp.int32)))
            wts.append((1.0, 0.0))
            continue
        x = jnp.asarray(params[dim], jnp.float32)
        i = jnp.clip(jnp.searchsorted(pv, x, side='right') - 1, 0, n - 2)
        p0 = pv[i]
        p1 = pv[i + 1]
        w1 = jnp.clip((x - p0) / jnp.maximum(p1 - p0, 1e-20), 0.0, 1.0)
        idxs.append(i)
        wts.append((1.0 - w1, w1))
    return idxs, wts, strides


def _corners(idxs, wts, strides):
    """Unrolled 2^D slice (index, weight) pairs."""
    D = len(idxs)
    out = [(0, 1.0)] if D == 0 else []
    if D == 0:
        return out
    for corner in range(1 << D):
        sidx = 0
        wgt = 1.0
        for dim in range(D):
            bit = (corner >> dim) & 1
            sidx = sidx + (idxs[dim] + bit) * strides[dim]
            wgt = wgt * wts[dim][bit]
        out.append((sidx, wgt))
    return out


def _mk_lookup(corners):
    """lookup(arr, *inner_idx): parameter-interpolated gather."""
    def lookup(arr, *inner):
        outv = 0.0
        for sidx, wgt in corners:
            outv = outv + wgt * arr[(sidx,) + inner]
        return outv
    return lookup


def _sample_segment(sample, inv_width, v0, v1):
    """distr_2d.h:1408-1417."""
    non_const = jnp.abs(v0 - v1) > 1e-4 * (v0 + v1)
    divisor = jnp.where(non_const, v0 - v1, v0 + v1)
    s = sample * 2.0 * inv_width
    s = jnp.where(non_const, v0 - m.safe_sqrt(v0 * v0 + s * (v1 - v0)), s)
    return jnp.where(divisor != 0.0, s / jnp.where(divisor != 0.0, divisor,
                                                   1.0), s)


def _invert_segment(sample, width, v0, v1):
    """distr_2d.h:1419-1421."""
    return sample * ((1.0 - 0.5 * sample) * v0 + 0.5 * sample * v1) * width


def _binary_search(n, pred):
    """enoki::binary_search analog: first index in [0, n-1] where pred is
    False (pred must be monotone). Fixed trip count for jit."""
    lo = None
    hi = None

    def step(lo, hi):
        mid = (lo + hi) >> 1
        go = pred(mid)
        return jnp.where(go, mid + 1, lo), jnp.where(go, hi, mid)

    # initialized per-call in sample/invert with (N,) arrays
    def run(lo0, hi0):
        lo, hi = lo0, hi0
        for _ in range(int(np.ceil(np.log2(max(n, 2)))) + 1):
            cont = lo < hi
            mid = (lo + hi) >> 1
            go = pred(mid) & cont
            lo = jnp.where(go, mid + 1, lo)
            hi = jnp.where(cont & ~go, mid, hi)
        return lo
    return run


def sample(dist: Marginal2D, u2, params=()):
    """Warp uniform (N, 2) samples; returns (pos (N, 2) in [0,1]^2,
    pdf (N,)) — distr_2d.h:1240-1328 sample_continuous."""
    idxs, wts, strides = _param_setup(dist, params)
    lookup = _mk_lookup(_corners(idxs, wts, strides))
    h, w = dist.h, dist.w
    n_marg = h - 1
    sx = jnp.clip(u2[..., 0], 1e-6, 1.0 - 1e-6)
    sy = jnp.clip(u2[..., 1], 1e-6, 1.0 - 1e-6)

    def fetch_marginal(idx):
        return lookup(dist.marg_cdf, idx)

    row = _binary_search(n_marg, lambda i: fetch_marginal(
        jnp.clip(i, 0, n_marg - 1)) < sy)(
            jnp.zeros_like(sy, jnp.int32),
            jnp.full(sy.shape, n_marg - 1, jnp.int32))
    sy = sy - jnp.where(row > 0, fetch_marginal(jnp.maximum(row - 1, 0)),
                        0.0)
    r0 = lookup(dist.cond_cdf, row, w - 2)
    r1 = lookup(dist.cond_cdf, row + 1, w - 2)
    sy = _sample_segment(sy, float(h - 1), r0, r1)
    sx = sx * ((1.0 - sy) * r0 + sy * r1)

    def fetch_conditional(idx):
        v0 = lookup(dist.cond_cdf, row, idx)
        v1 = lookup(dist.cond_cdf, row + 1, idx)
        return (1.0 - sy) * v0 + sy * v1

    col = _binary_search(w - 1, lambda i: fetch_conditional(
        jnp.clip(i, 0, w - 2)) < sx)(
            jnp.zeros_like(sx, jnp.int32),
            jnp.full(sx.shape, w - 2, jnp.int32))
    sx = sx - jnp.where(col > 0, fetch_conditional(jnp.maximum(col - 1, 0)),
                        0.0)

    v00 = lookup(dist.data, row, col)
    v10 = lookup(dist.data, row, col + 1)
    v01 = lookup(dist.data, row + 1, col)
    v11 = lookup(dist.data, row + 1, col + 1)
    c0 = (1.0 - sy) * v00 + sy * v01
    c1 = (1.0 - sy) * v10 + sy * v11
    sx = _sample_segment(sx, float(w - 1), c0, c1)
    pdf = (1.0 - sx) * c0 + sx * c1
    pos = jnp.stack([(col + sx) / (w - 1), (row + sy) / (h - 1)], axis=-1)
    return pos, pdf


def invert(dist: Marginal2D, pos, params=()):
    """Inverse of ``sample``: (N, 2) warped position -> (uniform sample,
    pdf) — distr_2d.h:1330-1406 invert_continuous."""
    idxs, wts, strides = _param_setup(dist, params)
    lookup = _mk_lookup(_corners(idxs, wts, strides))
    h, w = dist.h, dist.w
    px = jnp.clip(pos[..., 0], 0.0, 1.0) * (w - 1)
    py = jnp.clip(pos[..., 1], 0.0, 1.0) * (h - 1)
    col = jnp.clip(px.astype(jnp.int32), 0, w - 2)
    row = jnp.clip(py.astype(jnp.int32), 0, h - 2)
    fx = px - col
    fy = py - row

    v00 = lookup(dist.data, row, col)
    v10 = lookup(dist.data, row, col + 1)
    v01 = lookup(dist.data, row + 1, col)
    v11 = lookup(dist.data, row + 1, col + 1)
    c0 = (1.0 - fy) * v00 + fy * v01
    c1 = (1.0 - fy) * v10 + fy * v11
    pdf = (1.0 - fx) * c0 + fx * c1

    sx = _invert_segment(fx, 1.0 / (w - 1), c0, c1)

    def fetch_conditional(idx):
        v0 = lookup(dist.cond_cdf, row, idx)
        v1 = lookup(dist.cond_cdf, row + 1, idx)
        return (1.0 - fy) * v0 + fy * v1

    sx = sx + jnp.where(col > 0, fetch_conditional(jnp.maximum(col - 1, 0)),
                        0.0)
    r0 = lookup(dist.cond_cdf, row, w - 2)
    r1 = lookup(dist.cond_cdf, row + 1, w - 2)
    sx = sx / jnp.maximum((1.0 - fy) * r0 + fy * r1, 1e-20)
    sy = _invert_segment(fy, 1.0 / (h - 1), r0, r1)
    sy = sy + jnp.where(row > 0, lookup(dist.marg_cdf,
                                        jnp.maximum(row - 1, 0)), 0.0)
    return jnp.stack([sx, sy], axis=-1), pdf


def eval(dist: Marginal2D, pos, params=()):
    """Interpolated density at pos (N, 2) — distr_2d.h:1004-1040."""
    idxs, wts, strides = _param_setup(dist, params)
    lookup = _mk_lookup(_corners(idxs, wts, strides))
    h, w = dist.h, dist.w
    px = jnp.clip(pos[..., 0], 0.0, 1.0) * (w - 1)
    py = jnp.clip(pos[..., 1], 0.0, 1.0) * (h - 1)
    col = jnp.clip(px.astype(jnp.int32), 0, w - 2)
    row = jnp.clip(py.astype(jnp.int32), 0, h - 2)
    fx = px - col
    fy = py - row
    v00 = lookup(dist.data, row, col)
    v10 = lookup(dist.data, row, col + 1)
    v01 = lookup(dist.data, row + 1, col)
    v11 = lookup(dist.data, row + 1, col + 1)
    return ((1.0 - fy) * ((1.0 - fx) * v00 + fx * v10)
            + fy * ((1.0 - fx) * v01 + fx * v11))


# --- Hierarchical2D (mip-pyramid sample warping) ------------------------------
#
# TPU-native rebuild of the reference ``Hierarchical2D<Float, Dim>``
# (include/mitsuba/core/distr_2d.h:335-817): the same bilinear-interpolant
# density as Marginal2D, but sampled by a coarse-to-fine MIP traversal with
# very little shear (the envmap's warp, src/emitters/envmap.cpp:67,123).
# Levels are plain row-major (S, h, w) arrays with a leading parameter-
# slice axis — the reference's interleaved 2x2 memory layout
# (distr_2d.h:738-751) is a CPU cache optimization that XLA's gathers
# don't need. The descent is a statically unrolled loop (level count is a
# build-time fact), all lanes in lockstep; conditioning parameters
# interpolate 2^D corner slices at every lookup, like the reference's
# Dim > 0 instantiations (bound as Hierarchical2D1/2,
# src/libcore/python/distr_2d_v.cpp:107-109).


class Hierarchical2D(NamedTuple):
    nodes: jnp.ndarray                # (S, h, w) normalized node values
    levels: Tuple[jnp.ndarray, ...]   # coarsest (<=2x2) ... finest patches
    param_values: Tuple[jnp.ndarray, ...] = ()   # D slice coordinate arrays


def build_hierarchical(data: np.ndarray, param_values=(),
                       normalize: bool = True) -> Hierarchical2D:
    """data: (*param_res, h, w) node values of the bilinear interpolant,
    one slice per conditioning-parameter grid point. Normalizes each slice
    so its interpolant integrates to 1 over the unit square
    (distr_2d.h:372-466)."""
    param_values = tuple(np.asarray(p, np.float32) for p in param_values)
    dd = np.asarray(data, np.float64)
    h, w = dd.shape[-2], dd.shape[-1]
    d = dd.reshape(-1, h, w)
    ph, pw = max(h - 1, 1), max(w - 1, 1)
    if h < 2 or w < 2:          # degenerate 1-node axis: constant density
        d = np.pad(d, ((0, 0), (0, 2 - h if h < 2 else 0),
                       (0, 2 - w if w < 2 else 0)), mode='edge')
        h, w = d.shape[1:]
        ph, pw = h - 1, w - 1
    patch = 0.25 * (d[:, :-1, :-1] + d[:, :-1, 1:]
                    + d[:, 1:, :-1] + d[:, 1:, 1:])
    if normalize:
        scale = (ph * pw) / np.maximum(
            patch.sum(axis=(1, 2), keepdims=True), 1e-30)
    else:
        scale = np.ones((d.shape[0], 1, 1))
    nodes = d * scale
    levels = []
    cur = patch * scale
    while True:
        hp = cur.shape[1] + (cur.shape[1] & 1)
        wp = cur.shape[2] + (cur.shape[2] & 1)
        padded = np.zeros((cur.shape[0], hp, wp))
        padded[:, :cur.shape[1], :cur.shape[2]] = cur
        levels.append(padded)
        if hp <= 2 and wp <= 2:
            break
        cur = (padded[:, 0::2, 0::2] + padded[:, 0::2, 1::2]
               + padded[:, 1::2, 0::2] + padded[:, 1::2, 1::2])
    return Hierarchical2D(
        nodes=jnp.asarray(nodes, jnp.float32),
        levels=tuple(jnp.asarray(l, jnp.float32) for l in reversed(levels)),
        param_values=tuple(jnp.asarray(p) for p in param_values))


def _interval_to_linear(v0, v1, s):
    """Inverse CDF of the density lerp(v0, v1, t) on [0, 1]
    (warp.h:360-366)."""
    non_const = jnp.abs(v0 - v1) > 1e-4 * (v0 + v1)
    num = v0 - m.safe_sqrt((1.0 - s) * v0 * v0 + s * v1 * v1)
    den = jnp.where(non_const, v0 - v1, 1.0)
    return jnp.where(non_const, num / den, s)


def _linear_to_interval(v0, v1, t):
    """Inverse of _interval_to_linear (warp.h:370-376)."""
    non_const = jnp.abs(v0 - v1) > 1e-4 * (v0 + v1)
    den = jnp.where(non_const, v0 + v1, 1.0)
    return jnp.where(non_const, t * ((2.0 - t) * v0 + t * v1) / den, t)


def _mk_block(lookup):
    """2x2 child block at (2oy, 2ox) with parameter-slice interpolation;
    JAX index clamping keeps the reads in range on padded odd tails (pad
    cells are zero so they are never selected)."""
    def block(L, oy, ox):
        y, x = 2 * oy, 2 * ox
        return (lookup(L, y, x), lookup(L, y, x + 1),
                lookup(L, y + 1, x), lookup(L, y + 1, x + 1))
    return block


def sample_hierarchical(dist: Hierarchical2D, u2, params=()):
    """Hierarchical sample warping (distr_2d.h:470-565): returns
    (pos (N, 2) in [0, 1]^2, pdf) — the pdf is the unit-square density."""
    idxs, wts, strides = _param_setup(dist, params)
    lookup = _mk_lookup(_corners(idxs, wts, strides))
    _block = _mk_block(lookup)
    sx = jnp.clip(u2[..., 0], 0.0, 1.0)
    sy = jnp.clip(u2[..., 1], 0.0, 1.0)
    ox = jnp.zeros(sx.shape, jnp.int32)
    oy = jnp.zeros(sx.shape, jnp.int32)
    for L in dist.levels:                       # coarsest -> finest patches
        v00, v10, v01, v11 = _block(L, oy, ox)
        r0, r1 = v00 + v10, v01 + v11
        sy = sy * (r0 + r1)
        my = sy > r0
        oy = 2 * oy + my
        sy = jnp.where(my, sy - r0, sy) \
            / jnp.maximum(jnp.where(my, r1, r0), 1e-30)
        c0 = jnp.where(my, v01, v00)
        c1 = jnp.where(my, v11, v10)
        sx = sx * (c0 + c1)
        mx = sx > c0
        ox = 2 * ox + mx
        sx = jnp.where(mx, sx - c0, sx) \
            / jnp.maximum(jnp.where(mx, c1, c0), 1e-30)
        sx = jnp.clip(sx, 0.0, 1.0)
        sy = jnp.clip(sy, 0.0, 1.0)
    h, w = dist.nodes.shape[1:]
    ox = jnp.minimum(ox, w - 2)
    oy = jnp.minimum(oy, h - 2)
    v00 = lookup(dist.nodes, oy, ox)
    v10 = lookup(dist.nodes, oy, ox + 1)
    v01 = lookup(dist.nodes, oy + 1, ox)
    v11 = lookup(dist.nodes, oy + 1, ox + 1)
    # square_to_bilinear (warp.h:393-407)
    sy = _interval_to_linear(v00 + v10, v01 + v11, sy)
    c0 = v00 + sy * (v01 - v00)
    c1 = v10 + sy * (v11 - v10)
    sx = _interval_to_linear(c0, c1, sx)
    pdf = c0 + sx * (c1 - c0)
    pos = jnp.stack([(ox + sx) / (w - 1), (oy + sy) / (h - 1)], axis=-1)
    return pos, pdf


def invert_hierarchical(dist: Hierarchical2D, pos, params=()):
    """Exact inverse of sample_hierarchical (distr_2d.h:567-646):
    returns (u2, pdf)."""
    idxs, wts, strides = _param_setup(dist, params)
    lookup = _mk_lookup(_corners(idxs, wts, strides))
    _block = _mk_block(lookup)
    h, w = dist.nodes.shape[1:]
    px = jnp.clip(pos[..., 0], 0.0, 1.0) * (w - 1)
    py = jnp.clip(pos[..., 1], 0.0, 1.0) * (h - 1)
    ox = jnp.clip(px.astype(jnp.int32), 0, w - 2)
    oy = jnp.clip(py.astype(jnp.int32), 0, h - 2)
    sx = px - ox
    sy = py - oy
    v00 = lookup(dist.nodes, oy, ox)
    v10 = lookup(dist.nodes, oy, ox + 1)
    v01 = lookup(dist.nodes, oy + 1, ox)
    v11 = lookup(dist.nodes, oy + 1, ox + 1)
    # bilinear_to_square (warp.h:410-426)
    c0 = v00 + sy * (v01 - v00)
    c1 = v10 + sy * (v11 - v10)
    pdf = c0 + sx * (c1 - c0)
    sx = _linear_to_interval(c0, c1, sx)
    sy = _linear_to_interval(v00 + v10, v01 + v11, sy)
    for L in reversed(dist.levels):            # finest patches -> coarsest
        v00, v10, v01, v11 = _block(L, oy >> 1, ox >> 1)
        xm = (ox & 1) > 0
        ym = (oy & 1) > 0
        r0, r1 = v00 + v10, v01 + v11
        c0 = jnp.where(ym, v01, v00)
        c1 = jnp.where(ym, v11, v10)
        sy = sy * jnp.where(ym, r1, r0) + jnp.where(ym, r0, 0.0)
        sy = sy / jnp.maximum(r0 + r1, 1e-30)
        sx = sx * jnp.where(xm, c1, c0) + jnp.where(xm, c0, 0.0)
        sx = sx / jnp.maximum(c0 + c1, 1e-30)
        sx = jnp.clip(sx, 0.0, 1.0)
        sy = jnp.clip(sy, 0.0, 1.0)
        ox = ox >> 1
        oy = oy >> 1
    return jnp.stack([sx, sy], axis=-1), pdf


def eval_hierarchical(dist: Hierarchical2D, pos, params=()):
    """Unit-square density at pos (distr_2d.h:648-686)."""
    idxs, wts, strides = _param_setup(dist, params)
    lookup = _mk_lookup(_corners(idxs, wts, strides))
    h, w = dist.nodes.shape[1:]
    px = jnp.clip(pos[..., 0], 0.0, 1.0) * (w - 1)
    py = jnp.clip(pos[..., 1], 0.0, 1.0) * (h - 1)
    ox = jnp.clip(px.astype(jnp.int32), 0, w - 2)
    oy = jnp.clip(py.astype(jnp.int32), 0, h - 2)
    fx = px - ox
    fy = py - oy
    v00 = lookup(dist.nodes, oy, ox)
    v10 = lookup(dist.nodes, oy, ox + 1)
    v01 = lookup(dist.nodes, oy + 1, ox)
    v11 = lookup(dist.nodes, oy + 1, ox + 1)
    return ((1.0 - fy) * ((1.0 - fx) * v00 + fx * v10)
            + fy * ((1.0 - fx) * v01 + fx * v11))


# --- Marginal2D, discrete variant ---------------------------------------------
#
# ``Marginal2D<Float, Dim, false>`` (distr_2d.h:805-818,913-938): discrete
# row/column PATCH selection by CDF over bilinear-patch integrals, then an
# exact square_to_bilinear warp inside the chosen patch (the continuous
# variant instead interpolates neighboring CDF rows). Bound in the
# reference as MarginalDiscrete2D0..3 (distr_2d_v.cpp:116-119).


class Marginal2DDiscrete(NamedTuple):
    data: jnp.ndarray        # (S, h, w) densities (normalized per slice)
    marg_cdf: jnp.ndarray    # (S, h-1) row-patch CDF
    cond_cdf: jnp.ndarray    # (S, h-1, w-1) per-row patch CDF
    param_values: Tuple[jnp.ndarray, ...]

    @property
    def h(self):
        return self.data.shape[1]

    @property
    def w(self):
        return self.data.shape[2]


def build_discrete(data: np.ndarray, param_values=(), normalize: bool = True
                   ) -> Marginal2DDiscrete:
    """data: (*param_res, h, w) node values."""
    param_values = tuple(np.asarray(p, np.float32) for p in param_values)
    h, w = data.shape[-2], data.shape[-1]
    d = np.asarray(data, np.float64).reshape(-1, h, w)
    scale = 0.25 / ((w - 1) * (h - 1))
    patch = scale * (d[:, :-1, :-1] + d[:, :-1, 1:]
                     + d[:, 1:, :-1] + d[:, 1:, 1:])      # (S, h-1, w-1)
    cond = np.cumsum(patch, axis=2)
    marg = np.cumsum(cond[:, :, -1], axis=1)
    if normalize:
        norm = 1.0 / np.maximum(marg[:, -1:], 1e-30)
        d = d * norm[:, :, None]
        cond = cond * norm[:, :, None]
        marg = marg * norm
    return Marginal2DDiscrete(
        data=jnp.asarray(d, jnp.float32),
        marg_cdf=jnp.asarray(marg, jnp.float32),
        cond_cdf=jnp.asarray(cond, jnp.float32),
        param_values=tuple(jnp.asarray(p) for p in param_values))


def sample_discrete(dist: Marginal2DDiscrete, u2, params=()):
    """(pos (N, 2) in [0,1]^2, pdf) — distr_2d.h sample_discrete."""
    idxs, wts, strides = _param_setup(dist, params)
    lookup = _mk_lookup(_corners(idxs, wts, strides))
    h, w = dist.h, dist.w
    n_marg = h - 1
    sx = jnp.clip(u2[..., 0], 1e-6, 1.0 - 1e-6)
    sy = jnp.clip(u2[..., 1], 1e-6, 1.0 - 1e-6)

    def fetch_marg(idx):
        return lookup(dist.marg_cdf, idx)

    row = _binary_search(n_marg, lambda i: fetch_marg(
        jnp.clip(i, 0, n_marg - 1)) < sy)(
            jnp.zeros_like(sy, jnp.int32),
            jnp.full(sy.shape, n_marg - 1, jnp.int32))
    cdf0 = jnp.where(row > 0, fetch_marg(jnp.maximum(row - 1, 0)), 0.0)
    cdf1 = fetch_marg(row)
    sy = (sy - cdf0) * m.safe_rcp(cdf1 - cdf0)

    def fetch_cond(idx):
        return lookup(dist.cond_cdf, row, idx)

    sx = sx * fetch_cond(w - 2)
    col = _binary_search(w - 1, lambda i: fetch_cond(
        jnp.clip(i, 0, w - 2)) < sx)(
            jnp.zeros_like(sx, jnp.int32),
            jnp.full(sx.shape, w - 2, jnp.int32))
    ccdf0 = jnp.where(col > 0, fetch_cond(jnp.maximum(col - 1, 0)), 0.0)
    ccdf1 = fetch_cond(col)
    sx = (sx - ccdf0) * m.safe_rcp(ccdf1 - ccdf0)

    v00 = lookup(dist.data, row, col)
    v10 = lookup(dist.data, row, col + 1)
    v01 = lookup(dist.data, row + 1, col)
    v11 = lookup(dist.data, row + 1, col + 1)
    # square_to_bilinear (warp.h:393-407)
    sy = _interval_to_linear(v00 + v10, v01 + v11, sy)
    c0 = v00 + sy * (v01 - v00)
    c1 = v10 + sy * (v11 - v10)
    sx = _interval_to_linear(c0, c1, sx)
    pdf = c0 + sx * (c1 - c0)
    pos = jnp.stack([(col + sx) / (w - 1), (row + sy) / (h - 1)], axis=-1)
    return pos, pdf


def invert_discrete(dist: Marginal2DDiscrete, pos, params=()):
    """Exact inverse of sample_discrete."""
    idxs, wts, strides = _param_setup(dist, params)
    lookup = _mk_lookup(_corners(idxs, wts, strides))
    h, w = dist.h, dist.w
    px = jnp.clip(pos[..., 0], 0.0, 1.0) * (w - 1)
    py = jnp.clip(pos[..., 1], 0.0, 1.0) * (h - 1)
    col = jnp.clip(px.astype(jnp.int32), 0, w - 2)
    row = jnp.clip(py.astype(jnp.int32), 0, h - 2)
    fx = px - col
    fy = py - row
    v00 = lookup(dist.data, row, col)
    v10 = lookup(dist.data, row, col + 1)
    v01 = lookup(dist.data, row + 1, col)
    v11 = lookup(dist.data, row + 1, col + 1)
    c0 = v00 + fy * (v01 - v00)
    c1 = v10 + fy * (v11 - v10)
    pdf = c0 + fx * (c1 - c0)
    sx = _linear_to_interval(c0, c1, fx)
    sy = _linear_to_interval(v00 + v10, v01 + v11, fy)

    def fetch_cond(idx):
        return lookup(dist.cond_cdf, row, idx)

    ccdf0 = jnp.where(col > 0, fetch_cond(jnp.maximum(col - 1, 0)), 0.0)
    ccdf1 = fetch_cond(col)
    sx = (ccdf0 + sx * (ccdf1 - ccdf0)) * m.safe_rcp(fetch_cond(w - 2))

    def fetch_marg(idx):
        return lookup(dist.marg_cdf, idx)

    cdf0 = jnp.where(row > 0, fetch_marg(jnp.maximum(row - 1, 0)), 0.0)
    cdf1 = fetch_marg(row)
    sy = cdf0 + sy * (cdf1 - cdf0)
    return jnp.stack([sx, sy], axis=-1), pdf
