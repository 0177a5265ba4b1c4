"""Cluster-sweep ray traversal — the TPU-shaped alternative to a BVH.

The reference's production answer to large meshes is a SAH kd-tree with
per-ray stack traversal (include/mitsuba/render/kdtree.h:2069-2299).
A per-lane stack walk is gather-bound and divergence-bound on TPU (the
wavefront pays max-lane iterations x ~1 ms/iteration; ops/bvh4.py
measures 5-30x SLOWER than the dense sweep, scripts/bench_isect.py).

This module instead exploits what the TPU is good at:
  * Morton-order triangles are chunked into clusters of K=K_TRIS (256;
    64 and 512 both measured worse, docs/PERF.md) with AABBs.
  * Each traversal iteration slab-tests ALL cluster AABBs densely —
    an (N, C) regular VPU sweep with NO gathers (C = T/K, so the slope
    is 1/K-th of the dense triangle sweep).
  * Each lane then visits its next unvisited cluster in entry-t order
    (argmin over the masked (N, C) entry distances — deterministic
    lexicographic (t, index) order, no stack, no visited bitmask) and
    Moller-Trumbore's the cluster's K triangles from ONE fat-row gather
    (rows are priced per row on TPU, ops/gather.py).
  * A lane stops as soon as the nearest remaining cluster entry lies
    beyond its current best hit.

Iterations ~ max clusters VISITED per lane (≈5-25 for surface meshes),
independent of total triangle count. Measured crossover vs the dense
sweep: 1.07x @ 327k tris, 1.86x @ 1.31M (docs/PERF.md).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

K_TRIS = 256
MAX_SWEEP_ITERS = 4096


class ClusterArrays(NamedTuple):
    lo: jnp.ndarray       # (C, 3) cluster AABB min
    hi: jnp.ndarray       # (C, 3) cluster AABB max
    rows: jnp.ndarray     # (C, K*9) packed [v0 e1 e2] per triangle
    base: jnp.ndarray     # (C,) int32 first (reordered) tri id of cluster


def build(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray) -> ClusterArrays:
    """Host build over ALREADY Morton-ordered triangles (the scene builder
    reorders the global arrays; cluster c covers tris [cK, cK+K))."""
    v0 = np.asarray(v0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    T = len(v0)
    C = -(-T // K_TRIS)
    pad = C * K_TRIS - T
    if pad:
        # degenerate padding triangles never hit (zero edges)
        z = np.zeros((pad, 3), np.float32)
        v0 = np.concatenate([v0, z])
        e1 = np.concatenate([e1, z])
        e2 = np.concatenate([e2, z])
    p1, p2 = v0 + e1, v0 + e2
    tlo = np.minimum(np.minimum(v0, p1), p2).reshape(C, K_TRIS, 3)
    thi = np.maximum(np.maximum(v0, p1), p2).reshape(C, K_TRIS, 3)
    if pad:
        # padding must not inflate the last cluster's AABB
        tlo[-1, K_TRIS - pad:] = np.inf
        thi[-1, K_TRIS - pad:] = -np.inf
    rows = np.concatenate([v0.reshape(C, K_TRIS, 3),
                           e1.reshape(C, K_TRIS, 3),
                           e2.reshape(C, K_TRIS, 3)], axis=2)  # (C,K,9)
    return ClusterArrays(
        lo=jnp.asarray(tlo.min(1)), hi=jnp.asarray(thi.max(1)),
        rows=jnp.asarray(rows.reshape(C, K_TRIS * 9)),
        base=jnp.asarray(np.arange(C, dtype=np.int32) * K_TRIS))


def traverse(cl: ClusterArrays, o, d, mint, maxt, any_hit: bool = False):
    """Nearest (or any) hit. Returns (t, reordered_tri_idx, u, v);
    idx == -1 on miss."""
    N = o.shape[0]
    C = cl.lo.shape[0]
    inv_d = 1.0 / jnp.where(jnp.abs(d) > 1e-20, d, 1e-20)
    carange = jnp.arange(C, dtype=jnp.int32)
    best_t0 = jnp.where(jnp.isfinite(maxt), maxt, jnp.inf)

    def cond(c):
        return jnp.any(c[0]) & (c[8] < MAX_SWEEP_ITERS)

    def body(c):
        (alive, t_last, c_last, best_t, hit_t, best_i, best_u, best_v,
         it) = c
        # cluster slab entry times — recomputed per iteration so the
        # (N, C) plane stays a fused elementwise+reduce (materializing it
        # once outside the loop would pin N*C floats in HBM)
        t0 = (cl.lo[None, :, :] - o[:, None, :]) * inv_d[:, None, :]
        t1 = (cl.hi[None, :, :] - o[:, None, :]) * inv_d[:, None, :]
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        slab_ok = (tn <= tf) & (tf >= mint[:, None])
        tn = jnp.maximum(tn, 0.0)
        # next unvisited cluster in lexicographic (entry_t, index) order
        later = (tn > t_last[:, None]) \
            | ((tn == t_last[:, None]) & (carange[None, :] > c_last[:, None]))
        valid = slab_ok & later & (tn < best_t[:, None]) & alive[:, None]
        tnv = jnp.where(valid, tn, jnp.inf)
        c_sel = jnp.argmin(tnv, axis=1).astype(jnp.int32)
        tn_sel = jnp.min(tnv, axis=1)
        act = alive & jnp.isfinite(tn_sel)

        row = cl.rows[jnp.where(act, c_sel, 0)]      # (N, K*9) ONE gather
        tri = row.reshape(N, K_TRIS, 9)
        tv0 = tri[:, :, 0:3]
        te1 = tri[:, :, 3:6]
        te2 = tri[:, :, 6:9]
        dx, dy, dz = d[:, None, 0], d[:, None, 1], d[:, None, 2]
        px = dy * te2[:, :, 2] - dz * te2[:, :, 1]
        py = dz * te2[:, :, 0] - dx * te2[:, :, 2]
        pz = dx * te2[:, :, 1] - dy * te2[:, :, 0]
        det = te1[:, :, 0] * px + te1[:, :, 1] * py + te1[:, :, 2] * pz
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tx = o[:, None, 0] - tv0[:, :, 0]
        ty = o[:, None, 1] - tv0[:, :, 1]
        tz = o[:, None, 2] - tv0[:, :, 2]
        uu = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * te1[:, :, 2] - tz * te1[:, :, 1]
        qy = tz * te1[:, :, 0] - tx * te1[:, :, 2]
        qz = tx * te1[:, :, 1] - ty * te1[:, :, 0]
        vv = (dx * qx + dy * qy + dz * qz) * inv_det
        tt = (te2[:, :, 0] * qx + te2[:, :, 1] * qy + te2[:, :, 2] * qz) \
            * inv_det
        ok = act[:, None] & (jnp.abs(det) > 1e-12) & (uu >= 0) & (vv >= 0) \
            & (uu + vv <= 1) & (tt >= mint[:, None]) & (tt < best_t[:, None])
        tt = jnp.where(ok, tt, jnp.inf)
        j = jnp.argmin(tt, axis=1)
        tj = jnp.min(tt, axis=1)
        better = jnp.isfinite(tj)
        oh = jnp.arange(K_TRIS)[None, :] == j[:, None]
        best_t = jnp.where(better, tj, best_t)
        hit_t = jnp.where(better, tj, hit_t)
        base_sel = c_sel * K_TRIS
        best_i = jnp.where(better, base_sel + j.astype(jnp.int32), best_i)
        best_u = jnp.where(better, jnp.sum(jnp.where(oh, uu, 0.0), 1),
                           best_u)
        best_v = jnp.where(better, jnp.sum(jnp.where(oh, vv, 0.0), 1),
                           best_v)
        alive = act
        if any_hit:
            alive = alive & ~better
        return (alive, jnp.where(act, tn_sel, t_last),
                jnp.where(act, c_sel, c_last), best_t, hit_t, best_i,
                best_u, best_v, it + 1)

    init = (jnp.ones((N,), bool), jnp.full((N,), -jnp.inf),
            jnp.full((N,), -1, jnp.int32), best_t0,
            jnp.full((N,), jnp.inf), jnp.full((N,), -1, jnp.int32),
            jnp.zeros((N,)), jnp.zeros((N,)), jnp.int32(0))
    out = jax.lax.while_loop(cond, body, init)
    return out[4], out[5], out[6], out[7]
