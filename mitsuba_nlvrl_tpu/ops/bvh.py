"""LBVH build (host) + wavefront stack traversal (device).

TPU-native replacement for the reference's SAH kd-tree
(include/mitsuba/render/kdtree.h: TShapeKDTree build :676-1908, packed
traversal :2069-2299): a median-split BVH over Morton-sorted triangles is
built once on host with numpy, flattened to SoA node arrays; rays traverse
it on device in lock-step with per-lane explicit stacks inside a masked
``lax.while_loop`` — gathers replace pointer chasing, leaf triangles are
tested in fixed-size masked bundles.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core import math as m

LEAF_SIZE = 8
STACK_DEPTH = 48
MAX_TRAV_ITERS = 4096


class BVHArrays(NamedTuple):
    node_lo: jnp.ndarray     # (M, 3)
    node_hi: jnp.ndarray     # (M, 3)
    node_a: jnp.ndarray      # (M,) int32: left child | tri offset (leaf)
    node_b: jnp.ndarray      # (M,) int32: right child | tri count (leaf)
    node_leaf: jnp.ndarray   # (M,) bool
    order: jnp.ndarray       # (T,) int32 reordered-tri -> original-tri


def _morton3(x: np.ndarray) -> np.ndarray:
    """Interleave 10-bit quantized coords -> 30-bit Morton codes."""
    def part(v):
        v = v.astype(np.uint64)
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v
    q = np.clip((x * 1024).astype(np.int64), 0, 1023)
    return part(q[:, 0]) | (part(q[:, 1]) << 1) | (part(q[:, 2]) << 2)


def build(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray) -> BVHArrays:
    """Build the BVH on host. Prefers the native binned-SAH builder
    (native/bvh_native.cpp — the C++ counterpart of the reference's
    TShapeKDTree::build, kdtree.h:676-1908); falls back to the numpy
    Morton median-split build when no toolchain is available."""
    from .. import native as native_mod
    nb = native_mod.bvh_builder()
    if nb is not None:
        lo, hi, a, b, leaf, order = nb(v0, e1, e2, LEAF_SIZE)
        return BVHArrays(node_lo=lo, node_hi=hi, node_a=a, node_b=b,
                         node_leaf=leaf, order=order)
    return _build_numpy(v0, e1, e2)


def _build_numpy(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray) -> BVHArrays:
    """Median-split BVH over Morton-sorted triangle centroids (host)."""
    v0 = np.asarray(v0, np.float64)
    e1 = np.asarray(e1, np.float64)
    e2 = np.asarray(e2, np.float64)
    T = len(v0)
    p1 = v0 + e1
    p2 = v0 + e2
    tlo = np.minimum(np.minimum(v0, p1), p2)
    thi = np.maximum(np.maximum(v0, p1), p2)
    cent = 0.5 * (tlo + thi)
    lo = cent.min(0)
    ext = np.maximum(cent.max(0) - lo, 1e-12)
    order = np.argsort(_morton3((cent - lo) / ext), kind='stable')
    tlo, thi = tlo[order], thi[order]

    node_lo, node_hi, node_a, node_b, node_leaf = [], [], [], [], []

    # prefix min/max for O(1) range AABBs? median split on sorted order:
    def rec(start, end):
        idx = len(node_lo)
        node_lo.append(None)
        node_hi.append(None)
        node_a.append(0)
        node_b.append(0)
        node_leaf.append(False)
        lo_ = tlo[start:end].min(0)
        hi_ = thi[start:end].max(0)
        node_lo[idx] = lo_
        node_hi[idx] = hi_
        n = end - start
        if n <= LEAF_SIZE:
            node_leaf[idx] = True
            node_a[idx] = start
            node_b[idx] = n
            return idx
        mid = start + (n // 2)
        a = rec(start, mid)
        b = rec(mid, end)
        node_a[idx] = a
        node_b[idx] = b
        return idx

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 10000))
    try:
        rec(0, T)
    finally:
        sys.setrecursionlimit(old)

    # NOTE: returns HOST (numpy) arrays — the scene builder uploads them
    # once; pulling device arrays back to host is very slow over remote
    # TPU links.
    return BVHArrays(
        node_lo=np.asarray(node_lo, np.float32),
        node_hi=np.asarray(node_hi, np.float32),
        node_a=np.asarray(node_a, np.int32),
        node_b=np.asarray(node_b, np.int32),
        node_leaf=np.asarray(node_leaf),
        order=order.astype(np.int32))


def _tri_bundle_hit(o, d, mint, cur_best, v0, e1, e2):
    """Test LEAF_SIZE triangles per lane: v0/e1/e2 (N, L, 3).
    Returns (t, u, v) of the best hit (inf when none)."""
    dx = d[:, None, 0]
    dy = d[:, None, 1]
    dz = d[:, None, 2]
    px = dy * e2[..., 2] - dz * e2[..., 1]
    py = dz * e2[..., 0] - dx * e2[..., 2]
    pz = dx * e2[..., 1] - dy * e2[..., 0]
    det = e1[..., 0] * px + e1[..., 1] * py + e1[..., 2] * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tx = o[:, None, 0] - v0[..., 0]
    ty = o[:, None, 1] - v0[..., 1]
    tz = o[:, None, 2] - v0[..., 2]
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1[..., 2] - tz * e1[..., 1]
    qy = tz * e1[..., 0] - tx * e1[..., 2]
    qz = tx * e1[..., 1] - ty * e1[..., 0]
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2[..., 0] * qx + e2[..., 1] * qy + e2[..., 2] * qz) * inv_det
    ok = (jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) \
        & (t >= mint[:, None]) & (t < cur_best[:, None])
    return jnp.where(ok, t, jnp.inf), u, v, ok


def traverse(bvh: BVHArrays, tri_v0, tri_e1, tri_e2, o, d, mint, maxt,
             any_hit: bool = False):
    """Nearest (or any) hit. tri_* are the REORDERED (morton) triangle
    arrays. Returns (t, reordered_idx, u, v) with idx == -1 on miss."""
    N = o.shape[0]
    inv_d = 1.0 / jnp.where(jnp.abs(d) > 1e-20, d, 1e-20)

    stack = jnp.zeros((N, STACK_DEPTH), jnp.int32)
    sp = jnp.ones((N,), jnp.int32)           # stack[0] = root(0)
    best_t = jnp.where(jnp.isfinite(maxt), maxt, jnp.inf)
    hit_t = jnp.full((N,), jnp.inf)
    best_i = jnp.full((N,), -1, jnp.int32)
    best_u = jnp.zeros((N,))
    best_v = jnp.zeros((N,))

    def cond(c):
        sp = c[1]
        it = c[7]
        return jnp.any(sp > 0) & (it < MAX_TRAV_ITERS)

    def body(c):
        stack, sp, best_t, hit_t, best_i, best_u, best_v, it = c
        act = sp > 0
        sp_new = jnp.maximum(sp - 1, 0)
        node = stack[jnp.arange(N), sp_new]
        node = jnp.where(act, node, 0)

        lo = bvh.node_lo[node]
        hi = bvh.node_hi[node]
        t0 = (lo - o) * inv_d
        t1 = (hi - o) * inv_d
        tnear = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tfar = jnp.min(jnp.maximum(t0, t1), axis=-1)
        box_hit = act & (tnear <= tfar) & (tfar >= mint) & (tnear < best_t)

        is_leaf = bvh.node_leaf[node]
        # --- leaf: test the triangle bundle -------------------------------
        do_leaf = box_hit & is_leaf
        off = bvh.node_a[node]
        cnt = bvh.node_b[node]
        lane_ids = off[:, None] + jnp.arange(LEAF_SIZE)[None, :]
        lane_ok = jnp.arange(LEAF_SIZE)[None, :] < cnt[:, None]
        safe_ids = jnp.clip(lane_ids, 0, tri_v0.shape[0] - 1)
        tv0 = tri_v0[safe_ids]
        te1 = tri_e1[safe_ids]
        te2 = tri_e2[safe_ids]
        t, u, v, ok = _tri_bundle_hit(o, d, mint, best_t, tv0, te1, te2)
        ok = ok & lane_ok & do_leaf[:, None]
        t = jnp.where(ok, t, jnp.inf)
        tj = jnp.min(t, axis=1)
        jmin = jnp.argmin(t, axis=1)
        found = jnp.isfinite(tj)
        better = found & (tj < best_t)
        best_t = jnp.where(better, tj, best_t)
        hit_t = jnp.where(better, tj, hit_t)
        best_i = jnp.where(better,
                           jnp.take_along_axis(lane_ids, jmin[:, None],
                                               1)[:, 0], best_i)
        best_u = jnp.where(better,
                           jnp.take_along_axis(u, jmin[:, None], 1)[:, 0],
                           best_u)
        best_v = jnp.where(better,
                           jnp.take_along_axis(v, jmin[:, None], 1)[:, 0],
                           best_v)
        if any_hit:
            # lane done as soon as anything hit: empty the stack
            sp_new = jnp.where(better, 0, sp_new)

        # --- inner: push both children ------------------------------------
        push = box_hit & ~is_leaf
        a = bvh.node_a[node]
        b = bvh.node_b[node]
        lane = jnp.arange(N)
        s1 = stack.at[lane, jnp.minimum(sp_new, STACK_DEPTH - 1)].set(
            jnp.where(push, b, stack[lane, jnp.minimum(sp_new,
                                                       STACK_DEPTH - 1)]))
        sp1 = jnp.where(push, jnp.minimum(sp_new + 1, STACK_DEPTH - 1),
                        sp_new)
        s2 = s1.at[lane, jnp.minimum(sp1, STACK_DEPTH - 1)].set(
            jnp.where(push, a, s1[lane, jnp.minimum(sp1, STACK_DEPTH - 1)]))
        sp2 = jnp.where(push, jnp.minimum(sp1 + 1, STACK_DEPTH - 1), sp1)
        return (s2, sp2, best_t, hit_t, best_i, best_u, best_v, it + 1)

    init = (stack, sp, best_t, hit_t, best_i, best_u, best_v, jnp.int32(0))
    _, _, _, hit_t, best_i, best_u, best_v, _ = jax.lax.while_loop(
        cond, body, init)
    return hit_t, best_i, best_u, best_v
