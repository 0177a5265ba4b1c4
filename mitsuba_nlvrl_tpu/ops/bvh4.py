"""4-wide BVH with a UNIFIED packed row table for TPU wavefront traversal.

TPU-native replacement for the reference's logarithmic SAH-kd-tree
traversal (include/mitsuba/render/kdtree.h:2069-2299, scene_embree.inl):
the dense O(rays x tris) sweep is unbeatable on tiny scenes (regular VPU
work, zero gathers) but scales linearly; this traversal scales ~log4 with
ONE 32-float row gather per iteration — the TPU's gather cost is per ROW
(ops/gather.py), so the design packs everything an iteration needs into a
single row of one table:

  inner row: 4 child AABBs (lo3+hi3 each, slots 0..23) + 4 child codes
             (int32 bitcast in slots 24..27; >=0 inner row, <0 leaf row
             ~code, 0x7fffffff empty)
  leaf row : up to 3 triangles (v0,e1,e2 = 27 floats, slots 0..26),
             3 original-triangle ids (bitcast, slots 27..29), count (30)

Traversal is a per-lane stack walk: pop/advance to a current row, gather
it, either test 4 child boxes (push far hits, descend nearest) or
Moller-Trumbore the <=3 leaf triangles. Leaves of 3 keep the leaf row the
same width as inner rows — one table, one gather per iteration.

Build (host, numpy): 4-way equal-count split over Morton-sorted triangle
centroids (the LBVH analog of TShapeKDTree::build, kdtree.h:676-1908).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core import math as m

LEAF_TRIS = 3
ROW_W = 32
STACK_DEPTH = 48
MAX_ITERS = 16384
EMPTY = np.int32(0x7fffffff)


class BVH4Arrays(NamedTuple):
    rows: jnp.ndarray     # (M, 32) float32 unified node/leaf rows
    order: jnp.ndarray    # (T,) int32 reordered-tri -> original-tri
    root: int             # root row index (static)


def _morton3(x: np.ndarray) -> np.ndarray:
    def part(v):
        v = v.astype(np.uint64)
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v
    q = np.clip((x * 1024).astype(np.int64), 0, 1023)
    return part(q[:, 0]) | (part(q[:, 1]) << 1) | (part(q[:, 2]) << 2)


def build(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray,
          pre_ordered: bool = False) -> BVH4Arrays:
    """Host build. Returns rows + the Morton triangle order (the caller
    reorders its global triangle arrays by it, like ops/bvh.build).
    ``pre_ordered=True`` skips the Morton sort (the scene builder already
    reordered the arrays by ops/bvh.build's identical Morton order)."""
    v0 = np.asarray(v0, np.float64)
    e1 = np.asarray(e1, np.float64)
    e2 = np.asarray(e2, np.float64)
    T = len(v0)
    p1, p2 = v0 + e1, v0 + e2
    tlo = np.minimum(np.minimum(v0, p1), p2)
    thi = np.maximum(np.maximum(v0, p1), p2)
    if pre_ordered:
        order = np.arange(T, dtype=np.int64)
    else:
        cent = 0.5 * (tlo + thi)
        lo = cent.min(0)
        ext = np.maximum(cent.max(0) - lo, 1e-12)
        order = np.argsort(_morton3((cent - lo) / ext), kind='stable')
    tlo, thi = tlo[order], thi[order]
    v0s = v0[order].astype(np.float32)
    e1s = e1[order].astype(np.float32)
    e2s = e2[order].astype(np.float32)

    rows = []          # list of np.float32[32]

    def leaf_row(start, cnt):
        r = np.zeros(ROW_W, np.float32)
        for k in range(cnt):
            r[k * 9:k * 9 + 3] = v0s[start + k]
            r[k * 9 + 3:k * 9 + 6] = e1s[start + k]
            r[k * 9 + 6:k * 9 + 9] = e2s[start + k]
        ids = np.full(3, -1, np.int32)
        ids[:cnt] = np.arange(start, start + cnt, dtype=np.int32)
        r[27:30] = ids.view(np.float32)
        r[30] = np.float32(cnt)
        idx = len(rows)
        rows.append(r)
        return idx

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 100000))

    max_depth = [0]

    def rec(start, end, depth=0):
        """Returns (code, lo3, hi3) — code >= 0 inner row, < 0 leaf (~)."""
        n = end - start
        blo = tlo[start:end].min(0).astype(np.float32)
        bhi = thi[start:end].max(0).astype(np.float32)
        if n <= LEAF_TRIS:
            return ~leaf_row(start, n), blo, bhi
        max_depth[0] = max(max_depth[0], depth + 1)
        # 4-way equal-count split on the Morton order
        q = max(1, n // 4)
        cuts = [start, start + q, start + 2 * q, start + 3 * q, end]
        # degenerate tiny ranges: merge empty cuts
        cuts = sorted(set(min(c, end) for c in cuts))
        idx = len(rows)
        rows.append(np.zeros(ROW_W, np.float32))
        codes = np.full(4, EMPTY, np.int32)
        r = rows[idx]
        for k in range(len(cuts) - 1):
            c, clo, chi = rec(cuts[k], cuts[k + 1], depth + 1)
            codes[k] = c
            r[6 * k:6 * k + 3] = clo
            r[6 * k + 3:6 * k + 6] = chi
        for k in range(len(cuts) - 1, 4):
            r[6 * k:6 * k + 3] = np.float32(np.inf)
            r[6 * k + 3:6 * k + 6] = np.float32(-np.inf)
        r[24:28] = codes.view(np.float32)
        return idx, blo, bhi

    try:
        root, _, _ = rec(0, T)
    finally:
        sys.setrecursionlimit(old)
    assert root >= 0
    # traverse() pushes at most 3 deferred subtrees per tree level, so a
    # root-to-leaf walk needs <= 3*depth stack slots; the traversal clamps
    # sp at STACK_DEPTH-1 and would silently DROP pending subtrees beyond
    # it (missed intersections). Equal-count 4-way splits give depth
    # ~log4(T/3), so 48 slots cover ~10^10 triangles — assert rather than
    # guard the hot loop.
    assert 3 * max_depth[0] < STACK_DEPTH, (
        f"BVH4 depth {max_depth[0]} needs {3 * max_depth[0]} stack slots "
        f"> STACK_DEPTH-1={STACK_DEPTH - 1}; raise STACK_DEPTH")
    return BVH4Arrays(rows=jnp.asarray(np.stack(rows)),
                      order=jnp.asarray(order.astype(np.int32)),
                      root=int(root))


def traverse(bvh: BVH4Arrays, o, d, mint, maxt, any_hit: bool = False):
    """Nearest (or any) hit against the packed BVH4. Returns
    (t, reordered_tri_idx, u, v); idx == -1 on miss. Triangle indices are
    into the MORTON-REORDERED arrays (== global ids after the scene
    builder applied ``order``)."""
    N = o.shape[0]
    rows = bvh.rows
    inv_d = 1.0 / jnp.where(jnp.abs(d) > 1e-20, d, 1e-20)

    stack = jnp.zeros((N, STACK_DEPTH), jnp.int32)
    sp = jnp.zeros((N,), jnp.int32)
    cur = jnp.full((N,), bvh.root, jnp.int32)
    has_cur = jnp.ones((N,), bool)
    best_t = jnp.where(jnp.isfinite(maxt), maxt, jnp.inf)
    hit_t = jnp.full((N,), jnp.inf)
    best_i = jnp.full((N,), -1, jnp.int32)
    best_u = jnp.zeros((N,))
    best_v = jnp.zeros((N,))
    lane = jnp.arange(N)
    karr = jnp.arange(STACK_DEPTH)

    def cond(c):
        has_cur, sp, it = c[1], c[2], c[9]
        return jnp.any(has_cur | (sp > 0)) & (it < MAX_ITERS)

    def body(c):
        (cur, has_cur, sp, stack, best_t, hit_t, best_i, best_u, best_v,
         it) = c
        # lanes without a current row pop the stack
        need_pop = ~has_cur & (sp > 0)
        sp_idx = jnp.maximum(sp - 1, 0)
        popped = jnp.sum(jnp.where(karr[None, :] == sp_idx[:, None],
                                   stack, 0), axis=1)
        cur = jnp.where(need_pop, popped, cur)
        sp = jnp.where(need_pop, sp_idx, sp)
        act = has_cur | need_pop

        is_leaf = cur < 0
        row_idx = jnp.where(is_leaf, ~cur, cur)
        row = rows[jnp.where(act, row_idx, 0)]          # (N, 32) ONE gather

        # ---- inner: 4 child slab tests -----------------------------------
        codes = jax.lax.bitcast_convert_type(row[:, 24:28], jnp.int32)
        tns, hits = [], []
        for k in range(4):
            lo_k = row[:, 6 * k:6 * k + 3]
            hi_k = row[:, 6 * k + 3:6 * k + 6]
            t0 = (lo_k - o) * inv_d
            t1 = (hi_k - o) * inv_d
            tn = jnp.max(jnp.minimum(t0, t1), -1)
            tf = jnp.min(jnp.maximum(t0, t1), -1)
            ok = act & ~is_leaf & (tn <= tf) & (tf >= mint) \
                & (tn < best_t) & (codes[:, k] != EMPTY)
            tns.append(jnp.where(ok, tn, jnp.inf))
            hits.append(ok)
        tn4 = jnp.stack(tns, -1)                        # (N, 4)
        code4 = codes
        # sort the 4 children by tnear (sorting network; misses are inf)
        def cswap(a, i, j):
            ti, ci = a[0][:, i], a[1][:, i]
            tj, cj = a[0][:, j], a[1][:, j]
            swap = tj < ti
            t_new = a[0].at[:, i].set(jnp.where(swap, tj, ti)) \
                        .at[:, j].set(jnp.where(swap, ti, tj))
            c_new = a[1].at[:, i].set(jnp.where(swap, cj, ci)) \
                        .at[:, j].set(jnp.where(swap, ci, cj))
            return (t_new, c_new)
        srt = (tn4, code4)
        for i, j in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
            srt = cswap(srt, i, j)
        tn_s, code_s = srt
        nhit = jnp.sum(jnp.isfinite(tn_s).astype(jnp.int32), axis=1)
        inner = act & ~is_leaf
        # push children 3,2,1 (far first) when hit, descend child 0
        for k in (3, 2, 1):
            do = inner & jnp.isfinite(tn_s[:, k])
            slot = jnp.minimum(sp, STACK_DEPTH - 1)
            stack = jnp.where((karr[None, :] == slot[:, None])
                              & do[:, None], code_s[:, k:k + 1], stack)
            sp = jnp.where(do, jnp.minimum(sp + 1, STACK_DEPTH - 1), sp)
        desc = inner & (nhit > 0)
        new_cur = jnp.where(desc, code_s[:, 0], 0)
        new_has = desc

        # ---- leaf: Moller-Trumbore the 3 packed triangles ----------------
        leafy = act & is_leaf
        cnt = row[:, 30].astype(jnp.int32)
        ids = jax.lax.bitcast_convert_type(row[:, 27:30], jnp.int32)
        t3, u3, v3, ok3 = [], [], [], []
        for k in range(3):
            tv0 = row[:, 9 * k:9 * k + 3]
            te1 = row[:, 9 * k + 3:9 * k + 6]
            te2 = row[:, 9 * k + 6:9 * k + 9]
            px = d[:, 1] * te2[:, 2] - d[:, 2] * te2[:, 1]
            py = d[:, 2] * te2[:, 0] - d[:, 0] * te2[:, 2]
            pz = d[:, 0] * te2[:, 1] - d[:, 1] * te2[:, 0]
            det = te1[:, 0] * px + te1[:, 1] * py + te1[:, 2] * pz
            inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            tx = o[:, 0] - tv0[:, 0]
            ty = o[:, 1] - tv0[:, 1]
            tz = o[:, 2] - tv0[:, 2]
            uu = (tx * px + ty * py + tz * pz) * inv_det
            qx = ty * te1[:, 2] - tz * te1[:, 1]
            qy = tz * te1[:, 0] - tx * te1[:, 2]
            qz = tx * te1[:, 1] - ty * te1[:, 0]
            vv = (d[:, 0] * qx + d[:, 1] * qy + d[:, 2] * qz) * inv_det
            tt = (te2[:, 0] * qx + te2[:, 1] * qy + te2[:, 2] * qz) \
                * inv_det
            ok = leafy & (k < cnt) & (jnp.abs(det) > 1e-12) & (uu >= 0) \
                & (vv >= 0) & (uu + vv <= 1) & (tt >= mint) & (tt < best_t)
            t3.append(jnp.where(ok, tt, jnp.inf))
            u3.append(uu)
            v3.append(vv)
            ok3.append(ok)
        tl = jnp.stack(t3, -1)
        jbest = jnp.argmin(tl, axis=1)
        tbest = jnp.min(tl, axis=1)
        found = jnp.isfinite(tbest)
        better = found & (tbest < best_t)
        oh = jnp.arange(3)[None, :] == jbest[:, None]
        best_t = jnp.where(better, tbest, best_t)
        hit_t = jnp.where(better, tbest, hit_t)
        best_i = jnp.where(better,
                           jnp.sum(jnp.where(oh, ids, 0), 1), best_i)
        best_u = jnp.where(better,
                           jnp.sum(jnp.where(oh, jnp.stack(u3, -1), 0.0),
                                   1), best_u)
        best_v = jnp.where(better,
                           jnp.sum(jnp.where(oh, jnp.stack(v3, -1), 0.0),
                                   1), best_v)
        if any_hit:
            # done lane: drop the stack
            done = better
            sp = jnp.where(done, 0, sp)
            new_has = new_has & ~done

        # leaf lanes continue by popping next iteration
        has_cur_out = jnp.where(leafy, False, new_has)
        cur_out = jnp.where(leafy, 0, new_cur)
        # lanes that neither descended nor were leaves: pop next iteration
        return (cur_out, has_cur_out, sp, stack, best_t, hit_t, best_i,
                best_u, best_v, it + 1)

    init = (cur, has_cur, sp, stack, best_t, hit_t, best_i, best_u,
            best_v, jnp.int32(0))
    out = jax.lax.while_loop(cond, body, init)
    return out[5], out[6], out[7], out[8]
