"""Uniform hash grid for photon radiance estimates.

TPU-native replacement for the reference's left-balanced point kd-tree
(src/integrators/photonmapper/kdtree.h) and its nnSearch/executeQuery
(photonmap.h:131-271): kd-recursion is pointer-chasing-hostile on TPU, so
photons are binned into a virtual uniform grid with cell size = query
radius and a radius query visits the 27 neighbor cells with a fixed
per-cell photon cap — branch-free gathers over a sorted array.

Round-4 redesign (the VRL-query recipe applied to photons): cell lookup
is a DIRECT-INDEXED BUCKET TABLE — photons are sorted by bucket id
(hash & (H-1), H a power of two ~2x capacity) and a (H, 2) [start, end)
range table is built once; a query then costs ONE (N, 2)-row gather per
neighbor cell instead of two binary searches over the sorted keys
(2 x log2(P) sequential dependent gathers per cell — the dominant cost
of the old fold, scripts/profile_nlvrl.py).

Bucket collisions (distinct cells sharing a bucket) are benign:
candidate photons outside the query radius are rejected by the distance
test either way; the 0.5 load factor keeps the extra candidates rare.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..core import math as m


class HashGrid(NamedTuple):
    cell_ranges: jnp.ndarray    # (H, 2) int32 [start, end) into order
    order: jnp.ndarray          # (P,) int32 photon index per sorted slot
    cell_size: jnp.ndarray      # () float32
    origin: jnp.ndarray         # (3,) grid origin (bbox lo)


_H1 = jnp.uint32(0x8da6b343)
_H2 = jnp.uint32(0xd8163841)
_H3 = jnp.uint32(0xcb1ab31f)


def _hash_cell(c):
    """3D integer cell -> 32-bit hash (large-prime mix)."""
    x = c[..., 0].astype(jnp.uint32) * _H1
    y = c[..., 1].astype(jnp.uint32) * _H2
    z = c[..., 2].astype(jnp.uint32) * _H3
    h = x ^ (y + jnp.uint32(0x9e3779b9) + (x << 6) + (x >> 2))
    h = h ^ (z + jnp.uint32(0x9e3779b9) + (h << 6) + (h >> 2))
    return h


def _n_buckets(P: int) -> int:
    """Static bucket count: power of two >= 2P (0.5 load factor)."""
    H = 1024
    while H < 2 * P:
        H *= 2
    return min(H, 1 << 21)


def build(positions: jnp.ndarray, valid: jnp.ndarray, origin,
          cell_size) -> HashGrid:
    """Sort photon indices by cell bucket and tabulate per-bucket ranges.
    Invalid photons sort to bucket H (past every real bucket)."""
    P = positions.shape[0]
    H = _n_buckets(P)
    cell = jnp.floor((positions - origin) / cell_size).astype(jnp.int32)
    bucket = (_hash_cell(cell) & jnp.uint32(H - 1)).astype(jnp.int32)
    bucket = jnp.where(valid, bucket, H)
    order = jnp.argsort(bucket).astype(jnp.int32)
    bsort = bucket[order]
    ranges = jnp.searchsorted(bsort, jnp.arange(H + 1)).astype(jnp.int32)
    cell_ranges = jnp.stack([ranges[:-1], ranges[1:]], axis=1)
    return HashGrid(cell_ranges=cell_ranges, order=order,
                    cell_size=jnp.float32(cell_size),
                    origin=jnp.asarray(origin, jnp.float32))


def fold_neighbors(grid: HashGrid, x: jnp.ndarray, active, fold_fn: Callable,
                   init, max_per_cell: int = 32):
    """Fold ``fold_fn(acc, photon_idx (N, K), ok (N, K)) -> acc`` over all
    photons in the 27 cells around each query point x (N, 3); called once
    per neighbor cell with a vectorized (N, K) candidate block.

    The radius test lives in fold_fn — the grid only guarantees that
    photons within cell_size of x are visited. Photons beyond the per-cell
    cap K are dropped (size K to the expected local density).
    """
    P = grid.order.shape[0]
    H = grid.cell_ranges.shape[0]
    if P == 0:          # statically empty map (e.g. global_photons = 0)
        return init
    K = max_per_cell
    N = x.shape[0]
    base = jnp.floor((x - grid.origin) / grid.cell_size).astype(jnp.int32)
    offs = jnp.arange(K, dtype=jnp.int32)[None, :]
    neighbor = jnp.asarray([[dx, dy, dz]
                            for dz in (-1, 0, 1)
                            for dy in (-1, 0, 1)
                            for dx in (-1, 0, 1)], jnp.int32)  # (27, 3)
    # all 27 bucket ids up front, sorted per lane with duplicates masked:
    # with only H buckets, two NEIGHBOR cells can share a bucket, and
    # visiting it twice would double-count its photons. Dedup by bucket
    # is exact: any photon within the query radius lies in one of the 27
    # cells, so its bucket is visited exactly once either way.
    cells = base[:, None, :] + neighbor[None, :, :]     # (N, 27, 3)
    b = (_hash_cell(cells) & jnp.uint32(H - 1)).astype(jnp.int32)
    b = jnp.sort(b, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((N, 1), bool), b[:, 1:] == b[:, :-1]], axis=1)

    # fori over the 27 neighbor cells: ONE traced fold graph (27 unrolled
    # copies made every map-query compile pathologically slow)
    def body(i, acc):
        rng = grid.cell_ranges[b[:, i]]                 # (N, 2) ONE gather
        start, end = rng[:, 0], rng[:, 1]
        slots = start[:, None] + offs                   # (N, K)
        ok = active[:, None] & ~dup[:, i][:, None] & (slots < end[:, None])
        idx = grid.order[jnp.clip(slots, 0, P - 1)]
        return fold_fn(acc, idx, ok)

    return jax.lax.fori_loop(0, neighbor.shape[0], body, init)
