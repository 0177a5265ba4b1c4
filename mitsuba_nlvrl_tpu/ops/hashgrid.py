"""Uniform hash grid for photon radiance estimates.

TPU-native replacement for the reference's left-balanced point kd-tree
(src/integrators/photonmapper/kdtree.h) and its nnSearch/executeQuery
(photonmap.h:131-271): kd-recursion is pointer-chasing-hostile on TPU, so
photons are binned into a virtual uniform grid with cell size = query
radius, keys are hashed & sorted once at build, and a radius query visits
the 27 neighbor cells with a fixed per-cell photon cap — branch-free
gathers over a sorted array.

Collisions in the 32-bit cell hash are benign: candidate photons outside
the query radius are rejected by the distance test either way.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..core import math as m


class HashGrid(NamedTuple):
    keys_sorted: jnp.ndarray    # (P,) uint32 sorted cell hashes
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
    # reserve the max key for invalid entries
    return jnp.minimum(h, jnp.uint32(0xFFFFFFFE))


def build(positions: jnp.ndarray, valid: jnp.ndarray, origin,
          cell_size) -> HashGrid:
    """Sort photon indices by cell hash. Invalid photons sort to the end."""
    cell = jnp.floor((positions - origin) / cell_size).astype(jnp.int32)
    keys = jnp.where(valid, _hash_cell(cell), jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(keys).astype(jnp.int32)
    return HashGrid(keys_sorted=keys[order], order=order,
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
    P = grid.keys_sorted.shape[0]
    if P == 0:          # statically empty map (e.g. global_photons = 0)
        return init
    K = max_per_cell
    base = jnp.floor((x - grid.origin) / grid.cell_size).astype(jnp.int32)
    offs = jnp.arange(K, dtype=jnp.int32)[None, :]
    neighbor = jnp.asarray([[dx, dy, dz]
                            for dz in (-1, 0, 1)
                            for dy in (-1, 0, 1)
                            for dx in (-1, 0, 1)], jnp.int32)  # (27, 3)

    # fori over the 27 neighbor cells: ONE traced fold graph (27 unrolled
    # copies made every map-query compile pathologically slow)
    def body(i, acc):
        c = base + neighbor[i]
        k = _hash_cell(c)
        start = jnp.searchsorted(grid.keys_sorted, k, side='left')
        end = jnp.searchsorted(grid.keys_sorted, k, side='right')
        slots = start[:, None] + offs                   # (N, K)
        ok = active[:, None] & (slots < end[:, None])
        idx = grid.order[jnp.clip(slots, 0, P - 1)]
        return fold_fn(acc, idx, ok)

    return jax.lax.fori_loop(0, neighbor.shape[0], body, init)
