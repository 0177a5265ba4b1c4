"""Pallas TPU kernels for ray-triangle intersection.

The hot op of the renderer (replaces the reference's Embree/kd-tree
traversal, scene_embree.inl / kdtree.h:2069): a dense rays x triangles
sweep tiled so each ray block stays in VMEM while triangle chunks stream
through, with the running best-hit reduction fused in-kernel — one HBM
write per ray instead of XLA's materialized (N, T) planes.

Layout: rays SoA as 8 flat (N,) arrays; triangles as a (T, 9) packed
[v0 | e1 | e2] table replicated to every grid step.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_BLOCK = 1024
TRI_TILE = 512


def _mt_kernel(tri_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               mint_ref, maxt_ref, t_ref, i_ref, u_ref, v_ref,
               *, n_tris: int, any_hit: bool):
    B = ox_ref.shape[0]
    ox = ox_ref[:][:, None]
    oy = oy_ref[:][:, None]
    oz = oz_ref[:][:, None]
    dx = dx_ref[:][:, None]
    dy = dy_ref[:][:, None]
    dz = dz_ref[:][:, None]
    mint = mint_ref[:]
    maxt = maxt_ref[:]

    T = tri_ref.shape[0]
    n_chunks = T // TRI_TILE

    def chunk_body(c, carry):
        best_t, best_i, best_u, best_v = carry
        base = c * TRI_TILE
        tri = tri_ref[pl.ds(base, TRI_TILE), :]        # (TC, 9)
        v0x = tri[:, 0][None, :]
        v0y = tri[:, 1][None, :]
        v0z = tri[:, 2][None, :]
        e1x = tri[:, 3][None, :]
        e1y = tri[:, 4][None, :]
        e1z = tri[:, 5][None, :]
        e2x = tri[:, 6][None, :]
        e2y = tri[:, 7][None, :]
        e2z = tri[:, 8][None, :]

        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tx = ox - v0x
        ty = oy - v0y
        tz = oz - v0z
        u = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det

        tri_ids = base + jax.lax.broadcasted_iota(jnp.int32, (B, TRI_TILE), 1)
        valid = (jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) \
            & (t >= mint[:, None]) & (t <= maxt[:, None]) \
            & (tri_ids < n_tris)
        t = jnp.where(valid, t, jnp.inf)
        if any_hit:
            hit_any = jnp.min(t, axis=1)
            best_t = jnp.minimum(best_t, hit_any)
            return best_t, best_i, best_u, best_v
        # reduction-only best-hit select (no gathers: Mosaic-friendly)
        tj = jnp.min(t, axis=1)
        at_min = t == tj[:, None]
        j_ids = jnp.min(jnp.where(at_min, tri_ids, jnp.int32(0x7FFFFFFF)),
                        axis=1)
        pick = at_min & (tri_ids == j_ids[:, None])
        uj = jnp.sum(jnp.where(pick, u, 0.0), axis=1)
        vj = jnp.sum(jnp.where(pick, v, 0.0), axis=1)
        better = tj < best_t
        best_t = jnp.where(better, tj, best_t)
        best_i = jnp.where(better, j_ids, best_i)
        best_u = jnp.where(better, uj, best_u)
        best_v = jnp.where(better, vj, best_v)
        return best_t, best_i, best_u, best_v

    init = (jnp.full((B,), jnp.inf, jnp.float32),
            jnp.full((B,), -1, jnp.int32),
            jnp.zeros((B,), jnp.float32), jnp.zeros((B,), jnp.float32))
    best_t, best_i, best_u, best_v = jax.lax.fori_loop(
        0, n_chunks, chunk_body, init)
    t_ref[:] = best_t
    i_ref[:] = best_i
    u_ref[:] = best_u
    v_ref[:] = best_v


@functools.partial(jax.jit, static_argnames=('any_hit',))
def intersect_tris(tri_table, o, d, mint, maxt, any_hit: bool = False):
    """Nearest (or any) hit of N rays against the packed (T, 9) triangle
    table. Returns (t, idx, u, v); for any_hit, t < inf marks occlusion.

    Pads rays to RAY_BLOCK and triangles to TRI_TILE internally.
    """
    N = o.shape[0]
    T = tri_table.shape[0]
    n_tris = T
    Tpad = max(TRI_TILE, -(-T // TRI_TILE) * TRI_TILE)
    if Tpad != T:
        tri_table = jnp.pad(tri_table, ((0, Tpad - T), (0, 0)))
    Npad = max(RAY_BLOCK, -(-N // RAY_BLOCK) * RAY_BLOCK)

    def padr(x, val=0.0):
        return jnp.pad(x, (0, Npad - N), constant_values=val) \
            if Npad != N else x

    args = (padr(o[:, 0]), padr(o[:, 1]), padr(o[:, 2]),
            padr(d[:, 0]), padr(d[:, 1]), padr(d[:, 2], 1.0),
            padr(mint), padr(maxt, -1.0))

    grid = (Npad // RAY_BLOCK,)
    ray_spec = pl.BlockSpec((RAY_BLOCK,), lambda i: (i,),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((Tpad, 9), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [pl.BlockSpec((RAY_BLOCK,), lambda i: (i,),
                              memory_space=pltpu.VMEM)] * 4

    t, idx, u, v = pl.pallas_call(
        functools.partial(_mt_kernel, n_tris=n_tris, any_hit=any_hit),
        grid=grid,
        in_specs=[tri_spec] + [ray_spec] * 8,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((Npad,), jnp.float32),
            jax.ShapeDtypeStruct((Npad,), jnp.int32),
            jax.ShapeDtypeStruct((Npad,), jnp.float32),
            jax.ShapeDtypeStruct((Npad,), jnp.float32),
        ],
    )(tri_table, *args)
    return t[:N], idx[:N], u[:N], v[:N]
