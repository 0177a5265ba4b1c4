"""Pallas TPU kernels for ray-triangle intersection.

The hot op of the renderer (replaces the reference's Embree/kd-tree
traversal, scene_embree.inl / kdtree.h:2069): a dense rays x triangles
sweep tiled so each ray block stays in VMEM while triangle chunks stream
through, with the running best-hit reduction fused in-kernel — one HBM
write per ray instead of XLA's materialized (N, T) planes.

Layout: rays AND triangles as flat SoA (N,)/(T,) arrays — 1D f32 streams
tile cleanly onto the (8, 128) VPU registers; everything in the inner loop
is (RAY_BLOCK, TRI_TILE) elementwise work.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_BLOCK = 1024
TRI_TILE = 128


def _mt_kernel(v0x_ref, v0y_ref, v0z_ref, e1x_ref, e1y_ref, e1z_ref,
               e2x_ref, e2y_ref, e2z_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
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

    n_chunks = v0x_ref.shape[0]          # triangle rows of width TRI_TILE

    def chunk_body(c, carry):
        best_t, best_i, best_u, best_v = carry
        base = c * TRI_TILE
        v0x = v0x_ref[c, :][None, :]
        v0y = v0y_ref[c, :][None, :]
        v0z = v0z_ref[c, :][None, :]
        e1x = e1x_ref[c, :][None, :]
        e1y = e1y_ref[c, :][None, :]
        e1z = e1z_ref[c, :][None, :]
        e2x = e2x_ref[c, :][None, :]
        e2y = e2y_ref[c, :][None, :]
        e2z = e2z_ref[c, :][None, :]

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
            best_t = jnp.minimum(best_t, jnp.min(t, axis=1))
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
def intersect_tris(tri_cols, o, d, mint, maxt, any_hit: bool = False):
    """Nearest (or any) hit of N rays against triangles given as 9 flat
    (T,) arrays (v0x..v0z, e1x..e1z, e2x..e2z). Returns (t, idx, u, v);
    for any_hit, finite t marks occlusion."""
    N = o.shape[0]
    T = tri_cols[0].shape[0]
    n_tris = T
    Tpad = max(TRI_TILE, -(-T // TRI_TILE) * TRI_TILE)
    tri_cols = [(jnp.pad(c, (0, Tpad - T)) if Tpad != T else c
                 ).reshape(-1, TRI_TILE) for c in tri_cols]
    Npad = max(RAY_BLOCK, -(-N // RAY_BLOCK) * RAY_BLOCK)

    def padr(x, val=0.0):
        return jnp.pad(x, (0, Npad - N), constant_values=val) \
            if Npad != N else x

    rays = (padr(o[:, 0]), padr(o[:, 1]), padr(o[:, 2]),
            padr(d[:, 0]), padr(d[:, 1]), padr(d[:, 2], 1.0),
            padr(mint), padr(maxt, -1.0))

    grid = (Npad // RAY_BLOCK,)
    ray_spec = pl.BlockSpec((RAY_BLOCK,), lambda i: (i,),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((Tpad // TRI_TILE, TRI_TILE), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [pl.BlockSpec((RAY_BLOCK,), lambda i: (i,),
                              memory_space=pltpu.VMEM)] * 4

    t, idx, u, v = pl.pallas_call(
        functools.partial(_mt_kernel, n_tris=n_tris, any_hit=any_hit),
        grid=grid,
        in_specs=[tri_spec] * 9 + [ray_spec] * 8,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((Npad,), jnp.float32),
            jax.ShapeDtypeStruct((Npad,), jnp.int32),
            jax.ShapeDtypeStruct((Npad,), jnp.float32),
            jax.ShapeDtypeStruct((Npad,), jnp.float32),
        ],
    )(*tri_cols, *rays)
    return t[:N], idx[:N], u[:N], v[:N]
