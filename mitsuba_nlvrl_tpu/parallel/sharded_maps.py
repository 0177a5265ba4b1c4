"""Sharded photon / VRL maps across a device mesh.

The renderer analog of tensor parallelism (SURVEY §2.6): when photon/VRL
maps outgrow one chip's HBM (the 4M-photon BASELINE config), their arrays
shard along the photon axis over a 'mp' mesh axis. Density estimates and
VRL queries are SUMS over map entries, so each device folds the full query
wavefront against its shard's hash grid and the partials ``psum`` over ICI
— queries ride the interconnect, rays never move.

Built on ``shard_map``: the per-device body is the same single-chip code
(ops/hashgrid.py, integrators/photon_est.py) over a local shard.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops import hashgrid
from ..integrators import photon_est
from ..integrators.lighttrace import PhotonMaps


def shard_photon_axis(maps: PhotonMaps, mesh: Mesh, axis: str = 'mp'
                      ) -> PhotonMaps:
    """Place map arrays sharded along their photon/VRL axis; grid tables
    are rebuilt per shard inside the query (cheap: argsort of the shard)."""
    n = mesh.shape[axis]

    def shard_leading(x):
        if x.ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] > 1:
            return jax.device_put(
                x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1)))))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(shard_leading, maps)


def make_sharded_volume_estimate(meta, mesh: Mesh, axis: str = 'mp'):
    """Returns fn(scene, maps, x, wo, medium_idx, active, radius) computing
    the volume photon estimate against maps sharded over ``axis``, with the
    partial sums all-reduced over ICI."""

    map_spec = PhotonMaps(
        # photons shard on the leading axis; grids are rebuilt locally so
        # their entries are per-shard too; scalars replicate
        sp_pos=P(axis, None), sp_power=P(axis, None), sp_dir=P(axis, None),
        sp_normal=P(axis, None), sp_depth=P(axis), sp_caustic=P(axis),
        sp_valid=P(axis),
        global_grid=hashgrid.HashGrid(P(axis), P(axis), P(), P(None)),
        caustic_grid=hashgrid.HashGrid(P(axis), P(axis), P(), P(None)),
        sp_scale=P(),
        vp_pos=P(axis, None), vp_power=P(axis, None), vp_dir=P(axis, None),
        vp_depth=P(axis), vp_valid=P(axis),
        vp_grid=hashgrid.HashGrid(P(axis), P(axis), P(), P(None)),
        vp_scale=P(),
        vrl_o=P(axis, None), vrl_d=P(axis, None), vrl_len=P(axis),
        vrl_flux=P(axis, None), vrl_medium=P(axis), vrl_depth=P(axis),
        vrl_direct=P(axis), vrl_valid=P(axis), vrl_scale=P(),
        vrl_count=P(), sp_lost=P(), vp_lost=P(), vrl_lost=P(),
        trunc_paths=P())

    def body(scene, maps_local: PhotonMaps, x, wo, medium_idx, active,
             radius):
        # rebuild the local shard's hash grid (indices into the local shard)
        vp_grid = hashgrid.build(maps_local.vp_pos, maps_local.vp_valid,
                                 maps_local.vp_grid.origin,
                                 maps_local.vp_grid.cell_size)
        maps_local = maps_local._replace(vp_grid=vp_grid)
        est = photon_est.estimate_volume(scene, meta, maps_local, x, wo,
                                         medium_idx, active, radius)
        return jax.lax.psum(est, axis)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(), map_spec, P(), P(), P(), P(), P()),
        out_specs=P(),
        check_rep=False)
    return fn
