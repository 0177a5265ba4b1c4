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
    and the VRL cluster structure are rebuilt per shard inside the query
    (cheap: argsort of the shard), so the global clusters are dropped."""
    n = mesh.shape[axis]
    maps = maps._replace(clusters=None)   # global indices; rebuilt locally

    def shard_leading(x):
        if x.ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] > 1:
            return jax.device_put(
                x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1)))))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(shard_leading, maps)


def localize_maps(scene, maps: PhotonMaps) -> PhotonMaps:
    """Rebuild the per-shard view of sharded maps inside a shard_map body:
    local hash grids (indices into the local photon shards) and the local
    valid-VRL count (deposits are reservoir-packed, so each shard's valid
    entries are a prefix of its slice)."""
    maps = maps._replace(
        global_grid=hashgrid.build(maps.sp_pos,
                                   maps.sp_valid & ~maps.sp_caustic,
                                   maps.global_grid.origin,
                                   maps.global_grid.cell_size),
        caustic_grid=hashgrid.build(maps.sp_pos, maps.sp_caustic,
                                    maps.caustic_grid.origin,
                                    maps.caustic_grid.cell_size),
        vp_grid=hashgrid.build(maps.vp_pos, maps.vp_valid,
                               maps.vp_grid.origin,
                               maps.vp_grid.cell_size),
        vrl_count=jnp.sum(maps.vrl_valid.astype(jnp.int32)))
    return maps


def _maps_spec(axis: str) -> PhotonMaps:
    """PartitionSpec pytree for maps sharded along ``axis``."""
    return PhotonMaps(
        sp_pos=P(axis, None), sp_power=P(axis, None), sp_dir=P(axis, None),
        sp_normal=P(axis, None), sp_depth=P(axis), sp_caustic=P(axis),
        sp_valid=P(axis),
        # grid tables are rebuilt per shard (localize_maps); the spec only
        # has to match shard_photon_axis's physical placement: bucket
        # ranges (H, 2) and order (P,) both split on their leading axis
        global_grid=hashgrid.HashGrid(P(axis, None), P(axis), P(), P(None)),
        caustic_grid=hashgrid.HashGrid(P(axis, None), P(axis), P(),
                                       P(None)),
        sp_scale=P(),
        vp_pos=P(axis, None), vp_power=P(axis, None), vp_dir=P(axis, None),
        vp_depth=P(axis), vp_valid=P(axis),
        vp_grid=hashgrid.HashGrid(P(axis, None), P(axis), P(), P(None)),
        vp_scale=P(), vp_radius=P(axis),
        vrl_o=P(axis, None), vrl_d=P(axis, None), vrl_len=P(axis),
        vrl_flux=P(axis, None), vrl_medium=P(axis), vrl_depth=P(axis),
        vrl_direct=P(axis), vrl_valid=P(axis), vrl_scale=P(),
        vrl_count=P(), vrl_packed=P(axis, None),
        sp_packed=P(axis, None), vp_packed=P(axis, None),
        sp_lost=P(), vp_lost=P(), vrl_lost=P(),
        trunc_paths=P())


def make_sharded_vrl_render(meta, mesh: Mesh, ray_axis: str = 'dp',
                            map_axis: str = 'mp'):
    """The FULL vrl/photonmapper camera pass over a 2D (rays x maps) mesh:
    the ray wavefront shards over ``ray_axis``, the photon/VRL maps over
    ``map_axis``, and every map-derived estimate inside the integrator
    all-reduces over ``map_axis`` (vrl._map_psum). Path decisions use the
    same RNG stream on all map-devices, so the returned radiance is
    replicated along ``map_axis`` and tiles along ``ray_axis``.

    Returns fn(scene, maps_sharded, ray, key) -> (N, 3) radiance.
    """
    import dataclasses
    from ..core.ray import Ray
    from ..core.rng import Sampler
    from ..integrators import vrl as vrl_mod

    meta2 = dataclasses.replace(
        meta, integrator_props=tuple(
            kv for kv in meta.integrator_props if kv[0] != 'map_psum_axis'
        ) + (('map_psum_axis', map_axis),))
    use_pm = meta.integrator in ('photonmapper', 'photonmap')
    sample_fn = vrl_mod.make_sample(use_vrls=not use_pm)
    n_cl = int(meta.iprop('vrl_clusters', 1024))
    use_cut = bool(meta.iprop('use_light_cut', True))

    def body(scene, maps_local: PhotonMaps, ray: Ray, key):
        maps_local = localize_maps(scene, maps_local)
        if use_cut:
            maps_local = maps_local._replace(
                clusters=vrl_mod.build_vrl_clusters(scene, maps_local,
                                                    n_cl))
        # distinct per-ray-shard streams; identical along the map axis so
        # every map-device walks the same camera paths
        key = jax.random.fold_in(key, jax.lax.axis_index(ray_axis))
        sampler = Sampler.make(key, ray.o.shape[0])
        L, _, sampler = sample_fn(scene, meta2, sampler, ray, aux=maps_local)
        return jnp.where(jnp.isfinite(L), L, 0.0)

    ray_in_spec = Ray(o=P(ray_axis, None), d=P(ray_axis, None),
                      mint=P(ray_axis), maxt=P(ray_axis))
    return shard_map(
        body, mesh=mesh,
        in_specs=(P(), _maps_spec(map_axis), ray_in_spec, P()),
        out_specs=P(ray_axis, None),
        check_rep=False)


def make_sharded_volume_estimate(meta, mesh: Mesh, axis: str = 'mp'):
    """Returns fn(scene, maps, x, wo, medium_idx, active, radius) computing
    the volume photon estimate against maps sharded over ``axis``, with the
    partial sums all-reduced over ICI."""

    # photons shard on the leading axis; grids are rebuilt locally so
    # their entries are per-shard too; scalars replicate
    map_spec = _maps_spec(axis)

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
