"""Sharded photon-map queries: psum over map shards must reproduce the
single-device estimate (the multi-host map-sharding gate of BASELINE)."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from scenes import cornell_box
from mitsuba_nlvrl_tpu import build_scene
from mitsuba_nlvrl_tpu.integrators import lighttrace


def test_sharded_volume_estimate_matches_single():
    from mitsuba_nlvrl_tpu.parallel.sharded_maps import (
        shard_photon_axis, make_sharded_volume_estimate)
    from mitsuba_nlvrl_tpu.integrators import photon_est

    med = {'type': 'homogeneous', 'sigma_t': 0.4, 'albedo': 0.9}
    desc = cornell_box(spp=1, res=8, integrator={'type': 'vrl'}, medium=med)
    scene, meta = build_scene(desc)
    raw = lighttrace.shoot(scene, meta, jax.random.PRNGKey(0),
                           n_paths=1024, max_depth=6, min_vrl_len=0.0,
                           vp_all_scatters=True, sp_cap=4096, vp_cap=4096,
                           vrl_cap=1024)
    r = 0.12
    maps = lighttrace.build_maps(scene, meta, raw, 0.2, 0.1, r)

    # query points inside the medium
    key = jax.random.PRNGKey(3)
    N = 64
    x = jax.random.uniform(key, (N, 3), minval=-0.8, maxval=0.8)
    wo = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (N, 1))
    midx = jnp.zeros((N,), jnp.int32)
    act = jnp.ones((N,), bool)

    ref = np.asarray(photon_est.estimate_volume(scene, meta, maps, x, wo,
                                                midx, act, r))

    devs = jax.devices()
    mesh = Mesh(np.asarray(devs), ('mp',))
    maps_sh = shard_photon_axis(maps, mesh)
    fn = make_sharded_volume_estimate(meta, mesh)
    out = np.asarray(fn(scene, maps_sh, x, wo, midx, act,
                        jnp.full((N,), r)))
    assert ref.sum() > 0
    assert np.allclose(out, ref, rtol=2e-4, atol=1e-6), \
        np.abs(out - ref).max()


def test_sharded_vrl_render_2d_mesh():
    """The FULL vrl camera pass on a 2D (dp x mp) mesh: rays data-parallel,
    maps tensor-parallel with in-integrator psum (VERDICT r1 item 7). The
    result must be finite, positive, and identical when the map axis is
    trivial vs sharded (same RNG stream on every map-device)."""
    from mitsuba_nlvrl_tpu.parallel.sharded_maps import (
        shard_photon_axis, make_sharded_vrl_render)
    from mitsuba_nlvrl_tpu.integrators import vrl as vrl_mod
    from mitsuba_nlvrl_tpu import sensor as sensor_mod
    from mitsuba_nlvrl_tpu.integrators.common import film_sample_positions

    med = {'type': 'homogeneous', 'sigma_t': 0.6, 'albedo': 0.9}
    desc = cornell_box(spp=1, res=8,
                       integrator={'type': 'vrl', 'max_depth': 5,
                                   'samples_per_query': 1,
                                   'max_cam_iters': 6,
                                   'gather_points_cap': 8,
                                   'vrl_clusters': 16,
                                   'min_vrl_length': 0.02},
                       medium=med)
    scene, meta = build_scene(desc)
    maps = vrl_mod.preprocess(scene, meta, jax.random.PRNGKey(1))
    assert int(maps.vrl_count) > 64   # the sharded query must have work

    key = jax.random.PRNGKey(2)
    _, pos01 = film_sample_positions(meta, key)
    ray, _ = sensor_mod.sample_ray(
        scene, meta, pos01,
        jax.random.uniform(jax.random.fold_in(key, 1),
                           (pos01.shape[0], 2)))

    def run(n_dp, n_mp, seed):
        devs = np.asarray(jax.devices()[:n_dp * n_mp]).reshape(n_dp, n_mp)
        mesh = Mesh(devs, ('dp', 'mp'))
        maps_sh = shard_photon_axis(maps, mesh, 'mp')
        fn = jax.jit(make_sharded_vrl_render(meta, mesh))
        return np.asarray(fn(scene, maps_sh, ray,
                             jax.random.PRNGKey(seed)))

    L22 = np.stack([run(2, 2, s) for s in range(4)])
    assert np.isfinite(L22).all() and L22.mean() > 0
    # the map partition is a sum decomposition with per-shard VRL
    # selection: a different (unbiased) estimator than the unsharded
    # query, so the comparison is statistical — means over seeds agree
    L21 = np.stack([run(2, 1, s) for s in range(4)])
    rel = abs(L22.mean() - L21.mean()) / max(L21.mean(), 1e-9)
    assert rel < 0.15, (L22.mean(), L21.mean())
