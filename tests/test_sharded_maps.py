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
