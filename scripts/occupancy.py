"""Live-lane occupancy of the path-tracer wavefront (VERDICT r2 ask #7).

The wavefront while_loop pays every iteration at full width; the measured
ray counter (live lanes at each intersection site) probed at increasing
max_depth yields the live fraction per bounce — the estimator-shaped
occupancy number that bounds what ray sorting / compaction could recover.
Hardware-independent: runs on CPU.
"""
import os
import sys

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/tests')
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
import numpy as np


def main():
    from mitsuba_nlvrl_tpu.scene.xml import load_file
    from mitsuba_nlvrl_tpu import build_scene
    from mitsuba_nlvrl_tpu.core.rng import Sampler
    from mitsuba_nlvrl_tpu.integrators import path as path_mod
    from mitsuba_nlvrl_tpu.integrators.common import film_sample_positions
    from mitsuba_nlvrl_tpu import sensor as sensor_mod

    path = '/root/reference/data/cbox/cbox.xml'
    desc = load_file(path) if os.path.exists(path) else None
    if desc is None:
        from __graft_entry__ import _tiny_scene
        desc = _tiny_scene(res=128)
    desc['sensor']['film']['width'] = 128
    desc['sensor']['film']['height'] = 128

    rays_at = {}
    for md in range(1, 10):
        desc['integrator'] = {'type': 'path', 'max_depth': md}
        scene, meta = build_scene(desc)
        key = jax.random.PRNGKey(0)
        pos, pos01 = film_sample_positions(meta, key)
        ray, _ = sensor_mod.sample_ray(
            scene, meta, pos01,
            jax.random.uniform(jax.random.fold_in(key, 1),
                               (pos01.shape[0], 2)))
        smp = Sampler.make(jax.random.fold_in(key, 2), pos.shape[0])
        _, _, smp = path_mod.sample(scene, meta, smp, ray)
        rays_at[md] = float(smp.rays)
    N = 128 * 128
    print("bounce  live-lane fraction (isect+NEE rays / 2N)")
    total_live, total_slots = 0.0, 0.0
    prev = 0.0
    for md in range(1, 10):
        d = rays_at[md] - prev
        prev = rays_at[md]
        frac = d / (2 * N)
        total_live += d
        total_slots += 2 * N
        print(f"  {md:2d}     {frac:6.3f}")
    print(f"\nmean occupancy over 9 bounces: {total_live/total_slots:.3f}")
    print("(the wavefront pays every iteration at full width; 1-mean is "
          "the ceiling any compaction/sorting scheme could recover)")


if __name__ == '__main__':
    main()
