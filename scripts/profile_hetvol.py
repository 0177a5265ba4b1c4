"""Ablation profile of the hetvol volpath band on the real TPU.

Times one 32768-ray band end-to-end, then re-times it with individual
cost centers stubbed out (NEE transmittance walk, MIS emission walk,
medium real-collision sampler) to attribute where the wall time goes.
Run ON the TPU (no JAX_PLATFORMS=cpu).
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')

from mitsuba_nlvrl_tpu.scene.xml import load_file
from mitsuba_nlvrl_tpu import build_scene
from mitsuba_nlvrl_tpu.render import _render_band
from mitsuba_nlvrl_tpu.integrators import volpath

BAND = int(sys.argv[1]) if len(sys.argv) > 1 else 42  # rows (42*768=32256)


def time_band(scene, meta, label, n=3):
    key = jax.random.PRNGKey(0)
    # compile
    t0 = time.time()
    L, _, nrays = _render_band(scene, meta, key, jnp.uint32(200), BAND,
                               'volpath', None, jnp.uint32(0))
    L.block_until_ready()
    compile_s = time.time() - t0
    ts = []
    for i in range(n):
        t0 = time.time()
        L, _, nrays = _render_band(scene, meta, jax.random.fold_in(key, i),
                                   jnp.uint32(200), BAND, 'volpath', None,
                                   jnp.uint32(1 + i))
        L.block_until_ready()
        ts.append(time.time() - t0)
    rays = float(nrays)
    best = min(ts)
    print(f"{label:28s} compile={compile_s:6.1f}s run={best:7.3f}s "
          f"rays={rays/1e6:6.2f}M -> {rays/best/1e6:7.3f} Mrays/s",
          flush=True)
    return best


def main():
    desc = load_file('/root/reference/data/hetvol/hetvol.xml')
    scene, meta = build_scene(desc)

    t_full = time_band(scene, meta, 'full')

    # stub out the NEE transmittance walk (both the general walk and the
    # round-4 single-segment fast path)
    real_tr = volpath.transmittance_to_point
    real_tr_s = volpath.transmittance_to_point_single
    real_em = volpath.trace_emission
    real_med = volpath.sample_real_interaction \
        if hasattr(volpath, 'sample_real_interaction') else None

    def tr_stub(scene, meta, sampler, p_ref, d, dist, medium_idx, channel,
                active, on_medium, diff=False):
        return jnp.ones((p_ref.shape[0], 3)), sampler

    def tr_stub_single(scene, meta, sampler, p_ref, d, dist, channel,
                       active, diff=False):
        return jnp.ones((p_ref.shape[0], 3)), sampler

    def em_stub(scene, meta, sampler, ray_in, medium_idx, p_ref, channel,
                active, diff=False):
        N = p_ref.shape[0]
        return jnp.zeros((N, 3)), jnp.zeros((N,)), sampler

    volpath.transmittance_to_point = tr_stub
    volpath.transmittance_to_point_single = tr_stub_single
    jax.clear_caches()
    t_no_tr = time_band(scene, meta, 'no NEE-transmittance walk')

    volpath.trace_emission = em_stub
    jax.clear_caches()
    t_no_both = time_band(scene, meta, 'no NEE walk + no MIS walk')

    volpath.transmittance_to_point = real_tr
    volpath.transmittance_to_point_single = real_tr_s
    jax.clear_caches()
    t_no_em = time_band(scene, meta, 'no MIS emission walk')

    volpath.trace_emission = real_em

    # stub the medium sampler's inner loop: sample one majorant event
    from mitsuba_nlvrl_tpu import medium as medium_mod
    real_sri = medium_mod.sample_real_interaction

    def sri_stub(scene, meta, ray, sampler, channel, medium_idx, active,
                 max_steps=4096, diff=False):
        u, sampler = sampler.next_1d()
        mi, mint = medium_mod.sample_interaction(
            scene, meta, ray, u, channel, medium_idx, active)
        return mi, jnp.ones((ray.o.shape[0], 3)), sampler

    medium_mod.sample_real_interaction = sri_stub
    volpath.transmittance_to_point = tr_stub
    volpath.transmittance_to_point_single = tr_stub_single
    volpath.trace_emission = em_stub
    jax.clear_caches()
    t_min = time_band(scene, meta, 'walks+medium all stubbed')

    medium_mod.sample_real_interaction = real_sri
    volpath.transmittance_to_point = real_tr
    volpath.transmittance_to_point_single = real_tr_s
    volpath.trace_emission = real_em

    print(f"\nattribution (of {t_full:.2f}s):")
    print(f"  NEE transmittance walks : {t_full - t_no_tr:7.3f}s")
    print(f"  MIS emission walks      : {t_full - t_no_em:7.3f}s")
    print(f"  medium collision loop   : {t_no_both - t_min:7.3f}s")
    print(f"  base (isect+bsdf+splat) : {t_min:7.3f}s")

    # scheduler comparison (round 5): the banded path drains fixed bands
    # to the max-lane tail; the regeneration scheduler keeps one small
    # wavefront full and pipelines dispatches (integrators/regen.py)
    import os
    from mitsuba_nlvrl_tpu.render import render
    print("\nscheduler comparison (full 768x576 film, 1 pass):")
    for mode, label in (('0', 'banded'), ('1', 'regen')):
        os.environ['MNT_REGEN'] = mode
        jax.clear_caches()
        render(scene, meta, seed=0, spp=1).block_until_ready()  # compile
        stats = []
        t0 = time.time()
        render(scene, meta, seed=1, spp=1,
               ray_stats=stats).block_until_ready()
        dt = time.time() - t0
        import numpy as np
        rays = float(np.asarray(sum(stats)))
        print(f"  {label:8s} {dt:7.2f}s  {rays / dt / 1e6:7.3f} Mrays/s",
              flush=True)
    os.environ.pop('MNT_REGEN', None)


if __name__ == '__main__':
    main()
