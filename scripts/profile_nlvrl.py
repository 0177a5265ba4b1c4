"""Ablation profile of the cbox-nonlinear-homo-vrl camera pass on TPU."""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')

from mitsuba_nlvrl_tpu.scene.xml import load_file
from mitsuba_nlvrl_tpu import build_scene
from mitsuba_nlvrl_tpu.render import _render_band, preprocess

BAND = 64  # rows (x512 = 32768 lanes)


def time_band(scene, meta, aux, label, n=2):
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    L, _, nrays = _render_band(scene, meta, key, jnp.uint32(100), BAND,
                               'vrl', aux, jnp.uint32(0))
    L.block_until_ready()
    compile_s = time.time() - t0
    ts = []
    for i in range(n):
        t0 = time.time()
        L, _, nrays = _render_band(scene, meta, jax.random.fold_in(key, i),
                                   jnp.uint32(100), BAND, 'vrl', aux,
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
    desc = load_file(
        '/root/reference/data/scenes/cbox/cbox-nonlinear-homo-vrl.xml')
    scene, meta = build_scene(desc)
    t0 = time.time()
    aux = preprocess(scene, meta, 0)
    jax.block_until_ready(aux)
    print(f"preprocess: {time.time()-t0:.1f}s", flush=True)

    from mitsuba_nlvrl_tpu.integrators import vrl as vrl_mod
    from mitsuba_nlvrl_tpu.integrators import photon_est
    from mitsuba_nlvrl_tpu.medium import nonlinear as nl_mod

    t_full = time_band(scene, meta, aux, 'full')

    real_q = vrl_mod.query_vrls

    def q_stub(scene, meta, maps, o, d, ln, midx, ch, smp, ok, spq,
               strategy='cluster'):
        return jnp.zeros((o.shape[0], 3)), smp

    vrl_mod.query_vrls = q_stub
    jax.clear_caches()
    t_noq = time_band(scene, meta, aux, 'no VRL queries')

    real_ev = photon_est.estimate_volume

    def ev_stub(scene, meta, maps, p, wi, midx, ok, radius):
        return jnp.zeros((p.shape[0], 3))

    photon_est.estimate_volume = ev_stub
    jax.clear_caches()
    t_noq_nov = time_band(scene, meta, aux, 'no VRL + no vol-gather')

    real_es = photon_est.estimate_surface

    def es_stub(scene, meta, maps, si, ok, radius, caustic):
        return jnp.zeros((si.p.shape[0], 3))

    photon_est.estimate_surface = es_stub
    jax.clear_caches()
    t_min = time_band(scene, meta, aux, 'no queries/gathers at all')

    photon_est.estimate_surface = real_es
    photon_est.estimate_volume = real_ev
    vrl_mod.query_vrls = real_q

    print(f"\nattribution (of {t_full:.2f}s):")
    print(f"  VRL queries            : {t_full - t_noq:7.3f}s")
    print(f"  volume photon gathers  : {t_noq - t_noq_nov:7.3f}s")
    print(f"  surface photon gathers : {t_noq_nov - t_min:7.3f}s")
    print(f"  base (bend+isect+bsdf) : {t_min:7.3f}s")


if __name__ == '__main__':
    main()
