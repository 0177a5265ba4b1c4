"""Decomposition-tracking datum on a brain-class medium (VERDICT r4 #5).

The brain anchor's marble medium (reference data/brain/brain.xml:88-92,
homogeneous scale 1000) stands for the DENSE SMOOTH medium class; its
heterogeneous analog — a smooth near-uniform density at high optical
depth — is where decomposition tracking (medium._majorant_walk
track=True, block-min control) should collapse the residual event rate:
per block the analytic control collision absorbs ~min/max of the events
and the loop only iterates the residual.

This script builds exactly that field (64^3 smoothly varying 0.6-1.0,
sigma scale 300 => tau ~ hundreds across the volume), runs the fused
delta-tracking distance sampler over a wavefront, and reports wall time
AND executed walk iterations with the control ON (default) vs OFF
(MNT_DECOMP=0 -> plain delta tracking) — each mode in its own
subprocess because the switch is a module constant. The hetvol smoke is
the published negative control (bmin ~ 0 almost everywhere: measured
residual/max 0.99, docs/PERF.md r4).

Run on the TPU: python scripts/bench_decomp.py
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r'''
import os, time, json
import numpy as np
import jax, jax.numpy as jnp
import sys
sys.path.insert(0, %r)
from mitsuba_nlvrl_tpu import build_scene
from mitsuba_nlvrl_tpu import medium as med
from mitsuba_nlvrl_tpu.core.ray import Ray
from mitsuba_nlvrl_tpu.core.rng import Sampler
from mitsuba_nlvrl_tpu.core import transform as tr
from mitsuba_nlvrl_tpu.scene.vol_io import VolumeGrid

# brain-class field: smooth, dense everywhere (block min ~ block max)
zz, yy, xx = np.meshgrid(*[np.linspace(-1, 1, 64)] * 3, indexing='ij')
g = (0.8 + 0.2 * np.sin(2.1 * xx) * np.cos(1.7 * yy)
     * np.cos(1.3 * zz)).astype(np.float32)
vg = VolumeGrid(data=g[..., None], bbox_min=np.float32([-1, -1, -1]),
                bbox_max=np.float32([1, 1, 1]))
desc = {
    'integrator': {'type': 'volpath', 'max_depth': 4},
    'sensor': {'type': 'perspective', 'fov': 45.0,
               'to_world': tr.look_at((0, 0, -4), (0, 0, 0), (0, 1, 0)),
               'film': {'width': 8, 'height': 8,
                        'rfilter': {'type': 'box'}},
               'sampler': {'type': 'independent', 'sample_count': 1}},
    'shapes': [{'type': 'cube', 'bsdf': {'type': 'null'},
                'interior': {'type': 'heterogeneous',
                             'sigma_t': {'type': 'gridvolume', '_grid': vg},
                             'albedo': 0.9, 'scale': 300.0}}],
    'emitters': [{'type': 'constant', 'radiance': (1.0, 1.0, 1.0)}],
}
scene, meta = build_scene(desc)
N = 16384
rng = np.random.default_rng(3)
o = jnp.asarray(np.stack([rng.uniform(-0.6, 0.6, N),
                          rng.uniform(-0.6, 0.6, N),
                          np.full(N, -2.0)], -1), jnp.float32)
d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (N, 1))
ray = Ray(o, d, jnp.zeros(N), jnp.full(N, jnp.inf))
midx = jnp.zeros(N, jnp.int32)
ch = jnp.zeros(N, jnp.int32)
act = jnp.ones(N, bool)

def walk_stats(track, scale):
    from mitsuba_nlvrl_tpu.scene.types import M_SCALE, M_MAJORANT
    P0 = scene.media.params
    P1 = P0.at[:, M_SCALE].set(scale)
    P1 = P1.at[:, M_MAJORANT:M_MAJORANT + 3].set(
        P0[:, M_MAJORANT:M_MAJORANT + 3] / P0[:, M_SCALE:M_SCALE + 1]
        * scale)
    sc = scene._replace(media=scene.media._replace(params=P1))

    @jax.jit
    def one(key):
        aabb_hit, mint, maxt = med.intersect_aabb(sc, meta, midx, ray)
        mint2 = jnp.maximum(ray.mint, mint)
        maxt2 = jnp.minimum(jnp.where(track, ray.maxt, maxt), maxt)
        t, w, found, dens, mj, still, trips = med._majorant_walk(
            sc, meta, ray, key, ch, midx, mint2, maxt2,
            act & aabb_hit & (maxt2 > mint2), track=track,
            max_steps=4096, diff=False)
        return found.sum(), w.mean(), trips

    f, wm, trips = one(jax.random.PRNGKey(0))     # compile
    f.block_until_ready()
    R = 8
    t0 = time.time()
    tot_trips = 0
    for i in range(R):
        f, wm, trips = one(jax.random.PRNGKey(1 + i))
        tot_trips += int(trips)
    f.block_until_ready()
    dt = (time.time() - t0) / R
    return {
        'mode': 'distance' if track else 'transmittance',
        'scale': scale,
        'decomp': os.environ.get('MNT_DECOMP', '1'),
        'wall_ms_per_walk': round(dt * 1e3, 2),
        'max_lane_events': tot_trips / R,
        'found_frac': float(f) / N,
        'backend': jax.default_backend(),
    }

# distance sampling in the dense regime (brain marble, scale 300) and
# the transmittance walk in the moderate regime (tau ~ 2.5, above the
# walk-RR cutoff) — the two arms where decomposition could plausibly pay
print(json.dumps(walk_stats(True, 300.0)))
print(json.dumps(walk_stats(False, 1.5)))
''' % REPO


def main():
    for mode in ('1', '0'):
        env = dict(os.environ)
        env['MNT_DECOMP'] = mode
        out = subprocess.run([sys.executable, '-u', '-c', CHILD],
                             capture_output=True, text=True, timeout=600,
                             env=env, cwd=REPO)
        lines = [l for l in out.stdout.splitlines() if l.startswith('{')]
        for l in lines or [out.stderr[-400:]]:
            print(l, flush=True)


if __name__ == '__main__':
    main()
