"""Uniform-vs-cluster VRL selection: variance at equal wall time on the
thesis headline configs (VERDICT r2 ask #3).

For each config and each strategy, renders R independent 1-pass images,
measures wall time and per-pixel variance, and reports
efficiency = 1 / (mean_variance * time_per_pass) — the inverse
work-normalized variance (larger is better). Prints a markdown table to
paste into docs/PERF.md.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')

from mitsuba_nlvrl_tpu.scene.xml import load_file
from mitsuba_nlvrl_tpu import build_scene
from mitsuba_nlvrl_tpu.render import render, preprocess


def het_localized_desc():
    """Heterogeneous localized-light config (VERDICT r4 ask #5): an
    elongated slab of blobby grid density with a point light at one end —
    VRLs concentrate near the light, so segment->VRL importance varies
    orders of magnitude along the slab (the regime the thesis lightcut
    targets, with the het Tr bound active)."""
    from mitsuba_nlvrl_tpu.core import transform as tr
    from mitsuba_nlvrl_tpu.scene.vol_io import VolumeGrid
    zz, yy, xx = np.meshgrid(np.linspace(-1, 1, 16),
                             np.linspace(-1, 1, 16),
                             np.linspace(-1, 1, 48), indexing='ij')
    g = (0.15 + 0.85 * np.exp(-3.0 * (yy ** 2 + zz ** 2)
                              - 0.8 * (xx + 0.4) ** 2)).astype(np.float32)
    vg = VolumeGrid(data=g[..., None],
                    bbox_min=np.float32([-3.9, -0.95, -0.95]),
                    bbox_max=np.float32([3.9, 0.95, 0.95]))
    return {
        'integrator': {'type': 'vrl', 'target_vrls': 8192, 'max_depth': 8,
                       'min_vrl_length': 0.02, 'samples_per_query': 1},
        'sensor': {'type': 'perspective', 'fov': 45.0,
                   'to_world': tr.look_at((0, 0, -10), (0, 0, 0),
                                          (0, 1, 0)),
                   'film': {'width': 128, 'height': 128,
                            'rfilter': {'type': 'box'}},
                   'sampler': {'type': 'independent', 'sample_count': 1}},
        'shapes': [{'type': 'cube', 'bsdf': {'type': 'null'},
                    'interior': {'type': 'heterogeneous',
                                 'sigma_t': {'type': 'gridvolume',
                                             '_grid': vg},
                                 'albedo': 0.9, 'scale': 1.2},
                    'to_world': tr.scale((4.0, 1.0, 1.0))}],
        'emitters': [{'type': 'point', 'position': (-4.6, 0.0, 0.0),
                      'intensity': (40.0, 40.0, 40.0)}],
    }


CONFIGS = [
    ('cbox-nl-homo-vrl',
     '/root/reference/data/scenes/cbox/cbox-nonlinear-homo-vrl.xml'),
    ('het-localized', het_localized_desc),
    ('mirage-vrl', '/root/reference/data/scenes/cbox/mirage-vrl.xml'),
]
R = 6


def run(name, path):
    desc = path() if callable(path) else load_file(path)
    rows = []
    for strategy, over in (('uniform', {'use_light_cut': False}),
                           ('cluster', {'use_light_cut': True})):
        d = dict(desc)
        d['integrator'] = dict(desc['integrator'], **over)
        scene, meta = build_scene(d)
        aux = preprocess(scene, meta, 0)
        jax.block_until_ready(aux)
        img = render(scene, meta, seed=0, spp=1, aux=aux)  # compile
        img.block_until_ready()
        imgs = []
        t0 = time.time()
        for s in range(R):
            imgs.append(render(scene, meta, seed=1 + s, spp=1, aux=aux))
        jax.block_until_ready(imgs)
        dt = (time.time() - t0) / R
        st = np.stack([np.asarray(i) for i in imgs])
        mean = st.mean(0)
        var = float(st.var(0).mean())
        rel_var = float((st.var(0) / np.maximum(mean, 1e-3) ** 2).mean())
        rows.append((strategy, dt, var, rel_var,
                     1.0 / max(var * dt, 1e-12)))
        print(f"{name:18s} {strategy:8s} t/pass={dt:6.2f}s "
              f"var={var:10.4g} relvar={rel_var:8.3g} "
              f"eff=1/(var*t)={rows[-1][4]:10.4g}", flush=True)
    if len(rows) == 2 and rows[0][4] > 0:
        print(f"{name:18s} cluster/uniform equal-time efficiency: "
              f"{rows[1][4] / rows[0][4]:.2f}x", flush=True)
    return rows


def main():
    for name, path in CONFIGS:
        run(name, path)


if __name__ == '__main__':
    main()
