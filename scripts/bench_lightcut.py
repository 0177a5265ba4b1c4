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

CONFIGS = [
    ('cbox-nl-homo-vrl',
     '/root/reference/data/scenes/cbox/cbox-nonlinear-homo-vrl.xml'),
    ('mirage-vrl', '/root/reference/data/scenes/cbox/mirage-vrl.xml'),
]
R = 6


def run(name, path):
    desc = load_file(path)
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
