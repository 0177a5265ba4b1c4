"""Big-mesh render anchor: does the cluster sweep win END-TO-END?

VERDICT r3 weak #4: the cluster sweep (ops/isect_clusters.py) only ever
ran in the icosphere microbench — the largest reference mesh (bunny.ply,
69,451 faces) sits below the MNT_CLUSTER_MIN=262144 crossover, so no
production render exercised the TPU default. This script builds a
bunny FIELD (a 3x3 grid of instanced bunnies, ~625k tris — the role of
kdtree.h:2069-2299's big-mesh regime) and renders it with the plain path
integrator twice in SUBPROCESSES (MNT_CLUSTER_MIN is read at import):

  * dense  — MNT_CLUSTER_MIN=1e9 forces the dense triangle sweep
  * cluster — the shipped default engages the cluster sweep

and reports per-pass wall time + measured Mrays/s for a PERF.md row.
Images are cross-checked (same sampler seeds -> same estimator; the two
traversals are bit-parity per test_bvh4.py, so images must match).
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BUNNY = '/root/reference/data/common/meshes/bunny.ply'
RES = 256
SPP = 4


def scene_desc():
    from mitsuba_nlvrl_tpu.core import transform as tr
    shapes = []
    for i in range(3):
        for j in range(3):
            shapes.append({
                'type': 'ply', 'filename': BUNNY,
                'to_world': tr.translate((1.6 * (i - 1), 0.0,
                                          1.6 * (j - 1)))})
    shapes.append({'type': 'rectangle',
                   'to_world': tr.translate((0, 0, 0))
                   @ tr.rotate((1, 0, 0), -90.0) @ tr.scale(6.0),
                   'bsdf': {'type': 'diffuse',
                            'reflectance': (0.6, 0.6, 0.6)}})
    return {
        'integrator': {'type': 'path', 'max_depth': 5},
        'sensor': {'type': 'perspective', 'fov': 45.0,
                   'to_world': tr.look_at((3.2, 3.2, 3.2),
                                          (0.0, 0.4, 0.0), (0, 1, 0)),
                   'film': {'width': RES, 'height': RES,
                            'rfilter': {'type': 'box'}},
                   'sampler': {'type': 'independent',
                               'sample_count': SPP}},
        'shapes': shapes,
        'emitters': [{'type': 'constant', 'radiance': (0.7, 0.8, 1.0)}],
    }


def child():
    import numpy as np
    from mitsuba_nlvrl_tpu import build_scene
    from mitsuba_nlvrl_tpu.render import render

    scene, meta = build_scene(scene_desc())
    img = render(scene, meta, seed=0, spp=SPP)     # compile + warm
    np.asarray(img)
    stats = []
    t0 = time.time()
    img = render(scene, meta, seed=1, spp=SPP, ray_stats=stats)
    img.block_until_ready()
    dt = time.time() - t0
    rays = float(np.asarray(sum(stats)))
    print(json.dumps({
        'mode': 'cluster' if int(os.environ.get('MNT_CLUSTER_MIN', '0')
                                 or 262144) <= meta.n_tris else 'dense',
        'n_tris': int(meta.n_tris), 'wall_s': round(dt, 3),
        'mrays_s': round(rays / dt / 1e6, 3),
        'img_mean': float(np.asarray(img).mean())}))


def main():
    for name, env_min in (('dense', '1000000000'), ('cluster', None)):
        env = dict(os.environ)
        if env_min is not None:
            env['MNT_CLUSTER_MIN'] = env_min
        else:
            env.pop('MNT_CLUSTER_MIN', None)
        r = subprocess.run(
            [sys.executable, '-u', os.path.abspath(__file__), '--child'],
            capture_output=True, text=True, timeout=900, env=env,
            cwd=REPO)
        line = [l for l in r.stdout.strip().splitlines()
                if l.startswith('{')]
        print(name, line[-1] if line else ('FAILED: '
                                           + (r.stderr or '')[-400:]),
              flush=True)


if __name__ == '__main__':
    if '--child' in sys.argv:
        child()
    else:
        main()
