"""Real multi-process jax.distributed validation: two OS processes, four
virtual CPU devices each, one global 8-device mesh with cross-process
(Gloo) collectives. The DP-sharded renderer must produce a finite image
that is BIT-IDENTICAL on both processes and to a single-process render on
the same 8-device mesh (the global-mesh program does not depend on how
devices map to processes).

This is the harness for BASELINE's 1-chip -> N-host scaling north star:
the same init_distributed + make_mesh + render_distributed path runs
unchanged on real multi-host TPU pods (parallel/scaling.py:26-37)."""
import os
import re
import subprocess
import sys
import textwrap

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
    import jax
    jax.config.update('jax_platforms', 'cpu')
    pid = int(sys.argv[1]); port = sys.argv[2]
    jax.distributed.initialize(f'localhost:{port}', num_processes=2,
                               process_id=pid)
    sys.path.insert(0, %(repo)r); sys.path.insert(0, %(tests)r)
    import numpy as np
    from scenes import cornell_box
    from mitsuba_nlvrl_tpu import build_scene
    from mitsuba_nlvrl_tpu.parallel.render_dist import (make_mesh,
                                                        render_distributed)
    scene, meta = build_scene(cornell_box(spp=4, res=32))
    assert jax.process_count() == 2 and jax.device_count() == 8
    img = render_distributed(scene, meta, make_mesh(), seed=1, spp=4)
    arr = np.asarray(img.addressable_data(0))
    assert np.isfinite(arr).all()
    print(f'RESULT {pid} {float(arr.mean()):.9f}', flush=True)
""") % {'repo': REPO, 'tests': os.path.join(REPO, 'tests')}


def test_two_process_distributed_render_matches_single():
    env = dict(os.environ)
    env.pop('PYTHONPATH', None)          # skip the axon sitecustomize
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
    port = '12461'
    procs = [subprocess.Popen([sys.executable, '-c', _WORKER, str(i), port],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    means = {}
    for out, p in zip(outs, procs):
        assert p.returncode == 0, out[-2000:]
        mm = re.search(r'RESULT (\d) ([0-9.]+)', out)
        assert mm, out[-2000:]
        means[int(mm.group(1))] = float(mm.group(2))
    assert set(means) == {0, 1}
    # both processes see the identical replicated film
    assert means[0] == means[1]

    # single-process render on an 8-device mesh must agree bit-for-bit
    single = textwrap.dedent("""
        import os, sys
        os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
        import jax
        jax.config.update('jax_platforms', 'cpu')
        sys.path.insert(0, %(repo)r); sys.path.insert(0, %(tests)r)
        import numpy as np
        from scenes import cornell_box
        from mitsuba_nlvrl_tpu import build_scene
        from mitsuba_nlvrl_tpu.parallel.render_dist import (
            make_mesh, render_distributed)
        scene, meta = build_scene(cornell_box(spp=4, res=32))
        img = render_distributed(scene, meta, make_mesh(), seed=1, spp=4)
        print(f'RESULT S {float(np.asarray(img).mean()):.9f}', flush=True)
    """) % {'repo': REPO, 'tests': os.path.join(REPO, 'tests')}
    out = subprocess.run([sys.executable, '-c', single], env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    ms = float(re.search(r'RESULT S ([0-9.]+)', out.stdout).group(1))
    assert abs(ms - means[0]) < 1e-9


def test_dp_pass_folding_unbiased():
    """render_distributed folds passes into the lane dimension
    (render_dist.dp_fold_for); the folded estimator is the same Monte
    Carlo sum — its mean must match the unfolded render to MC noise,
    and fold=1 must reproduce the old one-pass-per-dispatch behavior."""
    import numpy as np
    import jax
    from scenes import cornell_box
    from mitsuba_nlvrl_tpu import build_scene
    from mitsuba_nlvrl_tpu.parallel.render_dist import (
        make_mesh, render_distributed, dp_fold_for)
    scene, meta = build_scene(cornell_box(spp=8, res=32))
    mesh = make_mesh()
    assert dp_fold_for(meta, mesh, 8) >= 4   # small shard -> folds engage
    img_f = np.asarray(render_distributed(scene, meta, mesh, seed=3, spp=8,
                                          fold=4))
    img_1 = np.asarray(render_distributed(scene, meta, mesh, seed=3, spp=8,
                                          fold=1))
    assert np.isfinite(img_f).all() and np.isfinite(img_1).all()
    # same estimator, different sample layout: means agree to MC noise
    assert abs(img_f.mean() - img_1.mean()) / img_1.mean() < 0.05


def test_measure_fold_smoke():
    """measure_fold (the end-to-end sharded-path timing the bench proxies
    run on hardware) completes on a 1-device CPU mesh and returns the
    full contract dict with sane values."""
    from scenes import cornell_box
    from mitsuba_nlvrl_tpu import build_scene
    from mitsuba_nlvrl_tpu.parallel.render_dist import measure_fold
    scene, meta = build_scene(cornell_box(spp=2, res=24))
    rec = measure_fold(scene, meta, folds=2, reps=1)
    for k in ('latency_fold_s', 'wall_fold_s', 'wall_nofold_s',
              'kernel_s', 'ratio', 'speedup'):
        assert k in rec and rec[k] > 0, (k, rec)
    assert rec['pixels'] == 24 * 24 and rec['folds'] == 2
