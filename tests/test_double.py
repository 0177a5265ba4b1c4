"""Double-precision variant (reference *_double build configs,
resources/mitsuba.conf.template:100-110): enabling x64 must render the
cbox anchor to the same image (f64 vs f32 agree to f32-noise levels) and
keep gradients finite. x64 is a process-global jax switch, so the double
render runs in a SUBPROCESS to avoid leaking into the other tests."""
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys
sys.path.insert(0, %(repo)r); sys.path.insert(0, %(tests)r)
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
from scenes import cornell_box
from mitsuba_nlvrl_tpu import build_scene
from mitsuba_nlvrl_tpu.render import render

desc = cornell_box(spp=4, res=24)
desc['double'] = %(double)s
scene, meta = build_scene(desc)
if %(double)s:
    assert scene.geo.v0.dtype == 'float64', scene.geo.v0.dtype
img = np.asarray(render(scene, meta, seed=3, spp=4))
assert np.isfinite(img).all()
if %(double)s:
    assert img.dtype == np.float64, img.dtype
    # gradient smoke in f64
    from mitsuba_nlvrl_tpu import autodiff as ad
    import jax.numpy as jnp
    pm = ad.traverse(scene)
    def loss(params):
        im = ad.render(scene, meta, params=params, pmap=pm, spp=1, seed=1)
        return jnp.mean(im)
    g = jax.grad(loss)({'bsdfs.params': scene.bsdfs.params})
    gn = float(jnp.abs(g['bsdfs.params']).sum())
    assert np.isfinite(gn) and gn > 0, gn
print(json.dumps({'mean': float(img.mean())}))
"""


def _run(double):
    code = _CHILD % {'repo': REPO, 'tests': os.path.join(REPO, 'tests'),
                     'double': double}
    env = dict(os.environ)
    out = subprocess.run([sys.executable, '-c', code], capture_output=True,
                         text=True, timeout=900, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_double_matches_single():
    m32 = _run(False)['mean']
    m64 = _run(True)['mean']
    # same RNG draws (threefry is integer-exact), same estimator: the two
    # precisions must agree to f32 accumulation noise
    assert abs(m64 - m32) < 2e-3 * max(abs(m32), 1e-6), (m32, m64)
