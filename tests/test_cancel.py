"""Cooperative cancellation / timeout / partial develop (reference
Integrator::should_stop integrator.h:148-150 + the SIGHUP partial-film
dump mitsuba.cpp:114-123). The weight-channel develop makes a partial
accumulation correctly normalized at any pass count."""
import os
import signal
import subprocess
import sys

import numpy as np

from mitsuba_nlvrl_tpu import build_scene, render


def _desc(spp=32):
    return {
        'shapes': [{'type': 'rectangle',
                    'bsdf': {'type': 'diffuse', 'reflectance': 0.7}}],
        'emitters': [{'type': 'constant', 'radiance': 1.0}],
        'sensor': {'type': 'perspective',
                   'film': {'width': 8, 'height': 8},
                   'sampler': {'type': 'independent', 'sample_count': spp}},
        'integrator': {'type': 'direct'},
    }


def test_should_stop_partial_develop():
    scene, meta = build_scene(_desc())
    calls = {'n': 0}

    def stop_after_3():
        calls['n'] += 1
        return calls['n'] >= 3

    info = {}
    img = np.asarray(render(scene, meta, spp=32, seed=1,
                            should_stop=stop_after_3, info=info))
    assert info['stopped_early']
    assert info['passes_done'] == 3
    # partial image is correctly normalized, not 3/32 darker
    full = np.asarray(render(scene, meta, spp=32, seed=1))
    np.testing.assert_allclose(img.mean(), full.mean(), rtol=0.05)


def test_timeout_zero_stops_after_first_pass():
    scene, meta = build_scene(_desc())
    info = {}
    img = np.asarray(render(scene, meta, spp=16, seed=2, timeout=0.0,
                            info=info))
    assert info['passes_done'] == 1 and info['stopped_early']
    assert np.isfinite(img).all() and img.max() > 0


def test_on_pass_callback_develops():
    scene, meta = build_scene(_desc())
    partials = []

    def on_pass(p, develop):
        if p == 1:
            partials.append(np.asarray(develop()))

    full = np.asarray(render(scene, meta, spp=4, seed=3, on_pass=on_pass))
    assert len(partials) == 1
    np.testing.assert_allclose(partials[0].mean(), full.mean(), rtol=0.1)


def test_cli_timeout(tmp_path):
    # end-to-end: the CLI stops at the timeout and still writes the film
    xml = tmp_path / 'scene.xml'
    xml.write_text("""<scene version="2.0.0">
      <integrator type="direct"/>
      <sensor type="perspective">
        <film type="hdrfilm">
          <integer name="width" value="8"/>
          <integer name="height" value="8"/>
        </film>
        <sampler type="independent">
          <integer name="sample_count" value="64"/>
        </sampler>
      </sensor>
      <shape type="rectangle"/>
      <emitter type="constant"/>
    </scene>""")
    out = tmp_path / 'out.exr'
    env = dict(os.environ, JAX_PLATFORMS='cpu', PYTHONPATH='')
    r = subprocess.run(
        [sys.executable, '-m', 'mitsuba_nlvrl_tpu', str(xml),
         '-o', str(out), '--timeout', '0'],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert 'PARTIAL' in r.stdout
    assert out.exists()
