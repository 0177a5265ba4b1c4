"""Smoke sweep over the reference's own test-scene corpus
(/root/reference/data/tests/scenes/*): every scene must load through the
XML front-end, build, preprocess, and render finite non-negative pixels.
This exercises <path>/<include> resolution, named IORs, mesh attributes
(vertex/face), textured mask opacity/blend weights, projector/spot
emitters, instancing, and the moment-wrapped photonmapper configs the
reference gates with test_renders.py."""
import glob
import os

import numpy as np
import pytest

ROOT = '/root/reference/data/tests/scenes'
# orthographic: no such sensor plugin exists in this fork
# (src/sensors/ has perspective/thinlens/radiancemeter/irradiancemeter)
SKIP = {'test_orthographic.xml'}

SCENES = [p for p in sorted(glob.glob(os.path.join(ROOT, '*/*.xml')))
          if os.path.basename(p) not in SKIP]


@pytest.mark.parametrize(
    'path', SCENES, ids=['/'.join(p.split('/')[-2:]) for p in SCENES])
def test_reference_scene_renders(path):
    from mitsuba_nlvrl_tpu import build_scene
    from mitsuba_nlvrl_tpu.scene.xml import load_file
    from mitsuba_nlvrl_tpu.render import render, preprocess
    d = load_file(path)
    d['sensor']['film']['width'] = 24
    d['sensor']['film']['height'] = 18
    inner = d['integrator'].get('integrator', d['integrator'])
    if isinstance(inner, dict):
        inner['max_depth'] = min(int(inner.get('max_depth', 8) or 8), 8)
    scene, meta = build_scene(d)
    aux = preprocess(scene, meta, 0)
    img = np.asarray(render(scene, meta, spp=1, seed=0, aux=aux))
    assert np.isfinite(img).all()
    assert img.mean() > 0, "black render"


THESIS_DIR = '/root/reference/data/scenes/cbox'
# every runnable thesis config in data/scenes/cbox (the golden z-test
# suite separately gates the headline anchors at higher fidelity);
# cbox-nonlinear-homo.xml is the include-only base (no integrator, light
# 800 units below the box -> black by construction) and cboxtest is a
# leftover variant both listed for loader coverage only
THESIS = [
    'cbox-caustic.xml', 'cbox-heterogeneous-pm.xml',
    'cbox-heterogeneous-volpath.xml', 'cbox-heterogeneous-vrl.xml',
    'cbox-rgb.xml', 'cbox-spectral.xml', 'cbox-volume.xml',
    'cbox-volume-nl.xml', 'cbox-volume-nl-pm.xml',
    'cbox-volume-nl-volpath.xml', 'cbox-volume-nl-vrl.xml',
    'cbox-volume-pm.xml', 'cbox-volume-volpath.xml', 'cbox-volume-vrl.xml',
    'cboxtest.xml', 'hetero-scene.xml', 'homo-scene.xml',
    'inferiormirage-pm.xml', 'inferiormirage-volpath.xml',
    'inferiormirage-vrl.xml', 'mirage.xml',
]
NONBLACK = {n for n in THESIS
            if n not in ('cbox-volume-nl.xml', 'cbox-volume.xml')}


@pytest.mark.parametrize('name', THESIS)
def test_thesis_scene_renders(name):
    from golden_scenes import SUBSTITUTIONS
    from mitsuba_nlvrl_tpu import build_scene
    from mitsuba_nlvrl_tpu.scene.xml import load_file
    from mitsuba_nlvrl_tpu.render import render, preprocess
    subs = dict(SUBSTITUTIONS)
    subs['water.obj'] = f'{THESIS_DIR}/meshes/angled_cube.obj'
    d = load_file(os.path.join(THESIS_DIR, name), substitutions=subs)
    d['sensor']['film']['width'] = 24
    d['sensor']['film']['height'] = 16
    it = d.get('integrator') or {'type': 'path'}
    d['integrator'] = it
    inner = it.get('integrator', it)
    if isinstance(inner, dict):
        for k, v in (('target_vrls', 800), ('global_photons', 20000),
                     ('volume_photons', 20000), ('caustic_photons', 20000)):
            if k in inner:
                inner[k] = min(int(inner[k]), v)
        inner['max_depth'] = min(int(inner.get('max_depth', 8) or 8), 8)
        inner['max_cam_iters'] = 8
        inner['gather_points_cap'] = 8
        inner['samples_per_query'] = 1
    scene, meta = build_scene(d)
    aux = preprocess(scene, meta, 0)
    img = np.asarray(render(scene, meta, spp=1, seed=0, aux=aux))
    assert np.isfinite(img).all()
    if name in NONBLACK:
        assert img.mean() > 0, "black render"


# remaining scene directories: FBD15ALVRL thesis scenes (vrl in dense
# media), the original glass config, and matpreview (.serialized meshes)
EXTRA = [
    '/root/reference/data/glass/glass_original.xml',
    '/root/reference/data/FBD15ALVRL_scenes/box/box.xml',
    '/root/reference/data/FBD15ALVRL_scenes/brain/brain.xml',
    '/root/reference/data/FBD15ALVRL_scenes/glass/glass.xml',
    '/root/reference/data/scenes/matpreview/matpreview.xml',
]


@pytest.mark.parametrize(
    'path', EXTRA, ids=['/'.join(p.split('/')[-2:]) for p in EXTRA])
def test_extra_scene_renders(path):
    from golden_scenes import SUBSTITUTIONS
    from mitsuba_nlvrl_tpu import build_scene
    from mitsuba_nlvrl_tpu.scene.xml import load_file
    from mitsuba_nlvrl_tpu.render import render, preprocess
    subs = dict(SUBSTITUTIONS)
    subs['envmap.exr'] = '/root/reference/data/envmap.exr'
    d = load_file(path, substitutions=subs)
    d['sensor']['film']['width'] = 24
    d['sensor']['film']['height'] = 16
    it = d.get('integrator') or {'type': 'path'}
    d['integrator'] = it
    for k, v in (('target_vrls', 800), ('global_photons', 20000),
                 ('volume_photons', 20000), ('caustic_photons', 20000)):
        if k in it:
            it[k] = min(int(it[k]), v)
    it['max_depth'] = min(int(it.get('max_depth', 8) or 8), 8)
    it['max_cam_iters'] = 8
    it['gather_points_cap'] = 8
    it['samples_per_query'] = 1
    scene, meta = build_scene(d)
    aux = preprocess(scene, meta, 0)
    img = np.asarray(render(scene, meta, spp=1, seed=0, aux=aux))
    assert np.isfinite(img).all()
    assert img.mean() > 0
