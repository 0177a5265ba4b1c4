"""Integration smoke tests: tiny procedural scenes rendered end-to-end
(analog of the reference src/librender/tests/test_integrator.py:40-74 which
checks mean image values within 5%)."""
import numpy as np
import pytest

from scenes import cornell_box, sphere_scene
from mitsuba_nlvrl_tpu import build_scene, render


def _finite_positive(img):
    assert np.isfinite(img).all()
    assert img.min() >= 0.0
    assert img.mean() > 0.0


def test_cornell_box_path():
    scene, meta = build_scene(cornell_box(spp=4, res=24))
    img = np.asarray(render(scene, meta, spp=4))
    assert img.shape == (24, 24, 3)
    _finite_positive(img)


def test_cornell_box_point_light():
    scene, meta = build_scene(cornell_box(spp=4, res=24, light='point'))
    img = np.asarray(render(scene, meta, spp=4))
    _finite_positive(img)


def test_cornell_box_constant_env():
    scene, meta = build_scene(cornell_box(spp=4, res=24, light='constant'))
    img = np.asarray(render(scene, meta, spp=4))
    _finite_positive(img)
    # white furnace-ish: interior should be fairly bright
    assert img.mean() > 0.2


def test_direct_vs_path_low_bounce():
    """direct == path with max_depth=2 on a direct-lighting-only scene."""
    desc = cornell_box(spp=16, res=16, integrator={'type': 'direct'})
    scene, meta = build_scene(desc)
    img_d = np.asarray(render(scene, meta, spp=16, seed=3))
    desc2 = cornell_box(spp=16, res=16,
                        integrator={'type': 'path', 'max_depth': 2})
    scene2, meta2 = build_scene(desc2)
    img_p = np.asarray(render(scene2, meta2, spp=16, seed=3))
    assert abs(img_d.mean() - img_p.mean()) / max(img_p.mean(), 1e-9) < 0.15


def test_depth_integrator():
    desc = cornell_box(spp=1, res=16, integrator={'type': 'depth'})
    scene, meta = build_scene(desc)
    img = np.asarray(render(scene, meta, spp=1))
    # camera at z=-3.2 looking at box of half-size 1: depths in [2, ~6]
    hit = img[img > 0]
    assert hit.size > 0
    assert hit.min() > 1.5 and hit.max() < 8.0


def test_sphere_scene_renders():
    scene, meta = build_scene(sphere_scene(spp=4, res=24))
    img = np.asarray(render(scene, meta, spp=4))
    _finite_positive(img)


def test_deterministic_given_seed():
    scene, meta = build_scene(cornell_box(spp=2, res=16))
    a = np.asarray(render(scene, meta, spp=2, seed=7))
    b = np.asarray(render(scene, meta, spp=2, seed=7))
    assert np.array_equal(a, b)


def test_white_furnace():
    """Closed constant-light environment with perfect white diffuse sphere:
    radiance must equal the env radiance (energy conservation)."""
    desc = {
        'integrator': {'type': 'path', 'max_depth': 48, 'rr_depth': 64},
        'sensor': {
            'type': 'perspective', 'fov': 40.0,
            'to_world': __import__('mitsuba_nlvrl_tpu.core.transform',
                                   fromlist=['look_at']).look_at(
                (0, 0, -4), (0, 0, 0), (0, 1, 0)),
            'film': {'width': 16, 'height': 16, 'rfilter': {'type': 'box'}},
            'sampler': {'type': 'independent', 'sample_count': 64}},
        'shapes': [{'type': 'sphere', 'center': (0, 0, 0), 'radius': 1.0,
                    'bsdf': {'type': 'diffuse', 'reflectance': 1.0}}],
        'emitters': [{'type': 'constant', 'radiance': (1.0, 1.0, 1.0)}],
    }
    scene, meta = build_scene(desc)
    img = np.asarray(render(scene, meta, spp=64))
    assert abs(img.mean() - 1.0) < 0.03, img.mean()
