"""Frame-perturbing BSDF wrappers (normalmap/bumpmap — reference
src/bsdfs/normalmap.cpp, bumpmap.cpp).

A flat tangent-space normal (0.5, 0.5, 1) must be an exact no-op; tilted
normals and bump height fields must change shading without creating
energy or NaNs.
"""
import numpy as np

from scenes import cornell_box
from mitsuba_nlvrl_tpu import build_scene, render


def _wrap_diffuse(desc, wrapper):
    for sh in desc['shapes']:
        if sh.get('bsdf', {}).get('type') == 'diffuse':
            sh['bsdf'] = dict(wrapper, bsdf=sh['bsdf'])
    return desc


def _render(desc, seed=3):
    scene, meta = build_scene(desc)
    return np.asarray(render(scene, meta, spp=4, seed=seed))


def test_flat_normalmap_is_identity():
    base = _render(cornell_box(spp=4, res=20))
    flat = _render(_wrap_diffuse(
        cornell_box(spp=4, res=20),
        {'type': 'normalmap',
         'normalmap': {'type': 'constant', 'value': [0.5, 0.5, 1.0]}}))
    assert np.abs(base - flat).max() < 1e-5


def test_tilted_normalmap_changes_shading():
    base = _render(cornell_box(spp=4, res=20))
    img = _render(_wrap_diffuse(
        cornell_box(spp=4, res=20),
        {'type': 'normalmap',
         'normalmap': {'type': 'checkerboard',
                       'color0': [0.5, 0.5, 1.0],
                       'color1': [0.8, 0.5, 0.6]}}))
    assert np.isfinite(img).all()
    assert np.abs(img - base).max() > 1e-3
    # perturbing normals must not create energy on a diffuse box
    assert img.mean() < base.mean() * 1.1


def test_bumpmap_changes_shading():
    base = _render(cornell_box(spp=4, res=20))
    img = _render(_wrap_diffuse(
        cornell_box(spp=4, res=20),
        {'type': 'bumpmap', 'scale': 5.0,
         'texture': {'type': 'checkerboard',
                     'color0': [0.0] * 3, 'color1': [1.0] * 3}}))
    assert np.isfinite(img).all()
    assert np.abs(img - base).max() > 1e-3
    assert img.mean() < base.mean() * 1.1
