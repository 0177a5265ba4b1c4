"""Projector emitter (reference src/emitters/projector.cpp): the
reciprocal of the perspective sensor — a delta-position light whose
directional distribution is a 2D slide texture on the virtual plane at
z=1, weighted by the inverse perspective sensitivity so a constant slide
projects constant irradiance onto a facing plane."""
import numpy as np
import jax.numpy as jnp

from mitsuba_nlvrl_tpu import build_scene, render
from mitsuba_nlvrl_tpu import emitter as emitter_mod
from mitsuba_nlvrl_tpu.core import transform as tr


def _desc(slide=None, scale=1.0, fov=60.0):
    em = {'type': 'projector', 'scale': scale, 'fov': fov,
          'to_world': tr.look_at((0, 0, 2), (0, 0, 0), (0, 1, 0))}
    if slide is not None:
        em['irradiance'] = slide
    return {
        'shapes': [{'type': 'rectangle',
                    'bsdf': {'type': 'diffuse', 'reflectance': 1.0}}],
        'emitters': [em],
        'sensor': {'type': 'perspective', 'fov': 45.0,
                   'to_world': tr.look_at((0, 0, 3), (0, 0, 0), (0, 1, 0)),
                   'film': {'width': 16, 'height': 16}},
        'integrator': {'type': 'direct'},
    }


def test_sample_direction_on_axis():
    scene, meta = build_scene(_desc(scale=2.0))
    # reference point on the projection axis at local depth z=2
    ref = jnp.asarray([[0.0, 0.0, 0.0], [5.0, 0.0, 0.0]], jnp.float32)
    ds, w = emitter_mod.sample_direction(
        scene, meta, ref, jnp.zeros(2), jnp.full((2, 2), 0.5),
        jnp.ones(2, bool))
    w = np.asarray(w)
    # weight = slide(1) * scale * pi / z^2 / cos_axis, cos=1 on axis;
    # pdf = 1 (delta), selection factor 1/E = 1
    np.testing.assert_allclose(w[0], 2.0 * np.pi / 4.0, rtol=1e-5)
    # the second point is far outside the 60-degree frustum -> zero
    np.testing.assert_allclose(w[1], 0.0, atol=1e-7)
    assert bool(np.asarray(ds.delta)[0])


def test_constant_slide_projects_constant():
    # radiance off a unit-albedo diffuse plane at depth z:
    # L = E * rho / pi = (pi * scale / z^2 * slide) * cos_surf/cos_axis.. ->
    # on the axis exactly scale / z^2
    scene, meta = build_scene(_desc(scale=1.0))
    img = np.asarray(render(scene, meta, spp=64, seed=9))
    c = img[7:9, 7:9].mean()
    np.testing.assert_allclose(c, 1.0 / 4.0, rtol=0.1)


def test_checker_slide_renders_pattern():
    checker = {'type': 'checkerboard', 'color0': [1.0, 0.0, 0.0],
               'color1': [0.0, 0.0, 1.0], 'uscale': 2.0, 'vscale': 2.0}
    scene, meta = build_scene(_desc(slide=checker))
    img = np.asarray(render(scene, meta, spp=32, seed=4))
    assert np.isfinite(img).all()
    # both slide colors must land on the floor somewhere
    assert (img[:, :, 0] > img[:, :, 2] + 0.02).any()
    assert (img[:, :, 2] > img[:, :, 0] + 0.02).any()


def test_sample_ray_weight():
    scene, meta = build_scene(_desc(scale=3.0))
    N = 8
    key_cols = jnp.linspace(0.05, 0.95, N)
    u = jnp.stack([key_cols, key_cols], -1)
    ray, w, e_idx, n_o = emitter_mod.sample_ray(
        scene, meta, jnp.zeros(N), u, u, jnp.ones(N, bool))
    # uniform-uv shooting: weight = slide * scale
    np.testing.assert_allclose(np.asarray(w), 3.0, rtol=1e-5)
    # all directions point into the frustum (+local z maps to -world z here)
    assert (np.asarray(ray.d)[:, 2] < 0).all()
