"""Spatially-varying BSDF parameters beyond diffuse reflectance:
alpha (roughness) and specular_reflectance maps (reference: rough BSDFs
hold Texture refs, e.g. roughconductor.cpp:446-456; round-1 only wired
the diffuse reflectance slot). The rewrite happens in
bsdf._apply_param_textures on the gathered parameter rows."""
import numpy as np
import jax.numpy as jnp

from mitsuba_nlvrl_tpu import build_scene
from mitsuba_nlvrl_tpu import bsdf as bsdf_mod
from mitsuba_nlvrl_tpu.core.records import SurfaceInteraction
from mitsuba_nlvrl_tpu.core.frame import Frame


def _scene(bsdf):
    return {
        'shapes': [{'type': 'rectangle', 'bsdf': bsdf}],
        'emitters': [{'type': 'constant', 'radiance': 1.0}],
        'sensor': {'type': 'perspective',
                   'film': {'width': 4, 'height': 4}},
        'integrator': {'type': 'direct'},
    }


def _si_at(uv, n_lanes):
    si = SurfaceInteraction.invalid((n_lanes,))
    e3 = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n_lanes, 1))
    e1 = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (n_lanes, 1))
    e2 = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (n_lanes, 1))
    wi = jnp.tile(jnp.asarray([[0.3, 0.0, 0.954]]), (n_lanes, 1))
    return si._replace(valid=jnp.ones(n_lanes, bool), n=e3,
                       sh_frame=Frame(e1, e2, e3),
                       uv=jnp.asarray(uv, jnp.float32), wi=wi,
                       bsdf_idx=jnp.zeros(n_lanes, jnp.int32))


def test_alpha_texture_switches_roughness():
    # checkerboard alpha: 0.05 in one cell, 0.5 in the neighbor
    checker = {'type': 'checkerboard', 'color0': 0.05, 'color1': 0.5}
    scene, meta = build_scene(_scene(
        {'type': 'roughconductor', 'alpha': checker}))
    assert meta.has_param_textures
    # near-mirror wo for the smooth cell, same wo for the rough cell
    uv = [[0.25, 0.25], [0.75, 0.25]]   # color0 cell / color1 cell
    si = _si_at(uv, 2)
    wo = jnp.tile(jnp.asarray([[-0.3, 0.0, 0.954]]), (2, 1))
    f = np.asarray(bsdf_mod.eval(scene, meta, si, wo))
    # mirror-direction response is much stronger for alpha=0.05
    assert f[0].mean() > 4.0 * f[1].mean(), f
    # compare against constant-alpha references
    for alpha, row in ((0.05, 0), (0.5, 1)):
        sc_c, meta_c = build_scene(_scene(
            {'type': 'roughconductor', 'alpha': alpha}))
        f_c = np.asarray(bsdf_mod.eval(sc_c, meta_c, _si_at(uv[row:row+1], 1),
                                       wo[row:row+1]))
        np.testing.assert_allclose(f[row], f_c[0], rtol=1e-4)


def test_specular_reflectance_texture():
    checker = {'type': 'checkerboard', 'color0': [1.0, 0.0, 0.0],
               'color1': [0.0, 0.0, 1.0]}
    scene, meta = build_scene(_scene(
        {'type': 'roughconductor', 'alpha': 0.3,
         'specular_reflectance': checker}))
    assert meta.has_param_textures
    si = _si_at([[0.25, 0.25], [0.75, 0.25]], 2)
    wo = jnp.tile(jnp.asarray([[-0.3, 0.0, 0.954]]), (2, 1))
    f = np.asarray(bsdf_mod.eval(scene, meta, si, wo))
    # cell 0 tints red, cell 1 tints blue
    assert f[0, 0] > 1e-4 and f[0, 2] == 0.0
    assert f[1, 2] > 1e-4 and f[1, 0] == 0.0


def test_plastic_diffuse_texture_renders():
    checker = {'type': 'checkerboard', 'color0': [0.9, 0.1, 0.1],
               'color1': [0.1, 0.1, 0.9]}
    from mitsuba_nlvrl_tpu import render
    from mitsuba_nlvrl_tpu.core import transform as tr
    desc = _scene({'type': 'roughplastic', 'alpha': 0.2,
                   'diffuse_reflectance': checker})
    desc['sensor']['to_world'] = tr.look_at((0, 0, 3), (0, 0, 0), (0, 1, 0))
    desc['sensor']['film'] = {'width': 16, 'height': 16}
    scene, meta = build_scene(desc)
    img = np.asarray(render(scene, meta, spp=8, seed=1))
    assert np.isfinite(img).all()
    # the checker must appear: red and blue channels each dominate somewhere
    assert (img[:, :, 0] > img[:, :, 2] + 0.05).any()
    assert (img[:, :, 2] > img[:, :, 0] + 0.05).any()
