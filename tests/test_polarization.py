"""Polarization components: Mueller calculus (core/mueller.py), the
polarizer/retarder/circular optical-element BSDFs (unpolarized reduction),
the stokes wrapper integrator, and the nested-integrator prop freezing.
References: include/mitsuba/render/mueller.h, src/bsdfs/{polarizer,
retarder,circular}.cpp, src/integrators/stokes.cpp.
"""
import numpy as np
import jax.numpy as jnp

from scenes import cornell_box
from mitsuba_nlvrl_tpu import build_scene, render
from mitsuba_nlvrl_tpu.core import mueller as mu


def test_polarizer_malus_law():
    # unpolarized -> linear polarizer: half the power, fully polarized
    S = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    out = mu.linear_polarizer(1.0) @ S
    assert np.allclose(out, [0.5, 0.5, 0.0, 0.0], atol=1e-6)
    # horizontally polarized light through a polarizer at angle theta:
    # transmitted power = cos^2(theta) (Malus)
    Sh = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    for deg in (0.0, 30.0, 45.0, 90.0):
        th = np.radians(deg)
        out = mu.rotated_element(jnp.float32(th), mu.linear_polarizer(1.0)) @ Sh
        assert np.allclose(float(out[0]), np.cos(th) ** 2, atol=1e-5), deg


def test_crossed_polarizers_extinguish():
    M = (mu.rotated_element(jnp.float32(np.pi / 2), mu.linear_polarizer(1.0))
         @ mu.linear_polarizer(1.0))
    S = jnp.asarray([1.0, 0.3, 0.2, 0.0])
    assert np.abs(np.asarray(M @ S)).max() < 1e-6


def test_quarter_wave_plate_makes_circular():
    # linear 0-deg light through a QWP at 45 deg -> circular polarization
    qwp = mu.rotated_element(jnp.float32(np.pi / 4),
                             mu.linear_retarder(jnp.float32(np.pi / 2)))
    out = np.asarray(qwp @ jnp.asarray([1.0, 1.0, 0.0, 0.0]))
    assert np.allclose(out[0], 1.0, atol=1e-5)
    assert np.allclose(out[1], 0.0, atol=1e-5)
    assert np.allclose(abs(out[3]), 1.0, atol=1e-5)


def test_rotator_composes():
    a, b = jnp.float32(0.3), jnp.float32(0.5)
    assert np.allclose(mu.rotator(a) @ mu.rotator(b), mu.rotator(a + b),
                       atol=1e-5)


def test_specular_reflection_matches_scalar_fresnel():
    from mitsuba_nlvrl_tpu.core.fresnel import fresnel_dielectric
    cos_i = jnp.asarray([1.0, 0.8, 0.5, 0.2])
    M = mu.specular_reflection(cos_i, 1.5)
    F, _, _, _ = fresnel_dielectric(cos_i, jnp.full_like(cos_i, 1.5))
    # M[0,0] is the unpolarized reflectance
    assert np.allclose(np.asarray(M)[:, 0, 0], np.asarray(F), atol=1e-5)


def test_polarization_bsdfs_attenuate():
    import jax
    from mitsuba_nlvrl_tpu import bsdf as bsdf_mod
    from mitsuba_nlvrl_tpu.core.records import SurfaceInteraction

    for kind, factor in (('polarizer', 0.5), ('retarder', 1.0),
                         ('circular', 0.5)):
        d = cornell_box(spp=4, res=8)
        d['shapes'][0]['bsdf'] = {'type': kind, 'transmittance': 0.8}
        scene, meta = build_scene(d)
        si = SurfaceInteraction.invalid((4,))
        si = si._replace(wi=jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (4, 1)),
                         valid=jnp.ones((4,), bool))
        # the replaced bsdf is row 0 only if it was registered first; find it
        row = int(np.argmax(np.asarray(scene.bsdfs.type) ==
                            bsdf_mod.BSDF_TYPES[kind]))
        si = si._replace(bsdf_idx=jnp.full((4,), row, jnp.int32))
        u = jnp.full((4,), 0.4)
        bs, w = bsdf_mod.sample(scene, meta, si, u, jnp.stack([u, u], -1))
        assert np.allclose(np.asarray(w), factor * 0.8, atol=1e-6), kind
        assert bool(bs.null.all()), kind
        assert np.allclose(np.asarray(bs.wo), np.asarray(-si.wi),
                           atol=1e-6), kind
        tr = bsdf_mod.eval_null_transmission(scene, meta, si)
        assert np.allclose(np.asarray(tr), factor * 0.8, atol=1e-6), kind


def test_stokes_wrapper_and_nested_props():
    base = cornell_box(spp=4, res=12)
    s0, m0 = build_scene(base)
    ref = np.asarray(render(s0, m0, spp=4, seed=2))

    d = cornell_box(spp=4, res=12)
    d['integrator'] = {'type': 'stokes',
                       'integrator': {'type': 'path', 'max_depth': 4}}
    s1, m1 = build_scene(d)
    img = np.asarray(render(s1, m1, spp=4, seed=2))
    assert np.allclose(img, ref, atol=1e-6)  # S0 == radiance

    d['integrator']['component'] = 2
    s2, m2 = build_scene(d)
    img2 = np.asarray(render(s2, m2, spp=4, seed=2))
    assert np.abs(img2).max() == 0.0  # unpolarized: S1..S3 vanish

    # regression: nested integrator dicts must freeze into hashable meta
    d2 = cornell_box(spp=4, res=12)
    d2['integrator'] = {'type': 'moment',
                        'integrator': {'type': 'path', 'max_depth': 4}}
    s3, m3 = build_scene(d2)
    mom = np.asarray(render(s3, m3, spp=4, seed=2))
    assert np.isfinite(mom).all() and mom.mean() > 0


def test_pplastic_renders_as_rough_plastic():
    d = cornell_box(spp=4, res=12)
    d['shapes'][0]['bsdf'] = {'type': 'pplastic',
                              'diffuse_reflectance': 0.4, 'alpha': 0.3}
    s, m = build_scene(d)
    img = np.asarray(render(s, m, spp=4, seed=2))
    assert np.isfinite(img).all() and img.mean() > 0
