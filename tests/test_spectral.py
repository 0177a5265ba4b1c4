"""Spectral rendering mode: hero-wavelength sampling, sRGB upsampling,
CIE film integration, and spectral emitter SPDs. References:
include/mitsuba/core/spectrum.h:127-314, include/mitsuba/render/srgb.h,
src/spectra/{blackbody,d65,regular,irregular}.cpp.
"""
import numpy as np
import jax.numpy as jnp

from scenes import cornell_box
from mitsuba_nlvrl_tpu import build_scene, render
from mitsuba_nlvrl_tpu.core import spectral as sp
from mitsuba_nlvrl_tpu.core import transform as tr
from mitsuba_nlvrl_tpu.core.spectrum import SRGB_TO_XYZ


def test_hero_sampling_inverse_pdf():
    # the returned weight is the reciprocal pdf of the sampled wavelength
    u = jnp.linspace(0.01, 0.99, 64)
    lam, w = sp.sample_hero_wavelengths(u)
    pdf = sp.pdf_rgb_spectrum(lam)
    assert np.allclose(np.asarray(w * pdf), 1.0, atol=1e-3)
    assert (np.asarray(lam) >= 360).all() and (np.asarray(lam) <= 830).all()
    # the 4 hero wavelengths are stratified (spectrum.h:305 sample_shifted)
    assert np.asarray(lam).std(axis=1).min() > 10.0


def test_pdf_integrates_to_one():
    lam = np.linspace(360.0, 830.0, 4001)
    pdf = np.asarray(sp.pdf_rgb_spectrum(jnp.asarray(lam)))
    integral = np.trapezoid(pdf, lam)
    assert abs(integral - 1.0) < 1e-3


def test_upsample_round_trip():
    """LUT + sigmoid model: D65-weighted CIE integral of the upsampled
    spectrum reproduces the input sRGB (the rgb2spec fit property)."""
    rng = np.random.default_rng(3)
    rgb = rng.uniform(0, 1, (128, 3)).astype(np.float32)
    lam = jnp.broadcast_to(jnp.asarray(sp._LAM, jnp.float32), (128, 95))
    val = np.asarray(sp.upsample_reflectance(jnp.asarray(rgb), lam))
    back = (val @ sp._FIT_W) @ np.linalg.inv(SRGB_TO_XYZ).T
    assert np.abs(back - rgb).max() < 0.04
    assert np.quantile(np.abs(back - rgb), 0.95) < 0.015


def test_spectral_cbox_matches_rgb():
    """The spectral variant reproduces the RGB render of the cornell box
    within 2% per channel (VERDICT round-1 item 3 done-criterion)."""
    base = cornell_box(spp=16, res=16)
    s0, m0 = build_scene(base)
    ref = np.stack([np.asarray(render(s0, m0, spp=32, seed=s)).mean((0, 1))
                    for s in range(4)])
    base['spectral'] = True
    s1, m1 = build_scene(base)
    assert m1.spectral
    img = np.stack([np.asarray(render(s1, m1, spp=32, seed=s)).mean((0, 1))
                    for s in range(4)])
    # z-test on the difference of seed-means: the systematic deviation must
    # stay under 2% (measured bias at 512 spp: 0.1% / 0.3% / 1.6%); the
    # 3-sigma term absorbs the independent MC noise of both estimates
    diff = np.abs(img.mean(0) - ref.mean(0))
    sem = np.sqrt(img.std(0) ** 2 / 4 + ref.std(0) ** 2 / 4)
    assert (diff < 0.02 * ref.mean(0) + 3.0 * sem).all(), \
        (img.mean(0), ref.mean(0), sem)


def _emitter_scene(radiance, spectral=True, spp=32):
    return {
        'spectral': spectral,
        'integrator': {'type': 'path', 'max_depth': 2},
        'sensor': {'type': 'perspective', 'fov': 10.0,
                   'to_world': tr.look_at((0, 0, -3), (0, 0, 0), (0, 1, 0)),
                   'film': {'width': 6, 'height': 6,
                            'rfilter': {'type': 'box'}},
                   'sampler': {'type': 'independent', 'sample_count': spp}},
        'shapes': [{'type': 'rectangle',
                    'bsdf': {'type': 'diffuse', 'reflectance': 0.0},
                    'to_world': tr.translate((0, -50, 0))
                    @ tr.rotate((1, 0, 0), -90)}],
        'emitters': [{'type': 'constant', 'radiance': radiance}],
    }


def _planck_xy(T):
    h, c, kb = 6.62607015e-34, 2.99792458e8, 1.380649e-23
    lm = sp._LAM * 1e-9
    P = 2 * h * c * c / lm ** 5 / np.expm1(h * c / (lm * kb * T))
    xyz = (P[:, None] * sp._CMF).sum(0)
    return xyz[:2] / xyz.sum()


def test_blackbody_on_planck_locus():
    """Blackbody emitter chromaticity matches the Planck locus
    (src/spectra/blackbody.cpp via direct spectral evaluation)."""
    for T in (3000.0, 6500.0):
        s, m = build_scene(_emitter_scene(
            {'type': 'blackbody', 'temperature': T}, spp=64))
        img = np.asarray(render(s, m, spp=64, seed=1)).mean((0, 1))
        xyz = SRGB_TO_XYZ @ img
        xy = xyz[:2] / max(xyz.sum(), 1e-9)
        assert np.abs(xy - _planck_xy(T)).max() < 5e-3, T


def test_d65_emitter_is_white():
    s, m = build_scene(_emitter_scene({'type': 'd65'}, spp=64))
    img = np.asarray(render(s, m, spp=64, seed=1)).mean((0, 1))
    # D65 is the sRGB whitepoint: all channels equal at value scale=1
    assert np.abs(img - 1.0).max() < 0.02, img


def test_tabulated_spectrum_narrow_green():
    """An irregular SPD concentrated at 540 nm renders green."""
    pairs = [(520.0, 0.0), (530.0, 1.0), (550.0, 1.0), (560.0, 0.0)]
    s, m = build_scene(_emitter_scene(
        {'type': 'irregular', 'value': pairs, 'scale': 50.0}, spp=64))
    img = np.asarray(render(s, m, spp=64, seed=1)).mean((0, 1))
    assert img[1] > 4.0 * max(img[0], 1e-6)
    assert img[1] > 4.0 * max(img[2], 1e-6)


def test_rgb_mode_unaffected_by_spectrum_dicts():
    """Spectrum-dict emitters still render in RGB mode via load-time
    integration (reference RGB-variant behavior)."""
    s, m = build_scene(_emitter_scene(
        {'type': 'blackbody', 'temperature': 5000.0}, spectral=False))
    img = np.asarray(render(s, m, spp=8, seed=1))
    assert np.isfinite(img).all() and img.mean() > 0


# --- per-wavelength conductor Fresnel ----------------------------------------

def _gold_box(spectral=True, spp=8, res=8):
    base = cornell_box(spp=spp, res=res)
    base['shapes'][0]['bsdf'] = {'type': 'roughconductor',
                                 'material': 'Au', 'alpha': 0.3}
    base['spectral'] = spectral
    return base


def test_conductor_spectral_fresnel_ratio():
    """Named conductors evaluate Fresnel per hero wavelength from the
    tabulated complex-IOR curves (spectral conductor.cpp semantics): the
    bsdf-layer correction times the upsampled RGB Fresnel reproduces the
    true F(lambda) at normal incidence."""
    import pytest
    from mitsuba_nlvrl_tpu import bsdf as bsdf_mod
    from mitsuba_nlvrl_tpu.core.ray import Ray
    from mitsuba_nlvrl_tpu.core.spectral import upsample_weight
    from mitsuba_nlvrl_tpu.ops import intersect as isect
    from mitsuba_nlvrl_tpu.scene.ior_data import _find_spd, load_spd

    if _find_spd('Au', 'eta') is None:
        pytest.skip('no conductor .spd data available')
    s, mt = build_scene(_gold_box())
    assert mt.has_conductor_spd

    # straight-down ray onto the gold floor: wi = wo = +z in the local
    # frame, so cos_h = 1 (normal incidence)
    ray = Ray.make(jnp.asarray([[0.0, 0.0, 0.0]]),
                   jnp.asarray([[0.0, -1.0, 0.0]]))
    si = isect.ray_intersect(s, ray)
    assert bool(si.valid[0])
    lam = jnp.asarray([[420.0, 520.0, 620.0, 720.0]])
    ratio = bsdf_mod.spectral_fresnel_ratio(s, mt, si, si.wi, lam)
    assert ratio is not None

    P = np.asarray(s.bsdfs.params[int(si.bsdf_idx[0])])
    from mitsuba_nlvrl_tpu.core.fresnel import fresnel_conductor
    F_rgb = fresnel_conductor(jnp.asarray([1.0]), jnp.asarray(P[0:3])[None],
                              jnp.asarray(P[3:6])[None])
    got = np.asarray(ratio * upsample_weight(F_rgb, lam))[0]

    # independent ground truth straight from the .spd files
    we, ve = load_spd(_find_spd('Au', 'eta'))
    wk, vk = load_spd(_find_spd('Au', 'k'))
    lam_np = np.asarray(lam)[0]
    eta = np.interp(lam_np, we, ve)
    k = np.interp(lam_np, wk, vk)
    F_true = ((eta - 1.0) ** 2 + k ** 2) / ((eta + 1.0) ** 2 + k ** 2)
    assert np.abs(got - F_true).max() < 0.02 * F_true.max(), (got, F_true)
    # gold: red Fresnel well above blue
    assert F_true[2] > 1.3 * F_true[0]


def test_conductor_spectral_render_smoke():
    """Spectral render of a gold-floored box stays finite and in the same
    energy regime as the RGB render (the correction rescales chroma, not
    total power)."""
    s0, m0 = build_scene(_gold_box(spectral=False, spp=16, res=8))
    ref = np.asarray(render(s0, m0, spp=16, seed=2)).mean()
    s1, m1 = build_scene(_gold_box(spectral=True, spp=16, res=8))
    img = np.asarray(render(s1, m1, spp=16, seed=2))
    assert np.isfinite(img).all()
    assert 0.5 * ref < img.mean() < 2.0 * ref
