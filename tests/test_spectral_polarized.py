"""The *_spectral_polarized variant: hero-wavelength Mueller transport
(integrators/path_spectral_polarized.py). The reference builds this
variant as Spectrum = MuellerMatrix<Spectrum<Float,4>>
(resources/mitsuba.conf.template); gates here: Malus's law and crossed-
polarizer extinction survive the spectral development, and S0 agrees with
the plain spectral render on non-polarizing scenes."""
import math

import numpy as np
import jax.numpy as jnp

from scenes import cornell_box
from mitsuba_nlvrl_tpu import build_scene, render
from mitsuba_nlvrl_tpu.core import transform as tr


def _stack_scene(bsdfs, comp, spp=8, max_depth=6):
    shapes = [{'type': 'rectangle', 'bsdf': b,
               'to_world': tr.translate((0, 0, -1 + 2 * i)) @ tr.scale(4)}
              for i, b in enumerate(bsdfs)]
    return {
        'spectral': True,
        'integrator': {'type': 'stokes', 'component': comp,
                       'integrator': {'type': 'path',
                                      'max_depth': max_depth}},
        'sensor': {'type': 'perspective', 'fov': 10.0,
                   'to_world': tr.look_at((0, 0, -3), (0, 0, 0), (0, 1, 0)),
                   'film': {'width': 6, 'height': 6,
                            'rfilter': {'type': 'box'}},
                   'sampler': {'type': 'independent', 'sample_count': spp}},
        'shapes': shapes,
        'emitters': [{'type': 'constant', 'radiance': (1.0, 1.0, 1.0)}],
    }


def _stokes_of(bsdfs, spp=16):
    out = []
    for comp in range(4):
        s, m = build_scene(_stack_scene(bsdfs, comp, spp=spp))
        out.append(float(np.asarray(render(s, m, spp=spp, seed=1)).mean()))
    return out


def test_malus_law_spectral():
    """Polarizer at 0 then at theta: S0 = 0.5 cos^2(theta), per Malus,
    through the hero-wavelength Mueller transport and CIE development."""
    for deg in (0.0, 30.0, 60.0):
        th = math.radians(deg)
        S = _stokes_of([
            {'type': 'polarizer', 'theta': deg},
            {'type': 'polarizer', 'theta': 0.0},
        ])
        expect = 0.5 * math.cos(th) ** 2
        assert abs(S[0] - expect) < 0.05 * 0.5 + 0.01, (deg, S)


def test_crossed_polarizers_extinguish_spectral():
    S = _stokes_of([
        {'type': 'polarizer', 'theta': 90.0},
        {'type': 'polarizer', 'theta': 0.0},
    ])
    assert abs(S[0]) < 5e-3, S


def test_polarizer_fully_polarizes_spectral():
    """One polarizer at 0 deg: S1/S0 ~ 1 in the sensor frame."""
    S = _stokes_of([{'type': 'polarizer', 'theta': 0.0}])
    assert S[0] > 0.3
    assert abs(abs(S[1] / S[0]) - 1.0) < 0.05, S


def test_s0_matches_spectral_path_on_diffuse():
    """On a polarization-free scene the spectral-polarized S0 must agree
    with the plain spectral render (the Mueller structure is identity and
    the intensity factorization reduces to the same upsampled weights)."""
    d = cornell_box(spp=8, res=16)
    d['spectral'] = True
    sv, mv = build_scene(d)
    ref = np.asarray(render(sv, mv, spp=8, seed=1))

    d2 = cornell_box(spp=8, res=16)
    d2['spectral'] = True
    d2['integrator'] = {'type': 'stokes', 'component': 0,
                        'integrator': {'type': 'path', 'max_depth': 4}}
    s0, m0 = build_scene(d2)
    img = np.asarray(render(s0, m0, spp=8, seed=1))
    assert np.isfinite(img).all()
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.05, (img.mean(), ref.mean())
