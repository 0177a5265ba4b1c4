"""Polarization: Mueller calculus (core/mueller.py), the true polarized
transport path (integrators/path_polarized.py + bsdf/polarized.py), the
optical-element BSDFs, and the stokes integrator. References:
include/mitsuba/render/mueller.h, src/bsdfs/{polarizer,retarder,circular,
dielectric,conductor,pplastic}.cpp, src/integrators/stokes.cpp.
"""
import math

import numpy as np
import jax.numpy as jnp

from scenes import cornell_box, sphere_scene
from mitsuba_nlvrl_tpu import build_scene, render
from mitsuba_nlvrl_tpu.core import mueller as mu
from mitsuba_nlvrl_tpu.core import transform as tr


def _stack_scene(bsdfs, comp, spp=8, max_depth=6):
    """Camera at -z looking +z through a stack of optical-element sheets
    (listed near-camera first), constant environment behind."""
    shapes = [{'type': 'rectangle', 'bsdf': b,
               'to_world': tr.translate((0, 0, -1 + 2 * i)) @ tr.scale(4)}
              for i, b in enumerate(bsdfs)]
    return {
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


def _stokes_of(bsdfs, spp=8):
    out = []
    for comp in range(4):
        s, m = build_scene(_stack_scene(bsdfs, comp, spp=spp))
        out.append(float(np.asarray(render(s, m, spp=spp, seed=1)).mean()))
    return out


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
    # diffuse-only scene: every bounce depolarizes, S1..S3 vanish
    assert np.abs(img2).max() == 0.0

    # regression: nested integrator dicts must freeze into hashable meta
    d2 = cornell_box(spp=4, res=12)
    d2['integrator'] = {'type': 'moment',
                        'integrator': {'type': 'path', 'max_depth': 4}}
    s3, m3 = build_scene(d2)
    mom = np.asarray(render(s3, m3, spp=4, seed=2))
    assert np.isfinite(mom).all() and mom.mean() > 0


def test_pplastic_renders():
    d = cornell_box(spp=4, res=12)
    d['shapes'][0]['bsdf'] = {'type': 'pplastic',
                              'diffuse_reflectance': 0.4, 'alpha': 0.3}
    s, m = build_scene(d)
    img = np.asarray(render(s, m, spp=4, seed=2))
    assert np.isfinite(img).all() and img.mean() > 0


# --- rendered polarized transport (VERDICT round-1 item 2) ------------------

def test_malus_law_rendered():
    """Two polarizer sheets in front of a constant emitter: transmitted S0
    follows 0.5*cos^2(dtheta) (Malus), crossed polarizers extinguish."""
    for t2 in (0.0, 30.0, 60.0, 90.0):
        s, m = build_scene(_stack_scene(
            [{'type': 'polarizer', 'theta': 0.0},
             {'type': 'polarizer', 'theta': t2}], comp=0))
        img = np.asarray(render(s, m, spp=8, seed=1))
        expect = 0.5 * math.cos(math.radians(t2)) ** 2
        assert np.allclose(img.mean(), expect, atol=1e-4), t2


def test_polarizer_fully_polarizes_rendered():
    st = _stokes_of([{'type': 'polarizer', 'theta': 0.0}])
    assert abs(st[0] - 0.5) < 1e-4
    assert abs(st[1] / st[0] - 1.0) < 1e-3     # DOP = 1 along +S1
    assert abs(st[2]) < 1e-4 and abs(st[3]) < 1e-4


def test_qwp_and_circular_make_s3():
    # linear polarizer (far) + quarter-wave plate at 45 deg (near camera)
    st = _stokes_of([{'type': 'retarder', 'theta': 45.0, 'delta': 90.0},
                     {'type': 'polarizer', 'theta': 0.0}])
    assert abs(st[0] - 0.5) < 1e-4
    assert abs(st[3] - 0.5) < 1e-3             # right-circular
    # circular polarizer: S3 = +-S0 by handedness (circular.cpp:88)
    st_r = _stokes_of([{'type': 'circular'}])
    st_l = _stokes_of([{'type': 'circular', 'left_handed': True}])
    assert abs(st_r[3] - 0.5) < 1e-3 and abs(st_l[3] + 0.5) < 1e-3


def test_brewster_reflection_fully_polarized():
    """Glass plate viewed at the Brewster angle over a black backing: the
    reflected lobe is fully horizontally polarized (dielectric.cpp:250-287,
    r_p = 0 at atan(eta))."""
    eta = 1.5
    brew = math.degrees(math.atan(eta))
    dist = 3.0
    cy = dist * math.cos(math.radians(brew))
    cz = -dist * math.sin(math.radians(brew))
    vals = []
    for comp in (0, 1):
        d = {
            'integrator': {'type': 'stokes', 'component': comp,
                           'integrator': {'type': 'path', 'max_depth': 3}},
            'sensor': {'type': 'perspective', 'fov': 2.0,
                       'to_world': tr.look_at((0, cy, cz), (0, 0, 0),
                                              (0, 1, 0)),
                       'film': {'width': 6, 'height': 6,
                                'rfilter': {'type': 'box'}},
                       'sampler': {'type': 'independent',
                                   'sample_count': 16}},
            'shapes': [
                {'type': 'rectangle',
                 'bsdf': {'type': 'dielectric', 'int_ior': eta,
                          'ext_ior': 1.0},
                 'to_world': tr.rotate((1, 0, 0), -90) @ tr.scale(2)},
                {'type': 'rectangle',
                 'bsdf': {'type': 'diffuse', 'reflectance': 0.0},
                 'to_world': tr.translate((0, -0.05, 0))
                 @ tr.rotate((1, 0, 0), -90) @ tr.scale(2)},
            ],
            'emitters': [{'type': 'constant', 'radiance': (1.0, 1.0, 1.0)}],
        }
        s, m = build_scene(d)
        vals.append(float(np.asarray(render(s, m, spp=16, seed=3)).mean()))
    s0, s1 = vals
    assert s0 > 0.05                            # the reflected lobe is there
    assert abs(s1 / s0 - 1.0) < 5e-3            # DOP ~ 1, horizontal


def test_polarized_s0_matches_unpolarized_on_metal():
    """The Mueller weights' (0,0) entries reproduce the scalar dispatch, so
    S0 of the polarized path equals the unpolarized render bit-for-bit even
    on polarization-aware scenes (same RNG stream)."""
    for bsdf in ({'type': 'conductor', 'eta': 0.2, 'k': 3.9},
                 {'type': 'pplastic', 'diffuse_reflectance': 0.4,
                  'alpha': 0.1}):
        d = sphere_scene(spp=4, res=10, bsdf=bsdf)
        d['integrator'] = {'type': 'stokes', 'component': 0,
                           'integrator': {'type': 'path', 'max_depth': 4}}
        s, m = build_scene(d)
        s0 = np.asarray(render(s, m, spp=4, seed=1))
        d['integrator'] = {'type': 'path', 'max_depth': 4}
        s2, m2 = build_scene(d)
        ref = np.asarray(render(s2, m2, spp=4, seed=1))
        assert np.allclose(s0, ref, atol=1e-5), bsdf['type']


def test_metal_reflection_polarizes():
    bsdf = {'type': 'conductor', 'eta': 0.2, 'k': 3.9}
    d = sphere_scene(spp=8, res=10, bsdf=bsdf)
    d['integrator'] = {'type': 'stokes', 'component': 1,
                       'integrator': {'type': 'path', 'max_depth': 4}}
    s, m = build_scene(d)
    s1 = np.asarray(render(s, m, spp=8, seed=1))
    assert np.isfinite(s1).all() and np.abs(s1).max() > 1e-3
