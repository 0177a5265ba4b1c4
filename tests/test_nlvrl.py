"""NLVRL pipeline tests: nonlinear marcher, hash grid, light tracing,
photonmapper/VRL integrators vs volpath ground truth.

The reference has NO tests for its thesis code (SURVEY §4); these are the
oracles the new framework defines: physical invariants (mirage bending,
TIR), brute-force equivalence (hash grid), and cross-integrator agreement.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenes import cornell_box
from mitsuba_nlvrl_tpu import build_scene, render
from mitsuba_nlvrl_tpu.core import transform as tr
from mitsuba_nlvrl_tpu.core.ray import Ray


def _nl_slab_scene(top_ior=0.8, bottom_ior=1.0, res_y=64):
    return {
        'sensor': {'type': 'perspective',
                   'to_world': tr.look_at((0, 0, -3), (0, 0, 0), (0, 1, 0)),
                   'film': {'width': 8, 'height': 8,
                            'rfilter': {'type': 'box'}}},
        'integrator': {'type': 'path'},
        'shapes': [
            {'type': 'cube', 'bsdf': {'type': 'null'},
             'interior': {'type': 'nonlinear', 'sigma_t': 0.01,
                          'albedo': 0.5, 'res_x': 1, 'res_y': res_y,
                          'res_z': 1, 'top_ior': top_ior,
                          'bottom_ior': bottom_ior},
             'to_world': tr.scale((4, 1, 4))},
        ],
        'emitters': [{'type': 'constant', 'radiance': (1, 1, 1)}],
    }


def test_nonlinear_marcher_mirage_bending():
    """A ray rising through decreasing IOR flattens and TIRs back down."""
    from mitsuba_nlvrl_tpu.medium import nonlinear as nl
    scene, meta = build_scene(_nl_slab_scene())
    ang = math.radians(30)
    o = jnp.asarray([[-3.9, -0.95, 0.0]])
    d = jnp.asarray([[math.cos(ang), math.sin(ang), 0.0]])
    ray = Ray.make(o, d, mint=0.0)
    bent, si = nl.bend_ray(scene, meta, ray, jnp.zeros((1,), jnp.int32),
                           jnp.ones((1,), bool), max_segments=128)
    cnt = int(bent.count[0])
    assert cnt > 10
    dirs = np.asarray(bent.seg_d[0, :cnt])
    ys = np.asarray(bent.seg_o[0, :cnt, 1])
    # flattens while rising...
    assert dirs[cnt // 2, 1] < dirs[0, 1]
    # ...then comes back down (TIR) without ever leaving the slab
    assert dirs[-1, 1] < 0
    assert ys.max() < 1.0


def test_nonlinear_uniform_ior_goes_straight():
    """With equal IOR everywhere the 'bent' ray is straight."""
    from mitsuba_nlvrl_tpu.medium import nonlinear as nl
    scene, meta = build_scene(_nl_slab_scene(top_ior=1.0, bottom_ior=1.0))
    o = jnp.asarray([[-3.9, -0.5, 0.0]])
    d = jnp.asarray([[0.8, 0.6, 0.0]])
    ray = Ray.make(o, d, mint=0.0)
    bent, si = nl.bend_ray(scene, meta, ray, jnp.zeros((1,), jnp.int32),
                           jnp.ones((1,), bool), max_segments=64)
    cnt = int(bent.count[0])
    dirs = np.asarray(bent.seg_d[0, :cnt])
    assert np.abs(dirs - dirs[0]).max() < 1e-5


def test_snell_refraction_at_cell_boundary():
    """Single boundary: sin(t1) * n1 == sin(t2) * n2."""
    from mitsuba_nlvrl_tpu.medium import nonlinear as nl
    scene, meta = build_scene(_nl_slab_scene(top_ior=0.5, bottom_ior=1.0,
                                             res_y=2))
    ang = math.radians(20)
    o = jnp.asarray([[0.0, -0.5, 0.0]])
    d = jnp.asarray([[math.sin(ang), math.cos(ang), 0.0]])
    ray = Ray.make(o, d, mint=0.0)
    nli = nl.sample_nonlinear_interaction(scene, meta, ray,
                                          jnp.zeros((1,), jnp.int32),
                                          jnp.ones((1,), bool))
    assert bool(nli.valid[0])
    n1, n2 = float(nli.n1[0]), float(nli.n2[0])
    sin_in = math.sin(ang)
    sin_out = float(jnp.abs(nli.wo[0, 0]))
    assert abs(sin_in * n1 - sin_out * n2) < 1e-4


def test_hashgrid_matches_bruteforce(rng):
    from mitsuba_nlvrl_tpu.ops import hashgrid
    P, N, r = 500, 64, 0.15
    pts = jnp.asarray(rng.random((P, 3)), jnp.float32)
    valid = jnp.asarray(rng.random(P) > 0.2)
    grid = hashgrid.build(pts, valid, jnp.zeros(3), r)
    q = jnp.asarray(rng.random((N, 3)), jnp.float32)

    def fold(acc, idx, ok):
        d2 = jnp.sum((pts[idx] - q[:, None, :]) ** 2, -1)
        sel = ok & (d2 <= r * r) & valid[idx]
        return acc + sel.sum(axis=1)

    counts = hashgrid.fold_neighbors(grid, q, jnp.ones((N,), bool), fold,
                                     jnp.zeros((N,), jnp.int32),
                                     max_per_cell=64)
    # brute force
    d2 = np.sum((np.asarray(pts)[None] - np.asarray(q)[:, None]) ** 2, -1)
    brute = ((d2 <= r * r) & np.asarray(valid)[None, :]).sum(1)
    assert np.array_equal(np.asarray(counts), brute)


def test_lighttrace_deposits():
    from mitsuba_nlvrl_tpu.integrators import lighttrace
    med = {'type': 'homogeneous', 'sigma_t': 0.4, 'albedo': 0.9}
    desc = cornell_box(spp=1, res=8, integrator={'type': 'vrl'}, medium=med)
    scene, meta = build_scene(desc)
    raw = lighttrace.shoot(scene, meta, jax.random.PRNGKey(0),
                           n_paths=512, max_depth=6, min_vrl_len=0.0)
    n_sp = int(raw.sp_count)
    n_vp = int(raw.vp_count)
    n_vrl = int(raw.vrl_count)
    assert n_sp > 100 and n_vp > 50 and n_vrl > 200
    assert int(raw.sp_lost) == 0 and int(raw.vrl_lost) == 0
    maps = lighttrace.build_maps(scene, meta, raw, 0.1, 0.05, 0.05)
    assert int(maps.vrl_count) == n_vrl
    # all VRLs lie inside the medium box (|coord| <= 0.95 + eps)
    vo = np.asarray(maps.vrl_o[np.asarray(maps.vrl_valid)])
    assert np.abs(vo).max() < 1.0
    # deposited power is finite & positive
    assert np.isfinite(np.asarray(maps.sp_power)).all()


def test_photonmapper_matches_volpath():
    med = {'type': 'homogeneous', 'sigma_t': 0.4, 'albedo': 0.9}
    dv = cornell_box(spp=8, res=16,
                     integrator={'type': 'volpath', 'max_depth': 6},
                     medium=med)
    sv, mv = build_scene(dv)
    gt = np.asarray(render(sv, mv, spp=8, seed=1)).mean()
    dp = cornell_box(spp=2, res=16,
                     integrator={'type': 'photonmapper', 'max_depth': 6,
                                 'volume_lookup_radius_relative': 0.03},
                     medium=med)
    sp, mp = build_scene(dp)
    pm = np.asarray(render(sp, mp, spp=2, seed=1)).mean()
    assert abs(pm - gt) / gt < 0.35, (pm, gt)


def test_vrl_matches_volpath():
    med = {'type': 'homogeneous', 'sigma_t': 0.5, 'albedo': 0.8}
    dv = cornell_box(spp=8, res=16,
                     integrator={'type': 'volpath', 'max_depth': 6},
                     medium=med, light='point')
    sv, mv = build_scene(dv)
    gt = np.asarray(render(sv, mv, spp=8, seed=1)).mean()
    dd = cornell_box(spp=4, res=16,
                     integrator={'type': 'vrl', 'max_depth': 6,
                                 'target_vrls': 2000, 'samples_per_query': 4,
                                 'min_vrl_length': 0.02,
                                 'use_direct_illum': True,
                                 'volume_lookup_radius_relative': 0.03},
                     medium=med, light='point')
    sd, md = build_scene(dd)
    vr = np.asarray(render(sd, md, spp=4, seed=1)).mean()
    assert abs(vr - gt) / gt < 0.35, (vr, gt)


def test_nlvrl_headline_scene_smoke():
    import os
    path = '/root/reference/data/scenes/cbox/cbox-nonlinear-homo-vrl.xml'
    if not os.path.exists(path):
        pytest.skip("reference data unavailable")
    from mitsuba_nlvrl_tpu.scene.xml import load_file
    desc = load_file(path)
    desc['sensor']['film']['width'] = 32
    desc['sensor']['film']['height'] = 16
    desc['integrator']['target_vrls'] = 1000
    scene, meta = build_scene(desc)
    img = np.asarray(render(scene, meta, spp=1, seed=0))
    assert np.isfinite(img).all()
    assert img.max() > 0  # the laser lights up something


def test_vrl_dice_long_rr_unbiased():
    """dice_vrl / long_vrl / rr_vrl (vrl_struct.h dice:88-128,
    convertToLong:146-154; vrl_map.h EDistanceRoulette) must leave the
    estimate unbiased."""
    import scenes as _scenes
    from mitsuba_nlvrl_tpu import build_scene as _bs, render as _render

    def mk(**extra):
        d = _scenes.cornell_box(spp=4, res=14, medium={
            'type': 'homogeneous', 'sigma_t': 0.4, 'albedo': 0.8})
        d['integrator'] = {'type': 'vrl', 'target_vrls': 64, 'max_depth': 6,
                          'min_vrl_length': 0.05, **extra}
        return _bs(d)

    s0, m0 = mk()
    base = np.asarray(_render(s0, m0, spp=4, seed=7))
    s1, m1 = mk(long_vrl=True, dice_vrl=3, rr_vrl=True)
    img = np.asarray(_render(s1, m1, spp=4, seed=7))
    assert np.isfinite(img).all()
    assert abs(img.mean() / base.mean() - 1.0) < 0.05


def test_constant_emitter_lighttrace_matches_volpath():
    """A constant-lit medium scene must deposit photon flux (round-1 gap:
    constant emitters were absent from sample_ray so the maps were black).
    Reference: ConstantBackgroundEmitter::sample_ray, constant.cpp:60-79."""
    med = {'type': 'homogeneous', 'sigma_t': 0.6, 'albedo': 0.9}
    dv = cornell_box(spp=8, res=16,
                     integrator={'type': 'volpath', 'max_depth': 6},
                     medium=med, light='constant')
    sv, mv = build_scene(dv)
    gt = np.asarray(render(sv, mv, spp=8, seed=1)).mean()
    dp = cornell_box(spp=2, res=16,
                     integrator={'type': 'photonmapper', 'max_depth': 6,
                                 'volume_lookup_radius_relative': 0.03},
                     medium=med, light='constant')
    sp, mp = build_scene(dp)
    pm = np.asarray(render(sp, mp, spp=2, seed=1)).mean()
    assert pm > 0, "constant-lit photon maps are black"
    assert abs(pm - gt) / gt < 0.4, (pm, gt)


def test_directional_emitter_lighttrace_deposits():
    """Directional emitters must shoot photons (directional.cpp:80-106)."""
    from mitsuba_nlvrl_tpu.integrators import lighttrace
    med = {'type': 'homogeneous', 'sigma_t': 0.8, 'albedo': 0.9}
    desc = cornell_box(spp=1, res=8, integrator={'type': 'vrl'}, medium=med)
    # beam enters through the open (camera) side of the box
    desc['emitters'] = [{'type': 'directional', 'direction': (0, 0, 1),
                         'irradiance': (2.0, 2.0, 2.0)}]
    del desc['shapes'][5]  # drop the area light, keep walls + medium cube
    scene, meta = build_scene(desc)
    raw = lighttrace.shoot(scene, meta, jax.random.PRNGKey(0),
                           n_paths=512, max_depth=6)
    assert int(raw.vrl_count) > 50
    assert float(np.asarray(raw.vrl_flux[:int(raw.vrl_count)]).sum()) > 0


def test_light_depth_truncation_counter():
    """Optically thick media: paths alive at the depth cap are counted, not
    silently dropped (VERDICT r1 'silent-wrongness' item)."""
    from mitsuba_nlvrl_tpu.integrators import lighttrace
    med = {'type': 'homogeneous', 'sigma_t': 30.0, 'albedo': 0.99}
    desc = cornell_box(spp=1, res=8, integrator={'type': 'vrl'}, medium=med)
    scene, meta = build_scene(desc)
    raw_short = lighttrace.shoot(scene, meta, jax.random.PRNGKey(0),
                                 n_paths=256, max_depth=4, rr_depth=64)
    raw_long = lighttrace.shoot(scene, meta, jax.random.PRNGKey(0),
                                n_paths=256, max_depth=48, rr_depth=64)
    assert int(raw_short.trunc_paths) > 0
    assert int(raw_long.trunc_paths) < int(raw_short.trunc_paths)


def test_vrl_cluster_sampling_unbiased_and_lower_variance():
    """The Morton-cluster VRL selection (the lightcut analog,
    vrl_lightcut.h) must (a) agree with uniform selection in expectation
    and (b) cut variance on scenes with spatially localized VRLs —
    VERDICT r1's 'acceleration that measurably wins and is on' gate."""
    from mitsuba_nlvrl_tpu.integrators import vrl as vrl_mod
    from mitsuba_nlvrl_tpu.core.rng import Sampler

    # elongated slab medium, point light at one end: VRLs localize near
    # the light, so segment->VRL distances span a wide range (the mirage/
    # laser regime where the thesis's lightcut pays off)
    desc = {
        'integrator': {'type': 'vrl', 'target_vrls': 2048,
                       'max_depth': 6, 'min_vrl_length': 0.02},
        'sensor': {'type': 'perspective', 'fov': 45.0,
                   'to_world': tr.look_at((0, 0, -12), (0, 0, 0),
                                          (0, 1, 0)),
                   'film': {'width': 8, 'height': 8,
                            'rfilter': {'type': 'box'}},
                   'sampler': {'type': 'independent', 'sample_count': 1}},
        'shapes': [{'type': 'cube', 'bsdf': {'type': 'null'},
                    'interior': {'type': 'homogeneous', 'sigma_t': 0.8,
                                 'albedo': 0.9},
                    'to_world': tr.scale((4.0, 1.0, 1.0))}],
        'emitters': [{'type': 'point', 'position': (-4.6, 0.0, 0.0),
                      'intensity': (5.0, 5.0, 5.0)}],
    }
    scene, meta = build_scene(desc)
    maps = vrl_mod.preprocess(scene, meta, jax.random.PRNGKey(0))
    assert maps.clusters is not None
    assert int(maps.vrl_count) > 500

    # query segments spread along the slab: some near the light, some far
    N = 48
    xs = np.linspace(-3.0, 3.5, N).astype(np.float32)
    seg_o = jnp.asarray(np.stack([xs, np.full(N, 0.0), np.full(N, -0.8)],
                                 axis=-1))
    seg_d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (N, 1))
    seg_len = jnp.full((N,), 1.6)
    midx = jnp.zeros((N,), jnp.int32)
    chan = jnp.zeros((N,), jnp.int32)
    act = jnp.ones((N,), bool)

    from functools import partial

    @partial(jax.jit, static_argnames=('strategy',))
    def one(key, strategy):
        smp = Sampler.make(key, N)
        est, _ = vrl_mod.query_vrls(scene, meta, maps, seg_o, seg_d,
                                    seg_len, midx, chan, smp, act, 1,
                                    strategy=strategy)
        return est.sum(-1)

    # uniform selection is heavy-tailed, so its mean needs many trials to
    # converge — use a long uniform run as the unbiasedness reference
    runs = {}
    for strategy, T in (('uniform', 384), ('cluster', 96)):
        runs[strategy] = np.stack([
            np.asarray(one(jax.random.PRNGKey(100 + t), strategy))
            for t in range(T)])
    mu_u = runs['uniform'].mean()
    mu_c = runs['cluster'].mean()
    assert abs(mu_c / mu_u - 1.0) < 0.15, (mu_c, mu_u)
    # variance of the per-lane estimator, averaged over lanes
    var_u = runs['uniform'].var(axis=0).mean()
    var_c = runs['cluster'].var(axis=0).mean()
    assert var_c < 0.5 * var_u, (var_c, var_u)


def test_vrl_aniso_cdf_sampling():
    """Anisotropic tabulated-CDF camera sampling (vrl_struct.h:361-505,
    prop vrl_aniso_cdf): (a) with an ISOTROPIC phase the phase product is
    constant over the knots, so the tabulated CDF must reduce to the atan
    sampler — same uniforms, near-identical estimates; (b) with a forward
    HG phase it must agree with the atan sampler in expectation (both
    divide by their exact pdfs) while concentrating samples where the
    phase product is large."""
    from functools import partial
    from mitsuba_nlvrl_tpu.integrators import vrl as vrl_mod
    from mitsuba_nlvrl_tpu.core.rng import Sampler

    def build(phase, aniso):
        desc = {
            'integrator': {'type': 'vrl', 'target_vrls': 512,
                           'max_depth': 6, 'min_vrl_length': 0.02,
                           'vrl_aniso_cdf': aniso,
                           'use_light_cut': False},
            'sensor': {'type': 'perspective', 'fov': 45.0,
                       'to_world': tr.look_at((0, 0, -12), (0, 0, 0),
                                              (0, 1, 0)),
                       'film': {'width': 8, 'height': 8,
                                'rfilter': {'type': 'box'}},
                       'sampler': {'type': 'independent',
                                   'sample_count': 1}},
            'shapes': [{'type': 'cube', 'bsdf': {'type': 'null'},
                        'interior': {'type': 'homogeneous',
                                     'sigma_t': 0.8, 'albedo': 0.9,
                                     'phase': phase},
                        'to_world': tr.scale((4.0, 1.0, 1.0))}],
            'emitters': [{'type': 'point', 'position': (-4.6, 0.0, 0.0),
                          'intensity': (5.0, 5.0, 5.0)}],
        }
        return build_scene(desc)

    N = 32
    xs = np.linspace(-3.0, 3.5, N).astype(np.float32)
    seg_o = jnp.asarray(np.stack([xs, np.full(N, 0.0), np.full(N, -0.8)],
                                 axis=-1))
    seg_d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (N, 1))
    seg_len = jnp.full((N,), 1.6)
    midx = jnp.zeros((N,), jnp.int32)
    chan = jnp.zeros((N,), jnp.int32)
    act = jnp.ones((N,), bool)

    def estimates(phase, aniso, T):
        scene, meta = build(phase, aniso)
        maps = vrl_mod.preprocess(scene, meta, jax.random.PRNGKey(0))

        @jax.jit
        def one(key):
            smp = Sampler.make(key, N)
            est, _ = vrl_mod.query_vrls(scene, meta, maps, seg_o, seg_d,
                                        seg_len, midx, chan, smp, act, 1,
                                        strategy='uniform')
            return est.sum(-1)

        return np.stack([np.asarray(one(jax.random.PRNGKey(7 + t)))
                         for t in range(T)])

    # (a) isotropic reduction: same seeds, same draws -> near-bit parity
    iso = {'type': 'isotropic'}
    e_off = estimates(iso, False, 4)
    e_on = estimates(iso, True, 4)
    np.testing.assert_allclose(e_on, e_off, rtol=2e-3, atol=1e-8)

    # (b) pdf consistency under HG g=0.7 (the unbiasedness gate): for any
    # test function psi, E[psi(t)/pdf(t)] = integral of psi over the
    # segment — checked for psi=1 and psi=t against the sampler's own
    # inv_pdf (a scene-level mean comparison against the atan sampler is
    # too heavy-tailed to converge: the atan sampler ignores the forward
    # peak entirely)
    scene, meta = build({'type': 'hg', 'g': 0.7}, True)
    M = 100000
    u2 = jax.random.uniform(jax.random.PRNGKey(3), (M,))
    so = jnp.tile(jnp.asarray([[0.5, 0.0, -0.8]]), (M, 1))
    sd = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (M, 1))
    sl = jnp.full((M,), 1.6)
    pv = jnp.tile(jnp.asarray([[-2.0, 0.3, 0.2]]), (M, 1))
    dv = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (M, 1))
    mz = jnp.zeros((M,), jnp.int32)
    t_c, inv_p, ok = vrl_mod._aniso_cam_cdf(
        scene, meta, mz, mz, so, sd, sl, pv, dv, u2,
        jnp.ones((M,), bool))
    t_c, inv_p, ok = map(np.asarray, (t_c, inv_p, ok))
    assert ok.all()
    assert abs((inv_p.mean()) / 1.6 - 1.0) < 0.02, inv_p.mean()
    assert abs((t_c * inv_p).mean() / (1.6 ** 2 / 2) - 1.0) < 0.02

    # (c) milder HG g=0.4: scene-level agreement in expectation
    hg = {'type': 'hg', 'g': 0.4}
    r_off = estimates(hg, False, 320)
    r_on = estimates(hg, True, 96)
    mu_off, mu_on = r_off.mean(), r_on.mean()
    assert abs(mu_on / mu_off - 1.0) < 0.2, (mu_on, mu_off)


def test_bre_per_photon_radii():
    """build_maps derives per-photon BRE radii from local density (the
    kNN-radius analog of bre.h:39-73): denser neighborhoods get smaller
    radii, and the beam estimate agrees with the gather-point volume
    estimate on a homogeneous medium."""
    med = {'type': 'homogeneous', 'sigma_t': 0.6, 'albedo': 0.9}
    d = cornell_box(spp=1, res=16, integrator={'type': 'vrl'}, medium=med)
    scene, meta = build_scene(d)
    from mitsuba_nlvrl_tpu.integrators import lighttrace
    raw = lighttrace.shoot(scene, meta, jax.random.PRNGKey(0),
                           n_paths=2048, max_depth=6, min_vrl_len=0.0,
                           vp_all_scatters=True, sp_cap=8192, vp_cap=8192,
                           vrl_cap=512)
    maps = lighttrace.build_maps(scene, meta, raw, 0.2, 0.1, 0.15)
    r = np.asarray(maps.vp_radius)
    valid = np.asarray(maps.vp_valid)
    pos = np.asarray(maps.vp_pos)[valid]
    rv = r[valid]
    assert rv.min() >= 0.15 * 0.25 - 1e-6 and rv.max() <= 0.15 + 1e-6
    assert rv.std() > 1e-4          # radii actually adapt
    # photons nearer the light (top, denser) should have smaller radii
    top = rv[pos[:, 1] > 0.4]
    bottom = rv[pos[:, 1] < -0.4]
    if len(top) > 30 and len(bottom) > 30:
        assert top.mean() < bottom.mean()

    # BRE vs gather-point rendering: same scene, both estimates of the
    # same in-scattered radiance
    base = {'type': 'vrl', 'max_depth': 5, 'use_direct_illum': True,
            'target_vrls': 256, 'samples_per_query': 1,
            'min_vrl_length': 5.0,   # VRL off: isolate the direct term
            'volume_lookup_radius_relative': 0.04, 'max_cam_iters': 6}
    d1 = cornell_box(spp=4, res=12, integrator=dict(base), medium=med)
    s1, m1 = build_scene(d1)
    gp = np.asarray(render(s1, m1, spp=4, seed=3)).mean()
    d2 = cornell_box(spp=4, res=12, integrator=dict(base, use_bre=True),
                     medium=med)
    s2, m2 = build_scene(d2)
    bre = np.asarray(render(s2, m2, spp=4, seed=3)).mean()
    assert bre > 0 and np.isfinite(bre)
    assert abs(bre - gp) / gp < 0.35, (bre, gp)


def test_bre_heterogeneous_transmittance():
    """BRE through a HETEROGENEOUS grid: the marching loop integrates the
    actual midpoint extinction into a running optical depth instead of the
    majorant bound (which over-attenuates everywhere density < 1), so the
    beam estimate agrees with the gather-point path, which ratio-tracks
    the grid exactly (reference bre.h:150-160 samples Tr per photon)."""
    from mitsuba_nlvrl_tpu.scene.vol_io import VolumeGrid

    # strongly non-uniform density: the majorant bound would kill ~e^-2
    # of the energy where the local density is ~0.1
    zz, yy, xx = np.meshgrid(*[np.linspace(-1, 1, 12)] * 3, indexing='ij')
    g = (0.1 + 0.9 * np.exp(-6.0 * (xx**2 + yy**2 + zz**2))) \
        .astype(np.float32)
    vg = VolumeGrid(data=g[..., None],
                    bbox_min=np.float32([-0.95, -0.95, -0.95]),
                    bbox_max=np.float32([0.95, 0.95, 0.95]))
    med = {'type': 'heterogeneous',
           'sigma_t': {'type': 'gridvolume', '_grid': vg},
           'albedo': 0.9, 'scale': 2.5}
    base = {'type': 'vrl', 'max_depth': 5, 'use_direct_illum': True,
            'target_vrls': 256, 'samples_per_query': 1,
            'min_vrl_length': 5.0,   # VRL off: isolate the direct term
            'volume_lookup_radius_relative': 0.04, 'max_cam_iters': 6}
    d1 = cornell_box(spp=4, res=12, integrator=dict(base), medium=med)
    s1, m1 = build_scene(d1)
    gp = np.asarray(render(s1, m1, spp=4, seed=3)).mean()
    d2 = cornell_box(spp=4, res=12, integrator=dict(base, use_bre=True),
                     medium=med)
    s2, m2 = build_scene(d2)
    bre = np.asarray(render(s2, m2, spp=4, seed=3)).mean()
    assert bre > 0 and np.isfinite(bre)
    assert abs(bre - gp) / gp < 0.35, (bre, gp)


def test_vrl_heterogeneous_medium_matches_volpath():
    """VRL/photonmapper transport through a HETEROGENEOUS medium: the
    estimator's three transmittances (camera segment, VRL segment, link)
    ratio-track the density grid instead of assuming homogeneous Tr
    (reference evalTransmittance, medium.h:109-155 / vrl_struct.h:509-572
    support grids too). Gate: agree with volpath ground truth."""
    import jax.numpy as jnp
    from mitsuba_nlvrl_tpu.scene.vol_io import VolumeGrid

    # smooth blobby density in [0, 1]: dense center, thin edges
    g = np.zeros((12, 12, 12), np.float32)
    zz, yy, xx = np.meshgrid(*[np.linspace(-1, 1, 12)] * 3, indexing='ij')
    g = np.exp(-2.5 * (xx**2 + yy**2 + zz**2)).astype(np.float32)
    vg = VolumeGrid(data=g[..., None],
                    bbox_min=np.float32([-0.95, -0.95, -0.95]),
                    bbox_max=np.float32([0.95, 0.95, 0.95]))
    med = {'type': 'heterogeneous',
           'sigma_t': {'type': 'gridvolume', '_grid': vg},
           'albedo': 0.85, 'scale': 2.0}

    dv = cornell_box(spp=8, res=16,
                     integrator={'type': 'volpath', 'max_depth': 6},
                     medium=med, light='point')
    sv, mv = build_scene(dv)
    gt = np.asarray(render(sv, mv, spp=8, seed=1)).mean()

    dd = cornell_box(spp=4, res=16,
                     integrator={'type': 'vrl', 'max_depth': 6,
                                 'target_vrls': 2000, 'samples_per_query': 4,
                                 'min_vrl_length': 0.02,
                                 'use_direct_illum': True,
                                 'volume_lookup_radius_relative': 0.03},
                     medium=med, light='point')
    sd, md = build_scene(dd)
    vr = np.asarray(render(sd, md, spp=4, seed=1)).mean()
    assert np.isfinite(vr) and vr > 0
    assert abs(vr - gt) / gt < 0.35, (vr, gt)


def test_vrl_uniform_sampling_prop_unbiased():
    """use_uniform_sampling=true (reference vrl.cpp:62 -> sampleMC) forces
    uniform MC point sampling along VRL/camera segments; the estimator
    stays unbiased, just higher-variance than the Kulla warp."""
    med = {'type': 'homogeneous', 'sigma_t': 0.5, 'albedo': 0.8}
    base = {'type': 'vrl', 'max_depth': 6, 'target_vrls': 2000,
            'samples_per_query': 4, 'min_vrl_length': 0.02,
            'use_direct_illum': False,
            'volume_lookup_radius_relative': 0.03}
    dk = cornell_box(spp=8, res=12, integrator=dict(base),
                     medium=med, light='point')
    sk, mk = build_scene(dk)
    kulla = float(np.asarray(render(sk, mk, spp=8, seed=1)).mean())
    du = cornell_box(spp=8, res=12,
                     integrator=dict(base, use_uniform_sampling=True),
                     medium=med, light='point')
    su, mu = build_scene(du)
    uni = float(np.asarray(render(su, mu, spp=8, seed=1)).mean())
    assert uni > 0 and np.isfinite(uni)
    assert abs(uni - kulla) / max(kulla, 1e-6) < 0.35, (uni, kulla)


def test_vrl_cluster_sampling_heterogeneous_variance():
    """VERDICT r2 weak #4: in a HETEROGENEOUS medium the cluster weights
    must still be a usable importance (they now carry the exp(-sig_min*d)
    transmittance bound, vrl_lightcut.h:457-476 role) — gate variance, not
    just expectation agreement."""
    from mitsuba_nlvrl_tpu.integrators import vrl as vrl_mod
    from mitsuba_nlvrl_tpu.core.rng import Sampler
    from mitsuba_nlvrl_tpu.scene.vol_io import VolumeGrid

    # dense-to-thin density ramp along the slab: transmittance to far
    # VRLs decays hard, so distance-only weights oversample them
    gx = np.linspace(0, 1, 24)
    g = (0.15 + 1.8 * np.exp(-4.0 * gx))[None, None, :] \
        * np.ones((4, 4, 1))
    vg = VolumeGrid(data=g.astype(np.float32)[..., None],
                    bbox_min=np.float32([-4, -1, -1]),
                    bbox_max=np.float32([4, 1, 1]))
    desc = {
        'integrator': {'type': 'vrl', 'target_vrls': 2048,
                       'max_depth': 6, 'min_vrl_length': 0.02},
        'sensor': {'type': 'perspective', 'fov': 45.0,
                   'to_world': tr.look_at((0, 0, -12), (0, 0, 0),
                                          (0, 1, 0)),
                   'film': {'width': 8, 'height': 8,
                            'rfilter': {'type': 'box'}},
                   'sampler': {'type': 'independent', 'sample_count': 1}},
        'shapes': [{'type': 'cube', 'bsdf': {'type': 'null'},
                    'interior': {'type': 'heterogeneous',
                                 'sigma_t': {'type': 'gridvolume',
                                             '_grid': vg},
                                 'albedo': 0.9, 'scale': 1.0},
                    'to_world': tr.scale((4.0, 1.0, 1.0))}],
        'emitters': [{'type': 'point', 'position': (-4.6, 0.0, 0.0),
                      'intensity': (5.0, 5.0, 5.0)}],
    }
    scene, meta = build_scene(desc)
    maps = vrl_mod.preprocess(scene, meta, jax.random.PRNGKey(0))
    assert maps.clusters is not None
    assert int(maps.vrl_count) > 300

    N = 48
    xs = np.linspace(-3.0, 3.5, N).astype(np.float32)
    seg_o = jnp.asarray(np.stack([xs, np.full(N, 0.0), np.full(N, -0.8)],
                                 axis=-1))
    seg_d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (N, 1))
    seg_len = jnp.full((N,), 1.6)
    midx = jnp.zeros((N,), jnp.int32)
    chan = jnp.zeros((N,), jnp.int32)
    act = jnp.ones((N,), bool)

    from functools import partial

    @partial(jax.jit, static_argnames=('strategy',))
    def one(key, strategy):
        smp = Sampler.make(key, N)
        est, _ = vrl_mod.query_vrls(scene, meta, maps, seg_o, seg_d,
                                    seg_len, midx, chan, smp, act, 1,
                                    strategy=strategy)
        return est.sum(-1)

    runs = {}
    for strategy, T in (('uniform', 384), ('cluster', 96)):
        runs[strategy] = np.stack([
            np.asarray(one(jax.random.PRNGKey(500 + t), strategy))
            for t in range(T)])
    mu_u = runs['uniform'].mean()
    mu_c = runs['cluster'].mean()
    assert abs(mu_c / mu_u - 1.0) < 0.2, (mu_c, mu_u)
    var_u = runs['uniform'].var(axis=0).mean()
    var_c = runs['cluster'].var(axis=0).mean()
    # the Tr-bounded weights must beat uniform in het media too
    assert var_c < 0.7 * var_u, (var_c, var_u)
