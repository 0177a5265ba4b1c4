"""Hierarchical2D mip-pyramid sample warping and its envmap consumer.
References: include/mitsuba/core/distr_2d.h:335-817 (Hierarchical2D),
src/emitters/envmap.cpp:67,123,217-268 (warp over luminance*sin(theta),
sample_direction / pdf_direction)."""
import os

import numpy as np
import jax.numpy as jnp

from mitsuba_nlvrl_tpu import build_scene
from mitsuba_nlvrl_tpu.core import distr2d as d2
from mitsuba_nlvrl_tpu import emitter as em

DATA = '/root/reference/data'


def _rand_dist(rng, shape):
    return d2.build_hierarchical(rng.uniform(0.05, 1.0, shape) ** 3 * 10)


def test_sample_pdf_eval_invert_agree():
    rng = np.random.default_rng(0)
    for shape in [(8, 16), (7, 5), (2, 2), (3, 9), (33, 65)]:
        dist = _rand_dist(rng, shape)
        u = jnp.asarray(rng.uniform(size=(50_000, 2)), jnp.float32)
        pos, pdf = d2.sample_hierarchical(dist, u)
        # returned pdf is exactly the interpolant density at the position
        pe = np.asarray(d2.eval_hierarchical(dist, pos))
        assert np.allclose(np.asarray(pdf), pe, rtol=1e-5, atol=1e-5)
        # invert() is the exact inverse of sample()
        u2, pdf2 = d2.invert_hierarchical(dist, pos)
        assert np.abs(np.asarray(u2) - np.asarray(u)).max() < 2e-4, shape
        assert np.allclose(np.asarray(pdf2), np.asarray(pdf), rtol=1e-4)
        # density is normalized: E[1/pdf] = unit-square area = 1
        area = float(np.mean(1.0 / np.maximum(np.asarray(pdf), 1e-12)))
        assert abs(area - 1.0) < 0.02, (shape, area)


def test_sampled_histogram_matches_density():
    """Coarse-grid chi2-flavored check: the empirical sample histogram
    reproduces the bilinear density."""
    rng = np.random.default_rng(1)
    dist = _rand_dist(rng, (16, 16))
    N = 400_000
    u = jnp.asarray(rng.uniform(size=(N, 2)), jnp.float32)
    pos, _ = d2.sample_hierarchical(dist, u)
    pos = np.asarray(pos)
    H = np.histogram2d(pos[:, 1], pos[:, 0], bins=8,
                       range=[[0, 1], [0, 1]])[0] / N * 64
    fy, fx = np.meshgrid((np.arange(64) + 0.5) / 64,
                         (np.arange(64) + 0.5) / 64, indexing='ij')
    ev = np.asarray(d2.eval_hierarchical(
        dist, jnp.asarray(np.stack([fx.ravel(), fy.ravel()], -1),
                          jnp.float32))).reshape(64, 64)
    cell = ev.reshape(8, 8, 8, 8).mean((1, 3))
    assert np.abs(H - cell).max() / cell.max() < 0.05


def _env_scene():
    return build_scene({
        'shapes': [],
        'emitters': [{'type': 'envmap',
                      'filename': os.path.join(DATA, 'envmap.exr')}],
        'film': {'width': 8, 'height': 8}, 'spp': 1,
        'integrator': {'type': 'path'},
    })


def test_envmap_sample_pdf_consistency():
    """Directions drawn by sample_direction must carry exactly the
    density pdf_env_direction reports, and the continuous warp must
    produce fractional uv (not texel centers)."""
    scene, meta = _env_scene()
    rng = np.random.default_rng(2)
    N = 8192
    uu, vv, pdf_uv = em._env_sample_uv(
        scene, jnp.asarray(rng.uniform(size=(N, 2)), jnp.float32))
    # continuous outputs: many distinct values, not W*H cell centers
    assert len(np.unique(np.round(np.asarray(uu), 6))) > N // 2
    p2 = np.asarray(em._env_pdf_uv(scene, uu, vv))
    assert np.allclose(np.asarray(pdf_uv), p2, rtol=1e-4, atol=1e-6)
    # solid-angle pdf round trip through direction space
    d_local = em._env_dir_from_uv(uu, vv)
    d_w = np.asarray(scene.emitters.env_to_world.apply_vector(d_local))
    pdf_dir = np.asarray(em.pdf_env_direction(
        scene, meta, jnp.ones(N, bool), ray_d=jnp.asarray(d_w)))
    inv_sin = 1.0 / np.maximum(np.sqrt(
        np.asarray(d_local)[:, 0] ** 2 + np.asarray(d_local)[:, 2] ** 2),
        1e-6)
    expect = p2 * inv_sin / (2.0 * np.pi ** 2)
    ok = expect > 1e-6
    assert np.allclose(pdf_dir[ok], expect[ok], rtol=2e-3)


def test_envmap_luminance_sampling_unbiased():
    """MC integral of the env radiance over the sphere: importance
    sampling by the warp must agree with uniform-sphere sampling."""
    scene, meta = _env_scene()
    rng = np.random.default_rng(3)
    N = 200_000
    uu, vv, pdf_uv = em._env_sample_uv(
        scene, jnp.asarray(rng.uniform(size=(N, 2)), jnp.float32))
    d_local = em._env_dir_from_uv(uu, vv)
    inv_sin = np.asarray(1.0 / np.maximum(np.sqrt(
        d_local[:, 0] ** 2 + d_local[:, 2] ** 2), 1e-6))
    pdf_dir = np.asarray(pdf_uv) * inv_sin / (2.0 * np.pi ** 2)
    L = np.asarray(em._env_eval_uv(scene, uu, vv)).mean(-1)
    est_is = float(np.mean(L / np.maximum(pdf_dir, 1e-12)))

    v = rng.normal(size=(N, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    u_s, v_s = em._env_uv_from_local(jnp.asarray(v, jnp.float32))
    L_u = np.asarray(em._env_eval_uv(scene, u_s, v_s)).mean(-1)
    est_uni = float(np.mean(L_u) * 4.0 * np.pi)
    assert abs(est_is - est_uni) / est_uni < 0.03, (est_is, est_uni)


def test_param_conditioned_hierarchical():
    """Dim > 0 instantiations (reference Hierarchical2D1/2 python
    bindings, src/libcore/python/distr_2d_v.cpp:107-109): slices are
    selected by conditioning parameters and interpolated linearly."""
    rng = np.random.default_rng(2)
    # density family: gaussian bump whose center slides with the parameter
    pv = np.asarray([0.0, 0.5, 1.0], np.float32)
    yy, xx = np.meshgrid(np.linspace(0, 1, 12), np.linspace(0, 1, 20),
                         indexing='ij')
    slices = np.stack([np.exp(-60.0 * ((xx - (0.2 + 0.6 * p)) ** 2
                                       + (yy - 0.5) ** 2)) + 0.01
                       for p in pv])
    dist = d2.build_hierarchical(slices, param_values=(pv,))

    N = 20_000
    u = jnp.asarray(rng.uniform(size=(N, 2)), jnp.float32)
    for p in (0.0, 0.5, 1.0):                       # exact grid points
        par = (jnp.full((N,), p, jnp.float32),)
        pos, pdf = d2.sample_hierarchical(dist, u, par)
        ref = d2.build_hierarchical(
            slices[int(np.searchsorted(pv, p))])
        pos_r, pdf_r = d2.sample_hierarchical(ref, u)
        assert np.abs(np.asarray(pos) - np.asarray(pos_r)).max() < 1e-5
        assert np.allclose(np.asarray(pdf), np.asarray(pdf_r), rtol=1e-4)

    # intermediate parameter: self-consistency (pdf == eval at pos,
    # invert o sample == id, normalized) and the bump is where the
    # interpolated family puts it
    par = (jnp.full((N,), 0.25, jnp.float32),)
    pos, pdf = d2.sample_hierarchical(dist, u, par)
    pe = np.asarray(d2.eval_hierarchical(dist, pos, par))
    assert np.allclose(np.asarray(pdf), pe, rtol=1e-4, atol=1e-5)
    u2, _ = d2.invert_hierarchical(dist, pos, par)
    assert np.abs(np.asarray(u2) - np.asarray(u)).max() < 3e-4
    area = float(np.mean(1.0 / np.maximum(np.asarray(pdf), 1e-12)))
    assert abs(area - 1.0) < 0.03
    mean_x = float(np.asarray(pos)[:, 0].mean())
    assert 0.25 < mean_x < 0.45, mean_x      # bump near x~0.35

    # two conditioning parameters
    pv2 = np.asarray([0.0, 1.0], np.float32)
    s2 = np.stack([slices, slices[::-1]])           # (2, 3, 12, 20)
    dist2 = d2.build_hierarchical(s2, param_values=(pv2, pv))
    par2 = (jnp.full((N,), 1.0, jnp.float32),
            jnp.full((N,), 0.0, jnp.float32))
    pos2, pdf2 = d2.sample_hierarchical(dist2, u, par2)
    # (p0=1, p1=0) selects slices[::-1][0] == slices[2] (bump at x=0.8)
    ref2 = d2.build_hierarchical(slices[2])
    pos_r2, _ = d2.sample_hierarchical(ref2, u)
    assert np.abs(np.asarray(pos2) - np.asarray(pos_r2)).max() < 1e-5


def test_marginal_discrete():
    """MarginalDiscrete2D (Marginal2D<Dim, false>, distr_2d.h:805-818):
    self-consistency (pdf == eval, invert o sample == id, normalized)
    and histogram agreement, plus a conditioned 1-parameter family."""
    rng = np.random.default_rng(5)
    data = rng.uniform(0.05, 1.0, (9, 13)) ** 2 * 5
    dist = d2.build_discrete(data)
    N = 200_000
    u = jnp.asarray(rng.uniform(size=(N, 2)), jnp.float32)
    pos, pdf = d2.sample_discrete(dist, u)
    pe = np.asarray(d2.eval(dist, pos))
    assert np.allclose(np.asarray(pdf), pe, rtol=2e-4, atol=1e-5)
    u2, pdf2 = d2.invert_discrete(dist, pos)
    assert np.abs(np.asarray(u2) - np.asarray(u)).max() < 3e-4
    assert np.allclose(np.asarray(pdf2), np.asarray(pdf), rtol=1e-4)
    area = float(np.mean(1.0 / np.maximum(np.asarray(pdf), 1e-12)))
    assert abs(area - 1.0) < 0.02, area
    # histogram matches the bilinear density
    H = np.histogram2d(np.asarray(pos)[:, 1], np.asarray(pos)[:, 0],
                       bins=4, range=[[0, 1], [0, 1]])[0] / N * 16
    fy, fx = np.meshgrid((np.arange(32) + 0.5) / 32,
                         (np.arange(32) + 0.5) / 32, indexing='ij')
    ev = np.asarray(d2.eval(dist, jnp.asarray(
        np.stack([fx.ravel(), fy.ravel()], -1), jnp.float32)))
    cell = ev.reshape(4, 8, 4, 8).mean((1, 3))
    assert np.abs(H - cell).max() / cell.max() < 0.05

    # parameter-conditioned: grid points reproduce the per-slice build
    pv = np.asarray([0.0, 1.0], np.float32)
    fam = np.stack([data, data[::-1]])
    distp = d2.build_discrete(fam, param_values=(pv,))
    for p, sl in ((0.0, data), (1.0, data[::-1])):
        par = (jnp.full((N,), p, jnp.float32),)
        pos_p, pdf_p = d2.sample_discrete(distp, u, par)
        ref = d2.build_discrete(sl)
        pos_r, pdf_r = d2.sample_discrete(ref, u)
        assert np.abs(np.asarray(pos_p) - np.asarray(pos_r)).max() < 1e-5
