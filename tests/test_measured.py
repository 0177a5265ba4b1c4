"""Measured BSDF: tensor-file container, Marginal2D warps, and the
chained luminance/VNDF importance sampling. References:
src/bsdfs/measured.cpp, src/libcore/tensor.cpp,
include/mitsuba/core/distr_2d.h:818-1436.

The reference's RGL data files are not in the checkout, so the material is
SYNTHESIZED: a GGX-flavored NDF/VNDF/luminance/spectra set on the same
grids a real .bsdf file carries. The warp machinery's invariants
(sample/pdf chi2 consistency, eval = weight * pdf, invert(sample) = id)
hold for any positive fields, so this exercises the full component.
"""
import os

import numpy as np
import jax.numpy as jnp

from scenes import cornell_box
from mitsuba_nlvrl_tpu import build_scene, render
from mitsuba_nlvrl_tpu.bsdf import measured as meas
from mitsuba_nlvrl_tpu.core import distr2d


def _synth_fields(res=32, n_theta=8, alpha=0.4):
    """GGX-flavored synthetic measured material on RGL-format grids."""
    theta_i = np.linspace(0.0, np.pi / 2 * 0.98, n_theta).astype(np.float32)
    phi_i = np.array([-np.pi, np.pi], np.float32)        # isotropic
    wavelengths = np.array([420.0, 500.0, 580.0, 660.0], np.float32)

    xu = np.linspace(1e-3, 1.0, res)                     # theta2u coords
    yu = np.linspace(0.0, 1.0, res)                      # phi2u coords
    theta_m = xu ** 2 * (np.pi / 2)
    phi_m = (2.0 * yu - 1.0) * np.pi

    def ggx_d(t):
        c2 = np.cos(t) ** 2
        return alpha ** 2 / (np.pi * (c2 * (alpha ** 2 - 1) + 1) ** 2)

    ndf = np.tile(ggx_d(theta_m)[None, :], (res, 1)).astype(np.float32)
    sigma = np.tile((0.5 + 0.5 * np.cos(theta_m))[None, :],
                    (res, 1)).astype(np.float32)

    # vndf in warped u-space: Dvis-flavored including the u-space jacobian
    # (2 pi^2 u_theta sin(theta_m)) so sampling behaves like a real file
    vndf = np.zeros((2, n_theta, res, res), np.float32)
    for ti, t in enumerate(theta_i):
        wi = np.array([np.sin(t), 0.0, np.cos(t)])
        m_dirs = np.stack(np.broadcast_arrays(
            np.cos(phi_m)[:, None] * np.sin(theta_m)[None, :],
            np.sin(phi_m)[:, None] * np.sin(theta_m)[None, :],
            np.cos(theta_m)[None, :]), -1)
        dvis = ggx_d(theta_m)[None, :] * np.maximum(
            m_dirs @ wi, 0.0) + 1e-4
        jac = 2 * np.pi ** 2 * xu[None, :] * np.sin(theta_m)[None, :]
        vndf[:, ti] = (dvis * jac).astype(np.float32)

    lum = np.zeros((2, n_theta, res, res), np.float32)
    for ti in range(n_theta):
        lum[:, ti] = (0.4 + 0.6 * np.outer(1 - yu * (1 - yu),
                                           np.cos(theta_m))).astype(
            np.float32)

    spectra = np.zeros((2, n_theta, 4, res, res), np.float32)
    for k in range(4):
        w = 0.3 + 0.7 * k / 3.0
        spectra[:, :, k] = w * (0.2 + np.cos(theta_m)[None, :])

    return {
        'theta_i': theta_i, 'phi_i': phi_i, 'wavelengths': wavelengths,
        'ndf': ndf, 'sigma': sigma, 'vndf': vndf, 'luminance': lum,
        'spectra': spectra,
        'description': np.frombuffer(b'synthetic ggx', np.uint8),
        'jacobian': np.array([1], np.uint8),
    }


def test_tensor_file_round_trip(tmp_path):
    fields = _synth_fields(res=8, n_theta=3)
    path = os.path.join(tmp_path, 'synth.bsdf')
    meas.write_tensor_file(path, fields)
    back = meas.read_tensor_file(path)
    assert set(back) == set(fields)
    for k in fields:
        assert back[k].dtype == np.asarray(fields[k]).dtype, k
        assert np.array_equal(back[k], fields[k]), k


def test_measured_sample_invert_eval_consistency():
    data, mm = meas.load_fields(_synth_fields())
    assert mm.isotropic and mm.jacobian and mm.reduction == 1
    rng = np.random.default_rng(0)
    N = 20000
    t = 0.7
    wi = jnp.tile(jnp.asarray([[np.sin(t), 0.0, np.cos(t)]], jnp.float32),
                  (N, 1))
    u2 = jnp.asarray(rng.uniform(0, 1, (N, 2)), jnp.float32)
    wo, pdf, weight = meas.sample(data, mm, wi, u2)
    ok = np.asarray(pdf) > 0
    assert ok.mean() > 0.9
    # weight must equal eval / pdf at the sampled directions
    f = np.asarray(meas.eval(data, mm, wi, wo))
    w = np.asarray(weight)
    p = np.asarray(pdf)
    rel = np.abs(w[ok] - f[ok] / p[ok, None]) / np.maximum(w[ok], 1e-3)
    assert np.quantile(rel, 0.99) < 0.02, np.quantile(rel, 0.99)
    # pdf() must reproduce the sampling density
    p2 = np.asarray(meas.pdf(data, mm, wi, wo))
    relp = np.abs(p2[ok] - p[ok]) / np.maximum(p[ok], 1e-3)
    assert np.quantile(relp, 0.99) < 0.02, np.quantile(relp, 0.99)


def test_measured_chi2():
    """Pearson chi2 of measured sampling vs its pdf (the reference's
    test_measured gate)."""
    from mitsuba_nlvrl_tpu.testing import ChiSquareTest, SphericalDomain
    data, mm = meas.load_fields(_synth_fields())
    t = 0.5

    def sf(u):
        N = u.shape[0]
        wi = jnp.tile(jnp.asarray([[np.sin(t), 0.0, np.cos(t)]],
                                  jnp.float32), (N, 1))
        wo, pdf, _ = meas.sample(data, mm, wi, u[:, :2])
        return jnp.where((pdf > 0)[:, None], wo, jnp.nan)

    def pf(d):
        N = d.shape[0]
        wi = jnp.tile(jnp.asarray([[np.sin(t), 0.0, np.cos(t)]],
                                  jnp.float32), (N, 1))
        return meas.pdf(data, mm, wi, d)

    test = ChiSquareTest(SphericalDomain(), sf, pf, sample_count=400_000,
                         res=32)
    assert test.run(0.005), test.messages


def test_measured_render_smoke():
    d = cornell_box(spp=4, res=12)
    d['shapes'][0]['bsdf'] = {'type': 'measured',
                              '_fields': _synth_fields()}
    s, m = build_scene(d)
    assert len(m.measured_meta) == 1 and len(s.measured) == 1
    img = np.asarray(render(s, m, spp=4, seed=2))
    assert np.isfinite(img).all() and img.mean() > 0
