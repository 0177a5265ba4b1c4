"""Measured polarized pBRDF: tensor loading, 4-D Mueller interpolation,
cosine/GGX mixture sampling and the Stokes-frame rotations. References:
src/bsdfs/measured_polarized.cpp (Baek et al. 2020 KAIST pBRDFs).

The KAIST .pbsdf data files are not in the checkout, so materials are
SYNTHESIZED on the same (phi_d, theta_d, theta_h, wvls) grids a real file
carries: a depolarizing lobe (only M00 nonzero) and a polarizing lobe (an
ideal linear polarizer scaled by a smooth function). All plugin
invariants hold for any such data."""
import numpy as np
import jax.numpy as jnp

from scenes import cornell_box
from mitsuba_nlvrl_tpu import build_scene, render
from mitsuba_nlvrl_tpu.bsdf import measured as meas
from mitsuba_nlvrl_tpu.bsdf import measured_pol as mp


def _grids(Pd=9, Td=7, Th=6):
    phi_d = np.linspace(-np.pi, np.pi, Pd).astype(np.float32)
    theta_d = np.linspace(0.0, np.pi / 2, Td).astype(np.float32)
    theta_h = np.linspace(0.0, np.pi / 2, Th).astype(np.float32)
    wvls = np.array([450, 550, 650], np.uint16)
    return phi_d, theta_d, theta_h, wvls


def _synth_pol_fields(kind='polarizing', Pd=9, Td=7, Th=6):
    phi_d, theta_d, theta_h, wvls = _grids(Pd, Td, Th)
    W = wvls.shape[0]
    # smooth positive magnitude over (theta_h, wavelength)
    mag = (0.1 + 0.4 * np.cos(theta_h)[:, None]
           * (0.5 + 0.5 * np.arange(W)[None, :] / (W - 1)))  # (Th, W)
    M = np.zeros((Pd, Td, Th, W, 4, 4), np.float32)
    if kind == 'depolarizing':
        M[..., 0, 0] = mag[None, None]
    else:
        pol = 0.5 * np.array([[1, 1, 0, 0], [1, 1, 0, 0],
                              [0, 0, 0, 0], [0, 0, 0, 0]], np.float32)
        M[:] = mag[None, None, :, :, None, None] * pol
    return {'theta_h': theta_h.reshape(1, -1),
            'theta_d': theta_d.reshape(1, -1),
            'phi_d': phi_d.reshape(1, -1), 'wvls': wvls, 'M': M}


def _hemi(rng, n):
    v = rng.normal(size=(n, 3))
    v[:, 2] = np.abs(v[:, 2]) + 0.05
    return jnp.asarray(v / np.linalg.norm(v, axis=1, keepdims=True),
                       jnp.float32)


def _params(n, alpha=0.3, wavelength=-1.0):
    P = jnp.zeros((n, 20), jnp.float32)
    return P.at[:, 1].set(alpha).at[:, 2].set(wavelength)


def test_pbsdf_tensor_round_trip(tmp_path):
    fields = _synth_pol_fields()
    path = str(tmp_path / 'synth.pbsdf')
    meas.write_tensor_file(path, fields)
    data = mp.load(path)
    assert data.table.shape == fields['M'].shape
    assert np.allclose(np.asarray(data.table), fields['M'])
    # malformed shape must be rejected
    bad = dict(fields)
    bad['M'] = fields['M'][:, :, :, :1]
    try:
        mp.load_fields(bad)
        assert False, 'expected shape validation error'
    except ValueError:
        pass


def test_constant_grid_interpolation_exact():
    """A grid holding one constant matrix interpolates to exactly that
    matrix for any query, including clamped out-of-range wavelengths."""
    fields = _synth_pol_fields('polarizing')
    M0 = np.array([[1.0, 0.2, 0.0, 0.0], [0.2, 0.9, 0.0, 0.0],
                   [0.0, 0.0, 0.8, 0.1], [0.0, 0.0, -0.1, 0.8]],
                  np.float32) * 0.25
    fields['M'] = np.tile(M0, fields['M'].shape[:4] + (1, 1)).astype(
        np.float32)
    data = mp.load_fields(fields)
    Mi = mp.eval_mueller(data, jnp.asarray([0.0, 1.0, -2.0]),
                         jnp.asarray([0.1, 0.7, 1.4]),
                         jnp.asarray([0.0, 0.4, 1.5]),
                         jnp.asarray([[300.0, 550.0, 900.0]] * 3))
    assert np.allclose(np.asarray(Mi), M0, atol=1e-6)


def test_nan_cells_zero_the_matrix():
    """NaN-encoded invalid configurations must zero the interpolated
    matrix (measured_polarized.cpp:276-279)."""
    fields = _synth_pol_fields('depolarizing')
    fields['M'][..., :2, :, :, :] = np.nan  # low theta_h band invalid
    data = mp.load_fields(fields)
    M = mp.eval_mueller(data, jnp.zeros(2), jnp.asarray([0.0, 1.4]),
                        jnp.zeros(2), jnp.full((2, 3), 550.0))
    out = np.asarray(M)
    assert np.isfinite(out).all()
    assert np.all(out[0] == 0.0)      # inside the NaN band -> zero
    assert out[1, :, 0, 0].min() > 0  # valid band unaffected


def test_sample_eval_pdf_consistency():
    data = mp.load_fields(_synth_pol_fields('polarizing'))
    rng = np.random.default_rng(3)
    N = 20000
    wi = _hemi(rng, N)
    P = _params(N)
    u1 = jnp.asarray(rng.uniform(size=N), jnp.float32)
    u2 = jnp.asarray(rng.uniform(size=(N, 2)), jnp.float32)
    wo, pdf, weight = mp.sample(data, P, wi, u1, u2)
    ok = np.asarray(pdf) > 0
    assert ok.mean() > 0.8
    f = np.asarray(mp.eval(data, P, wi, wo))
    w = np.asarray(weight)
    p = np.asarray(pdf)
    rel = np.abs(w[ok] - f[ok] / p[ok, None]) / np.maximum(w[ok], 1e-3)
    assert np.quantile(rel, 0.99) < 0.02


def test_mixture_sampling_chi2():
    """Pearson chi2 of the cosine/GGX mixture vs its pdf."""
    from mitsuba_nlvrl_tpu.testing import ChiSquareTest, SphericalDomain
    data = mp.load_fields(_synth_pol_fields('polarizing'))
    t = 0.6
    def _wi(n):
        return jnp.tile(jnp.asarray([[np.sin(t), 0.0, np.cos(t)]],
                                    jnp.float32), (n, 1))

    def sf(u):
        n = u.shape[0]
        wo, pdf, _ = mp.sample(data, _params(n), _wi(n),
                               u[:, 2], u[:, :2])
        return jnp.where((pdf > 0)[:, None], wo, jnp.nan)

    def pf(d):
        n = d.shape[0]
        return mp.pdf(_params(n), _wi(n), d)

    test = ChiSquareTest(SphericalDomain(), sf, pf, sample_count=400_000,
                         res=32, sample_dim=3)
    assert test.run(0.005), test.messages


def test_m00_invariance_and_depolarizer_rotation():
    """The (0, 0) Mueller entry is invariant under all Stokes basis
    rotations, and a pure-M00 (depolarizing) material stays pure-M00 in
    any frame."""
    rng = np.random.default_rng(7)
    N = 4096
    wi, wo = _hemi(rng, N), _hemi(rng, N)
    P = _params(N)
    for kind in ('polarizing', 'depolarizing'):
        data = mp.load_fields(_synth_pol_fields(kind))
        f = np.asarray(mp.eval(data, P, wi, wo))
        M = np.asarray(mp.eval_mueller_world_local(data, P, wi, wo, True))
        assert np.allclose(M[..., 0, 0], f, atol=1e-5)
        if kind == 'depolarizing':
            off = M.copy()
            off[..., 0, 0] = 0.0
            assert np.abs(off).max() < 1e-6


def test_fixed_wavelength_override():
    """wavelength > 0 pins every channel to that wavelength slice
    (measured_polarized.cpp:34-38 monochromatic mode)."""
    data = mp.load_fields(_synth_pol_fields('depolarizing'))
    rng = np.random.default_rng(1)
    wi, wo = _hemi(rng, 64), _hemi(rng, 64)
    f = np.asarray(mp.eval(data, _params(64, wavelength=550.0), wi, wo))
    assert np.allclose(f[:, 0], f[:, 1]) and np.allclose(f[:, 0], f[:, 2])
    # magnitude grows with wavelength in the synthetic data
    f_hi = np.asarray(mp.eval(data, _params(64, wavelength=650.0), wi, wo))
    sel = f[:, 0] > 1e-4
    assert (f_hi[sel, 0] > f[sel, 0]).all()


def test_render_and_stokes():
    """End-to-end: a measured_polarized floor renders non-black; the
    stokes integrator reports nonzero S1 for the polarizing material and
    ~zero S1 for the depolarizing one."""
    def scene_with(kind, component):
        d = cornell_box(spp=4, res=12)
        d['shapes'][0]['bsdf'] = {'type': 'measured_polarized',
                                  '_fields': _synth_pol_fields(kind),
                                  'alpha_sample': 0.4}
        if component is not None:
            d['integrator'] = {'type': 'stokes', 'component': component,
                               'integrator': {'type': 'path'}}
        return build_scene(d)

    s, m = scene_with('polarizing', None)
    assert len(s.measured_pol) == 1
    img = np.asarray(render(s, m, spp=4, seed=2))
    assert np.isfinite(img).all() and img.mean() > 0

    s0 = np.asarray(render(*scene_with('polarizing', 0), spp=8, seed=2))
    s1 = np.asarray(render(*scene_with('polarizing', 1), spp=8, seed=2))
    assert np.isfinite(s1).all()
    assert np.abs(s1).max() > 1e-4          # real polarization signal
    assert np.abs(s1).max() <= s0.max() + 1e-5

    z1 = np.asarray(render(*scene_with('depolarizing', 1), spp=8, seed=2))
    assert np.abs(z1).max() < 1e-4
