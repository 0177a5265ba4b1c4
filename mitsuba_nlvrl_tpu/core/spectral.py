"""Spectral rendering support: hero-wavelength sampling, CIE integration,
and sRGB->spectrum upsampling.

TPU-native analog of the reference's ``*_spectral`` variants:

  * ``sample_rgb_spectrum`` / ``pdf_rgb_spectrum`` — the Radziszewski et al.
    continuous importance distribution over [360, 830] nm
    (include/mitsuba/core/spectrum.h:271-301), drawn as 4 stratified hero
    wavelengths per lane (math::sample_shifted, spectrum.h:305-314).
  * ``cie1931_xyz`` — jnp lerp of the 5 nm CIE tables (spectrum.h:148-178).
  * sRGB->spectrum upsampling with the Jakob & Hanika sigmoid-polynomial
    model (include/mitsuba/render/srgb.h:9-23): reflectance(lambda) =
    sigmoid(c0 t^2 + c1 t + c2). Instead of shipping the reference's
    rgb2spec binary table we FIT the coefficients ourselves (vectorized
    Gauss-Newton against CIE-weighted D65 integration) over an
    (argmax-channel, a, b, sqrt(max)) grid once, cache the table under
    ``data/srgb_coeff.npz``, and trilerp it on device.
  * D65 illuminant SPD (standard CIE data, as src/spectra/d65.cpp) with a
    numerically-derived normalization so an RGB (1,1,1) emitter integrates
    back to sRGB (1,1,1) through the spectral film path.

The spectral estimator contract: a path contribution L(lambda_j) with the
sampled inverse pdfs w_j develops to
``srgb = XYZ_TO_SRGB @ mean_j(L_j * cie_xyz(lambda_j) * w_j)``
(imageblock.h:114 + spectrum.h:210-217).
"""
from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from .cie_data import CIE_MIN, CIE_MAX, CIE_SAMPLES, CIE_X, CIE_Y, CIE_Z
from .spectrum import SRGB_TO_XYZ, XYZ_TO_SRGB

WAVELENGTH_MIN = 360.0
WAVELENGTH_MAX = 830.0
N_HERO = 4          # wavelengths carried per lane (reference SPECTRAL_SAMPLES)

# CIE Standard Illuminant D65 relative SPD, 360-830 nm at 5 nm, normalized
# to 100 at 560 nm (standard public CIE data; same table as the reference's
# src/spectra/d65.cpp uses).
D65_DATA = np.array([
    46.6383, 49.3637, 52.0891, 51.0323, 49.9755, 52.3118, 54.6482, 68.7015,
    82.7549, 87.1204, 91.486, 92.4589, 93.4318, 90.057, 86.6823, 95.7736,
    104.865, 110.936, 117.008, 117.41, 117.812, 116.336, 114.861, 115.392,
    115.923, 112.367, 108.811, 109.082, 109.354, 108.578, 107.802, 106.296,
    104.79, 106.239, 107.689, 106.047, 104.405, 104.225, 104.046, 102.023,
    100.0, 98.1671, 96.3342, 96.0611, 95.788, 92.2368, 88.6856, 89.3459,
    90.0062, 89.8026, 89.5991, 88.6489, 87.6987, 85.4936, 83.2886, 83.4939,
    83.6992, 81.863, 80.0268, 80.1207, 80.2146, 81.2462, 82.2778, 80.281,
    78.2842, 74.0027, 69.7213, 70.6652, 71.6091, 72.979, 74.349, 67.9765,
    61.604, 65.7448, 69.8856, 72.4863, 75.087, 69.3398, 63.5927, 55.0054,
    46.4182, 56.6118, 66.8054, 65.0941, 63.3828, 63.8434, 64.304, 61.8779,
    59.4519, 55.7054, 51.959, 54.6998, 57.4406, 58.8765, 60.3125,
], np.float64)

_LAM = np.linspace(CIE_MIN, CIE_MAX, CIE_SAMPLES)
_CMF = np.stack([CIE_X, CIE_Y, CIE_Z], axis=-1)          # (95, 3)
_DLAM = (CIE_MAX - CIE_MIN) / (CIE_SAMPLES - 1)

# Normalize D65 so that integrating it against the CIE curves yields the
# sRGB whitepoint with Y = 1 — then an RGB (1,1,1) emitter spectrum
# (model(1) * D65_HAT) develops back to exactly (1,1,1). The reference's
# equivalent constant is the hand-derived 1/10568 (d65.cpp:52).
_D65_Y = float((D65_DATA * _CMF[:, 1]).sum() * _DLAM)
D65_HAT = (D65_DATA / _D65_Y).astype(np.float64)          # (95,)

# CIE-and-D65 weighted quadrature for the upsampling fit: the model
# spectrum s(lambda) maps to XYZ as s @ _FIT_W.
_FIT_W = (_CMF * D65_HAT[:, None] * _DLAM)                # (95, 3)
_T_GRID = (_LAM - WAVELENGTH_MIN) / (WAVELENGTH_MAX - WAVELENGTH_MIN)
_BASIS = np.stack([_T_GRID ** 2, _T_GRID, np.ones_like(_T_GRID)])  # (3, 95)


# --- hero wavelength sampling (device) --------------------------------------

def sample_hero_wavelengths(u):
    """Draw N_HERO stratified wavelengths per lane from the RGB-camera
    importance distribution (spectrum.h:271-285). u: (N,) uniform.
    Returns (wavelengths (N, 4), inv_pdf weights (N, 4))."""
    u = jnp.asarray(u, jnp.float32)
    shift = jnp.arange(N_HERO, dtype=jnp.float32) / N_HERO
    us = jnp.mod(u[:, None] + shift[None, :], 1.0)        # sample_shifted
    lam = 538.0 - jnp.arctanh(0.8569106254698279
                              - 1.8275019724092267 * us) * 138.88888888888889
    tmp = jnp.cosh(0.0072 * (lam - 538.0))
    weight = 253.82 * tmp * tmp                           # = 1 / pdf
    return lam, weight


def pdf_rgb_spectrum(lam):
    """Per-wavelength pdf of the strategy above (spectrum.h:293-301)."""
    lam = jnp.asarray(lam, jnp.float32)
    tmp = 1.0 / jnp.cosh(0.0072 * (lam - 538.0))
    ok = (lam >= WAVELENGTH_MIN) & (lam <= WAVELENGTH_MAX)
    return jnp.where(ok, 0.003939804229326285 * tmp * tmp, 0.0)


_CMF_F32 = _CMF.astype(np.float32)


def cie1931_xyz(lam):
    """Lerp the CIE tables at wavelengths lam (...,): returns (..., 3)."""
    # NOTE: tables enter as numpy constants at every call site — caching a
    # jnp array created inside a jit trace would leak a tracer
    _CMF_J = jnp.asarray(_CMF_F32)
    t = (lam - CIE_MIN) * ((CIE_SAMPLES - 1) / (CIE_MAX - CIE_MIN))
    ok = (lam >= CIE_MIN) & (lam <= CIE_MAX)
    i0 = jnp.clip(t.astype(jnp.int32), 0, CIE_SAMPLES - 2)
    w1 = (t - i0)[..., None]
    v = _CMF_J[i0] * (1.0 - w1) + _CMF_J[i0 + 1] * w1
    return jnp.where(ok[..., None], v, 0.0)


def spectral_to_srgb(values, lam, inv_pdf):
    """Develop per-lane spectral radiance samples to linear sRGB
    (spectrum_to_xyz + xyz_to_srgb, spectrum.h:210-230).
    values/lam/inv_pdf: (N, 4). Returns (N, 3)."""
    xyz = jnp.mean((values * inv_pdf)[..., None] * cie1931_xyz(lam), axis=-2)
    return xyz @ jnp.asarray(XYZ_TO_SRGB, jnp.float32).T


# --- sigmoid-polynomial model ------------------------------------------------

def _sigmoid_np(v):
    return np.clip(0.5 * v / np.sqrt(v * v + 1.0) + 0.5, 0.0, 1.0)


def _fit_xyz(c):
    """XYZ of the model spectrum for coefficient rows c (M, 3)."""
    v = c @ _BASIS                                        # (M, 95)
    return _sigmoid_np(v) @ _FIT_W                        # (M, 3)


def fit_sigmoid_coeffs(rgb, iters: int = 40):
    """Vectorized damped Gauss-Newton fit of sigmoid-polynomial
    coefficients so that the model spectrum integrates (under D65 and the
    CIE curves) back to the given linear sRGB values in [0, 1].
    rgb: (M, 3) -> coeffs (M, 3). Host-side numpy (build/LUT time only)."""
    rgb = np.clip(np.asarray(rgb, np.float64), 1e-4, 1.0 - 1e-4)
    target = rgb @ SRGB_TO_XYZ.T                          # (M, 3)
    M = rgb.shape[0]
    c = np.zeros((M, 3))
    c[:, 2] = np.arctanh(2.0 * rgb.mean(-1) - 1.0)        # flat init
    lam_damp = np.full((M,), 1e-6)
    prev = np.full((M,), np.inf)
    for _ in range(iters):
        v = c @ _BASIS                                    # (M, 95)
        s = _sigmoid_np(v)
        r = s @ _FIT_W - target                           # (M, 3) residual
        err = (r * r).sum(-1)
        # adaptive damping: grow where the error increased
        lam_damp = np.where(err > prev, lam_damp * 10.0, lam_damp * 0.5)
        lam_damp = np.clip(lam_damp, 1e-9, 1e3)
        prev = np.minimum(prev, err)
        ds = 0.5 / np.power(v * v + 1.0, 1.5)             # (M, 95)
        # J[m, out, j] = sum_k ds[m,k] * basis[j,k] * W[k,out]
        J = np.einsum('mk,jk,ko->moj', ds, _BASIS, _FIT_W)
        A = J.transpose(0, 2, 1) @ J
        A += lam_damp[:, None, None] * np.eye(3)
        g = np.einsum('moj,mo->mj', J, r)
        dc = np.linalg.solve(A, g[..., None])[..., 0]
        c = c - np.clip(dc, -100.0, 100.0)
    return c


# --- coefficient LUT ---------------------------------------------------------

LUT_A = 33       # off-max channel resolution
LUT_S = 32       # sqrt(max-component) resolution
_DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'data')
_LUT_PATH = os.path.join(_DATA_DIR, 'srgb_coeff.npz')
_LUT_CACHE = None


def build_lut():
    """Fit the (3, LUT_S, LUT_A, LUT_A, 3) coefficient table: leading axis
    is the argmax channel, then sqrt(max) and the two other components
    relative to the max (the rgb2spec parameterization, re-derived)."""
    a = np.linspace(0.0, 1.0, LUT_A)
    s = np.linspace(np.sqrt(1e-4), 1.0, LUT_S)
    out = np.zeros((3, LUT_S, LUT_A, LUT_A, 3), np.float32)
    for imax in range(3):
        S, A, B = np.meshgrid(s, a, a, indexing='ij')
        mx = S ** 2
        rgb = np.zeros(S.shape + (3,))
        o1, o2 = [j for j in range(3) if j != imax]
        rgb[..., imax] = mx
        rgb[..., o1] = A * mx
        rgb[..., o2] = B * mx
        c = fit_sigmoid_coeffs(rgb.reshape(-1, 3))
        out[imax] = c.reshape(LUT_S, LUT_A, LUT_A, 3)
    return out


def get_lut():
    """Load (or build + cache) the coefficient LUT (numpy; call sites lift
    it into each trace as a constant — a cached jnp array created inside a
    jit trace would leak a tracer)."""
    global _LUT_CACHE
    if _LUT_CACHE is None:
        if os.path.exists(_LUT_PATH):
            _LUT_CACHE = np.load(_LUT_PATH)['lut']
        else:
            _LUT_CACHE = build_lut()
            os.makedirs(_DATA_DIR, exist_ok=True)
            np.savez_compressed(_LUT_PATH, lut=_LUT_CACHE)
    return jnp.asarray(_LUT_CACHE)


def srgb_model_eval(coeff, lam):
    """Evaluate the sigmoid-polynomial reflectance model (srgb.h:9-23).
    coeff (..., 3), lam (..., L) -> (..., L)."""
    t = (lam - WAVELENGTH_MIN) / (WAVELENGTH_MAX - WAVELENGTH_MIN)
    v = (coeff[..., 0:1] * t + coeff[..., 1:2]) * t + coeff[..., 2:3]
    return jnp.clip(0.5 * v / jnp.sqrt(v * v + 1.0) + 0.5, 0.0, 1.0)


def _lut_fetch(rgb):
    """Trilerp coefficient lookup for rgb (N, 3) in [0, 1] -> (N, 3)."""
    lut = get_lut()
    rgb = jnp.clip(rgb, 1e-4, 1.0)
    imax = jnp.argmax(rgb, axis=-1)                       # (N,)
    mx = jnp.max(rgb, axis=-1)
    # off-max component order per argmax channel, matching build_lut
    oth = jnp.asarray([[1, 2], [0, 2], [0, 1]], jnp.int32)[imax]  # (N, 2)
    from ..ops.gather import select_channel
    oth1 = select_channel(rgb, oth[:, 0]) / mx
    oth2 = select_channel(rgb, oth[:, 1]) / mx
    s0 = jnp.sqrt(1e-4)
    fs = (jnp.sqrt(mx) - s0) / (1.0 - s0) * (LUT_S - 1)
    fa = oth1 * (LUT_A - 1)
    fb = oth2 * (LUT_A - 1)
    fs = jnp.clip(fs, 0.0, LUT_S - 1 - 1e-4)
    fa = jnp.clip(fa, 0.0, LUT_A - 1 - 1e-4)
    fb = jnp.clip(fb, 0.0, LUT_A - 1 - 1e-4)
    i_s, i_a, i_b = fs.astype(jnp.int32), fa.astype(jnp.int32), \
        fb.astype(jnp.int32)
    ws, wa, wb = fs - i_s, fa - i_a, fb - i_b
    out = 0.0
    for ds in (0, 1):
        for da in (0, 1):
            for db in (0, 1):
                w = (jnp.where(ds, ws, 1 - ws) * jnp.where(da, wa, 1 - wa)
                     * jnp.where(db, wb, 1 - wb))
                out = out + w[:, None] * lut[imax, i_s + ds, i_a + da,
                                             i_b + db]
    return out


def upsample_reflectance(rgb, lam):
    """rgb (N, 3) in [0, 1] + wavelengths (N, L) -> spectral reflectance
    samples (N, L) whose D65-weighted CIE integral reproduces rgb."""
    coeff = _lut_fetch(rgb)
    val = srgb_model_eval(coeff, lam)
    # exact zeros stay zero (black reflectors must not leak energy)
    return jnp.where((jnp.max(rgb, axis=-1) > 1e-5)[:, None], val, 0.0)


def upsample_weight(rgb, lam):
    """Upsample an UNBOUNDED non-negative RGB quantity (a path weight or
    radiance scale): normalize by the max component, upsample the chroma,
    and scale back (the srgb.cpp unbounded branch). Achromatic weights pass
    through exactly, so wavelength-independent geometry/pdf factors inside
    BSDF weights are untouched."""
    mx = jnp.max(rgb, axis=-1)
    safe = jnp.maximum(mx, 1e-12)
    val = upsample_reflectance(rgb / safe[:, None], lam)
    return val * mx[:, None]


def cie_table_eval(tab, lam):
    """Linearly interpolate tables sampled on the CIE wavelength grid
    (CIE_MIN..CIE_MAX, CIE_SAMPLES points): tab (..., CIE_SAMPLES)
    broadcast against lam (..., L) -> values (..., L). Wavelengths outside
    the grid clamp to the endpoints (the tabulated .spd curves extend past
    the visible range, so clamping only ever extrapolates flatly)."""
    t = (lam - CIE_MIN) * ((CIE_SAMPLES - 1) / (CIE_MAX - CIE_MIN))
    t = jnp.clip(t, 0.0, CIE_SAMPLES - 1.0)
    i0 = jnp.clip(t.astype(jnp.int32), 0, CIE_SAMPLES - 2)
    w1 = t - i0
    if tab.ndim < lam.ndim:
        tab = jnp.broadcast_to(tab, lam.shape[:-1] + (tab.shape[-1],))
    v0 = jnp.take_along_axis(tab, i0, axis=-1)
    v1 = jnp.take_along_axis(tab, i0 + 1, axis=-1)
    return v0 * (1.0 - w1) + v1 * w1


_D65_F32 = D65_HAT.astype(np.float32)


def d65_eval(lam):
    """Normalized D65 SPD at wavelengths lam: a (1,1,1)-sRGB emitter's
    spectrum is upsample(chroma) * d65_eval * scale."""
    _D65_J = jnp.asarray(_D65_F32)
    t = (lam - CIE_MIN) * ((CIE_SAMPLES - 1) / (CIE_MAX - CIE_MIN))
    ok = (lam >= CIE_MIN) & (lam <= CIE_MAX)
    i0 = jnp.clip(t.astype(jnp.int32), 0, CIE_SAMPLES - 2)
    w1 = t - i0
    v = _D65_J[i0] * (1.0 - w1) + _D65_J[i0 + 1] * w1
    return jnp.where(ok, v, 0.0)


def emitter_spectrum(rgb, lam):
    """Spectral radiance of an RGB-specified emitter: the reference
    spectral mode expands RGB emitters into srgb_d65 (upsampled chroma
    times the D65 illuminant, src/spectra/srgb_d65.cpp)."""
    return upsample_weight(rgb, lam) * d65_eval(lam)


def planck(lam, temperature):
    """Planck blackbody spectral radiance in W / (m^2 sr nm), matching
    src/spectra/blackbody.cpp units. lam in nm."""
    h, c, kb = 6.62607015e-34, 2.99792458e8, 1.380649e-23
    lm = lam * 1e-9
    num = 2.0 * h * c * c
    return num / (lm ** 5 * jnp.expm1(h * c / (lm * kb * temperature))) * 1e-9
