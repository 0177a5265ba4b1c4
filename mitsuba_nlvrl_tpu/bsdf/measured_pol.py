"""Measured polarized pBRDF (Baek et al. 2020 KAIST dataset).

TPU-native rebuild of the reference ``measured_polarized`` plugin
(src/bsdfs/measured_polarized.cpp): an isotropic polarized BRDF stored as
a 4-D grid of Mueller matrices over the Rusinkiewicz parameterization
(phi_d, theta_d, theta_h) and wavelength, importance-sampled by a fixed
cosine/GGX mixture (measured_polarized.cpp:170-206) and evaluated by
multilinear interpolation of the measured Mueller matrices followed by a
Stokes-frame rotation into the implicit bases of the in/out directions
(measured_polarized.cpp:209-292).

Design deviations (documented):
  * The reference repurposes ``Marginal2D<4, true>`` as a pure
    interpolator, calling ``eval`` 16 times with the 2-D position indexing
    the matrix entry (measured_polarized.cpp:253-274).  Here the whole
    (4, 4) matrix is fetched in ONE 4-D multilinear interpolation over the
    non-uniform grid — same math, one pass, and the corner gathers
    vectorize over the wavefront.
  * The reference restricts the plugin to spectral variants; like
    ``measured.py`` the spectra are evaluated per output channel at the
    lane's hero wavelengths in spectral mode and at fixed RGB
    representative wavelengths otherwise, so the plugin is usable in the
    default RGB (+polarized) pipeline.  A ``wavelength`` parameter > 0
    pins all channels to one wavelength exactly like the reference's
    monochromatic mode (measured_polarized.cpp:34-38).

Data lives outside the packed (B, 16) parameter table: one
``MeasuredPolData`` per material in ``scene.measured_pol``; the BSDF row
stores (slot, alpha_sample, wavelength) in params[0:3].
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax.numpy as jnp

from ..core import math as m
from ..core import frame as fr
from ..core import microfacet as mf
from ..core import warp as warp_mod
from ..core import mueller as mu
from .measured import read_tensor_file, RGB_WAVELENGTHS

# cosine-hemisphere weight of the sampling mixture
# (measured_polarized.cpp:13 COSINE_HEMISPHERE_PDF_WEIGHT)
COSINE_WEIGHT = 0.1


class MeasuredPolData(NamedTuple):
    """Device-side grid of one measured polarized material."""
    phi_d: jnp.ndarray    # (Pd,) grid nodes, radians
    theta_d: jnp.ndarray  # (Td,)
    theta_h: jnp.ndarray  # (Th,)
    wvls: jnp.ndarray     # (W,) wavelengths, nm
    table: jnp.ndarray    # (Pd, Td, Th, W, 4, 4) Mueller matrices


def load(path: str) -> MeasuredPolData:
    """Load a .pbsdf tensor file (measured_polarized.cpp:118-147)."""
    return load_fields(read_tensor_file(path))


def load_fields(tf: dict) -> MeasuredPolData:
    """Validate + build the grid from a parsed field dict.  The reference
    requires theta_h/theta_d/phi_d of shape (1, n), uint16 wvls and an
    M tensor of shape (Pd, Td, Th, W, 4, 4)."""
    theta_h = np.asarray(tf['theta_h'], np.float32).reshape(-1)
    theta_d = np.asarray(tf['theta_d'], np.float32).reshape(-1)
    phi_d = np.asarray(tf['phi_d'], np.float32).reshape(-1)
    wvls = np.asarray(tf['wvls'], np.float32).reshape(-1)
    table = np.asarray(tf['M'], np.float32)
    want = (phi_d.shape[0], theta_d.shape[0], theta_h.shape[0],
            wvls.shape[0], 4, 4)
    if table.shape != want:
        raise ValueError(
            f"measured_polarized: M has shape {table.shape}, expected "
            f"{want} from the phi_d/theta_d/theta_h/wvls fields")
    for name, ax in (('phi_d', phi_d), ('theta_d', theta_d),
                     ('theta_h', theta_h), ('wvls', wvls)):
        if ax.shape[0] < 2 or np.any(np.diff(ax) <= 0):
            raise ValueError(f"measured_polarized: {name} grid must be "
                             "strictly increasing with >= 2 nodes")
    return MeasuredPolData(
        phi_d=jnp.asarray(phi_d), theta_d=jnp.asarray(theta_d),
        theta_h=jnp.asarray(theta_h), wvls=jnp.asarray(wvls),
        table=jnp.asarray(table))


# --- geometry helpers (measured_polarized.cpp:349-386) -----------------------

def _phi(v):
    """Azimuth in [0, 2pi) (measured_polarized.cpp:352-356)."""
    p = jnp.arctan2(v[..., 1], v[..., 0])
    return jnp.where(p < 0, p + 2.0 * jnp.pi, p)


def _rot_z(v, angle):
    """Rotate v about +z by angle (Rodrigues, axis = z)."""
    s, c = jnp.sin(angle), jnp.cos(angle)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack([x * c - y * s, x * s + y * c, z], -1)


def _rusinkiewicz(i, o):
    """(phi_d, theta_h, theta_d) of the half-difference parameterization
    (measured_polarized.cpp:368-386; i/o naming as in the reference)."""
    h = m.normalize(i + o)
    b = _safe_norm(jnp.cross(jnp.broadcast_to(jnp.asarray([0., 0., 1.]),
                                              h.shape), h),
                   jnp.asarray([0.0, 1.0, 0.0]))
    t = _safe_norm(jnp.cross(b, h), jnp.asarray([1.0, 0.0, 0.0]))
    td = m.safe_acos(m.dot(h, i))
    th = m.safe_acos(h[..., 2])
    i_prj = _safe_norm(i - m.dot(i, h)[..., None] * h,
                       jnp.asarray([1.0, 0.0, 0.0]))
    cos_pd = jnp.clip(m.dot(t, i_prj), -1.0, 1.0)
    sin_pd = jnp.clip(m.dot(b, i_prj), -1.0, 1.0)
    pd = jnp.arctan2(sin_pd, cos_pd)
    return pd, th, td


def _safe_norm(v, fallback):
    n = m.norm(v)
    ok = n > 1e-8
    return jnp.where(ok[..., None], v / jnp.maximum(n, 1e-12)[..., None],
                     jnp.broadcast_to(fallback, v.shape))


# --- 4-D multilinear Mueller interpolation -----------------------------------

def _axis_lerp(nodes, x):
    """Clamped segment index + weight on a strictly-increasing node grid
    (the reference Marginal2D param lookup, distr_2d.h:857-870)."""
    idx = jnp.clip(jnp.searchsorted(nodes, x, side='right') - 1,
                   0, nodes.shape[0] - 2)
    n0 = nodes[idx]
    n1 = nodes[idx + 1]
    w = jnp.clip((x - n0) / jnp.maximum(n1 - n0, 1e-12), 0.0, 1.0)
    return idx, w


def eval_mueller(data: MeasuredPolData, pd, th, td, lam):
    """Interpolate the measured Mueller matrix at (phi_d, theta_h,
    theta_d) x wavelengths ``lam`` (N, C) -> (N, C, 4, 4).  NaN-encoded
    invalid configurations zero the whole matrix and M00 is clamped >= 0
    (measured_polarized.cpp:276-282)."""
    Pd, Td, Th, W = (data.phi_d.shape[0], data.theta_d.shape[0],
                     data.theta_h.shape[0], data.wvls.shape[0])
    tab = data.table.reshape(-1, 16)                      # (Pd*Td*Th*W, 16)
    i0, w0 = _axis_lerp(data.phi_d, pd)                   # (N,)
    i1, w1 = _axis_lerp(data.theta_d, td)
    i2, w2 = _axis_lerp(data.theta_h, th)
    i3, w3 = _axis_lerp(data.wvls, lam)                   # (N, C)
    s0, s1, s2 = Td * Th * W, Th * W, W
    base = (i0 * s0 + i1 * s1 + i2 * s2)[:, None]         # (N, 1)
    acc = jnp.zeros(lam.shape + (16,), jnp.float32)
    for d0 in (0, 1):
        f0 = w0 if d0 else 1.0 - w0
        for d1 in (0, 1):
            f1 = w1 if d1 else 1.0 - w1
            for d2 in (0, 1):
                f2 = w2 if d2 else 1.0 - w2
                off = base + d0 * s0 + d1 * s1 + d2 * s2
                for d3 in (0, 1):
                    f3 = w3 if d3 else 1.0 - w3           # (N, C)
                    wgt = (f0 * f1 * f2)[:, None] * f3
                    acc = acc + wgt[..., None] * tab[off + i3 + d3]
    M = acc.reshape(lam.shape + (4, 4))
    bad = jnp.isnan(M).any((-2, -1))
    M = jnp.where(bad[..., None, None], 0.0, M)
    return M.at[..., 0, 0].set(jnp.maximum(M[..., 0, 0], 0.0))


def _lanes_lam(P, like):
    """Per-channel wavelengths: the row's fixed-wavelength override when
    > 0, else the RGB representatives (N, 3)."""
    rep = jnp.broadcast_to(jnp.asarray(RGB_WAVELENGTHS, jnp.float32),
                           like.shape[:-1] + (3,))
    fixed = P[..., 2:3]
    return jnp.where(fixed > 0, jnp.broadcast_to(fixed, rep.shape), rep)


# --- scalar (unpolarized-magnitude) arms --------------------------------------

def eval(data: MeasuredPolData, P, wi, wo, lam=None):
    """M00 * cos_theta_o per channel (the non-polarized reference branch,
    measured_polarized.cpp:293-311; M00 is invariant under the Stokes
    basis rotations so the std-frame rotation is unnecessary here)."""
    cti, cto = fr.cos_theta(wi), fr.cos_theta(wo)
    act = (cti > 0) & (cto > 0)
    if lam is None:
        lam = _lanes_lam(P, wi)
    pd, th, td = _rusinkiewicz(wo, wi)
    M = eval_mueller(data, pd, th, td, lam)
    return jnp.where(act[..., None], M[..., 0, 0] * cto[..., None], 0.0)


def pdf(P, wi, wo):
    """Fixed cosine/GGX mixture pdf (measured_polarized.cpp:315-338)."""
    a = jnp.maximum(P[..., 1], 1e-4)
    cti, cto = fr.cos_theta(wi), fr.cos_theta(wo)
    H = _safe_norm(wi + wo, jnp.asarray([0.0, 0.0, 1.0]))
    pdf_d = warp_mod.square_to_cosine_hemisphere_pdf(wo)
    pdf_m = mf.vndf_pdf(wi, H, a, a) \
        / jnp.maximum(4.0 * m.dot(wo, H), 1e-9)
    p = COSINE_WEIGHT * pdf_d + (1.0 - COSINE_WEIGHT) * pdf_m
    return jnp.where((cti > 0) & (cto > 0), p, 0.0)


def sample(data: MeasuredPolData, P, wi, u1, u2, lam=None):
    """Sample wo from the mixture, weight = eval/pdf
    (measured_polarized.cpp:170-206).  Returns (wo, pdf, weight)."""
    a = jnp.maximum(P[..., 1], 1e-4)
    wo_d = warp_mod.square_to_cosine_hemisphere(u2)
    h, _ = mf.sample_vndf(wi, u2, a, a)
    wo_m = 2.0 * m.dot(wi, h)[..., None] * h - wi
    diffuse = u1 < COSINE_WEIGHT
    wo = jnp.where(diffuse[..., None], wo_d, wo_m)
    p = pdf(P, wi, wo)
    val = eval(data, P, wi, wo, lam)
    act = (fr.cos_theta(wi) > 0) & (fr.cos_theta(wo) > 0) & (p > 0)
    weight = jnp.where(act[..., None], val * m.safe_rcp(p)[..., None], 0.0)
    return wo, p, weight


# --- polarized eval ------------------------------------------------------------

def eval_mueller_world_local(data: MeasuredPolData, P, wi_loc, wo_loc,
                             mode_radiance: bool):
    """Full polarized eval in the LOCAL shading frame: (N, 3, 4, 4)
    Mueller (times cos_theta_o) whose in/out Stokes bases are the implicit
    ``stokes_basis`` of -wo_hat / wi_hat (measured_polarized.cpp:209-292).
    The caller re-expresses it in world frame."""
    cti, cto = fr.cos_theta(wi_loc), fr.cos_theta(wo_loc)
    act = (cti > 0) & (cto > 0)
    wo_hat = wo_loc if mode_radiance else wi_loc
    wi_hat = wi_loc if mode_radiance else wo_loc

    # standard frame: wi_hat azimuth rotated onto the x axis (Figure 3)
    phi_std = _phi(wi_hat)
    wo_std = _rot_z(wo_hat, -phi_std)
    wi_std = _rot_z(wi_hat, -phi_std)
    pd, th, td = _rusinkiewicz(wo_std, wi_std)
    lam = _lanes_lam(P, wi_loc)
    M = eval_mueller(data, pd, th, td, lam)               # (N, 3, 4, 4)

    # Stokes reference axes in the plane of reflection (Figure 4)
    zo = -wo_std
    to = _safe_norm(jnp.cross(wo_std - wi_std, zo), jnp.asarray([0., 1., 0.]))
    yo = _safe_norm(jnp.cross(to, zo), jnp.asarray([0.0, 1.0, 0.0]))
    xo = jnp.cross(yo, zo)
    zi = wi_std
    ti = _safe_norm(jnp.cross(wi_std - wo_std, zi), jnp.asarray([0., 1., 0.]))
    yi = _safe_norm(jnp.cross(ti, zi), jnp.asarray([0.0, 1.0, 0.0]))
    xi = jnp.cross(yi, zi)

    # undo the phi_std rotation on the basis vectors, then rotate the
    # matrix into the implicit bases of -wo_hat / wi_hat
    xo_hat = _rot_z(xo, phi_std)
    xi_hat = _rot_z(xi, phi_std)
    M = mu.rotate_mueller_basis(
        M, (-wo_hat)[:, None], xo_hat[:, None],
        mu.stokes_basis(-wo_hat)[:, None],
        wi_hat[:, None], xi_hat[:, None],
        mu.stokes_basis(wi_hat)[:, None])
    out = M * cto[:, None, None, None]
    return jnp.where(act[:, None, None, None], out, 0.0)
