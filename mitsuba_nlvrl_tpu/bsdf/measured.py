"""Data-driven measured BSDF (Dupuy & Jakob 2018 adaptive parameterization).

TPU-native rebuild of the reference ``measured`` plugin
(src/bsdfs/measured.cpp) and its tensor container
(src/libcore/tensor.cpp): a retro-reflectively parameterized microfacet
warp where sampling draws a visible normal through two chained Marginal2D
warps (luminance, then VNDF), conditioned on the incident direction
(phi_i, theta_i), and evaluation inverts the VNDF warp to fetch measured
spectra.

The reference requires a spectral variant; here the spectra are evaluated
at the lane's hero wavelengths in spectral mode, and at fixed RGB
representative wavelengths (612/549/465 nm, near the sRGB primaries) in
RGB mode — a documented deviation that keeps the plugin usable in the
default RGB pipeline.

Measured materials live outside the packed (B, 16) parameter table: each
one is a pytree of Marginal2D warps in ``scene.measured`` (a tuple), with
its static facts (isotropic / jacobian / reduction) in
``meta.measured_meta``. The BSDF row's param slot 0 holds the material
index.
"""
from __future__ import annotations

import struct as _struct
from typing import NamedTuple, Tuple

import numpy as np
import jax.numpy as jnp

from ..core import math as m
from ..core import frame as fr
from ..core import distr2d

# reference Struct::Type codes (include/mitsuba/core/struct.h:26-38)
_DTYPES = {1: np.uint8, 2: np.int8, 3: np.uint16, 4: np.int16,
           5: np.uint32, 6: np.int32, 7: np.uint64, 8: np.int64,
           9: np.float16, 10: np.float32, 11: np.float64}
_DTYPE_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}

# RGB-mode representative wavelengths (nm)
RGB_WAVELENGTHS = (612.0, 549.0, 465.0)


def read_tensor_file(path: str) -> dict:
    """Parse the reference tensor container (tensor.cpp:8-54):
    12-byte 'tensor_file' magic, 2-byte version, u32 field count, then per
    field: u16 name length, name, u16 ndim, u8 dtype, u64 offset,
    ndim x u64 shape."""
    with open(path, 'rb') as f:
        raw = f.read()
    if raw[:12] != b'tensor_file\x00':
        raise ValueError(f"{path}: not a tensor file")
    n_fields = _struct.unpack_from('<I', raw, 14)[0]
    pos = 18
    out = {}
    for _ in range(n_fields):
        (nlen,) = _struct.unpack_from('<H', raw, pos); pos += 2
        name = raw[pos:pos + nlen].decode(); pos += nlen
        (ndim,) = _struct.unpack_from('<H', raw, pos); pos += 2
        (dtype,) = _struct.unpack_from('<B', raw, pos); pos += 1
        (offset,) = _struct.unpack_from('<Q', raw, pos); pos += 8
        shape = _struct.unpack_from('<' + 'Q' * ndim, raw, pos)
        pos += 8 * ndim
        dt = np.dtype(_DTYPES[dtype])
        count = int(np.prod(shape)) if shape else 1
        arr = np.frombuffer(raw, dt, count, offset).reshape(shape)
        out[name] = arr
    return out


def write_tensor_file(path: str, fields: dict):
    """Inverse of ``read_tensor_file`` (used to synthesize test materials
    and to convert external data)."""
    header = bytearray()
    body = bytearray()
    header += b'tensor_file\x00'
    header += bytes([1, 0])
    header += _struct.pack('<I', len(fields))
    # compute header size first to place offsets
    hsize = 18
    for name, arr in fields.items():
        hsize += 2 + len(name.encode()) + 2 + 1 + 8 + 8 * np.ndim(arr)
    offset = hsize
    for name, arr in fields.items():
        arr = np.ascontiguousarray(arr)
        nb = name.encode()
        header += _struct.pack('<H', len(nb)) + nb
        header += _struct.pack('<H', arr.ndim)
        header += _struct.pack('<B', _DTYPE_CODES[arr.dtype])
        header += _struct.pack('<Q', offset)
        header += _struct.pack('<' + 'Q' * arr.ndim, *arr.shape)
        body += arr.tobytes()
        offset += arr.nbytes
    with open(path, 'wb') as f:
        f.write(bytes(header) + bytes(body))


class MeasuredData(NamedTuple):
    """Device-side warps of one measured material."""
    ndf: distr2d.Marginal2D        # unnormalized, eval-only
    sigma: distr2d.Marginal2D      # unnormalized, eval-only
    vndf: distr2d.Marginal2D       # dim-2 (phi_i, theta_i)
    luminance: distr2d.Marginal2D  # dim-2
    spectra: distr2d.Marginal2D    # dim-3 (phi_i, theta_i, wavelength)


class MeasuredMeta(NamedTuple):
    """Static facts (hashable, lives in SceneMeta.measured_meta)."""
    isotropic: bool
    jacobian: bool
    reduction: int


def load(path: str) -> Tuple[MeasuredData, MeasuredMeta]:
    """Load a .bsdf tensor file into device warps (measured.cpp:26-157)."""
    return load_fields(read_tensor_file(path))


def load_fields(tf: dict) -> Tuple[MeasuredData, MeasuredMeta]:
    """Build warps from an already-parsed field dict."""
    theta_i = tf['theta_i'].astype(np.float32)
    phi_i = tf['phi_i'].astype(np.float32)
    wavelengths = tf['wavelengths'].astype(np.float32)
    isotropic = phi_i.shape[0] <= 2
    jacobian = bool(tf['jacobian'].reshape(-1)[0])
    reduction = 1
    if not isotropic:
        reduction = int(round((2.0 * np.pi)
                              / (phi_i[-1] - phi_i[0])))
    data = MeasuredData(
        ndf=distr2d.build(tf['ndf'].astype(np.float32), (),
                          normalize=False),
        sigma=distr2d.build(tf['sigma'].astype(np.float32), (),
                            normalize=False),
        vndf=distr2d.build(tf['vndf'].astype(np.float32),
                           (phi_i, theta_i)),
        luminance=distr2d.build(tf['luminance'].astype(np.float32),
                                (phi_i, theta_i)),
        spectra=distr2d.build(tf['spectra'].astype(np.float32),
                              (phi_i, theta_i, wavelengths)))
    return data, MeasuredMeta(isotropic=isotropic, jacobian=jacobian,
                              reduction=reduction)


# --- parameterization helpers (measured.cpp:396-412) -------------------------

def _u2theta(u):
    return m.sqr(u) * (jnp.pi / 2.0)


def _u2phi(u):
    return (2.0 * u - 1.0) * jnp.pi


def _theta2u(theta):
    return m.safe_sqrt(theta * (2.0 / jnp.pi))


def _phi2u(phi):
    return (phi + jnp.pi) * (0.5 / jnp.pi)


def _elevation(d):
    """Numerically stable elevation (measured.cpp:159-168)."""
    dist = jnp.sqrt(m.sqr(d[..., 0]) + m.sqr(d[..., 1])
                    + m.sqr(d[..., 2] - 1.0))
    return 2.0 * m.safe_asin(0.5 * dist)


def _msn(a, b):
    """enoki mulsign_neg: a * -sign(b) with sign(0) = +1."""
    return jnp.where(b >= 0, -a, a)


def _reduce_wi(wi, reduction):
    """Fold symmetric measurement reductions (measured.cpp:186-192)."""
    if reduction < 2:
        return wi, None, None
    sy = wi[..., 1]
    sx = wi[..., 0] if reduction == 4 else sy
    wi = jnp.stack([_msn(wi[..., 0], sx), _msn(wi[..., 1], sy),
                    wi[..., 2]], -1)
    return wi, sx, sy


def _spectra_rgb(data: MeasuredData, sample2d, phi_i, theta_i, lam=None):
    """Fetch measured spectra at the warp position for each output channel
    (hero wavelengths in spectral mode, RGB representatives otherwise)."""
    chans = []
    if lam is None:
        for wl in RGB_WAVELENGTHS:
            wlv = jnp.full(phi_i.shape, wl, jnp.float32)
            chans.append(distr2d.eval(data.spectra, sample2d,
                                      (phi_i, theta_i, wlv)))
    else:
        for j in range(lam.shape[-1]):
            chans.append(distr2d.eval(data.spectra, sample2d,
                                      (phi_i, theta_i, lam[..., j])))
    return jnp.stack(chans, axis=-1)


def sample(data: MeasuredData, mm: MeasuredMeta, wi, u2, lam=None):
    """Importance sample wo (measured.cpp:171-275). Returns (wo, pdf,
    weight (N, C))."""
    act = fr.cos_theta(wi) > 0
    wi_r, sx, sy = _reduce_wi(wi, mm.reduction)
    theta_i = _elevation(wi_r)
    phi_i = jnp.arctan2(wi_r[..., 1], wi_r[..., 0])
    params = (phi_i, theta_i)
    u_wi = jnp.stack([_theta2u(theta_i), _phi2u(phi_i)], -1)

    smp = jnp.stack([u2[..., 1], u2[..., 0]], -1)
    smp, lum_pdf = distr2d.sample(data.luminance, smp, params)
    u_m, ndf_pdf = distr2d.sample(data.vndf, smp, params)

    phi_m = _u2phi(u_m[..., 1])
    theta_m = _u2theta(u_m[..., 0])
    if mm.isotropic:
        phi_m = phi_m + phi_i
    sin_t, cos_t = jnp.sin(theta_m), jnp.cos(theta_m)
    mvec = jnp.stack([jnp.cos(phi_m) * sin_t, jnp.sin(phi_m) * sin_t,
                      cos_t], -1)
    jac = jnp.maximum(2.0 * m.sqr(jnp.pi) * u_m[..., 0] * sin_t, 1e-6) \
        * 4.0 * m.dot(wi_r, mvec)
    wo = 2.0 * m.dot(wi_r, mvec, keepdims=True) * mvec - wi_r
    pdf = ndf_pdf * lum_pdf / jac

    spec = _spectra_rgb(data, smp, phi_i, theta_i, lam)
    if mm.jacobian:
        ndf_v = distr2d.eval(data.ndf, u_m)
        sigma_v = distr2d.eval(data.sigma, u_wi)
        spec = spec * (ndf_v / (4.0 * jnp.maximum(sigma_v, 1e-12)))[..., None]

    if mm.reduction >= 2:
        wo = jnp.stack([_msn(wo[..., 0], sx), _msn(wo[..., 1], sy),
                        wo[..., 2]], -1)
    act = act & (fr.cos_theta(wo) > 0) & (pdf > 0)
    weight = jnp.where(act[..., None],
                       spec * m.safe_rcp(pdf)[..., None], 0.0)
    return wo, jnp.where(act, pdf, 0.0), weight


def _common_eval(data: MeasuredData, mm: MeasuredMeta, wi, wo):
    wi_r, sx, sy = _reduce_wi(wi, mm.reduction)
    if mm.reduction >= 2:
        wo = jnp.stack([_msn(wo[..., 0], sx), _msn(wo[..., 1], sy),
                        wo[..., 2]], -1)
    hv = m.normalize(wi_r + wo)
    theta_i = _elevation(wi_r)
    phi_i = jnp.arctan2(wi_r[..., 1], wi_r[..., 0])
    theta_m = _elevation(hv)
    phi_m = jnp.arctan2(hv[..., 1], hv[..., 0])
    u_phi = _phi2u(phi_m - phi_i if mm.isotropic else phi_m)
    u_m = jnp.stack([_theta2u(theta_m), u_phi - jnp.floor(u_phi)], -1)
    return wi_r, wo, hv, theta_i, phi_i, u_m


def eval(data: MeasuredData, mm: MeasuredMeta, wi, wo, lam=None):
    """f(wi, wo) * cos_theta_o (N, C). The measured spectra already
    include the cosine foreshortening, so this matches the dispatch
    contract directly (measured.cpp:277-332 returns spec as-is under the
    same eval convention)."""
    act = (fr.cos_theta(wi) > 0) & (fr.cos_theta(wo) > 0)
    wi_r, wo_r, hv, theta_i, phi_i, u_m = _common_eval(data, mm, wi, wo)
    params = (phi_i, theta_i)
    smp, _ = distr2d.invert(data.vndf, u_m, params)
    spec = _spectra_rgb(data, smp, phi_i, theta_i, lam)
    if mm.jacobian:
        u_wi = jnp.stack([_theta2u(theta_i), _phi2u(phi_i)], -1)
        ndf_v = distr2d.eval(data.ndf, u_m)
        sigma_v = distr2d.eval(data.sigma, u_wi)
        spec = spec * (ndf_v / (4.0 * jnp.maximum(sigma_v, 1e-12)))[..., None]
    return jnp.where(act[..., None], spec, 0.0)


def pdf(data: MeasuredData, mm: MeasuredMeta, wi, wo):
    """Solid-angle sampling density of ``sample`` (measured.cpp:334-383)."""
    act = (fr.cos_theta(wi) > 0) & (fr.cos_theta(wo) > 0)
    wi_r, wo_r, hv, theta_i, phi_i, u_m = _common_eval(data, mm, wi, wo)
    params = (phi_i, theta_i)
    smp, vndf_pdf = distr2d.invert(data.vndf, u_m, params)
    lum_pdf = distr2d.eval(data.luminance, smp, params)
    sin_m = jnp.sqrt(jnp.maximum(m.sqr(hv[..., 0]) + m.sqr(hv[..., 1]),
                                 0.0))
    jac = jnp.maximum(2.0 * m.sqr(jnp.pi) * u_m[..., 0] * sin_m, 1e-6) \
        * 4.0 * m.dot(wi_r, hv)
    out = vndf_pdf * lum_pdf / jac
    return jnp.where(act & (out > 0), out, 0.0)
