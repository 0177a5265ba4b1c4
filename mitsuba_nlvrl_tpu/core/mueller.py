"""Mueller/Stokes polarization calculus.

TPU-native analog of the reference ``include/mitsuba/render/mueller.h``:
every constructor returns a batched ``(..., 4, 4)`` Mueller matrix and every
helper broadcasts over leading wavefront dimensions. Stokes vectors are
``(..., 4)`` with the usual ``[S0, S1, S2, S3]`` layout (radiance,
horizontal/vertical, diagonal, circular).

The framework's RGB render mode — the one the thesis's scenes use — carries
unpolarized radiance, and the polarization BSDF plugins reduce to their
unpolarized attenuator forms (see bsdf.pack_params); this module provides
the full calculus for the `stokes` integrator and for polarized-mode work.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import math as m


def _mat(rows, like):
    """Assemble a (..., 4, 4) matrix from 16 broadcastable entries."""
    z = jnp.zeros_like(like)
    ent = [jnp.broadcast_to(e if isinstance(e, jnp.ndarray) else z + e,
                            like.shape) for e in rows]
    return jnp.stack([jnp.stack(ent[i * 4:(i + 1) * 4], -1)
                      for i in range(4)], -2)


def depolarizer(value=1.0):
    """Ideal depolarizer (mueller.h:35): only S0 survives."""
    v = jnp.asarray(value, jnp.float32)
    out = jnp.zeros(v.shape + (4, 4), jnp.float32)
    return out.at[..., 0, 0].set(v)


def absorber(value):
    """Neutral absorber (mueller.h:47): scales the whole matrix."""
    v = jnp.asarray(value, jnp.float32)
    return v[..., None, None] * jnp.eye(4, dtype=jnp.float32)


def linear_polarizer(value=1.0):
    """Linear polarizer with horizontal transmitting axis (mueller.h:61)."""
    v = jnp.asarray(value, jnp.float32)
    a = 0.5 * v
    return _mat([a, a, 0, 0,
                 a, a, 0, 0,
                 0, 0, 0, 0,
                 0, 0, 0, 0], a)


def linear_retarder(phase):
    """Linear retarder, fast axis horizontal (mueller.h:86; Goldstein
    eq. 6.43)."""
    p = jnp.asarray(phase, jnp.float32)
    s, c = jnp.sin(p), jnp.cos(p)
    one = jnp.ones_like(p)
    return _mat([one, 0, 0, 0,
                 0, one, 0, 0,
                 0, 0, c, s,
                 0, 0, -s, c], p)


def diattenuator(x, y):
    """Attenuates the 0/90-degree field components by x/y (mueller.h:102)."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    a = 0.5 * (x + y)
    b = 0.5 * (x - y)
    c = m.safe_sqrt(x * y)
    return _mat([a, b, 0, 0,
                 b, a, 0, 0,
                 0, 0, c, 0,
                 0, 0, 0, c], a)


def rotator(theta):
    """Reference-frame rotator by theta radians CCW (mueller.h:127;
    Collett ch. 5 eq. 43)."""
    t = jnp.asarray(theta, jnp.float32)
    s, c = jnp.sin(2.0 * t), jnp.cos(2.0 * t)
    one = jnp.ones_like(t)
    return _mat([one, 0, 0, 0,
                 0, c, s, 0,
                 0, -s, c, 0,
                 0, 0, 0, one], t)


def rotated_element(theta, M):
    """Optical element M rotated by theta: R(theta)^T M R(theta)
    (mueller.h:141)."""
    R = rotator(theta)
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt @ M @ R


def fresnel_polarized(cos_theta_i, eta):
    """Complex s/p Fresnel amplitudes for a (real-eta) dielectric,
    including the TIR phase shift (reference core/fresnel.h
    fresnel_polarized). Returns (a_s, a_p, cos_theta_t, eta_it, eta_ti)."""
    ci_signed = jnp.asarray(cos_theta_i, jnp.float32)
    eta = jnp.asarray(eta, jnp.float32)
    outside = ci_signed >= 0
    eta_it = jnp.where(outside, eta, 1.0 / eta)
    eta_ti = jnp.where(outside, 1.0 / eta, eta)
    ci = jnp.abs(ci_signed)
    ctt_sqr = 1.0 - eta_ti * eta_ti * (1.0 - ci * ci)
    ctt = jnp.sqrt(ctt_sqr.astype(jnp.complex64))  # imaginary under TIR
    a_s = (ci - eta_it * ctt) / (ci + eta_it * ctt)
    a_p = (eta_it * ci - ctt) / (eta_it * ci + ctt)
    cos_theta_t = -jnp.sign(ci_signed) * jnp.real(ctt)
    return a_s, a_p, cos_theta_t, eta_it, eta_ti


def specular_reflection(cos_theta_i, eta):
    """Mueller matrix of specular reflection off a dielectric
    (mueller.h:160)."""
    a_s, a_p, _, _, _ = fresnel_polarized(cos_theta_i, eta)
    r_s = jnp.abs(a_s) ** 2
    r_p = jnp.abs(a_p) ** 2
    a = 0.5 * (r_s + r_p)
    b = 0.5 * (r_s - r_p)
    c = jnp.sqrt(r_s * r_p)
    # phase delay delta = arg(a_p) - arg(a_s)
    prod = a_p * jnp.conj(a_s)
    mag = jnp.abs(prod)
    cos_d = jnp.where(mag > 0, jnp.real(prod) / jnp.maximum(mag, 1e-20), 0.0)
    sin_d = jnp.where(mag > 0, jnp.imag(prod) / jnp.maximum(mag, 1e-20), 0.0)
    cos_d = jnp.where(c == 0, 0.0, cos_d)
    sin_d = jnp.where(c == 0, 0.0, sin_d)
    return _mat([a, b, 0, 0,
                 b, a, 0, 0,
                 0, 0, c * cos_d, -c * sin_d,
                 0, 0, c * sin_d, c * cos_d], a)


def specular_transmission(cos_theta_i, eta):
    """Mueller matrix of specular transmission through a dielectric
    (mueller.h:200)."""
    a_s, a_p, cos_theta_t, eta_it, eta_ti = fresnel_polarized(cos_theta_i,
                                                              eta)
    ci = jnp.asarray(cos_theta_i, jnp.float32)
    factor = -eta_it * jnp.where(jnp.abs(ci) > 1e-8,
                                 cos_theta_t / jnp.where(jnp.abs(ci) > 1e-8,
                                                         ci, 1.0), 0.0)
    a_s_r = 1.0 + jnp.real(a_s)
    a_p_r = (1.0 + jnp.real(a_p)) * eta_ti
    t_s = a_s_r * a_s_r
    t_p = a_p_r * a_p_r
    a = 0.5 * factor * (t_s + t_p)
    b = 0.5 * factor * (t_s - t_p)
    c = factor * jnp.sqrt(t_s * t_p)
    return _mat([a, b, 0, 0,
                 b, a, 0, 0,
                 0, 0, c, 0,
                 0, 0, 0, c], a)


def specular_reflection_conductor(cos_theta_i, eta, k):
    """Mueller matrix of specular reflection off a conductor with complex
    IOR eta + i*k (mueller.h:160 with Complex eta; elementwise — eta/k may
    carry a trailing RGB axis that cos_theta_i lacks)."""
    ci = jnp.asarray(cos_theta_i, jnp.float32)
    eta = jnp.asarray(eta, jnp.float32)
    k = jnp.asarray(k, jnp.float32)
    if jnp.ndim(eta) > jnp.ndim(ci):
        ci = ci[..., None]
    ci = jnp.abs(ci)
    eta_c = (eta + 1j * k).astype(jnp.complex64)
    st2 = (1.0 - ci * ci).astype(jnp.complex64) / (eta_c * eta_c)
    ct = jnp.sqrt(1.0 - st2)
    a_s = (ci - eta_c * ct) / (ci + eta_c * ct)
    a_p = (eta_c * ci - ct) / (eta_c * ci + ct)
    r_s = jnp.abs(a_s) ** 2
    r_p = jnp.abs(a_p) ** 2
    a = 0.5 * (r_s + r_p)
    b = 0.5 * (r_s - r_p)
    c = jnp.sqrt(jnp.maximum(r_s * r_p, 0.0))
    prod = a_p * jnp.conj(a_s)
    mag = jnp.maximum(jnp.abs(prod), 1e-20)
    cos_d = jnp.real(prod) / mag
    sin_d = jnp.imag(prod) / mag
    return _mat([a, b, 0, 0,
                 b, a, 0, 0,
                 0, 0, c * cos_d, -c * sin_d,
                 0, 0, c * sin_d, c * cos_d], a)


def stokes_basis(forward):
    """Reference horizontal basis vector for a Stokes frame around the
    propagation direction (mueller.h:247)."""
    s, _ = m.coordinate_system(forward)
    return s


def unit_angle(a, b):
    """Numerically stable angle between unit vectors (core/vector.h)."""
    return 2.0 * jnp.arcsin(jnp.clip(0.5 * m.norm(b - a), 0.0, 1.0))


def rotate_stokes_basis(forward, basis_current, basis_target):
    """Rotator aligning one Stokes basis with another (mueller.h:278)."""
    theta = unit_angle(m.normalize(basis_current), m.normalize(basis_target))
    sign = jnp.where(
        m.dot(forward, jnp.cross(basis_current, basis_target)) < 0,
        -1.0, 1.0)
    return rotator(theta * sign)


def rotate_mueller_basis(M, in_forward, in_basis_current, in_basis_target,
                         out_forward, out_basis_current, out_basis_target):
    """Re-express M in new input/output Stokes frames (mueller.h:324)."""
    R_in = rotate_stokes_basis(in_forward, in_basis_current, in_basis_target)
    R_out = rotate_stokes_basis(out_forward, out_basis_current,
                                out_basis_target)
    return R_out @ M @ jnp.swapaxes(R_in, -1, -2)


def rotate_mueller_basis_collinear(M, forward, basis_current, basis_target):
    """Same-frame in/out rotation (mueller.h:363)."""
    R = rotate_stokes_basis(forward, basis_current, basis_target)
    return R @ M @ jnp.swapaxes(R, -1, -2)
