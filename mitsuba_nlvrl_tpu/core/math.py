"""Core math utilities for the TPU-native renderer.

Scalar/vector helpers used throughout the wavefront compute path. Everything
operates on ``jnp`` arrays with a trailing dimension of 3 for vectors, and is
written mask-friendly (no data-dependent Python control flow) so it can live
inside ``jit`` / ``lax.while_loop`` bodies.

Parity notes: mirrors the helper surface of the reference's
``include/mitsuba/core/math.h`` and ``vector.h`` (safe_sqrt, safe_rsqrt,
ulp-style ray epsilons, coordinate_system) without copying its structure.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# --- constants (match reference include/mitsuba/core/math.h semantics) ------
Pi = 3.14159265358979323846
InvPi = 1.0 / Pi
InvTwoPi = 1.0 / (2.0 * Pi)
InvFourPi = 1.0 / (4.0 * Pi)
SqrtPi = 1.7724538509055160273
Epsilon = 1.1920929e-7 / 2  # float32 machine epsilon / 2
RayEpsilon = Epsilon * 1500.0
ShadowEpsilon = RayEpsilon * 10.0
Infinity = jnp.inf
OneMinusEpsilon = jnp.float32(1.0 - 1.1920929e-7)


# The safe_* functions are grad-safe via custom_jvp: their derivatives are
# CLAMPED TO ZERO at the singular points. Without this, reverse-mode under
# XLA computes e.g. d(rsqrt)/dx = -0.5 x^-1.5 -> inf at the clamp, and
# inf * (masked-zero cotangent) = NaN poisons every gradient (order of the
# multiply differs between eager and fused-XLA, so only jit showed it).

@jax.custom_jvp
def safe_sqrt(x):
    """sqrt clamped to zero for negative inputs (grad-safe at 0)."""
    return jnp.sqrt(jnp.maximum(x, 0.0))


@safe_sqrt.defjvp
def _safe_sqrt_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    y = safe_sqrt(x)
    dy = jnp.where(x > 1e-12, 0.5 / jnp.maximum(y, 1e-12), 0.0) * dx
    return y, dy


@jax.custom_jvp
def safe_rsqrt(x):
    return jax.lax.rsqrt(jnp.maximum(x, jnp.finfo(jnp.float32).tiny))


@safe_rsqrt.defjvp
def _safe_rsqrt_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    y = safe_rsqrt(x)
    dy = jnp.where(x > 1e-12, -0.5 * y / jnp.maximum(x, 1e-12), 0.0) * dx
    return y, dy


@jax.custom_jvp
def safe_acos(x):
    return jnp.arccos(jnp.clip(x, -1.0, 1.0))


@safe_acos.defjvp
def _safe_acos_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    y = safe_acos(x)
    s = 1.0 - x * x
    dy = jnp.where(s > 1e-12, -jax.lax.rsqrt(jnp.maximum(s, 1e-12)), 0.0) * dx
    return y, dy


@jax.custom_jvp
def safe_asin(x):
    return jnp.arcsin(jnp.clip(x, -1.0, 1.0))


@safe_asin.defjvp
def _safe_asin_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    y = safe_asin(x)
    s = 1.0 - x * x
    dy = jnp.where(s > 1e-12, jax.lax.rsqrt(jnp.maximum(s, 1e-12)), 0.0) * dx
    return y, dy


def safe_div(a, b, eps=1e-20):
    """a/b with 0 where |b| is (near-)zero."""
    denom_ok = jnp.abs(b) > eps
    return jnp.where(denom_ok, a / jnp.where(denom_ok, b, 1.0), 0.0)


def rcp(x):
    return 1.0 / x


def safe_rcp(x, eps=1e-20):
    return safe_div(jnp.ones_like(x), x, eps)


def sqr(x):
    return x * x


def lerp(a, b, t):
    return a * (1.0 - t) + b * t


def sign(x):
    return jnp.where(x >= 0.0, 1.0, -1.0)


def mulsign(x, s):
    return jnp.where(s >= 0.0, x, -x)


# --- vector ops (trailing axis = xyz) ---------------------------------------

def dot(a, b, keepdims: bool = False):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def abs_dot(a, b, keepdims: bool = False):
    return jnp.abs(dot(a, b, keepdims))


def cross(a, b):
    return jnp.cross(a, b)


def norm(v, keepdims: bool = False):
    return safe_sqrt(dot(v, v, keepdims))


def squared_norm(v, keepdims: bool = False):
    return dot(v, v, keepdims)


def normalize(v):
    return v * safe_rsqrt(squared_norm(v, keepdims=True))


def normalize_with_norm(v):
    n = norm(v, keepdims=True)
    return v * safe_rcp(n), n[..., 0]


def reflect(w, n):
    """Reflect direction ``w`` (pointing away from surface) about normal."""
    return 2.0 * dot(w, n, keepdims=True) * n - w


def refract_snell(wi, n, eta_rel):
    """Snell refraction of incident dir ``wi`` (pointing INTO the surface,
    i.e. propagation direction) at a boundary with relative IOR
    ``eta_rel = n1/n2``; returns (wo, tir_mask).

    Mirrors the geometry of the reference nonlinear medium's ``refract``
    (src/media/nonlinear.cpp:234-242): wi is the propagation direction and
    n faces against it.
    """
    eta = eta_rel[..., None] if jnp.ndim(eta_rel) == jnp.ndim(wi) - 1 else eta_rel
    cos_i = jnp.clip(dot(n, wi, keepdims=True), -1.0, 1.0)
    k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
    tir = k[..., 0] < 0.0
    wo = eta * wi - (eta * cos_i + safe_sqrt(k)) * n
    return normalize(wo), tir


def coordinate_system(n):
    """Build an orthonormal basis (s, t) around unit normal n.

    Duff et al. branchless construction (same as the reference's
    include/mitsuba/core/vector.h coordinate_system).
    """
    s = jnp.where(n[..., 2:3] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2:3])
    b = n[..., 0:1] * n[..., 1:2] * a
    t0 = jnp.concatenate(
        [mulsign(sqr(n[..., 0:1]) * a, s) + 1.0, mulsign(b, s), mulsign(-n[..., 0:1], s)],
        axis=-1)
    t1 = jnp.concatenate(
        [b, sqr(n[..., 1:2]) * a + s, -n[..., 1:2]],
        axis=-1)
    return t0, t1


def spherical_direction(theta, phi):
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    return jnp.stack([st * cp, st * sp, ct], axis=-1)


def morton_interleave2(x, y, bits: int = 16):
    """Interleave bits of two uint arrays -> morton code (for tile ordering)."""
    def part1by1(v):
        v = v & ((1 << bits) - 1)
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v
    return part1by1(x) | (part1by1(y) << 1)


def linear_to_srgb(x):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x <= 0.0031308, 12.92 * x, 1.055 * jnp.power(x, 1.0 / 2.4) - 0.055)


def srgb_to_linear(x):
    return jnp.where(x <= 0.04045, x / 12.92, jnp.power((x + 0.055) / 1.055, 2.4))
