"""Microfacet distributions (GGX / Beckmann).

TPU-native analog of the reference include/mitsuba/render/microfacet.h:
isotropic + anisotropic roughness, Smith shadowing, and visible-normal
(VNDF) sampling. Local frame convention: z = shading normal.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import math as m
from . import frame as fr

GGX = 0
BECKMANN = 1


def ggx_d(h, ax, ay):
    """GGX normal distribution function D(h)."""
    x, y, z = h[..., 0], h[..., 1], h[..., 2]
    t = m.sqr(x / ax) + m.sqr(y / ay) + m.sqr(z)
    d = 1.0 / (m.Pi * ax * ay * m.sqr(t))
    return jnp.where(z > 0, d, 0.0)


def beckmann_d(h, ax, ay):
    x, y, z = h[..., 0], h[..., 1], h[..., 2]
    z2 = m.sqr(z)
    e = jnp.exp(-(m.sqr(x / ax) + m.sqr(y / ay)) / jnp.maximum(z2, 1e-12))
    d = e / (m.Pi * ax * ay * m.sqr(z2))
    return jnp.where(z > 1e-6, d, 0.0)


def smith_g1(v, h, ax, ay, dist_type=GGX):
    """Smith masking-shadowing G1 for direction v with half-vector h."""
    xy_alpha2 = m.sqr(ax * v[..., 0]) + m.sqr(ay * v[..., 1])
    tan2 = xy_alpha2 / jnp.maximum(m.sqr(v[..., 2]), 1e-12)
    if dist_type == GGX:
        g = 2.0 / (1.0 + jnp.sqrt(1.0 + tan2))
    else:
        a = 1.0 / jnp.maximum(jnp.sqrt(tan2), 1e-12)
        # Beckmann rational approximation
        g = jnp.where(a >= 1.6, 1.0,
                      (3.535 * a + 2.181 * a * a) / (1.0 + 2.276 * a + 2.577 * a * a))
    # sidedness: v and h must lie in the same hemisphere
    back = m.dot(v, h) * v[..., 2] <= 0.0
    return jnp.where(back, 0.0, g)


def sample_vndf(wi, sample2, ax, ay, dist_type=GGX):
    """Sample the distribution of visible normals (Heitz 2018 for GGX).

    wi: (...,3) local incident dir (z>0 side assumed by caller via abs).
    Returns (h, pdf)."""
    if dist_type == BECKMANN:
        # fall back to classic NDF sampling for Beckmann (matches reference
        # non-visible path microfacet.h when sample_visible=false)
        from . import warp
        alpha = jnp.sqrt(ax * ay)
        h = warp.square_to_beckmann(sample2, alpha)
        pdf = warp.square_to_beckmann_pdf(h, alpha)
        return h, pdf

    # stretch
    v = m.normalize(jnp.stack(
        [ax * wi[..., 0], ay * wi[..., 1], wi[..., 2]], axis=-1))
    # orthonormal basis around v
    lensq = m.sqr(v[..., 0]) + m.sqr(v[..., 1])
    inv = m.safe_rsqrt(jnp.maximum(lensq, 1e-12))
    t1 = jnp.where((lensq > 1e-12)[..., None],
                   jnp.stack([-v[..., 1] * inv, v[..., 0] * inv,
                              jnp.zeros_like(inv)], axis=-1),
                   jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), v.shape))
    t2 = jnp.cross(v, t1)
    # parabolic sample
    r = m.safe_sqrt(sample2[..., 0])
    phi = 2.0 * m.Pi * sample2[..., 1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + v[..., 2])
    p2 = (1.0 - s) * m.safe_sqrt(1.0 - p1 * p1) + s * p2
    p3 = m.safe_sqrt(jnp.maximum(0.0, 1.0 - p1 * p1 - p2 * p2))
    nh = (p1[..., None] * t1 + p2[..., None] * t2 + p3[..., None] * v)
    # unstretch
    h = m.normalize(jnp.stack(
        [ax * nh[..., 0], ay * nh[..., 1], jnp.maximum(nh[..., 2], 1e-9)],
        axis=-1))
    pdf = vndf_pdf(wi, h, ax, ay, dist_type)
    return h, pdf


def vndf_pdf(wi, h, ax, ay, dist_type=GGX):
    """PDF of visible-normal sampling: G1(wi) * D(h) * |wi.h| / |cos_i|."""
    if dist_type == BECKMANN:
        from . import warp
        return warp.square_to_beckmann_pdf(h, jnp.sqrt(ax * ay))
    d = ggx_d(h, ax, ay)
    g1 = smith_g1(wi, h, ax, ay, dist_type)
    return g1 * jnp.abs(m.dot(wi, h)) * d / jnp.maximum(jnp.abs(fr.cos_theta(wi)), 1e-9)
