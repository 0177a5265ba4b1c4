"""Sampling warps: [0,1)^2 -> distributions on disks/spheres/hemispheres.

TPU-native analog of the reference ``include/mitsuba/core/warp.h``
(square_to_* family + pdfs). All functions are elementwise over leading
wavefront dims; sample is (..., 2) in [0,1).
"""
from __future__ import annotations

import jax.numpy as jnp

from . import math as m


def square_to_uniform_square(sample):
    return sample


def square_to_uniform_disk(sample):
    r = m.safe_sqrt(sample[..., 0])
    theta = 2.0 * m.Pi * sample[..., 1]
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def square_to_uniform_disk_pdf(p):
    inside = m.squared_norm(p) <= 1.0
    return jnp.where(inside, m.InvPi, 0.0)


def square_to_uniform_disk_concentric(sample):
    """Concentric (Shirley) disk mapping — lower distortion than polar."""
    x = 2.0 * sample[..., 0] - 1.0
    y = 2.0 * sample[..., 1] - 1.0
    is_zero = (x == 0.0) & (y == 0.0)
    quadrant_x = jnp.abs(x) > jnp.abs(y)
    r = jnp.where(quadrant_x, x, y)
    rp = jnp.where(quadrant_x, y, x)
    phi = 0.25 * m.Pi * rp / jnp.where(r == 0.0, 1.0, r)
    phi = jnp.where(quadrant_x, phi, 0.5 * m.Pi - phi)
    phi = jnp.where(is_zero, 0.0, phi)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_uniform_triangle(sample):
    t = m.safe_sqrt(1.0 - sample[..., 0])
    return jnp.stack([1.0 - t, t * sample[..., 1]], axis=-1)


def square_to_uniform_triangle_pdf(p):
    inside = (p[..., 0] >= 0) & (p[..., 1] >= 0) & (p[..., 0] + p[..., 1] <= 1)
    return jnp.where(inside, 2.0, 0.0)


def square_to_uniform_sphere(sample):
    z = 1.0 - 2.0 * sample[..., 0]
    r = m.safe_sqrt(1.0 - z * z)
    phi = 2.0 * m.Pi * sample[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_sphere_pdf(_):
    return m.InvFourPi


def square_to_uniform_hemisphere(sample):
    z = sample[..., 0]
    r = m.safe_sqrt(1.0 - z * z)
    phi = 2.0 * m.Pi * sample[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_hemisphere_pdf(_):
    return m.InvTwoPi


def square_to_cosine_hemisphere(sample):
    p = square_to_uniform_disk_concentric(sample)
    z = m.safe_sqrt(1.0 - m.squared_norm(p))
    return jnp.concatenate([p, z[..., None]], axis=-1)


def square_to_cosine_hemisphere_pdf(v):
    return jnp.maximum(v[..., 2], 0.0) * m.InvPi


def square_to_uniform_cone(sample, cos_cutoff):
    """Uniform direction in a cone around +z with cos(angle) >= cos_cutoff."""
    cos_theta = (1.0 - sample[..., 0]) + sample[..., 0] * cos_cutoff
    sin_theta = m.safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = 2.0 * m.Pi * sample[..., 1]
    return jnp.stack(
        [jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, cos_theta], axis=-1)


def square_to_uniform_cone_pdf(_, cos_cutoff):
    return m.InvTwoPi / (1.0 - cos_cutoff)


def square_to_std_normal(sample):
    r = m.safe_sqrt(-2.0 * jnp.log(jnp.maximum(1.0 - sample[..., 0], 1e-38)))
    phi = 2.0 * m.Pi * sample[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_tent(sample):
    def warp1d(x):
        return jnp.where(x < 0.5,
                         m.safe_sqrt(2.0 * x) - 1.0,
                         1.0 - m.safe_sqrt(2.0 - 2.0 * x))
    return jnp.stack([warp1d(sample[..., 0]), warp1d(sample[..., 1])], axis=-1)


def square_to_tent_pdf(p):
    inside = (jnp.abs(p[..., 0]) <= 1) & (jnp.abs(p[..., 1]) <= 1)
    return jnp.where(inside, (1 - jnp.abs(p[..., 0])) * (1 - jnp.abs(p[..., 1])), 0.0)


def square_to_beckmann(sample, alpha):
    """Sample Beckmann distribution of normals around +z."""
    phi = 2.0 * m.Pi * sample[..., 1]
    log_s = jnp.log(jnp.maximum(1.0 - sample[..., 0], 1e-38))
    tan2 = -alpha * alpha * log_s
    cos_theta = 1.0 / m.safe_sqrt(1.0 + tan2)
    sin_theta = m.safe_sqrt(1.0 - cos_theta * cos_theta)
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1)


def square_to_beckmann_pdf(v, alpha):
    ct = v[..., 2]
    tan2 = (1.0 - ct * ct) / jnp.maximum(ct * ct, 1e-20)
    pdf = jnp.exp(-tan2 / (alpha * alpha)) / (m.Pi * alpha * alpha * ct ** 3)
    return jnp.where(ct > 1e-9, pdf, 0.0)


def square_to_von_mises_fisher(sample, kappa):
    """vMF distribution around +z with concentration kappa."""
    sy = jnp.maximum(sample[..., 1], 1e-7)
    cos_theta = 1.0 + jnp.log(sy + (1.0 - sy) * jnp.exp(-2.0 * kappa)) / kappa
    sin_theta = m.safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = 2.0 * m.Pi * sample[..., 0]
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1)


def square_to_von_mises_fisher_pdf(v, kappa):
    return jnp.exp(kappa * (v[..., 2] - 1.0)) * (kappa * m.InvTwoPi) \
        / (1.0 - jnp.exp(-2.0 * kappa))


def interval_to_linear(v0, v1, sample):
    """Importance-sample a linear function on [0,1] with endpoints v0,v1."""
    return jnp.where(
        jnp.abs(v0 - v1) > 1e-4 * (v0 + v1),
        (v0 - m.safe_sqrt(m.lerp(v0 * v0, v1 * v1, sample)))
        / jnp.where(jnp.abs(v0 - v1) > 0, v0 - v1, 1.0),
        sample)
