"""Participating media: homogeneous, heterogeneous (grid), nonlinear.

TPU-native analog of the reference Medium base + plugins
(include/mitsuba/render/medium.h, src/media/*.cpp): free-flight sampling
against a per-medium majorant (Medium::sample_interaction,
src/librender/medium.cpp:39-74), combined-extinction / scattering
coefficient lookups with masked per-medium dispatch, and analytic
transmittance for homogeneous media. All functions take a per-lane
``medium_idx`` (-1 = vacuum) and dispatch over the medium slots present
(SceneMeta.medium_types — media count is tiny so masked evaluation of each
slot beats gather-based polymorphism on the VPU).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core.ray import Ray
from ..core.records import MediumInteraction
from ..scene.types import (MEDIUM_TYPES, M_SIGMA_T, M_ALBEDO, M_SCALE,
                           M_BBOX_MIN, M_BBOX_MAX, M_MAJORANT)

MT_HOMOGENEOUS = MEDIUM_TYPES['homogeneous']
MT_HETEROGENEOUS = MEDIUM_TYPES['heterogeneous']
MT_NONLINEAR = MEDIUM_TYPES['nonlinear']


def _grid_lookup(grid, bbox_lo, bbox_hi, p):
    """Trilinear lookup of a (Dz, Dy, Dx) grid over bbox (reference
    grid3d.cpp:254-293 eval semantics; zero outside)."""
    Dz, Dy, Dx = grid.shape
    rel = (p - bbox_lo) / jnp.maximum(bbox_hi - bbox_lo, 1e-30)
    inside = jnp.all((rel >= 0.0) & (rel <= 1.0), axis=-1)
    # cell-centered samples: coordinate in [0, D-1]
    fx = jnp.clip(rel[..., 0] * Dx - 0.5, 0.0, Dx - 1.0)
    fy = jnp.clip(rel[..., 1] * Dy - 0.5, 0.0, Dy - 1.0)
    fz = jnp.clip(rel[..., 2] * Dz - 0.5, 0.0, Dz - 1.0)
    x0 = jnp.clip(fx.astype(jnp.int32), 0, Dx - 1)
    y0 = jnp.clip(fy.astype(jnp.int32), 0, Dy - 1)
    z0 = jnp.clip(fz.astype(jnp.int32), 0, Dz - 1)
    x1 = jnp.minimum(x0 + 1, Dx - 1)
    y1 = jnp.minimum(y0 + 1, Dy - 1)
    z1 = jnp.minimum(z0 + 1, Dz - 1)
    tx = fx - x0
    ty = fy - y0
    tz = fz - z0
    g = grid

    def at(z, y, x):
        return g[z, y, x]

    c00 = m.lerp(at(z0, y0, x0), at(z0, y0, x1), tx)
    c01 = m.lerp(at(z0, y1, x0), at(z0, y1, x1), tx)
    c10 = m.lerp(at(z1, y0, x0), at(z1, y0, x1), tx)
    c11 = m.lerp(at(z1, y1, x0), at(z1, y1, x1), tx)
    c0 = m.lerp(c00, c01, ty)
    c1 = m.lerp(c10, c11, ty)
    val = m.lerp(c0, c1, tz)
    return jnp.where(inside, val, 0.0)


def medium_bbox(scene, medium_idx):
    from ..ops.gather import take_rows
    midx = jnp.maximum(medium_idx, 0)
    P = take_rows(scene.media.params, midx)
    return (P[:, M_BBOX_MIN:M_BBOX_MIN + 3],
            P[:, M_BBOX_MAX:M_BBOX_MAX + 3])


def intersect_aabb(scene, meta, medium_idx, ray: Ray):
    """Medium-extent clip of the ray (reference Medium::intersect_aabb).
    Homogeneous/nonlinear media are unbounded (their extent comes from the
    enclosing null-boundary shape); heterogeneous clips to its grid bbox."""
    N = ray.o.shape[0]
    mint = jnp.zeros((N,))
    maxt = jnp.full((N,), jnp.inf)
    hit = jnp.ones((N,), bool)
    if MT_HETEROGENEOUS in meta.medium_types:
        from ..ops.gather import take_rows
        midx = jnp.maximum(medium_idx, 0)
        mtype = take_rows(scene.media.type, midx)
        lo, hi = medium_bbox(scene, medium_idx)
        inv_d = 1.0 / ray.d
        t0 = (lo - ray.o) * inv_d
        t1 = (hi - ray.o) * inv_d
        near = jnp.max(jnp.minimum(t0, t1), axis=-1)
        far = jnp.min(jnp.maximum(t0, t1), axis=-1)
        is_het = mtype == MT_HETEROGENEOUS
        hit = jnp.where(is_het, near <= far, hit)
        mint = jnp.where(is_het, near, mint)
        maxt = jnp.where(is_het, far, maxt)
    return hit, mint, maxt


def get_majorant(scene, medium_idx):
    """Combined extinction bound used for free-flight sampling (N, 3)."""
    from ..ops.gather import take_rows
    midx = jnp.maximum(medium_idx, 0)
    return take_rows(scene.media.params, midx)[:, M_MAJORANT:M_MAJORANT + 3]


def get_scattering_coefficients(scene, meta, medium_idx, p, active):
    """(sigma_s, sigma_n, sigma_t) at world point p, per lane.

    Mirrors get_scattering_coefficients of homogeneous.cpp:49 /
    heterogeneous.cpp:70 / nonlinear.cpp:419: sigma_n = majorant - sigma_t.
    """
    from ..ops.gather import take_many
    midx = jnp.maximum(medium_idx, 0)
    P, mtype = take_many([scene.media.params, scene.media.type], midx)
    scale = P[:, M_SCALE:M_SCALE + 1]
    sigma_t = P[:, M_SIGMA_T:M_SIGMA_T + 3] * scale
    albedo = P[:, M_ALBEDO:M_ALBEDO + 3]

    if MT_HETEROGENEOUS in meta.medium_types and \
            scene.media.grid_sigma_t.size > 1:
        lo, hi = medium_bbox(scene, medium_idx)
        dens = _grid_lookup(scene.media.grid_sigma_t, lo, hi, p)
        het_sigma_t = sigma_t * dens[:, None]
        is_het = (mtype == MT_HETEROGENEOUS)[:, None]
        sigma_t = jnp.where(is_het, het_sigma_t, sigma_t)

    sigma_s = sigma_t * albedo
    majorant = get_majorant(scene, medium_idx)
    sigma_n = jnp.maximum(majorant - sigma_t, 0.0)
    z = ~active[:, None]
    return (jnp.where(z, 0.0, sigma_s), jnp.where(z, 0.0, sigma_n),
            jnp.where(z, 0.0, sigma_t))


def sample_interaction(scene, meta, ray: Ray, u, channel, medium_idx,
                       active) -> Tuple[MediumInteraction, jnp.ndarray]:
    """Free-flight distance sampling against the majorant of the hero
    ``channel`` (reference Medium::sample_interaction,
    librender/medium.cpp:39-74). Returns (mi, mint). mi.valid = sampled a
    (real or null) collision before leaving the medium segment."""
    N = ray.o.shape[0]
    aabb_hit, mint, maxt = intersect_aabb(scene, meta, medium_idx, ray)
    act = active & aabb_hit
    mint = jnp.where(act, jnp.maximum(ray.mint, mint), 0.0)
    maxt = jnp.where(act, jnp.minimum(ray.maxt, maxt), jnp.inf)

    majorant = get_majorant(scene, medium_idx)
    # per-lane channel select via one-hot reduce (take_along_axis lowers
    # to a slow dynamic gather on TPU)
    mj = jnp.sum(jnp.where(jnp.arange(3)[None, :] == channel[:, None],
                           majorant, 0.0), axis=1)
    u = jnp.clip(u, 0.0, m.OneMinusEpsilon)
    sampled_t = mint + (-jnp.log1p(-u) / jnp.maximum(mj, 1e-30))
    valid = act & (sampled_t <= maxt) & (mj > 0)
    t = jnp.where(valid, sampled_t, jnp.inf)
    p = ray.at(jnp.where(valid, sampled_t, 0.0))
    sigma_s, sigma_n, sigma_t = get_scattering_coefficients(
        scene, meta, medium_idx, p, valid)
    mi = MediumInteraction(
        valid=valid, t=t, p=p, wi=-ray.d,
        medium_idx=medium_idx, sigma_s=sigma_s, sigma_n=sigma_n,
        sigma_t=sigma_t, combined_extinction=majorant)
    return mi, mint


def eval_tr_and_pdf(mi: MediumInteraction, mint, si_t, active):
    """Transmittance and free-flight pdf of the sampled segment
    (reference eval_tr_and_pdf, librender/medium.cpp:77-90)."""
    t = jnp.minimum(jnp.where(jnp.isfinite(mi.t), mi.t, si_t), si_t) - mint
    t = jnp.maximum(t, 0.0)
    tr = jnp.exp(-t[:, None] * mi.combined_extinction)
    pdf = jnp.where((si_t < mi.t)[:, None], tr,
                    tr * mi.combined_extinction)
    return tr, pdf


def homogeneous_transmittance(scene, medium_idx, length, active):
    """Closed-form homogeneous Tr over a segment (reference
    homoEvalTransmittance, medium.h:103-107 uses the majorant which equals
    sigma_t for homogeneous media)."""
    majorant = get_majorant(scene, medium_idx)
    tr = jnp.exp(-jnp.maximum(length, 0.0)[:, None] * majorant)
    return jnp.where(active[:, None], tr, 1.0)


def is_homogeneous_like(scene, meta, medium_idx):
    """Mask: medium has spatially constant extinction (homogeneous or
    nonlinear — the NL medium is optically homogeneous,
    nonlinear.cpp:41)."""
    from ..ops.gather import take_rows
    midx = jnp.maximum(medium_idx, 0)
    mtype = take_rows(scene.media.type, midx)
    return (mtype == MT_HOMOGENEOUS) | (mtype == MT_NONLINEAR)
