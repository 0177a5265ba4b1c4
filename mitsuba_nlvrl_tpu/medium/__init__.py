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


def sample_real_interaction(scene, meta, ray: Ray, sampler, channel,
                            medium_idx, active, max_steps: int = 4096
                            ) -> Tuple[MediumInteraction, jnp.ndarray, object]:
    """Delta tracking to the next REAL collision, null collisions resolved
    in an internal loop.

    The reference samples ONE majorant event per Medium::sample_interaction
    call (librender/medium.cpp:39-74) and lets the integrator's bounce loop
    iterate the null collisions (volpath.cpp:123-133) — fine for scalar
    CPU, but on the TPU wavefront every outer iteration drags ALL lanes
    through the NEE / phase-sampling / emitter machinery while null lanes
    only need a grid lookup. Here the null walk runs as a cheap inner
    ``while_loop`` (exponential step + trilinear sigma_t lookup per step)
    and the telescoped per-channel weight is returned. The factors are
    IDENTICAL to the outer-loop formulation, so the estimator (and its
    variance) is unchanged:

      collision step:  w *= exp(-dt*maj) / (exp(-dt*maj_ch) * maj_ch)
      null event:      w *= sigma_n * maj_ch / sigma_n_ch   (then continue)
      escape:          w *= exp(-dt*maj) / exp(-dt*maj_ch)

    Returns (mi, weight (N, 3), sampler). ``mi.valid`` = a real collision
    happened before ``ray.maxt``; otherwise the lane escaped the segment
    and ``weight`` holds the ratio-tracked Tr / pdf of escaping. The real-
    collision factor sigma_s*maj_ch/sigma_t_ch is left to the caller
    (it needs mi.sigma_s / mi.sigma_t anyway)."""
    N = ray.o.shape[0]
    aabb_hit, mint, maxt = intersect_aabb(scene, meta, medium_idx, ray)
    act = active & aabb_hit
    mint = jnp.where(act, jnp.maximum(ray.mint, mint), 0.0)
    maxt = jnp.where(act, jnp.minimum(ray.maxt, maxt), 0.0)

    majorant = get_majorant(scene, medium_idx)              # (N, 3)
    mj = jnp.sum(jnp.where(jnp.arange(3)[None, :] == channel[:, None],
                           majorant, 0.0), axis=1)
    walking = act & (mj > 1e-30) & (maxt > mint)

    key = jax.random.fold_in(sampler.key, sampler.dim)
    sampler = sampler._replace(dim=sampler.dim + 1)

    def cond(carry):
        walking = carry[2]
        it = carry[4]
        return jnp.any(walking) & (it < max_steps)

    def body(carry):
        t, w, walking, found, it, k = carry
        k1 = jax.random.fold_in(k, it)
        u = jax.random.uniform(k1, (N, 2))
        dt = -jnp.log1p(-jnp.clip(u[:, 0], 0.0, m.OneMinusEpsilon)) \
            / jnp.maximum(mj, 1e-30)
        t_new = t + dt
        esc = walking & (t_new > maxt)
        col = walking & ~esc
        # telescoped segment factor (vector/scalar exponential ratio)
        seg = jnp.where(esc, maxt - t, dt)
        ratio = jnp.exp(-seg[:, None] * (majorant - mj[:, None]))
        w = jnp.where(walking[:, None],
                      w * ratio / jnp.where(col, mj, 1.0)[:, None], w)
        p = ray.at(jnp.where(col, t_new, 0.0))
        sigma_s, sigma_n, sigma_t = get_scattering_coefficients(
            scene, meta, medium_idx, p, col)
        st_ch = jnp.sum(jnp.where(jnp.arange(3)[None, :] == channel[:, None],
                                  sigma_t, 0.0), axis=1)
        sn_ch = jnp.sum(jnp.where(jnp.arange(3)[None, :] == channel[:, None],
                                  sigma_n, 0.0), axis=1)
        p_real = st_ch / jnp.maximum(mj, 1e-30)
        real = col & (u[:, 1] < p_real)
        null = col & ~real
        w = jnp.where(null[:, None],
                      w * sigma_n * (mj / jnp.maximum(sn_ch, 1e-30))[:, None],
                      w)
        found = found | real
        return (jnp.where(col, t_new, t), w, null, found, it + 1, k)

    t0 = jnp.where(walking, mint, 0.0)
    carry = (t0, jnp.ones((N, 3)), walking, jnp.zeros((N,), bool),
             jnp.int32(0), key)
    t, w, still, found, _, _ = jax.lax.while_loop(cond, body, carry)
    # zero-hero-majorant lanes never walk: they escape the whole segment
    # with the exact Beer-Lambert ratio of the OTHER channels
    never = act & ~walking
    w = jnp.where(never[:, None],
                  jnp.exp(-jnp.maximum(maxt - mint, 0.0)[:, None]
                          * (majorant - mj[:, None])), w)

    p = ray.at(jnp.where(found, t, 0.0))
    sigma_s, sigma_n, sigma_t = get_scattering_coefficients(
        scene, meta, medium_idx, p, found)
    mi = MediumInteraction(
        valid=found, t=jnp.where(found, t, jnp.inf), p=p, wi=-ray.d,
        medium_idx=medium_idx, sigma_s=sigma_s, sigma_n=sigma_n,
        sigma_t=sigma_t, combined_extinction=majorant)
    w = jnp.where(act[:, None], w, 1.0)
    return mi, w, sampler
