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

# Tracking events folded into each majorant-walk while_loop iteration.
# At production wavefront sizes the walk is bound by sequential
# while_loop iteration overhead (~0.9 ms/iteration at 32k lanes on the
# axon v5e, vs ~50 us of actual gather traffic), so folding U masked
# events into one iteration cuts walk wall time ~U-fold (measured:
# see docs/PERF.md round-4 table).
import os as _os
# default 8: flat on the banded path (measured 1/4/8 identical, PERF.md
# r4) and worth ~8% on the regeneration scheduler whose walks run at
# full occupancy (r5 lane sweep)
WALK_UNROLL = max(1, int(_os.environ.get('MNT_WALK_UNROLL', '8')))
# transmittance-walk russian-roulette threshold (see _majorant_walk):
# below this carried-ratio weight, collisions gamble survival at
# p = w/THRESH — unbiased, bounds walk length at ~tau = -ln(THRESH)
RR_TR_THRESH = float(_os.environ.get('MNT_TR_RR', '0.03'))
# MNT_DECOMP=0 disables the block-min control of decomposition tracking
# (the walks then run PLAIN delta/ratio tracking against the block max)
# — ablation switch for the brain-class datum (scripts/bench_decomp.py)
DECOMP_ENABLED = _os.environ.get('MNT_DECOMP', '1') != '0'


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


def _grid_lookup_packed(packed, shape, bbox_lo, bbox_hi, p):
    """Trilinear lookup via the corner-packed grid (scene.grid_sigma_p8):
    ONE row-gather of the 8 corners + a weighted reduce. ~8x cheaper than
    the 8-element-gather form on TPU (scripts/bench_gather.py). Identical
    result to _grid_lookup (both edge-clamp)."""
    Dz, Dy, Dx = shape
    rel = (p - bbox_lo) / jnp.maximum(bbox_hi - bbox_lo, 1e-30)
    inside = jnp.all((rel >= 0.0) & (rel <= 1.0), axis=-1)
    fx = jnp.clip(rel[..., 0] * Dx - 0.5, 0.0, Dx - 1.0)
    fy = jnp.clip(rel[..., 1] * Dy - 0.5, 0.0, Dy - 1.0)
    fz = jnp.clip(rel[..., 2] * Dz - 0.5, 0.0, Dz - 1.0)
    x0 = jnp.clip(fx.astype(jnp.int32), 0, Dx - 1)
    y0 = jnp.clip(fy.astype(jnp.int32), 0, Dy - 1)
    z0 = jnp.clip(fz.astype(jnp.int32), 0, Dz - 1)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]
    tz = (fz - z0)[..., None]
    rows = packed[(z0 * Dy + y0) * Dx + x0]          # (..., 9)
    k = jnp.arange(8)
    wz = jnp.where((k >> 2) & 1, tz, 1.0 - tz)
    wy = jnp.where((k >> 1) & 1, ty, 1.0 - ty)
    wx = jnp.where(k & 1, tx, 1.0 - tx)
    val = jnp.sum(rows[..., :8] * (wz * wy * wx), axis=-1)
    return jnp.where(inside, val, 0.0)


def _sigma_grid_eval(scene, lo, hi, p, diff=False):
    """Density-grid eval: packed fast path unless differentiating (the
    packed copy is derived at build time, so gradients must flow through
    grid_sigma_t itself)."""
    if scene.media.grid_sigma_p8 is not None and not diff:
        return _grid_lookup_packed(scene.media.grid_sigma_p8,
                                   scene.media.grid_sigma_t.shape, lo, hi, p)
    return _grid_lookup(scene.media.grid_sigma_t, lo, hi, p)


def with_sigma_grid(media, grid):
    """Return ``media`` with a new density grid AND its derived arrays
    (supervoxel majorants, corner-packed copy) refreshed. Use this instead
    of ``media._replace(grid_sigma_t=...)`` — the derived copies would go
    stale and the delta trackers would sample against wrong majorants."""
    import numpy as np
    from ..scene.builder import _supervoxel_max, _supervoxel_min, \
        _corner_pack, _PACK_MAX_VOXELS
    g = np.asarray(grid, np.float32)
    sup = _supervoxel_max(g) if g.size > 1 else None
    sup_min = _supervoxel_min(g) if g.size > 1 else None
    return media._replace(
        grid_sigma_t=jnp.asarray(g),
        grid_sup=(jnp.asarray(sup) if sup is not None
                  else jnp.ones((1, 1, 1), jnp.float32)),
        grid_sup_min=(jnp.asarray(sup_min) if sup_min is not None
                      else jnp.zeros((1, 1, 1), jnp.float32)),
        grid_sigma_p8=(jnp.asarray(_corner_pack(g))
                       if 1 < g.size <= _PACK_MAX_VOXELS else None))


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


def _ch(vec, channel):
    """Hero-channel select via one-hot reduce (dynamic gathers are slow on
    TPU)."""
    return jnp.sum(jnp.where(jnp.arange(3)[None, :] == channel[:, None],
                             vec, 0.0), axis=1)


def _sup_static(scene):
    """Static supervoxel facts: (Sv, kv, Dv) float32 (3,) in xyz order."""
    sup = scene.media.grid_sup
    Sz, Sy, Sx = sup.shape
    Dz, Dy, Dx = scene.media.grid_sigma_t.shape
    Sv = jnp.asarray([Sx, Sy, Sz], jnp.float32)
    # blocks tile VOXEL-INDEX space with the builder's block edge k (last
    # block may be short) — the world-space cell width therefore varies
    # per axis as ext * k / D, clamped at the bbox far side
    kv = jnp.asarray([-(-Dx // Sx), -(-Dy // Sy), -(-Dz // Sz)],
                     jnp.float32)
    Dv = jnp.asarray([Dx, Dy, Dz], jnp.float32)
    return Sv, kv, Dv


def _has_supervoxels(scene, meta):
    return (MT_HETEROGENEOUS in meta.medium_types
            and scene.media.grid_sup is not None
            and scene.media.grid_sup.size > 1)


def block_index_of(scene, meta, medium_idx, p):
    """Supervoxel block index (N, 3) xyz of world point p."""
    from ..ops.gather import take_rows
    midx = jnp.maximum(medium_idx, 0)
    P = take_rows(scene.media.params, midx)
    lo = P[:, M_BBOX_MIN:M_BBOX_MIN + 3]
    hi = P[:, M_BBOX_MAX:M_BBOX_MAX + 3]
    Sv, kv, Dv = _sup_static(scene)
    rel = (p - lo) / jnp.maximum(hi - lo, 1e-30)
    return jnp.clip(jnp.floor(rel * Dv / kv), 0.0, Sv - 1.0
                    ).astype(jnp.int32)


def _block_majorant(scene, meta, medium_idx, bidx, channel):
    """(maj_vec (N,3), maj_hero (N,)) of the supervoxel addressed by the
    carried block index ``bidx`` for heterogeneous lanes; the medium's
    global majorant otherwise."""
    majorant = get_majorant(scene, medium_idx)
    if _has_supervoxels(scene, meta):
        from ..ops.gather import take_many
        midx = jnp.maximum(medium_idx, 0)
        P, mtype = take_many([scene.media.params, scene.media.type], midx)
        sup = scene.media.grid_sup
        Sz, Sy, Sx = sup.shape
        bx = jnp.clip(bidx[:, 0], 0, Sx - 1)
        by = jnp.clip(bidx[:, 1], 0, Sy - 1)
        bz = jnp.clip(bidx[:, 2], 0, Sz - 1)
        dmax = sup[bz, by, bx]
        maj_het = P[:, M_SIGMA_T:M_SIGMA_T + 3] \
            * P[:, M_SCALE:M_SCALE + 1] * dmax[:, None]
        is_het = mtype == MT_HETEROGENEOUS
        majorant = jnp.where(is_het[:, None], maj_het, majorant)
    return majorant, _ch(majorant, channel)


def _dda_init(scene, meta, medium_idx, ray: Ray, mint):
    """Incremental 3D-DDA state over the supervoxel grid at the segment
    entry point: (block index (N,3) i32, absolute next-crossing t per axis
    (N,3), per-axis crossing period (N,3)). Non-heterogeneous lanes (or
    scenes without a grid) get infinite crossings — the walk degenerates
    to global-majorant tracking."""
    N = ray.o.shape[0]
    if not _has_supervoxels(scene, meta):
        return (jnp.zeros((N, 3), jnp.int32), jnp.full((N, 3), jnp.inf),
                jnp.full((N, 3), jnp.inf))
    from ..ops.gather import take_rows
    midx = jnp.maximum(medium_idx, 0)
    P = take_rows(scene.media.params, midx)
    lo = P[:, M_BBOX_MIN:M_BBOX_MIN + 3]
    hi = P[:, M_BBOX_MAX:M_BBOX_MAX + 3]
    Sv, kv, Dv = _sup_static(scene)
    ext = jnp.maximum(hi - lo, 1e-30)
    cell = ext * kv / Dv
    p0 = ray.at(mint)
    bidx = block_index_of(scene, meta, medium_idx, p0)
    d = ray.d
    degen = jnp.abs(d) < 1e-12
    safe_d = jnp.where(degen, jnp.where(d >= 0, 1e-12, -1e-12), d)
    face = jnp.where(safe_d > 0, (bidx + 1).astype(jnp.float32),
                     bidx.astype(jnp.float32)) * cell + lo
    t_next = mint[:, None] + (face - p0) / safe_d
    t_next = jnp.where(degen, jnp.inf,
                       jnp.maximum(t_next, mint[:, None]))
    t_delta = jnp.where(degen, jnp.inf, cell / jnp.abs(safe_d))
    return bidx, t_next, t_delta


def get_majorant(scene, medium_idx):
    """Combined extinction bound used for free-flight sampling (N, 3)."""
    from ..ops.gather import take_rows
    midx = jnp.maximum(medium_idx, 0)
    return take_rows(scene.media.params, midx)[:, M_MAJORANT:M_MAJORANT + 3]


def get_scattering_coefficients(scene, meta, medium_idx, p, active,
                                diff: bool = False):
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
        dens = _sigma_grid_eval(scene, lo, hi, p, diff)
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


def _medium_facts(scene, medium_idx):
    """Loop-invariant per-lane medium facts for the majorant walks:
    (sigma_t_unit (N,3) = sigma_t*scale per unit density, albedo (N,3),
    lo (N,3), hi (N,3), is_het (N,))."""
    from ..ops.gather import take_many
    midx = jnp.maximum(medium_idx, 0)
    P, mtype = take_many([scene.media.params, scene.media.type], midx)
    sigma_unit = P[:, M_SIGMA_T:M_SIGMA_T + 3] * P[:, M_SCALE:M_SCALE + 1]
    albedo = P[:, M_ALBEDO:M_ALBEDO + 3]
    lo = P[:, M_BBOX_MIN:M_BBOX_MIN + 3]
    hi = P[:, M_BBOX_MAX:M_BBOX_MAX + 3]
    return sigma_unit, albedo, lo, hi, mtype == MT_HETEROGENEOUS


def _row_eval(scene, meta, medium_idx, lo, hi, p, diff=False):
    """(density, block_majorant_raw) at world point p in ONE row-gather
    (corner-packed grid, slot 8 = dilated supervoxel block max of the
    point's block). Fallback (no packed copy / diff mode): trilinear
    lookup + position-addressed supervoxel gather. Both are 0 outside the
    grid bbox."""
    packed = scene.media.grid_sigma_p8
    if packed is not None and not diff:
        Dz, Dy, Dx = scene.media.grid_sigma_t.shape
        rel = (p - lo) / jnp.maximum(hi - lo, 1e-30)
        inside = jnp.all((rel >= 0.0) & (rel <= 1.0), axis=-1)
        fx = jnp.clip(rel[..., 0] * Dx - 0.5, 0.0, Dx - 1.0)
        fy = jnp.clip(rel[..., 1] * Dy - 0.5, 0.0, Dy - 1.0)
        fz = jnp.clip(rel[..., 2] * Dz - 0.5, 0.0, Dz - 1.0)
        x0 = jnp.clip(fx.astype(jnp.int32), 0, Dx - 1)
        y0 = jnp.clip(fy.astype(jnp.int32), 0, Dy - 1)
        z0 = jnp.clip(fz.astype(jnp.int32), 0, Dz - 1)
        tx = (fx - x0)[..., None]
        ty = (fy - y0)[..., None]
        tz = (fz - z0)[..., None]
        rows = packed[(z0 * Dy + y0) * Dx + x0]          # (N, 10)
        k = jnp.arange(8)
        w = (jnp.where((k >> 2) & 1, tz, 1.0 - tz)
             * jnp.where((k >> 1) & 1, ty, 1.0 - ty)
             * jnp.where(k & 1, tx, 1.0 - tx))
        dens = jnp.sum(rows[..., :8] * w, axis=-1)
        bmaj = rows[..., 8]
        bmin = rows[..., 9]
        return (jnp.where(inside, dens, 0.0),
                jnp.where(inside, bmaj, 0.0),
                jnp.where(inside, bmin, 0.0), True)
    dens = _sigma_grid_eval(scene, lo, hi, p, diff)
    sup = scene.media.grid_sup
    smin = scene.media.grid_sup_min
    if sup is not None and (sup.size > 1 or
                            scene.media.grid_sigma_t.size > 1):
        rel = (p - lo) / jnp.maximum(hi - lo, 1e-30)
        inside = jnp.all((rel >= 0.0) & (rel <= 1.0), axis=-1)
        if sup.size > 1:
            Sz, Sy, Sx = sup.shape
            bidx = block_index_of(scene, meta, medium_idx, p)
            bz = jnp.clip(bidx[:, 2], 0, Sz - 1)
            by = jnp.clip(bidx[:, 1], 0, Sy - 1)
            bx = jnp.clip(bidx[:, 0], 0, Sx - 1)
            bmaj = sup[bz, by, bx]
            bmin = (smin[bz, by, bx]
                    if smin is not None and smin.shape == sup.shape
                    else jnp.zeros(p.shape[:-1]))
        else:
            # degenerate 1-block supervoxel grid (tiny density grids)
            bmaj = jnp.broadcast_to(sup.ravel()[0], p.shape[:-1])
            bmin = (jnp.broadcast_to(smin.ravel()[0], p.shape[:-1])
                    if smin is not None and smin.size == 1
                    else jnp.zeros(p.shape[:-1]))
        return (dens, jnp.where(inside, bmaj, 0.0),
                jnp.where(inside, bmin, 0.0), True)
    # no usable block bound: caller falls back to the global majorant
    z = jnp.zeros(p.shape[:-1])
    return dens, z, z, False


def _majorant_walk(scene, meta, ray: Ray, key, channel, medium_idx,
                   mint, maxt, walking, track: bool,
                   max_steps: int, diff: bool):
    """Shared null-collision walk over [mint, maxt] against supervoxel-
    local majorants (empty-space skipping) with ONE row-gather per
    iteration: the gather point is the collision point (collision
    iterations) or the MIDPOINT of the next DDA interval (crossing
    iterations) — the midpoint addresses the new block exactly, so the
    local majorant needs no separate supervoxel gather and no carried
    block-index/face-roundoff bookkeeping for addressing (the DDA still
    supplies exact interval endpoints).

    track=False (transmittance, volpath.cpp:275-368 ratio tracking):
      every collision is null: w *= sigma_n_loc / mj_loc.
    track=True (DECOMPOSITION-tracked delta tracking to the next REAL
      collision, volpath.cpp:123-151 semantics): per block the extinction
      splits into a constant control c = sigma_unit*block_min plus a
      residual. The next control collision is drawn ANALYTICALLY once per
      block (exponential at rate c_h) and is always real; the loop only
      iterates RESIDUAL events at rate mj_loc - c_h — in dense smooth
      blocks (maj ~ min) that is near zero, so the serialized
      gather-per-event count collapses while the estimator is unchanged:
      marginalized over event type, real collisions keep density
      sigma_t_ch * exp(-mj_loc*dt) and nulls sigma_n_ch * exp(-mj_loc*dt),
      exactly the plain delta-tracking pdfs, so every weight below is the
      plain formula with rate := mj_loc (Novak et al. 2014 eq. 29 /
      Kutz et al. 2017 decomposition tracking):
      real with prob sigma_t_ch/mj_loc; null: w *= sigma_n*mj_loc/sn_ch;
      collision step also w *= exp(-dt*(maj_vec-mj))/mj_loc (hero-channel
      telescoping; the caller applies the real-event sigma_s factor).

    Returns (t, w, found, dens_col, maj_vec_col, still_walking).
    """
    N = ray.o.shape[0]
    sigma_unit, albedo, lo, hi, is_het = _medium_facts(scene, medium_idx)
    majorant = get_majorant(scene, medium_idx)              # (N,3) global
    sgn_d = jnp.sign(ray.d).astype(jnp.int32)
    bidx0, t_next0, t_delta = _dda_init(scene, meta, medium_idx, ray, mint)

    def local_bounds(bmaj_b, bmin_b, bok):
        """(maj_vec, c_vec, D_leap) of the current block.
        c_vec is the block-constant control (Novak et al. 2014, eq. 29):
        transmittance walks sample collisions at the residual rate maj-c
        only and multiply the control's exact exponential via the
        telescoped step factor; delta-tracking walks (track=True) draw
        the control's collision analytically per block — always real
        since c <= sigma_t everywhere in the block — and loop only over
        residual events. D_leap decodes the vacuum-row slot-9 encoding
        (builder._corner_pack): a NEGATIVE block-min means the block's
        slot-8 bound is zero and -bmin is the Chebyshev block distance to
        the nearest occupied block — crossing lanes jump it in one event.
        Non-het lanes and scenes without block bounds fall back to the
        global majorant with c = 0, D = 0."""
        if not bok:
            z = jnp.zeros_like(bmaj_b)
            return majorant, jnp.zeros_like(majorant), z
        mv = jnp.where(is_het[:, None], sigma_unit * bmaj_b[:, None],
                       majorant)
        bmin_pos = jnp.maximum(bmin_b, 0.0) if DECOMP_ENABLED \
            else jnp.zeros_like(bmin_b)
        cv = jnp.where(is_het[:, None],
                       sigma_unit * jnp.minimum(bmin_pos, bmaj_b)[:, None],
                       0.0)
        Dd = jnp.where(is_het, jnp.maximum(-bmin_b, 0.0), 0.0)
        return mv, cv, Dd

    # initial interval [mint, min(exit, maxt)]: probe its midpoint
    t_exit0 = jnp.min(t_next0, axis=-1)
    mid0 = 0.5 * (mint + jnp.minimum(t_exit0, maxt))
    _, bmaj0, bmin0, bok0 = _row_eval(scene, meta, medium_idx, lo, hi,
                                      ray.at(mid0), diff)
    maj_vec0, c_vec0, d_leap0 = local_bounds(bmaj0, bmin0, bok0)

    def cond(carry):
        return jnp.any(carry[2]) & (carry[10] < max_steps)

    def sub_step(carry, u):
        """One tracking event (residual collision, analytic control
        collision, OR block crossing) for every walking lane — fully
        masked, so folding several sub-steps into one while_loop
        iteration (see body) is estimator-identical."""
        (t, w, walking, found, maj_vec, c_vec, d_leap, dens_col,
         t_next_ax, t_ctrl, it, k) = carry
        mj_loc = _ch(maj_vec, channel)
        c_loc = _ch(c_vec, channel)
        # loop-event rate: the residual maj - c in BOTH modes (the
        # control's events are handled analytically — as the telescoped
        # exponential for track=False, as the pending t_ctrl collision
        # for track=True)
        res_rate = jnp.maximum(mj_loc - c_loc, 0.0)
        r_pos = res_rate > 1e-20
        # empty/constant blocks (rate 0) step to the boundary in one free
        # move; the constant (not 1/rate) form keeps reverse-mode NaN-free
        dt = -jnp.log1p(-jnp.clip(u[:, 0], 0.0, m.OneMinusEpsilon)) \
            / jnp.where(r_pos, res_rate, 1.0)
        dt = jnp.where(r_pos, dt, jnp.float32(3e38))
        t_exit = jnp.min(t_next_ax, axis=-1)
        t_stop = jnp.minimum(t_exit, maxt)
        if track:
            # the next happening is the FIRST of (pending control
            # collision, residual candidate, block boundary); both
            # collision kinds land in `col`, with the total hero event
            # rate mj_loc = c + residual driving every weight below
            t_res = t + dt
            ctrl_hit = walking & (t_ctrl <= t_res) & (t_ctrl <= t_stop)
            boundary = walking & ~ctrl_hit & (t_res > t_stop)
            col = walking & ~boundary
            t_new = jnp.where(ctrl_hit, t_ctrl,
                              jnp.where(col, t_res,
                                        jnp.where(boundary, t_stop, t)))
            rate = jnp.where(mj_loc > 1e-20, mj_loc, 0.0)
        else:
            ctrl_hit = jnp.zeros_like(walking)
            boundary = walking & (t + dt > t_stop)
            col = walking & ~boundary
            t_new = jnp.where(col, t + dt,
                              jnp.where(boundary, t_stop, t))
            rate = jnp.where(r_pos, res_rate, 0.0)
        # hero-channel telescoped exponential ratio over the step: the
        # pdf contributes exp(-rate*dt) while the integrand carries
        # exp(-maj_vec*dt) -> factor exp(-dt*(maj_vec - rate)); for the
        # residual control this IS exp(-c*dt) * exp(-dt*(residual_vec -
        # residual_hero)) fused into one exponential
        seg = jnp.maximum(jnp.where(col, t_new - t, t_stop - t), 0.0)
        ratio = jnp.exp(-seg[:, None] * (maj_vec - rate[:, None]))
        if track:
            w = jnp.where(walking[:, None],
                          w * ratio
                          / jnp.where(col, jnp.maximum(rate, 1e-30),
                                      1.0)[:, None], w)
        else:
            w = jnp.where(walking[:, None], w * ratio, w)
        # DDA step for boundary crossings
        escaped = boundary & (t_stop >= maxt)
        crossed = boundary & ~escaped
        step_ax = crossed[:, None] & (t_next_ax <= t_exit[:, None])
        t_next_new = t_next_ax + jnp.where(step_ax, t_delta, 0.0)
        if _has_supervoxels(scene, meta):
            # empty-space LEAP: the current block is vacuum with Chebyshev
            # distance d_leap to the nearest occupied block, so every
            # block reachable before min_axis(t_next + (d-1)*t_delta) is
            # vacuum too — jump straight there in this one event (the
            # traversal cost of sparse grids is crossings, not collisions).
            # Per-axis crossing times live on the fixed lattice
            # t_next + k*t_delta, so the post-leap DDA state is pure
            # arithmetic on the carried state (no world-space re-derivation)
            t_shift = jnp.maximum(d_leap - 1.0, 0.0)[:, None] \
                * jnp.where(jnp.isfinite(t_delta), t_delta, 0.0)
            leap = crossed & (d_leap >= 1.0)
            t_safe = jnp.min(t_next_ax + t_shift, axis=-1)
            esc_leap = leap & (t_safe >= maxt)
            escaped = escaped | esc_leap
            crossed = crossed & ~esc_leap
            leap = leap & ~esc_leap
            t_new = jnp.where(leap, jnp.minimum(t_safe, maxt), t_new)
            # advance every axis' lattice strictly past t_safe
            behind = (t_next_ax <= t_safe[:, None]) & jnp.isfinite(t_delta)
            n_a = jnp.floor(jnp.maximum(t_safe[:, None] - t_next_ax, 0.0)
                            / jnp.where(behind, t_delta, 1.0)) + 1.0
            tn_l = jnp.where(behind, t_next_ax + n_a * t_delta, t_next_ax)
            t_next_new = jnp.where(leap[:, None], tn_l, t_next_new)
        # the ONE gather: collision point, or next-interval midpoint
        t_exit_new = jnp.min(t_next_new, axis=-1)
        probe_t = jnp.where(
            col, t_new, 0.5 * (t_new + jnp.minimum(t_exit_new, maxt)))
        dens, bmaj, bmin, bok = _row_eval(scene, meta, medium_idx, lo, hi,
                                          ray.at(jnp.where(walking, probe_t,
                                                           0.0)),
                                          diff)
        # collision: classify against sigma at the collision point
        sigma_t_v = jnp.where(is_het[:, None], sigma_unit * dens[:, None],
                              sigma_unit)
        sigma_n_loc = jnp.maximum(maj_vec - sigma_t_v, 0.0)
        if track:
            st_ch = _ch(sigma_t_v, channel)
            sn_ch = _ch(sigma_n_loc, channel)
            # control collisions are real outright (c <= sigma_t in the
            # block); residual events classify against the RESIDUAL
            # extinction — marginalized over type, P(real | event at x)
            # = sigma_t(x)/mj_loc, identical to plain delta tracking
            p_real = jnp.maximum(st_ch - c_loc, 0.0) \
                / jnp.maximum(res_rate, 1e-30)
            real = ctrl_hit | (col & (u[:, 1] < p_real))
            null = col & ~real
            # safe_div: the VJP of x/max(y,eps) overflows f32 at y=1e-30
            w = jnp.where(null[:, None],
                          w * sigma_n_loc
                          * m.safe_div(rate, sn_ch)[:, None], w)
            found = found | real
            dens_col = jnp.where(real, dens, dens_col)
            walking_next = null | crossed
        else:
            # residual collision factor sigma_n / rate (Novak eq. 29)
            w = jnp.where(col[:, None],
                          w * sigma_n_loc
                          * m.safe_rcp(jnp.maximum(rate, 1e-30))[:, None],
                          w)
            # Russian roulette on the carried ratio weight: a shadow walk
            # through a tau >> 1 core otherwise grinds ~optical-depth
            # events for a transmittance that is already ~0, and the
            # WAVEFRONT pays the max lane (hetvol is sigma x100).
            # Unbiased: survivors rescale by 1/p (the role of the
            # reference's early outs in evalTransmittance-style loops).
            # u[:, 1] is unused by the track=False arm, so RR rides the
            # existing per-event uniforms.
            wmax = jnp.max(w, axis=-1)
            rr = col & (wmax < RR_TR_THRESH)
            p_srv = jnp.clip(wmax * (1.0 / RR_TR_THRESH), 0.0, 1.0)
            die = rr & (u[:, 1] >= p_srv)
            w = jnp.where((rr & ~die)[:, None],
                          w * m.safe_rcp(jnp.maximum(p_srv, 1e-30))[:, None],
                          w)
            w = jnp.where(die[:, None], 0.0, w)
            walking_next = (col & ~die) | crossed
        # crossing lanes adopt the new block's bounds (midpoint probe);
        # collision lanes keep theirs (same block)
        maj_new, c_new, d_new = local_bounds(bmaj, bmin, bok)
        hetc = (crossed & is_het)[:, None]
        maj_vec = jnp.where(hetc, maj_new, maj_vec)
        c_vec = jnp.where(hetc, c_new, c_vec)
        d_leap = jnp.where(crossed & is_het, d_new, d_leap)
        if track:
            # crossed lanes redraw the pending control collision from the
            # landing point's new-block c (null lanes keep theirs —
            # memoryless)
            c_h_new = _ch(c_vec, channel)
            t_ctrl_new = t_new - jnp.log1p(
                -jnp.clip(u[:, 2], 0.0, m.OneMinusEpsilon)) \
                / jnp.maximum(c_h_new, 1e-30)
            t_ctrl_new = jnp.where(c_h_new > 1e-20, t_ctrl_new,
                                   jnp.float32(jnp.inf))
            t_ctrl = jnp.where(crossed, t_ctrl_new, t_ctrl)
        return (t_new, w, walking_next, found, maj_vec, c_vec, d_leap,
                dens_col, t_next_new, t_ctrl, it + 1, k)

    # fold WALK_UNROLL tracking events into each while_loop iteration:
    # at wavefront sizes where the walk is bound by sequential iteration
    # overhead (not VPU/HBM throughput), U masked sub-steps per iteration
    # cut the sequential depth ~U-fold for the same estimator (each
    # sub-step is fully masked; finished lanes ride along as identity)
    n_u = 3 if track else 2

    def body(carry):
        it, k = carry[10], carry[11]
        k1 = jax.random.fold_in(k, it)
        us = jax.random.uniform(k1, (WALK_UNROLL, N, n_u))
        for s in range(WALK_UNROLL):
            carry = sub_step(carry, us[s])
        return carry

    t0 = jnp.where(walking, mint, 0.0)
    if track:
        # pending control collision of the INITIAL block (analytic draw;
        # fold constant is not a multiple of WALK_UNROLL so it can never
        # collide with the per-iteration folds)
        u_c0 = jax.random.uniform(jax.random.fold_in(key, 0x7ffffff1),
                                  (N,))
        c_h0 = _ch(c_vec0, channel)
        t_ctrl0 = t0 - jnp.log1p(
            -jnp.clip(u_c0, 0.0, m.OneMinusEpsilon)) \
            / jnp.maximum(c_h0, 1e-30)
        t_ctrl0 = jnp.where(c_h0 > 1e-20, t_ctrl0, jnp.float32(jnp.inf))
    else:
        t_ctrl0 = jnp.full((N,), jnp.inf)
    carry = (t0, jnp.ones((N, 3)), walking, jnp.zeros((N,), bool),
             maj_vec0, c_vec0, d_leap0, jnp.zeros((N,)), t_next0, t_ctrl0,
             jnp.int32(0), key)
    if diff:
        # reverse-mode cannot differentiate while_loop: bounded
        # checkpointed scan (the body is fully masked, extra trips are
        # identity)
        ck = jax.checkpoint(lambda c, _: (body(c), None))
        carry, _ = jax.lax.scan(
            ck, carry, None,
            length=-(-min(max_steps, 192) // WALK_UNROLL))
    else:
        carry = jax.lax.while_loop(cond, body, carry)
    t, w, still, found, maj_vec_f, _, _, dens_col = carry[:8]
    # carry[10] = executed tracking EVENTS (each of the WALK_UNROLL
    # masked sub-steps folded into a while-loop trip increments it once;
    # cond bounds it by max_steps) — the decomposition-tracking ablation
    # datum (scripts/bench_decomp.py)
    return t, w, found, dens_col, maj_vec_f, still, carry[10]


def segment_tr(scene, meta, sampler, o, d, seg_len, medium_idx, channel,
               active, diff: bool = False):
    """Spectral transmittance over one medium segment [0, seg_len] along
    (o, d): exact Beer-Lambert for optically homogeneous media, supervoxel
    ratio tracking for heterogeneous (reference evalTransmittance loop,
    medium.h:109-155). Returns (tr (N,3), sampler)."""
    N = o.shape[0]
    majorant = get_majorant(scene, medium_idx)
    seg = jnp.maximum(jnp.where(jnp.isfinite(seg_len), seg_len, 0.0), 0.0)
    tr_homo = jnp.exp(-majorant * seg[:, None])
    if MEDIUM_TYPES['heterogeneous'] not in meta.medium_types:
        return jnp.where(active[:, None], tr_homo, 1.0), sampler

    midx = jnp.maximum(medium_idx, 0)
    is_het = (scene.media.type[midx] == MT_HETEROGENEOUS) & active

    key = jax.random.fold_in(sampler.key, sampler.dim)
    sampler = sampler._replace(dim=sampler.dim + 1)
    ray = Ray(o, d, jnp.zeros((N,)), jnp.full((N,), jnp.inf))
    # clip to the grid bbox: density (hence extinction) is zero outside,
    # and the in-walk midpoint probes must land INSIDE the bbox
    hit_bb, near, far = intersect_aabb(scene, meta, medium_idx, ray)
    mint = jnp.clip(near, 0.0, seg)
    maxt = jnp.clip(far, 0.0, seg)
    walking = is_het & hit_bb & (maxt > mint)
    _, tr_het, _, _, _, still, _ = _majorant_walk(
        scene, meta, ray, key, channel, medium_idx,
        mint, maxt, walking, track=False, max_steps=1024,
        diff=diff)
    tr_het = jnp.where(still[:, None], 0.0, tr_het)  # hit the cap
    tr = jnp.where(is_het[:, None], tr_het, tr_homo)
    return jnp.where(active[:, None], tr, 1.0), sampler


def sample_real_interaction(scene, meta, ray: Ray, sampler, channel,
                            medium_idx, active, max_steps: int = 4096,
                            diff: bool = False
                            ) -> Tuple[MediumInteraction, jnp.ndarray, object]:
    """Delta tracking to the next REAL collision, null collisions resolved
    in an internal loop (shared _majorant_walk).

    The reference samples ONE majorant event per Medium::sample_interaction
    call (librender/medium.cpp:39-74) and lets the integrator's bounce loop
    iterate the null collisions (volpath.cpp:123-133) — fine for scalar
    CPU, but on the TPU wavefront every outer iteration drags ALL lanes
    through the NEE / phase-sampling / emitter machinery while null lanes
    only need a grid lookup. The factors are IDENTICAL to the outer-loop
    formulation, so the estimator (and its variance) is unchanged:

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

    majorant = get_majorant(scene, medium_idx)              # (N, 3) global
    mj_glob = _ch(majorant, channel)
    walking = act & (mj_glob > 1e-30) & (maxt > mint)

    key = jax.random.fold_in(sampler.key, sampler.dim)
    sampler = sampler._replace(dim=sampler.dim + 1)

    t, w, found, dens_col, maj_col, still, _ = _majorant_walk(
        scene, meta, ray, key, channel, medium_idx, mint, maxt, walking,
        track=True, max_steps=max_steps, diff=diff)

    # zero-hero-majorant lanes never walk: they escape the whole segment
    # with the exact Beer-Lambert ratio of the OTHER channels
    never = act & ~walking
    # finite clamp: maxt is inf for unbounded segments, and inf * 0
    # (gray media) is a NaN that would poison reverse-mode through the
    # masked branch even though the lane is never selected
    seg_n = jnp.minimum(jnp.maximum(maxt - mint, 0.0), 3e37)
    w = jnp.where(never[:, None],
                  jnp.exp(-seg_n[:, None]
                          * (majorant - mj_glob[:, None])), w)

    # sigma at the real-collision point: from the walk's carried density
    # (one gather already paid inside the loop)
    sigma_unit, albedo, _, _, is_het = _medium_facts(scene, medium_idx)
    sigma_t = jnp.where(is_het[:, None], sigma_unit * dens_col[:, None],
                        sigma_unit)
    z = ~found[:, None]
    sigma_t = jnp.where(z, 0.0, sigma_t)
    p = ray.at(jnp.where(found, t, 0.0))
    mi = MediumInteraction(
        valid=found, t=jnp.where(found, t, jnp.inf), p=p, wi=-ray.d,
        medium_idx=medium_idx, sigma_s=jnp.where(z, 0.0, sigma_t * albedo),
        sigma_n=jnp.where(z, 0.0, jnp.maximum(maj_col - sigma_t, 0.0)),
        sigma_t=sigma_t,
        combined_extinction=jnp.where(found[:, None], maj_col, majorant))
    w = jnp.where(act[:, None], w, 1.0)
    return mi, w, sampler
