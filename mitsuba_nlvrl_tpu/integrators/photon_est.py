"""Photon-map radiance estimates over the hash grid.

TPU-native analogs of the reference PhotonMap estimators
(src/integrators/photonmapper/photonmap.h):
  estimate_surface  — estimateRadiance (:131-173): sum of
      power * f_r(cam, photon) over photons within r, * scale/(pi r^2)
  estimate_caustic  — estimateCausticRadiance (:175-211): cone weight
      wp = 1 - d/r, * 3 scale/(pi r^2)
  estimate_volume   — estimateRadianceVolume (:217-271): phase-weighted,
      Epanechnikov-squared kernel 3/pi (1 - d^2/r^2)^2 / r^2

Round-4 performance structure (the VRL-query recipe, see
scripts/profile_nlvrl.py ablations):
  * every estimator fetches a whole photon record in ONE fat-row gather
    (maps.sp_packed / vp_packed) instead of 4-5 per-field gathers — TPU
    gathers are priced per ROW (ops/gather.py);
  * cell lookups are one (N, 2)-row gather from the hash grid's bucket
    range table (ops/hashgrid.py) instead of binary searches;
  * when every gather surface in the scene is diffuse (meta.bsdf_types),
    f_r(wi, wo)/|cos wo| is a per-QUERY constant per hemisphere, so the
    27 x (N, K) per-photon BSDF evaluations collapse to two per-query
    evaluations at wo = (0,0,+-1) — bitwise-exact for diffuse (incl.
    twosided/textured); scenes with rough gather surfaces keep the
    per-photon path. Isotropic-phase scenes likewise skip the per-photon
    phase evaluation in the volume/beam estimators (1/4pi constant).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m
from .. import bsdf as bsdf_mod
from .. import phase as phase_mod
from ..ops import hashgrid
from ..scene.types import BSDF_TYPES, PHASE_TYPES

# codes that can terminate a camera path at a SMOOTH (gathering) surface
# with a non-diffuse lobe; anything else present means f/|cos| varies per
# photon and the per-photon BSDF evaluation is required
_NON_DIFFUSE_SMOOTH = tuple(
    code for name, code in BSDF_TYPES.items()
    if name not in ('diffuse', 'conductor', 'dielectric',
                    'thindielectric', 'null'))


def _gather_diffuse_only(meta) -> bool:
    return not any(t in _NON_DIFFUSE_SMOOTH for t in meta.bsdf_types)


def _phase_isotropic_only(meta) -> bool:
    return all(t == PHASE_TYPES['isotropic'] for t in meta.phase_types)


def estimate_surface(scene, meta, maps, si, active, radius, caustic: bool,
                     max_per_cell: int = 32):
    """Density estimate at surface interaction si (camera side)."""
    grid = maps.caustic_grid if caustic else maps.global_grid
    r2 = radius * radius
    inv_r2 = 1.0 / r2

    fr = si.sh_frame
    fast = _gather_diffuse_only(meta)
    if fast:
        # f(wi, wo)/|cos wo| depends only on the hemisphere of wo for
        # diffuse lobes: evaluate once per query at wo = (0,0,+-1)
        # (|cos| folded by eval = 1). Exact, incl. twosided + textures.
        N = si.p.shape[0]
        up = jnp.concatenate([jnp.zeros((N, 2)), jnp.ones((N, 1))], -1)
        f_up = bsdf_mod.eval(scene, meta, si, up)
        f_dn = bsdf_mod.eval(scene, meta, si, -up)

    def fold(acc, idx, ok):
        # idx, ok: (N, K); ONE (N, K, 12)-row gather for the whole record
        rows = maps.sp_packed[idx]
        ppos = rows[..., 0:3]
        d2 = m.squared_norm(ppos - si.p[:, None, :])
        sel = ok & (d2 <= r2) & (rows[..., 10] > 0.5) \
            & ((rows[..., 9] > 0.5) == caustic)
        v = -rows[..., 3:6]                          # toward photon source
        power = rows[..., 6:9]
        cos_o = m.dot(v, fr.n[:, None, :])           # (N, K)
        if fast:
            f = jnp.where((cos_o > 0)[..., None], f_up[:, None, :],
                          f_dn[:, None, :])
        else:
            N, K = idx.shape
            wo_local = jnp.stack(
                [m.dot(v, fr.s[:, None, :]), m.dot(v, fr.t[:, None, :]),
                 cos_o], axis=-1)                    # (N, K, 3)
            # repeat EVERY field the BSDF layer can touch (textured lobes
            # read uv/p/prim_index/shape_idx/valid for bitmap/3d lookups)
            rep = lambda a: jnp.repeat(a, K, axis=0)
            si_flat = si._replace(
                wi=rep(si.wi), bsdf_idx=rep(si.bsdf_idx), uv=rep(si.uv),
                p=rep(si.p), prim_index=rep(si.prim_index),
                shape_idx=rep(si.shape_idx), valid=rep(si.valid))
            f = bsdf_mod.eval(scene, meta, si_flat,
                              wo_local.reshape(N * K, 3)).reshape(N, K, 3)
            # Density estimation wants f_r alone: the photon arrival
            # density already carries the projected-area cosine, so
            # divide out the cos(theta_o) folded into bsdf.eval. (The
            # reference keeps the folded cosine — photonmap.h:158-163 via
            # mitsuba2 eval — which darkens its estimates by the mean
            # incident cosine; validated against volpath ground truth.)
            f = f / jnp.maximum(jnp.abs(cos_o), 1e-3)[..., None]
        w = jnp.ones_like(d2)
        if caustic:
            w = jnp.maximum(0.0, 1.0 - m.safe_sqrt(d2 * inv_r2))
        contrib = power * f * w[..., None]
        return acc + jnp.where(sel[..., None], contrib, 0.0).sum(axis=1)

    acc = hashgrid.fold_neighbors(grid, si.p, active, fold,
                                  jnp.zeros(si.p.shape[:-1] + (3,)),
                                  max_per_cell)
    k = 3.0 if caustic else 1.0
    return acc * (k * maps.sp_scale * m.InvPi * inv_r2)


def estimate_volume(scene, meta, maps, x, wo, medium_idx, active, radius,
                    max_per_cell: int = 32):
    """Volume photon estimate at gather point x with outgoing dir wo
    (photonmap.h:217-271; scale applied by the caller like the reference
    applies getScaleFactor after the loop)."""
    # radius may be per-lane (jittered, vrl.cpp:527)
    r2 = jnp.broadcast_to(jnp.asarray(radius) ** 2, x.shape[:-1])[:, None]
    iso = _phase_isotropic_only(meta)

    def fold(acc, idx, ok):
        rows = maps.vp_packed[idx]                   # ONE (N, K, 12) gather
        ppos = rows[..., 0:3]
        d2 = m.squared_norm(ppos - x[:, None, :])
        sel = ok & (d2 <= r2) & (rows[..., 10] > 0.5)
        if iso:
            pf = jnp.full(idx.shape, m.InvFourPi)
        else:
            N, K = idx.shape
            pdir = rows[..., 3:6]                    # propagation dir
            # phase(wi = -photon_dir -> wo)
            pf = phase_mod.eval(
                scene, meta,
                jnp.repeat(medium_idx, K, axis=0),
                -pdir.reshape(N * K, 3),
                jnp.repeat(wo, K, axis=0),
                jnp.ones((N * K,), bool)).reshape(N, K)
        kern = m.sqr(1.0 - d2 / r2) / r2 * m.InvPi * 3.0
        contrib = rows[..., 6:9] * (pf * kern)[..., None]
        return acc + jnp.where(sel[..., None], contrib, 0.0).sum(axis=1)

    return hashgrid.fold_neighbors(maps.vp_grid, x, active, fold,
                                   jnp.zeros(x.shape[:-1] + (3,)),
                                   max_per_cell)


def estimate_beam(scene, meta, maps, o, d, t_max, wo, medium_idx, active,
                  radius, n_steps: int, max_per_cell: int = 32):
    """Beam radiance estimate along a ray segment (the reference BRE,
    src/integrators/photonmapper/bre.h:88-195, rebuilt on the hash grid):
    photons within ``radius`` of the LINE contribute
    power * phase * K2(d_perp/r) / r^2 * Tr(t_closest); the ray marches in
    grid-cell steps and each step folds its 27-cell neighborhood, counting
    a photon only when its closest approach lies inside the step interval
    (no double counting). Returns in-scattered radiance (N, 3)
    pre-multiplied by the segment transmittance at each photon."""
    import jax
    from .. import medium as medium_mod

    N = o.shape[0]
    r2 = jnp.broadcast_to(jnp.asarray(radius) ** 2, (N,))
    step = 2.0 * jnp.broadcast_to(jnp.asarray(radius), (N,))
    # per-photon kNN-style radii when build_maps provided them
    # (bre.h:39-73); falls back to the caller's global radius
    per_photon = isinstance(maps.vp_packed, jnp.ndarray) \
        and maps.vp_packed.ndim == 2
    iso = _phase_isotropic_only(meta)

    def step_body(g, carry):
        tau, acc = carry
        t0 = g * step
        t1 = jnp.minimum(t0 + step, t_max)
        ok_step = active & (t0 < t_max)
        x = o + d * (0.5 * (t0 + t1))[:, None]
        # extinction at the step midpoint: the running optical depth
        # integrates it piecewise (midpoint rule at the 2r marching step),
        # which is EXACT for homogeneous/NL media and a consistent
        # estimate for heterogeneous grids (the previous majorant bound
        # over-attenuated dense-grid scenes)
        _, _, st_mid = medium_mod.get_scattering_coefficients(
            scene, meta, medium_idx, x, ok_step)

        def fold(inner, idx, okk):
            rows = maps.vp_packed[idx]               # ONE (N, K, 12) gather
            ppos = rows[..., 0:3]
            rel = ppos - o[:, None, :]
            t_p = jnp.sum(rel * d[:, None, :], -1)    # closest approach
            perp2 = m.squared_norm(rel) - t_p * t_p
            rr2 = m.sqr(rows[..., 9]) if per_photon else r2[:, None]
            sel = okk & (rows[..., 10] > 0.5) & (perp2 <= rr2) \
                & (t_p >= t0[:, None]) & (t_p < t1[:, None]) \
                & (t_p >= 0) & (t_p <= t_max[:, None])
            if iso:
                pf = jnp.full(idx.shape, m.InvFourPi)
            else:
                K = idx.shape[1]
                pdir = rows[..., 3:6]
                pf = phase_mod.eval(
                    scene, meta, jnp.repeat(medium_idx, K, axis=0),
                    -pdir.reshape(-1, 3), jnp.repeat(wo, K, axis=0),
                    jnp.ones((idx.size,), bool)).reshape(idx.shape)
            kern = m.sqr(1.0 - perp2 / rr2) / rr2 * m.InvPi * 3.0
            # Tr to the closest approach: optical depth accumulated over
            # completed steps plus the midpoint-extinction remainder
            # inside this step (bre.h:150-160 samples Tr stochastically;
            # here the 2r march doubles as the quadrature)
            depth = tau[:, None, :] + jnp.maximum(
                t_p - t0[:, None], 0.0)[..., None] * st_mid[:, None, :]
            tr = jnp.exp(-depth)
            contrib = rows[..., 6:9] * (pf * kern)[..., None] * tr
            return inner + jnp.where(sel[..., None], contrib, 0.0).sum(1)

        acc = acc + hashgrid.fold_neighbors(
            maps.vp_grid, x, ok_step, fold, jnp.zeros((N, 3)), max_per_cell)
        dtau = jnp.where(ok_step[:, None], (t1 - t0)[:, None] * st_mid, 0.0)
        return (tau + dtau, acc)

    _, acc = jax.lax.fori_loop(0, n_steps, step_body,
                               (jnp.zeros((N, 3)), jnp.zeros((N, 3))))
    return acc
