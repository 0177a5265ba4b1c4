"""Wavefront volumetric path tracer with null-collision (delta) tracking.

TPU-native redesign of the reference ``volpath`` plugin
(src/integrators/volpath.cpp): spectral-MIS delta tracking with a per-path
hero channel (volpath.cpp:62-66), real/null event split (:123-133), NEE
through media with ratio-tracking transmittance + null-BSDF pass-through
(sample_emitter, :263-368), and the BSDF-arm MIS via a transmittance walk
to the first non-null hit (evaluate_direct_light).

Performance structure (beyond the reference's wavefront):
  * transmittance walks are two-level: an outer loop over *surface*
    segments (few) and an inner, intersection-free collision loop for
    heterogeneous media; optically-homogeneous media use the closed-form
    Beer-Lambert factor with NO loop at all (the ratio-tracking estimator
    telescopes exactly).
  * the main bounce loop caches the SurfaceInteraction across null
    collisions (the reference's needs_intersection bookkeeping,
    volpath.cpp:107-115) and skips the whole scene intersection via
    ``lax.cond`` when no lane needs one.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core.ray import Ray, spawn_ray
from ..core.rng import Sampler
from .. import bsdf as bsdf_mod
from .. import emitter as emitter_mod
from .. import medium as medium_mod
from .. import phase as phase_mod
from ..ops import intersect as isect
from ..scene.types import F_NULL, F_DELTA, F_SMOOTH, MEDIUM_TYPES
from .common import mis_weight

MAX_WAVEFRONT_ITERS = 192
SURFACE_WALK_ITERS = 16       # null-boundary crossings per shadow/MIS walk
HET_COLLISION_ITERS = 1024    # majorant collisions per medium segment


def _run_walk(cond, body, st, bound: int, diff: bool):
    """while_loop normally; under differentiation a bounded checkpointed
    scan (reverse-mode cannot differentiate while_loop). The walk bodies
    are fully masked, so extra iterations are identity."""
    if not diff:
        return jax.lax.while_loop(cond, body, st)
    ck = jax.checkpoint(lambda s, _: (body(s), None))
    st, _ = jax.lax.scan(ck, st, None, length=bound)
    return st


def _index_spec(spec, channel):
    from ..ops.gather import select_channel
    return select_channel(spec, channel)


def _has_hetero(meta):
    return MEDIUM_TYPES['heterogeneous'] in meta.medium_types


def _masked_intersect(scene, ray, si_cached, needs):
    """Intersect only if some lane needs it; merge with the cache."""
    def do(args):
        ray, si_cached, needs = args
        si_new = isect.ray_intersect(scene, ray)
        return jax.tree_util.tree_map(
            lambda new, old: jnp.where(
                needs.reshape(needs.shape + (1,) * (new.ndim - 1)), new, old),
            si_new, si_cached)

    def skip(args):
        return args[1]

    return jax.lax.cond(jnp.any(needs), do, skip, (ray, si_cached, needs))


def _medium_segment_tr(scene, meta, sampler, o, d, seg_len, medium_idx,
                       channel, active, diff: bool = False):
    """Spectral transmittance over one medium segment [0, seg_len] along
    (o, d) — telescoped ratio-tracking estimator.

    Homogeneous-like media (sigma_n == 0): exact closed form
    exp(-(maj_vec - maj_ch) * L) ... == exp(-maj*L)/exp(-maj_ch*L) per the
    hero-channel estimator; gray media give exactly Beer-Lambert ratios.
    Heterogeneous media run an intersection-free collision loop.
    """
    N = o.shape[0]
    majorant = medium_mod.get_majorant(scene, medium_idx)
    mj = jnp.maximum(_index_spec(majorant, channel), 1e-30)
    seg = jnp.maximum(jnp.where(jnp.isfinite(seg_len), seg_len, 0.0), 0.0)

    # homogeneous-like media (sigma_n == 0): transmittance is EXACT
    # Beer-Lambert (the reference's homoEvalTransmittance, medium.h:103-107)
    # — zero variance, no sampling needed.
    tr_homo = jnp.exp(-majorant * seg[:, None])

    if not _has_hetero(meta):
        return jnp.where(active[:, None], tr_homo, 1.0), sampler

    midx = jnp.maximum(medium_idx, 0)
    is_het = (scene.media.type[midx] == MEDIUM_TYPES['heterogeneous']) \
        & active

    # heterogeneous: collision loop (grid lookups only). Per-lane counter
    # RNG keeps the loop free of the shared dimension counter.
    key = jax.random.fold_in(sampler.key, sampler.dim)
    sampler = sampler._replace(dim=sampler.dim + 1)

    # supervoxel ratio tracking: collisions sampled against the LOCAL
    # block majorant (empty blocks crossed in one free DDA step), factor
    # sigma_n_loc / mj_loc per collision — reduces to the classic global
    # walk when no supervoxel grid exists (_dda_init returns inf
    # crossings and _block_majorant the global bound)
    from ..core.ray import Ray as _Ray
    bidx0, t_next0, t_delta = medium_mod._dda_init(
        scene, meta, medium_idx, _Ray(o, d, jnp.zeros((N,)),
                                      jnp.full((N,), jnp.inf)),
        jnp.zeros((N,)))
    sgn_d = jnp.sign(d).astype(jnp.int32)

    def cond(carry):
        act = carry[2]
        it = carry[5]
        return jnp.any(act) & (it < HET_COLLISION_ITERS)

    def body(carry):
        t, tr, act, bidx, t_next_ax, it, k = carry
        k = jax.random.fold_in(k, it)
        u = jax.random.uniform(k, (N,))
        maj_loc, mj_loc = medium_mod._block_majorant(
            scene, meta, medium_idx, bidx, channel)
        mj_pos = mj_loc > 1e-20    # constant-fallback: see medium sampler
        dt = -jnp.log1p(-jnp.clip(u, 0, m.OneMinusEpsilon)) \
            / jnp.where(mj_pos, mj_loc, 1.0)
        dt = jnp.where(mj_pos, dt, jnp.float32(3e38))
        t_exit = jnp.min(t_next_ax, axis=-1)
        t_stop = jnp.minimum(t_exit, seg)
        boundary = act & (t + dt > t_stop)
        col = act & ~boundary
        p = o + d * (t + dt)[:, None]
        _, _, sigma_t_v = medium_mod.get_scattering_coefficients(
            scene, meta, medium_idx, p, col)
        sigma_n_loc = jnp.maximum(maj_loc - sigma_t_v, 0.0)
        tr = jnp.where(col[:, None],
                       tr * sigma_n_loc
                       * m.safe_rcp(mj_loc)[:, None], tr)
        escaped = boundary & (t_stop >= seg)
        crossed = boundary & ~escaped
        step_ax = crossed[:, None] & (t_next_ax <= t_exit[:, None])
        bidx = bidx + jnp.where(step_ax, sgn_d, 0)
        t_next_ax = t_next_ax + jnp.where(step_ax, t_delta, 0.0)
        t_new = jnp.where(col, t + dt, jnp.where(crossed, t_stop, t))
        return (t_new, tr, col | crossed, bidx, t_next_ax, it + 1, k)

    t0 = jnp.zeros((N,))
    tr0 = jnp.ones((N, 3))
    carry = (t0, tr0, is_het, bidx0, t_next0, jnp.int32(0), key)
    _, tr_het, still, _, _, _, _ = _run_walk(
        cond, body, carry, min(HET_COLLISION_ITERS, 192), diff)
    tr_het = jnp.where(still[:, None], 0.0, tr_het)  # hit the cap

    tr = jnp.where(is_het[:, None], tr_het, tr_homo)
    return jnp.where(active[:, None], tr, 1.0), sampler


class WalkState(NamedTuple):
    sampler: Sampler
    o: jnp.ndarray
    transmittance: jnp.ndarray
    total_dist: jnp.ndarray
    medium_idx: jnp.ndarray
    active: jnp.ndarray
    emitted: jnp.ndarray
    emitter_pdf: jnp.ndarray
    it: jnp.ndarray


def transmittance_to_point(scene, meta, sampler, p_ref, d, dist, medium_idx,
                           channel, active, on_medium, diff: bool = False):
    """Transmittance from p_ref along d over dist, through null BSDFs and
    media (reference sample_emitter walk, volpath.cpp:275-368): outer loop
    over surface crossings, media handled per-segment by
    _medium_segment_tr. Returns (transmittance (N,3), sampler)."""
    N = p_ref.shape[0]
    st = WalkState(sampler=sampler, o=p_ref,
                   transmittance=jnp.ones((N, 3)),
                   total_dist=jnp.zeros((N,)),
                   medium_idx=medium_idx, active=active,
                   emitted=jnp.zeros((N, 3)), emitter_pdf=jnp.zeros((N,)),
                   it=jnp.int32(0))
    first_mint = jnp.where(on_medium, 0.0, m.RayEpsilon)

    def cond(st):
        return jnp.any(st.active) & (st.it < SURFACE_WALK_ITERS)

    def body(st):
        remaining = dist * (1.0 - m.ShadowEpsilon) - st.total_dist
        active = st.active & (remaining > 0)
        mint = jnp.where(st.it == 0, first_mint, m.RayEpsilon)
        ray = Ray(st.o, d, mint, remaining)
        si = isect.ray_intersect(scene, ray)
        seg_end = jnp.minimum(jnp.where(si.valid, si.t, jnp.inf), remaining)

        in_med = active & (st.medium_idx >= 0)
        tr_seg, smp = _medium_segment_tr(scene, meta, st.sampler, st.o, d,
                                         seg_end, st.medium_idx, channel,
                                         in_med, diff=diff)
        smp = smp.count_rays(active)              # shadow-walk rays
        transmittance = st.transmittance * tr_seg

        # reached the target without a blocking surface?
        reached = active & ~si.valid
        # surface: pass through null bsdfs only
        hit = active & si.valid
        null_tr = bsdf_mod.eval_null_transmission(scene, meta, si)
        transmittance = jnp.where(hit[:, None], transmittance * null_tr,
                                  transmittance)
        new_medium = jnp.where(hit & si.is_medium_transition(),
                               si.target_medium(d), st.medium_idx)
        total_dist = st.total_dist + jnp.where(hit, si.t, remaining)
        alive = hit & jnp.any(transmittance > 0, axis=-1)
        transmittance = jnp.where(reached[:, None] | hit[:, None]
                                  | ~active[:, None],
                                  transmittance, transmittance)
        return WalkState(
            sampler=smp, o=jnp.where(hit[:, None], si.p, st.o),
            transmittance=transmittance, total_dist=total_dist,
            medium_idx=new_medium, active=alive,
            emitted=st.emitted, emitter_pdf=st.emitter_pdf, it=st.it + 1)

    st = _run_walk(cond, body, st, SURFACE_WALK_ITERS, diff)
    tr_out = jnp.where(st.active[:, None], 0.0, st.transmittance)
    return jnp.where(active[:, None], tr_out, 1.0), st.sampler


def trace_emission(scene, meta, sampler, ray_in: Ray, medium_idx, p_ref,
                   channel, active, diff: bool = False):
    """Follow a sampled ray to the first emissive/non-null surface or the
    environment, accumulating transmittance (the reference
    evaluate_direct_light, volpath.cpp:370-466).
    Returns (emitted, emitter_pdf, sampler)."""
    N = p_ref.shape[0]
    st = WalkState(sampler=sampler, o=ray_in.o,
                   transmittance=jnp.ones((N, 3)),
                   total_dist=jnp.zeros((N,)),
                   medium_idx=medium_idx, active=active,
                   emitted=jnp.zeros((N, 3)), emitter_pdf=jnp.zeros((N,)),
                   it=jnp.int32(0))
    d = ray_in.d

    def cond(st):
        return jnp.any(st.active) & (st.it < SURFACE_WALK_ITERS)

    def body(st):
        active = st.active
        ray = Ray(st.o, d, jnp.full((N,), m.RayEpsilon),
                  jnp.full((N,), jnp.inf))
        si = isect.ray_intersect(scene, ray)
        seg_end = jnp.where(si.valid, si.t, jnp.inf)

        in_med = active & (st.medium_idx >= 0)
        # escaped to env through a medium: unbounded segment -> tr 0 unless
        # vacuum; clamp segment to scene bsphere diameter
        seg_for_tr = jnp.minimum(seg_end, 4.0 * scene.bsphere_r)
        tr_seg, smp = _medium_segment_tr(scene, meta, st.sampler, st.o, d,
                                         seg_for_tr, st.medium_idx, channel,
                                         in_med, diff=diff)
        smp = smp.count_rays(active)              # MIS-walk rays
        transmittance = st.transmittance * tr_seg

        # environment
        escaped = active & ~si.valid
        env = emitter_mod.eval_env(scene, meta, jnp.broadcast_to(d, (N, 3)),
                                   escaped)
        emitted = st.emitted + transmittance * env
        env_pdf = emitter_mod.pdf_env_direction(scene, meta, escaped, d)
        emitter_pdf = jnp.where(escaped, env_pdf, st.emitter_pdf)

        # emissive surface
        hit = active & si.valid
        hit_em = hit & (si.emitter_idx >= 0)
        le = emitter_mod.eval_hit(scene, meta, si, hit_em)
        emitted = emitted + transmittance * le
        em_pdf = emitter_mod.pdf_direction(scene, meta, p_ref, si, hit_em)
        emitter_pdf = jnp.where(hit_em, em_pdf, emitter_pdf)

        # continue only through non-emissive null surfaces
        flags = bsdf_mod.flags_of(scene, si)
        cont = hit & ((flags & F_NULL) > 0) & ~hit_em
        null_tr = bsdf_mod.eval_null_transmission(scene, meta, si)
        transmittance = jnp.where(cont[:, None], transmittance * null_tr,
                                  transmittance)
        new_medium = jnp.where(cont & si.is_medium_transition(),
                               si.target_medium(d), st.medium_idx)
        alive = cont & jnp.any(transmittance > 0, axis=-1)

        return WalkState(
            sampler=smp, o=jnp.where(cont[:, None], si.p, st.o),
            transmittance=transmittance, total_dist=st.total_dist,
            medium_idx=new_medium, active=alive,
            emitted=emitted, emitter_pdf=emitter_pdf, it=st.it + 1)

    st = _run_walk(cond, body, st, SURFACE_WALK_ITERS, diff)
    return st.emitted, st.emitter_pdf, st.sampler


class VolpathState(NamedTuple):
    sampler: Sampler
    ray: Ray
    throughput: jnp.ndarray
    result: jnp.ndarray
    eta: jnp.ndarray
    depth: jnp.ndarray
    active: jnp.ndarray
    medium_idx: jnp.ndarray
    specular_chain: jnp.ndarray
    channel: jnp.ndarray
    si: object                  # cached SurfaceInteraction
    needs_isect: jnp.ndarray
    it: jnp.ndarray


def sample(scene, meta, sampler: Sampler, ray: Ray, active=None,
           diff: bool = False, aux=None):
    N = ray.o.shape[0]
    if active is None:
        active = jnp.ones((N,), bool)
    max_depth = meta.iprop('max_depth', -1)
    if max_depth is None or max_depth < 0:
        max_depth = 64
    rr_depth = meta.iprop('rr_depth', 5)
    # null collisions are resolved inside the medium sampler, so outer
    # iterations scale with real scatters + surface bounces only
    wavefront_cap = MAX_WAVEFRONT_ITERS
    # volpathmis (reference volpathmis.cpp): full MIS between phase
    # sampling and NEE at medium vertices; plain volpath uses NEE only
    # (specular_chain gating) there.
    phase_mis = meta.integrator == 'volpathmis'

    u_ch, sampler = sampler.next_1d()
    channel = jnp.minimum((u_ch * 3).astype(jnp.int32), 2)
    cam_med = jnp.full((N,), meta.camera_medium, jnp.int32)

    from ..core.records import SurfaceInteraction
    st = VolpathState(
        sampler=sampler, ray=ray,
        throughput=jnp.ones((N, 3)), result=jnp.zeros((N, 3)),
        eta=jnp.ones((N,)), depth=jnp.zeros((N,), jnp.int32),
        active=active, medium_idx=cam_med,
        specular_chain=jnp.ones((N,), bool), channel=channel,
        si=SurfaceInteraction.invalid((N,)),
        needs_isect=jnp.ones((N,), bool), it=jnp.int32(0))

    def cond(st):
        return jnp.any(st.active) & (st.it < wavefront_cap)

    def body(st: VolpathState):
        smp = st.sampler
        result = st.result
        throughput = st.throughput

        # --- russian roulette ----------------------------------------------
        active = st.active & jnp.any(throughput != 0.0, axis=-1)
        q = jnp.minimum(jax.lax.stop_gradient(
            jnp.max(throughput, axis=-1) * m.sqr(st.eta)), 0.95)
        perform_rr = st.depth > rr_depth
        u_rr, smp = smp.next_1d()
        active = active & ((u_rr < q) | ~perform_rr)
        throughput = jnp.where(perform_rr[:, None],
                               throughput * m.safe_rcp(q)[:, None],
                               throughput)
        active = active & (st.depth < max_depth)

        active_medium = active & (st.medium_idx >= 0)
        active_surface = active & ~active_medium

        # --- (cached) scene intersection -----------------------------------
        iray = Ray(st.ray.o, st.ray.d, st.ray.mint, jnp.full((N,), jnp.inf))
        si = _masked_intersect(scene, iray, st.si, st.needs_isect & active)
        smp = smp.count_rays(st.needs_isect & active)
        needs_isect = st.needs_isect & ~active

        # --- medium free flight to the next REAL collision ------------------
        # delta tracking with the null-collision walk fused into the medium
        # sampler (medium.sample_real_interaction): null events cost a grid
        # lookup there instead of a full wavefront iteration of this body
        mray = Ray(st.ray.o, st.ray.d, st.ray.mint,
                   jnp.where(si.valid, si.t, jnp.full((N,), jnp.inf)))
        mi, w_med, smp = medium_mod.sample_real_interaction(
            scene, meta, mray, smp, st.channel, st.medium_idx, active_medium,
            diff=diff)
        throughput = jnp.where(active_medium[:, None],
                               throughput * w_med, throughput)

        escaped_medium = active_medium & ~mi.valid
        active_medium = active_medium & mi.valid

        act_real = active_medium
        depth = jnp.where(act_real, st.depth + 1, st.depth)
        active = active & (depth < max_depth)
        act_real = act_real & active

        throughput = jnp.where(
            act_real[:, None],
            throughput * mi.sigma_s
            * _index_spec(mi.combined_extinction, st.channel)[:, None]
            / jnp.maximum(_index_spec(mi.sigma_t, st.channel), 1e-30)[:, None],
            throughput)

        # --- NEE from medium vertex ----------------------------------------
        u_sel, smp = smp.next_1d()
        u2, smp = smp.next_2d()
        ds, em_weight = emitter_mod.sample_direction(
            scene, meta, mi.p, u_sel, u2, act_real)
        tr_nee, smp = transmittance_to_point(
            scene, meta, smp, mi.p, ds.d, ds.dist, st.medium_idx, st.channel,
            act_real & (ds.pdf > 0), jnp.ones((N,), bool), diff=diff)
        phase_val = phase_mod.eval(scene, meta, st.medium_idx, mi.wi, ds.d,
                                   act_real)
        w_med_nee = mis_weight(ds.pdf, jnp.where(ds.delta, 0.0, phase_val)) \
            if phase_mis else jnp.ones((N,))
        result = result + jnp.where(
            (act_real & (ds.pdf > 0))[:, None],
            throughput * (phase_val * w_med_nee)[:, None] * tr_nee
            * em_weight, 0.0)

        # --- phase sampling -------------------------------------------------
        u2p, smp = smp.next_2d()
        wo_med, phase_pdf = phase_mod.sample(scene, meta, st.medium_idx,
                                             mi.wi, u2p, act_real)
        if phase_mis:
            # MIS phase arm: follow the phase-sampled ray to emission
            ph_ray = Ray(mi.p, wo_med, jnp.zeros((N,)),
                         jnp.full((N,), jnp.inf))
            ph_emitted, ph_em_pdf, smp = trace_emission(
                scene, meta, smp, ph_ray, st.medium_idx, mi.p, st.channel,
                act_real & (phase_pdf > 0), diff=diff)
            result = result + jnp.where(
                act_real[:, None],
                mis_weight(phase_pdf, ph_em_pdf)[:, None] * throughput
                * ph_emitted, 0.0)

        # --- surface interactions ------------------------------------------
        active_surface = active_surface | escaped_medium
        hit_em = active_surface & st.specular_chain & (si.emitter_idx >= 0) \
            & si.valid
        le = emitter_mod.eval_hit(scene, meta, si, hit_em)
        result = result + jnp.where(hit_em[:, None], throughput * le, 0.0)
        esc = active_surface & st.specular_chain & ~si.valid
        result = result + jnp.where(
            esc[:, None],
            throughput * emitter_mod.eval_env(scene, meta, st.ray.d, esc),
            0.0)
        active_surface = active_surface & si.valid

        flags = bsdf_mod.flags_of(scene, si)
        is_smooth = (flags & F_SMOOTH) > 0
        # --- surface NEE ----------------------------------------------------
        active_e = active_surface & is_smooth & (depth + 1 < max_depth)
        u_sel2, smp = smp.next_1d()
        u22, smp = smp.next_2d()
        ds_s, em_weight_s = emitter_mod.sample_direction(
            scene, meta, si.p, u_sel2, u22, active_e)
        tr_nee_s, smp = transmittance_to_point(
            scene, meta, smp, si.p, ds_s.d, ds_s.dist, st.medium_idx,
            st.channel, active_e & (ds_s.pdf > 0), jnp.zeros((N,), bool),
            diff=diff)
        wo_l = si.to_local(ds_s.d)
        f_val = bsdf_mod.eval(scene, meta, si, wo_l)
        b_pdf = bsdf_mod.pdf(scene, meta, si, wo_l)
        w_nee = mis_weight(ds_s.pdf, jnp.where(ds_s.delta, 0.0, b_pdf))
        result = result + jnp.where(
            (active_e & (ds_s.pdf > 0))[:, None],
            throughput * f_val * w_nee[:, None] * tr_nee_s * em_weight_s,
            0.0)

        # --- BSDF sampling --------------------------------------------------
        u1b, smp = smp.next_1d()
        u2b, smp = smp.next_2d()
        bs, b_weight = bsdf_mod.sample(scene, meta, si, u1b, u2b)
        throughput = jnp.where(active_surface[:, None],
                               throughput * b_weight, throughput)
        eta = jnp.where(active_surface, st.eta * bs.eta, st.eta)
        wo_world = si.to_world(bs.wo)

        non_null = active_surface & ~bs.null
        depth = jnp.where(non_null, depth + 1, depth)
        specular_chain = st.specular_chain
        specular_chain = specular_chain | (non_null & bs.delta)
        specular_chain = specular_chain & ~(active_surface & ~bs.delta
                                            & ~bs.null)
        specular_chain = jnp.where(act_real, False, specular_chain)

        new_medium = jnp.where(
            active_surface & si.is_medium_transition(),
            si.target_medium(wo_world), st.medium_idx)

        # --- MIS bsdf arm ---------------------------------------------------
        add_emitter = active_surface & ~bs.delta & ~bs.null \
            & (depth < max_depth) & jnp.any(throughput > 0, axis=-1)
        bsdf_ray = spawn_ray(si.p, wo_world)
        emitted, em_pdf2, smp = trace_emission(
            scene, meta, smp, bsdf_ray, new_medium, si.p, st.channel,
            add_emitter, diff=diff)
        result = result + jnp.where(
            add_emitter[:, None],
            mis_weight(bs.pdf, em_pdf2)[:, None] * throughput * emitted,
            0.0)

        # --- next ray + si cache update ------------------------------------
        # (null collisions never reach this point anymore — the medium
        # sampler resolves them — so only real scatters / surface bounces
        # redirect the ray, and both invalidate the cached si)
        o_next = jnp.where(act_real[:, None], mi.p,
                           jnp.where(active_surface[:, None], si.p,
                                     st.ray.o))
        d_next = jnp.where(act_real[:, None], wo_med,
                           jnp.where(active_surface[:, None], wo_world,
                                     st.ray.d))
        mint_next = jnp.where(active_surface, m.RayEpsilon, jnp.zeros((N,)))
        new_ray = Ray(o_next, d_next, mint_next, jnp.full((N,), jnp.inf))

        si_next = si
        needs_next = needs_isect | act_real | active_surface

        alive = (active_medium | active_surface) & active
        alive = alive & jnp.any(throughput != 0.0, axis=-1)
        alive = alive & ((active_surface & (bs.pdf > 0)) | active_medium)

        return VolpathState(
            sampler=smp, ray=new_ray, throughput=throughput, result=result,
            eta=eta, depth=depth, active=alive, medium_idx=new_medium,
            specular_chain=specular_chain, channel=st.channel,
            si=si_next, needs_isect=needs_next, it=st.it + 1)

    if diff:
        ck_body = jax.checkpoint(lambda s, _: (body(s), None))
        iters = min(wavefront_cap, max(8, 3 * max_depth))
        st, _ = jax.lax.scan(ck_body, st, None, length=iters)
    else:
        st = jax.lax.while_loop(cond, body, st)
    return st.result, jnp.ones((N,), bool), st.sampler
