"""Wavefront volumetric path tracer with null-collision (delta) tracking.

TPU-native redesign of the reference ``volpath`` plugin
(src/integrators/volpath.cpp): spectral-MIS delta tracking with a per-path
hero channel (volpath.cpp:62-66), real/null event split (:123-133), NEE
through media with ratio-tracking transmittance + null-BSDF pass-through
(sample_emitter, :263-368).

Performance structure (beyond the reference's wavefront; these are what
make hetvol-class scenes TPU-viable — the sequential collision loops are
the entire wall time, scripts/profile_hetvol.py):
  * ONE transmittance walk per bounce: a lane is at either a medium vertex
    or a surface vertex, so medium-NEE and surface-NEE share the walk.
  * NO evaluate_direct_light walk in the primal path: the reference's
    per-bounce MIS transmittance walk (volpath.cpp:370-466) is replaced by
    carried MIS state (prev_pdf/em_full/p_prev) — the sampled ray is
    followed by the next bounce anyway, whose delta-tracking throughput
    already estimates the same transmittance. Diff mode keeps the explicit
    walk (trace_emission): the carried arm's Tr lives in a detached
    discrete event and has no pathwise derivative.
  * collision loops run in medium.sample_real_interaction /
    medium.segment_tr with ONE corner-packed row-gather per iteration and
    supervoxel empty-space skipping; optically-homogeneous media use the
    closed-form Beer-Lambert factor with NO loop at all.
  * the main bounce loop caches the SurfaceInteraction (the reference's
    needs_intersection bookkeeping, volpath.cpp:107-115) and skips the
    whole scene intersection via ``lax.cond`` when no lane needs one.
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
    (o, d) — delegates to medium.segment_tr (exact Beer-Lambert for
    optically homogeneous media; supervoxel ratio tracking with ONE
    row-gather per collision for heterogeneous)."""
    return medium_mod.segment_tr(scene, meta, sampler, o, d, seg_len,
                                 medium_idx, channel, active, diff=diff)


class WalkState(NamedTuple):
    sampler: Sampler
    o: jnp.ndarray
    transmittance: jnp.ndarray
    total_dist: jnp.ndarray
    medium_idx: jnp.ndarray
    active: jnp.ndarray
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
            medium_idx=new_medium, active=alive, it=st.it + 1)

    st = _run_walk(cond, body, st, SURFACE_WALK_ITERS, diff)
    tr_out = jnp.where(st.active[:, None], 0.0, st.transmittance)
    return jnp.where(active[:, None], tr_out, 1.0), st.sampler


def _nee_single_segment(meta) -> bool:
    """Static gate for the single-segment NEE fast path: exactly one
    medium, heterogeneous (its extent IS its grid bbox — the builder sets
    M_BBOX from the enclosing shape, so clipping against it reproduces
    the shell crossings), every null boundary a PURE null BSDF (unit
    transmission), and the scene below the cluster-sweep crossover (the
    occluder sweep uses the masked dense scan)."""
    from ..ops.intersect import _CLUSTER_MIN_TRIS
    from ..scene.types import BSDF_TYPES
    return (len(meta.medium_types) == 1
            and meta.medium_types[0] == MEDIUM_TYPES['heterogeneous']
            and BSDF_TYPES['mask'] not in meta.bsdf_types
            and meta.n_tris < _CLUSTER_MIN_TRIS)


def transmittance_to_point_single(scene, meta, sampler, p_ref, d, dist,
                                  channel, active, diff: bool = False):
    """Single-segment NEE transmittance (fast path, gated by
    _nee_single_segment): the general walk pays one full scene
    intersection + one tracking-walk STARTUP per null-shell crossing
    (volpath.cpp:275-368 structure). With a single bbox-bounded medium
    and pure-null shells, the same estimate is ONE occluder-masked
    any-hit (null shells skipped inside the sweep) plus ONE ratio-tracked
    segment over the medium-bbox-clipped span — identical expectation,
    ~3x fewer sequential kernels per NEE (docs/PERF.md round 4)."""
    N = p_ref.shape[0]
    seg = jnp.maximum(dist * (1.0 - m.ShadowEpsilon), 0.0)
    ray = Ray(p_ref, d, jnp.full((N,), m.RayEpsilon), seg)
    occ = isect.ray_test_occluders(scene, ray, seg)
    smp = sampler.count_rays(active)
    vis = active & ~occ
    midx0 = jnp.zeros((N,), jnp.int32)
    tr, smp = medium_mod.segment_tr(scene, meta, smp, p_ref, d, seg,
                                    midx0, channel, vis, diff=diff)
    tr = jnp.where(occ[:, None], 0.0, tr)
    return jnp.where(active[:, None], tr, 1.0), smp


def trace_emission(scene, meta, sampler, ray_in: Ray, medium_idx, p_ref,
                   channel, active, diff: bool = False):
    """Follow a sampled ray to the first emissive/non-null surface or the
    environment, accumulating transmittance (the reference
    evaluate_direct_light, volpath.cpp:370-466). Used by the DIFF bounce
    loop only — the primal loop folds this arm into the next bounce via
    carried MIS state (see sample()).
    Returns (emitted, emitter_pdf, sampler)."""
    N = p_ref.shape[0]
    d = ray_in.d
    st = (sampler, ray_in.o, jnp.ones((N, 3)), medium_idx, active,
          jnp.zeros((N, 3)), jnp.zeros((N,)), jnp.int32(0))

    def cond(st):
        return jnp.any(st[4]) & (st[7] < SURFACE_WALK_ITERS)

    def body(st):
        smp, o, transmittance, med, active, emitted, emitter_pdf, it = st
        ray = Ray(o, d, jnp.full((N,), m.RayEpsilon),
                  jnp.full((N,), jnp.inf))
        si = isect.ray_intersect(scene, ray)
        seg_end = jnp.where(si.valid, si.t, jnp.inf)

        in_med = active & (med >= 0)
        seg_for_tr = jnp.minimum(seg_end, 4.0 * scene.bsphere_r)
        tr_seg, smp = _medium_segment_tr(scene, meta, smp, o, d,
                                         seg_for_tr, med, channel,
                                         in_med, diff=diff)
        smp = smp.count_rays(active)
        transmittance = transmittance * tr_seg

        escaped = active & ~si.valid
        env = emitter_mod.eval_env(scene, meta, jnp.broadcast_to(d, (N, 3)),
                                   escaped)
        emitted = emitted + transmittance * env
        env_pdf = emitter_mod.pdf_env_direction(scene, meta, escaped, d)
        emitter_pdf = jnp.where(escaped, env_pdf, emitter_pdf)

        hit = active & si.valid
        hit_em = hit & (si.emitter_idx >= 0)
        le = emitter_mod.eval_hit(scene, meta, si, hit_em)
        emitted = emitted + transmittance * le
        em_pdf = emitter_mod.pdf_direction(scene, meta, p_ref, si, hit_em)
        emitter_pdf = jnp.where(hit_em, em_pdf, emitter_pdf)

        flags = bsdf_mod.flags_of(scene, si)
        cont = hit & ((flags & F_NULL) > 0) & ~hit_em
        null_tr = bsdf_mod.eval_null_transmission(scene, meta, si)
        transmittance = jnp.where(cont[:, None], transmittance * null_tr,
                                  transmittance)
        new_medium = jnp.where(cont & si.is_medium_transition(),
                               si.target_medium(d), med)
        alive = cont & jnp.any(transmittance > 0, axis=-1)
        return (smp, jnp.where(cont[:, None], si.p, o), transmittance,
                new_medium, alive, emitted, emitter_pdf, it + 1)

    st = _run_walk(cond, body, st, SURFACE_WALK_ITERS, diff)
    return st[5], st[6], st[0]


class VolpathState(NamedTuple):
    sampler: Sampler
    ray: Ray
    throughput: jnp.ndarray
    result: jnp.ndarray
    eta: jnp.ndarray
    depth: jnp.ndarray
    active: jnp.ndarray
    medium_idx: jnp.ndarray
    channel: jnp.ndarray
    si: object                  # cached SurfaceInteraction
    needs_isect: jnp.ndarray
    # carried MIS state for emitter hits along the current ray:
    # em_full: hits count with weight 1 (camera ray / specular chain)
    # prev_pdf: solid-angle pdf of the strategy that sampled ray.d
    #           (0 => NEE-only at the previous vertex: hits count 0)
    # p_prev:  the previous scattering vertex (MIS emitter-pdf ref point)
    em_full: jnp.ndarray
    prev_pdf: jnp.ndarray
    p_prev: jnp.ndarray
    it: jnp.ndarray


def _opts(meta, diff: bool):
    """Static estimator options shared by sample() and the regeneration
    scheduler (integrators/regen.py)."""
    max_depth = meta.iprop('max_depth', -1)
    if max_depth is None or max_depth < 0:
        max_depth = 64
    rr_depth = meta.iprop('rr_depth', 5)
    # volpathmis (reference volpathmis.cpp): full MIS between phase
    # sampling and NEE at medium vertices; plain volpath uses NEE only
    # at medium vertices (phase-sampled emitter hits count 0 there).
    phase_mis = meta.integrator == 'volpathmis'
    # single-segment NEE fast path (see transmittance_to_point_single);
    # MNT_NEE_WALK=1 forces the general walk (for ablation)
    import os
    nee_fast = (not diff) and _nee_single_segment(meta) \
        and os.environ.get('MNT_NEE_WALK', '') != '1'
    return max_depth, rr_depth, phase_mis, nee_fast


def make_body(scene, meta, N: int, diff: bool = False):
    """One iteration of the volumetric bounce loop as a standalone
    VolpathState -> VolpathState function — used by sample() below and
    re-used verbatim by the persistent-wavefront regeneration scheduler
    (integrators/regen.py), so the two schedulers run the IDENTICAL
    estimator and differ only in how lanes are filled."""
    max_depth, rr_depth, phase_mis, nee_fast = _opts(meta, diff)

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

        # --- emitter hits along the current ray (carried-MIS arm) -----------
        # the throughput at this point includes the delta-tracking weight of
        # the segment(s) behind us = an unbiased Tr estimate — exactly what
        # the reference's evaluate_direct_light walk estimated separately
        active_surface = active_surface | escaped_medium
        hit_em = active_surface & (si.emitter_idx >= 0) & si.valid
        le = emitter_mod.eval_hit(scene, meta, si, hit_em)
        em_pdf = emitter_mod.pdf_direction(scene, meta, st.p_prev, si,
                                           hit_em & ~st.em_full)
        w_hit = jnp.where(st.em_full, 1.0,
                          mis_weight(st.prev_pdf, em_pdf))
        esc = active_surface & ~si.valid
        env = emitter_mod.eval_env(scene, meta, st.ray.d, esc)
        env_pdf = emitter_mod.pdf_env_direction(scene, meta,
                                                esc & ~st.em_full, st.ray.d)
        w_env = jnp.where(st.em_full, 1.0,
                          mis_weight(st.prev_pdf, env_pdf))
        if diff:
            # diff mode keeps the reference-style estimator (round-2 code):
            # emitter hits count only on specular chains; the MIS bsdf/phase
            # arm is an explicit trace_emission walk below whose
            # transmittance is differentiable (closed form for homogeneous
            # media). The primal carried-MIS arm has no usable pathwise
            # derivative: its Tr lives in the detached delta-tracking
            # escape EVENT (probability), not in any attached weight.
            w_hit = jnp.where(st.em_full, 1.0, 0.0)
            w_env = jnp.where(st.em_full, 1.0, 0.0)
        result = result + jnp.where(
            hit_em[:, None], throughput * le * w_hit[:, None], 0.0)
        result = result + jnp.where(
            esc[:, None], throughput * env * w_env[:, None], 0.0)
        active_surface = active_surface & si.valid

        flags = bsdf_mod.flags_of(scene, si)
        is_smooth = (flags & F_SMOOTH) > 0

        # --- NEE (fused): medium vertices + smooth-surface vertices ---------
        # a lane is at EITHER a medium vertex (act_real) or a surface vertex
        # this iteration, so one transmittance walk serves both
        active_es = active_surface & is_smooth & (depth + 1 < max_depth)
        nee_act = act_real | active_es
        p_ref = jnp.where(act_real[:, None], mi.p, si.p)
        u_sel, smp = smp.next_1d()
        u2, smp = smp.next_2d()
        ds, em_weight = emitter_mod.sample_direction(
            scene, meta, p_ref, u_sel, u2, nee_act)
        if nee_fast:
            tr_nee, smp = transmittance_to_point_single(
                scene, meta, smp, p_ref, ds.d, ds.dist, st.channel,
                nee_act & (ds.pdf > 0), diff=diff)
        else:
            tr_nee, smp = transmittance_to_point(
                scene, meta, smp, p_ref, ds.d, ds.dist, st.medium_idx,
                st.channel, nee_act & (ds.pdf > 0), act_real, diff=diff)
        # medium arm: phase eval (NEE-only -> weight 1 unless volpathmis)
        phase_val = phase_mod.eval(scene, meta, st.medium_idx, mi.wi, ds.d,
                                   act_real)
        w_med_nee = mis_weight(ds.pdf, jnp.where(ds.delta, 0.0, phase_val)) \
            if phase_mis else jnp.ones((N,))
        # surface arm: bsdf eval/pdf MIS
        wo_l = si.to_local(ds.d)
        f_val = bsdf_mod.eval(scene, meta, si, wo_l)
        b_pdf = bsdf_mod.pdf(scene, meta, si, wo_l)
        w_surf_nee = mis_weight(ds.pdf, jnp.where(ds.delta, 0.0, b_pdf))
        contrib = jnp.where(act_real[:, None],
                            (phase_val * w_med_nee)[:, None],
                            f_val * w_surf_nee[:, None])
        result = result + jnp.where(
            (nee_act & (ds.pdf > 0))[:, None],
            throughput * contrib * tr_nee * em_weight, 0.0)

        # --- phase sampling --------------------------------------------------
        u2p, smp = smp.next_2d()
        wo_med, phase_pdf = phase_mod.sample(scene, meta, st.medium_idx,
                                             mi.wi, u2p, act_real)

        # --- BSDF sampling ---------------------------------------------------
        u1b, smp = smp.next_1d()
        u2b, smp = smp.next_2d()
        bs, b_weight = bsdf_mod.sample(scene, meta, si, u1b, u2b)
        throughput = jnp.where(active_surface[:, None],
                               throughput * b_weight, throughput)
        eta = jnp.where(active_surface, st.eta * bs.eta, st.eta)
        wo_world = si.to_world(bs.wo)

        non_null = active_surface & ~bs.null
        depth = jnp.where(non_null, depth + 1, depth)

        new_medium = jnp.where(
            active_surface & si.is_medium_transition(),
            si.target_medium(wo_world), st.medium_idx)

        if diff:
            # diff mode: explicit MIS arms (round-2 / reference estimator,
            # volpath.cpp:245-249). The walks' transmittances carry the
            # attached d/d(sigma) the carried-MIS primal arm cannot.
            if phase_mis:
                ph_ray = Ray(mi.p, wo_med, jnp.zeros((N,)),
                             jnp.full((N,), jnp.inf))
                ph_emitted, ph_em_pdf, smp = trace_emission(
                    scene, meta, smp, ph_ray, st.medium_idx, mi.p,
                    st.channel, act_real & (phase_pdf > 0), diff=True)
                result = result + jnp.where(
                    act_real[:, None],
                    mis_weight(phase_pdf, ph_em_pdf)[:, None] * throughput
                    * ph_emitted, 0.0)
            add_emitter = active_surface & ~bs.delta & ~bs.null \
                & (depth < max_depth) & jnp.any(throughput > 0, axis=-1)
            bsdf_ray = spawn_ray(si.p, wo_world)
            emitted_d, em_pdf2, smp = trace_emission(
                scene, meta, smp, bsdf_ray, new_medium, si.p, st.channel,
                add_emitter, diff=True)
            result = result + jnp.where(
                add_emitter[:, None],
                mis_weight(bs.pdf, em_pdf2)[:, None] * throughput
                * emitted_d, 0.0)

        # --- carried MIS state for the sampled continuation -----------------
        # medium scatter: NEE-only (prev_pdf 0) unless volpathmis MIS
        # smooth surface bounce: MIS with bs.pdf; delta bounce: full;
        # null bounce: pass-through unchanged
        smooth_b = active_surface & ~bs.delta & ~bs.null
        delta_b = active_surface & bs.delta & ~bs.null
        em_full = jnp.where(act_real | smooth_b, False,
                            jnp.where(delta_b, True, st.em_full))
        prev_pdf = jnp.where(
            act_real, (phase_pdf if phase_mis else jnp.zeros((N,))),
            jnp.where(smooth_b, bs.pdf, st.prev_pdf))
        p_prev = jnp.where(act_real[:, None], mi.p,
                           jnp.where(non_null[:, None], si.p, st.p_prev))

        # --- next ray + si cache update ------------------------------------
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
            channel=st.channel, si=si_next, needs_isect=needs_next,
            em_full=em_full, prev_pdf=prev_pdf, p_prev=p_prev,
            it=st.it + 1)

    return body


def sample(scene, meta, sampler: Sampler, ray: Ray, active=None,
           diff: bool = False, aux=None):
    """Volumetric path tracing bounce loop.

    Restructured vs the reference (volpath.cpp:82-262) for TPU wall time:
    the reference's evaluate_direct_light walk (:370-466, a dedicated
    ratio-tracking transmittance walk per BSDF/phase sample) is replaced
    by CARRIED MIS state — the sampled ray is followed by the next bounce
    iteration anyway, whose delta-tracking throughput already estimates
    the same transmittance, so emitter hits are accumulated there with
    mis_weight(prev_pdf, em_pdf). Likewise the medium-vertex NEE and
    surface-vertex NEE (mutually exclusive per lane) share ONE
    transmittance walk. Estimator differences are variance-only; the
    expectation matches the reference term by term.
    """
    N = ray.o.shape[0]
    if active is None:
        active = jnp.ones((N,), bool)
    max_depth, rr_depth, phase_mis, nee_fast = _opts(meta, diff)
    # null collisions are resolved inside the medium sampler, so outer
    # iterations scale with real scatters + surface bounces only
    wavefront_cap = MAX_WAVEFRONT_ITERS

    u_ch, sampler = sampler.next_1d()
    channel = jnp.minimum((u_ch * 3).astype(jnp.int32), 2)
    cam_med = jnp.full((N,), meta.camera_medium, jnp.int32)

    from ..core.records import SurfaceInteraction
    st = VolpathState(
        sampler=sampler, ray=ray,
        throughput=jnp.ones((N, 3)), result=jnp.zeros((N, 3)),
        eta=jnp.ones((N,)), depth=jnp.zeros((N,), jnp.int32),
        active=active, medium_idx=cam_med, channel=channel,
        si=SurfaceInteraction.invalid((N,)),
        needs_isect=jnp.ones((N,), bool),
        em_full=jnp.ones((N,), bool), prev_pdf=jnp.zeros((N,)),
        p_prev=ray.o, it=jnp.int32(0))

    def cond(st):
        return jnp.any(st.active) & (st.it < wavefront_cap)

    body = make_body(scene, meta, N, diff)

    if diff:
        ck_body = jax.checkpoint(lambda s, _: (body(s), None))
        iters = min(wavefront_cap, max(8, 3 * max_depth))
        st, _ = jax.lax.scan(ck_body, st, None, length=iters)
    else:
        st = jax.lax.while_loop(cond, body, st)
    return st.result, jnp.ones((N,), bool), st.sampler
