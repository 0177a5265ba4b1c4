"""Wavefront volumetric path tracer with null-collision (delta) tracking.

TPU-native redesign of the reference ``volpath`` plugin
(src/integrators/volpath.cpp): spectral-MIS delta tracking with a per-path
hero channel (volpath.cpp:62-66), real/null event split (:123-133), NEE
through media with ratio-tracking transmittance + null-BSDF pass-through
(sample_emitter, :263-368), and the BSDF-arm MIS via a transmittance walk
to the first non-null hit (evaluate_direct_light). The per-ray recursion
and both inner transmittance walks are masked ``lax.while_loop``s over the
whole wavefront.
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
from ..scene.types import F_NULL, F_DELTA, F_SMOOTH
from .common import mis_weight

# safety caps on wavefront loop iterations (null collisions + null BSDF
# crossings don't increment depth; RR keeps survivors bounded). Scenes with
# heterogeneous media need many null-collision steps (majorant * extent), so
# caps scale up when a grid medium is present.
MAX_WAVEFRONT_ITERS = 192
NEE_WALK_ITERS = 48


def _walk_iters(meta):
    from ..scene.types import MEDIUM_TYPES
    if MEDIUM_TYPES['heterogeneous'] in meta.medium_types:
        return 512
    return NEE_WALK_ITERS


def _wavefront_iters(meta):
    from ..scene.types import MEDIUM_TYPES
    if MEDIUM_TYPES['heterogeneous'] in meta.medium_types:
        return 768
    return MAX_WAVEFRONT_ITERS


def _index_spec(spec, channel):
    return jnp.take_along_axis(spec, channel[:, None], axis=1)[:, 0]


class NEEState(NamedTuple):
    sampler: Sampler
    ray: Ray
    transmittance: jnp.ndarray
    total_dist: jnp.ndarray
    medium_idx: jnp.ndarray
    active: jnp.ndarray
    it: jnp.ndarray


def transmittance_to_point(scene, meta, sampler, p_ref, d, dist, medium_idx,
                           channel, active, on_medium):
    """Ratio-tracking transmittance from p_ref toward d over dist, passing
    through null BSDFs and medium transitions (reference sample_emitter
    walk, volpath.cpp:275-368). Returns (transmittance, sampler)."""
    N = p_ref.shape[0]
    ray0 = Ray.make(p_ref, d, mint=jnp.where(on_medium, 0.0, m.RayEpsilon),
                    maxt=jnp.inf)
    st = NEEState(sampler=sampler, ray=ray0,
                  transmittance=jnp.ones((N, 3)),
                  total_dist=jnp.zeros((N,)),
                  medium_idx=medium_idx, active=active,
                  it=jnp.int32(0))

    walk_cap = _walk_iters(meta)

    def cond(st):
        return jnp.any(st.active) & (st.it < walk_cap)

    def body(st):
        remaining = dist * (1.0 - m.ShadowEpsilon) - st.total_dist
        active = st.active & (remaining > 0)
        ray = Ray(st.ray.o, st.ray.d, st.ray.mint, remaining)

        active_medium = active & (st.medium_idx >= 0)
        active_surface = active & ~active_medium
        smp = st.sampler

        u_fl, smp = smp.next_1d()
        mi, mint = medium_mod.sample_interaction(
            scene, meta, ray, u_fl, channel, st.medium_idx, active_medium)
        # homogeneous media: clip the scene intersection to the collision
        homo = medium_mod.is_homogeneous_like(scene, meta, st.medium_idx)
        ray_isect_maxt = jnp.where(
            active_medium & homo & mi.valid,
            jnp.minimum(mi.t, remaining), remaining)
        si = isect.ray_intersect(scene, Ray(ray.o, ray.d, ray.mint,
                                            ray_isect_maxt))
        # collisions beyond the surface are void
        mi_t = jnp.where(active_medium & (si.t < mi.t), jnp.inf, mi.t)
        mi = mi._replace(t=mi_t, valid=mi.valid & (si.t >= mi.t))

        # spectral tr/pdf over the sampled segment
        seg_t = jnp.minimum(remaining, jnp.minimum(
            jnp.where(jnp.isfinite(mi.t), mi.t, jnp.inf), si.t)) - mint
        seg_t = jnp.maximum(seg_t, 0.0)
        tr = jnp.exp(-seg_t[:, None] * mi.combined_extinction)
        beyond = (si.t < mi.t) | (mi.t > remaining)
        pdf = jnp.where(beyond[:, None], tr, tr * mi.combined_extinction)
        tr_pdf = _index_spec(pdf, channel)
        upd = active_medium[:, None]
        transmittance = jnp.where(
            upd, st.transmittance
            * jnp.where((tr_pdf > 0)[:, None],
                        tr / jnp.maximum(tr_pdf, 1e-30)[:, None], 0.0), st.transmittance)

        # mi.t > remaining: reached the target inside the medium
        reached = active_medium & (mi.t > remaining) & mi.valid
        total_dist = jnp.where(reached, dist, st.total_dist)
        mi_valid = mi.valid & ~reached & (mi.t <= remaining)
        escaped_medium = active_medium & ~mi_valid
        active_medium = active_medium & mi_valid

        total_dist = jnp.where(active_medium, total_dist + mi.t, total_dist)
        # ratio tracking null-collision factor (volpath.cpp:330: *= sigma_n;
        # the majorant pdf is already in the tr/tr_pdf division above)
        transmittance = jnp.where(active_medium[:, None],
                                  transmittance * mi.sigma_n, transmittance)
        new_o_med = mi.p

        # surface leg
        active_surface = active_surface | escaped_medium
        total_dist = jnp.where(active_surface, total_dist + si.t, total_dist)
        active_surface = active_surface & si.valid & ~active_medium
        null_tr = bsdf_mod.eval_null_transmission(scene, meta, si)
        transmittance = jnp.where(active_surface[:, None],
                                  transmittance * null_tr, transmittance)

        # medium transitions at surfaces
        new_medium = jnp.where(
            active_surface & si.is_medium_transition(),
            si.target_medium(ray.d), st.medium_idx)

        new_o = jnp.where(active_medium[:, None], new_o_med,
                          jnp.where(active_surface[:, None], si.p, st.ray.o))
        new_mint = jnp.where(active_medium, 0.0, m.RayEpsilon)
        alive = (active_medium | active_surface) \
            & jnp.any(transmittance > 0, axis=-1)

        return NEEState(
            sampler=smp,
            ray=Ray(new_o, st.ray.d, new_mint, st.ray.maxt),
            transmittance=transmittance,
            total_dist=total_dist,
            medium_idx=new_medium,
            active=alive, it=st.it + 1)

    st = jax.lax.while_loop(cond, body, st)
    # lanes still "active" hit the iteration cap: conservatively zero
    tr_out = jnp.where(st.active[:, None], 0.0, st.transmittance)
    return jnp.where(active[:, None], tr_out, 1.0), st.sampler


class EmissionWalkState(NamedTuple):
    sampler: Sampler
    ray: Ray
    transmittance: jnp.ndarray
    medium_idx: jnp.ndarray
    active: jnp.ndarray
    emitted: jnp.ndarray
    emitter_pdf: jnp.ndarray
    it: jnp.ndarray


def trace_emission(scene, meta, sampler, ray_in: Ray, medium_idx, p_ref,
                   channel, active):
    """Follow a BSDF/phase-sampled ray to the first emissive (non-null)
    surface or to the environment, accumulating transmittance — the
    reference's evaluate_direct_light used for the MIS bsdf arm.
    Returns (emitted, emitter_pdf_solid_angle, sampler)."""
    N = p_ref.shape[0]
    st = EmissionWalkState(
        sampler=sampler, ray=ray_in,
        transmittance=jnp.ones((N, 3)), medium_idx=medium_idx,
        active=active, emitted=jnp.zeros((N, 3)),
        emitter_pdf=jnp.zeros((N,)), it=jnp.int32(0))

    walk_cap = _walk_iters(meta)

    def cond(st):
        return jnp.any(st.active) & (st.it < walk_cap)

    def body(st):
        active = st.active
        smp = st.sampler
        active_medium = active & (st.medium_idx >= 0)
        active_surface = active & ~active_medium

        u_fl, smp = smp.next_1d()
        mi, mint = medium_mod.sample_interaction(
            scene, meta, st.ray, u_fl, channel, st.medium_idx, active_medium)
        homo = medium_mod.is_homogeneous_like(scene, meta, st.medium_idx)
        isect_maxt = jnp.where(active_medium & homo & mi.valid, mi.t,
                               st.ray.maxt)
        si = isect.ray_intersect(scene, Ray(st.ray.o, st.ray.d, st.ray.mint,
                                            isect_maxt))
        mi_t = jnp.where(active_medium & (si.t < mi.t), jnp.inf, mi.t)
        mi = mi._replace(t=mi_t, valid=mi.valid & (si.t >= mi.t))

        seg_t = jnp.minimum(jnp.where(jnp.isfinite(mi.t), mi.t, si.t), si.t) \
            - mint
        seg_t = jnp.maximum(jnp.where(jnp.isfinite(seg_t), seg_t, 0.0), 0.0)
        tr = jnp.exp(-seg_t[:, None] * mi.combined_extinction)
        pdf = jnp.where((si.t < mi.t)[:, None], tr,
                        tr * mi.combined_extinction)
        tr_pdf = _index_spec(pdf, channel)
        transmittance = jnp.where(
            active_medium[:, None],
            st.transmittance * jnp.where(
                (tr_pdf > 0)[:, None],
                tr / jnp.maximum(tr_pdf, 1e-30)[:, None], 0.0),
            st.transmittance)

        escaped_medium = active_medium & ~mi.valid
        active_medium = active_medium & mi.valid
        # ratio tracking null-collision factor (volpath.cpp:417: *= sigma_n)
        transmittance = jnp.where(active_medium[:, None],
                                  transmittance * mi.sigma_n, transmittance)

        active_surface = active_surface | escaped_medium

        # environment hit
        escaped = active_surface & ~si.valid
        env = emitter_mod.eval_env(scene, meta, st.ray.d, escaped)
        emitted = st.emitted + transmittance * env
        env_pdf = emitter_mod.pdf_env_direction(scene, meta, escaped)
        emitter_pdf = jnp.where(escaped, env_pdf, st.emitter_pdf)

        active_surface = active_surface & si.valid
        # emissive surface hit
        hit_em = active_surface & (si.emitter_idx >= 0)
        le = emitter_mod.eval_hit(scene, meta, si, hit_em)
        emitted = emitted + transmittance * le
        em_pdf = emitter_mod.pdf_direction(scene, meta, p_ref, si, hit_em)
        emitter_pdf = jnp.where(hit_em, em_pdf, emitter_pdf)

        # continue only through null BSDFs (and not past an emitter)
        flags = bsdf_mod.flags_of(scene, si)
        is_null = (flags & F_NULL) > 0
        cont_surface = active_surface & is_null & ~hit_em
        null_tr = bsdf_mod.eval_null_transmission(scene, meta, si)
        transmittance = jnp.where(cont_surface[:, None],
                                  transmittance * null_tr, transmittance)
        new_medium = jnp.where(cont_surface & si.is_medium_transition(),
                               si.target_medium(st.ray.d), st.medium_idx)

        new_o = jnp.where(active_medium[:, None], mi.p,
                          jnp.where(cont_surface[:, None], si.p, st.ray.o))
        new_mint = jnp.where(active_medium, 0.0, m.RayEpsilon)
        alive = (active_medium | cont_surface) \
            & jnp.any(transmittance > 0, axis=-1)

        return EmissionWalkState(
            sampler=smp, ray=Ray(new_o, st.ray.d, new_mint, st.ray.maxt),
            transmittance=transmittance, medium_idx=new_medium,
            active=alive, emitted=emitted, emitter_pdf=emitter_pdf,
            it=st.it + 1)

    st = jax.lax.while_loop(cond, body, st)
    return st.emitted, st.emitter_pdf, st.sampler


class VolpathState(NamedTuple):
    sampler: Sampler
    ray: Ray
    throughput: jnp.ndarray
    result: jnp.ndarray
    eta: jnp.ndarray
    depth: jnp.ndarray          # (N,) int32 (per-lane, unlike path)
    active: jnp.ndarray
    medium_idx: jnp.ndarray
    specular_chain: jnp.ndarray
    channel: jnp.ndarray
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

    u_ch, sampler = sampler.next_1d()
    channel = jnp.minimum((u_ch * 3).astype(jnp.int32), 2)
    cam_med = jnp.full((N,), meta.camera_medium, jnp.int32)

    st = VolpathState(
        sampler=sampler, ray=ray,
        throughput=jnp.ones((N, 3)), result=jnp.zeros((N, 3)),
        eta=jnp.ones((N,)), depth=jnp.zeros((N,), jnp.int32),
        active=active, medium_idx=cam_med,
        specular_chain=jnp.ones((N,), bool), channel=channel,
        it=jnp.int32(0))

    wavefront_cap = _wavefront_iters(meta)

    def cond(st):
        return jnp.any(st.active) & (st.it < wavefront_cap)

    def body(st):
        smp = st.sampler
        result = st.result
        throughput = st.throughput

        # --- russian roulette (volpath.cpp:79-84) ---------------------------
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

        # --- medium sampling ------------------------------------------------
        u_fl, smp = smp.next_1d()
        mi, mint = medium_mod.sample_interaction(
            scene, meta, st.ray, u_fl, st.channel, st.medium_idx,
            active_medium)
        homo = medium_mod.is_homogeneous_like(scene, meta, st.medium_idx)
        isect_maxt = jnp.where(active_medium & homo & mi.valid, mi.t,
                               st.ray.maxt)
        si = isect.ray_intersect(scene, Ray(st.ray.o, st.ray.d, st.ray.mint,
                                            isect_maxt))
        mi_t = jnp.where(active_medium & (si.t < mi.t), jnp.inf, mi.t)
        mi = mi._replace(t=mi_t, valid=mi.valid & (si.t >= mi.t))

        seg_t = jnp.minimum(jnp.where(jnp.isfinite(mi.t), mi.t, si.t), si.t) \
            - mint
        seg_t = jnp.maximum(jnp.where(jnp.isfinite(seg_t), seg_t, 0.0), 0.0)
        tr = jnp.exp(-seg_t[:, None] * mi.combined_extinction)
        pdf = jnp.where((si.t < mi.t)[:, None], tr,
                        tr * mi.combined_extinction)
        tr_pdf = _index_spec(pdf, st.channel)
        throughput = jnp.where(
            active_medium[:, None],
            throughput * jnp.where(
                (tr_pdf > 0)[:, None],
                tr / jnp.maximum(tr_pdf, 1e-30)[:, None], 0.0),
            throughput)

        escaped_medium = active_medium & ~mi.valid
        active_medium = active_medium & mi.valid

        # null vs real collision (volpath.cpp:123-133)
        u_ev, smp = smp.next_1d()
        p_real = _index_spec(mi.sigma_t, st.channel) \
            / jnp.maximum(_index_spec(mi.combined_extinction, st.channel),
                          1e-30)
        null_scatter = u_ev >= p_real
        act_null = null_scatter & active_medium
        act_real = ~null_scatter & active_medium
        throughput = jnp.where(
            act_null[:, None],
            throughput * mi.sigma_n
            * _index_spec(mi.combined_extinction, st.channel)[:, None]
            / jnp.maximum(_index_spec(mi.sigma_n, st.channel), 1e-30)[:, None],
            throughput)
        depth = jnp.where(act_real, st.depth + 1, st.depth)
        active = active & (depth < max_depth)
        act_real = act_real & active

        # real scatter: sigma_s factor (volpath.cpp:149-152)
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
            act_real & (ds.pdf > 0), jnp.ones((N,), bool))
        phase_val = phase_mod.eval(scene, meta, st.medium_idx, mi.wi, ds.d,
                                   act_real)
        result = result + jnp.where(
            (act_real & (ds.pdf > 0))[:, None],
            throughput * phase_val[:, None] * tr_nee * em_weight, 0.0)

        # --- phase sampling -------------------------------------------------
        u2p, smp = smp.next_2d()
        wo_med, phase_pdf = phase_mod.sample(scene, meta, st.medium_idx,
                                             mi.wi, u2p, act_real)

        # --- surface interactions ------------------------------------------
        active_surface = active_surface | escaped_medium
        # raw emitter hits count only on specular chains (volpath.cpp:186)
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
            st.channel, active_e & (ds_s.pdf > 0), jnp.zeros((N,), bool))
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

        # medium transition BEFORE the MIS walk (target medium of new ray)
        new_medium = jnp.where(
            active_surface & si.is_medium_transition(),
            si.target_medium(wo_world), st.medium_idx)

        # --- MIS bsdf arm: transmittance walk to emission -------------------
        add_emitter = active_surface & ~bs.delta & ~bs.null \
            & (depth < max_depth) & jnp.any(throughput > 0, axis=-1)
        bsdf_ray = spawn_ray(si.p, wo_world)
        emitted, em_pdf2, smp = trace_emission(
            scene, meta, smp, bsdf_ray, new_medium, si.p, st.channel,
            add_emitter)
        result = result + jnp.where(
            (add_emitter & (em_pdf2 >= 0))[:, None],
            mis_weight(bs.pdf, em_pdf2)[:, None] * throughput * emitted,
            0.0)

        # --- assemble next ray ---------------------------------------------
        # medium lanes: null -> continue straight from mi.p; real -> phase dir
        o_next = jnp.where(act_null[:, None] | act_real[:, None], mi.p,
                           jnp.where(active_surface[:, None], si.p,
                                     st.ray.o))
        d_next = jnp.where(act_real[:, None], wo_med,
                           jnp.where(active_surface[:, None], wo_world,
                                     st.ray.d))
        mint_next = jnp.where(active_surface, m.RayEpsilon,
                              jnp.zeros((N,)))
        new_ray = Ray(o_next, d_next, mint_next, jnp.full((N,), jnp.inf))

        alive = (active_medium | active_surface) & active
        alive = alive & jnp.any(throughput != 0.0, axis=-1)
        alive = alive & ((active_surface & (bs.pdf > 0)) | active_medium)

        return VolpathState(
            sampler=smp, ray=new_ray, throughput=throughput, result=result,
            eta=eta, depth=depth, active=alive, medium_idx=new_medium,
            specular_chain=specular_chain, channel=st.channel,
            it=st.it + 1)

    if diff:
        ck_body = jax.checkpoint(lambda s, _: (body(s), None))
        iters = min(_wavefront_iters(meta), max(8, 3 * max_depth))
        st, _ = jax.lax.scan(ck_body, st, None, length=iters)
    else:
        st = jax.lax.while_loop(cond, body, st)
    return st.result, jnp.ones((N,), bool), st.sampler
