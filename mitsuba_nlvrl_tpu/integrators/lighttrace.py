"""Wavefront light tracing: photon + VRL shooting.

TPU-native redesign of the reference's SERIAL emission loop
(src/integrators/vrl/vrl.cpp:117-374, photonmapper.cpp:75-378): a whole
wavefront of light paths marches in lock-step through a fixed number of
bounce iterations under ``lax.scan``; every iteration emits fixed-capacity
deposit records (surface photon / volume photon / VRL segment) with valid
masks instead of pushing into growing maps. Non-linear media bend the rays
between collisions with an inner bounded cell-marching scan that deposits a
VRL at every direction change (vrl.cpp:207-227).

Deposit semantics mirror the reference:
  * surface photons at Smooth BSDFs; caustic map if the previous non-null
    bounce was a transmission, else global map (vrl.cpp:772-782)
  * volume photons only for the first scatter in a medium chain
    ("mediumDepth == 0" direct-volume photons, vrl.cpp:273-275)
  * VRLs end at real scatters / surfaces / bend events, carrying
    flux * throughput at segment start (vrl_struct.h:60)
  * map scale factors = 1 / number-of-contributing-paths (vrl.cpp:383-438)
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
from ..medium import nonlinear as nl_mod
from ..ops import intersect as isect
from ..ops import gather as gat
from ..ops import hashgrid
from ..scene.types import F_NULL, F_SMOOTH, F_TRANSMISSION, MEDIUM_TYPES


class RawDeposits(NamedTuple):
    """Fixed-capacity deposit reservoirs filled by scatter inside the shoot
    scan (replaces per-step stacked deposits: memory is O(cap), not
    O(depth * wavefront), so light-path depth is config-driven — the
    reference's unbounded serial loop, vrl.cpp:117-374)."""
    sp_pos: jnp.ndarray      # (P, 3)
    sp_power: jnp.ndarray
    sp_dir: jnp.ndarray
    sp_normal: jnp.ndarray
    sp_depth: jnp.ndarray
    sp_caustic: jnp.ndarray
    sp_count: jnp.ndarray    # () int32 rows filled
    vp_pos: jnp.ndarray      # (Q, 3)
    vp_power: jnp.ndarray
    vp_dir: jnp.ndarray
    vp_depth: jnp.ndarray
    vp_count: jnp.ndarray
    vrl_o: jnp.ndarray       # (V, 3)
    vrl_e: jnp.ndarray       # (V, 3)
    vrl_flux: jnp.ndarray
    vrl_medium: jnp.ndarray
    vrl_depth: jnp.ndarray
    vrl_direct: jnp.ndarray
    vrl_count: jnp.ndarray
    # per-path "contributed at least one deposit" flags (scale factors,
    # vrl.cpp:383-438) + loss diagnostics
    sp_contrib: jnp.ndarray  # (N,) bool
    vp_contrib: jnp.ndarray
    vrl_contrib: jnp.ndarray
    sp_lost: jnp.ndarray     # () int32 deposits dropped (cap overflow)
    vp_lost: jnp.ndarray
    vrl_lost: jnp.ndarray
    trunc_paths: jnp.ndarray  # () int32 paths still alive at depth cap


def _scatter_rows(bufs, count, valid, rows, cap: int):
    """Append ``rows[valid]`` to the reservoir ``bufs`` at ``count``;
    overflow rows drop. Returns (new_bufs, new_count, n_lost)."""
    idx = count + jnp.cumsum(valid.astype(jnp.int32)) - 1
    ok = valid & (idx < cap)
    iw = jnp.where(ok, idx, cap)
    new = [b.at[iw].set(r, mode='drop') for b, r in zip(bufs, rows)]
    n_valid = valid.sum(dtype=jnp.int32)
    new_count = jnp.minimum(count + n_valid, cap)
    return new, new_count, count + n_valid - new_count


class PhotonMaps(NamedTuple):
    # surface photons
    sp_pos: jnp.ndarray      # (P, 3)
    sp_power: jnp.ndarray    # (P, 3)
    sp_dir: jnp.ndarray      # (P, 3) propagation dir at deposit
    sp_normal: jnp.ndarray   # (P, 3)
    sp_depth: jnp.ndarray    # (P,)
    sp_caustic: jnp.ndarray  # (P,) bool
    sp_valid: jnp.ndarray    # (P,) bool
    global_grid: hashgrid.HashGrid
    caustic_grid: hashgrid.HashGrid
    sp_scale: jnp.ndarray    # ()
    # volume photons
    vp_pos: jnp.ndarray
    vp_power: jnp.ndarray
    vp_dir: jnp.ndarray
    vp_depth: jnp.ndarray
    vp_valid: jnp.ndarray
    vp_grid: hashgrid.HashGrid
    vp_scale: jnp.ndarray
    # VRLs
    vrl_o: jnp.ndarray       # (V, 3)
    vrl_d: jnp.ndarray       # (V, 3) unit
    vrl_len: jnp.ndarray     # (V,)
    vrl_flux: jnp.ndarray    # (V, 3)
    vrl_medium: jnp.ndarray  # (V,) int32
    vrl_depth: jnp.ndarray   # (V,)
    vrl_direct: jnp.ndarray  # (V,) bool
    vrl_valid: jnp.ndarray   # (V,) bool
    vrl_scale: jnp.ndarray   # ()
    vrl_count: jnp.ndarray   # () int32 number of valid (compacted) VRLs
    # diagnostics: deposits dropped at capacity + paths truncated at the
    # light-depth cap (energy-loss visibility, reference dumps map stats in
    # postprocess, vrl.cpp:734-749)
    sp_lost: jnp.ndarray = ()
    vp_lost: jnp.ndarray = ()
    vrl_lost: jnp.ndarray = ()
    trunc_paths: jnp.ndarray = ()
    # packed VRL attribute rows [o(3) d(3) len flux(3) medium valid]:
    # vrl_contrib fetches a whole VRL in ONE row gather instead of 7
    # separate dynamic gathers (TPU gathers cost per ROW; see ops/gather)
    vrl_packed: jnp.ndarray = ()
    # packed photon rows (round 4, the same recipe for the photon maps):
    # sp_packed [pos(3) dir(3) power(3) caustic valid pad] and
    # vp_packed [pos(3) dir(3) power(3) radius valid pad] — the photon
    # estimators fetch a whole photon in ONE row gather instead of 4-5
    sp_packed: jnp.ndarray = ()
    vp_packed: jnp.ndarray = ()
    # per-photon BRE radius from local density (the kNN-radius analog of
    # bre.h:39-73): shrinks in dense regions (no leaks), grows in sparse
    # ones (no gaps); () until build_maps fills it
    vp_radius: jnp.ndarray = ()
    # VRL cluster structure (vrl.VRLClusters) — the lightcut analog; None
    # until vrl.preprocess attaches it after dicing/lengthening
    clusters: object = None


class ShootState(NamedTuple):
    sampler: Sampler
    ray: Ray
    throughput: jnp.ndarray
    flux: jnp.ndarray
    eta: jnp.ndarray
    depth: jnp.ndarray
    medium_depth: jnp.ndarray
    was_transmitted: jnp.ndarray
    is_direct: jnp.ndarray
    medium_idx: jnp.ndarray
    active: jnp.ndarray
    vrl_start: jnp.ndarray       # (N, 3) current VRL segment origin
    vrl_flux: jnp.ndarray        # (N, 3) flux*throughput at segment start
    vrl_medium: jnp.ndarray
    vrl_depth: jnp.ndarray
    vrl_direct: jnp.ndarray
    channel: jnp.ndarray


def _march_nonlinear(scene, meta, st: ShootState, t_coll, active_nl,
                     max_bends: int, min_vrl_len):
    """Walk the sampled free-flight distance along a bending ray, emitting
    a VRL deposit at every direction change (vrl.cpp:207-227). Returns
    (new_st_fields..., bend deposits stacked (S, N, ...))."""
    N = st.ray.o.shape[0]
    S = max_bends

    def body(carry, _):
        ray, remaining, vrl_start, vrl_flux, act = carry
        nli = nl_mod.sample_nonlinear_interaction(scene, meta, ray,
                                                  st.medium_idx, act)
        # a surface before the bend point cancels the bend. Only the
        # HIT/MISS bit is consumed, so this is an any-hit ray_test (early-
        # out per chunk), not a full closest-hit sweep — the reference
        # analogously re-intersects only at direction changes
        # (nonlinear.cpp:244-295); one occlusion walk per bend candidate.
        blocked = isect.ray_test(scene, Ray(ray.o, ray.d, ray.mint,
                                            jnp.minimum(remaining, nli.t)))
        bend = act & nli.valid & (nli.t < remaining) & ~blocked
        changed = bend & (m.dot(nli.wo, ray.d) < 1.0 - 1e-7)
        # VRL deposit at the bend
        dep_o = vrl_start
        dep_e = nli.p
        seg_len = m.norm(dep_e - dep_o)
        dep_ok = changed & (seg_len > min_vrl_len) & (st.medium_idx >= 0)
        new_start = jnp.where(changed[:, None], nli.p, vrl_start)
        dep = (dep_o, dep_e, vrl_flux, st.medium_idx, st.depth,
               st.is_direct, dep_ok)
        # keep the incoming mint for lanes that did not bend — zeroing it
        # unconditionally made area-emitter light rays (spawned with an
        # epsilon offset ON the luminaire) self-intersect their own
        # emitter at t~0 and die (paths terminate on emitter hits,
        # vrl.cpp:309-310)
        new_ray = Ray(o=jnp.where(bend[:, None], nli.p, ray.o),
                      d=jnp.where(bend[:, None], nli.wo, ray.d),
                      mint=jnp.where(bend, 0.0, ray.mint), maxt=ray.maxt)
        remaining = jnp.where(bend, remaining - nli.t, remaining)
        return (new_ray, remaining, new_start, vrl_flux, bend), dep

    init = (st.ray, t_coll, st.vrl_start, st.vrl_flux, active_nl)
    (ray, remaining, vrl_start, vrl_flux, _), deps = jax.lax.scan(
        body, init, None, length=S)
    return ray, remaining, vrl_start, deps


def shoot(scene, meta, key, n_paths: int, max_depth: int = 8,
          rr_depth: int = 5, max_bends: int = 0, min_vrl_len: float = 0.0,
          vp_all_scatters: bool = False, sp_cap: int = 262144,
          vp_cap: int = 262144, vrl_cap: int = 8192) -> RawDeposits:
    """Trace ``n_paths`` light paths for ``max_depth`` bounce iterations,
    scattering deposits into fixed-capacity reservoirs as the scan runs.
    """
    N = n_paths
    sampler = Sampler.make(key, N)
    u_sel, sampler = sampler.next_1d()
    u_pos, sampler = sampler.next_2d()
    u_dir, sampler = sampler.next_2d()
    act0 = jnp.ones((N,), bool)
    ray, flux, e_idx, n_o = emitter_mod.sample_ray(scene, meta, u_sel, u_pos,
                                                   u_dir, act0)
    if meta.iprop('use_laser', False):
        # Laser override replaces only the ray GEOMETRY; the flux stays
        # whatever the sampled emitter returned — this matches the
        # reference exactly (vrl.cpp:148-162: rayColorPair.second is kept
        # while ray.o/ray.d are overwritten). Deviation note: the reference
        # also multiplies shaped-emitter flux by an extra pi
        # (vrl.cpp:152-153) on top of AreaEmitter::sample_ray's L*pi/pdf
        # (area.cpp:117); our area weight is the physically-normalized
        # L*pi*area, validated against volpath ground truth.
        lo = jnp.asarray(meta.iprop('laser_origin', (0.0, 0.0, 0.0)),
                         jnp.float32)
        ld = m.normalize(jnp.asarray(meta.iprop('laser_direction',
                                                (0.0, 0.0, 1.0)), jnp.float32))
        ray = Ray.make(jnp.broadcast_to(lo, (N, 3)),
                       jnp.broadcast_to(ld, (N, 3)), mint=0.0)

    u_ch, sampler = sampler.next_1d()
    channel = jnp.minimum((u_ch * 3).astype(jnp.int32), 2)

    st = ShootState(
        sampler=sampler, ray=ray, throughput=jnp.ones((N, 3)), flux=flux,
        eta=jnp.ones((N,)), depth=jnp.ones((N,), jnp.int32),
        medium_depth=jnp.zeros((N,), jnp.int32),
        was_transmitted=jnp.zeros((N,), bool),
        is_direct=jnp.ones((N,), bool),
        medium_idx=jnp.full((N,), -1, jnp.int32), active=act0,
        vrl_start=ray.o, vrl_flux=flux,
        vrl_medium=jnp.full((N,), -1, jnp.int32),
        vrl_depth=jnp.ones((N,), jnp.int32),
        vrl_direct=jnp.ones((N,), bool), channel=channel)

    S_nl = max_bends
    has_nl = MEDIUM_TYPES['nonlinear'] in meta.medium_types and S_nl > 0

    zi = jnp.int32(0)
    raw0 = RawDeposits(
        sp_pos=jnp.zeros((sp_cap, 3)), sp_power=jnp.zeros((sp_cap, 3)),
        sp_dir=jnp.zeros((sp_cap, 3)), sp_normal=jnp.zeros((sp_cap, 3)),
        sp_depth=jnp.zeros((sp_cap,), jnp.int32),
        sp_caustic=jnp.zeros((sp_cap,), bool), sp_count=zi,
        vp_pos=jnp.zeros((vp_cap, 3)), vp_power=jnp.zeros((vp_cap, 3)),
        vp_dir=jnp.zeros((vp_cap, 3)),
        vp_depth=jnp.zeros((vp_cap,), jnp.int32), vp_count=zi,
        vrl_o=jnp.zeros((vrl_cap, 3)), vrl_e=jnp.zeros((vrl_cap, 3)),
        vrl_flux=jnp.zeros((vrl_cap, 3)),
        vrl_medium=jnp.full((vrl_cap,), -1, jnp.int32),
        vrl_depth=jnp.zeros((vrl_cap,), jnp.int32),
        vrl_direct=jnp.zeros((vrl_cap,), bool), vrl_count=zi,
        sp_contrib=jnp.zeros((N,), bool), vp_contrib=jnp.zeros((N,), bool),
        vrl_contrib=jnp.zeros((N,), bool),
        sp_lost=zi, vp_lost=zi, vrl_lost=zi, trunc_paths=zi)

    def body(carry, _):
        st, raw, trunc = carry
        smp = st.sampler
        N = st.ray.o.shape[0]
        throughput = st.throughput

        # RR
        active = st.active & jnp.any(throughput != 0, axis=-1)
        q = jnp.minimum(jax.lax.stop_gradient(
            jnp.max(throughput, axis=-1) * m.sqr(st.eta)), 0.95)
        perform_rr = st.depth > rr_depth
        u_rr, smp = smp.next_1d()
        active = active & ((u_rr < q) | ~perform_rr)
        throughput = jnp.where(perform_rr[:, None],
                               throughput * m.safe_rcp(q)[:, None],
                               throughput)
        # a path killed by the depth cap (not by RR / absorption) is
        # TRUNCATED energy — flag it so preprocess can report the loss
        trunc = trunc | (active & (st.depth >= max_depth))
        active = active & (st.depth < max_depth)

        active_medium = active & (st.medium_idx >= 0)
        active_surface = active & ~active_medium

        # --- nonlinear bending ------------------------------------------------
        # NL media are optically homogeneous (nonlinear.cpp:41): free flight
        # is exact against sigma_t == majorant and every collision is real,
        # so the analytic per-iteration sample stays correct for them. All
        # OTHER medium lanes delta-track to the next REAL collision inside
        # medium.sample_real_interaction (null events + supervoxel-local
        # majorants resolved in its inner while_loop) — without this,
        # heterogeneous shooting burns the depth-bounded scan on null
        # events (hetvol's mean density is ~1% of its majorant) and
        # silently truncates the deposited energy.
        u_fl, smp = smp.next_1d()
        cur_ray = st.ray
        vrl_start = st.vrl_start
        if has_nl:
            majorant = medium_mod.get_majorant(scene, st.medium_idx)
            mj = gat.select_channel(majorant, st.channel)
            midx_safe = jnp.maximum(st.medium_idx, 0)
            is_nl = active_medium & \
                (scene.media.type[midx_safe] == MEDIUM_TYPES['nonlinear'])
            t_coll = -jnp.log1p(-jnp.clip(u_fl, 0, m.OneMinusEpsilon)) \
                / jnp.maximum(mj, 1e-30)
            cur_ray, t_coll, vrl_start, bend_deps = _march_nonlinear(
                scene, meta, st._replace(ray=cur_ray), t_coll, is_nl,
                S_nl, min_vrl_len)
        else:
            is_nl = jnp.zeros((N,), bool)
            zero3 = jnp.zeros((0, N, 3))
            bend_deps = (zero3, zero3, zero3,
                         jnp.zeros((0, N), jnp.int32),
                         jnp.zeros((0, N), jnp.int32),
                         jnp.zeros((0, N), bool), jnp.zeros((0, N), bool))

        # scene hit along (possibly bent) ray
        si = isect.ray_intersect(scene, Ray(cur_ray.o, cur_ray.d,
                                            cur_ray.mint,
                                            jnp.full((N,), jnp.inf)))

        # --- fused delta tracking (homogeneous + heterogeneous lanes) --------
        act_med_std = active_medium & ~is_nl
        mray = Ray(cur_ray.o, cur_ray.d, cur_ray.mint,
                   jnp.where(si.valid, si.t, jnp.inf))
        mi, w_med, smp = medium_mod.sample_real_interaction(
            scene, meta, mray, smp, st.channel, st.medium_idx, act_med_std)
        throughput = jnp.where(act_med_std[:, None], throughput * w_med,
                               throughput)
        coll_std = act_med_std & mi.valid

        # --- NL lanes: analytic homogeneous free flight along the bent ray ---
        if has_nl:
            coll_nl = is_nl & (mj > 0) & (t_coll < si.t)
            seg_t = jnp.minimum(t_coll, si.t)
            seg_t = jnp.where(jnp.isfinite(seg_t), seg_t, 0.0)
            tr_vec = jnp.exp(-seg_t[:, None] * majorant)
            tr_ch = gat.select_channel(tr_vec, st.channel)
            tr_pdf = jnp.where(coll_nl, tr_ch * mj, tr_ch)
            throughput = jnp.where(
                is_nl[:, None],
                throughput * jnp.where(
                    (tr_pdf > 0)[:, None],
                    tr_vec / jnp.maximum(tr_pdf, 1e-30)[:, None], 0.0),
                throughput)
        else:
            coll_nl = jnp.zeros((N,), bool)

        coll_any = coll_std | coll_nl
        p_coll = mi.p
        if has_nl:
            p_coll = jnp.where(coll_nl[:, None],
                               cur_ray.at(jnp.where(coll_nl, t_coll, 0.0)),
                               p_coll)
        sigma_s, sigma_n, sigma_t = medium_mod.get_scattering_coefficients(
            scene, meta, st.medium_idx, p_coll, coll_any)
        escaped_medium = active_medium & ~coll_any

        act_real = coll_any
        depth = jnp.where(act_real, st.depth + 1, st.depth)
        trunc = trunc | (active & (depth >= max_depth + 1))
        active = active & (depth < max_depth + 1)
        act_real = act_real & active

        # real-collision factor: sigma_s * maj_ch / sigma_t_ch against the
        # majorant the distance was actually sampled with (the supervoxel-
        # LOCAL one for delta-tracked lanes, the global bound for NL lanes)
        comb = mi.combined_extinction
        if has_nl:
            comb = jnp.where(coll_nl[:, None], majorant, comb)
        throughput = jnp.where(
            act_real[:, None],
            throughput * sigma_s * (
                gat.select_channel(comb, st.channel) / jnp.maximum(
                    gat.select_channel(sigma_t, st.channel),
                    1e-30))[:, None], throughput)

        # volume photon: first scatter in the chain (vrl.cpp:273-275), or
        # every scatter for the photonmapper (photonmapper.cpp:198-241)
        vp_ok = act_real if vp_all_scatters else \
            (act_real & (st.medium_depth == 0))
        vp_pos = p_coll
        vp_power = st.flux * throughput
        vp_dir = cur_ray.d
        medium_depth = jnp.where(act_real, st.medium_depth + 1,
                                 st.medium_depth)

        # VRL end at the real scatter
        vrl_end_med_ok = act_real & (st.medium_idx >= 0)

        # phase sampling for the new direction
        u2p, smp = smp.next_2d()
        wo_med, _ = phase_mod.sample(scene, meta, st.medium_idx, -cur_ray.d,
                                     u2p, act_real)

        # --- surface leg -----------------------------------------------------
        active_surface = active_surface | escaped_medium
        active_surface = active_surface & si.valid
        # paths die on emitter hits (vrl.cpp:309-310)
        hit_emitter = active_surface & (si.emitter_idx >= 0)
        active_surface = active_surface & ~hit_emitter

        # VRL end at the surface
        vrl_end_surf_ok = active_surface & (st.medium_idx >= 0)

        flags = bsdf_mod.flags_of(scene, si)
        is_smooth = (flags & F_SMOOTH) > 0
        sp_ok = active_surface & is_smooth
        sp_pos = si.p
        sp_power = st.flux * throughput
        sp_dir = cur_ray.d
        sp_normal = si.n
        sp_caustic = st.was_transmitted

        # bsdf sampling (importance transport)
        u1b, smp = smp.next_1d()
        u2b, smp = smp.next_2d()
        bs, b_weight = bsdf_mod.sample(scene, meta, si, u1b, u2b,
                                       mode=bsdf_mod.IMPORTANCE)
        throughput = jnp.where(active_surface[:, None],
                               throughput * b_weight, throughput)
        eta = jnp.where(active_surface, st.eta * bs.eta, st.eta)
        wo_world = si.to_world(bs.wo)
        non_null = active_surface & ~bs.null
        depth = jnp.where(non_null, depth + 1, depth)
        was_transmitted = jnp.where(
            non_null, (bsdf_mod.flags_of(scene, si) & F_TRANSMISSION) > 0,
            st.was_transmitted)
        medium_depth = jnp.where(non_null & was_transmitted, 0, medium_depth)

        new_medium = jnp.where(active_surface & si.is_medium_transition(),
                               si.target_medium(wo_world), st.medium_idx)

        # assemble next ray
        o_next = jnp.where(act_real[:, None], p_coll,
                           jnp.where(active_surface[:, None], si.p,
                                     cur_ray.o))
        d_next = jnp.where(act_real[:, None], wo_med,
                           jnp.where(active_surface[:, None], wo_world,
                                     cur_ray.d))
        mint_next = jnp.where(active_surface, m.RayEpsilon, 0.0)
        new_ray = Ray(o_next, d_next, mint_next, jnp.full((N,), jnp.inf))

        # VRL bookkeeping: end current segment at scatter/surface, restart
        vrl_end_ok = vrl_end_med_ok | vrl_end_surf_ok
        end_p = jnp.where(act_real[:, None], p_coll, si.p)
        end_len_ok = m.norm(end_p - vrl_start) > min_vrl_len
        vrl_dep = (vrl_start, end_p, st.vrl_flux, st.vrl_medium,
                   st.vrl_depth, st.vrl_direct,
                   vrl_end_ok & end_len_ok & (st.vrl_medium >= 0))

        # after a real scatter the subsequent light is indirect. (Null
        # collisions no longer reach this point — the medium sampler
        # resolves them — so VRL segments correctly SPAN null events
        # instead of restarting, and every medium stretch is covered.)
        is_direct = jnp.where(act_real, False, st.is_direct)
        restart = act_real | active_surface
        new_vrl_start = jnp.where(restart[:, None], o_next, vrl_start)
        new_vrl_flux = jnp.where(restart[:, None],
                                 st.flux * throughput, st.vrl_flux)

        alive = (act_real | active_surface) & active
        alive = alive & jnp.any(throughput != 0, axis=-1)
        alive = alive & (~active_surface | (bs.pdf > 0))

        # --- reservoir scatter of this step's deposits -----------------------
        sp_bufs, sp_count, sp_lost = _scatter_rows(
            [raw.sp_pos, raw.sp_power, raw.sp_dir, raw.sp_normal,
             raw.sp_depth, raw.sp_caustic], raw.sp_count, sp_ok,
            [sp_pos, sp_power, sp_dir, sp_normal, depth, sp_caustic],
            sp_cap)
        vp_bufs, vp_count, vp_lost = _scatter_rows(
            [raw.vp_pos, raw.vp_power, raw.vp_dir, raw.vp_depth],
            raw.vp_count, vp_ok, [vp_pos, vp_power, vp_dir, depth], vp_cap)

        # bend deposits (S, N, ...) + the end deposit (1, N, ...), flattened
        bo, be, bf, bm, bd, bdir, bok = bend_deps
        fl3 = lambda a, b: jnp.concatenate([a, b[None]], 0).reshape(-1, 3)
        fl1 = lambda a, b: jnp.concatenate([a, b[None]], 0).reshape(-1)
        v_o = fl3(bo, vrl_dep[0])
        v_e = fl3(be, vrl_dep[1])
        v_ok2d = jnp.concatenate([bok, vrl_dep[6][None]], 0)   # (S+1, N)
        v_ok = v_ok2d.reshape(-1) & (m.norm(v_e - v_o) > 1e-6)
        vrl_bufs, vrl_count, vrl_lost = _scatter_rows(
            [raw.vrl_o, raw.vrl_e, raw.vrl_flux, raw.vrl_medium,
             raw.vrl_depth, raw.vrl_direct], raw.vrl_count, v_ok,
            [v_o, v_e, fl3(bf, vrl_dep[2]), fl1(bm, vrl_dep[3]),
             fl1(bd, vrl_dep[4]), fl1(bdir, vrl_dep[5])], vrl_cap)

        new_raw = raw._replace(
            sp_pos=sp_bufs[0], sp_power=sp_bufs[1], sp_dir=sp_bufs[2],
            sp_normal=sp_bufs[3], sp_depth=sp_bufs[4], sp_caustic=sp_bufs[5],
            sp_count=sp_count, sp_lost=raw.sp_lost + sp_lost,
            vp_pos=vp_bufs[0], vp_power=vp_bufs[1], vp_dir=vp_bufs[2],
            vp_depth=vp_bufs[3], vp_count=vp_count,
            vp_lost=raw.vp_lost + vp_lost,
            vrl_o=vrl_bufs[0], vrl_e=vrl_bufs[1], vrl_flux=vrl_bufs[2],
            vrl_medium=vrl_bufs[3], vrl_depth=vrl_bufs[4],
            vrl_direct=vrl_bufs[5], vrl_count=vrl_count,
            vrl_lost=raw.vrl_lost + vrl_lost,
            sp_contrib=raw.sp_contrib | sp_ok,
            vp_contrib=raw.vp_contrib | vp_ok,
            vrl_contrib=raw.vrl_contrib | v_ok2d.any(axis=0))

        new_st = ShootState(
            sampler=smp, ray=new_ray, throughput=throughput, flux=st.flux,
            eta=eta, depth=depth, medium_depth=medium_depth,
            was_transmitted=was_transmitted, is_direct=is_direct,
            medium_idx=new_medium, active=alive,
            vrl_start=new_vrl_start, vrl_flux=new_vrl_flux,
            vrl_medium=jnp.where(restart, new_medium, st.vrl_medium),
            vrl_depth=jnp.where(restart, depth, st.vrl_depth),
            vrl_direct=jnp.where(restart, is_direct, st.vrl_direct),
            channel=st.channel)
        return (new_st, new_raw, trunc), None

    (st, raw, trunc), _ = jax.lax.scan(
        body, (st, raw0, jnp.zeros((N,), bool)), None,
        length=max_depth + 2)
    # paths cut by the depth budget (or still alive at scan end): silent-
    # truncation diagnostic (VERDICT r1: surface the cap, don't hide it)
    return raw._replace(
        trunc_paths=(trunc | st.active).sum(dtype=jnp.int32))


def _compact_dev(valid, arrays, cap: int):
    """Device-side compaction to a STATIC capacity: stable-sort valid rows
    first, truncate/pad to ``cap`` (no device->host transfer — critical on
    remote-TPU links where pulls cost seconds)."""
    order = jnp.argsort(~valid, stable=True)
    take = order[:cap]
    n = jnp.minimum(valid.sum(), cap)
    vmask = jnp.arange(cap) < n
    outs = [a[take] for a in arrays]
    return n, vmask, outs


def photon_radii(grid: hashgrid.HashGrid, pos, valid, k: float = 8.0,
                 max_per_cell: int = 32):
    """Per-photon gather radius from local density — the TPU analog of the
    reference BRE's kNN radius (bre.h:39-73): count neighbors within the
    grid cell size r0 and set r = r0 * (k / count)^(1/3) (a k-th-neighbor
    distance under locally uniform density), clamped to [r0/4, r0] so the
    27-cell neighborhood still covers every contributing photon."""
    r0 = grid.cell_size
    r02 = r0 * r0

    # query points ARE the photons
    def fold2(acc, idx, ok):
        d2 = m.squared_norm(pos[idx] - pos[:, None, :])
        sel = ok & valid[idx] & (d2 <= r02)
        return acc + sel.sum(axis=1)

    counts = hashgrid.fold_neighbors(
        grid, pos, valid, fold2,
        jnp.zeros(pos.shape[:1], jnp.float32), max_per_cell)
    r = r0 * jnp.cbrt(k / jnp.maximum(counts, 1.0))
    return jnp.clip(r, 0.25 * r0, r0)


def _thin(key, valid, flux, arrays, cap: int):
    """Keep min(count, cap) uniformly-random valid rows (without
    replacement) and scale their flux by count/kept — unbiased budget
    enforcement. Returns (kept, vmask, flux_out, arrays_out), leading
    dimension cap."""
    n = valid.shape[0]
    r = jax.random.uniform(key, (n,))
    order = jnp.argsort(jnp.where(valid, r, 2.0))
    take = order[:cap]
    count = valid.sum(dtype=jnp.int32)
    kept = jnp.minimum(count, cap)
    vmask = jnp.arange(cap) < kept
    scale = count.astype(jnp.float32) \
        / jnp.maximum(kept, 1).astype(jnp.float32)
    flux_out = jnp.where(vmask[:, None], flux[take] * scale, 0.0)
    return kept, vmask, flux_out, [a[take] for a in arrays]


def thin_raw(key, raw: RawDeposits, sp_cap: int, vp_cap: int,
             vrl_cap: int) -> RawDeposits:
    """Thin over-full deposit reservoirs down to the configured map
    budgets. The reference shoots serially UNTIL each map is full and
    normalizes by the paths that got deposits in (vrl.cpp:117,
    vrl_map.h:43-53); the wavefront analog shoots everything at once into
    headroom-sized reservoirs and keeps a uniformly-random subset with
    flux scaled by count/kept — unbiased, respects the query-cost budget,
    and avoids the depth-biased truncation a fill-order drop would cause
    (the reservoir fills iteration-by-iteration, so overflow would drop
    the DEEP deposits first)."""
    ks, kv, kr = jax.random.split(key, 3)
    sp_v = jnp.arange(raw.sp_pos.shape[0]) < raw.sp_count
    n_sp, _, sp_pow, (sp_pos, sp_dir, sp_nrm, sp_dep, sp_cau) = _thin(
        ks, sp_v, raw.sp_power,
        [raw.sp_pos, raw.sp_dir, raw.sp_normal, raw.sp_depth,
         raw.sp_caustic], sp_cap)
    vp_v = jnp.arange(raw.vp_pos.shape[0]) < raw.vp_count
    n_vp, _, vp_pow, (vp_pos, vp_dir, vp_dep) = _thin(
        kv, vp_v, raw.vp_power, [raw.vp_pos, raw.vp_dir, raw.vp_depth],
        vp_cap)
    vrl_v = jnp.arange(raw.vrl_o.shape[0]) < raw.vrl_count
    n_vrl, _, vrl_flux, (vrl_o, vrl_e, vrl_med, vrl_dep, vrl_dir) = _thin(
        kr, vrl_v, raw.vrl_flux,
        [raw.vrl_o, raw.vrl_e, raw.vrl_medium, raw.vrl_depth,
         raw.vrl_direct], vrl_cap)
    return raw._replace(
        sp_pos=sp_pos, sp_power=sp_pow, sp_dir=sp_dir, sp_normal=sp_nrm,
        sp_depth=sp_dep, sp_caustic=sp_cau, sp_count=n_sp,
        vp_pos=vp_pos, vp_power=vp_pow, vp_dir=vp_dir, vp_depth=vp_dep,
        vp_count=n_vp,
        vrl_o=vrl_o, vrl_e=vrl_e, vrl_flux=vrl_flux, vrl_medium=vrl_med,
        vrl_depth=vrl_dep, vrl_direct=vrl_dir, vrl_count=n_vrl)


def build_maps(scene, meta, raw: RawDeposits, r_global, r_caustic,
               r_volume) -> PhotonMaps:
    """Build hash grids + map scale factors over the already-compact
    reservoirs (the analog of the reference's map builds, vrl.cpp:383-438).

    Deviation (validated): the reference scales each map by 1/contributing-
    path-count (vrl.cpp:370-380,:431 — surfacePath/volumePath flags), which
    over-brightens whenever shot paths can miss the scene entirely
    (constant/envmap emitters shooting inward from the bounding sphere:
    a missed path carries its flux share away and must still count in the
    normalization). We divide by the number of paths SHOT — the unbiased
    estimator — cross-checked against volpath ground truth in
    tests/test_nlvrl.py. For interior emitters (the thesis anchor scenes)
    essentially every path contributes and the two scales coincide."""
    n_shot = jnp.float32(raw.sp_contrib.shape[0])
    sp_paths = n_shot
    vp_paths = n_shot
    vrl_paths = n_shot

    sp_vmask = jnp.arange(raw.sp_pos.shape[0]) < raw.sp_count
    vp_vmask = jnp.arange(raw.vp_pos.shape[0]) < raw.vp_count
    vrl_vmask = jnp.arange(raw.vrl_o.shape[0]) < raw.vrl_count

    seg_c = raw.vrl_e - raw.vrl_o
    vrl_len = m.norm(seg_c)
    vrl_d = seg_c * m.safe_rcp(vrl_len)[:, None]

    lo = scene.bbox_lo
    sp_caustic_b = raw.sp_caustic & sp_vmask
    return PhotonMaps(
        sp_pos=raw.sp_pos, sp_power=raw.sp_power, sp_dir=raw.sp_dir,
        sp_normal=raw.sp_normal, sp_depth=raw.sp_depth,
        sp_caustic=sp_caustic_b, sp_valid=sp_vmask,
        global_grid=hashgrid.build(raw.sp_pos, sp_vmask & ~sp_caustic_b,
                                   lo, r_global),
        caustic_grid=hashgrid.build(raw.sp_pos, sp_caustic_b, lo, r_caustic),
        sp_scale=1.0 / sp_paths.astype(jnp.float32),
        vp_pos=raw.vp_pos, vp_power=raw.vp_power, vp_dir=raw.vp_dir,
        vp_depth=raw.vp_depth, vp_valid=vp_vmask,
        vp_grid=(vp_grid := hashgrid.build(raw.vp_pos, vp_vmask, lo,
                                           r_volume)),
        vp_radius=(vp_rad := photon_radii(vp_grid, raw.vp_pos, vp_vmask)),
        vp_scale=1.0 / vp_paths.astype(jnp.float32),
        sp_packed=jnp.concatenate(
            [raw.sp_pos, raw.sp_dir, raw.sp_power,
             sp_caustic_b.astype(jnp.float32)[:, None],
             sp_vmask.astype(jnp.float32)[:, None],
             jnp.zeros((raw.sp_pos.shape[0], 1), jnp.float32)], axis=1),
        vp_packed=jnp.concatenate(
            [raw.vp_pos, raw.vp_dir, raw.vp_power, vp_rad[:, None],
             vp_vmask.astype(jnp.float32)[:, None],
             jnp.zeros((raw.vp_pos.shape[0], 1), jnp.float32)], axis=1),
        vrl_o=raw.vrl_o, vrl_d=vrl_d, vrl_len=vrl_len, vrl_flux=raw.vrl_flux,
        vrl_medium=raw.vrl_medium, vrl_depth=raw.vrl_depth,
        vrl_direct=raw.vrl_direct, vrl_valid=vrl_vmask,
        vrl_scale=1.0 / vrl_paths.astype(jnp.float32),
        vrl_count=raw.vrl_count,
        vrl_packed=jnp.concatenate(
            [raw.vrl_o, vrl_d, vrl_len[:, None], raw.vrl_flux,
             raw.vrl_medium.astype(jnp.float32)[:, None],
             vrl_vmask.astype(jnp.float32)[:, None]], axis=1),
        sp_lost=raw.sp_lost, vp_lost=raw.vp_lost, vrl_lost=raw.vrl_lost,
        trunc_paths=raw.trunc_paths)


def map_stats(maps: PhotonMaps) -> dict:
    """Postprocess statistics dump, the analog of VRLIntegrator::
    postprocess (vrl.cpp:734-749: query counts, map sizes, NLI min/max).
    Deviations: per-render query counts are folded into the measured-rays
    metric (render(ray_stats=...)) instead of per-map atomics; sizes are
    the actual device-array bytes of each map. Pulls a handful of scalars
    — call once after rendering, not per pass."""
    def _nbytes(*arrs):
        total = 0
        for a in arrs:
            if isinstance(a, jnp.ndarray):
                total += a.size * a.dtype.itemsize
            elif hasattr(a, '_fields'):        # nested grid pytrees
                total += _nbytes(*[getattr(a, f) for f in a._fields])
        return total

    def bool_sum(x):
        return int(jnp.sum(x))
    stats = {
        'surface_photons': bool_sum(maps.sp_valid),
        'caustic_photons': bool_sum(maps.sp_valid & maps.sp_caustic),
        'volume_photons': bool_sum(maps.vp_valid),
        'vrl_count': int(maps.vrl_count),
        'global_map_bytes': _nbytes(maps.sp_pos, maps.sp_power, maps.sp_dir,
                                    maps.sp_normal, maps.global_grid),
        'caustic_map_bytes': _nbytes(maps.caustic_grid),
        'volume_map_bytes': _nbytes(maps.vp_pos, maps.vp_power, maps.vp_dir,
                                    maps.vp_grid),
        'vrl_map_bytes': _nbytes(maps.vrl_o, maps.vrl_d, maps.vrl_len,
                                 maps.vrl_flux),
    }
    for k in ('sp_lost', 'vp_lost', 'vrl_lost', 'trunc_paths'):
        v = getattr(maps, k)
        if isinstance(v, jnp.ndarray):
            stats[k] = int(v)
    return stats


def log_map_stats(maps: PhotonMaps, printer=print) -> None:
    s = map_stats(maps)
    def mem(b):
        return f"{b / 2**20:.2f} MiB" if b >= 2**20 else f"{b / 2**10:.1f} KiB"
    printer(f"  surface photons: {s['surface_photons']} "
            f"({s['caustic_photons']} caustic), "
            f"global map {mem(s['global_map_bytes'])}, "
            f"caustic map {mem(s['caustic_map_bytes'])}")
    printer(f"  volume photons: {s['volume_photons']}, "
            f"map {mem(s['volume_map_bytes'])}")
    printer(f"  VRLs: {s['vrl_count']}, map {mem(s['vrl_map_bytes'])}")
    lost = {k: s[k] for k in ('sp_lost', 'vp_lost', 'vrl_lost',
                              'trunc_paths') if s.get(k)}
    if lost:
        printer(f"  energy-loss diagnostics: {lost}")
