"""VRL integrator: the thesis's Non-Linear Virtual Ray Lights.

TPU-native redesign of the reference ``vrl`` plugin
(src/integrators/vrl/vrl.cpp + vrl_struct.h + vrl_map.h):

  * preprocess: wavefront photon/VRL shooting (lighttrace.py) replacing the
    serial emission loop vrl.cpp:117-374, + host-side map compaction.
  * camera pass: bounce loop; inside (optically homogeneous / nonlinear)
    media the camera ray bends into a piecewise-linear BentRay
    (vrl.cpp:550-595), volume photons are gathered at points spaced
    2*radius along it for direct light (vrl.cpp:600-610), and VRLs are
    queried per segment for indirect light (vrl.cpp:613-629).
  * VRL evaluation: Kulla & Fajardo inverse-CDF importance sampling in
    asinh space on the VRL and atan space on the camera segment
    (vrl_struct.h:247-360), double phase & sigma_s weights, three
    transmittances incl. an occlusion walk (getContrib,
    vrl_struct.h:584-662).
  * acceleration: a two-level Morton-cluster hierarchy (coarse ->
    subcluster -> member importance sampling with Tr-bounded weights),
    the wavefront-regular analog of the reference's per-query lightcut
    refinement (vrl_lightcut.h) — see ``VRLClusters``. 'uniform' keeps
    the reference's no-acceleration default (ENoVRLAcceleration,
    vrl_map.h:133-211) and 'ris' a dense resampled-importance sweep.
"""
from __future__ import annotations

from functools import partial
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
from ..ops.gather import select_channel as _selch
from ..scene.types import F_SMOOTH, MEDIUM_TYPES
from . import lighttrace
from . import photon_est
from .volpath import transmittance_to_point, _medium_segment_tr

def scene_radius_of(scene):
    """Reference radius convention: |bbox.center - bbox.max|
    (vrl.cpp:448)."""
    return m.norm((scene.bbox_hi - 0.5 * (scene.bbox_lo + scene.bbox_hi))[None, :])[0]


def preprocess(scene, meta, key, vp_all_scatters: bool = False):
    """Shoot light paths and build the photon/VRL maps."""
    target_vrls = int(meta.iprop('target_vrls', 1000))
    target_vp = int(meta.iprop('volume_photons', 1000))
    # size the wavefront from whichever map the scene actually uses
    # (photonmapper configs ask for millions of volume photons; capped at a
    # 64k-path wavefront per shot — scale factors keep estimates unbiased)
    want = max(target_vrls, target_vp // 8 if vp_all_scatters else 0, 1024)
    n_paths = min(1 << (max(want - 1, 1)).bit_length(), 65536)
    # Light-path depth is config-driven (reference walks until RR kills,
    # vrl.cpp:180-185). 'light_depth_cap' bounds the scan length; paths
    # still alive at the cap are COUNTED (maps.trunc_paths) instead of
    # silently dropped — raise the cap for optically thick media (brain
    # marble scale 1000 needs O(100) scatters).
    max_depth = min(int(meta.iprop('max_depth', 512)),
                    int(meta.iprop('light_depth_cap', 64)))
    rr_depth = int(meta.iprop('rr_depth', 5))
    min_vrl = float(meta.iprop('min_vrl_length', 5.0))
    has_nl = MEDIUM_TYPES['nonlinear'] in meta.medium_types \
        and bool(meta.iprop('use_non_linear', True))
    max_bends = int(meta.iprop('max_nl_bends', 32)) if has_nl else 0

    photon_cap = max(int(meta.iprop('global_photons', 250000)), target_vp)
    vrl_budget = max(target_vrls, 8)
    # shoot into headroom-sized reservoirs, then thin each family down to
    # its configured budget with unbiased flux rescaling (thin_raw) — the
    # wavefront analog of the reference's shoot-until-full loop
    head = lambda cap: min(4 * cap, max(cap, n_paths * (max_depth + 2)))
    shoot_fn = jax.jit(partial(
        lighttrace.shoot, n_paths=n_paths, max_depth=max_depth,
        rr_depth=rr_depth, max_bends=max_bends, min_vrl_len=min_vrl,
        vp_all_scatters=vp_all_scatters, sp_cap=head(photon_cap),
        vp_cap=head(photon_cap), vrl_cap=head(vrl_budget)),
        static_argnames=('meta',))
    raw = shoot_fn(scene, meta, key)
    raw = jax.jit(partial(lighttrace.thin_raw, sp_cap=photon_cap,
                          vp_cap=photon_cap, vrl_cap=vrl_budget))(
        jax.random.fold_in(key, 0x7411), raw)

    # keep radii as device scalars: host pulls are expensive on remote TPUs
    sr = scene_radius_of(scene)
    r_global = meta.iprop('global_lookup_radius_relative', 0.05) * sr
    r_caustic = meta.iprop('caustic_lookup_radius_relative', 0.0125) * sr
    r_volume = meta.iprop('volume_lookup_radius_relative', 0.005) * sr
    # vp grid cell must cover the jittered query radius (<= 1.25 r_volume)
    maps = lighttrace.build_maps(
        scene, meta, raw, r_global, r_caustic, 1.25 * r_volume)
    if bool(meta.iprop('long_vrl', False)):
        maps = jax.jit(_lengthen_vrls)(scene, maps)
    dice = int(meta.iprop('dice_vrl', 1))
    if dice > 1:
        maps = jax.jit(partial(_dice_vrls, dice=dice),
                       static_argnames=('meta',))(
            scene, meta, jax.random.fold_in(key, 0xd1ce), maps)
    if bool(meta.iprop('use_light_cut', True)):
        # default 1024 FINE clusters: the two-level hierarchy makes finer
        # granularity CHEAPER than the old flat 512 (O(K1+K2+M) per lane)
        n_cl = int(meta.iprop('vrl_clusters', 1024))
        clusters = jax.jit(partial(build_vrl_clusters, n_clusters=n_cl))(
            scene, maps)
        maps = maps._replace(clusters=clusters)
    return maps


def _lengthen_vrls(scene, maps):
    """long_vrl: extend every VRL to the first surface along its ray
    (convertToLong, vrl_struct.h:146-154; vrl_map.h toLong :57). The
    estimator already integrates Tr from the VRL origin, so only the
    length changes."""
    ray = Ray.make(maps.vrl_o + maps.vrl_d * 1e-4, maps.vrl_d)
    si = isect.ray_intersect(scene, ray)
    new_len = jnp.where(si.valid & maps.vrl_valid, si.t + 1e-4,
                        maps.vrl_len)
    return maps._replace(vrl_len=new_len)


def _dice_vrls(scene, meta, key, maps, dice: int):
    """dice_vrl > 1: re-chunk every VRL into sub-VRLs of uniform length
    avg_len/dice; each sub-VRL's flux pre-absorbs Tr(origin -> sub start)
    so energy stays exact (dice(), vrl_struct.h:88-128; dicingVRL,
    vrl_map.h:104-129). TPU deviation: a static budget of 2*dice slots
    per VRL (tails beyond 2x the average length truncate) keeps the
    wavefront shape static; the diced map is re-compacted on device."""
    V = maps.vrl_len.shape[0]
    K = 2 * dice
    nvalid = jnp.maximum(maps.vrl_count.astype(jnp.float32), 1.0)
    avg = jnp.sum(jnp.where(maps.vrl_valid, maps.vrl_len, 0.0)) / nvalid
    chunk = jnp.maximum(avg / dice, 1e-4)
    start = chunk * jnp.arange(K, dtype=jnp.float32)          # (K,)
    sub_len = jnp.clip(maps.vrl_len[:, None] - start[None, :], 0.0, chunk)
    valid = maps.vrl_valid[:, None] & (sub_len > 1e-5)        # (V, K)

    rep = lambda a: jnp.repeat(a, K, axis=0)
    med = rep(maps.vrl_medium)
    start_f = jnp.broadcast_to(start[None, :], (V, K)).reshape(V * K)
    # Tr(VRL origin -> sub-VRL start), pre-absorbed into the sub-VRL flux
    # (dice(), vrl_struct.h:100-112). Stochastic-Tr is fine here: flux is
    # linear in it, so the diced estimator stays unbiased for
    # heterogeneous VRL media too.
    tr, _ = _medium_segment_tr(
        scene, meta, Sampler.make(key, V * K), rep(maps.vrl_o),
        rep(maps.vrl_d), start_f, med,
        jnp.zeros((V * K,), jnp.int32), valid.reshape(V * K))
    o = (maps.vrl_o[:, None, :]
         + maps.vrl_d[:, None, :] * start[None, :, None]).reshape(V * K, 3)
    n, vmask, (o, d, ln, flux, med, dep, direct) = lighttrace._compact_dev(
        valid.reshape(V * K),
        [o, rep(maps.vrl_d), sub_len.reshape(V * K),
         rep(maps.vrl_flux) * tr, med, rep(maps.vrl_depth),
         rep(maps.vrl_direct)], V * K)
    return maps._replace(vrl_o=o, vrl_d=d, vrl_len=ln, vrl_flux=flux,
                         vrl_medium=med, vrl_depth=dep, vrl_direct=direct,
                         vrl_valid=vmask, vrl_count=n)


import os as _os
# lightcut stage-weight falloff exponent: 1 matches the Kulla
# line-integral scaling (a VRL's expected contribution to a segment is
# ~ flux/h, vrl_struct.h eq. 10-13 — integrating 1/(h^2+t^2) gives
# pi/h), 2 the point-light heuristic (measured worse on bright lanes)
_LC_FALLOFF = int(_os.environ.get('MNT_LC_FALLOFF', '1'))

ANISO_CDF_KNOTS = 10     # CDF_LENGHT, vrl_struct.h:365


def _aniso_cam_cdf(scene, meta, cam_medium, med_v, seg_o, seg_d, seg_len,
                   p_vrl, d_v, u2, act):
    """Anisotropic tabulated-CDF sampling of the CAMERA-segment point
    (vrl_struct.h:361-505, the gated anisotropic branch): knots are
    cosine-spaced in Kulla's theta space, the density at each knot is the
    PRODUCT of both phase functions, and the piecewise-linear CDF is
    inverted exactly. For isotropic phases the density is constant and
    this reduces bit-near to the atan sampler.

    Deviation (documented): the reference renormalizes u uniformly inside
    the chosen bin but divides by the LERPED density
    (vrl_struct.h:488-496, flagged "not sure that linear interpolation is
    a good choice") — an inconsistent pair that biases the estimator; we
    invert the trapezoid exactly so pdf(theta) = lerp(ph)/total matches
    the sampling distribution. Returns (t_cam, inv_pdf_c, ok)."""
    N = seg_o.shape[0]
    K = ANISO_CDF_KNOTS
    u_hat = m.dot(seg_d, p_vrl - seg_o)
    u0_hat = -u_hat
    u1_hat = seg_len + u0_hat
    h = jnp.maximum(m.norm(seg_o + seg_d * u_hat[:, None] - p_vrl), 1e-7)
    th0 = jnp.arctan(u0_hat / h)
    th1 = jnp.arctan(u1_hat / h)
    # cosine-spaced knots (eq. 19 role)
    frac = 0.5 * (1.0 - jnp.cos(jnp.pi * jnp.arange(K) / (K - 1)))
    th = th0[:, None] + (th1 - th0)[:, None] * frac[None, :]   # (N, K)
    # PEAK-INSERTION knots (reference USE_PEAK_SAMPLING branch,
    # vrl_struct.h:361-505): for sharp forward phases (HG g >= ~0.9) the
    # cosine table under-resolves the interior peak of the VRL-phase
    # factor — the sampled density then underestimates near the peak and
    # rare giant 1/pdf weights blow the variance up (measured 50x at
    # g=0.95 without this). The VRL phase peaks where the segment->VRL
    # direction w(theta) = -sin(theta) seg_d + cos(theta) n_hat is
    # closest to -d_v: maximizing dot(w, -d_v) = A sin - B cos gives
    # theta* = atan2(B, A) + pi/2 (wrapped into (-pi/2, pi/2); the wrap
    # lands on the antipodal minimum when the max is off-interval —
    # harmless extra knots). Five knots at theta* +- {0,1,4} HG
    # half-widths, clamped to the span, then one sort merges the table.
    from ..scene.types import M_PHASE_G
    from ..ops.gather import take_rows
    g_v = take_rows(scene.media.params,
                    jnp.maximum(med_v, 0))[:, M_PHASE_G]
    foot = seg_o + seg_d * u_hat[:, None]
    nhat = (p_vrl - foot) * m.safe_rcp(h)[:, None]
    A = m.dot(seg_d, d_v)
    B = m.dot(nhat, d_v)
    th_p = jnp.arctan2(B, A) + 0.5 * jnp.pi
    th_p = jnp.where(th_p > 0.5 * jnp.pi, th_p - jnp.pi, th_p)
    ga = jnp.abs(g_v)
    # HG half-width in scattering angle ~ sqrt(1-g); floor keeps the
    # isotropic case benign and the cap keeps knots inside sharp spans
    delta = jnp.clip(jnp.sqrt(jnp.maximum(1.0 - ga, 1e-4)) * 0.2,
                     0.01, 0.3)
    offs = jnp.asarray([-4.0, -1.0, 0.0, 1.0, 4.0])
    th_pk = jnp.clip(th_p[:, None] + delta[:, None] * offs[None, :],
                     th0[:, None], th1[:, None])
    th = jnp.sort(jnp.concatenate([th, th_pk], axis=1), axis=1)
    K = K + offs.shape[0]
    t_k = h[:, None] * jnp.tan(th) - u0_hat[:, None]           # (N, K)
    p_k = seg_o[:, None, :] + seg_d[:, None, :] * t_k[..., None]
    dir_k = p_vrl[:, None, :] - p_k
    dir_k = dir_k * m.safe_rcp(m.norm(dir_k))[..., None]       # (N, K, 3)
    # phase products at the knots (one flattened eval per side)
    rep = lambda x: jnp.repeat(x, K, axis=0)
    dflat = dir_k.reshape(N * K, 3)
    ph_ray = phase_mod.eval(scene, meta, rep(cam_medium), rep(-seg_d),
                            dflat, rep(act)).reshape(N, K)
    ph_vrl = phase_mod.eval(scene, meta, rep(med_v), rep(-d_v),
                            -dflat, rep(act)).reshape(N, K)
    ph = jnp.maximum(ph_ray * ph_vrl, 0.0)                     # (N, K)
    dth = th[:, 1:] - th[:, :-1]                               # (N, K-1)
    area0 = 0.5 * (ph[:, 1:] + ph[:, :-1]) * dth
    total = jnp.sum(area0, axis=1)
    ok = act & (total > 1e-12) & jnp.isfinite(total)
    # DEFENSIVE blend with the analytic atan density (uniform in theta):
    # the tabulated density alone under-estimates between knots wherever
    # the table under-resolves a peak, and the resulting rare 1/pdf
    # weights blew variance up ~50x at HG g=0.95 (peak knots or not).
    # Blending the normalized knot densities with the constant beta/span
    # BEFORE inversion keeps the CDF piecewise linear (one exact
    # inversion, no branch), lower-bounds the pdf at beta x the atan
    # sampler's — so no sample's weight exceeds 1/beta of the atan
    # weight — and for constant densities reduces EXACTLY to the atan
    # sampler with the same uniform (the isotropic bit-parity gate).
    beta = 0.5
    span = jnp.maximum(th1 - th0, 1e-9)
    phi = (1.0 - beta) * ph * m.safe_rcp(total)[:, None] \
        + (beta * m.safe_rcp(span))[:, None]                   # (N, K)
    area = 0.5 * (phi[:, 1:] + phi[:, :-1]) * dth              # sums to 1
    cdf = jnp.cumsum(area, axis=1)
    uu = jnp.clip(u2, 0.0, m.OneMinusEpsilon) * cdf[:, -1]
    j = jnp.minimum(jnp.sum((cdf < uu[:, None]).astype(jnp.int32), axis=1),
                    K - 2)
    cdf0 = jnp.concatenate([jnp.zeros((N, 1)), cdf], axis=1)
    from ..ops.gather import select_row
    pa = select_row(phi[:, :-1], j)
    pb = select_row(phi[:, 1:], j)
    tha = select_row(th[:, :-1], j)
    dthj = select_row(dth, j)
    xi = jnp.clip((uu - select_row(cdf0, j))
                  * m.safe_rcp(select_row(area, j)), 0.0, 1.0)
    # exact inversion of the linear density pa -> pb over the bin
    dp = pb - pa
    lin = jnp.abs(dp) > 1e-9 * jnp.maximum(pa, pb)
    s = jnp.where(lin,
                  (m.safe_sqrt(pa * pa + xi * (pb * pb - pa * pa)) - pa)
                  * m.safe_rcp(dp), xi)
    theta = tha + dthj * s
    q = pa + dp * s              # blended density value at the sample
    tc = h * jnp.tan(theta)
    inv_pdf_c = (h * h + tc * tc) * m.safe_rcp(h * q)
    t_cam = jnp.clip(tc - u0_hat, 0.0, seg_len)
    ok = ok & jnp.isfinite(inv_pdf_c) & (inv_pdf_c > 0)
    return t_cam, inv_pdf_c, ok


def vrl_contrib(scene, meta, maps, seg_o, seg_d, seg_len, cam_medium,
                vi, u1, u2, channel, sampler, active):
    """Single-VRL contribution to a camera segment (getContrib,
    vrl_struct.h:584-662). Returns (spectrum, sampler)."""
    N = seg_o.shape[0]
    packed = getattr(maps, 'vrl_packed', None)
    if isinstance(packed, jnp.ndarray) and packed.ndim == 2:
        # one 12-wide row gather for the whole VRL record (7 separate
        # dynamic gathers cost ~7x on TPU; ops/gather.py)
        row = packed[vi]
        o_v, d_v = row[:, 0:3], row[:, 3:6]
        len_v, flux = row[:, 6], row[:, 7:10]
        med_v = row[:, 10].astype(jnp.int32)
        valid_v = row[:, 11] > 0.5
    else:
        o_v = maps.vrl_o[vi]
        d_v = maps.vrl_d[vi]
        len_v = maps.vrl_len[vi]
        flux = maps.vrl_flux[vi]
        med_v = maps.vrl_medium[vi]
        valid_v = maps.vrl_valid[vi]
    act = active & valid_v & (len_v > 0) & (seg_len > 0)

    # --- closest points between the two segments (findClosetPoint) --------
    w0 = seg_o - o_v
    b = m.dot(seg_d, d_v)
    d_ = m.dot(seg_d, w0)
    e = m.dot(d_v, w0)
    denom = 1.0 - b * b
    s_c = jnp.where(jnp.abs(denom) > 1e-9,
                    m.safe_div(b * e - d_, denom), 0.0)
    s_c = jnp.clip(s_c, 0.0, seg_len)
    t_v = jnp.clip(e + b * s_c, 0.0, len_v)
    s_c = jnp.clip(-d_ + b * t_v, 0.0, seg_len)

    h_vec = (seg_o + seg_d * s_c[:, None]) - (o_v + d_v * t_v[:, None])
    h = m.norm(h_vec)
    sin_theta = m.norm(jnp.cross(d_v, seg_d))
    degenerate = (h < 1e-7) | (sin_theta < 1e-6)

    # --- Kulla inverse-CDF on the VRL (asinh space, eqs. 10-13) -----------
    v0_hat = -t_v
    v1_hat = len_v + v0_hat
    s_safe = jnp.maximum(sin_theta, 1e-6)
    h_safe = jnp.maximum(h, 1e-7)

    def asinh(x):
        return jnp.log(x + m.safe_sqrt(x * x + 1.0))

    a0 = asinh(v0_hat / h_safe * s_safe)
    a1 = asinh(v1_hat / h_safe * s_safe)
    v = h_safe * jnp.sinh(m.lerp(a0, a1, u1)) / s_safe
    inv_pdf_v = (a1 - a0) * m.safe_sqrt(h_safe * h_safe
                                        + v * v * s_safe * s_safe) / s_safe
    t_vrl = jnp.clip(v + t_v, 0.0, len_v)
    p_vrl = o_v + d_v * t_vrl[:, None]

    # --- camera-segment sampling (atan space, section 4.1) ----------------
    u_hat = m.dot(seg_d, p_vrl - seg_o)
    u0_hat = -u_hat
    u1_hat = seg_len + u0_hat
    h_pt = jnp.maximum(m.norm(seg_o + seg_d * u_hat[:, None] - p_vrl), 1e-7)
    th_a = jnp.arctan(u0_hat / h_pt)
    th_b = jnp.arctan(u1_hat / h_pt)
    uu = h_pt * jnp.tan(m.lerp(th_a, th_b, u2))
    inv_pdf_c = (th_b - th_a) * (h_pt * h_pt + uu * uu) / h_pt
    t_cam = jnp.clip(uu - u0_hat, 0.0, seg_len)

    # optional anisotropic tabulated-CDF camera sampling: the density in
    # theta space is the PRODUCT of both phase functions instead of a
    # constant (vrl_struct.h:361-505; gated there too — ships off)
    if bool(meta.iprop('vrl_aniso_cdf', False)):
        t_cam_a, inv_a, ok_a = _aniso_cam_cdf(
            scene, meta, cam_medium, med_v, seg_o, seg_d, seg_len,
            p_vrl, d_v, u2, act & ~degenerate)
        t_cam = jnp.where(ok_a, t_cam_a, t_cam)
        inv_pdf_c = jnp.where(ok_a, inv_a, inv_pdf_c)
    p_cam = seg_o + seg_d * t_cam[:, None]

    # degenerate fallback: uniform MC (sampleMC, vrl_struct.h:239-243);
    # also forced by the reference's use_uniform_sampling prop
    # (vrl.cpp:62 picks sampleMC over the Kulla samplingVRL)
    if bool(meta.iprop('use_uniform_sampling',
                       meta.iprop('use_nl_atomic_query', False))):
        degenerate = jnp.ones_like(degenerate)
    t_cam_mc = u1 * seg_len
    t_vrl_mc = u2 * len_v
    inv_pdf_mc = seg_len * len_v
    t_cam = jnp.where(degenerate, t_cam_mc, t_cam)
    t_vrl = jnp.where(degenerate, t_vrl_mc, t_vrl)
    p_cam = seg_o + seg_d * t_cam[:, None]
    p_vrl = o_v + d_v * t_vrl[:, None]
    inv_pdf = jnp.where(degenerate, inv_pdf_mc, inv_pdf_v * inv_pdf_c)
    act = act & jnp.isfinite(inv_pdf) & (inv_pdf > 0)

    # --- double phase x sigma_s x triple transmittance --------------------
    dirv = p_vrl - p_cam
    dist = m.norm(dirv)
    act = act & (dist > 1e-6)
    dirn = dirv * m.safe_rcp(dist)[:, None]

    ray_pf = phase_mod.eval(scene, meta, cam_medium, -seg_d, dirn, act)
    vrl_pf = phase_mod.eval(scene, meta, med_v, -d_v, -dirn, act)
    sig_s_cam, _, _ = medium_mod.get_scattering_coefficients(
        scene, meta, cam_medium, p_cam, act)
    sig_s_vrl, _, _ = medium_mod.get_scattering_coefficients(
        scene, meta, med_v, p_vrl, act)

    # Tr along the camera segment and along the VRL (evalTransmittance,
    # vrl_struct.h:509-572): closed-form for homogeneous/NL media,
    # supervoxel ratio tracking for heterogeneous ones
    tr_cam, sampler = _medium_segment_tr(scene, meta, sampler, seg_o, seg_d,
                                         t_cam, cam_medium, channel, act)
    tr_vrl, sampler = _medium_segment_tr(scene, meta, sampler, o_v, d_v,
                                         t_vrl, med_v, channel, act)
    act_tr = act & (ray_pf > 0) & (vrl_pf > 0)
    tr_link, sampler = transmittance_to_point(
        scene, meta, sampler, p_cam, dirn, dist, cam_medium, channel,
        act_tr, jnp.ones((N,), bool))

    falloff = m.safe_rcp(dist * dist)
    contrib = flux * (falloff * vrl_pf * ray_pf * inv_pdf)[:, None] \
        * tr_vrl * tr_cam * tr_link * sig_s_cam * sig_s_vrl
    contrib = jnp.where(jnp.isfinite(contrib), contrib, 0.0)
    return jnp.where(act_tr[:, None], contrib, 0.0), sampler


class VRLClusters(NamedTuple):
    """TPU-native replacement for the reference's VRL lightcut
    (vrl_lightcut.h) — a TWO-LEVEL Morton hierarchy. The reference
    refines a priority-queue cut per query until the cluster bound falls
    below errRatio * Li (vrl_lightcut.h:243-393), which is
    pointer-chasing-hostile on a TPU wavefront. Here the same refinement
    happens stochastically with a fixed two-level schedule: VRLs are
    Morton-sorted by midpoint and chunked into K1 coarse clusters of K2
    subclusters of M members; a query importance-samples coarse -> sub ->
    member, each stage with the reference's upper-bound terms (flux x
    Tr-bound / d^2, getClusterUpperBound roles, vrl_lightcut.h:429-512)
    and the member stage with EXACT per-member weights. Dividing by the
    exact product pdf keeps the estimator unbiased. Per-lane cost is
    O(K1 + K2 + M) (~88 weight evals at the 1024-fine-cluster default)
    vs the flat design's O(K + M) (~528) with FINER effective
    granularity (K1*K2 fine clusters approximate the 1/d^2 falloff that
    the adaptive cut refines toward)."""
    # coarse level (K1)
    c_centroid: jnp.ndarray  # (K1, 3) flux-weighted centroid
    c_radius2: jnp.ndarray   # (K1,) squared radius (softening / Tr face)
    c_lum: jnp.ndarray       # (K1,) total flux luminance
    # sub level, packed per coarse row (one K1 one-hot gather per query)
    s_centroid: jnp.ndarray  # (K1, K2*3)
    s_radius2: jnp.ndarray   # (K1, K2)
    s_lum: jnp.ndarray       # (K1, K2)
    # member tables, packed per FINE cluster row: one narrow
    # (N, F) x (F, 5M) one-hot dot reaches the chosen subcluster's
    # members without materializing anything fat (ops.gather.onehot_dot)
    rows: jnp.ndarray        # (F, M*5): [mid xyz*M | mlum*M | member*M]
    # (K1, K2, M are derived from the array shapes: c_lum (K1,),
    # s_lum (K1, K2), rows (K1*K2, 5*M) — keeps every field a leaf)


_LUM = jnp.asarray([0.2126, 0.7152, 0.0722])


def _morton3(q):
    """Interleave 10-bit coords -> 30-bit Morton code."""
    def spread(x):
        x = x & 0x3ff
        x = (x | (x << 16)) & 0x30000ff
        x = (x | (x << 8)) & 0x300f00f
        x = (x | (x << 4)) & 0x30c30c3
        x = (x | (x << 2)) & 0x9249249
        return x
    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)


def build_vrl_clusters(scene, maps, n_clusters: int) -> VRLClusters:
    """Morton-sort VRL midpoints, chunk into F = K1*K2 equal-count fine
    clusters of M members, and aggregate fine -> coarse (the analog of
    buildLightTree, vrl_lightcut.h:515-627, as a sort + two reduction
    levels instead of an agglomerative binary tree)."""
    V = maps.vrl_o.shape[0]
    # member ids ride the float32 rows table below; float32 is bit-exact
    # for integers only below 2^24 — a silent id corruption past that
    # would poison the onehot_dot/round decode undetected
    assert V < (1 << 24), (
        f"VRL map capacity {V} >= 2^24: member ids no longer round-trip "
        "through the float32 cluster rows table")
    F = int(max(1, min(n_clusters, max(V // 4, 1))))
    K2 = int(min(16, F))
    K1 = -(-F // K2)
    F = K1 * K2
    M = -(-V // F)
    mid = maps.vrl_o + maps.vrl_d * (0.5 * maps.vrl_len)[:, None]
    ext = jnp.maximum(scene.bbox_hi - scene.bbox_lo, 1e-9)
    qm = jnp.clip(((mid - scene.bbox_lo) / ext * 1023.0).astype(jnp.int32),
                  0, 1023)
    code = jnp.where(maps.vrl_valid, _morton3(qm), jnp.int32(0x7fffffff))
    order = jnp.argsort(code).astype(jnp.int32)
    member = jnp.concatenate(
        [order, jnp.full((F * M - V,), V, jnp.int32)]).reshape(F, M)
    mi = jnp.minimum(member, V - 1)
    mvalid = (member < V) & maps.vrl_valid[mi]

    lum_m = jnp.where(mvalid, jnp.sum(maps.vrl_flux[mi] * _LUM, -1)
                      * jnp.maximum(maps.vrl_len[mi], 1e-6), 0.0)
    f_lum = lum_m.sum(axis=1)                                # (F,)

    mid_m = maps.vrl_o[mi] + maps.vrl_d[mi] \
        * (0.5 * maps.vrl_len[mi])[..., None]                # (F, M, 3)
    mid_m = jnp.where(mvalid[..., None], mid_m, 0.0)
    f_cent = jnp.sum(mid_m * lum_m[..., None], axis=1) \
        * m.safe_rcp(f_lum)[:, None]                         # (F, 3)
    f_r2 = jnp.sum(jnp.where(mvalid, m.squared_norm(
        mid_m - f_cent[:, None, :]) * lum_m, 0.0), axis=1) \
        * m.safe_rcp(f_lum)                                  # (F,)

    # coarse aggregation over each run of K2 fine clusters (Morton order
    # keeps runs spatially tight, like subtree roots of the binary tree)
    s_lum = f_lum.reshape(K1, K2)
    s_cent = f_cent.reshape(K1, K2, 3)
    s_r2 = f_r2.reshape(K1, K2)
    c_lum = s_lum.sum(axis=1)
    c_cent = jnp.sum(s_cent * s_lum[..., None], axis=1) \
        * m.safe_rcp(c_lum)[:, None]
    c_r2 = jnp.sum((m.squared_norm(s_cent - c_cent[:, None, :]) + s_r2)
                   * s_lum, axis=1) * m.safe_rcp(c_lum)

    rows = jnp.concatenate(
        [mid_m.reshape(F, M * 3), lum_m,
         member.astype(jnp.float32)], axis=1)                # (F, 5M)
    return VRLClusters(c_centroid=c_cent, c_radius2=c_r2, c_lum=c_lum,
                       s_centroid=s_cent.reshape(K1, K2 * 3),
                       s_radius2=s_r2, s_lum=s_lum, rows=rows)


def _seg_point_dist2(seg_o, seg_d, seg_len, p):
    """Squared distance from camera segments (N,3)+(N,) to points
    (N, K, 3) -> (N, K)."""
    rel = p - seg_o[:, None, :]
    t = jnp.clip(jnp.sum(rel * seg_d[:, None, :], -1), 0.0,
                 seg_len[:, None])
    return m.squared_norm(rel - t[..., None] * seg_d[:, None, :])


def _sigma_min_bound(scene, meta, medium_idx):
    """Per-lane lower bound on extinction along links into the camera
    medium — the Tr term of the reference cluster upper bound
    (getClusterUpperBound, vrl_lightcut.h:457-476: Tr <= exp(-sig_min*d)).
    Min across channels; heterogeneous media use the global grid minimum
    (grid_sup_min), homogeneous-like the constant sigma_t."""
    from .. import medium as medium_mod
    sigma_unit, _, _, _, is_het = medium_mod._medium_facts(scene,
                                                           medium_idx)
    sig = jnp.min(sigma_unit, axis=-1)
    if medium_mod._has_supervoxels(scene, meta) \
            and scene.media.grid_sup_min is not None:
        gmin = jnp.min(scene.media.grid_sup_min)
        sig = jnp.where(is_het, sig * gmin, sig)
    return jnp.where(medium_idx >= 0, sig, 0.0)


def _lc_stage_weights(lum, cent, r2, seg_o, seg_d, seg_len, sig_min):
    """Per-stage lightcut selection weights: flux luminance x a
    transmittance upper bound exp(-sig_min*d_near) over squared
    segment-to-centroid distance, softened by the cluster radius (the
    importance roles of getClusterUpperBound, vrl_lightcut.h:441-476:
    flux, 1/d^2, Tr bound; the phase bound is a constant across clusters
    of one medium and cancels in the normalized pdf). ``lum``/``r2`` are
    (..., K) and ``cent`` (..., K, 3), broadcast against (N,) lanes."""
    d2 = _seg_point_dist2(seg_o, seg_d, seg_len, cent)
    if _LC_FALLOFF == 1:
        w = lum * m.safe_rcp(m.safe_sqrt(d2 + r2 + 1e-4))
    else:
        w = lum / (d2 + r2 + 1e-4)
    if sig_min is not None:
        # conservative: distance to the cluster FACE (centroid minus
        # radius), keeping the factor an upper bound on any member's Tr
        d_near = jnp.maximum(m.safe_sqrt(d2) - m.safe_sqrt(r2), 0.0)
        w = w * jnp.exp(-sig_min[:, None] * d_near)
    return w


def _sample_discrete(w, u):
    """Inverse-CDF draw along axis 1 of (N, K) weights. Returns
    (index, prob, total)."""
    cdf = jnp.cumsum(w, axis=1)
    tot = cdf[:, -1]
    i = jnp.sum((cdf < u[:, None] * tot[:, None]).astype(jnp.int32),
                axis=1)
    i = jnp.minimum(i, w.shape[1] - 1)
    p = _selch(w, i) * m.safe_rcp(tot)
    return i, p, tot


def _cluster_weights(clusters: VRLClusters, seg_o, seg_d, seg_len,
                     sig_min=None):
    """(N, K1) COARSE selection weights (stage 1 of the two-level cut)."""
    return _lc_stage_weights(
        clusters.c_lum[None, :], clusters.c_centroid[None, :, :],
        clusters.c_radius2[None, :], seg_o, seg_d, seg_len, sig_min)


def sample_cluster_vrl(clusters: VRLClusters, w, w_cdf, seg_o, seg_d,
                       seg_len, u_c, u_s, u_m, V: int, sig_min=None):
    """Draw (coarse, sub, member) per lane: coarse from the precomputed
    (N, K1) weights, subcluster from gathered fine-centroid bounds,
    member with exact per-member flux/dist^2 weights over the chosen
    fine cluster's M members. The product pdf is exact, so dividing by
    it keeps the estimator unbiased regardless of how well each stage's
    bound approximates the integrand (the reference's cut has the same
    property, vrl_lightcut.h:153-192). Returns (vrl_index, inv_pdf, ok)."""
    from ..ops.gather import take_many as _take_many, onehot_dot
    K1 = clusters.c_lum.shape[0]
    K2 = clusters.s_lum.shape[1]
    M_ = clusters.rows.shape[1] // 5
    # stage 1: coarse cluster (precomputed weights/cdf)
    u = u_c[:, None] * w_cdf[:, -1:]
    c1 = jnp.minimum(jnp.sum((w_cdf < u).astype(jnp.int32), axis=1), K1 - 1)
    w_tot = w_cdf[:, -1]
    p_c = _selch(w, c1) * m.safe_rcp(w_tot)
    # stage 2: subcluster — gather the chosen coarse row's fine-cluster
    # table (one fused K1 one-hot matmul) and reuse the same bound terms
    s_cent_f, s_r2, s_lum = _take_many(
        [clusters.s_centroid, clusters.s_radius2, clusters.s_lum], c1)
    ws = _lc_stage_weights(s_lum, s_cent_f.reshape(-1, K2, 3), s_r2,
                           seg_o, seg_d, seg_len, sig_min)
    c2, p_s, ws_tot = _sample_discrete(ws, u_s)
    # stage 3: member — one narrow (N, F) x (F, 5M) one-hot dot pulls the
    # chosen FINE cluster's packed member row (midpoints + flux + ids);
    # exact per-member weights, the same terms as the upper stages
    row = onehot_dot(c1 * K2 + c2, clusters.rows)            # (N, 5M)
    mid = row[:, :M_ * 3].reshape(-1, M_, 3)
    mlum = row[:, M_ * 3:M_ * 4]
    midf = row[:, M_ * 4:]      # member VRL ids, kept f32 through _selch
    d2 = _seg_point_dist2(seg_o, seg_d, seg_len, mid)
    r2_f = _selch(s_r2, c2)                                  # fine radius^2
    if _LC_FALLOFF == 1:
        wm = mlum * m.safe_rcp(m.safe_sqrt(d2 + 1e-2 * r2_f[:, None] + 1e-6))
    else:
        wm = mlum / (d2 + 1e-2 * r2_f[:, None] + 1e-6)
    if sig_min is not None:
        wm = wm * jnp.exp(-sig_min[:, None] * m.safe_sqrt(d2))
    j, p_m, wm_tot = _sample_discrete(wm, u_m)
    vi = jnp.round(_selch(midf, j)).astype(jnp.int32)
    ok = (vi < V) & (p_c > 0) & (p_s > 0) & (p_m > 0) \
        & (w_tot > 0) & (ws_tot > 0) & (wm_tot > 0)
    inv_pdf = m.safe_rcp(p_c * p_s * p_m)
    return jnp.minimum(vi, V - 1), inv_pdf, ok


VRL_RIS_CHUNK = 512


def _vrl_ris_weights(maps, seg_o, seg_d, seg_len, sl):
    """Selection weights for a VRL chunk vs each camera segment: VRL power
    luminance over squared distance between the VRL midpoint and the
    segment (the TPU-native replacement for the lightcut's per-cluster
    upper bound, vrl_lightcut.h:429-512 — a dense resampled-importance
    pass instead of a priority-queue tree cut)."""
    sl_c = jnp.maximum(sl, 0)
    vo = maps.vrl_o[sl_c]
    vd = maps.vrl_d[sl_c]
    vl = maps.vrl_len[sl_c]
    lum = (maps.vrl_flux[sl_c]
           * jnp.asarray([0.2126, 0.7152, 0.0722])).sum(-1)
    ok = maps.vrl_valid[sl_c] & (sl >= 0)
    mid = vo + vd * (0.5 * vl)[:, None]                      # (C, 3)
    # closest point on the camera segment to each VRL midpoint
    rel = mid[None, :, :] - seg_o[:, None, :]                # (N, C, 3)
    t = jnp.sum(rel * seg_d[:, None, :], -1)
    t = jnp.clip(t, 0.0, seg_len[:, None])
    d2 = m.squared_norm(rel - t[..., None] * seg_d[:, None, :])
    w = (lum * vl)[None, :] / (d2 + 1e-3 * (1.0 + d2))
    return jnp.where(ok[None, :], jnp.maximum(w, 0.0), 0.0)   # (N, C)


def query_vrls(scene, meta, maps, seg_o, seg_d, seg_len, cam_medium, channel,
               sampler, active, samples_per_query: int,
               strategy: str = 'cluster'):
    """VRL query: ``samples_per_query`` draws, each evaluated with the full
    Kulla sampling + transmittances. Selection strategies:
      * 'uniform' — the reference's no-acceleration default
        (ENoVRLAcceleration, vrl_map.h:133-211)
      * 'cluster' — Morton cluster-then-member importance sampling, the
        lightcut analog (vrl_lightcut.h); DEFAULT, like the thesis's
        headline configs (use_light_cut=true)
      * 'ris' — dense two-pass resampled importance over ALL VRLs
        ((N, V) sweeps; highest quality, ~2.5x cost)"""
    N = seg_o.shape[0]
    V = maps.vrl_o.shape[0]
    if V == 0:          # statically empty VRL map (target_vrls = 0)
        return jnp.zeros((N, 3)), sampler
    count = jnp.maximum(maps.vrl_count, 1)
    acc = jnp.zeros((N, 3))

    if strategy == 'cluster' and maps.clusters is not None and V >= 64:
        clusters: VRLClusters = maps.clusters
        sig_min = _sigma_min_bound(scene, meta, cam_medium)
        w = _cluster_weights(clusters, seg_o, seg_d, seg_len, sig_min)
        w_cdf = jnp.cumsum(w, axis=1)
        for _ in range(samples_per_query):
            u_c, sampler = sampler.next_1d()
            u_s, sampler = sampler.next_1d()
            u_m, sampler = sampler.next_1d()
            u1, sampler = sampler.next_1d()
            u2, sampler = sampler.next_1d()
            vi, inv_pdf, ok = sample_cluster_vrl(clusters, w, w_cdf,
                                                 seg_o, seg_d, seg_len,
                                                 u_c, u_s, u_m, V, sig_min)
            c, sampler = vrl_contrib(scene, meta, maps, seg_o, seg_d,
                                     seg_len, cam_medium, vi, u1, u2,
                                     channel, sampler, active & ok)
            acc = acc + c * jnp.where(ok, inv_pdf, 0.0)[:, None]
        return acc * (maps.vrl_scale / samples_per_query), sampler

    if strategy != 'ris' or V < 64:
        for _ in range(samples_per_query):
            u_sel, sampler = sampler.next_1d()
            u1, sampler = sampler.next_1d()
            u2, sampler = sampler.next_1d()
            vi = jnp.minimum((u_sel * count).astype(jnp.int32), count - 1)
            c, sampler = vrl_contrib(scene, meta, maps, seg_o, seg_d,
                                     seg_len, cam_medium, vi, u1, u2,
                                     channel, sampler, active)
            acc = acc + c
        scale = count.astype(jnp.float32) / samples_per_query \
            * maps.vrl_scale
        return acc * scale, sampler

    # --- pass 1: total selection weight per lane -------------------------
    # pad the index list with -1 sentinels so every chunk has a static size
    # (dynamic_slice CLAMPS out-of-range starts, which would double-count
    # the tail for V not a multiple of the chunk)
    ch = min(VRL_RIS_CHUNK, V)
    n_chunks = -(-V // ch)
    idx_all = jnp.concatenate(
        [jnp.arange(V, dtype=jnp.int32),
         jnp.full((n_chunks * ch - V,), -1, jnp.int32)])

    def wsum_body(c, acc_w):
        sl = jax.lax.dynamic_slice_in_dim(idx_all, c * ch, ch)
        w = _vrl_ris_weights(maps, seg_o, seg_d, seg_len, sl)
        return acc_w + w.sum(axis=1)

    w_total = jax.lax.fori_loop(0, n_chunks, wsum_body, jnp.zeros((N,)))
    ok_lane = active & (w_total > 0)

    for _ in range(samples_per_query):
        u_sel, sampler = sampler.next_1d()
        u1, sampler = sampler.next_1d()
        u2, sampler = sampler.next_1d()
        thresh = u_sel * w_total

        # --- pass 2: invert the running-sum "CDF" ------------------------
        def find_body(c, carry):
            run, sel_i, sel_w = carry
            sl = jax.lax.dynamic_slice_in_dim(idx_all, c * ch, ch)
            w = _vrl_ris_weights(maps, seg_o, seg_d, seg_len, sl)
            cw = jnp.cumsum(w, axis=1) + run[:, None]
            hit = (cw >= thresh[:, None]) & (sel_i < 0)[:, None]
            first = jnp.argmax(hit, axis=1)
            found = jnp.any(hit, axis=1)
            take = found & (sel_i < 0)
            sel_i = jnp.where(take, sl[first], sel_i)
            sel_w = jnp.where(take, _selch(w, first), sel_w)
            return cw[:, -1], sel_i, sel_w

        run0 = jnp.zeros((N,))
        _, sel_i, sel_w = jax.lax.fori_loop(
            0, n_chunks, find_body,
            (run0, jnp.full((N,), -1, jnp.int32), jnp.zeros((N,))))
        vi = jnp.maximum(sel_i, 0)
        lane_ok = ok_lane & (sel_i >= 0) & (sel_w > 0)
        c, sampler = vrl_contrib(scene, meta, maps, seg_o, seg_d, seg_len,
                                 cam_medium, vi, u1, u2, channel, sampler,
                                 lane_ok)
        # importance weight: 1 / p(vi) = w_total / w_vi
        inv_p = jnp.where(lane_ok, w_total * m.safe_rcp(sel_w), 0.0)
        acc = acc + c * inv_p[:, None]

    return acc * (maps.vrl_scale / samples_per_query), sampler


class VRLCamState(NamedTuple):
    sampler: Sampler
    ray: Ray
    throughput: jnp.ndarray
    result: jnp.ndarray
    depth: jnp.ndarray
    active: jnp.ndarray
    medium_idx: jnp.ndarray
    specular_chain: jnp.ndarray
    channel: jnp.ndarray
    it: jnp.ndarray


def _map_psum(x, meta):
    """All-reduce a photon/VRL map estimate over the map-parallel mesh
    axis. Outside shard_map (the single-chip path) this is the identity;
    under parallel.sharded_maps the maps shard along 'mp' and every
    map-derived estimate is a partial sum that rides ICI here (the
    renderer analog of tensor-parallel activations)."""
    ax = meta.iprop('map_psum_axis', None)
    return jax.lax.psum(x, ax) if ax else x


def make_sample(use_vrls: bool):
    """Build the camera-pass sample() for vrl (use_vrls) or photonmapper."""

    def sample(scene, meta, sampler: Sampler, ray: Ray, active=None,
               diff: bool = False, aux=None):
        maps: lighttrace.PhotonMaps = aux
        N = ray.o.shape[0]
        if active is None:
            active = jnp.ones((N,), bool)
        # camera depth is config-driven; iterations also cover null-BSDF
        # pass-throughs that don't advance depth, hence the +16 slack.
        # 'max_cam_iters' overrides for pathological scenes.
        max_depth = int(meta.iprop('max_depth', 512))
        max_iters = int(meta.iprop('max_cam_iters',
                                   min(max_depth + 16, 64)))
        spq = int(meta.iprop('samples_per_query', 2))
        use_direct = bool(meta.iprop('use_direct_illum', True)) or not use_vrls
        use_bre = bool(meta.iprop('use_bre', False))
        # VRL selection strategy. 'cluster' (the lightcut analog) is ON by
        # default, matching the thesis headline configs (use_light_cut=true,
        # cbox-nonlinear-homo-vrl.xml:13). 'ris' (dense resampled
        # importance over all VRLs) is the opt-in high-quality path; it is
        # also the TPU analog of rr_vrl / EDistanceRoulette
        # (vrl_map.h:133-211) since both cull by squared segment distance.
        if bool(meta.iprop('vrl_ris', meta.iprop('rr_vrl', False))):
            strategy = 'ris'
        elif bool(meta.iprop('use_light_cut', True)):
            strategy = 'cluster'
        else:
            strategy = 'uniform'
        nl_cam = bool(meta.iprop('use_non_linear_camera', True)) \
            and bool(meta.iprop('use_non_linear', True)) \
            and MEDIUM_TYPES['nonlinear'] in meta.medium_types
        max_bends = int(meta.iprop('max_nl_bends', 32))
        g_cap = int(meta.iprop('gather_points_cap', 64))

        sr = scene_radius_of(scene)
        r_global = meta.iprop('global_lookup_radius_relative', 0.05) * sr
        r_caustic = meta.iprop('caustic_lookup_radius_relative', 0.0125) * sr
        r_volume = meta.iprop('volume_lookup_radius_relative', 0.005) * sr

        u_ch, sampler = sampler.next_1d()
        channel = jnp.minimum((u_ch * 3).astype(jnp.int32), 2)

        st = VRLCamState(
            sampler=sampler, ray=ray, throughput=jnp.ones((N, 3)),
            result=jnp.zeros((N, 3)), depth=jnp.ones((N,), jnp.int32),
            active=active, medium_idx=jnp.full((N,), meta.camera_medium,
                                               jnp.int32),
            specular_chain=jnp.ones((N,), bool), channel=channel,
            it=jnp.int32(0))

        def cond(st):
            return jnp.any(st.active) & (st.it < max_iters)

        def body(st: VRLCamState):
            smp = st.sampler
            result = st.result
            throughput = st.throughput
            active = st.active & (st.depth < max_depth)

            si = isect.ray_intersect(scene, st.ray)
            smp = smp.count_rays(active)
            in_medium = active & (st.medium_idx >= 0) & si.valid

            # ---- medium leg: bend, gather photons, query VRLs -------------
            if nl_cam:
                bent, si_b = nl_mod.bend_ray(
                    scene, meta, Ray(st.ray.o, st.ray.d, st.ray.mint,
                                     jnp.full((N,), jnp.inf)),
                    st.medium_idx, in_medium, max_bends, stop_at_scene=True)
                # each bent segment cost one scene intersect in the marcher
                smp = smp.count_rays(jnp.where(in_medium, bent.count, 0))
                bent_hit = in_medium & si_b.valid
                si = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(
                        bent_hit.reshape(bent_hit.shape + (1,)
                                         * (new.ndim - 1)), new, old),
                    si_b, si)
            else:
                seg_o0 = st.ray.o[:, None, :]
                seg_d0 = st.ray.d[:, None, :]
                slen = jnp.where(in_medium, jnp.where(jnp.isfinite(si.t),
                                                      si.t, 0.0), 0.0)
                bent = nl_mod.BentRay(
                    seg_o=seg_o0, seg_d=seg_d0, seg_len=slen[:, None],
                    count=jnp.where(in_medium, 1, 0).astype(jnp.int32),
                    total=slen)

            # direct: volume photon gathering along the bent ray
            u_r, smp = smp.next_1d()
            radius = r_volume * m.lerp(0.75, 1.25, u_r)
            if use_direct and use_bre:
                # beam radiance estimate per bent segment (reference BRE)
                S = bent.seg_len.shape[1]

                def seg_body(s_i, carry):
                    acc, seg_tr, ismp = carry
                    so = jax.lax.dynamic_index_in_dim(bent.seg_o, s_i, 1,
                                                      False)
                    sd = jax.lax.dynamic_index_in_dim(bent.seg_d, s_i, 1,
                                                      False)
                    sl = jax.lax.dynamic_index_in_dim(bent.seg_len, s_i, 1,
                                                      False)
                    ok = in_medium & (s_i < bent.count) & (sl > 0)
                    est = _map_psum(photon_est.estimate_beam(
                        scene, meta, maps, so, sd, sl, -sd, st.medium_idx,
                        ok, radius, n_steps=g_cap), meta)
                    acc = acc + jnp.where(ok[:, None], seg_tr * est, 0.0)
                    tr_s, ismp = _medium_segment_tr(
                        scene, meta, ismp, so, sd, sl, st.medium_idx,
                        st.channel, ok)
                    return acc, seg_tr * tr_s, ismp

                direct_v, _, smp = jax.lax.fori_loop(
                    0, S, seg_body,
                    (jnp.zeros((N, 3)), jnp.ones((N, 3)), smp))
                result = result + throughput * direct_v * maps.vp_scale
            elif use_direct:
                def gather_body(g, carry):
                    acc, tr_run, last_t, ismp = carry
                    t_g = radius + 2.0 * radius * g
                    ok = in_medium & (t_g <= bent.total)
                    p_g = bent.at(t_g)
                    # transmittance from previous gather point (het lanes
                    # are never bent, so the straight camera direction is
                    # exact for them; homogeneous-like lanes use the
                    # closed form, which ignores the geometry)
                    step_tr, ismp = _medium_segment_tr(
                        scene, meta, ismp, bent.at(last_t), st.ray.d,
                        t_g - last_t, st.medium_idx, st.channel, ok)
                    tr_run = jnp.where(ok[:, None], tr_run * step_tr, tr_run)
                    est = _map_psum(photon_est.estimate_volume(
                        scene, meta, maps, p_g, -st.ray.d, st.medium_idx,
                        ok, radius), meta)
                    acc = acc + jnp.where(ok[:, None], tr_run * est, 0.0)
                    last_t = jnp.where(ok, t_g, last_t)
                    return acc, tr_run, last_t, ismp

                acc0 = (jnp.zeros((N, 3)), jnp.ones((N, 3)),
                        jnp.zeros((N,)), smp)
                direct_v, _, _, smp = jax.lax.fori_loop(0, g_cap,
                                                        gather_body, acc0)
                result = result + throughput * direct_v * maps.vp_scale

            # indirect: VRL query per bent segment. A while_loop over the
            # LIVE max segment count (not a Python-unrolled range(S)): the
            # unrolled form compiled 32 copies of the whole query (~170s
            # compile) and paid every masked segment at full price. The
            # trip count is identical within each map-parallel psum group
            # (rays are dp-sharded, mp-replicated), so the in-loop psum is
            # safe.
            if use_vrls:
                max_cnt = jnp.max(jnp.where(in_medium, bent.count, 0))

                def vq_cond(c):
                    return c[0] < max_cnt

                def vq_body(c):
                    s_i, vrl_acc, seg_tr, ismp = c
                    so = jax.lax.dynamic_index_in_dim(bent.seg_o, s_i, 1,
                                                      False)
                    sd = jax.lax.dynamic_index_in_dim(bent.seg_d, s_i, 1,
                                                      False)
                    sl = jax.lax.dynamic_index_in_dim(bent.seg_len, s_i, 1,
                                                      False)
                    seg_ok = in_medium & (s_i < bent.count) & (sl > 0)
                    q, ismp = query_vrls(
                        scene, meta, maps, so, sd, sl, st.medium_idx,
                        st.channel, ismp, seg_ok, spq, strategy=strategy)
                    q = _map_psum(q, meta)
                    vrl_acc = vrl_acc + jnp.where(seg_ok[:, None],
                                                  seg_tr * q, 0.0)
                    tr_s, ismp = _medium_segment_tr(
                        scene, meta, ismp, so, sd, sl, st.medium_idx,
                        st.channel, seg_ok)
                    return (s_i + 1, vrl_acc, seg_tr * tr_s, ismp)

                _, vrl_acc, _, smp = jax.lax.while_loop(
                    vq_cond, vq_body,
                    (jnp.int32(0), jnp.zeros((N, 3)), jnp.ones((N, 3)),
                     smp))
                result = result + throughput * vrl_acc

            # camera attenuation through the medium (het lanes are never
            # bent, so the straight ray is their exact geometry)
            thr_med, smp = _medium_segment_tr(
                scene, meta, smp, st.ray.o, st.ray.d, bent.total,
                st.medium_idx, st.channel, in_medium)
            throughput = throughput * thr_med

            # ---- surface leg ---------------------------------------------
            active_surface = active & si.valid
            hit_em = active_surface & st.specular_chain & (si.emitter_idx >= 0)
            le = emitter_mod.eval_hit(scene, meta, si, hit_em)
            result = result + jnp.where(hit_em[:, None], throughput * le,
                                        0.0)
            esc = active & ~si.valid & st.specular_chain
            result = result + jnp.where(
                esc[:, None], throughput * emitter_mod.eval_env(
                    scene, meta, st.ray.d, esc), 0.0)
            # emitter surfaces terminate (vrl.cpp:664-665)
            active_surface = active_surface & (si.emitter_idx < 0)

            flags = bsdf_mod.flags_of(scene, si)
            is_smooth = (flags & F_SMOOTH) > 0
            gather_here = active_surface & is_smooth
            est_c = _map_psum(photon_est.estimate_surface(
                scene, meta, maps, si, gather_here, r_caustic, True), meta)
            est_g = _map_psum(photon_est.estimate_surface(
                scene, meta, maps, si, gather_here, r_global, False), meta)
            result = result + jnp.where(gather_here[:, None],
                                        throughput * (est_c + est_g), 0.0)
            # smooth surfaces terminate (vrl.cpp:673-679)
            cont = active_surface & ~gather_here

            u1b, smp = smp.next_1d()
            u2b, smp = smp.next_2d()
            bs, b_weight = bsdf_mod.sample(scene, meta, si, u1b, u2b)
            throughput = jnp.where(cont[:, None], throughput * b_weight,
                                   throughput)
            wo_world = si.to_world(bs.wo)
            non_null = cont & ~bs.null
            depth = jnp.where(non_null, st.depth + 1, st.depth)
            specular_chain = st.specular_chain | (non_null & bs.delta)
            specular_chain = specular_chain & ~(cont & ~bs.delta & ~bs.null)

            new_medium = jnp.where(cont & si.is_medium_transition(),
                                   si.target_medium(wo_world),
                                   st.medium_idx)
            new_ray = Ray(o=jnp.where(cont[:, None], si.p, st.ray.o),
                          d=jnp.where(cont[:, None], wo_world, st.ray.d),
                          mint=jnp.full((N,), m.RayEpsilon),
                          maxt=jnp.full((N,), jnp.inf))

            alive = cont & (bs.pdf > 0) \
                & jnp.any(throughput != 0, axis=-1)
            return VRLCamState(
                sampler=smp, ray=new_ray, throughput=throughput,
                result=result, depth=depth, active=alive,
                medium_idx=new_medium, specular_chain=specular_chain,
                channel=st.channel, it=st.it + 1)

        st = jax.lax.while_loop(cond, body, st)
        return st.result, jnp.ones((N,), bool), st.sampler

    return sample


sample = make_sample(use_vrls=True)
