"""Polarized BSDF layer: Mueller-matrix weights over the wavefront.

TPU-native analog of the reference's ``is_polarized_v<Spectrum>`` BSDF
arms: the scalar dispatch in ``bsdf/__init__.py`` stays the source of
directions / pdfs / unpolarized magnitudes, and this layer upgrades the
returned weight to a world-frame Mueller matrix ``(N, 3, 4, 4)`` whose
(0, 0) entry equals the unpolarized RGB weight.

Polarization-aware types, matching the reference exactly:
  * dielectric        — specular R/T Mueller (dielectric.cpp:250-287)
  * conductor         — complex-IOR specular reflection (conductor.cpp:242-264)
  * roughconductor    — same about the microfacet normal
                        (roughconductor.cpp:245-264, :315-334)
  * polarizer/retarder/circular — true optical elements with the Korger
                        tilted-element axes (polarizer.cpp:94-127,
                        retarder.cpp:85-118, circular.cpp:81-112)
  * pplastic          — two-lobe Mueller eval (pplastic.cpp:232-301)
All other types depolarize (``unpolarized<Spectrum>``), exactly like the
reference (diffuse.cpp:103, roughdielectric.cpp:309, thindielectric.cpp:149).

Deviation (documented): null/mask pass-through lanes keep polarization
(identity Mueller) instead of the reference's depolarizer (null.cpp:56) —
straight-through transmission does not physically depolarize, and this
keeps polarized volpath null-walks meaningful. Twosided backface hits of
aware types reuse the mirrored local frame of the scalar dispatch; the
handedness flip of S3 there is accepted (twosided conductors viewed from
behind).

Mueller convention (mueller.h:247): a matrix maps Stokes vectors defined
in ``stokes_basis(in_forward)`` to ``stokes_basis(out_forward)`` where the
forward directions point along the propagation of light. In radiance
transport light arrives along ``-wo`` and leaves along ``+si.wi``.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m
from ..core import frame as fr
from ..core import microfacet as mf
from ..core import mueller as mu
from ..core.fresnel import fresnel_dielectric
from ..scene.types import BSDF_TYPES, F_TWOSIDED
from . import RADIANCE, eval as eval_unpol, pdf as pdf_unpol, \
    sample as sample_unpol, _maybe_flip

_AWARE_SCALAR = ('dielectric', 'polarizer', 'retarder', 'circular')
_AWARE_RGB = ('conductor', 'roughconductor')
_AWARE = _AWARE_SCALAR + _AWARE_RGB + ('pplastic', 'measured_polarized')


def has_polarized_types(meta) -> bool:
    """True if the scene contains any polarization-aware BSDF."""
    return any(BSDF_TYPES[t] in meta.bsdf_types for t in _AWARE)


def _safe_dir(v, fallback):
    """normalize(v), falling back where v is (near-)degenerate."""
    n = m.norm(v)
    ok = n > 1e-6
    safe = v / jnp.maximum(n, 1e-12)[..., None]
    return jnp.where(ok[..., None], safe, fallback)


def _norm00(M):
    """Normalize a Mueller matrix by its (0,0) entry so the caller can
    scale it with the (RGB) unpolarized weight; degenerate matrices
    collapse to the depolarizer."""
    m00 = M[..., 0:1, 0:1]
    ok = m00 > 1e-12
    Mn = jnp.where(ok, M / jnp.where(ok, m00, 1.0), 0.0)
    return jnp.where(ok, Mn, mu.depolarizer(jnp.ones(M.shape[:-2])))


def _rot_to_implicit(M, axis_n, wo_hat, wi_hat):
    """Rotate a Mueller matrix whose s-axis lies perpendicular to the
    plane of reflection about ``axis_n`` into the implicit Stokes bases of
    -wo_hat / wi_hat (the common tail of all specular arms)."""
    in_fwd, out_fwd = -wo_hat, wi_hat
    in_basis = mu.stokes_basis(in_fwd)
    out_basis = mu.stokes_basis(out_fwd)
    s_in = _safe_dir(jnp.cross(axis_n, in_fwd), in_basis)
    s_out = _safe_dir(jnp.cross(axis_n, out_fwd), out_basis)
    return mu.rotate_mueller_basis(M, in_fwd, s_in, in_basis,
                                   out_fwd, s_out, out_basis)


def _element_mueller(P, btype, wi_loc, mode):
    """Mueller matrix (normalized by its own M00) of the optical elements
    polarizer/retarder/circular for the straight-through lobe."""
    N = wi_loc.shape[0]
    theta = P[:, 3]
    forward = wi_loc if mode == RADIANCE else -wi_loc
    is_pol = btype == BSDF_TYPES['polarizer']
    is_ret = btype == BSDF_TYPES['retarder']
    # retarder: cosine falloff of the phase with incidence (retarder.cpp:93)
    delta = P[:, 4] * jnp.abs(fr.cos_theta(wi_loc))
    M_pol = mu.linear_polarizer(jnp.ones((N,)))
    M_ret = mu.linear_retarder(delta)
    # circular: linear polarizer + quarter-wave plate at +-45 deg
    # (circular.cpp:86-90); P[:,4] holds handedness +1 (right) / -1 (left)
    qwp_rot = jnp.where(P[:, 4] < 0, 3.0 * jnp.pi / 4.0, jnp.pi / 4.0)
    M_cir = mu.rotated_element(qwp_rot, mu.linear_retarder(
        jnp.full((N,), 0.5 * jnp.pi))) @ M_pol
    M = jnp.where(is_pol[:, None, None], M_pol,
                  jnp.where(is_ret[:, None, None], M_ret, M_cir))
    M = mu.rotated_element(theta, M)
    # tilted-element effective axes (Korger et al. 2013; polarizer.cpp:116)
    a_axis = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), forward.shape)
    eff_a = _safe_dir(a_axis - m.dot(a_axis, forward)[:, None] * forward,
                      mu.stokes_basis(forward))
    eff_t = _safe_dir(jnp.cross(forward, eff_a), mu.stokes_basis(forward))
    M = mu.rotate_mueller_basis_collinear(M, forward, eff_t,
                                          mu.stokes_basis(forward))
    return _norm00(M)


def _pplastic_mueller_eval(P, wi_loc, wo_loc, mode):
    """Full (N, 3, 4, 4) polarized pplastic eval (pplastic.cpp:232-301):
    GGX specular reflection Mueller + refract-in / depolarized subsurface /
    refract-out diffuse Mueller."""
    cos_i, cos_o = fr.cos_theta(wi_loc), fr.cos_theta(wo_loc)
    act = (cos_i > 0) & (cos_o > 0)
    eta = P[:, 3] / P[:, 4]
    ax = ay = P[:, 9]
    wo_hat = wo_loc if mode == RADIANCE else wi_loc
    wi_hat = wi_loc if mode == RADIANCE else wo_loc
    # --- specular lobe -----------------------------------------------------
    H = _safe_dir(wi_loc + wo_loc, jnp.asarray([0.0, 0.0, 1.0]))
    D = mf.ggx_d(H, ax, ay)
    G = mf.smith_g1(wi_loc, H, ax, ay) * mf.smith_g1(wo_loc, H, ax, ay)
    F = mu.specular_reflection(m.dot(wo_hat, H), eta)
    F = _rot_to_implicit(F, H, wo_hat, wi_hat)
    val_spec = D * G / (4.0 * jnp.maximum(cos_i, 1e-9))
    spec = (P[:, 6:9] * val_spec[:, None])[:, :, None, None] \
        * F[:, None, :, :]
    # --- diffuse lobe ------------------------------------------------------
    To = mu.specular_transmission(jnp.abs(fr.cos_theta(wo_hat)), eta)
    diff0 = mu.depolarizer(jnp.ones((wi_loc.shape[0],)))
    # refract wi_hat to the inside; Ti transmits back out (eta reversed).
    # In the local frame |cos_theta(refract(wi))| is just |cos_theta_t|
    # (fresnel.h refract: z component = cos_theta_t), so the inside
    # direction itself is not needed (pplastic.cpp:282-284).
    n_loc = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), wi_loc.shape)
    _, cos_t_i, _, _ = fresnel_dielectric(cos_i, eta)
    Ti = mu.specular_transmission(jnp.abs(cos_t_i), 1.0 / eta)
    Mdiff = Ti @ diff0 @ To
    Mdiff = _rot_to_implicit(Mdiff, n_loc, wo_hat, wi_hat)
    diff = (P[:, 0:3] * (m.InvPi * cos_o)[:, None])[:, :, None, None] \
        * Mdiff[:, None, :, :]
    out = spec + diff
    return jnp.where(act[:, None, None, None], out, 0.0)


def _to_world_mueller(si, M, in_fwd_local, out_fwd_local):
    """interaction.h:275 — re-express a local-frame Mueller matrix in the
    implicit world-frame Stokes bases. M: (N, C, 4, 4), rotations are
    channel-independent."""
    f = si.sh_frame
    in_w = f.to_world(in_fwd_local)
    out_w = f.to_world(out_fwd_local)
    R_in = mu.rotate_stokes_basis(
        in_w, f.to_world(mu.stokes_basis(in_fwd_local)),
        mu.stokes_basis(in_w))
    R_out = mu.rotate_stokes_basis(
        out_w, f.to_world(mu.stokes_basis(out_fwd_local)),
        mu.stokes_basis(out_w))
    return R_out[:, None] @ M @ jnp.swapaxes(R_in, -1, -2)[:, None]


def _polarize_weight(scene, meta, si, wo_loc, w_unpol, mode,
                     null_lane=None, pdf_val=None):
    """Upgrade an unpolarized RGB weight to (N, 3, 4, 4) world Mueller."""
    btype = scene.bsdfs.type[si.bsdf_idx]
    flags = scene.bsdfs.flags[si.bsdf_idx]
    P = scene.bsdfs.params[si.bsdf_idx]
    wi_loc, wo_l = _maybe_flip(flags, si.wi, wo_loc)
    N = wi_loc.shape[0]
    wo_hat = wo_l if mode == RADIANCE else wi_loc
    wi_hat = wi_loc if mode == RADIANCE else wo_l
    n_loc = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), wi_loc.shape)

    # default: depolarizer (C-independent)
    Mhat = jnp.broadcast_to(mu.depolarizer(jnp.ones((N,)))[:, None],
                            (N, 3, 4, 4))
    if null_lane is not None:
        # pass-through lanes keep polarization (identity; see module doc)
        eye = jnp.broadcast_to(jnp.eye(4), (N, 3, 4, 4))
        Mhat = jnp.where(null_lane[:, None, None, None], eye, Mhat)

    def put(sel, Mtype):
        nonlocal Mhat
        if Mtype.ndim == 3:
            Mtype = jnp.broadcast_to(Mtype[:, None], (N, 3, 4, 4))
        Mhat = jnp.where(sel[:, None, None, None], Mtype, Mhat)

    types = meta.bsdf_types
    if BSDF_TYPES['dielectric'] in types:
        eta = P[:, 0] / P[:, 1]
        coh = fr.cos_theta(wo_hat)
        transmitted = fr.cos_theta(wi_loc) * fr.cos_theta(wo_l) < 0
        R = _norm00(mu.specular_reflection(coh, eta))
        T = _norm00(mu.specular_transmission(coh, eta))
        Md = jnp.where(transmitted[:, None, None], T, R)
        put(btype == BSDF_TYPES['dielectric'],
            _rot_to_implicit(Md, n_loc, wo_hat, wi_hat))
    if BSDF_TYPES['conductor'] in types:
        Mc = _norm00(mu.specular_reflection_conductor(
            fr.cos_theta(wo_hat), P[:, 0:3], P[:, 3:6]))  # (N, 3, 4, 4)
        put(btype == BSDF_TYPES['conductor'],
            _rot_to_implicit(Mc, n_loc[:, None], wo_hat[:, None],
                             wi_hat[:, None]))
    if BSDF_TYPES['roughconductor'] in types:
        H = _safe_dir(wi_loc + wo_l, n_loc)
        Mr = _norm00(mu.specular_reflection_conductor(
            m.dot(wo_hat, H), P[:, 0:3], P[:, 3:6]))
        put(btype == BSDF_TYPES['roughconductor'],
            _rot_to_implicit(Mr, H[:, None], wo_hat[:, None],
                             wi_hat[:, None]))
    el_codes = [BSDF_TYPES[t] for t in ('polarizer', 'retarder', 'circular')
                if BSDF_TYPES[t] in types]
    if el_codes:
        sel = jnp.zeros((N,), bool)
        for c in el_codes:
            sel = sel | (btype == c)
        put(sel, _element_mueller(P, btype, wi_loc, mode))

    weight = w_unpol[:, :, None, None] * Mhat

    if BSDF_TYPES['pplastic'] in types:
        # direct two-lobe Mueller eval; divided by the pdf when this is a
        # sampling weight
        Mpp = _pplastic_mueller_eval(P, wi_loc, wo_l, mode)
        if pdf_val is not None:
            Mpp = Mpp * m.safe_rcp(pdf_val)[:, None, None, None]
        weight = jnp.where((btype == BSDF_TYPES['pplastic'])
                           [:, None, None, None], Mpp, weight)

    if BSDF_TYPES['measured_polarized'] in types:
        # direct measured Mueller eval (measured_polarized.cpp:209-292);
        # divided by the pdf when this is a sampling weight
        from . import measured_pol as mp_mod
        slot = P[:, 0].astype(jnp.int32)
        for k in range(len(scene.measured_pol)):
            Mk = mp_mod.eval_mueller_world_local(
                scene.measured_pol[k], P, wi_loc, wo_l, mode == RADIANCE)
            if pdf_val is not None:
                Mk = Mk * m.safe_rcp(pdf_val)[:, None, None, None]
            sel = (btype == BSDF_TYPES['measured_polarized']) & (slot == k)
            weight = jnp.where(sel[:, None, None, None], Mk, weight)

    return _to_world_mueller(si, weight, -wo_hat, wi_hat)


def spectral_conductor_terms(scene, meta, si, wo_loc, lam, mode=RADIANCE,
                             null_lane=None):
    """Fused per-hero-wavelength conductor terms for the
    spectral_polarized integrator: ONE complex-IOR curve gather +
    interpolation yields both
      * ``ratio (N, L)`` — F(lam)/upsample(F_rgb) magnitude correction
        (== bsdf.spectral_fresnel_ratio), and
      * ``(use (N,), Mw (N, H, 4, 4))`` — the normalized per-lambda
        Mueller structure (== spectral_conductor_structure).
    Resolves normalmap/bumpmap wrapper rows (like spectral_fresnel_ratio
    does via _perturb_si) so wrapped conductors get per-lambda structure
    too, and blendbsdf wrappers: blend lanes resolve BOTH children,
    compute each child's per-lambda Fresnel/Mueller, and mix them with
    the blend weight x each child's upsampled RGB eval — the analog of
    the reference spectral build where blendbsdf.cpp:eval sums child
    evals that each carry fresnel_conductor at the ray's wavelengths.
    Returns None when the scene carries no tabulated curves."""
    if not getattr(meta, 'has_conductor_spd', False):
        return None
    types = meta.bsdf_types
    if (BSDF_TYPES['conductor'] not in types
            and BSDF_TYPES['roughconductor'] not in types):
        return None
    from . import _has_perturb, _perturb_si, _blend_weight
    from ..core.fresnel import fresnel_conductor
    from ..core import spectral as sp
    from ..ops.gather import take_many, take_rows
    if _has_perturb(meta):
        f0 = si.sh_frame
        si = _perturb_si(scene, meta, si)
        wo_loc = si.sh_frame.to_local(f0.to_world(wo_loc))
    btype, flags, P = take_many(
        [scene.bsdfs.type, scene.bsdfs.flags, scene.bsdfs.params],
        si.bsdf_idx)

    def row_terms(btype, flags, P):
        """(use, F_l, F_up, Mw) for one per-lane row assignment."""
        wi_loc, wo_l = _maybe_flip(flags, si.wi, wo_loc)
        wo_hat = wo_l if mode == RADIANCE else wi_loc
        wi_hat = wi_loc if mode == RADIANCE else wo_l
        n_loc = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]),
                                 wi_loc.shape)
        is_rough = btype == BSDF_TYPES['roughconductor']
        is_cond = (btype == BSDF_TYPES['conductor']) | is_rough
        sid = P[:, 13].astype(jnp.int32) - 1
        use = is_cond & (sid >= 0)

        H = _safe_dir(wi_loc + wo_l, n_loc)
        axis = jnp.where(is_rough[:, None], H, n_loc)
        # NOTE: for smooth (delta) conductors this cosine is only
        # meaningful when wo is the mirror direction; on NEE lanes it is
        # not, but those lanes are neutralized by the eval m00 == 0 of
        # the delta lobe — do not treat the structure as valid there in
        # a future refactor.
        cosm = jnp.where(is_rough, m.dot(wo_hat, H), fr.cos_theta(wo_hat))

        # ONE curve gather + CIE interpolation feeds both terms
        C = scene.conductor_spd.shape[0]
        K = scene.conductor_spd.shape[-1]
        curves = take_rows(scene.conductor_spd.reshape(C, 2 * K),
                           jnp.maximum(sid, 0)).reshape(-1, 2, K)
        eta_l = sp.cie_table_eval(curves[:, 0, :], lam)   # (N, Hλ)
        k_l = sp.cie_table_eval(curves[:, 1, :], lam)

        # magnitude ratio terms (spectral_fresnel_ratio semantics:
        # half-vector cosine, abs)
        h_r = m.normalize(wi_loc + wo_l)
        cos_h = jnp.abs(m.dot(wi_loc, h_r))
        F_l = fresnel_conductor(cos_h, eta_l, k_l)                # (N, L)
        F_rgb = fresnel_conductor(cos_h, P[:, 0:3], P[:, 3:6])    # (N, 3)
        F_up = sp.upsample_weight(F_rgb, lam)                     # (N, L)

        # normalized per-lambda Mueller structure
        Mc = _norm00(mu.specular_reflection_conductor(cosm, eta_l, k_l))
        Mc = _rot_to_implicit(Mc, axis[:, None], wo_hat[:, None],
                              wi_hat[:, None])
        Mw = _to_world_mueller(si, Mc, -wo_hat, wi_hat)
        return use, F_l, F_up, F_rgb, Mw

    use, F_l, F_up, _, Mw = row_terms(btype, flags, P)
    ratio = jnp.where(use[:, None] & (F_up > 1e-6),
                      F_l / jnp.maximum(F_up, 1e-6), 1.0)

    _BLEND = BSDF_TYPES.get('blendbsdf')
    if _BLEND in types:
        from . import eval as _bsdf_eval
        is_b = btype == _BLEND
        ca = P[:, 0].astype(jnp.int32)
        cb = P[:, 1].astype(jnp.int32)
        bta, fla, Pa = take_many(
            [scene.bsdfs.type, scene.bsdfs.flags, scene.bsdfs.params], ca)
        btb, flb, Pb = take_many(
            [scene.bsdfs.type, scene.bsdfs.flags, scene.bsdfs.params], cb)
        ua, Fla, Fua, Frgba, Ma = row_terms(bta, fla, Pa)
        ub, Flb, Fub, Frgbb, Mb = row_terms(btb, flb, Pb)
        wgt = _blend_weight(scene, meta, si, P)
        sh_a, sh_b = (1.0 - wgt), wgt
        # child RGB evals weight both the ratio and the structure mix
        # (blendbsdf.cpp eval: (1-w) f_a + w f_b); upsample each child
        # contribution and the blend separately — upsample_weight is not
        # linear in RGB, so the denominator uses the actual blend
        fa = _bsdf_eval(scene, meta, si._replace(bsdf_idx=ca), wo_loc,
                        mode, None, 1) * sh_a[:, None]
        fb = _bsdf_eval(scene, meta, si._replace(bsdf_idx=cb), wo_loc,
                        mode, None, 1) * sh_b[:, None]
        up_a = sp.upsample_weight(fa, lam)                        # (N, L)
        up_b = sp.upsample_weight(fb, lam)
        up_blend = sp.upsample_weight(fa + fb, lam)
        r_a = jnp.where(ua[:, None] & (Fua > 1e-6),
                        Fla / jnp.maximum(Fua, 1e-6), 1.0)
        r_b = jnp.where(ub[:, None] & (Fub > 1e-6),
                        Flb / jnp.maximum(Fub, 1e-6), 1.0)
        # SMOOTH (delta) conductor children have eval == 0 — their
        # magnitude at the lanes where the structure is consumed (the
        # sampled mirror direction) is share x the true per-lambda
        # Fresnel, and their upsampled-RGB counterpart share x up(F_rgb).
        # The delta terms apply ONLY on mirror-aligned lanes: an NEE lane
        # evaluating blend(diffuse, smooth conductor) has a nonzero
        # diffuse eval, and folding the conductor's per-lambda Fresnel
        # into its ratio would bias the diffuse-only contribution. The
        # sample path emits wo == (-wi.x, -wi.y, wi.z) exactly (a
        # condition invariant under the _maybe_flip sign convention), so
        # alignment identifies consumed-delta lanes without integrator
        # plumbing; NEE directions hit it with probability zero.
        mir = jnp.stack([-si.wi[:, 0], -si.wi[:, 1], si.wi[:, 2]], -1)
        mirror_lane = m.dot(wo_loc, mir) > 1.0 - 1e-5
        da = ua & (bta == BSDF_TYPES['conductor']) & mirror_lane
        db = ub & (btb == BSDF_TYPES['conductor']) & mirror_lane
        mag_a = up_a * r_a + jnp.where(da[:, None],
                                       sh_a[:, None] * Fla, 0.0)
        mag_b = up_b * r_b + jnp.where(db[:, None],
                                       sh_b[:, None] * Flb, 0.0)
        den = up_blend \
            + jnp.where(da[:, None], sh_a[:, None] * Fua, 0.0) \
            + jnp.where(db[:, None], sh_b[:, None] * Fub, 0.0)
        ratio_bl = jnp.where(den > 1e-9,
                             (mag_a + mag_b) / jnp.maximum(den, 1e-9),
                             1.0)
        any_cond = is_b & (ua | ub)
        ratio = jnp.where(any_cond[:, None], ratio_bl, ratio)
        # Mueller mix: per-lambda child magnitudes x child structure;
        # non-conductor children depolarize (diffuse.cpp:103 analog)
        Nl = up_a.shape[0]
        dep = jnp.broadcast_to(
            mu.depolarizer(jnp.ones((Nl,)))[:, None],
            Mw.shape)
        Ma = jnp.where(ua[:, None, None, None], Ma, dep)
        Mb = jnp.where(ub[:, None, None, None], Mb, dep)
        Mmix = _norm00(mag_a[..., None, None] * Ma
                       + mag_b[..., None, None] * Mb)
        Mw = jnp.where(any_cond[:, None, None, None], Mmix, Mw)
        use = use | any_cond

    use_struct = use if null_lane is None else use & ~null_lane
    return ratio, use_struct, Mw


def spectral_conductor_structure(scene, meta, si, wo_loc, lam, mode=RADIANCE,
                                 null_lane=None):
    """Per-hero-wavelength conductor Mueller structure (normalized,
    m00 == 1) in world Stokes bases — see spectral_conductor_terms, which
    this delegates to (kept for callers that don't need the magnitude
    ratio). Returns (use, Mw) or None."""
    out = spectral_conductor_terms(scene, meta, si, wo_loc, lam, mode,
                                   null_lane)
    if out is None:
        return None
    _, use, Mw = out
    return use, Mw


def eval_pol(scene, meta, si, wo_loc, mode=RADIANCE):
    """Polarized f(wi, wo)*cos: (N, 3, 4, 4) world-frame Mueller whose
    (0, 0) entries reproduce ``bsdf.eval``."""
    f = eval_unpol(scene, meta, si, wo_loc, mode)
    return _polarize_weight(scene, meta, si, wo_loc, f, mode)


def sample_pol(scene, meta, si, u1, u2, mode=RADIANCE):
    """Polarized BSDF sampling: (bs, weight Mueller (N, 3, 4, 4))."""
    bs, w = sample_unpol(scene, meta, si, u1, u2, mode)
    M = _polarize_weight(scene, meta, si, bs.wo, w, mode,
                         null_lane=bs.null, pdf_val=bs.pdf)
    return bs, M
