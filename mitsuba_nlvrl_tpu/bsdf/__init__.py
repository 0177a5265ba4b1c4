"""BSDF evaluation / sampling with masked type dispatch.

TPU-native replacement for the reference's per-lane virtual BSDF calls
(src/bsdfs/*.cpp via BSDFPtr): parameters live in a packed (B, 16) table,
each lane gathers its row, and every BSDF type present in the scene
(statically known via SceneMeta.bsdf_types) is evaluated masked over the
whole wavefront, then selected. With the handful of types a scene uses this
is cheaper on the VPU than gather-heavy lane reshuffling.

Conventions follow the reference bsdf.h:146: directions are in the local
shading frame (z = normal), ``eval`` returns f * |cos_theta_o|, ``sample``
returns (sample_record, weight = f * cos / pdf). Transport mode matters for
refraction radiance scaling (mode 0 = radiance, 1 = importance).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from ..core import math as m
from ..core import frame as fr
from ..core import fresnel as fresnel_mod
from ..core import microfacet as mf
from ..core import warp
from ..core.fresnel import (fresnel_dielectric, fresnel_conductor,
                            reflect_local, refract_local)
from ..scene.types import (BSDF_TYPES, F_DELTA, F_NULL, F_TRANSMISSION,
                           F_SMOOTH, F_TWOSIDED, F_MASK, BSDF_NPARAM)

RADIANCE = 0
IMPORTANCE = 1


class BSDFSample(NamedTuple):
    wo: jnp.ndarray      # (N, 3) sampled outgoing dir, local frame
    pdf: jnp.ndarray     # (N,)
    eta: jnp.ndarray     # (N,) relative IOR of the sampled event
    delta: jnp.ndarray   # (N,) bool — sampled a Dirac lobe
    null: jnp.ndarray    # (N,) bool — sampled the null pass-through lobe


# --- parameter packing (host side, used by scene builder) -------------------

def _iorf(v):
    """Named-IOR-aware float coercion (reference ior.h lookup_ior)."""
    if isinstance(v, str):
        from ..scene.ior_data import lookup_ior
        return float(lookup_ior(v))
    return float(v)


def pack_params(props: dict) -> Tuple[int, int, list]:
    """Return (type_code, flags, params[BSDF_NPARAM]) for a bsdf dict."""
    t = props['type']
    p = [0.0] * BSDF_NPARAM
    # spatially-varying alpha / specular_reflectance (slots 16/17, id+1
    # encoded so the all-zeros default means "untextured"); the builder
    # registers the texture dicts and passes the ids in _alpha_tex/_spec_tex
    p[16] = float(props.get('_alpha_tex', -1)) + 1.0
    p[17] = float(props.get('_spec_tex', -1)) + 1.0
    twosided = 0
    if t == 'twosided':
        inner = props.get('bsdf', {'type': 'diffuse'})
        code, flags, p = pack_params(inner)
        return code, flags | F_TWOSIDED, p
    if t == 'mask':
        # opacity-masked wrapper (reference src/bsdfs/mask.cpp): the nested
        # bsdf's row with opacity in slot 14; dispatch handles pass-through.
        # Textured opacity (mask.cpp:55 holds a Texture) rides slot 18 as
        # id+1 and rewrites slot 14 per lane in _apply_param_textures.
        inner = props.get('bsdf', {'type': 'diffuse'})
        code, flags, p = pack_params(inner)
        op = props.get('opacity', 0.5)
        if isinstance(op, dict):
            p[14] = 0.5      # per-lane rewrite from the slot-18 texture
        else:
            p[14] = float(op if isinstance(op, (int, float)) else
                          sum(op) / len(op))
        p[18] = float(props.get('_opacity_tex', -1)) + 1.0
        return code, flags | F_MASK | F_NULL | F_TRANSMISSION, p

    def rgb(key, default):
        v = props.get(key, default)
        if isinstance(v, dict):
            # textured param: the builder registered a texture and set
            # _texture_id; the packed value is only the untextured fallback
            return [0.5, 0.5, 0.5]
        if isinstance(v, (int, float)):
            return [float(v)] * 3
        return [float(x) for x in v]

    def scalar(key, default):
        v = props.get(key, default)
        return float(default) if isinstance(v, dict) else float(v)

    def conductor_eta_k():
        """eta/k from explicit rgb props or a named material's tabulated
        complex-IOR spectra (conductor.cpp 'material' prop; default
        'none' = perfect mirror). Named materials also register their full
        curves for per-wavelength Fresnel in the spectral variants
        (slot 13 = curve id + 1; 0 = RGB-only)."""
        mat = props.get('material')
        if isinstance(mat, str):
            from ..scene.ior_data import conductor_rgb, conductor_spd_id
            pair = conductor_rgb(mat)
            if pair is None:
                print(f"warning: conductor material {mat!r} has no "
                      f".spd data; keeping eta/k defaults")
            else:
                sid = conductor_spd_id(mat)
                if sid is not None:
                    p[13] = float(sid + 1)
                return list(pair[0]), list(pair[1])
        return rgb('eta', 0.0), rgb('k', 1.0)

    if t == 'diffuse':
        p[0:3] = rgb('reflectance', 0.5)
        p[15] = float(props.get('_texture_id', -1))
        return BSDF_TYPES[t], F_SMOOTH | twosided, p
    if t == 'conductor':
        p[0:3], p[3:6] = conductor_eta_k()
        p[6:9] = rgb('specular_reflectance', 1.0)
        return BSDF_TYPES[t], F_DELTA, p
    if t == 'roughconductor':
        p[0:3], p[3:6] = conductor_eta_k()
        p[6:9] = rgb('specular_reflectance', 1.0)
        a = scalar('alpha', 0.1)
        p[9] = scalar('alpha_u', a)
        p[10] = scalar('alpha_v', a)
        p[11] = 0.0 if props.get('distribution', 'ggx') == 'ggx' else 1.0
        return BSDF_TYPES[t], F_SMOOTH, p
    if t in ('dielectric', 'thindielectric'):
        p[0] = _iorf(props.get('int_ior', 1.5046))   # bk7
        p[1] = _iorf(props.get('ext_ior', 1.000277))  # air
        p[2:5] = rgb('specular_reflectance', 1.0)
        p[5:8] = rgb('specular_transmittance', 1.0)
        return BSDF_TYPES[t], F_DELTA | F_TRANSMISSION, p
    if t == 'roughdielectric':
        p[0] = _iorf(props.get('int_ior', 1.5046))
        p[1] = _iorf(props.get('ext_ior', 1.000277))
        p[2:5] = rgb('specular_reflectance', 1.0)
        p[5:8] = rgb('specular_transmittance', 1.0)
        a = scalar('alpha', 0.1)
        p[9] = scalar('alpha_u', a)
        p[10] = scalar('alpha_v', a)
        return BSDF_TYPES[t], F_SMOOTH | F_TRANSMISSION, p
    if t == 'null':
        return BSDF_TYPES[t], F_DELTA | F_NULL | F_TRANSMISSION, p
    if t in ('polarizer', 'retarder', 'circular'):
        # polarization optical elements. In unpolarized (RGB) transport the
        # reference reduces them to null pass-through attenuators
        # (polarizer.cpp:130, retarder.cpp:116, circular.cpp:110): weight
        # 0.5*T / T / 0.5*T. Slot 0:3 keeps that reduction; the extra slots
        # feed the polarized transport layer (bsdf/polarized.py):
        #   p[3] = element rotation theta [rad] (polarizer.cpp:100)
        #   p[4] = retarder phase delta [rad] / circular handedness (+1/-1)
        #   p[5:8] = raw transmittance
        import math as _math
        fac = 1.0 if t == 'retarder' else 0.5
        tr_rgb = rgb('transmittance', 1.0)
        p[0:3] = [fac * c for c in tr_rgb]
        p[3] = float(props.get('theta', 0.0)) * _math.pi / 180.0
        if t == 'retarder':
            p[4] = float(props.get('delta', 90.0)) * _math.pi / 180.0
        elif t == 'circular':
            p[4] = -1.0 if props.get('left_handed', False) else 1.0
        p[5:8] = tr_rgb
        return BSDF_TYPES[t], F_DELTA | F_NULL | F_TRANSMISSION, p
    if t in ('plastic', 'roughplastic', 'pplastic'):
        # pplastic (src/bsdfs/pplastic.cpp) is the polarized plastic: rough
        # specular reflection + refract-scatter-refract diffuse, its own
        # type so the polarized layer can build its Mueller lobes
        p[0:3] = rgb('diffuse_reflectance', 0.5)
        p[3] = _iorf(props.get('int_ior', 1.49))
        p[4] = _iorf(props.get('ext_ior', 1.000277))
        p[5] = 1.0 if props.get('nonlinear', False) else 0.0
        p[6:9] = rgb('specular_reflectance', 1.0)
        p[9] = scalar('alpha', 0.1 if t != 'pplastic' else 0.06)
        p[15] = float(props.get('_texture_id', -1))
        if t == 'pplastic':
            # specular sampling weight = s_mean / (d_mean + s_mean)
            # (pplastic.cpp:392)
            d_mean = sum(p[0:3]) / 3.0
            s_mean = sum(p[6:9]) / 3.0
            p[12] = s_mean / max(d_mean + s_mean, 1e-6)
            return BSDF_TYPES[t], F_SMOOTH, p
        flags = F_SMOOTH | (F_DELTA if t == 'plastic' else 0)  # rough: pure smooth
        return BSDF_TYPES[t], flags, p
    raise NotImplementedError(f"bsdf type {t}")


# --- per-type implementations ----------------------------------------------
# Each takes gathered per-lane params P: (N, BSDF_NPARAM), local wi/wo.

def _diffuse_eval(P, wi, wo, textured_refl=None):
    refl = textured_refl if textured_refl is not None else P[:, 0:3]
    act = (fr.cos_theta(wi) > 0) & (fr.cos_theta(wo) > 0)
    val = refl * (m.InvPi * fr.cos_theta(wo))[:, None]
    return jnp.where(act[:, None], val, 0.0)


def _diffuse_pdf(P, wi, wo):
    act = (fr.cos_theta(wi) > 0) & (fr.cos_theta(wo) > 0)
    return jnp.where(act, warp.square_to_cosine_hemisphere_pdf(wo), 0.0)


def _diffuse_sample(P, wi, u1, u2, mode, textured_refl=None):
    refl = textured_refl if textured_refl is not None else P[:, 0:3]
    wo = warp.square_to_cosine_hemisphere(u2)
    pdf = warp.square_to_cosine_hemisphere_pdf(wo)
    act = fr.cos_theta(wi) > 0
    weight = jnp.where(act[:, None], refl, 0.0)
    bs = BSDFSample(wo=wo, pdf=jnp.where(act, pdf, 0.0),
                    eta=jnp.ones_like(pdf),
                    delta=jnp.zeros_like(act), null=jnp.zeros_like(act))
    return bs, weight


def _conductor_sample(P, wi, u1, u2, mode):
    cos_i = fr.cos_theta(wi)
    act = cos_i > 0
    wo = reflect_local(wi)
    F = fresnel_conductor(cos_i, P[:, 0:3], P[:, 3:6])
    weight = jnp.where(act[:, None], P[:, 6:9] * F, 0.0)
    one = jnp.ones_like(cos_i)
    bs = BSDFSample(wo=wo, pdf=jnp.where(act, 1.0, 0.0), eta=one,
                    delta=act, null=jnp.zeros_like(act))
    return bs, weight


def _dielectric_sample(P, wi, u1, u2, mode):
    cos_i = fr.cos_theta(wi)
    eta = P[:, 0] / P[:, 1]
    F, cos_t, eta_it, eta_ti = fresnel_dielectric(cos_i, eta)
    sel_r = u1 <= F
    wo = jnp.where(sel_r[:, None], reflect_local(wi),
                   refract_local(wi, cos_t, eta_ti))
    pdf = jnp.where(sel_r, F, 1.0 - F)
    factor = jnp.where(jnp.asarray(mode == RADIANCE), eta_ti, 1.0)
    w_r = P[:, 2:5]
    w_t = P[:, 5:8] * m.sqr(factor)[:, None]
    weight = jnp.where(sel_r[:, None], w_r, w_t)
    bs = BSDFSample(wo=wo, pdf=pdf,
                    eta=jnp.where(sel_r, 1.0, eta_it),
                    delta=jnp.ones_like(sel_r), null=jnp.zeros_like(sel_r))
    return bs, weight


def _thindielectric_sample(P, wi, u1, u2, mode):
    eta = P[:, 0] / P[:, 1]
    R, _, _, _ = fresnel_dielectric(jnp.abs(fr.cos_theta(wi)), eta)
    # account for internal bounces: R' = 2R/(1+R)
    R = jnp.where(R < 1.0, R * 2.0 / (1.0 + R), R)
    sel_r = u1 <= R
    wo = jnp.where(sel_r[:, None], reflect_local(wi), -wi)
    pdf = jnp.where(sel_r, R, 1.0 - R)
    weight = jnp.where(sel_r[:, None], P[:, 2:5], P[:, 5:8])
    one = jnp.ones_like(pdf)
    bs = BSDFSample(wo=wo, pdf=pdf, eta=one,
                    delta=jnp.ones_like(sel_r), null=jnp.zeros_like(sel_r))
    return bs, weight


def _null_sample(P, wi, u1, u2, mode):
    N = wi.shape[0]
    one = jnp.ones((N,), wi.dtype)
    tru = jnp.ones((N,), bool)
    bs = BSDFSample(wo=-wi, pdf=one, eta=one, delta=tru, null=tru)
    return bs, jnp.ones((N, 3), wi.dtype)


def _attenuator_sample(P, wi, u1, u2, mode):
    """Null pass-through with spectral attenuation in P[0:3] — the
    unpolarized reduction of polarizer/retarder/circular (see
    pack_params)."""
    bs, _ = _null_sample(P, wi, u1, u2, mode)
    return bs, P[:, 0:3]


def _roughconductor_eval(P, wi, wo):
    cos_i, cos_o = fr.cos_theta(wi), fr.cos_theta(wo)
    act = (cos_i > 0) & (cos_o > 0)
    h = m.normalize(wi + wo)
    ax, ay = P[:, 9], P[:, 10]
    D = mf.ggx_d(h, ax, ay)
    G = mf.smith_g1(wi, h, ax, ay) * mf.smith_g1(wo, h, ax, ay)
    F = fresnel_conductor(m.dot(wi, h), P[:, 0:3], P[:, 3:6])
    val = P[:, 6:9] * F * (D * G / (4.0 * jnp.maximum(cos_i, 1e-9)))[:, None]
    return jnp.where(act[:, None], val, 0.0)


def _roughconductor_pdf(P, wi, wo):
    cos_i, cos_o = fr.cos_theta(wi), fr.cos_theta(wo)
    act = (cos_i > 0) & (cos_o > 0)
    h = m.normalize(wi + wo)
    ax, ay = P[:, 9], P[:, 10]
    pdf_h = mf.vndf_pdf(wi, h, ax, ay)
    return jnp.where(act, pdf_h / (4.0 * jnp.maximum(jnp.abs(m.dot(wo, h)), 1e-9)), 0.0)


def _roughconductor_sample(P, wi, u1, u2, mode):
    ax, ay = P[:, 9], P[:, 10]
    h, pdf_h = mf.sample_vndf(wi, u2, ax, ay)
    wo = 2.0 * m.dot(wi, h, keepdims=True) * h - wi
    pdf = pdf_h / (4.0 * jnp.maximum(jnp.abs(m.dot(wo, h)), 1e-9))
    act = (fr.cos_theta(wi) > 0) & (fr.cos_theta(wo) > 0) & (pdf > 0)
    f = _roughconductor_eval(P, wi, wo)
    weight = jnp.where(act[:, None], f / jnp.maximum(pdf, 1e-20)[:, None], 0.0)
    bs = BSDFSample(wo=wo, pdf=jnp.where(act, pdf, 0.0),
                    eta=jnp.ones_like(pdf),
                    delta=jnp.zeros_like(act), null=jnp.zeros_like(act))
    return bs, weight


def _roughdielectric_eval(P, wi, wo):
    """Walter et al. 2007 microfacet refraction model (reference
    src/bsdfs/roughdielectric.cpp)."""
    eta = P[:, 0] / P[:, 1]
    cos_i, cos_o = fr.cos_theta(wi), fr.cos_theta(wo)
    reflect_case = cos_i * cos_o > 0
    eta_path = jnp.where(cos_i > 0, eta, 1.0 / eta)
    # half vector: reflection h ~ wi+wo; refraction h ~ wi + eta*wo
    h_refl = m.normalize(wi + wo)
    h_refr = m.normalize(wi + wo * eta_path[:, None])
    h = jnp.where(reflect_case[:, None], h_refl, h_refr)
    h = h * jnp.sign(fr.cos_theta(h))[:, None]  # upper hemisphere
    ax, ay = P[:, 9], P[:, 10]
    D = mf.ggx_d(h, ax, ay)
    wi_h = m.dot(wi, h)
    wo_h = m.dot(wo, h)
    F, _, _, _ = fresnel_dielectric(wi_h, eta)
    G = mf.smith_g1(wi * jnp.sign(cos_i)[:, None], h, ax, ay) \
        * mf.smith_g1(wo * jnp.sign(cos_o)[:, None], h, ax, ay)
    # reflection: F D G / (4 |cos_i|) (includes cos_o)
    val_r = P[:, 2:5] * (F * D * G / (4.0 * jnp.maximum(jnp.abs(cos_i),
                                                        1e-9)))[:, None]
    # refraction (radiance transport scaling folded as 1/eta_path^2 * ...)
    denom = wi_h + eta_path * wo_h
    jac = jnp.abs(wi_h * wo_h) / jnp.maximum(
        jnp.abs(cos_i) * m.sqr(denom), 1e-12)
    val_t = P[:, 5:8] * ((1.0 - F) * D * G * m.sqr(eta_path) * jac
                         / jnp.maximum(m.sqr(eta_path), 1e-12))[:, None]
    val = jnp.where(reflect_case[:, None], val_r, val_t)
    ok = (jnp.abs(cos_i) > 1e-6) & (D > 0)
    return jnp.where(ok[:, None], val, 0.0)


def _roughdielectric_pdf(P, wi, wo):
    eta = P[:, 0] / P[:, 1]
    cos_i, cos_o = fr.cos_theta(wi), fr.cos_theta(wo)
    reflect_case = cos_i * cos_o > 0
    eta_path = jnp.where(cos_i > 0, eta, 1.0 / eta)
    h = jnp.where(reflect_case[:, None], m.normalize(wi + wo),
                  m.normalize(wi + wo * eta_path[:, None]))
    h = h * jnp.sign(fr.cos_theta(h))[:, None]
    ax, ay = P[:, 9], P[:, 10]
    wi_up = wi * jnp.sign(cos_i)[:, None]
    pdf_h = mf.vndf_pdf(wi_up, h, ax, ay)
    wi_h = m.dot(wi, h)
    wo_h = m.dot(wo, h)
    F, _, _, _ = fresnel_dielectric(wi_h, eta)
    prob = jnp.where(reflect_case, F, 1.0 - F)
    dwh_refl = 1.0 / (4.0 * jnp.maximum(jnp.abs(wo_h), 1e-9))
    denom = wi_h + eta_path * wo_h
    dwh_refr = m.sqr(eta_path) * jnp.abs(wo_h) / jnp.maximum(m.sqr(denom),
                                                             1e-12)
    jac = jnp.where(reflect_case, dwh_refl, dwh_refr)
    return jnp.maximum(prob * pdf_h * jac, 0.0)


def _roughdielectric_sample(P, wi, u1, u2, mode):
    eta = P[:, 0] / P[:, 1]
    cos_i = fr.cos_theta(wi)
    ax, ay = P[:, 9], P[:, 10]
    wi_up = wi * jnp.sign(cos_i)[:, None]
    h_up, pdf_h = mf.sample_vndf(wi_up, u2, ax, ay)
    h = h_up * jnp.sign(cos_i)[:, None]   # same side as wi
    wi_h = m.dot(wi, h)
    F, cos_t, eta_it, eta_ti = fresnel_dielectric(wi_h, eta)
    sel_r = u1 <= F
    wo_r = 2.0 * wi_h[:, None] * h - wi
    # refract about h (local-frame refract formula generalized to h)
    wo_t = m.normalize(
        (eta_ti[:, None]) * (wi_h[:, None] * h - wi)
        + (cos_t[:, None]) * h)
    wo = jnp.where(sel_r[:, None], wo_r, wo_t)
    cos_o = fr.cos_theta(wo)
    ok = jnp.where(sel_r, cos_i * cos_o > 0, cos_i * cos_o < 0) \
        & (jnp.abs(cos_i) > 1e-6) & (pdf_h > 0)
    f = _roughdielectric_eval(P, wi, wo)
    pdf = _roughdielectric_pdf(P, wi, wo)
    factor = jnp.where(jnp.asarray(mode == RADIANCE) & ~sel_r, eta_ti, 1.0)
    weight = jnp.where(ok[:, None],
                       f * m.safe_rcp(pdf)[:, None] * m.sqr(factor)[:, None]
                       / jnp.where(sel_r, 1.0, 1.0)[:, None], 0.0)
    bs = BSDFSample(wo=wo, pdf=jnp.where(ok, pdf, 0.0),
                    eta=jnp.where(sel_r, 1.0, eta_it),
                    delta=jnp.zeros_like(sel_r), null=jnp.zeros_like(sel_r))
    return bs, weight


def _plastic_fdr(eta):
    """Average fresnel diffuse reflectance approximation (reference
    fresnel.h fresnel_diffuse_reflectance fit, d'Eon & Irving)."""
    inv_eta = 1.0 / eta
    return jnp.where(
        eta < 1.0,
        -0.4399 + 0.7099 * inv_eta - 0.3319 * m.sqr(inv_eta)
        + 0.0636 * inv_eta * m.sqr(inv_eta),
        ((((-0.0001 * eta + 0.0213) * eta - 0.1568) * eta + 0.4212) * eta
         - 0.8747) * eta + 0.9574 + (-1.8725 / eta + (0.1257 / m.sqr(eta))
                                     + 0.9196) * 0.0)


def _plastic_sample(P, wi, u1, u2, mode):
    """Smooth plastic: specular Dirac lobe + fresnel-attenuated diffuse
    (reference src/bsdfs/plastic.cpp semantics, no internal scattering
    nonlinearity unless flag set)."""
    cos_i = fr.cos_theta(wi)
    eta = P[:, 3] / P[:, 4]
    Fi, _, _, _ = fresnel_dielectric(cos_i, eta)
    refl = P[:, 0:3]
    # lobe selection probability: fresnel weight
    prob_spec = Fi
    sel_spec = u1 < prob_spec
    wo_spec = reflect_local(wi)
    wo_diff = warp.square_to_cosine_hemisphere(u2)
    wo = jnp.where(sel_spec[:, None], wo_spec, wo_diff)
    cos_o = fr.cos_theta(wo)
    Fo, _, _, _ = fresnel_dielectric(cos_o, eta)
    fdr = _plastic_fdr(1.0 / eta)
    inv_eta2 = 1.0 / m.sqr(eta)
    diff = refl / jnp.maximum(1.0 - refl * fdr[:, None], 1e-6) \
        * (inv_eta2 * (1.0 - Fi) * (1.0 - Fo))[:, None]
    w_spec = P[:, 6:9]
    w_diff = diff / jnp.maximum(1.0 - prob_spec, 1e-6)[:, None]
    act = cos_i > 0
    weight = jnp.where(sel_spec[:, None], w_spec, w_diff)
    weight = jnp.where(act[:, None], weight, 0.0)
    pdf = jnp.where(sel_spec, prob_spec,
                    (1.0 - prob_spec) * warp.square_to_cosine_hemisphere_pdf(wo))
    bs = BSDFSample(wo=wo, pdf=jnp.where(act, pdf, 0.0),
                    eta=jnp.ones_like(pdf), delta=sel_spec,
                    null=jnp.zeros_like(sel_spec))
    return bs, weight


def _plastic_eval(P, wi, wo):
    cos_i, cos_o = fr.cos_theta(wi), fr.cos_theta(wo)
    act = (cos_i > 0) & (cos_o > 0)
    eta = P[:, 3] / P[:, 4]
    Fi, _, _, _ = fresnel_dielectric(cos_i, eta)
    Fo, _, _, _ = fresnel_dielectric(cos_o, eta)
    refl = P[:, 0:3]
    fdr = _plastic_fdr(1.0 / eta)
    inv_eta2 = 1.0 / m.sqr(eta)
    val = refl / jnp.maximum(1.0 - refl * fdr[:, None], 1e-6) \
        * (m.InvPi * cos_o * inv_eta2 * (1.0 - Fi) * (1.0 - Fo))[:, None]
    return jnp.where(act[:, None], val, 0.0)


def _plastic_pdf(P, wi, wo):
    cos_i, cos_o = fr.cos_theta(wi), fr.cos_theta(wo)
    act = (cos_i > 0) & (cos_o > 0)
    eta = P[:, 3] / P[:, 4]
    Fi, _, _, _ = fresnel_dielectric(cos_i, eta)
    return jnp.where(act, (1.0 - Fi) * warp.square_to_cosine_hemisphere_pdf(wo), 0.0)


def _roughplastic_eval(P, wi, wo):
    """GGX specular + fresnel-attenuated diffuse (reference
    src/bsdfs/roughplastic.cpp)."""
    cos_i, cos_o = fr.cos_theta(wi), fr.cos_theta(wo)
    act = (cos_i > 0) & (cos_o > 0)
    eta = P[:, 3] / P[:, 4]
    ax = ay = P[:, 9]
    h = m.normalize(wi + wo)
    D = mf.ggx_d(h, ax, ay)
    G = mf.smith_g1(wi, h, ax, ay) * mf.smith_g1(wo, h, ax, ay)
    Fh, _, _, _ = fresnel_dielectric(m.dot(wi, h), eta)
    spec = P[:, 6:9] * (Fh * D * G / (4.0 * jnp.maximum(cos_i, 1e-9)))[:, None]
    diff = _plastic_eval(P, wi, wo)
    return jnp.where(act[:, None], spec + diff, 0.0)


def _roughplastic_pdf(P, wi, wo):
    cos_i, cos_o = fr.cos_theta(wi), fr.cos_theta(wo)
    act = (cos_i > 0) & (cos_o > 0)
    eta = P[:, 3] / P[:, 4]
    ax = ay = P[:, 9]
    Fi, _, _, _ = fresnel_dielectric(cos_i, eta)
    h = m.normalize(wi + wo)
    pdf_spec = mf.vndf_pdf(wi, h, ax, ay) \
        / (4.0 * jnp.maximum(jnp.abs(m.dot(wo, h)), 1e-9))
    pdf_diff = warp.square_to_cosine_hemisphere_pdf(wo)
    return jnp.where(act, Fi * pdf_spec + (1.0 - Fi) * pdf_diff, 0.0)


def _roughplastic_sample(P, wi, u1, u2, mode):
    cos_i = fr.cos_theta(wi)
    eta = P[:, 3] / P[:, 4]
    ax = ay = P[:, 9]
    Fi, _, _, _ = fresnel_dielectric(cos_i, eta)
    sel_spec = u1 < Fi
    h, _ = mf.sample_vndf(wi, u2, ax, ay)
    wo_spec = 2.0 * m.dot(wi, h, keepdims=True) * h - wi
    # reuse u2 for the diffuse lobe (rescaled by the lobe choice)
    wo_diff = warp.square_to_cosine_hemisphere(u2)
    wo = jnp.where(sel_spec[:, None], wo_spec, wo_diff)
    pdf = _roughplastic_pdf(P, wi, wo)
    f = _roughplastic_eval(P, wi, wo)
    act = (cos_i > 0) & (fr.cos_theta(wo) > 0) & (pdf > 1e-12)
    weight = jnp.where(act[:, None], f * m.safe_rcp(pdf)[:, None], 0.0)
    bs = BSDFSample(wo=wo, pdf=jnp.where(act, pdf, 0.0),
                    eta=jnp.ones_like(pdf),
                    delta=jnp.zeros_like(act), null=jnp.zeros_like(act))
    return bs, weight


def _pplastic_eval(P, wi, wo):
    """Polarized-plastic unpolarized arm (pplastic.cpp:303-332): GGX
    specular reflection + Fresnel-attenuated Lambertian (refract in /
    subsurface scatter / refract out, no internal-scattering series)."""
    cos_i, cos_o = fr.cos_theta(wi), fr.cos_theta(wo)
    act = (cos_i > 0) & (cos_o > 0)
    eta = P[:, 3] / P[:, 4]
    ax = ay = P[:, 9]
    h = m.normalize(wi + wo)
    D = mf.ggx_d(h, ax, ay)
    G = mf.smith_g1(wi, h, ax, ay) * mf.smith_g1(wo, h, ax, ay)
    Fh, _, _, _ = fresnel_dielectric(m.dot(wi, h), eta)
    spec = P[:, 6:9] * (Fh * D * G
                        / (4.0 * jnp.maximum(cos_i, 1e-9)))[:, None]
    Fi, _, _, _ = fresnel_dielectric(cos_i, eta)
    Fo, _, _, _ = fresnel_dielectric(cos_o, eta)
    diff = P[:, 0:3] * ((1.0 - Fo) * (1.0 - Fi)
                        * m.InvPi * cos_o)[:, None]
    return jnp.where(act[:, None], spec + diff, 0.0)


def _pplastic_pdf(P, wi, wo):
    """Mixture pdf with the static specular sampling weight
    (pplastic.cpp:345-368)."""
    cos_i, cos_o = fr.cos_theta(wi), fr.cos_theta(wo)
    act = (cos_i > 0) & (cos_o > 0)
    ax = ay = P[:, 9]
    prob_spec = P[:, 12]
    h = m.normalize(wi + wo)
    p_spec = mf.vndf_pdf(wi, h, ax, ay) \
        / (4.0 * jnp.maximum(jnp.abs(m.dot(wo, h)), 1e-9))
    p_spec = jnp.where((m.dot(wi, h) > 0) & (m.dot(wo, h) > 0), p_spec, 0.0)
    p_diff = warp.square_to_cosine_hemisphere_pdf(wo)
    return jnp.where(act, prob_spec * p_spec + (1.0 - prob_spec) * p_diff,
                     0.0)


def _pplastic_sample(P, wi, u1, u2, mode):
    cos_i = fr.cos_theta(wi)
    ax = ay = P[:, 9]
    prob_spec = P[:, 12]
    sel_spec = u1 < prob_spec
    h, _ = mf.sample_vndf(wi, u2, ax, ay)
    wo_spec = 2.0 * m.dot(wi, h, keepdims=True) * h - wi
    wo_diff = warp.square_to_cosine_hemisphere(u2)
    wo = jnp.where(sel_spec[:, None], wo_spec, wo_diff)
    pdf = _pplastic_pdf(P, wi, wo)
    f = _pplastic_eval(P, wi, wo)
    act = (cos_i > 0) & (fr.cos_theta(wo) > 0) & (pdf > 1e-12)
    weight = jnp.where(act[:, None], f * m.safe_rcp(pdf)[:, None], 0.0)
    bs = BSDFSample(wo=wo, pdf=jnp.where(act, pdf, 0.0),
                    eta=jnp.ones_like(pdf),
                    delta=jnp.zeros_like(act), null=jnp.zeros_like(act))
    return bs, weight


_EVAL = {
    BSDF_TYPES['diffuse']: _diffuse_eval,
    BSDF_TYPES['roughconductor']: _roughconductor_eval,
    BSDF_TYPES['roughdielectric']: _roughdielectric_eval,
    BSDF_TYPES['plastic']: _plastic_eval,
    BSDF_TYPES['roughplastic']: _roughplastic_eval,
    BSDF_TYPES['pplastic']: _pplastic_eval,
}
_PDF = {
    BSDF_TYPES['diffuse']: _diffuse_pdf,
    BSDF_TYPES['roughconductor']: _roughconductor_pdf,
    BSDF_TYPES['roughdielectric']: _roughdielectric_pdf,
    BSDF_TYPES['plastic']: _plastic_pdf,
    BSDF_TYPES['roughplastic']: _roughplastic_pdf,
    BSDF_TYPES['pplastic']: _pplastic_pdf,
}
_SAMPLE = {
    BSDF_TYPES['diffuse']: _diffuse_sample,
    BSDF_TYPES['conductor']: _conductor_sample,
    BSDF_TYPES['dielectric']: _dielectric_sample,
    BSDF_TYPES['thindielectric']: _thindielectric_sample,
    BSDF_TYPES['null']: _null_sample,
    BSDF_TYPES['roughconductor']: _roughconductor_sample,
    BSDF_TYPES['roughdielectric']: _roughdielectric_sample,
    BSDF_TYPES['plastic']: _plastic_sample,
    BSDF_TYPES['roughplastic']: _roughplastic_sample,
    BSDF_TYPES['polarizer']: _attenuator_sample,
    BSDF_TYPES['retarder']: _attenuator_sample,
    BSDF_TYPES['circular']: _attenuator_sample,
    BSDF_TYPES['pplastic']: _pplastic_sample,
}


def _maybe_flip(flags, wi, *others):
    """Twosided handling: mirror local dirs to the upper hemisphere when the
    bsdf is twosided and wi arrives from below."""
    flip = ((flags & F_TWOSIDED) > 0) & (fr.cos_theta(wi) < 0)
    fv = jnp.where(flip[:, None], jnp.asarray([1.0, 1.0, -1.0]), 1.0)
    return (wi * fv,) + tuple(o * fv for o in others)


def _textured_reflectance(scene, meta, si, P):
    """Diffuse reflectance with optional texture (slot 15 = texture id)."""
    if not getattr(meta, 'has_textures', False):
        return None
    from .. import texture as tex_mod
    tex_id = P[:, 15].astype(jnp.int32)
    kw = {}
    if getattr(meta, 'has_3d_textures', False):
        kw['p_world'] = si.p
    if getattr(meta, 'has_attr_textures', False):
        kw['attr'] = tex_mod.vertex_attr(scene, si)
    tex = tex_mod.eval(scene, tex_id, si.uv, **kw)
    return jnp.where((tex_id >= 0)[:, None], tex, P[:, 0:3])


def _apply_param_textures(scene, meta, si, P, btype):
    """Rewrite gathered per-lane parameter rows with spatially-varying
    values (reference: rough BSDFs hold Texture refs for alpha /
    specular_reflectance, e.g. roughconductor.cpp:446-456). One rewrite
    here replaces threading textures through every lobe: slot 16 = alpha
    texture id+1 (channel 0 -> alpha_u/v slots 9/10), slot 17 = specular
    reflectance id+1 (-> slots 6:9, or 2:5 for the dielectric family),
    slot 15 = diffuse_reflectance id for the plastic family (-> 0:3)."""
    if not getattr(meta, 'has_param_textures', False):
        return P
    from .. import texture as tex_mod
    a_id = P[:, 16].astype(jnp.int32) - 1
    s_id = P[:, 17].astype(jnp.int32) - 1
    tex_a = tex_mod.eval(scene, a_id, si.uv)[:, 0]
    alpha_ok = a_id >= 0
    P = P.at[:, 9].set(jnp.where(alpha_ok, tex_a, P[:, 9]))
    P = P.at[:, 10].set(jnp.where(alpha_ok, tex_a, P[:, 10]))
    tex_s = tex_mod.eval(scene, s_id, si.uv)
    diel = ((btype == BSDF_TYPES['dielectric'])
            | (btype == BSDF_TYPES['thindielectric'])
            | (btype == BSDF_TYPES['roughdielectric']))
    P = P.at[:, 6:9].set(jnp.where(((s_id >= 0) & ~diel)[:, None],
                                   tex_s, P[:, 6:9]))
    P = P.at[:, 2:5].set(jnp.where(((s_id >= 0) & diel)[:, None],
                                   tex_s, P[:, 2:5]))
    plas = ((btype == BSDF_TYPES['plastic'])
            | (btype == BSDF_TYPES['roughplastic'])
            | (btype == BSDF_TYPES['pplastic']))
    d_id = jnp.where(plas, P[:, 15].astype(jnp.int32), -1)
    tex_d = tex_mod.eval(scene, d_id, si.uv)
    P = P.at[:, 0:3].set(jnp.where((d_id >= 0)[:, None], tex_d, P[:, 0:3]))
    # textured mask opacity (slot 18 = id+1 -> slot 14)
    o_id = P[:, 18].astype(jnp.int32) - 1
    tex_o = tex_mod.eval(scene, jnp.maximum(o_id, 0), si.uv)[:, 0]
    P = P.at[:, 14].set(jnp.where(o_id >= 0, tex_o, P[:, 14]))
    return P


_BLEND = BSDF_TYPES['blendbsdf']
_NORMALMAP = BSDF_TYPES['normalmap']
_BUMPMAP = BSDF_TYPES['bumpmap']


def _has_perturb(meta):
    return _NORMALMAP in meta.bsdf_types or _BUMPMAP in meta.bsdf_types


def _perturb_si(scene, meta, si):
    """Resolve normalmap/bumpmap wrapper rows: perturb the shading frame
    from the row's texture and forward to the nested BSDF row (reference
    src/bsdfs/normalmap.cpp:82-118, bumpmap.cpp:83-135).

    normalmap: tangent-space normal = 2*rgb - 1. bumpmap: central
    differences of the height texture in uv space tilt the normal by
    -scale*(dh/du, dh/dv) along the tangents (deviation: the reference
    chains through dp_du surface partials; the wavefront SI carries unit
    tangents, so uv-space differences stand in — standard bump mapping).
    The new tangent Gram-Schmidts the original one against the perturbed
    normal, keeping anisotropy alignment."""
    from .. import texture as tex_mod
    from ..core.frame import Frame
    from ..ops.gather import take_many
    btype, P = take_many([scene.bsdfs.type, scene.bsdfs.params],
                         si.bsdf_idx)
    is_nm = btype == _NORMALMAP
    is_bm = btype == _BUMPMAP
    is_pert = is_nm | is_bm
    tex_id = jnp.where(is_pert, P[:, 1].astype(jnp.int32), -1)

    n_local = jnp.concatenate(
        [jnp.zeros((btype.shape[0], 2)), jnp.ones((btype.shape[0], 1))], -1)
    if _NORMALMAP in meta.bsdf_types:
        rgb = tex_mod.eval(scene, tex_id, si.uv)
        n_local = jnp.where(is_nm[:, None], 2.0 * rgb - 1.0, n_local)
    if _BUMPMAP in meta.bsdf_types:
        scale = P[:, 2]
        eps = 5e-4
        du = jnp.asarray([eps, 0.0], jnp.float32)
        dv = jnp.asarray([0.0, eps], jnp.float32)

        def h(uv):
            return tex_mod.eval(scene, tex_id, uv)[:, 0]

        dh_du = (h(si.uv + du) - h(si.uv - du)) / (2.0 * eps)
        dh_dv = (h(si.uv + dv) - h(si.uv - dv)) / (2.0 * eps)
        n_bm = jnp.stack([-scale * dh_du, -scale * dh_dv,
                          jnp.ones_like(dh_du)], -1)
        n_local = jnp.where(is_bm[:, None], n_bm, n_local)

    f = si.sh_frame
    n_w = m.normalize(f.to_world(m.normalize(n_local)))
    n_w = jnp.where(is_pert[:, None], n_w, f.n)
    s = m.normalize(f.s - n_w * m.dot(n_w, f.s)[:, None])
    t = jnp.cross(n_w, s)
    newf = Frame(s, t, n_w)
    nested = jnp.where(is_pert, P[:, 0].astype(jnp.int32), si.bsdf_idx)
    return si._replace(bsdf_idx=nested, sh_frame=newf,
                       wi=newf.to_local(f.to_world(si.wi)))


def _blend_weight(scene, meta, si, P):
    """Per-lane blend weight: constant slot 2, or the slot-19 texture
    (blendbsdf.cpp holds a Texture weight; eval_1 semantics = channel
    mean)."""
    w = P[:, 2]
    if not getattr(meta, 'has_textures', False):
        return w
    from .. import texture as tex_mod
    t_id = P[:, 19].astype(jnp.int32) - 1
    kw = {}
    if getattr(meta, 'has_3d_textures', False):
        kw['p_world'] = si.p
    if getattr(meta, 'has_attr_textures', False):
        kw['attr'] = tex_mod.vertex_attr(scene, si)
    tex = tex_mod.eval(scene, jnp.maximum(t_id, 0), si.uv, **kw)
    return jnp.where(t_id >= 0, tex.mean(-1), w)


def _blend_sub(si, P, which):
    row = P[:, which].astype(jnp.int32)
    is_blend_row = None
    return si._replace(bsdf_idx=row)


def eval(scene, meta, si, wo, mode=RADIANCE, textures=None,
         _depth: int = 0):
    """f(wi, wo) * |cos_theta_o| for each lane (zero for pure-delta lanes)."""
    if _depth == 0 and _has_perturb(meta):
        f0 = si.sh_frame
        si = _perturb_si(scene, meta, si)
        wo = si.sh_frame.to_local(f0.to_world(wo))
    from ..ops.gather import take_many
    btype, flags, P = take_many([scene.bsdfs.type, scene.bsdfs.flags,
                                 scene.bsdfs.params], si.bsdf_idx)
    P = _apply_param_textures(scene, meta, si, P, btype)
    if textures is None:
        textures = _textured_reflectance(scene, meta, si, P)
    if _BLEND in meta.bsdf_types and _depth == 0:
        is_b = btype == _BLEND
        w = _blend_weight(scene, meta, si, P)
        fa = eval(scene, meta, _blend_sub(si, P, 0), wo, mode, None, 1)
        fb = eval(scene, meta, _blend_sub(si, P, 1), wo, mode, None, 1)
        blend_val = (1.0 - w)[:, None] * fa + w[:, None] * fb
        base = eval(scene, meta, si, wo, mode, textures, 1)
        return jnp.where(is_b[:, None], blend_val, base)
    wi, wo = _maybe_flip(flags, si.wi, wo)
    out = jnp.zeros(wo.shape[:-1] + (3,), jnp.float32)
    for code in meta.bsdf_types:
        fn = _EVAL.get(code)
        if fn is None:
            continue
        kw = {}
        if code == BSDF_TYPES['diffuse'] and textures is not None:
            kw['textured_refl'] = textures
        val = fn(P, wi, wo, **kw)
        out = jnp.where((btype == code)[:, None], val, out)
    if BSDF_TYPES['measured'] in meta.bsdf_types:
        from . import measured as meas_mod
        slot = P[:, 0].astype(jnp.int32)
        for k, mm in enumerate(meta.measured_meta):
            val = meas_mod.eval(scene.measured[k], mm, wi, wo)
            sel = (btype == BSDF_TYPES['measured']) & (slot == k)
            out = jnp.where(sel[:, None], val, out)
    if BSDF_TYPES['measured_polarized'] in meta.bsdf_types:
        from . import measured_pol as mp_mod
        slot = P[:, 0].astype(jnp.int32)
        for k in range(len(scene.measured_pol)):
            val = mp_mod.eval(scene.measured_pol[k], P, wi, wo)
            sel = (btype == BSDF_TYPES['measured_polarized']) & (slot == k)
            out = jnp.where(sel[:, None], val, out)
    # opacity-masked rows: surface lobe is attenuated by opacity
    out = jnp.where(((flags & F_MASK) > 0)[:, None], out * P[:, 14:15], out)
    return out


def pdf(scene, meta, si, wo, _depth: int = 0):
    if _depth == 0 and _has_perturb(meta):
        f0 = si.sh_frame
        si = _perturb_si(scene, meta, si)
        wo = si.sh_frame.to_local(f0.to_world(wo))
    from ..ops.gather import take_many
    btype, flags, P = take_many([scene.bsdfs.type, scene.bsdfs.flags,
                                 scene.bsdfs.params], si.bsdf_idx)
    P = _apply_param_textures(scene, meta, si, P, btype)
    if _BLEND in meta.bsdf_types and _depth == 0:
        is_b = btype == _BLEND
        w = _blend_weight(scene, meta, si, P)
        pa = pdf(scene, meta, _blend_sub(si, P, 0), wo, 1)
        pb = pdf(scene, meta, _blend_sub(si, P, 1), wo, 1)
        base = pdf(scene, meta, si, wo, 1)
        return jnp.where(is_b, (1.0 - w) * pa + w * pb, base)
    wi, wo = _maybe_flip(flags, si.wi, wo)
    out = jnp.zeros(wo.shape[:-1], jnp.float32)
    for code in meta.bsdf_types:
        fn = _PDF.get(code)
        if fn is None:
            continue
        out = jnp.where(btype == code, fn(P, wi, wo), out)
    if BSDF_TYPES['measured'] in meta.bsdf_types:
        from . import measured as meas_mod
        slot = P[:, 0].astype(jnp.int32)
        for k, mm in enumerate(meta.measured_meta):
            val = meas_mod.pdf(scene.measured[k], mm, wi, wo)
            sel = (btype == BSDF_TYPES['measured']) & (slot == k)
            out = jnp.where(sel, val, out)
    if BSDF_TYPES['measured_polarized'] in meta.bsdf_types:
        from . import measured_pol as mp_mod
        out = jnp.where(btype == BSDF_TYPES['measured_polarized'],
                        mp_mod.pdf(P, wi, wo), out)
    out = jnp.where((flags & F_MASK) > 0, out * P[:, 14], out)
    return out


def _unperturb_wo(f_orig, si, bs):
    # map a sampled direction from the perturbed shading frame back into
    # the caller's original frame (callers hold the unresolved si)
    if f_orig is None:
        return bs
    return bs._replace(wo=f_orig.to_local(si.sh_frame.to_world(bs.wo)))


def sample(scene, meta, si, u1, u2, mode=RADIANCE, textures=None,
           _depth: int = 0):
    _f_orig = None
    if _depth == 0 and _has_perturb(meta):
        _f_orig = si.sh_frame
        si = _perturb_si(scene, meta, si)
    from ..ops.gather import take_many
    btype, flags, P = take_many([scene.bsdfs.type, scene.bsdfs.flags,
                                 scene.bsdfs.params], si.bsdf_idx)
    P = _apply_param_textures(scene, meta, si, P, btype)
    if textures is None:
        textures = _textured_reflectance(scene, meta, si, P)
    if _BLEND in meta.bsdf_types and _depth == 0:
        # lobe selection by blend weight (reference blendbsdf.cpp); the
        # chosen sub-bsdf's sample is reused with pdf scaled by the
        # selection probability (unbiased; sub rows may not be blends)
        is_b = btype == _BLEND
        w = _blend_weight(scene, meta, si, P)
        pick_b = u1 < w
        sub_row = jnp.where(pick_b, P[:, 1], P[:, 0]).astype(jnp.int32)
        si_sub = si._replace(bsdf_idx=jnp.where(is_b, sub_row, si.bsdf_idx))
        u1r = jnp.where(is_b,
                        jnp.where(pick_b, u1 / jnp.maximum(w, 1e-6),
                                  (u1 - w) / jnp.maximum(1.0 - w, 1e-6)),
                        u1)
        bs, weight = sample(scene, meta, si_sub, u1r, u2, mode, None, 1)
        prob = jnp.where(is_b, jnp.where(pick_b, w, 1.0 - w), 1.0)
        bs = bs._replace(pdf=bs.pdf * prob)
        return _unperturb_wo(_f_orig, si, bs), weight
    (wi,) = _maybe_flip(flags, si.wi)
    N = wi.shape[0]
    zero3 = jnp.zeros((N, 3), jnp.float32)
    zero = jnp.zeros((N,), jnp.float32)
    fls = jnp.zeros((N,), bool)
    bs = BSDFSample(wo=zero3, pdf=zero, eta=jnp.ones((N,)), delta=fls, null=fls)
    weight = zero3
    for code in meta.bsdf_types:
        fn = _SAMPLE.get(code)
        if fn is None:
            continue
        kw = {}
        if code == BSDF_TYPES['diffuse'] and textures is not None:
            kw['textured_refl'] = textures
        bs_c, w_c = fn(P, wi, u1, u2, mode, **kw)
        sel = btype == code
        bs = BSDFSample(
            wo=jnp.where(sel[:, None], bs_c.wo, bs.wo),
            pdf=jnp.where(sel, bs_c.pdf, bs.pdf),
            eta=jnp.where(sel, bs_c.eta, bs.eta),
            delta=jnp.where(sel, bs_c.delta, bs.delta),
            null=jnp.where(sel, bs_c.null, bs.null))
        weight = jnp.where(sel[:, None], w_c, weight)
    if BSDF_TYPES['measured'] in meta.bsdf_types:
        from . import measured as meas_mod
        slot = P[:, 0].astype(jnp.int32)
        for k, mm in enumerate(meta.measured_meta):
            wo_k, pdf_k, w_k = meas_mod.sample(scene.measured[k], mm, wi,
                                               u2)
            sel = (btype == BSDF_TYPES['measured']) & (slot == k)
            bs = BSDFSample(
                wo=jnp.where(sel[:, None], wo_k, bs.wo),
                pdf=jnp.where(sel, pdf_k, bs.pdf),
                eta=jnp.where(sel, 1.0, bs.eta),
                delta=jnp.where(sel, False, bs.delta),
                null=jnp.where(sel, False, bs.null))
            weight = jnp.where(sel[:, None], w_k, weight)
    if BSDF_TYPES['measured_polarized'] in meta.bsdf_types:
        from . import measured_pol as mp_mod
        slot = P[:, 0].astype(jnp.int32)
        for k in range(len(scene.measured_pol)):
            wo_k, pdf_k, w_k = mp_mod.sample(scene.measured_pol[k], P, wi,
                                             u1, u2)
            sel = (btype == BSDF_TYPES['measured_polarized']) & (slot == k)
            bs = BSDFSample(
                wo=jnp.where(sel[:, None], wo_k, bs.wo),
                pdf=jnp.where(sel, pdf_k, bs.pdf),
                eta=jnp.where(sel, 1.0, bs.eta),
                delta=jnp.where(sel, False, bs.delta),
                null=jnp.where(sel, False, bs.null))
            weight = jnp.where(sel[:, None], w_k, weight)
    # un-flip the sampled direction for twosided backfaces
    flip = ((flags & F_TWOSIDED) > 0) & (fr.cos_theta(si.wi) < 0)
    bs = bs._replace(wo=jnp.where(flip[:, None],
                                  bs.wo * jnp.asarray([1.0, 1.0, -1.0]), bs.wo))
    # opacity mask: with prob (1 - opacity) pass straight through
    # (reference mask.cpp sample); u1 is stretched for the nested lobe by
    # construction of the masked select below (approximation: reuse u1)
    masked_rows = (flags & F_MASK) > 0
    if True:
        opacity = P[:, 14]
        pass_thru = masked_rows & (u1 >= opacity)
        one = jnp.ones((N,), jnp.float32)
        bs = BSDFSample(
            wo=jnp.where(pass_thru[:, None], -wi, bs.wo),
            pdf=jnp.where(pass_thru, 1.0 - opacity, bs.pdf),
            eta=jnp.where(pass_thru, one, bs.eta),
            delta=jnp.where(pass_thru, True, bs.delta),
            null=jnp.where(pass_thru, True, bs.null))
        weight = jnp.where(pass_thru[:, None], jnp.ones((N, 3)), weight)
        # nested lobe keeps weight (pdf scaling by opacity cancels f*opacity)
    return _unperturb_wo(_f_orig, si, bs), weight


def spectral_fresnel_ratio(scene, meta, si, wo, lam):
    """Per-hero-wavelength conductor Fresnel correction for the spectral
    variants (reference: in spectral builds conductor.cpp/roughconductor.cpp
    evaluate fresnel_conductor with the tabulated complex IOR at the ray's
    wavelengths; the RGB build integrates eta/k to RGB at load time).

    The spectral integrators form weights as upsample(f_rgb, lam). For a
    conductor, f_rgb = spec_reflectance * F_rgb(cos_h) * geometry, so
    multiplying by F(lam, cos_h) / upsample(F_rgb, lam) replaces the
    band-quantized upsampled Fresnel with the true spectral one (exact for
    achromatic spec_reflectance, the overwhelmingly common case). Returns
    an (N, L) factor (1 on non-conductor lanes / RGB-only conductors), or
    None when the scene carries no tabulated curves. Limitation: conductor
    rows reached through a blendbsdf wrapper keep the RGB upsampling."""
    if not getattr(meta, 'has_conductor_spd', False):
        return None
    from ..core import spectral as sp
    if _has_perturb(meta):
        f0 = si.sh_frame
        si = _perturb_si(scene, meta, si)
        wo = si.sh_frame.to_local(f0.to_world(wo))
    from ..ops.gather import take_many, take_rows
    btype, flags, P = take_many([scene.bsdfs.type, scene.bsdfs.flags,
                                 scene.bsdfs.params], si.bsdf_idx)
    wi, wo = _maybe_flip(flags, si.wi, wo)
    is_cond = ((btype == BSDF_TYPES['conductor'])
               | (btype == BSDF_TYPES['roughconductor']))
    sid = P[:, 13].astype(jnp.int32) - 1
    use = is_cond & (sid >= 0)
    # half-vector cosine: for the delta conductor wo = reflect(wi), so
    # normalize(wi + wo) is the normal and cos_h = cos_theta_i
    h = m.normalize(wi + wo)
    cos_h = jnp.abs(m.dot(wi, h))
    C = scene.conductor_spd.shape[0]
    K = scene.conductor_spd.shape[-1]
    curves = take_rows(scene.conductor_spd.reshape(C, 2 * K),
                       jnp.maximum(sid, 0)).reshape(-1, 2, K)
    eta_l = sp.cie_table_eval(curves[:, 0, :], lam)
    k_l = sp.cie_table_eval(curves[:, 1, :], lam)
    F_l = fresnel_conductor(cos_h, eta_l, k_l)                  # (N, L)
    F_rgb = fresnel_conductor(cos_h, P[:, 0:3], P[:, 3:6])      # (N, 3)
    F_up = sp.upsample_weight(F_rgb, lam)                       # (N, L)
    return jnp.where(use[:, None] & (F_up > 1e-6),
                     F_l / jnp.maximum(F_up, 1e-6), 1.0)


def eval_null_transmission(scene, meta, si):
    """Transmittance of straight-through rays (reference
    bsdf.h eval_null_transmission): 1 for null bsdfs, (1 - opacity) for
    masked bsdfs, 0 otherwise."""
    from ..ops.gather import take_many
    flags, P, btype = take_many([scene.bsdfs.flags, scene.bsdfs.params,
                                 scene.bsdfs.type], si.bsdf_idx)
    P = _apply_param_textures(scene, meta, si, P, btype)
    is_mask = (flags & F_MASK) > 0
    is_null = ((flags & F_NULL) > 0) & ~is_mask
    out = jnp.where(is_null[:, None], jnp.ones((si.wi.shape[0], 3)), 0.0)
    out = jnp.where(is_mask[:, None], 1.0 - P[:, 14:15], out)
    # polarization elements attenuate straight-through rays by their packed
    # unpolarized weight (polarizer.cpp:184 etc.)
    is_att = ((btype == BSDF_TYPES['polarizer'])
              | (btype == BSDF_TYPES['retarder'])
              | (btype == BSDF_TYPES['circular']))
    out = jnp.where(is_att[:, None], P[:, 0:3], out)
    return out


def flags_of(scene, si):
    return scene.bsdfs.flags[si.bsdf_idx]
