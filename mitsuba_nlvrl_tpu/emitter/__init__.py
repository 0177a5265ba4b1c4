"""Emitter evaluation & sampling with masked type dispatch.

TPU-native analog of the reference emitter plugins (src/emitters/*.cpp) and
Scene::sample_emitter_direction (src/librender/scene.cpp:164-214): uniform
emitter pick + per-type direction sampling toward a reference point, plus
emission eval for rays that hit emissive geometry or escape to the
environment, and emitter ray sampling for light tracing (photon/VRL pass).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core import warp
from ..core.frame import Frame
from ..core.ray import Ray
from ..core.records import DirectionSample
from ..scene.types import EMITTER_TYPES

E_AREA = EMITTER_TYPES['area']
E_POINT = EMITTER_TYPES['point']
E_CONSTANT = EMITTER_TYPES['constant']
E_DIRECTIONAL = EMITTER_TYPES['directional']
E_SPOT = EMITTER_TYPES['spot']
E_ENVMAP = EMITTER_TYPES['envmap']
E_PROJECTOR = EMITTER_TYPES['projector']

EMITTER_NPARAM = 28


# --- environment map helpers (reference src/emitters/envmap.cpp) ------------

def _env_uv_from_local(d):
    """Local direction -> equirectangular uv (envmap.cpp:146-147)."""
    u = jnp.arctan2(d[..., 0], -d[..., 2]) * m.InvTwoPi
    u = jnp.where(u < 0.0, u + 1.0, u)
    v = m.safe_acos(jnp.clip(d[..., 1], -1.0, 1.0)) * m.InvPi
    return u, v


def _env_dir_from_uv(u, v):
    """uv -> local direction (envmap.cpp:159-162: sphdir then (y,z,-x))."""
    theta = v * m.Pi
    phi = u * (2.0 * m.Pi)
    st, ct = jnp.sin(theta), jnp.cos(theta)
    return jnp.stack([st * jnp.sin(phi), ct, -st * jnp.cos(phi)], axis=-1)


def _env_eval_uv(scene, u, v):
    """Bilinear env map lookup * scale."""
    tex = scene.emitters.env_map
    H, W = tex.shape[0], tex.shape[1]
    x = u * W - 0.5
    y = jnp.clip(v * H - 0.5, 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.clip(y.astype(jnp.int32), 0, H - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    tx = x - x0
    ty = y - y0
    x0w = jnp.mod(x0, W)
    x1w = jnp.mod(x0 + 1, W)
    c = (tex[y0, x0w] * ((1 - tx) * (1 - ty))[..., None]
         + tex[y0, x1w] * (tx * (1 - ty))[..., None]
         + tex[y1, x0w] * ((1 - tx) * ty)[..., None]
         + tex[y1, x1w] * (tx * ty)[..., None])
    return c * scene.emitters.env_scale


def _env_pdf_uv(scene, u, v):
    """Unit-square density of the luminance*sin(theta) bilinear
    interpolant (envmap.cpp:253-268 pdf_direction, before the
    solid-angle factor)."""
    from ..core import distr2d
    return distr2d.eval_hierarchical(scene.emitters.env_warp,
                                     jnp.stack([u, v], axis=-1))


def _env_sample_uv(scene, u2):
    """Continuous uv sample of the luminance interpolant via hierarchical
    sample warping (envmap.cpp:217-238 sample_direction)."""
    from ..core import distr2d
    pos, pdf = distr2d.sample_hierarchical(scene.emitters.env_warp, u2)
    return pos[..., 0], pos[..., 1], pdf


def has_envmap(meta):
    return E_ENVMAP in meta.emitter_types


SPEC_RGB = 0        # srgb_d65 expansion of the packed RGB (spectral mode)
SPEC_BLACKBODY = 1  # Planck's law at spec_param = temperature
SPEC_TABLE = 2      # tabulated SPD row spec_param in the scene spectra table


def pack_params(props: dict) -> Tuple[int, list, tuple]:
    """Pack an emitter to (type_code, params, spec) where ``spec`` =
    (kind, param, scale, table_row_or_None) records the emitter's true
    spectrum for the spectral variant (RGB transport only uses the packed
    load-time-integrated RGB, as the reference RGB variants do)."""
    t = props['type']
    p = [0.0] * EMITTER_NPARAM
    spec = [SPEC_RGB, 0.0, 1.0, None]

    def rgb(key, default):
        v = props.get(key, default)
        if isinstance(v, dict):
            # spectrum plugin dict: integrate to RGB for the packed params
            # and record the true SPD for spectral transport
            from ..core.spectrum import (spectrum_to_rgb, blackbody_rgb,
                                         CIE_Y_NORMALIZATION)
            from ..core import spectral as sp_mod
            import numpy as _np
            st = v.get('type', 'spectrum')
            scale = float(v.get('scale', 1.0))
            if st == 'blackbody':
                T = float(v.get('temperature', 6500.0))
                spec[0], spec[1], spec[2] = SPEC_BLACKBODY, T, \
                    scale * CIE_Y_NORMALIZATION
                return [float(x) * scale for x in blackbody_rgb(T)]
            if st == 'd65':
                spec[0] = SPEC_TABLE
                spec[3] = (sp_mod.D65_HAT * scale).astype(_np.float32)
                return [scale] * 3
            # regular / irregular / generic tabulated spectrum
            if st == 'regular':
                n = len(v['values'])
                wav = _np.linspace(float(v.get('lambda_min', 360.0)),
                                   float(v.get('lambda_max', 830.0)), n)
                vals = _np.asarray(v['values'], _np.float64)
            else:
                pairs = v.get('value', v.get('values'))
                wav = _np.asarray([q[0] for q in pairs], _np.float64)
                vals = _np.asarray([q[1] for q in pairs], _np.float64)
            grid = _np.linspace(sp_mod.CIE_MIN, sp_mod.CIE_MAX,
                                sp_mod.CIE_SAMPLES)
            row = _np.interp(grid, wav, vals, left=0.0, right=0.0)
            spec[0] = SPEC_TABLE
            spec[3] = (row * scale * CIE_Y_NORMALIZATION).astype(_np.float32)
            return [float(x) * scale
                    for x in spectrum_to_rgb(wav, vals, bounded=False)]
        if isinstance(v, (int, float)):
            return [float(v)] * 3
        return [float(x) for x in v]

    if t == 'area':
        p[0:3] = rgb('radiance', 1.0)
        return E_AREA, p, tuple(spec)
    if t == 'point':
        p[0:3] = [float(x) for x in props.get('position', (0, 0, 0))]
        p[3:6] = rgb('intensity', 1.0)
        return E_POINT, p, tuple(spec)
    if t == 'constant':
        p[0:3] = rgb('radiance', 1.0)
        return E_CONSTANT, p, tuple(spec)
    if t == 'directional':
        p[0:3] = [float(x) for x in props.get('direction', (0, 0, 1))]
        p[3:6] = rgb('irradiance', 1.0)
        return E_DIRECTIONAL, p, tuple(spec)
    if t == 'envmap':
        p[0] = float(props.get('scale', 1.0))
        return E_ENVMAP, p, tuple(spec)
    if t == 'spot':
        p[0:3] = [float(x) for x in props.get('position', (0, 0, 0))]
        p[3:6] = [float(x) for x in props.get('direction', (0, 0, 1))]
        p[6:9] = rgb('intensity', 1.0)
        import numpy as np
        cutoff = float(props.get('cutoff_angle', 20.0))
        beam = float(props.get('beam_width', cutoff * 0.75))
        p[9] = float(np.cos(np.deg2rad(cutoff)))
        p[10] = float(np.cos(np.deg2rad(beam)))
        return E_SPOT, p, tuple(spec)
    if t == 'projector':
        # texture projection light, the reciprocal of the perspective
        # sensor (src/emitters/projector.cpp:88-105): irradiance is
        # specified on the virtual image plane at z=1. Layout: pos[0:3],
        # scale rgb [3:6], tan(fov/2) x/y [6]/[7], emitter-to-world
        # rotation [8:17] + its inverse [17:26], slide texture id+1 [26].
        # The builder pre-registers the irradiance texture
        # (_irradiance_tex) and passes the bitmap aspect (_aspect).
        import numpy as np
        tw = props.get('to_world')
        M = np.asarray(tw.m) if tw is not None else np.eye(4)
        p[0:3] = [float(x) for x in M[:3, 3]]
        p[3:6] = rgb('scale', 1.0)
        fov = float(props.get('fov', 39.597755))  # 50mm-equivalent default
        tan_x = float(np.tan(np.deg2rad(fov) * 0.5))
        aspect = float(props.get('_aspect', 1.0))
        p[6] = tan_x
        p[7] = tan_x / max(aspect, 1e-6)
        R = M[:3, :3]
        p[8:17] = [float(x) for x in R.reshape(-1)]
        p[17:26] = [float(x) for x in np.linalg.inv(R).reshape(-1)]
        p[26] = float(props.get('_irradiance_tex', -1)) + 1.0
        return E_PROJECTOR, p, tuple(spec)
    raise NotImplementedError(f"emitter type {t}")


def _segment_searchsorted(cdf, offset, count, u):
    """Per-lane binary search of u in cdf[offset:offset+count] (normalized
    within the segment). Fixed-iteration — jit friendly."""
    n_total = cdf.shape[0]
    lo = offset
    hi = offset + count  # exclusive
    steps = max(2, n_total.bit_length() + 1)

    def body(_, lh):
        lo, hi = lh
        cont = lo < hi
        mid = (lo + hi) // 2
        go_right = cdf[jnp.clip(mid, 0, n_total - 1)] < u
        lo = jnp.where(cont & go_right, mid + 1, lo)
        hi = jnp.where(cont & ~go_right, mid, hi)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return jnp.clip(lo, offset, offset + count - 1)


def eval_hit(scene, meta, si, active):
    """Radiance emitted toward -ray.d at a surface hit (area emitters).

    Mirrors AreaEmitter::eval (src/emitters/area.cpp:64): front side only.
    """
    if scene.emitters.type.shape[0] == 0:
        return jnp.zeros(si.p.shape[:-1] + (3,), jnp.float32)
    has = active & (si.emitter_idx >= 0)
    e = jnp.maximum(si.emitter_idx, 0)
    from ..ops.gather import take_rows
    rad = take_rows(scene.emitters.params, e)[:, 0:3]
    front = si.wi[:, 2] > 0  # local frame: emitter normal side
    return jnp.where((has & front)[:, None], rad, 0.0)


def eval_env(scene, meta, ray_d, active):
    """Environment radiance for escaped rays (constant / envmap)."""
    out = jnp.zeros(ray_d.shape[:-1] + (3,), jnp.float32)
    if E_CONSTANT in meta.emitter_types:
        etypes = scene.emitters.type
        is_const = etypes == E_CONSTANT
        rad = jnp.sum(jnp.where(is_const[:, None],
                                scene.emitters.params[:, 0:3], 0.0), axis=0)
        out = out + jnp.where(active[:, None], rad[None, :], 0.0)
    if E_ENVMAP in meta.emitter_types:
        d_local = m.normalize(
            scene.emitters.env_to_world.inverse().apply_vector(ray_d))
        u, v = _env_uv_from_local(d_local)
        out = out + jnp.where(active[:, None],
                              _env_eval_uv(scene, u, v), 0.0)
    return out


def env_emitter_idx(scene, meta):
    etypes = scene.emitters.type
    is_const = etypes == E_CONSTANT
    return jnp.argmax(is_const)  # only meaningful if present


def spectral_radiance(scene, rgb, e_idx, lam):
    """Promote an RGB emitter quantity (radiance, or radiance/pdf NEE
    weight) to spectral samples at the hero wavelengths.

    Emitters declared with an RGB value use the srgb_d65 expansion
    (src/spectra/srgb_d65.cpp). Emitters declared with a true SPD
    (blackbody / d65 / regular / irregular) evaluate it directly
    (src/spectra/{blackbody,regular,irregular}.cpp); achromatic factors the
    transport folded into ``rgb`` (pdfs, MIS weights, masks) are recovered
    as the luminance ratio against the emitter's packed radiance."""
    from ..core import spectral as sp
    from ..core.spectrum import luminance
    default = sp.emitter_spectrum(rgb, lam)
    e = jnp.maximum(e_idx, 0)
    em = scene.emitters
    kind = em.spec_kind[e]
    param = em.spec_param[e]
    scale = em.spec_scale[e]
    # the packed radiance slot varies by emitter type
    etype = em.type[e]
    offs = jnp.where((etype == E_POINT) | (etype == E_DIRECTIONAL)
                     | (etype == E_PROJECTOR), 3,
                     jnp.where(etype == E_SPOT, 6, 0))
    from ..ops.gather import take_rows
    Pe = take_rows(em.params, e)
    # variable 3-column window via a shifted one-hot reduce
    sel = (jnp.arange(Pe.shape[1])[None, None, :]
           == (offs[:, None, None] + jnp.arange(3)[None, :, None]))
    base_rgb = jnp.sum(jnp.where(sel, Pe[:, None, :], 0.0), axis=-1)
    ratio = luminance(rgb) / jnp.maximum(luminance(base_rgb), 1e-12)
    bb = sp.planck(lam, jnp.maximum(param, 1.0)[:, None]) * scale[:, None]
    # tabulated SPD rows on the regular 360-830 grid
    row = jnp.clip(param.astype(jnp.int32), 0, em.spec_table.shape[0] - 1)
    t = (lam - sp.CIE_MIN) * ((sp.CIE_SAMPLES - 1)
                              / (sp.CIE_MAX - sp.CIE_MIN))
    ok = (lam >= sp.CIE_MIN) & (lam <= sp.CIE_MAX)
    i0 = jnp.clip(t.astype(jnp.int32), 0, sp.CIE_SAMPLES - 2)
    w1 = t - i0
    v0 = em.spec_table[row[:, None], i0]
    v1 = em.spec_table[row[:, None], i0 + 1]
    tab = jnp.where(ok, v0 * (1.0 - w1) + v1 * w1, 0.0)
    spd = jnp.where((kind == 1)[:, None], bb, tab) * ratio[:, None]
    return jnp.where((kind == 0)[:, None], default, spd)


def sample_direction(scene, meta, ref_p, u_sel, u2, active
                     ) -> Tuple[DirectionSample, jnp.ndarray]:
    """Uniformly pick an emitter, sample a direction toward it.

    Returns (DirectionSample with pdf including the 1/E selection factor,
    spectral weight = radiance / pdf). Mirrors
    Scene::sample_emitter_direction without the visibility test — occlusion
    is the integrator's shadow ray.
    """
    E = scene.emitters.type.shape[0]
    N = ref_p.shape[0]
    if E == 0:
        zeros3 = jnp.zeros((N, 3))
        ds = DirectionSample(p=zeros3, n=zeros3, uv=jnp.zeros((N, 2)),
                             d=zeros3, dist=jnp.zeros((N,)),
                             pdf=jnp.zeros((N,)), delta=jnp.zeros((N,), bool),
                             emitter_idx=jnp.full((N,), -1, jnp.int32))
        return ds, zeros3

    e_idx = jnp.minimum((u_sel * E).astype(jnp.int32), E - 1)
    from ..ops.gather import take_many
    etype, P = take_many([scene.emitters.type, scene.emitters.params],
                         e_idx)

    p = jnp.zeros((N, 3))
    n = jnp.zeros((N, 3))
    pdf = jnp.zeros((N,))
    delta = jnp.zeros((N,), bool)
    spec = jnp.zeros((N, 3))

    if E_AREA in meta.emitter_types:
        # sample a triangle from the emitter's area distribution
        off = scene.emitters.tri_offset[e_idx]
        cnt = jnp.maximum(scene.emitters.tri_count[e_idx], 1)
        if E == 1:
            # single-emitter fast path: direct vectorized searchsorted
            pos = jnp.clip(
                jnp.searchsorted(scene.emitters.em_tri_cdf, u2[:, 0],
                                 side='right'),
                0, scene.emitters.em_tri_cdf.shape[0] - 1).astype(jnp.int32)
        else:
            pos = _segment_searchsorted(scene.emitters.em_tri_cdf, off, cnt,
                                        u2[:, 0])
        tri = scene.emitters.em_tri_idx[pos]
        # remap u within the cdf cell for the barycentric sample
        cdf_hi = scene.emitters.em_tri_cdf[pos]
        cdf_lo = jnp.where(pos > off,
                           scene.emitters.em_tri_cdf[jnp.maximum(pos - 1, 0)], 0.0)
        u0 = jnp.clip(m.safe_div(u2[:, 0] - cdf_lo, cdf_hi - cdf_lo),
                      0.0, m.OneMinusEpsilon)
        bary = warp.square_to_uniform_triangle(
            jnp.stack([u0, u2[:, 1]], axis=-1))
        v0 = scene.geo.v0[tri]
        e1 = scene.geo.e1[tri]
        e2 = scene.geo.e2[tri]
        p_a = v0 + bary[:, 0:1] * e1 + bary[:, 1:2] * e2
        n_a = m.normalize(jnp.cross(e1, e2))
        d_a = p_a - ref_p
        dist2 = m.squared_norm(d_a)
        dist_a = m.safe_sqrt(dist2)
        d_a = d_a * m.safe_rcp(dist_a)[:, None]
        cos_l = -m.dot(d_a, n_a)
        area = jnp.maximum(scene.emitters.em_area[e_idx], 1e-20)
        pdf_a = m.safe_div(dist2, cos_l * area)
        ok = cos_l > 0
        pdf_a = jnp.where(ok, pdf_a, 0.0)
        rad_a = jnp.where(ok[:, None], P[:, 0:3], 0.0)
        sel = etype == E_AREA
        p = jnp.where(sel[:, None], p_a, p)
        n = jnp.where(sel[:, None], n_a, n)
        pdf = jnp.where(sel, pdf_a, pdf)
        spec = jnp.where(sel[:, None], rad_a, spec)

    if E_POINT in meta.emitter_types:
        pos_p = P[:, 0:3]
        d_p = pos_p - ref_p
        dist2 = m.squared_norm(d_p)
        inten = P[:, 3:6] * m.safe_rcp(dist2)[:, None]
        sel = etype == E_POINT
        p = jnp.where(sel[:, None], pos_p, p)
        pdf = jnp.where(sel, 1.0, pdf)
        delta = delta | sel
        spec = jnp.where(sel[:, None], inten, spec)

    if E_SPOT in meta.emitter_types:
        pos_p = P[:, 0:3]
        dir_p = m.normalize(P[:, 3:6])
        d_p = pos_p - ref_p
        dist2 = m.squared_norm(d_p)
        dn = m.normalize(-d_p)  # emitter -> ref
        cos_f = m.dot(dn, dir_p)
        cos_cut, cos_beam = P[:, 9], P[:, 10]
        falloff = jnp.clip(m.safe_div(cos_f - cos_cut, cos_beam - cos_cut),
                           0.0, 1.0)
        inside = cos_f > cos_cut
        inten = P[:, 6:9] * (falloff * inside * m.safe_rcp(dist2))[:, None]
        sel = etype == E_SPOT
        p = jnp.where(sel[:, None], pos_p, p)
        pdf = jnp.where(sel, 1.0, pdf)
        delta = delta | sel
        spec = jnp.where(sel[:, None], inten, spec)

    if E_CONSTANT in meta.emitter_types:
        d_c = warp.square_to_uniform_sphere(u2)
        r_world = 2.0 * scene.bsphere_r
        p_c = ref_p + d_c * r_world
        sel = etype == E_CONSTANT
        p = jnp.where(sel[:, None], p_c, p)
        n = jnp.where(sel[:, None], -d_c, n)
        pdf = jnp.where(sel, warp.square_to_uniform_sphere_pdf(d_c), pdf)
        spec = jnp.where(sel[:, None], P[:, 0:3], spec)

    if E_DIRECTIONAL in meta.emitter_types:
        dir_p = m.normalize(P[:, 0:3])
        r_world = 2.0 * scene.bsphere_r
        p_d = ref_p - dir_p * r_world
        sel = etype == E_DIRECTIONAL
        p = jnp.where(sel[:, None], p_d, p)
        pdf = jnp.where(sel, 1.0, pdf)
        delta = delta | sel
        spec = jnp.where(sel[:, None], P[:, 3:6], spec)

    if E_PROJECTOR in meta.emitter_types:
        # delta-position texture projector (projector.cpp:154-193): map the
        # reference point into the emitter frame, look the slide up at the
        # frustum uv, weight = slide * scale * pi / z^2 / cos(axis angle)
        # so a constant slide projects a constant irradiance at z=1.
        from .. import texture as tex_mod
        pos_p = P[:, 0:3]
        Rinv = P[:, 17:26].reshape(-1, 3, 3)
        rel = ref_p - pos_p
        local = jnp.einsum('nij,nj->ni', Rinv, rel)
        z = local[:, 2]
        uu = 0.5 * (1.0 - m.safe_div(m.safe_div(local[:, 0], z), P[:, 6]))
        vv = 0.5 * (1.0 - m.safe_div(m.safe_div(local[:, 1], z), P[:, 7]))
        inside = (z > 0) & (uu >= 0) & (uu <= 1) & (vv >= 0) & (vv <= 1)
        sel = etype == E_PROJECTOR
        tex_id = jnp.where(sel & inside,
                           P[:, 26].astype(jnp.int32) - 1, -1)
        slide = tex_mod.eval(scene, tex_id, jnp.stack([uu, vv], -1))
        slide = jnp.where((P[:, 26] > 0)[:, None], slide, 1.0)
        dist = m.norm(rel)
        cos_axis = m.safe_div(z, dist)      # rotation columns orthonormal
        inten = slide * P[:, 3:6] * (m.Pi * m.safe_rcp(m.sqr(z))
                                     * m.safe_rcp(cos_axis) * inside)[:, None]
        p = jnp.where(sel[:, None], pos_p, p)
        pdf = jnp.where(sel, 1.0, pdf)
        delta = delta | sel
        spec = jnp.where(sel[:, None], inten, spec)

    if E_ENVMAP in meta.emitter_types:
        uu, vv, pdf_uv = _env_sample_uv(scene, u2)
        d_local = _env_dir_from_uv(uu, vv)
        d_w = m.normalize(scene.emitters.env_to_world.apply_vector(d_local))
        p_e = ref_p + d_w * (2.0 * scene.bsphere_r)
        inv_sin = m.safe_rsqrt(jnp.maximum(
            m.sqr(d_local[..., 0]) + m.sqr(d_local[..., 2]), 1e-12))
        pdf_e = pdf_uv * inv_sin / (2.0 * m.Pi * m.Pi)
        spec_e = _env_eval_uv(scene, uu, vv)
        sel = etype == E_ENVMAP
        p = jnp.where(sel[:, None], p_e, p)
        n = jnp.where(sel[:, None], -d_w, n)
        pdf = jnp.where(sel, pdf_e, pdf)
        spec = jnp.where(sel[:, None], spec_e, spec)

    d = p - ref_p
    dist = m.norm(d)
    d = d * m.safe_rcp(dist)[:, None]
    sel_pdf = pdf / E
    weight = jnp.where((sel_pdf > 0)[:, None],
                       spec * m.safe_rcp(sel_pdf)[:, None], 0.0)
    weight = jnp.where(active[:, None], weight, 0.0)
    ds = DirectionSample(p=p, n=n, uv=jnp.zeros((N, 2)), d=d, dist=dist,
                         pdf=jnp.where(active, sel_pdf, 0.0), delta=delta,
                         emitter_idx=jnp.where(active, e_idx, -1))
    return ds, weight


def pdf_direction(scene, meta, ref_p, si, active):
    """Solid-angle pdf of having sampled the hit point ``si`` on its emitter
    via sample_direction (for MIS). Includes the 1/E selection factor."""
    if scene.emitters.type.shape[0] == 0:
        return jnp.zeros(ref_p.shape[:-1], jnp.float32)
    E = max(scene.emitters.type.shape[0], 1)
    has = active & (si.emitter_idx >= 0)
    e = jnp.maximum(si.emitter_idx, 0)
    from ..ops.gather import take_many
    etype, area_e = take_many([scene.emitters.type, scene.emitters.em_area],
                              e)
    pdf = jnp.zeros(ref_p.shape[:-1])

    if E_AREA in meta.emitter_types:
        d = si.p - ref_p
        dist2 = m.squared_norm(d)
        dist = m.safe_sqrt(dist2)
        cos_l = jnp.abs(m.dot(d * m.safe_rcp(dist)[..., None], si.n))
        area = jnp.maximum(area_e, 1e-20)
        pdf_a = m.safe_div(dist2, cos_l * area)
        pdf = jnp.where(etype == E_AREA, pdf_a, pdf)

    if E_CONSTANT in meta.emitter_types:
        pdf = jnp.where(etype == E_CONSTANT, m.InvFourPi, pdf)

    return jnp.where(has, pdf / E, 0.0)


def pdf_env_direction(scene, meta, active, ray_d=None):
    """Solid-angle pdf for escaped rays hitting the env emitter."""
    E = max(scene.emitters.type.shape[0], 1)
    if E_CONSTANT in meta.emitter_types:
        return jnp.where(active, m.InvFourPi / E, 0.0)
    if E_ENVMAP in meta.emitter_types and ray_d is not None:
        d_local = m.normalize(
            scene.emitters.env_to_world.inverse().apply_vector(ray_d))
        u, v = _env_uv_from_local(d_local)
        pdf_uv = _env_pdf_uv(scene, u, v)
        inv_sin = m.safe_rsqrt(jnp.maximum(
            m.sqr(d_local[..., 0]) + m.sqr(d_local[..., 2]), 1e-12))
        pdf = pdf_uv * inv_sin / (2.0 * m.Pi * m.Pi)
        return jnp.where(active, pdf / E, 0.0)
    return jnp.zeros_like(active, jnp.float32)


def sample_ray(scene, meta, u_sel, u_pos, u_dir, active
               ) -> Tuple[Ray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample an emission ray for light tracing (photon/VRL shooting).

    Returns (ray, power_weight, emitter_idx, n_at_origin). The weight is
    flux/pdf so that summing deposited energy reproduces emitter power
    (analog of Endpoint::sample_ray, endpoint.h:42 + vrl.cpp:148).
    """
    E = scene.emitters.type.shape[0]
    N = u_sel.shape[0]
    e_idx = jnp.minimum((u_sel * E).astype(jnp.int32), max(E - 1, 0))
    from ..ops.gather import take_many
    etype, P = take_many([scene.emitters.type, scene.emitters.params],
                         e_idx)
    o = jnp.zeros((N, 3))
    d = jnp.zeros((N, 3))
    w = jnp.zeros((N, 3))
    n_o = jnp.zeros((N, 3))

    if E_AREA in meta.emitter_types:
        off = scene.emitters.tri_offset[e_idx]
        cnt = jnp.maximum(scene.emitters.tri_count[e_idx], 1)
        pos = _segment_searchsorted(scene.emitters.em_tri_cdf, off, cnt,
                                    u_pos[:, 0])
        tri = scene.emitters.em_tri_idx[pos]
        cdf_hi = scene.emitters.em_tri_cdf[pos]
        cdf_lo = jnp.where(pos > off,
                           scene.emitters.em_tri_cdf[jnp.maximum(pos - 1, 0)], 0.0)
        u0 = jnp.clip(m.safe_div(u_pos[:, 0] - cdf_lo, cdf_hi - cdf_lo),
                      0.0, m.OneMinusEpsilon)
        bary = warp.square_to_uniform_triangle(
            jnp.stack([u0, u_pos[:, 1]], axis=-1))
        v0 = scene.geo.v0[tri]
        p_a = v0 + bary[:, 0:1] * scene.geo.e1[tri] + bary[:, 1:2] * scene.geo.e2[tri]
        n_a = m.normalize(jnp.cross(scene.geo.e1[tri], scene.geo.e2[tri]))
        local = warp.square_to_cosine_hemisphere(u_dir)
        frame = Frame.from_normal(n_a)
        d_a = frame.to_world(local)
        area = jnp.maximum(scene.emitters.em_area[e_idx], 1e-20)
        # power weight: L * pi * area (cosine-sampled dir cancels cos/pdf)
        w_a = P[:, 0:3] * (m.Pi * area)[:, None]
        sel = etype == E_AREA
        o = jnp.where(sel[:, None], p_a, o)
        d = jnp.where(sel[:, None], d_a, d)
        w = jnp.where(sel[:, None], w_a, w)
        n_o = jnp.where(sel[:, None], n_a, n_o)

    if E_POINT in meta.emitter_types:
        d_p = warp.square_to_uniform_sphere(u_dir)
        sel = etype == E_POINT
        o = jnp.where(sel[:, None], P[:, 0:3], o)
        d = jnp.where(sel[:, None], d_p, d)
        w = jnp.where(sel[:, None], P[:, 3:6] * (4.0 * m.Pi), w)
        n_o = jnp.where(sel[:, None], d_p, n_o)

    if E_SPOT in meta.emitter_types:
        cos_cut = P[:, 9]
        local = warp.square_to_uniform_cone(u_dir, cos_cut)
        frame = Frame.from_normal(m.normalize(P[:, 3:6]))
        d_s = frame.to_world(local)
        cos_beam = P[:, 10]
        cos_f = local[:, 2]
        falloff = jnp.clip(m.safe_div(cos_f - cos_cut, cos_beam - cos_cut),
                           0.0, 1.0)
        inv_pdf = 2.0 * m.Pi * (1.0 - cos_cut)
        sel = etype == E_SPOT
        o = jnp.where(sel[:, None], P[:, 0:3], o)
        d = jnp.where(sel[:, None], d_s, d)
        w = jnp.where(sel[:, None], P[:, 6:9] * (falloff * inv_pdf)[:, None], w)
        n_o = jnp.where(sel[:, None], d_s, n_o)

    if E_CONSTANT in meta.emitter_types:
        # ConstantBackgroundEmitter::sample_ray (constant.cpp:60-79):
        # origin uniform on the scene bounding sphere, direction cosine-
        # sampled about the inward normal; weight = L * 4 pi^2 R^2
        # (1/(4 pi R^2) position pdf x cos/pi direction pdf, cos cancels).
        R = scene.bsphere_r
        v0 = warp.square_to_uniform_sphere(u_pos)
        v1 = warp.square_to_cosine_hemisphere(u_dir)
        fr_c = Frame.from_normal(-v0)
        o_c = scene.bsphere_c[None, :] + v0 * R
        d_c = fr_c.to_world(v1)
        w_c = P[:, 0:3] * (4.0 * m.sqr(m.Pi * R))
        sel = etype == E_CONSTANT
        o = jnp.where(sel[:, None], o_c, o)
        d = jnp.where(sel[:, None], d_c, d)
        w = jnp.where(sel[:, None], w_c, w)
        n_o = jnp.where(sel[:, None], -v0, n_o)

    if E_DIRECTIONAL in meta.emitter_types:
        # DirectionalEmitter::sample_ray (directional.cpp:80-106): origin on
        # the disk perpendicular to the beam on the bounding sphere, fixed
        # direction; weight = E * pi R^2 (disk area / uniform-disk pdf).
        R = scene.bsphere_r
        d_dir = m.normalize(P[:, 0:3])
        fr_d = Frame.from_normal(d_dir)
        disk_d = warp.square_to_uniform_disk_concentric(u_pos) * R
        perp = fr_d.to_world(jnp.concatenate(
            [disk_d, jnp.zeros((N, 1))], axis=-1))
        o_d = scene.bsphere_c[None, :] + perp - d_dir * R
        w_d = P[:, 3:6] * (m.Pi * R * R)
        sel = etype == E_DIRECTIONAL
        o = jnp.where(sel[:, None], o_d, o)
        d = jnp.where(sel[:, None], d_dir, d)
        w = jnp.where(sel[:, None], w_d, w)
        n_o = jnp.where(sel[:, None], d_dir, n_o)

    if E_PROJECTOR in meta.emitter_types:
        # shoot through the frustum from the pinhole (projector.cpp:119-152;
        # deviation: uv sampled uniformly instead of by texel density — an
        # unbiased simplification, higher variance only for sparse slides)
        from .. import texture as tex_mod
        uu, vv = u_dir[:, 0], u_dir[:, 1]
        dx = (1.0 - 2.0 * uu) * P[:, 6]
        dy = (1.0 - 2.0 * vv) * P[:, 7]
        d_local = m.normalize(jnp.stack([dx, dy, jnp.ones_like(dx)], -1))
        Rm = P[:, 8:17].reshape(-1, 3, 3)
        d_p = m.normalize(jnp.einsum('nij,nj->ni', Rm, d_local))
        sel = etype == E_PROJECTOR
        tex_id = jnp.where(sel, P[:, 26].astype(jnp.int32) - 1, -1)
        slide = tex_mod.eval(scene, tex_id, jnp.stack([uu, vv], -1))
        slide = jnp.where((P[:, 26] > 0)[:, None], slide, 1.0)
        w_p = slide * P[:, 3:6]     # uniform uv pdf = 1 on the unit square
        o = jnp.where(sel[:, None], P[:, 0:3], o)
        d = jnp.where(sel[:, None], d_p, d)
        w = jnp.where(sel[:, None], w_p, w)
        n_o = jnp.where(sel[:, None], d_p, n_o)

    if E_ENVMAP in meta.emitter_types:
        # direction toward the envmap sampled by luminance; photons start on
        # the disk perpendicular to it on the bounding sphere and fly inward
        uu, vv, pdf_uv = _env_sample_uv(scene, u_dir)
        d_local = _env_dir_from_uv(uu, vv)
        d_w = m.normalize(scene.emitters.env_to_world.apply_vector(d_local))
        inv_sin = m.safe_rsqrt(jnp.maximum(
            m.sqr(d_local[..., 0]) + m.sqr(d_local[..., 2]), 1e-12))
        pdf_dir = jnp.maximum(pdf_uv * inv_sin / (2.0 * m.Pi * m.Pi), 1e-20)
        R = scene.bsphere_r
        from ..core.frame import Frame as _Frame
        fr = _Frame.from_normal(d_w)
        disk = warp.square_to_uniform_disk_concentric(u_pos) * R
        o_e = scene.bsphere_c[None, :] + d_w * R \
            + fr.to_world(jnp.concatenate(
                [disk, jnp.zeros((N, 1))], axis=-1))
        L_e = _env_eval_uv(scene, uu, vv)
        w_e = L_e * (m.Pi * R * R / pdf_dir)[:, None]
        sel = etype == E_ENVMAP
        o = jnp.where(sel[:, None], o_e, o)
        d = jnp.where(sel[:, None], -d_w, d)
        w = jnp.where(sel[:, None], w_e, w)
        n_o = jnp.where(sel[:, None], -d_w, n_o)

    # selection pdf 1/E -> multiply weight by E
    w = w * E
    ray = Ray.make(o, m.normalize(jnp.where(m.squared_norm(d, True) > 0, d,
                                            jnp.asarray([0.0, 0.0, 1.0]))))
    return ray, jnp.where(active[:, None], w, 0.0), e_idx, n_o
