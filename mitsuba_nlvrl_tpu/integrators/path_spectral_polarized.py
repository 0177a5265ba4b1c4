"""Spectral + polarized path tracer: Mueller throughput per hero wavelength.

The ``*_spectral_polarized`` variant analog (the reference compiles
Spectrum = MuellerMatrix<Spectrum<Float, 4>>, mitsuba.conf.template):
each lane carries 4 hero wavelengths AND a (4, 4) Mueller throughput per
wavelength — state is (N, 4lam, 4, 4).

Spectral Mueller assembly (documented deviation, validated in
tests/test_spectral_polarized.py): the polarized BSDF layer evaluates
RGB-packed Mueller matrices (bsdf/polarized.py). For each hero wavelength
the INTENSITY m00 is upsampled with the same sigmoid-polynomial model the
unpolarized spectral variant uses (core/spectral.py), while the NORMALIZED
polarization structure M/m00 is taken from the RGB band containing the
wavelength (B < 490nm <= G < 580nm <= R). For achromatic Mueller
structures — ideal polarizer/retarder/circular, dielectrics with scalar
IOR, diffuse — the structure is channel-independent and the factorization
is EXACT. For named conductor materials with tabulated .spd IOR curves
both the Mueller MAGNITUDE and the normalized polarization STRUCTURE
(phase retardation) come per hero wavelength from ONE fused complex-IOR
curve gather (bsdf.polarized.spectral_conductor_terms, which also
resolves normalmap/bumpmap wrapper rows) — matching the reference's
is_spectral_v conductor arm exactly. Only RGB-literal conductors (no
tabulated curve) and blendbsdf-wrapped ones keep the band-quantized
structure.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core import spectral as sp
from ..core.ray import Ray, spawn_ray
from ..core.rng import Sampler
from ..bsdf import polarized as bpol
from .. import bsdf as bsdf_mod
from .. import emitter as emitter_mod
from ..ops import intersect as isect
from .common import mis_weight
from .path_polarized import sensor_frame_rotation


def _band_of(lam):
    """RGB band index per wavelength: R=0, G=1, B=2."""
    return jnp.where(lam < 490.0, 2, jnp.where(lam < 580.0, 1, 0))


def mueller_to_spectral(M_rgb, lam):
    """(N, 3, 4, 4) RGB Mueller + (N, H) wavelengths -> (N, H, 4, 4):
    upsampled m00 times the band's normalized polarization structure."""
    m00 = jnp.maximum(M_rgb[..., 0, 0], 0.0)                # (N, 3)
    s = sp.upsample_weight(m00, lam)                        # (N, H)
    band = _band_of(lam)                                    # (N, H)
    onehot = (jnp.arange(3)[None, None, :] == band[..., None])  # (N, H, 3)
    M_b = jnp.sum(jnp.where(onehot[..., None, None],
                            M_rgb[:, None, :, :, :], 0.0), axis=2)
    m00_b = jnp.sum(jnp.where(onehot, m00[:, None, :], 0.0), axis=2)
    P = M_b * m.safe_rcp(m00_b)[..., None, None]
    return jnp.where((m00_b > 1e-12)[..., None, None],
                     s[..., None, None] * P, 0.0)


class SpecPolState(NamedTuple):
    sampler: Sampler
    ray: Ray
    throughput: jnp.ndarray      # (N, H, 4, 4) Mueller per hero wavelength
    result: jnp.ndarray          # (N, H, 4) Stokes per hero wavelength
    eta: jnp.ndarray
    depth: jnp.ndarray
    active: jnp.ndarray
    prev_pdf: jnp.ndarray
    prev_delta: jnp.ndarray
    prev_p: jnp.ndarray
    lam: jnp.ndarray             # (N, H)


def _emit(throughput, le_s):
    """Unpolarized spectral emitter through a Mueller throughput:
    le (N, H) times the first column of T (N, H, 4, 4)."""
    return le_s[..., None] * throughput[..., :, 0]


def sample_stokes_vec(scene, meta, sampler: Sampler, ray: Ray, active=None,
                      diff: bool = False, aux=None):
    """Spectral polarized L_i: (stokes (N, H, 4), lam, inv_pdf, valid,
    sampler) in the implicit Stokes frame of each camera ray."""
    N = ray.o.shape[0]
    H = sp.N_HERO
    if active is None:
        active = jnp.ones((N,), bool)
    max_depth = meta.iprop('max_depth', -1)
    if max_depth is None or max_depth < 0:
        max_depth = 64
    rr_depth = meta.iprop('rr_depth', 5)

    # wavelength sample: same golden-ratio film stratification as the
    # unpolarized spectral variant
    u_r, sampler = sampler.next_1d()
    idx = jnp.arange(N, dtype=jnp.float32)
    u_lam = jnp.mod(idx * 0.6180339887498949 + u_r[0], 1.0)
    lam, inv_pdf = sp.sample_hero_wavelengths(u_lam)

    st = SpecPolState(
        sampler=sampler, ray=ray,
        throughput=jnp.broadcast_to(jnp.eye(4), (N, H, 4, 4)),
        result=jnp.zeros((N, H, 4)),
        eta=jnp.ones((N,)), depth=jnp.int32(0), active=active,
        prev_pdf=jnp.ones((N,)), prev_delta=jnp.ones((N,), bool),
        prev_p=ray.o, lam=lam)

    def cond(st: SpecPolState):
        return (st.depth < max_depth) & jnp.any(st.active)

    def body(st: SpecPolState):
        si = isect.ray_intersect(scene, st.ray)
        smp0 = st.sampler.count_rays(st.active)

        le = emitter_mod.eval_hit(scene, meta, si, st.active & si.valid)
        em_pdf = emitter_mod.pdf_direction(scene, meta, st.prev_p, si,
                                           st.active & si.valid)
        escaped = st.active & ~si.valid
        le_env = emitter_mod.eval_env(scene, meta, st.ray.d, escaped)
        env_pdf = emitter_mod.pdf_env_direction(scene, meta, escaped,
                                                st.ray.d)
        w_hit = jnp.where(st.prev_delta, 1.0, mis_weight(st.prev_pdf, em_pdf))
        w_env = jnp.where(st.prev_delta, 1.0, mis_weight(st.prev_pdf, env_pdf))
        le_s = emitter_mod.spectral_radiance(scene, le * w_hit[:, None],
                                             si.emitter_idx, st.lam)
        le_env_rgb = le_env * w_env[:, None]
        if emitter_mod.E_CONSTANT in meta.emitter_types:
            e_env = jnp.broadcast_to(emitter_mod.env_emitter_idx(scene, meta),
                                     le_env.shape[:1]).astype(jnp.int32)
            le_env_s = emitter_mod.spectral_radiance(scene, le_env_rgb,
                                                     e_env, st.lam)
        else:
            le_env_s = sp.emitter_spectrum(le_env_rgb, st.lam)
        result = st.result + _emit(st.throughput, le_s + le_env_s)

        active = st.active & si.valid & (st.depth + 1 < max_depth)

        smp = smp0
        # --- next event estimation ----------------------------------------
        u_sel, smp = smp.next_1d()
        u2, smp = smp.next_2d()
        ds, em_weight = emitter_mod.sample_direction(
            scene, meta, si.p, u_sel, u2, active)
        nee_active = active & (ds.pdf > 0)
        smp = smp.count_rays(nee_active)
        sh_ray = spawn_ray(si.p, ds.d,
                           maxt=ds.dist * (1.0 - m.ShadowEpsilon))
        occluded = isect.ray_test(scene, sh_ray)
        wo_local = si.to_local(ds.d)
        M_nee = mueller_to_spectral(
            bpol.eval_pol(scene, meta, si, wo_local), st.lam)
        ov = bpol.spectral_conductor_terms(scene, meta, si, wo_local,
                                           st.lam)
        if ov is not None:
            # fused per-lambda conductor terms (one complex-IOR curve
            # gather): Fresnel magnitude ratio + true per-lambda Mueller
            # structure (phase retardation)
            fr_nee, use, Mw = ov
            M_nee = M_nee * fr_nee[..., None, None]
            M_nee = jnp.where(use[:, None, None, None],
                              M_nee[..., 0:1, 0:1] * Mw, M_nee)
        b_pdf = bsdf_mod.pdf(scene, meta, si, wo_local)
        w_nee = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, b_pdf))
        em_weight_s = emitter_mod.spectral_radiance(scene, em_weight,
                                                    ds.emitter_idx, st.lam)
        contrib = _emit(st.throughput @ M_nee,
                        em_weight_s * w_nee[:, None])
        result = result + jnp.where((nee_active & ~occluded)
                                    [:, None, None], contrib, 0.0)

        # --- bsdf sampling --------------------------------------------------
        u1b, smp = smp.next_1d()
        u2b, smp = smp.next_2d()
        bs, M_w = bpol.sample_pol(scene, meta, si, u1b, u2b)
        M_ws = mueller_to_spectral(M_w, st.lam)
        ov_b = bpol.spectral_conductor_terms(scene, meta, si, bs.wo,
                                             st.lam, null_lane=bs.null)
        if ov_b is not None:
            fr_b, use_b, Mw_b = ov_b
            M_ws = M_ws * fr_b[..., None, None]
            M_ws = jnp.where(use_b[:, None, None, None],
                             M_ws[..., 0:1, 0:1] * Mw_b, M_ws)
        throughput = st.throughput @ M_ws
        eta = st.eta * bs.eta
        wo_world = si.to_world(bs.wo)
        new_ray = spawn_ray(si.p, wo_world)
        tp_unpol = throughput[..., 0, 0]       # (N, H) depolarized
        active = active & (bs.pdf > 0) & jnp.any(tp_unpol > 0, axis=-1)

        # --- russian roulette on depolarized spectral power ------------------
        u_rr, smp = smp.next_1d()
        do_rr = st.depth >= rr_depth
        q = jnp.minimum(
            jax.lax.stop_gradient(jnp.max(tp_unpol, axis=-1) * m.sqr(eta)),
            0.95)
        survive = jnp.where(do_rr, u_rr < q, True)
        throughput = jnp.where(
            (do_rr & survive)[:, None, None, None],
            throughput * m.safe_rcp(q)[:, None, None, None], throughput)
        active = active & survive

        return SpecPolState(
            sampler=smp,
            ray=Ray(o=jnp.where(active[:, None], new_ray.o, st.ray.o),
                    d=jnp.where(active[:, None], new_ray.d, st.ray.d),
                    mint=new_ray.mint, maxt=new_ray.maxt),
            throughput=throughput, result=result, eta=eta,
            depth=st.depth + 1, active=active,
            prev_pdf=jnp.where(active, bs.pdf, st.prev_pdf),
            prev_delta=jnp.where(active, bs.delta, st.prev_delta),
            prev_p=jnp.where(active[:, None], si.p, st.prev_p),
            lam=st.lam)

    if diff:
        ck_body = jax.checkpoint(lambda s, _: (body(s), None))
        st, _ = jax.lax.scan(ck_body, st, None, length=max_depth)
    else:
        st = jax.lax.while_loop(cond, body, st)
    return st.result, lam, inv_pdf, jnp.ones((N,), bool), st.sampler


def sample_full(scene, meta, sampler: Sampler, ray: Ray, active=None,
                diff: bool = False, aux=None):
    """Sensor-frame sRGB Stokes estimate: (stokes (N, 3, 4), valid,
    sampler). Each Stokes component develops through the CIE curves like
    spectral radiance (S1-S3 are signed; the development is linear, so the
    integral stays correct)."""
    spec, lam, inv_pdf, valid, sampler = sample_stokes_vec(
        scene, meta, sampler, ray, active, diff=diff, aux=aux)
    R = sensor_frame_rotation(scene, ray)          # (N, 4, 4)
    spec = jnp.einsum('nij,nhj->nhi', R, spec)
    stokes = jnp.stack(
        [sp.spectral_to_srgb(spec[..., c], lam, inv_pdf) for c in range(4)],
        axis=-1)                                   # (N, 3, 4)
    return stokes, valid, sampler


def sample(scene, meta, sampler: Sampler, ray: Ray, active=None,
           diff: bool = False, aux=None):
    """Radiance-only entry (S0) for use as a plain integrator."""
    stokes, valid, sampler = sample_full(scene, meta, sampler, ray, active,
                                         diff=diff, aux=aux)
    return stokes[:, :, 0], valid, sampler
