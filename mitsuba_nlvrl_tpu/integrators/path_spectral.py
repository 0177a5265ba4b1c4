"""Hero-wavelength spectral path tracer.

The ``*_spectral`` variant of the wavefront path integrator: each lane
carries 4 stratified hero wavelengths importance-sampled from the RGB
camera distribution (spectrum.h:271-314), the throughput is a (N, 4)
spectral sample vector, and every RGB-packed scene quantity is upsampled
on the fly with the sigmoid-polynomial model (core/spectral.py):

  * BSDF weights via ``upsample_weight`` — chroma through the reflectance
    model, achromatic geometry/pdf factors pass through exactly. Named
    conductors with tabulated .spd complex-IOR curves additionally swap
    the upsampled RGB Fresnel for the true per-wavelength
    F(lambda, cos_h) (bsdf.spectral_fresnel_ratio), matching the
    reference's spectral conductor.cpp evaluation.
  * RGB emitters via ``emitter_spectrum`` — upsampled chroma times the D65
    illuminant, the reference's srgb_d65 expansion (src/spectra/srgb_d65.cpp).
  * blackbody emitters evaluate Planck's law directly at the hero
    wavelengths (src/spectra/blackbody.cpp); tabulated regular/irregular
    emitter spectra interpolate their measured curve (src/spectra/
    regular.cpp, irregular.cpp) from the scene's spectra table.

The final estimate integrates against the CIE curves and converts to
linear sRGB inside the integrator (imageblock.h:110-118), so the film /
render pipeline is unchanged. Sampling decisions (NEE, lobe choice, RR)
use the shared RGB dispatch and are wavelength-independent: no spectral
MIS terms are needed (the reference's path tracer relies on the same
property; dielectrics have scalar IOR, so there is no dispersion either).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core import spectral as sp
from ..core.ray import Ray, spawn_ray
from ..core.rng import Sampler
from .. import bsdf as bsdf_mod
from .. import emitter as emitter_mod
from ..ops import intersect as isect
from .common import mis_weight, russian_roulette


class SpecPathState(NamedTuple):
    sampler: Sampler
    ray: Ray
    throughput: jnp.ndarray      # (N, 4) spectral
    result: jnp.ndarray          # (N, 4) spectral radiance
    eta: jnp.ndarray
    depth: jnp.ndarray
    active: jnp.ndarray
    prev_pdf: jnp.ndarray
    prev_delta: jnp.ndarray
    prev_p: jnp.ndarray
    lam: jnp.ndarray             # (N, 4) hero wavelengths


def sample(scene, meta, sampler: Sampler, ray: Ray, active=None,
           diff: bool = False, aux=None):
    """Spectral L_i estimate developed to linear sRGB: (rgb, valid,
    sampler)."""
    N = ray.o.shape[0]
    if active is None:
        active = jnp.ones((N,), bool)
    max_depth = meta.iprop('max_depth', -1)
    if max_depth is None or max_depth < 0:
        max_depth = 64
    rr_depth = meta.iprop('rr_depth', 5)

    # wavelength sample: golden-ratio sequence over the wavefront with a
    # per-pass Cranley-Patterson rotation — marginally uniform per lane
    # (unbiased) but near-stratified across the film, which sharply cuts
    # the hero-wavelength chroma noise of film-level statistics
    u_r, sampler = sampler.next_1d()
    idx = jnp.arange(N, dtype=jnp.float32)
    u_lam = jnp.mod(idx * 0.6180339887498949 + u_r[0], 1.0)
    lam, inv_pdf = sp.sample_hero_wavelengths(u_lam)

    st = SpecPathState(
        sampler=sampler, ray=ray,
        throughput=jnp.ones((N, sp.N_HERO)),
        result=jnp.zeros((N, sp.N_HERO)),
        eta=jnp.ones((N,)), depth=jnp.int32(0), active=active,
        prev_pdf=jnp.ones((N,)), prev_delta=jnp.ones((N,), bool),
        prev_p=ray.o, lam=lam)

    def cond(st: SpecPathState):
        return (st.depth < max_depth) & jnp.any(st.active)

    def body(st: SpecPathState):
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
        result = st.result + st.throughput * (le_s + le_env_s)

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
        f_val = bsdf_mod.eval(scene, meta, si, wo_local)
        b_pdf = bsdf_mod.pdf(scene, meta, si, wo_local)
        w_nee = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, b_pdf))
        em_weight_s = emitter_mod.spectral_radiance(scene, em_weight,
                                                    ds.emitter_idx, st.lam)
        f_s = sp.upsample_weight(f_val, st.lam)
        fr_nee = bsdf_mod.spectral_fresnel_ratio(scene, meta, si, wo_local,
                                                 st.lam)
        if fr_nee is not None:
            f_s = f_s * fr_nee
        contrib = st.throughput * f_s * em_weight_s * w_nee[:, None]
        result = result + jnp.where((nee_active & ~occluded)[:, None],
                                    contrib, 0.0)

        # --- bsdf sampling --------------------------------------------------
        u1b, smp = smp.next_1d()
        u2b, smp = smp.next_2d()
        bs, b_weight = bsdf_mod.sample(scene, meta, si, u1b, u2b)
        w_s = sp.upsample_weight(b_weight, st.lam)
        fr_b = bsdf_mod.spectral_fresnel_ratio(scene, meta, si, bs.wo,
                                               st.lam)
        if fr_b is not None:
            w_s = w_s * fr_b
        throughput = st.throughput * w_s
        eta = st.eta * bs.eta
        wo_world = si.to_world(bs.wo)
        new_ray = spawn_ray(si.p, wo_world)
        active = active & (bs.pdf > 0) & jnp.any(throughput > 0, axis=-1)

        # --- russian roulette ----------------------------------------------
        u_rr, smp = smp.next_1d()
        survive, throughput = russian_roulette(throughput, eta, st.depth,
                                               rr_depth, u_rr)
        active = active & survive

        return SpecPathState(
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
    rgb = sp.spectral_to_srgb(st.result, lam, inv_pdf)
    return rgb, jnp.ones((N,), bool), st.sampler
