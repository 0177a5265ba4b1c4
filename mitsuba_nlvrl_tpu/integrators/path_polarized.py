"""Polarized wavefront path tracer: Mueller-matrix throughput.

The polarized-variant analog of the reference path plugin compiled with
``is_polarized_v<Spectrum>`` (src/integrators/path.cpp:126-207 where
Spectrum = MuellerMatrix<Color3f>): the per-lane throughput is a world
Stokes-frame Mueller matrix ``(N, 3, 4, 4)``, emitters contribute
unpolarized Stokes vectors through its first column, and NEE/BSDF weights
come from the polarized BSDF layer (bsdf/polarized.py). The random stream
matches the scalar path tracer exactly, so on scenes without
polarization-aware BSDFs S0 reproduces the unpolarized render bit-for-bit.

The accumulated Stokes vectors live in the implicit frame
``stokes_basis(-ray.d)`` of each camera ray; ``sample_full`` applies the
final rotation into the sensor's horizontal/vertical frame
(stokes.cpp:95-103) before returning them.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core import mueller as mu
from ..core.ray import Ray, spawn_ray
from ..core.rng import Sampler
from ..bsdf import polarized as bpol
from .. import bsdf as bsdf_mod
from .. import emitter as emitter_mod
from ..ops import intersect as isect
from .common import mis_weight


class PolPathState(NamedTuple):
    sampler: Sampler
    ray: Ray
    throughput: jnp.ndarray      # (N, 3, 4, 4) Mueller
    result: jnp.ndarray          # (N, 3, 4) Stokes per RGB channel
    eta: jnp.ndarray
    depth: jnp.ndarray
    active: jnp.ndarray
    prev_pdf: jnp.ndarray
    prev_delta: jnp.ndarray
    prev_p: jnp.ndarray


def _emit(throughput, le):
    """Stokes contribution of an unpolarized emitter seen through a Mueller
    throughput: T @ [Le,0,0,0] = Le * first column of T."""
    return le[:, :, None] * throughput[..., :, 0]


def sample_stokes_vec(scene, meta, sampler: Sampler, ray: Ray, active=None,
                      diff: bool = False, aux=None):
    """Polarized L_i estimate: returns (stokes (N, 3, 4), valid, sampler)
    in the implicit Stokes frame of each camera ray."""
    N = ray.o.shape[0]
    if active is None:
        active = jnp.ones((N,), bool)
    max_depth = meta.iprop('max_depth', -1)
    if max_depth is None or max_depth < 0:
        max_depth = 64
    rr_depth = meta.iprop('rr_depth', 5)

    st = PolPathState(
        sampler=sampler, ray=ray,
        throughput=jnp.broadcast_to(jnp.eye(4), (N, 3, 4, 4)),
        result=jnp.zeros((N, 3, 4)),
        eta=jnp.ones((N,)), depth=jnp.int32(0), active=active,
        prev_pdf=jnp.ones((N,)), prev_delta=jnp.ones((N,), bool),
        prev_p=ray.o)

    def cond(st: PolPathState):
        return (st.depth < max_depth) & jnp.any(st.active)

    def body(st: PolPathState):
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
        result = st.result \
            + _emit(st.throughput, le * w_hit[:, None]) \
            + _emit(st.throughput, le_env * w_env[:, None])

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
        M_nee = bpol.eval_pol(scene, meta, si, wo_local)
        b_pdf = bsdf_mod.pdf(scene, meta, si, wo_local)
        w_nee = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, b_pdf))
        contrib = _emit(st.throughput @ M_nee,
                        em_weight * w_nee[:, None])
        result = result + jnp.where((nee_active & ~occluded)
                                    [:, None, None], contrib, 0.0)

        # --- bsdf sampling --------------------------------------------------
        u1b, smp = smp.next_1d()
        u2b, smp = smp.next_2d()
        bs, M_w = bpol.sample_pol(scene, meta, si, u1b, u2b)
        throughput = st.throughput @ M_w
        eta = st.eta * bs.eta
        wo_world = si.to_world(bs.wo)
        new_ray = spawn_ray(si.p, wo_world)
        tp_unpol = throughput[..., 0, 0]       # depolarize(throughput)
        active = active & (bs.pdf > 0) & jnp.any(tp_unpol > 0, axis=-1)

        # --- russian roulette (path.cpp:147-150 on depolarized power) -------
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

        return PolPathState(
            sampler=smp,
            ray=Ray(o=jnp.where(active[:, None], new_ray.o, st.ray.o),
                    d=jnp.where(active[:, None], new_ray.d, st.ray.d),
                    mint=new_ray.mint, maxt=new_ray.maxt),
            throughput=throughput, result=result, eta=eta,
            depth=st.depth + 1, active=active,
            prev_pdf=jnp.where(active, bs.pdf, st.prev_pdf),
            prev_delta=jnp.where(active, bs.delta, st.prev_delta),
            prev_p=jnp.where(active[:, None], si.p, st.prev_p))

    if diff:
        ck_body = jax.checkpoint(lambda s, _: (body(s), None))
        st, _ = jax.lax.scan(ck_body, st, None, length=max_depth)
    else:
        st = jax.lax.while_loop(cond, body, st)
    return st.result, jnp.ones((N,), bool), st.sampler


def sensor_frame_rotation(scene, ray: Ray):
    """Rotator aligning each camera ray's implicit Stokes frame with the
    sensor's horizontal axis (stokes.cpp:95-103): the target basis is
    ``cross(ray.d, up)`` with up = sensor-to-world (0, 1, 0)."""
    up = scene.sensor.to_world.apply_vector(
        jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32))  # (1, 3)
    fwd = -ray.d
    current = mu.stokes_basis(fwd)
    target = jnp.cross(ray.d, jnp.broadcast_to(up, ray.d.shape))
    tn = m.norm(target)
    target = jnp.where((tn > 1e-6)[:, None],
                       target / jnp.maximum(tn, 1e-12)[:, None], current)
    return mu.rotate_stokes_basis(fwd, current, target)


def sample_full(scene, meta, sampler: Sampler, ray: Ray, active=None,
                diff: bool = False, aux=None):
    """Sensor-frame Stokes estimate: (stokes (N, 3, 4), valid, sampler)."""
    stokes, valid, sampler = sample_stokes_vec(scene, meta, sampler, ray,
                                               active, diff=diff, aux=aux)
    R = sensor_frame_rotation(scene, ray)          # (N, 4, 4)
    stokes = jnp.einsum('nij,ncj->nci', R, stokes)
    return stokes, valid, sampler
