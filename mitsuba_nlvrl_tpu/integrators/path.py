"""Wavefront path tracer with NEE + MIS.

TPU-native redesign of the reference ``path`` plugin
(src/integrators/path.cpp:110-251): the per-ray recursion becomes a masked
``lax.while_loop`` over a whole ray wavefront. Each iteration: intersect,
(MIS-weighted) emitter-hit accounting, next-event estimation with one shadow
ray, BSDF sampling, Russian roulette. Dirac lobes are tracked with masks
instead of BSDFFlags.
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
from ..ops import intersect as isect
from .common import mis_weight, russian_roulette


class PathState(NamedTuple):
    sampler: Sampler
    ray: Ray
    throughput: jnp.ndarray
    result: jnp.ndarray
    eta: jnp.ndarray
    depth: jnp.ndarray           # (N,) int32 per-lane bounce count
    active: jnp.ndarray
    prev_pdf: jnp.ndarray        # bsdf pdf of previous bounce
    prev_delta: jnp.ndarray      # previous bounce sampled a delta lobe
    prev_p: jnp.ndarray          # previous path vertex (for emitter pdf)


def make_body(scene, meta, N: int):
    """One bounce iteration as a standalone PathState -> PathState
    function — used by sample() and re-used verbatim by the
    regeneration scheduler (integrators/regen.py), so both lane
    schedulers run the identical estimator. Depth is PER-LANE (under
    the fused while_loop every live lane bounces every iteration, so
    per-lane depth equals the loop counter and the estimator is
    unchanged; the regeneration scheduler needs the per-lane form
    because refilled lanes restart at depth 0)."""
    max_depth = meta.iprop('max_depth', -1)
    if max_depth is None or max_depth < 0:
        max_depth = 64
    rr_depth = meta.iprop('rr_depth', 5)

    def body(st: PathState):
        si = isect.ray_intersect(scene, st.ray)
        smp0 = st.sampler.count_rays(st.active)   # primary/bounce rays

        # --- hit emitter / environment accounting (MIS vs prev NEE) ---
        le = emitter_mod.eval_hit(scene, meta, si, st.active & si.valid)
        em_pdf = emitter_mod.pdf_direction(scene, meta, st.prev_p, si,
                                           st.active & si.valid)
        escaped = st.active & ~si.valid
        le_env = emitter_mod.eval_env(scene, meta, st.ray.d, escaped)
        env_pdf = emitter_mod.pdf_env_direction(scene, meta, escaped,
                                                st.ray.d)
        # delta previous bounce (or first ray): no NEE at prev vertex
        w_hit = jnp.where(st.prev_delta, 1.0,
                          mis_weight(st.prev_pdf, em_pdf))
        w_env = jnp.where(st.prev_delta, 1.0,
                          mis_weight(st.prev_pdf, env_pdf))
        result = st.result + st.throughput * le * w_hit[:, None] \
            + st.throughput * le_env * w_env[:, None]

        active = st.active & si.valid & (st.depth + 1 < max_depth)

        smp = smp0
        # --- next event estimation -------------------------------------
        u_sel, smp = smp.next_1d()
        u2, smp = smp.next_2d()
        ds, em_weight = emitter_mod.sample_direction(
            scene, meta, si.p, u_sel, u2, active)
        nee_active = active & (ds.pdf > 0)
        smp = smp.count_rays(nee_active)          # shadow rays
        sh_ray = spawn_ray(si.p, ds.d,
                           maxt=ds.dist * (1.0 - m.ShadowEpsilon))
        occluded = isect.ray_test(scene, sh_ray)
        wo_local = si.to_local(ds.d)
        f_val = bsdf_mod.eval(scene, meta, si, wo_local)
        b_pdf = bsdf_mod.pdf(scene, meta, si, wo_local)
        w_nee = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, b_pdf))
        contrib = st.throughput * f_val * em_weight * w_nee[:, None]
        result = result + jnp.where((nee_active & ~occluded)[:, None],
                                    contrib, 0.0)

        # --- bsdf sampling ---------------------------------------------
        u1b, smp = smp.next_1d()
        u2b, smp = smp.next_2d()
        bs, b_weight = bsdf_mod.sample(scene, meta, si, u1b, u2b)
        throughput = st.throughput * b_weight
        eta = st.eta * bs.eta
        wo_world = si.to_world(bs.wo)
        new_ray = spawn_ray(si.p, wo_world)
        active = active & (bs.pdf > 0) & jnp.any(throughput > 0, axis=-1)

        # --- russian roulette ------------------------------------------
        u_rr, smp = smp.next_1d()
        survive, throughput = russian_roulette(throughput, eta, st.depth,
                                               rr_depth, u_rr)
        active = active & survive

        return PathState(
            sampler=smp,
            ray=Ray(o=jnp.where(active[:, None], new_ray.o, st.ray.o),
                    d=jnp.where(active[:, None], new_ray.d, st.ray.d),
                    mint=new_ray.mint, maxt=new_ray.maxt),
            throughput=throughput, result=result, eta=eta,
            depth=jnp.where(st.active, st.depth + 1, st.depth),
            active=active,
            prev_pdf=jnp.where(active, bs.pdf, st.prev_pdf),
            prev_delta=jnp.where(active, bs.delta, st.prev_delta),
            prev_p=jnp.where(active[:, None], si.p, st.prev_p))

    return body


def sample(scene, meta, sampler: Sampler, ray: Ray, active=None,
           diff: bool = False, aux=None):
    """Estimate incident radiance along each camera ray. Returns (L, valid,
    sampler).

    ``diff=True`` switches the bounce loop from ``lax.while_loop`` (fastest
    primal) to a fixed-length ``lax.scan`` with per-bounce
    ``jax.checkpoint`` so reverse-mode AD works with bounded memory — the
    analog of the reference's enoki autodiff wavefront
    (autodiff.py:6-41) rebuilt on JAX remat."""
    if getattr(meta, 'spectral', False):
        # the *_spectral variant: hero-wavelength transport
        from . import path_spectral
        return path_spectral.sample(scene, meta, sampler, ray, active,
                                    diff=diff, aux=aux)
    N = ray.o.shape[0]
    if active is None:
        active = jnp.ones((N,), bool)
    max_depth = meta.iprop('max_depth', -1)
    if max_depth is None or max_depth < 0:
        max_depth = 64

    st = PathState(
        sampler=sampler, ray=ray,
        throughput=jnp.ones((N, 3)), result=jnp.zeros((N, 3)),
        eta=jnp.ones((N,)), depth=jnp.zeros((N,), jnp.int32),
        active=active,
        prev_pdf=jnp.ones((N,)), prev_delta=jnp.ones((N,), bool),
        prev_p=ray.o)

    def cond(st: PathState):
        return jnp.any(st.active)

    body = make_body(scene, meta, N)

    if diff:
        ck_body = jax.checkpoint(lambda s, _: (body(s), None))
        st, _ = jax.lax.scan(ck_body, st, None, length=max_depth)
    else:
        st = jax.lax.while_loop(cond, body, st)
    return st.result, jnp.ones((N,), bool), st.sampler
