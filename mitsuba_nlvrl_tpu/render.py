"""Top-level render orchestration.

TPU-native analog of SamplingIntegrator::render
(src/librender/integrator.cpp:51-185): instead of spiral blocks + TBB, one
jit-compiled *pass* renders a full-film wavefront (1 spp) and splats it;
passes loop on host to reach the target spp while bounding device memory
(the reference's samples_per_pass, integrator.cpp:62-66). Two-pass
integrators (photonmapper / vrl) run their photon-shooting preprocess once
and thread the resulting maps (``aux``) through every pass.
"""
from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .core.rng import Sampler, seed_for
from . import film as film_mod
from . import sensor as sensor_mod
from .integrators import get_integrator, get_preprocess
from .integrators.common import film_sample_positions


@partial(jax.jit, static_argnames=('meta', 'integrator'))
def render_pass(scene, meta, key, integrator: Optional[str] = None,
                aux=None, pass_idx=0):
    """Render 1 spp over the full film; returns (H, W, 4) premultiplied
    [rgb * weight, weight] accumulation."""
    integ = get_integrator(integrator or meta.integrator)
    pos_key, samp_key = jax.random.split(key)
    pos, pos01 = film_sample_positions(meta, pos_key, pass_idx)
    N = pos.shape[0]
    ray, sensor_weight = sensor_mod.sample_ray(
        scene, meta, pos01, jax.random.uniform(jax.random.fold_in(pos_key, 1),
                                               (N, 2)))
    sampler = Sampler.make(samp_key, N)
    L, valid, sampler = integ(scene, meta, sampler, ray, aux=aux)
    L = jnp.where(jnp.isfinite(L), L, 0.0) * sensor_weight
    image = film_mod.new_image(meta.film)
    # camera wavefront is pixel-ordered: dense shifted-add splat (no scatter)
    jitter = pos - jnp.floor(pos)
    image = film_mod.splat_pixel_ordered(meta.film, jitter, L, image)
    return image


def preprocess(scene, meta, seed: int = 0, integrator: Optional[str] = None):
    """Run the integrator's preprocess (photon/VRL shooting) if any."""
    pre = get_preprocess(integrator or meta.integrator)
    if pre is None:
        return None
    key = jax.random.fold_in(jax.random.PRNGKey(seed), 0x9e37)
    return pre(scene, meta, key)


def render(scene, meta, seed: int = 0, spp: Optional[int] = None,
           integrator: Optional[str] = None, verbose: bool = False,
           aux=None):
    """Full render: preprocess (if needed) + spp passes -> (H, W, 3)."""
    spp = spp or meta.spp
    key = jax.random.PRNGKey(seed)
    if aux is None:
        aux = preprocess(scene, meta, seed, integrator)
    acc = None
    t0 = time.time()
    for p in range(spp):
        img = render_pass(scene, meta, jax.random.fold_in(key, p), integrator,
                          aux, jnp.uint32(p))
        acc = img if acc is None else acc + img
        if verbose and (p == 0 or (p + 1) % 16 == 0):
            acc.block_until_ready()
            print(f"  pass {p + 1}/{spp}  ({time.time() - t0:.2f}s)")
    return film_mod.develop(acc)
