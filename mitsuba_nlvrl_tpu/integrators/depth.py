"""Depth AOV integrator (reference src/integrators/depth.cpp:12)."""
from __future__ import annotations

import jax.numpy as jnp

from ..core.ray import Ray
from ..core.rng import Sampler
from ..ops import intersect as isect


def sample(scene, meta, sampler: Sampler, ray: Ray, active=None, diff: bool = False, aux=None):
    N = ray.o.shape[0]
    si = isect.ray_intersect(scene, ray)
    d = jnp.where(si.valid, si.t, 0.0)
    return jnp.repeat(d[:, None], 3, axis=1), si.valid, sampler
