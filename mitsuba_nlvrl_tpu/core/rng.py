"""Counter-based wavefront sampler.

Replaces the reference's seeded per-thread PCG32 samplers
(src/samplers/independent.cpp:54-79) with a TPU-native stateless design:
a threefry base key plus an integer *dimension counter*. Each request draws a
whole wavefront of independent values from ``fold_in(key, dim)``; the counter
is loop-carried through ``lax.while_loop`` bounce loops, so every (lane,
dimension) pair sees a unique, deterministic stream — reproducible across
devices and shardings.

Stratified / low-discrepancy samplers (ldsampler, stratified, multijitter,
orthogonal) are implemented in mitsuba_nlvrl_tpu.sampler by warping the first
two dimensions; they share this state object.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class Sampler:
    """Pytree with static ``lanes`` aux data (wavefront size must stay a
    Python int under jit)."""

    def __init__(self, key, dim, lanes: int, rays=None):
        self.key = key
        self.dim = dim
        self.lanes = lanes
        # measured ray counter: integrators call .count_rays(mask) at every
        # scene-intersection site so throughput benches report ACTUAL rays
        # traced (live lanes incl. shadow/walk rays), not analytic bounds
        self.rays = jnp.float32(0.0) if rays is None else rays

    def tree_flatten(self):
        return (self.key, self.dim, self.rays), self.lanes

    @classmethod
    def tree_unflatten(cls, lanes, children):
        return cls(children[0], children[1], lanes, children[2])

    def _replace(self, **kw) -> "Sampler":
        return Sampler(kw.get('key', self.key), kw.get('dim', self.dim),
                       kw.get('lanes', self.lanes), kw.get('rays', self.rays))

    @staticmethod
    def make(key, lanes: int) -> "Sampler":
        return Sampler(key=key, dim=jnp.int32(0), lanes=lanes)

    def count_rays(self, mask) -> "Sampler":
        """Record ``sum(mask)`` rays traced (float32 scalar: exact up to
        2^24 per pass, then accumulated on host per pass)."""
        return self._replace(rays=self.rays + mask.sum(dtype=jnp.float32))

    def next_1d(self) -> Tuple[jnp.ndarray, "Sampler"]:
        k = jax.random.fold_in(self.key, self.dim)
        u = jax.random.uniform(k, (self.lanes,), jnp.float32)
        return u, self._replace(dim=self.dim + 1)

    def next_2d(self) -> Tuple[jnp.ndarray, "Sampler"]:
        k = jax.random.fold_in(self.key, self.dim)
        u = jax.random.uniform(k, (self.lanes, 2), jnp.float32)
        return u, self._replace(dim=self.dim + 1)

    def fork(self, salt: int) -> "Sampler":
        """Independent sampler for a sub-pass (photon shoot, NEE, ...)."""
        return Sampler(key=jax.random.fold_in(self.key, jnp.uint32(0x9e3779b9) + salt),
                       dim=jnp.int32(0), lanes=self.lanes)


def seed_for(base_key, *indices) -> jax.Array:
    """Derive a key for (pass, chunk, device, ...) tuples."""
    k = base_key
    for ix in indices:
        k = jax.random.fold_in(k, ix)
    return k
