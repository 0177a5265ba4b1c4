"""Multi-chip rendering: pixel/ray data-parallelism over a device mesh.

TPU-native replacement for the reference's TBB spiral-block parallelism
(src/librender/integrator.cpp:101-142, spiral.cpp): the film wavefront is
sharded across devices with ``jax.sharding`` annotations and XLA inserts
the ICI collectives — each device renders its ray shard, splats into a
device-local film, and the films all-reduce (the analog of
Film::put(block) merging, but over chips instead of threads).

Gradients: the same annotations make the backward pass shard the adjoint
wavefront; parameter gradients (replicated leaves) come out of an
automatic psum, overlapped by XLA with the backward compute.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.rng import Sampler
from .. import film as film_mod
from .. import sensor as sensor_mod
from ..integrators import get_integrator


def make_mesh(devices=None, axis: str = 'dp') -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np
    return Mesh(np.asarray(devices), (axis,))


def render_wavefront(scene, meta, pos, key, integrator: Optional[str] = None,
                     diff: bool = False):
    """Render radiance for film positions ``pos`` (N,2 pixel coords).

    Pure function of (scene, pos, key) — shard ``pos`` to distribute work.
    ``diff=True`` selects the reverse-mode-differentiable bounce loop.
    Returns per-sample RGB (N, 3).
    """
    integ = get_integrator(integrator or meta.integrator)
    W, H = meta.film.width, meta.film.height
    scale = jnp.asarray([1.0 / W, 1.0 / H], jnp.float32)
    N = pos.shape[0]
    ray, sensor_weight = sensor_mod.sample_ray(
        scene, meta, pos * scale,
        jax.random.uniform(jax.random.fold_in(key, 1), (N, 2)))
    sampler = Sampler.make(jax.random.fold_in(key, 2), N)
    L, valid, _ = integ(scene, meta, sampler, ray, diff=diff)
    return jnp.where(jnp.isfinite(L), L, 0.0) * sensor_weight


def render_distributed(scene, meta, mesh: Mesh, seed: int = 0,
                       spp: Optional[int] = None,
                       integrator: Optional[str] = None):
    """Render with the wavefront sharded across ``mesh`` ('dp' axis)."""
    spp = spp or meta.spp
    key = jax.random.PRNGKey(seed)
    sharding = NamedSharding(mesh, P('dp', None))
    rep = NamedSharding(mesh, P())
    scene_r = jax.device_put(scene, rep)

    @partial(jax.jit, static_argnames=(), out_shardings=rep)
    def one_pass(scene, pos, key):
        L = render_wavefront(scene, meta, pos, key)
        image = film_mod.new_image(meta.film)
        return film_mod.splat(meta.film, pos, L,
                              jnp.ones((pos.shape[0],)), image)

    from ..integrators.common import film_sample_positions
    acc = None
    for p in range(spp):
        kp = jax.random.fold_in(key, p)
        pos, _ = film_sample_positions(meta, jax.random.fold_in(kp, 0))
        pos = jax.device_put(pos, sharding)
        img = one_pass(scene_r, pos, kp)
        acc = img if acc is None else acc + img
    return film_mod.develop(acc)


def train_step(scene, meta, params, ref_image, key, param_merge):
    """One differentiable render step: L2 loss against ``ref_image``,
    gradients w.r.t. ``params`` (a sub-pytree merged into scene by
    ``param_merge``). Shard the wavefront by passing sharded ``pos``
    via closure-free jit outside."""
    from ..integrators.common import film_sample_positions

    def loss_fn(params):
        sc = param_merge(scene, params)
        pos, _ = film_sample_positions(meta, jax.random.fold_in(key, 0))
        L = render_wavefront(sc, meta, pos, key, diff=True)
        image = film_mod.new_image(meta.film)
        image = film_mod.splat(meta.film, pos, L,
                               jnp.ones((pos.shape[0],)), image)
        img = film_mod.develop(image)
        return jnp.mean((img - ref_image) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    return loss, grads
