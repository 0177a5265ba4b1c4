"""Differentiable rendering API: parameter traversal, optimizers, torch
bridge.

TPU-native analog of the reference python layer
(src/python/python/autodiff.py + util.py):

  * traverse(scene)        -> ParameterMap over differentiable leaves
                              (util.py:14 Object::traverse analog — here the
                              scene IS a pytree, so traversal is direct)
  * render(...)            -> differentiable image (autodiff.py:121);
                              reverse-mode works through the scan-based
                              integrator loops
  * SGD / Adam             -> optax-backed optimizers with the ParameterMap
                              update() convention (autodiff.py:260,314)
  * render_torch(...)      -> torch.autograd.Function bridge
                              (autodiff.py:381-460) via numpy exchange
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .scene.types import SceneData

# leaves of SceneData that are differentiable scene parameters, by path
_DIFF_LEAVES = {
    'bsdfs.params': lambda s: s.bsdfs.params,
    'emitters.params': lambda s: s.emitters.params,
    'emitters.env_map': lambda s: s.emitters.env_map,
    'media.params': lambda s: s.media.params,
    'media.grid_sigma_t': lambda s: s.media.grid_sigma_t,
    'media.grid_albedo': lambda s: s.media.grid_albedo,
    'media.nl_ior': lambda s: s.media.nl_ior,
}


def _set_leaf(scene: SceneData, key: str, value) -> SceneData:
    group, leaf = key.split('.', 1)
    sub = getattr(scene, group)
    if key == 'media.grid_sigma_t':
        # the density grid has derived copies (supervoxel majorants +
        # corner-packed trilinear rows). Concrete updates (optimizer
        # steps) refresh them; traced updates (inside jax.grad) can't —
        # there the diff render path reads grid_sigma_t directly and the
        # packed copy is dropped, while grid_sup stays a fixed bound
        # (valid while densities stay below it).
        if isinstance(value, jax.core.Tracer):
            sub = sub._replace(grid_sigma_t=value, grid_sigma_p8=None)
        else:
            from .medium import with_sigma_grid
            sub = with_sigma_grid(sub, value)
        return scene._replace(media=sub)
    return scene._replace(**{group: sub._replace(**{leaf: value})})


class ParameterMap:
    """Dict-like view of the differentiable scene parameters
    (analog of mitsuba.python.util.ParameterMap)."""

    def __init__(self, scene: SceneData, keys=None):
        self.scene = scene
        self._keys = list(keys or _DIFF_LEAVES.keys())

    def keys(self):
        return list(self._keys)

    def __contains__(self, k):
        return k in self._keys

    def __getitem__(self, k):
        return _DIFF_LEAVES[k](self.scene)

    def __setitem__(self, k, v):
        self.scene = _set_leaf(self.scene, k, jnp.asarray(v))

    def keep(self, keys):
        """Restrict to a subset (ParameterMap.keep)."""
        self._keys = [k for k in self._keys if k in keys]
        return self

    def to_dict(self) -> Dict[str, jnp.ndarray]:
        return {k: _DIFF_LEAVES[k](self.scene) for k in self._keys}

    def updated_scene(self, values: Dict[str, jnp.ndarray]) -> SceneData:
        sc = self.scene
        for k, v in values.items():
            sc = _set_leaf(sc, k, v)
        return sc


def traverse(scene: SceneData) -> ParameterMap:
    return ParameterMap(scene)


def _render_helper(scene, meta, spp, seed, integrator, diff=True):
    from . import film as film_mod
    from .integrators.common import film_sample_positions
    from .parallel.render_dist import render_wavefront

    key = jax.random.PRNGKey(seed) if isinstance(seed, int) else seed
    acc = None
    for p in range(spp):
        kp = jax.random.fold_in(key, p)
        pos, _ = film_sample_positions(meta, jax.random.fold_in(kp, 0),
                                       jnp.uint32(p))
        L = render_wavefront(scene, meta, pos, kp, integrator, diff=diff)
        img = film_mod.new_image(meta.film)
        img = film_mod.splat(meta.film, pos, L, jnp.ones((pos.shape[0],)),
                             img)
        acc = img if acc is None else acc + img
    from . import film as film_mod2
    return film_mod2.develop(acc)


def render(scene, meta, params: Optional[Dict] = None,
           pmap: Optional[ParameterMap] = None,
           spp=1, seed: int = 0, integrator: Optional[str] = None,
           unbiased: bool = False):
    """Differentiable render: jax.grad flows to ``params`` (a dict from a
    ParameterMap). Uses the scan+remat integrator path.

    ``unbiased=True`` (reference autodiff.py:177-190): the naive estimator
    reuses one set of Monte Carlo samples for both the image VALUE and its
    DERIVATIVE, so a jointly differentiated objective sees E[X dX] with
    sample correlation (e.g. d mean(I^2) picks up the per-sample variance).
    Unbiased mode renders twice with independent RNG streams — the primal
    value detached, the derivative pass reattached (the jax analog of
    ek.reattach: value from pass 1, cotangents through pass 2):

        out = stop_grad(primal) + deriv - stop_grad(deriv)

    ``spp`` may be a ``(spp_primal, spp_deriv)`` tuple in unbiased mode.
    """
    if params is not None:
        pm = pmap or ParameterMap(scene)
        scene = pm.updated_scene(params)
    if not unbiased:
        if isinstance(spp, tuple):
            raise ValueError("tuple spp requires unbiased=True")
        return _render_helper(scene, meta, spp, seed, integrator)
    spp_p, spp_d = spp if isinstance(spp, tuple) else (spp, spp)
    # primal pass: gradients disabled (optimizer.disable_gradients analog)
    scene_det = jax.tree_util.tree_map(jax.lax.stop_gradient, scene)
    primal = _render_helper(scene_det, meta, spp_p, seed, integrator)
    # derivative pass: INDEPENDENT rng stream
    dseed = jax.random.fold_in(jax.random.PRNGKey(seed), 0xDE21)
    deriv = _render_helper(scene, meta, spp_d, dseed, integrator)
    return jax.lax.stop_gradient(primal) + deriv \
        - jax.lax.stop_gradient(deriv)


class _OptaxOptimizer:
    """ParameterMap-style optimizer (reference Optimizer, autodiff.py:228):
    holds params dict, applies grads, writes back into the scene."""

    def __init__(self, pmap: ParameterMap, tx):
        import optax
        self.pmap = pmap
        self.params = pmap.to_dict()
        self.tx = tx
        self.state = tx.init(self.params)

    def step(self, grads: Dict[str, jnp.ndarray]):
        import optax
        grads = {k: grads[k] for k in self.params}
        updates, self.state = self.tx.update(grads, self.state, self.params)
        self.params = optax.apply_updates(self.params, updates)
        return self.params

    def update_scene(self) -> SceneData:
        """Analog of params.update(): push values back into the scene."""
        self.pmap.scene = self.pmap.updated_scene(self.params)
        return self.pmap.scene


def SGD(pmap: ParameterMap, lr: float = 0.1, momentum: float = 0.0):
    import optax
    return _OptaxOptimizer(pmap, optax.sgd(lr, momentum))


def Adam(pmap: ParameterMap, lr: float = 0.01, beta_1: float = 0.9,
         beta_2: float = 0.999):
    import optax
    return _OptaxOptimizer(pmap, optax.adam(lr, b1=beta_1, b2=beta_2))


def render_torch(scene, meta, spp: int = 1, seed: int = 0,
                 integrator: Optional[str] = None, param_keys=None):
    """Returns a ``torch.autograd.Function``-backed callable mapping torch
    parameter tensors -> torch image, with gradients computed by JAX
    (reference render_torch, autodiff.py:381-460)."""
    import torch

    pm = ParameterMap(scene, keys=param_keys)
    keys = pm.keys()

    def jax_fwd(values):
        params = dict(zip(keys, values))
        return render(scene, meta, params=params, pmap=pm, spp=spp,
                      seed=seed, integrator=integrator)

    jax_fwd_jit = jax.jit(jax_fwd)

    class RenderFn(torch.autograd.Function):
        @staticmethod
        def forward(ctx, *tensors):
            vals = [jnp.asarray(t.detach().cpu().numpy()) for t in tensors]
            ctx.vals = vals
            img = jax_fwd_jit(vals)
            return torch.from_numpy(np.asarray(img))

        @staticmethod
        def backward(ctx, grad_out):
            g = jnp.asarray(grad_out.cpu().numpy())
            _, vjp = jax.vjp(jax_fwd, ctx.vals)
            (grads,) = vjp(g)
            return tuple(torch.from_numpy(np.asarray(gi)) for gi in grads)

    def call(*tensors):
        return RenderFn.apply(*tensors)

    call.param_keys = keys
    call.initial_values = [
        __import__('torch').from_numpy(np.asarray(pm[k])) for k in keys]
    return call
