"""Shared integrator machinery.

The reference's SamplingIntegrator::render (src/librender/integrator.cpp:51)
splits the image into spiral blocks for TBB threads; the TPU-native design
is its GPU-wavefront mode (integrator.cpp:143-175) generalized: ONE flat
wavefront of film_size rays per pass under jit, bounce loops as masked
``lax.while_loop``s, film splat as scatter-add. Multi-pass spp chunking
bounds memory (integrator.cpp:62-66).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core import math as m


def mis_weight(pdf_a: jnp.ndarray, pdf_b: jnp.ndarray) -> jnp.ndarray:
    """Power heuristic (beta=2), as the reference path.cpp:240-244."""
    pdf_a = pdf_a * pdf_a
    pdf_b = pdf_b * pdf_b
    w = m.safe_div(pdf_a, pdf_a + pdf_b)
    return jnp.where(jnp.isfinite(w), w, 0.0)


def film_sample_positions(meta, key, pass_idx=0
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One sample per pixel: continuous positions (N,2) in pixel units and
    the [0,1)^2 normalized sample position for the sensor. The jitter comes
    from the scene's sampler plugin (independent/stratified/multijitter/
    ldsampler) with ``pass_idx`` as the per-pixel sample index."""
    from ..sampler import film_jitter
    W, H = meta.film.width, meta.film.height
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)                       # (H, W)
    base = jnp.stack([gx.ravel(), gy.ravel()], axis=-1)  # (N, 2)
    jitter = film_jitter(meta.sampler, key, pass_idx, meta.spp,
                         base.shape[0])
    pos = base + jitter
    scale = jnp.asarray([1.0 / W, 1.0 / H], jnp.float32)
    return pos, pos * scale


def russian_roulette(throughput, eta, depth, rr_depth, u):
    """Returns (survive_mask, updated_throughput). Reference path.cpp:147-151
    semantics: q = min(max(throughput)*eta^2, 0.95), applied from rr_depth."""
    # detached decision probability (the reference uses detach(q) too,
    # vrl.cpp:185) so AD doesn't differentiate the RR estimator weight
    tmax = jax.lax.stop_gradient(jnp.max(throughput, axis=-1) * eta * eta)
    q = jnp.minimum(tmax, 0.95)
    apply = depth >= rr_depth
    survive = jnp.where(apply, u < q, True)
    thr = jnp.where((apply & survive)[..., None],
                    throughput * m.safe_rcp(q)[..., None], throughput)
    return survive, thr


def spectrum_channel(spec: jnp.ndarray, channel: jnp.ndarray) -> jnp.ndarray:
    """index_spectrum (reference volpath.cpp:26): pick the hero channel."""
    from ..ops.gather import select_channel
    return select_channel(spec, channel)
