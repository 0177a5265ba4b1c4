"""Scaling-efficiency harness + multi-host entry.

BASELINE's north star is >=80% throughput efficiency scaling from one chip
to N hosts. ``measure_scaling`` renders the same scene on a 1-device and an
n-device data-parallel mesh and reports measured rays/s for each plus the
per-device efficiency. On CPU meshes this validates the sharding/collective
program (compiles + executes + stays unbiased); the numbers only become a
hardware statement on real chips.

``init_distributed`` is the multi-host entry point: call it once per
process under a launcher (one process per host), then build meshes over
``jax.devices()`` as usual — jax.distributed wires the hosts into one
global device set, and the same NamedSharding/psum code runs across DCN.
"""
from __future__ import annotations

import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Initialize multi-host JAX (the reference's multi-machine analog —
    it had none; NCCL/MPI scenes were single-host). With no arguments the
    standard cluster env vars (JAX_COORDINATOR_ADDRESS etc. / TPU pod
    metadata) are used. Returns the process index."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index()


def _render_rays_per_s(scene, meta, mesh: Mesh, passes: int = 4,
                       seed: int = 7, integrator: Optional[str] = None,
                       aux=None):
    """Measured rays/s of the DP-sharded wavefront on ``mesh``."""
    from functools import partial
    from ..core.rng import Sampler
    from ..integrators import get_integrator
    from ..integrators.common import film_sample_positions
    from .. import sensor as sensor_mod

    integ = get_integrator(integrator or meta.integrator)
    shard = NamedSharding(mesh, P('dp', None))
    rep = NamedSharding(mesh, P())
    scene_r = jax.device_put(scene, rep)

    @partial(jax.jit, out_shardings=(rep, rep))
    def one_pass(scene, pos01, key):
        N = pos01.shape[0]
        ray, w = sensor_mod.sample_ray(
            scene, meta, pos01,
            jax.random.uniform(jax.random.fold_in(key, 1), (N, 2)))
        sampler = Sampler.make(jax.random.fold_in(key, 2), N)
        L, _, sampler = integ(scene, meta, sampler, ray, aux=aux)
        return jnp.sum(jnp.where(jnp.isfinite(L), L, 0.0)), sampler.rays

    key = jax.random.PRNGKey(seed)
    W, H = meta.film.width, meta.film.height
    pos, pos01 = film_sample_positions(meta, key)
    pos01 = jax.device_put(pos01, shard)

    # warm-up compile
    s, r = one_pass(scene_r, pos01, key)
    s.block_until_ready()

    t0 = time.time()
    total_rays = 0.0
    checksum = 0.0
    for p in range(passes):
        s, r = one_pass(scene_r, pos01, jax.random.fold_in(key, p))
        checksum += float(s)
        total_rays += float(r)
    dt = time.time() - t0
    return total_rays / max(dt, 1e-9), checksum / passes


def measure_scaling(scene, meta, n_devices: Optional[int] = None,
                    passes: int = 4, integrator: Optional[str] = None,
                    aux=None) -> dict:
    """Render on 1-device vs n-device 'dp' meshes; returns
    {rays_per_s_1, rays_per_s_n, n, efficiency, checksum_rel_diff,
    backend, hardware_valid, note}.

    ``hardware_valid`` is False on CPU meshes (forced-host device "chips"
    contend for the same cores — the efficiency number is NOT a scaling
    statement there, only the program/collective validation and checksum
    parity are meaningful). ``integrator``/``aux`` let the harness run the
    two-pass integrators (vrl/photonmapper) with prebuilt maps."""
    devs = jax.devices()
    n = n_devices or len(devs)
    mesh1 = Mesh(np.asarray(devs[:1]), ('dp',))
    meshn = Mesh(np.asarray(devs[:n]), ('dp',))
    r1, c1 = _render_rays_per_s(scene, meta, mesh1, passes,
                                integrator=integrator, aux=aux)
    rn, cn = _render_rays_per_s(scene, meta, meshn, passes,
                                integrator=integrator, aux=aux)
    backend = jax.default_backend()
    hw = backend not in ('cpu',)
    return {
        'n': n,
        'integrator': integrator or meta.integrator,
        'rays_per_s_1': r1,
        'rays_per_s_n': rn,
        'efficiency': rn / (n * r1) if r1 > 0 else 0.0,
        # same program, same RNG: the estimates must agree exactly
        'checksum_rel_diff': abs(cn - c1) / max(abs(c1), 1e-9),
        'backend': backend,
        'hardware_valid': hw,
        'note': ('' if hw else
                 'cpu-mesh: program validation only; efficiency is '
                 'core-contention, not a scaling statement'),
    }


def dp_fold_proxy(scene, meta, shard_lanes: int = 32768, folds: int = 8,
                  passes: int = 3, seed: int = 13) -> dict:
    """Single-REAL-chip evidence for the DP pass-folding design
    (render_dist.dp_fold_for): throughput of one chip running a 32k-lane
    DP shard with ``folds`` passes folded into the lane dimension (the
    sharded path's per-dispatch shape, lane = pixel x sub-pass) vs the
    full saturation wavefront (shard_lanes*folds lanes, one pass). A
    ratio ~>= 0.8 means a DP replica at 1/folds of the film can reach
    full-chip throughput by folding — the design answer to the 2%-of-
    chip throughput a naive one-pass 32k shard measures (weak_scaling).
    """
    import time as _t
    from functools import partial
    from ..core.rng import Sampler
    from ..integrators import get_integrator
    from .. import sensor as sensor_mod

    integ = get_integrator(meta.integrator)

    @partial(jax.jit, static_argnames=('npix', 'n_fold'))
    def one(scene, key, npix, n_fold):
        u = jax.random.uniform(key, (npix, 2))
        posf = jnp.tile(u, (n_fold, 1))    # folded passes share pixels
        n = posf.shape[0]
        ray, w = sensor_mod.sample_ray(scene, meta, posf,
                                       jax.random.uniform(
                                           jax.random.fold_in(key, 1),
                                           (n, 2)))
        sampler = Sampler.make(jax.random.fold_in(key, 2), n)
        L, _, sampler = integ(scene, meta, sampler, ray)
        return jnp.sum(jnp.where(jnp.isfinite(L), L, 0.0)), sampler.rays

    def rate(npix, n_fold):
        key = jax.random.PRNGKey(seed)
        for w in range(2):   # compile + post-compile warmup (the first
            s, r = one(scene, jax.random.fold_in(key, 99 + w), npix,
                       n_fold)   # run after a fresh compile measures slow
            s.block_until_ready()
        best = float('inf')
        for p_i in range(passes):
            t0 = _t.time()
            s, r = one(scene, jax.random.fold_in(key, p_i), npix, n_fold)
            s.block_until_ready()
            best = min(best, (_t.time() - t0) / float(r))
        return 1.0 / best

    folded = rate(shard_lanes, folds)               # the DP-shard shape
    full = rate(shard_lanes * folds, 1)             # saturation reference
    return {
        'backend': jax.default_backend(),
        'shard_lanes': shard_lanes, 'folds': folds,
        'folded_mrays': round(folded / 1e6, 2),
        'full_mrays': round(full / 1e6, 2),
        'ratio': round(folded / max(full, 1e-9), 3),
    }


def weak_scaling_proxy(scene, meta, base: int = 32768,
                       factors=(1, 2, 4, 8), passes: int = 3,
                       seed: int = 11) -> dict:
    """Single-REAL-chip weak-scaling proxy: DP scaling runs a FIXED
    per-chip wavefront on every chip, so the hardware-grounded question a
    single chip can answer is whether throughput is flat (saturated) from
    the per-chip wavefront size upward — if rays/s at k*base matches
    rays/s at base within ~1, the per-chip kernel is compute-bound and DP
    efficiency is limited by collectives only (which this proxy cannot
    measure). Returns {sizes, rays_per_s, saturation}."""
    import time as _t
    from functools import partial
    from ..core.rng import Sampler
    from ..integrators import get_integrator
    from .. import sensor as sensor_mod

    integ = get_integrator(meta.integrator)

    @partial(jax.jit, static_argnames=('n',))
    def one(scene, key, n):
        u = jax.random.uniform(key, (n, 2))
        ray, w = sensor_mod.sample_ray(scene, meta, u,
                                       jax.random.uniform(
                                           jax.random.fold_in(key, 1),
                                           (n, 2)))
        sampler = Sampler.make(jax.random.fold_in(key, 2), n)
        L, _, sampler = integ(scene, meta, sampler, ray)
        return jnp.sum(jnp.where(jnp.isfinite(L), L, 0.0)), sampler.rays

    key = jax.random.PRNGKey(seed)
    out = {}
    for f in factors:
        n = base * f
        for w in range(2):   # compile + post-compile warmup (the first
            s, r = one(scene, jax.random.fold_in(key, 90 + w), n)
            s.block_until_ready()   # run after compile measures slow)
        # best-of-passes: single-dispatch timing at the smallest sizes
        # is noisy on the contended remote worker (observed 10x swings
        # on the 32k point) — the best rate is the honest capability
        best = float('inf')
        for p_i in range(passes):
            t0 = _t.time()
            s, r = one(scene, jax.random.fold_in(key, p_i), n)
            s.block_until_ready()
            best = min(best, (_t.time() - t0) / float(r))
        out[n] = 1.0 / best
    sizes = sorted(out)
    return {
        'backend': jax.default_backend(),
        'sizes': sizes,
        'rays_per_s': [out[s_] for s_ in sizes],
        # rays/s flat (ratio ~>= 1) from base to max => the per-chip
        # wavefront saturates the chip at `base`: DP replicas at that
        # per-chip load are compute-bound, not dispatch/latency-bound
        'per_ray_flat': out[sizes[-1]] / max(out[sizes[0]], 1e-9),
    }
