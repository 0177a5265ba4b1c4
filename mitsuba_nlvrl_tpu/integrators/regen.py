"""Persistent-wavefront scheduler with path regeneration — the
"cross-band walk compaction" design.

The banded scheduler (render._render_band) pays the wavefront tax twice
on volumetric scenes: every bounce iteration runs at FULL band width
while the live-lane fraction drains toward the max-lane tail, and every
band re-dispatches the full iteration count. Measured on hetvol
(docs/PERF.md round 4): the tracking walks cost ~1 ms per EVENT at 32k
lanes and the wavefront pays the max-lane event count, capping the
banded path at 0.94 Mrays/s even with free walks.

This scheduler instead keeps ONE wavefront at saturation width alive for
the whole render: each outer iteration first retires finished paths into
a per-path output buffer and refills their lanes with fresh camera rays
from a global path queue, then runs ONE iteration of the volpath bounce
body (volpath.make_body — the IDENTICAL estimator the banded path runs;
only the lane scheduling differs, so the expectation is unchanged and
the goldens must still pass). Unfinished collision/Tr walks simply
continue next iteration as loop-carried lane state — they are never cut
at band boundaries (reference semantics preserved:
src/integrators/volpath.cpp:123-151,263-368 — one path's walk state is
private to the path). Dispatches run a FIXED number of outer iterations
(watchdog-safe bounded kernels) and the state is donated between them.

Film reconstruction: lane jitter must match between refill-time camera
rays and splat-time filtering, so the regeneration path requires a
per-(pass, pixel) DECOMPOSABLE jitter (sampler.lane_jitter — ldsampler's
scrambled (0,2) construction already is; independent uses counter-hash
uniforms). render() gates on sampler.REGEN_SAMPLERS and falls back to
the banded path otherwise.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.ray import Ray
from ..core.rng import Sampler
from ..core.records import SurfaceInteraction
from .. import film as film_mod
from .. import sensor as sensor_mod
from ..sampler import lane_jitter, lane_uniform2, REGEN_SAMPLERS
from . import volpath
from . import path as path_mod

# outer bounce iterations folded into one dispatch: bounds single-kernel
# runtime (the remote TPU worker kills very long kernels) while keeping
# the dispatch count low (each iteration includes full tracking walks)
import os as _os
ITERS_PER_DISPATCH = max(1, int(_os.environ.get('MNT_REGEN_ITERS', '24')))
# per-lane safety cap: a path alive this long is retired with whatever
# it accumulated (RR + max_depth terminate far earlier in practice)
LANE_ITER_CAP = volpath.MAX_WAVEFRONT_ITERS


class RegenState(NamedTuple):
    vp: object              # VolpathState or PathState (family-keyed)
    pid: jnp.ndarray        # (N,) i32 chunk-local path id; -1 = empty
    lane_it: jnp.ndarray    # (N,) i32 bounce-iterations this path has run
    queue: jnp.ndarray      # scalar i32: next unissued path id
    out: jnp.ndarray        # (n_paths, 3) retired per-path radiance


def _family(name: str):
    """Integrator family -> (make_body, genesis, refill-reset). Both
    families share the field names the scheduler touches (sampler, ray,
    throughput, result, active); only the reset of the family-specific
    carried state differs."""
    if name in ('volpath', 'volpathmis'):
        return 'volpath'
    if name == 'path':
        return 'path'
    return None


def _genesis(meta, key, n_lanes: int, n_paths: int,
             family: str = 'volpath') -> RegenState:
    N = n_lanes
    if family == 'path':
        vp = path_mod.PathState(
            sampler=Sampler.make(key, N),
            ray=Ray(jnp.zeros((N, 3)),
                    jnp.zeros((N, 3)).at[:, 2].set(1.0),
                    jnp.zeros((N,)), jnp.full((N,), jnp.inf)),
            throughput=jnp.ones((N, 3)), result=jnp.zeros((N, 3)),
            eta=jnp.ones((N,)), depth=jnp.zeros((N,), jnp.int32),
            active=jnp.zeros((N,), bool),
            prev_pdf=jnp.ones((N,)), prev_delta=jnp.ones((N,), bool),
            prev_p=jnp.zeros((N, 3)))
    else:
        vp = volpath.VolpathState(
            sampler=Sampler.make(key, N),
            ray=Ray(jnp.zeros((N, 3)),
                    jnp.zeros((N, 3)).at[:, 2].set(1.0),
                    jnp.zeros((N,)), jnp.full((N,), jnp.inf)),
            throughput=jnp.ones((N, 3)), result=jnp.zeros((N, 3)),
            eta=jnp.ones((N,)), depth=jnp.zeros((N,), jnp.int32),
            active=jnp.zeros((N,), bool),
            medium_idx=jnp.full((N,), -1, jnp.int32),
            channel=jnp.zeros((N,), jnp.int32),
            si=SurfaceInteraction.invalid((N,)),
            needs_isect=jnp.ones((N,), bool),
            em_full=jnp.ones((N,), bool), prev_pdf=jnp.zeros((N,)),
            p_prev=jnp.zeros((N, 3)), it=jnp.int32(0))
    st = RegenState(vp=vp, pid=jnp.full((N,), -1, jnp.int32),
                    lane_it=jnp.zeros((N,), jnp.int32),
                    queue=jnp.int32(0),
                    out=jnp.zeros((n_paths, 3)))
    # deep-copy every leaf: records like SurfaceInteraction.invalid
    # dedup zero buffers across fields, and XLA rejects aliased donated
    # arguments (the state is donated between dispatches)
    return jax.tree_util.tree_map(jnp.copy, st)


def _retire_and_refill(scene, meta, st: RegenState, n_paths: int,
                       pass0, family: str = 'volpath') -> RegenState:
    """Scatter finished paths' radiance into the out buffer, then issue
    fresh camera paths from the queue into every empty lane."""
    vp = st.vp
    N = st.pid.shape[0]
    W, H = meta.film.width, meta.film.height
    P = W * H

    # retire: each path scatters exactly once (pid set to -1 after)
    done = ~vp.active & (st.pid >= 0)
    Lr = jnp.where(jnp.isfinite(vp.result), vp.result, 0.0)
    idx = jnp.where(done, st.pid, n_paths)
    out = st.out.at[idx].add(jnp.where(done[:, None], Lr, 0.0),
                             mode='drop')
    pid = jnp.where(done, -1, st.pid)

    # refill: rank empty lanes, issue queue ids in order
    empty = ~vp.active
    rank = jnp.cumsum(empty.astype(jnp.int32)) - 1
    new_pid = st.queue + rank
    issue = empty & (new_pid < n_paths)
    queue = jnp.minimum(st.queue + empty.sum(dtype=jnp.int32),
                        jnp.int32(n_paths))

    pix = jnp.where(issue, new_pid % P, 0)
    pss = jnp.where(issue, new_pid // P, 0) + pass0
    jit2 = lane_jitter(meta.sampler, pss, pix)
    px = (pix % W).astype(jnp.float32) + jit2[:, 0]
    py = (pix // W).astype(jnp.float32) + jit2[:, 1]
    pos01 = jnp.stack([px * (1.0 / W), py * (1.0 / H)], axis=-1)
    ray, sw = sensor_mod.sample_ray(scene, meta, pos01,
                                    lane_uniform2(pss, pix, 0x0a9e31))

    i1 = issue
    i3 = issue[:, None]
    if family == 'path':
        vp = vp._replace(
            ray=Ray(jnp.where(i3, ray.o, vp.ray.o),
                    jnp.where(i3, ray.d, vp.ray.d),
                    jnp.where(i1, ray.mint, vp.ray.mint),
                    jnp.where(i1, ray.maxt, vp.ray.maxt)),
            throughput=jnp.where(i3, sw, vp.throughput),
            result=jnp.where(i3, 0.0, vp.result),
            eta=jnp.where(i1, 1.0, vp.eta),
            depth=jnp.where(i1, 0, vp.depth),
            active=vp.active | i1,
            prev_pdf=jnp.where(i1, 1.0, vp.prev_pdf),
            prev_delta=jnp.where(i1, True, vp.prev_delta),
            prev_p=jnp.where(i3, ray.o, vp.prev_p))
        return RegenState(vp=vp, pid=jnp.where(issue, new_pid, pid),
                          lane_it=jnp.where(issue, 0, st.lane_it),
                          queue=queue, out=out)
    smp = vp.sampler
    u_ch, smp = smp.next_1d()
    channel = jnp.minimum((u_ch * 3).astype(jnp.int32), 2)
    cam_med = jnp.full((N,), meta.camera_medium, jnp.int32)

    vp = vp._replace(
        sampler=smp,
        ray=Ray(jnp.where(i3, ray.o, vp.ray.o),
                jnp.where(i3, ray.d, vp.ray.d),
                jnp.where(i1, ray.mint, vp.ray.mint),
                jnp.where(i1, ray.maxt, vp.ray.maxt)),
        # sensor weight folds into the initial throughput, so the
        # retired result is already importance-weighted
        throughput=jnp.where(i3, sw, vp.throughput),
        result=jnp.where(i3, 0.0, vp.result),
        eta=jnp.where(i1, 1.0, vp.eta),
        depth=jnp.where(i1, 0, vp.depth),
        active=vp.active | i1,
        medium_idx=jnp.where(i1, cam_med, vp.medium_idx),
        channel=jnp.where(i1, channel, vp.channel),
        # si cache: stale entries are harmless — needs_isect=True forces
        # a fresh intersection before any use
        needs_isect=jnp.where(i1, True, vp.needs_isect),
        em_full=jnp.where(i1, True, vp.em_full),
        prev_pdf=jnp.where(i1, 0.0, vp.prev_pdf),
        p_prev=jnp.where(i3, ray.o, vp.p_prev))
    return RegenState(vp=vp, pid=jnp.where(issue, new_pid, pid),
                      lane_it=jnp.where(issue, 0, st.lane_it),
                      queue=queue, out=out)


@partial(jax.jit,
         static_argnames=('meta', 'n_paths', 'n_iters', 'family'),
         donate_argnums=(2,))
def regen_chunk(scene, meta, st: RegenState, n_paths: int, pass0,
                n_iters: int, family: str = 'volpath'):
    """Run ``n_iters`` retire/refill + bounce iterations. Returns
    (state, pending) where pending = unissued + live paths (0 = chunk
    complete)."""
    N = st.pid.shape[0]
    body = (path_mod if family == 'path' else volpath).make_body(
        scene, meta, N)

    def one(i, st):
        st = _retire_and_refill(scene, meta, st, n_paths, pass0, family)
        vp = body(st.vp)
        lane_it = st.lane_it + vp.active.astype(jnp.int32)
        vp = vp._replace(active=vp.active & (lane_it < LANE_ITER_CAP))
        return RegenState(vp=vp, pid=st.pid, lane_it=lane_it,
                          queue=st.queue, out=st.out)

    st = jax.lax.fori_loop(0, n_iters, one, st)
    pending = (jnp.int32(n_paths) - st.queue) \
        + jnp.sum(st.vp.active.astype(jnp.int32))
    return st, pending


@partial(jax.jit, static_argnames=('meta', 'spp_chunk'))
def _splat_chunk(meta, out, pass0, spp_chunk: int, image):
    """Dense filtered splat of a finished chunk: per pass, recompute the
    SAME per-(pass, pixel) jitter the refill used and run the pixel-
    ordered splat — reconstruction identical to the banded path."""
    W, H = meta.film.width, meta.film.height
    P = W * H
    pix = jnp.arange(P, dtype=jnp.uint32)
    for p in range(spp_chunk):
        jit2 = lane_jitter(meta.sampler,
                           jnp.full((P,), 0, jnp.uint32) + pass0
                           + jnp.uint32(p), pix)
        image = film_mod.splat_pixel_ordered(
            meta.film, jit2, out[p * P:(p + 1) * P], image)
    return image


# cap on the per-chunk path buffer (paths x 12 B); full spp renders
# process pass chunks of at most this many paths
MAX_CHUNK_PATHS = 4 << 20


def render_regen(scene, meta, seed: int = 0, spp=None, aux=None,
                 ray_stats=None, n_lanes: int = None, verbose=False,
                 integrator: str = None):
    """Full render via the regeneration scheduler -> (H, W, 4) premult
    accumulation image (caller develops). Drop-in for the banded loop of
    render() for the supported integrator families with decomposable
    samplers."""
    spp = spp or meta.spp
    family = _family(integrator or meta.integrator)
    W, H = meta.film.width, meta.film.height
    P = W * H
    if n_lanes is None:
        # per-family defaults measured on the axon v5e (r5 sweeps):
        # volpath walks are throughput-bound in lanes — the smallest
        # wavefront that amortizes fixed per-iteration overhead wins
        # (hetvol: 8k/24-iter 1.23 Mrays/s vs 16k 0.97, 32k 0.91,
        # 65k 0.45; a same-run interleaved tiebreak then showed 6144
        # consistently +2-4% over 8192 across three repetitions, with
        # 24-vs-32 iters/dispatch inside noise); the path body is cheap
        # per lane, so larger wavefronts amortize the per-iteration
        # floor instead
        default = '6144' if family == 'volpath' else '65536'
        n_lanes = int(_os.environ.get('MNT_REGEN_LANES', default))
        n_lanes = min(n_lanes, max(16384, P))  # small films need no more
    spp_per_chunk = max(1, min(spp, MAX_CHUNK_PATHS // P))
    key = jax.random.PRNGKey(seed)

    image = film_mod.new_image(meta.film)
    p = 0
    while p < spp:
        n_pass = min(spp_per_chunk, spp - p)
        n_paths = P * n_pass
        st = _genesis(meta, jax.random.fold_in(key, 0x7e6e + p),
                      n_lanes, n_paths, family)
        # worst case every path runs to the lane cap; the +3 covers the
        # genesis fill, the final drain, and the one-behind pipeline lag
        max_disp = -(-n_paths // n_lanes) * \
            -(-LANE_ITER_CAP // ITERS_PER_DISPATCH) + 3
        # PIPELINED dispatch: the remote-TPU link costs ~150 ms per
        # synchronized roundtrip, which dominated the early measurement
        # (wall flat ~1.8 s across 8-32k lanes = dispatch count x link
        # latency). Checking the ONE-BEHIND dispatch's pending count
        # keeps the device queue non-empty: dispatch i+1 is enqueued
        # before dispatch i's result is read, so the device runs
        # back-to-back and the host hides the pull latency behind
        # compute. At most one no-op dispatch runs past completion.
        pend_prev = None
        for _ in range(max_disp):
            st, pending = regen_chunk(scene, meta, st, n_paths,
                                      jnp.uint32(p), ITERS_PER_DISPATCH,
                                      family)
            if pend_prev is not None and int(pend_prev) == 0:
                break
            pend_prev = pending
        if ray_stats is not None:
            ray_stats.append(st.vp.sampler.rays)
        image = _splat_chunk(meta, st.out, jnp.uint32(p), n_pass, image)
        p += n_pass
        if verbose:
            image.block_until_ready()
            print(f"  regen chunk done: pass {p}/{spp}")
    return image


def regen_supported(meta, name: str, diff: bool) -> bool:
    """Static gate used by render(): a supported integrator family, a
    decomposable film sampler, the primal (non-diff) path, and no
    spectral mode (path delegates spectral to a different module)."""
    return (not diff) and _family(name) is not None \
        and meta.sampler in REGEN_SAMPLERS \
        and not getattr(meta, 'spectral', False)
