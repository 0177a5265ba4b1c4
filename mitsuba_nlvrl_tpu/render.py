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


def _pass_body(scene, meta, key, integrator: Optional[str] = None,
               aux=None, pass_idx=0):
    """One 1-spp pass over the full film; returns ((H, W, 4) premultiplied
    [rgb * weight, weight] accumulation, measured ray count)."""
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
    # sampler.rays = MEASURED rays traced this pass (live lanes at every
    # intersection site incl. shadow/walk rays) — the honest bench metric
    return image, sampler.rays


@partial(jax.jit, static_argnames=('meta', 'integrator'))
def render_pass(scene, meta, key, integrator: Optional[str] = None,
                aux=None, pass_idx=0):
    return _pass_body(scene, meta, key, integrator, aux, pass_idx)


@partial(jax.jit, static_argnames=('meta', 'integrator', 'n_passes'))
def render_passes(scene, meta, key, n_passes: int,
                  integrator: Optional[str] = None, aux=None, pass0=0):
    """``n_passes`` spp in ONE device dispatch (fori_loop over passes,
    accumulating on device). The per-dispatch latency on a remote-TPU
    link is ~100ms+ — looping on host pays it per spp, this pays it
    once per chunk. Returns ((H, W, 4) accumulation, total rays)."""
    def body(i, carry):
        acc, rays = carry
        p = pass0 + i
        img, nrays = _pass_body(scene, meta, jax.random.fold_in(key, p),
                                integrator, aux, p)
        return acc + img, rays + nrays

    acc0 = film_mod.new_image(meta.film)
    return jax.lax.fori_loop(0, n_passes, body,
                             (acc0, jnp.zeros((), jnp.float32)))


def preprocess(scene, meta, seed: int = 0, integrator: Optional[str] = None):
    """Run the integrator's preprocess (photon/VRL shooting) if any.
    Wrapper integrators (moment/stokes/aov) delegate to their nested
    integrator — a moment-wrapped photonmapper still shoots photons."""
    name = integrator or meta.integrator
    meta_p = meta
    for _ in range(4):                   # unwrap nested wrappers
        if name not in ('moment', 'stokes', 'aov'):
            break
        from .integrators.aov import _nested
        _, meta_p = _nested(meta_p)
        name = meta_p.integrator
    pre = get_preprocess(name)
    if pre is None:
        return None
    key = jax.random.fold_in(jax.random.PRNGKey(seed), 0x9e37)
    return pre(scene, meta_p, key)


@partial(jax.jit, static_argnames=('meta', 'integrator', 'band_h',
                                   'n_passes'))
def _render_band(scene, meta, key, y0, band_h: int,
                 integrator: Optional[str] = None, aux=None, pass_idx=0,
                 n_passes: int = 1):
    """Render one horizontal film band (rows y0..y0+band_h) for
    ``n_passes`` spp in ONE dispatch (fori over passes — per-dispatch
    latency on the remote link is ~100ms). Bounded band sizes keep
    per-kernel runtime short — the remote TPU worker kills very long
    single kernels (heavy VRL passes)."""
    from .sampler import film_jitter
    integ = get_integrator(integrator or meta.integrator)
    W = meta.film.width
    N = W * band_h
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = y0.astype(jnp.float32) + jnp.arange(band_h, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    base = jnp.stack([gx.ravel(), gy.ravel()], axis=-1)
    scale = jnp.asarray([1.0 / W, 1.0 / meta.film.height], jnp.float32)

    def one_pass(rays, i):
        kp = jax.random.fold_in(key, i)
        pos_key, samp_key = jax.random.split(kp)
        jitter = film_jitter(meta.sampler, pos_key, pass_idx + i, meta.spp,
                             N)
        pos = base + jitter
        ray, sensor_weight = sensor_mod.sample_ray(
            scene, meta, pos * scale,
            jax.random.uniform(jax.random.fold_in(pos_key, 1), (N, 2)))
        sampler = Sampler.make(jax.random.fold_in(samp_key, y0), N)
        L, valid, sampler = integ(scene, meta, sampler, ray, aux=aux)
        L = jnp.where(jnp.isfinite(L), L, 0.0) * sensor_weight
        return rays + sampler.rays, (L.reshape(band_h, W, 3),
                                     jitter.reshape(band_h, W, 2))

    rays, (Ls, jits) = jax.lax.scan(one_pass, jnp.zeros((), jnp.float32),
                                    jnp.arange(n_passes))
    # (n_passes, band_h, W, 3/2): the caller splats each pass on the FULL
    # film so the reconstruction filter is identical to the non-banded
    # path (no band-seam truncation)
    return Ls, jits, rays


def render(scene, meta, seed: int = 0, spp: Optional[int] = None,
           integrator: Optional[str] = None, verbose: bool = False,
           aux=None, max_band_rays: Optional[int] = None,
           ray_stats: Optional[list] = None,
           timeout: Optional[float] = None, should_stop=None,
           on_pass=None, info: Optional[dict] = None,
           spp_per_dispatch: Optional[int] = None):
    """Full render: preprocess (if needed) + spp passes -> (H, W, 3).

    Two-pass integrators on the (remote) TPU render in row bands so no
    single dispatch runs for minutes (worker watchdog safety).
    If ``ray_stats`` is a list, the per-pass measured ray-count device
    scalars are appended to it (pull them AFTER the render: device->host
    transfers are expensive on remote TPU links).

    Cooperative cancellation (reference Integrator::should_stop,
    integrator.h:148-150 — m_stop flag OR render_timeout exceeded):
    ``timeout`` seconds and/or a ``should_stop()`` callable are checked
    between passes; on trigger the render stops early and the partial
    accumulation is developed (the weight channel normalizes it
    correctly at any pass count). ``on_pass(pass_idx, develop_fn)`` runs
    after each pass — the CLI uses it for SIGHUP partial dumps
    (mitsuba.cpp:114-123). ``info`` (a dict) receives ``passes_done``,
    ``stopped_early`` and ``wall_s``."""
    spp = spp or meta.spp
    key = jax.random.PRNGKey(seed)
    if aux is None:
        aux = preprocess(scene, meta, seed, integrator)
    name = integrator or meta.integrator
    # the remote TPU worker watchdog kills very long single kernels; every
    # integrator with unbounded inner collision loops renders in row bands
    # there (131k-lane hetvol volpath bands crash the worker reproducibly;
    # 16-32k bands are safe and cost <10% in dispatch overhead)
    heavy = name in ('vrl', 'photonmapper', 'photonmap')
    volumetric = heavy or (name in ('volpath', 'volpathmis')
                           and getattr(meta, 'has_media', False))
    if max_band_rays is None and jax.default_backend() == 'tpu':
        max_band_rays = 16384 if heavy else (32768 if volumetric else None)

    # persistent-wavefront regeneration scheduler (cross-band walk
    # compaction, integrators/regen.py): volumetric volpath renders keep
    # one saturation-width wavefront alive and refill finished lanes with
    # fresh paths instead of draining fixed bands to the max-lane tail.
    # Default on TPU (the banded path's measured ceiling is the reason it
    # exists); MNT_REGEN=1 forces it elsewhere (tests), =0 disables.
    # Falls back to bands when per-pass hooks need pass granularity.
    import os as _os
    _regen_env = _os.environ.get('MNT_REGEN', '')
    from .integrators.regen import regen_supported, render_regen
    # path-family regen is OPT-IN only (MNT_REGEN=1): measured on cbox it
    # LOSES to the fused multi-pass dispatch (18-22 vs 31.6 Mrays/s —
    # short paths + 16 passes folded into one kernel already amortize
    # the per-iteration floor, and the refill machinery costs more than
    # the occupancy win; docs/PERF.md round-5 negative results)
    use_regen = (regen_supported(meta, name, diff=False)
                 and should_stop is None and on_pass is None
                 and timeout is None
                 and _regen_env != '0'
                 and ((volumetric and not heavy
                       and (jax.default_backend() == 'tpu'
                            or _regen_env == '1'))
                      or (name == 'path' and _regen_env == '1')))
    if use_regen:
        t0 = time.time()
        acc = render_regen(scene, meta, seed=seed, spp=spp, aux=aux,
                           ray_stats=ray_stats, verbose=verbose,
                           integrator=name)
        if info is not None:
            info['passes_done'] = spp
            info['stopped_early'] = False
            info['wall_s'] = time.time() - t0
            info['scheduler'] = 'regen'
        return film_mod.develop(acc)

    acc = None
    t0 = time.time()
    W, H = meta.film.width, meta.film.height
    banded = max_band_rays is not None and W * H > max_band_rays
    # non-banded path: fold whole pass CHUNKS into single dispatches (the
    # per-dispatch latency on the remote-TPU link is ~100ms; per-spp host
    # loops pay it spp times). Chunk size bounds per-dispatch runtime
    # (worker watchdog) and sets the cancel/on_pass granularity — so
    # cancel/progress hooks default to per-pass dispatches.
    if spp_per_dispatch is not None:
        chunk = max(1, spp_per_dispatch)
    elif banded or should_stop is not None or on_pass is not None \
            or timeout is not None:
        chunk = 1
    else:
        chunk = min(16, spp)
    p = 0
    while p < spp:
        n_now = 1 if banded else min(chunk, spp - p)
        if banded:
            kp = jax.random.fold_in(key, p)
            band_h = max(1, max_band_rays // W)
            # fold this chunk's passes into each band dispatch (the
            # banded integrators are the slowest per pass; per-dispatch
            # latency would otherwise multiply by spp)
            n_band_passes = 1 if (should_stop is not None
                                  or on_pass is not None
                                  or timeout is not None) \
                else min(4, spp - p, spp_per_dispatch or 4)
            n_now = n_band_passes
            rows = []
            for y0 in range(0, H, band_h):
                bh = min(band_h, H - y0)
                Ls, jits, nrays = _render_band(scene, meta,
                                               jax.random.fold_in(kp, y0),
                                               jnp.uint32(y0), bh, name,
                                               aux, jnp.uint32(p),
                                               n_passes=n_band_passes)
                rows.append((Ls, jits))
                if ray_stats is not None:
                    ray_stats.append(nrays)
            # per pass: concat bands -> full-film filtered splat
            img = film_mod.new_image(meta.film)
            for p_i in range(n_band_passes):
                Lfull = jnp.concatenate([r[0][p_i] for r in rows], axis=0)
                jfull = jnp.concatenate([r[1][p_i] for r in rows], axis=0)
                img = film_mod.splat_pixel_ordered(
                    meta.film, jfull.reshape(-1, 2), Lfull.reshape(-1, 3),
                    img)
        elif n_now == 1:
            img, nrays = render_pass(scene, meta,
                                     jax.random.fold_in(key, p),
                                     integrator, aux, jnp.uint32(p))
            if ray_stats is not None:
                ray_stats.append(nrays)
        else:
            img, nrays = render_passes(scene, meta, key, n_now,
                                       integrator, aux, jnp.uint32(p))
            if ray_stats is not None:
                ray_stats.append(nrays)
        acc = img if acc is None else acc + img
        done = p + n_now
        if verbose:
            acc.block_until_ready()
            print(f"  pass {done}/{spp}  ({time.time() - t0:.2f}s)")
        if on_pass is not None:
            _acc = acc
            on_pass(done - 1, lambda: film_mod.develop(_acc))
        stop = (should_stop() if should_stop is not None else False) \
            or (timeout is not None and time.time() - t0 > timeout)
        if stop:
            if verbose:
                print(f"  [stop] after pass {done}/{spp} "
                      f"({time.time() - t0:.2f}s) — developing partial film")
            break
        p = done
    if info is not None:
        info['passes_done'] = done
        info['stopped_early'] = done < spp
        info['wall_s'] = time.time() - t0
    return film_mod.develop(acc)
