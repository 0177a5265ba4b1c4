"""Persistent-wavefront regeneration scheduler (integrators/regen.py).

The scheduler runs the IDENTICAL volpath bounce body as the banded path
(volpath.make_body) — these tests pin the scheduler-level invariants:
estimator agreement with the banded path, queue bookkeeping at the
edges, and the jitter contract between refill and splat.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from golden_scenes import load_anchor
from scenes import cornell_box
from mitsuba_nlvrl_tpu import build_scene, render


@pytest.fixture(autouse=True)
def _restore_env():
    old = os.environ.get('MNT_REGEN')
    yield
    if old is None:
        os.environ.pop('MNT_REGEN', None)
    else:
        os.environ['MNT_REGEN'] = old


def test_regen_matches_banded_on_hetvol():
    """Same estimator, different lane scheduling: the cross-scheduler
    image difference must be within the schedulers' own seed-to-seed
    noise scale."""
    scene, meta = build_scene(load_anchor('hetvol'))
    spp, seeds = 16, (1, 2)
    os.environ['MNT_REGEN'] = '0'
    banded = np.stack([np.asarray(render(scene, meta, spp=spp, seed=s))
                       for s in seeds])
    os.environ['MNT_REGEN'] = '1'
    info = {}
    regen = np.stack([np.asarray(render(scene, meta, spp=spp, seed=s,
                                        info=info))
                      for s in seeds])
    assert info.get('scheduler') == 'regen'
    assert np.isfinite(regen).all()
    noise = np.abs(banded[0] - banded[1]).mean()
    cross = np.abs(regen.mean(0) - banded.mean(0)).mean()
    # the cross-scheduler gap must not exceed the MC noise floor scale
    assert cross < 1.5 * noise, (cross, noise)
    rel = abs(regen.mean() - banded.mean()) / banded.mean()
    assert rel < 0.08, rel


def test_regen_homogeneous_fog_matches_banded():
    """Volpath + homogeneous medium + independent sampler through the
    regeneration scheduler agrees with the banded result."""
    med = {'type': 'homogeneous', 'sigma_t': 0.5, 'albedo': 0.9}
    d = cornell_box(spp=8, res=24,
                    integrator={'type': 'volpath', 'max_depth': 8},
                    medium=med)
    scene, meta = build_scene(d)
    os.environ['MNT_REGEN'] = '0'
    a = np.stack([np.asarray(render(scene, meta, spp=8, seed=s))
                  for s in (1, 2, 3)])
    os.environ['MNT_REGEN'] = '1'
    b = np.stack([np.asarray(render(scene, meta, spp=8, seed=s))
                  for s in (1, 2, 3)])
    se = np.sqrt(a.mean(axis=(1, 2, 3)).var(ddof=1) / 3
                 + b.mean(axis=(1, 2, 3)).var(ddof=1) / 3)
    assert abs(a.mean() - b.mean()) < 6 * se + 0.01, \
        (a.mean(), b.mean(), se)


def test_regen_tiny_film_queue_exhaustion():
    """More lanes than paths: the queue drains in the first refill and
    the render still completes with a correct weight channel."""
    med = {'type': 'homogeneous', 'sigma_t': 0.3, 'albedo': 0.8}
    d = cornell_box(spp=2, res=4,
                    integrator={'type': 'volpath', 'max_depth': 4},
                    medium=med)
    scene, meta = build_scene(d)
    os.environ['MNT_REGEN'] = '1'
    img = np.asarray(render(scene, meta, spp=2, seed=0))
    assert img.shape == (4, 4, 3)
    assert np.isfinite(img).all()
    assert img.mean() > 0


def test_regen_ray_stats_counted():
    """Measured ray counts flow through the regeneration path (the bench
    metric contract)."""
    scene, meta = build_scene(load_anchor('hetvol'))
    os.environ['MNT_REGEN'] = '1'
    stats = []
    render(scene, meta, spp=2, seed=0, ray_stats=stats)
    rays = float(np.asarray(sum(stats)))
    assert rays > 4 * 48 * 48 * 0.5, rays   # >> primary rays alone


def test_lane_jitter_decomposable_contract():
    """lane_jitter must agree between scattered per-lane evaluation (the
    refill) and the dense per-pass evaluation (the splat) — same (pass,
    pixel) -> same offset — and reproduce film_jitter's ldsampler
    distribution properties (all offsets in [0,1))."""
    from mitsuba_nlvrl_tpu.sampler import lane_jitter
    P = 64
    pix = jnp.arange(P, dtype=jnp.uint32)
    sel = jnp.asarray([5, 0, 63, 17, 9, 33, 2])
    for styp in ('ldsampler', 'independent'):
        dense = lane_jitter(styp, jnp.full((P,), 3, jnp.uint32), pix)
        scat = lane_jitter(styp, jnp.full((7,), 3, jnp.uint32),
                           pix[sel])
        np.testing.assert_allclose(np.asarray(scat),
                                   np.asarray(dense)[[5, 0, 63, 17, 9,
                                                      33, 2]])
        d = np.asarray(dense)
        assert ((d >= 0) & (d < 1)).all()
        # offsets actually vary across pixels and passes
        assert np.unique(d[:, 0]).size > P // 2
        d2 = np.asarray(lane_jitter(styp, jnp.full((P,), 4, jnp.uint32),
                                    pix))
        assert np.abs(d2 - d).max() > 0.01
