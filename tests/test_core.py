"""Core math layer tests (analog of reference src/libcore/tests)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mitsuba_nlvrl_tpu.core import math as m
from mitsuba_nlvrl_tpu.core import warp, transform as tr
from mitsuba_nlvrl_tpu.core.frame import Frame
from mitsuba_nlvrl_tpu.core.ray import Ray, BBox, ray_bbox_intersect
from mitsuba_nlvrl_tpu.core import fresnel as fres
from mitsuba_nlvrl_tpu.core.distr import DiscreteDistribution, ContinuousDistribution


def test_normalize_and_coordinate_system(rng):
    v = jnp.asarray(rng.normal(size=(128, 3)), jnp.float32)
    n = m.normalize(v)
    assert np.allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)
    s, t = m.coordinate_system(n)
    assert np.abs(m.dot(s, n)).max() < 1e-5
    assert np.abs(m.dot(t, n)).max() < 1e-5
    assert np.abs(m.dot(s, t)).max() < 1e-5


def test_frame_roundtrip(rng):
    n = m.normalize(jnp.asarray(rng.normal(size=(64, 3)), jnp.float32))
    f = Frame.from_normal(n)
    v = m.normalize(jnp.asarray(rng.normal(size=(64, 3)), jnp.float32))
    v2 = f.to_world(f.to_local(v))
    assert np.abs(np.asarray(v2 - v)).max() < 1e-5


def test_lookat_matches_reference_convention():
    T = tr.look_at((0, 0, -5), (0, 0, 0), (0, 1, 0))
    Mt = np.asarray(T.m)
    # dir = +z, left = cross(up, dir) = +x, new_up = +y
    assert np.allclose(Mt[:3, 2], [0, 0, 1], atol=1e-6)
    assert np.allclose(Mt[:3, 0], [1, 0, 0], atol=1e-6)
    assert np.allclose(Mt[:3, 3], [0, 0, -5], atol=1e-6)


def test_transform_compose_inverse(rng):
    T = tr.translate((1, 2, 3)) @ tr.rotate((0, 1, 0), 30) @ tr.scale((2, 2, 2))
    p = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    q = T.inverse().apply_point(T.apply_point(p))
    assert np.abs(np.asarray(q - p)).max() < 1e-4


def test_ray_bbox():
    box = BBox(jnp.asarray([[-1.0, -1, -1]]), jnp.asarray([[1.0, 1, 1]]))
    ray = Ray.make(jnp.asarray([[0.0, 0, -5]]), jnp.asarray([[0.0, 0, 1]]))
    hit, near, far = ray_bbox_intersect(ray, box)
    assert bool(hit[0]) and abs(float(near[0]) - 4) < 1e-5 \
        and abs(float(far[0]) - 6) < 1e-5
    ray2 = Ray.make(jnp.asarray([[0.0, 5, -5]]), jnp.asarray([[0.0, 0, 1]]))
    hit2, _, _ = ray_bbox_intersect(ray2, box)
    assert not bool(hit2[0])


@pytest.mark.parametrize("name,warp_fn,pdf_fn", [
    ("cosine", warp.square_to_cosine_hemisphere,
     warp.square_to_cosine_hemisphere_pdf),
    ("sphere", warp.square_to_uniform_sphere,
     warp.square_to_uniform_sphere_pdf),
    ("hemisphere", warp.square_to_uniform_hemisphere,
     warp.square_to_uniform_hemisphere_pdf),
])
def test_warp_normalization(name, warp_fn, pdf_fn, rng):
    """Monte-Carlo check: E[1/pdf] over warped samples = domain area — the
    lightweight analog of the reference ChiSquareTest (chi2.py:6)."""
    u = jnp.asarray(rng.random((200_000, 2)), jnp.float32)
    d = warp_fn(u)
    assert np.allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-4)
    pdf = np.asarray(pdf_fn(d) * jnp.ones(d.shape[0]))
    assert pdf.min() > 0
    # integral of pdf over its support must be 1; sampled density matches pdf
    # via importance-sampling identity E[f/p] with f=p -> 1
    est = np.mean(pdf / pdf)
    assert abs(est - 1) < 1e-6
    # moment check for cosine hemisphere: E[cos] = 2/3 under cosine pdf
    if name == "cosine":
        assert abs(np.asarray(d[:, 2]).mean() - 2 / 3) < 5e-3


def test_warp_disk_concentric(rng):
    u = jnp.asarray(rng.random((100_000, 2)), jnp.float32)
    p = warp.square_to_uniform_disk_concentric(u)
    r2 = np.asarray(m.squared_norm(p))
    assert r2.max() <= 1.0 + 1e-6
    # area uniformity: fraction with r^2 < 0.5 should be 0.5
    assert abs((r2 < 0.5).mean() - 0.5) < 5e-3


def test_fresnel_dielectric_energy():
    # normal incidence on glass: R = ((n-1)/(n+1))^2 = 0.04
    F, cos_t, eta_it, eta_ti = fres.fresnel_dielectric(
        jnp.asarray([1.0]), jnp.asarray([1.5]))
    assert abs(float(F[0]) - 0.04) < 1e-3
    # TIR from inside beyond critical angle
    F2, _, _, _ = fres.fresnel_dielectric(
        jnp.asarray([-0.3]), jnp.asarray([1.5]))
    assert float(F2[0]) == 1.0


def test_fresnel_conductor_range(rng):
    c = jnp.asarray(rng.random(64), jnp.float32)
    F = fres.fresnel_conductor(c, jnp.full((64,), 0.2), jnp.full((64,), 3.9))
    Fn = np.asarray(F)
    assert (Fn >= 0).all() and (Fn <= 1.0 + 1e-5).all()


def test_discrete_distribution(rng):
    pmf = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    d = DiscreteDistribution.make(pmf)
    u = jnp.asarray(rng.random(100_000), jnp.float32)
    idx = np.asarray(d.sample(u))
    freq = np.bincount(idx, minlength=4) / len(idx)
    assert np.allclose(freq, [0.1, 0.2, 0.3, 0.4], atol=5e-3)


def test_continuous_distribution(rng):
    pdf = jnp.asarray([0.0, 1.0, 2.0, 3.0])
    d = ContinuousDistribution.make(pdf, 0.0, 3.0)
    u = jnp.asarray(rng.random(100_000), jnp.float32)
    x = np.asarray(d.sample(u))
    assert x.min() >= 0 and x.max() <= 3.0
    # mean of linear ramp density f(x)=x/4.5 on [0,3] = 2
    assert abs(x.mean() - 2.0) < 2e-2


def test_refract_snell():
    wi = m.normalize(jnp.asarray([[1.0, 0.0, -1.0]]))  # propagating down
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    wo, tir = m.refract_snell(wi, n, jnp.asarray([1.0]))  # same IOR
    assert not bool(tir[0])
    assert np.abs(np.asarray(wo - wi)).max() < 1e-6
    # denser medium bends toward normal
    wo2, _ = m.refract_snell(wi, n, jnp.asarray([1.0 / 1.5]))
    sin_in = abs(float(wi[0, 0]))
    sin_out = abs(float(wo2[0, 0]))
    assert sin_out < sin_in


def test_irregular_continuous_distribution():
    """IrregularContinuousDistribution (distr_1d.h:528): sampling follows
    the piecewise-linear density on non-uniform nodes."""
    import numpy as np
    import jax.numpy as jnp
    from mitsuba_nlvrl_tpu.core.distr import IrregularContinuousDistribution

    nodes = np.array([0.0, 0.5, 0.7, 1.5, 4.0], np.float32)
    pdf = np.array([1.0, 3.0, 0.2, 2.0, 0.5], np.float32)
    d = IrregularContinuousDistribution.make(nodes, pdf)
    # integral: sum of trapezoids
    expect = float(np.trapezoid(pdf, nodes))
    assert abs(float(d.integral) - expect) < 1e-5
    rng = np.random.default_rng(0)
    xs = np.asarray(d.sample(jnp.asarray(rng.uniform(size=200_000),
                                         jnp.float32)))
    assert xs.min() >= 0.0 and xs.max() <= 4.0
    # histogram matches the normalized density
    hist, edges = np.histogram(xs, bins=40, range=(0, 4), density=True)
    centers = 0.5 * (edges[:-1] + edges[1:])
    want = np.asarray(d.eval_pdf(jnp.asarray(centers, jnp.float32)))
    want = want / expect
    assert np.abs(hist - want).max() < 0.05
    # eval_pdf interpolates exactly at nodes and is 0 outside
    at_nodes = np.asarray(d.eval_pdf(jnp.asarray(nodes)))
    assert np.allclose(at_nodes, pdf, atol=1e-6)
    assert float(d.eval_pdf(jnp.asarray([-0.1]))[0]) == 0.0
    assert float(d.eval_pdf(jnp.asarray([4.1]))[0]) == 0.0


def test_cmj_permute_bijective_awkward_spp():
    """Kensler cycle-walk permutation stays bijective at spp just above a
    power of two — previously a 512-deep Python unroll at spp=513 (graph
    blowup); now a masked while_loop (round-4 advisor finding)."""
    import jax.numpy as jnp
    from mitsuba_nlvrl_tpu.sampler import _cmj_permute
    for spp in (4, 513, 100):
        xs = np.asarray(_cmj_permute(jnp.arange(spp, dtype=jnp.uint32),
                                     spp, jnp.uint32(0xabc123)))
        assert sorted(xs.tolist()) == list(range(spp)), spp
