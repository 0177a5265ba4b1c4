"""TPU traversal structures: bit-parity with the dense brute-force sweep
(the naive-vs-accelerated scheme of the reference test_kdtrees.py:26-101)
for BOTH the packed-row BVH4 (ops/bvh4.py — kept as the measured negative
result on TPU) and the cluster sweep (ops/isect_clusters.py — the TPU
default above the measured ~300k-tri crossover, docs/PERF.md)."""
import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_nlvrl_tpu.ops import bvh4
from mitsuba_nlvrl_tpu.ops.intersect import _scan_tris
from mitsuba_nlvrl_tpu.core.ray import Ray


def _soup(T, seed=1, scale=0.05):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-1, 1, (T, 3)).astype(np.float32)
    e1 = (rng.normal(size=(T, 3)) * scale).astype(np.float32)
    e2 = (rng.normal(size=(T, 3)) * scale).astype(np.float32)
    return v0, e1, e2


def test_bvh4_matches_brute_force():
    T, N = 4096, 2048
    v0, e1, e2 = _soup(T)
    b = bvh4.build(v0, e1, e2)
    ordn = np.asarray(b.order)
    v0s, e1s, e2s = v0[ordn], e1[ordn], e2[ordn]
    rng = np.random.default_rng(7)
    o = jnp.asarray(rng.uniform(-2, 2, (N, 3)).astype(np.float32))
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    mint = jnp.zeros((N,))
    maxt = jnp.full((N,), np.inf)

    t, i, u, v = bvh4.traverse(b, o, d, mint, maxt)
    ray = Ray(o, d, mint, maxt)
    tb, ib, ub, vb, _ = _scan_tris(ray, jnp.asarray(v0s), jnp.asarray(e1s),
                                   jnp.asarray(e2s), False, maxt)
    t, i, tb, ib = map(np.asarray, (t, i, tb, ib))
    hit = np.isfinite(tb)
    assert hit.sum() > 100
    assert (np.isfinite(t) == hit).all()
    assert np.allclose(t[hit], tb[hit], rtol=1e-4, atol=1e-6)
    assert (i[hit] == ib[hit]).mean() > 0.995   # coplanar ties may differ

    # any-hit agrees on the hit mask
    t2, _, _, _ = bvh4.traverse(b, o, d, mint, maxt, any_hit=True)
    assert (np.isfinite(np.asarray(t2)) == hit).all()


def test_bvh4_bounded_maxt():
    T, N = 2048, 512
    v0, e1, e2 = _soup(T, seed=3)
    b = bvh4.build(v0, e1, e2)
    ordn = np.asarray(b.order)
    rng = np.random.default_rng(11)
    o = jnp.asarray(rng.uniform(-2, 2, (N, 3)).astype(np.float32))
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    mint = jnp.full((N,), 0.05)
    maxt = jnp.full((N,), 1.5)
    t, i, _, _ = bvh4.traverse(b, o, d, mint, maxt)
    ray = Ray(o, d, mint, maxt)
    tb, ib, _, _, _ = _scan_tris(
        ray, jnp.asarray(v0[ordn]), jnp.asarray(e1[ordn]),
        jnp.asarray(e2[ordn]), False, maxt)
    t, tb = np.asarray(t), np.asarray(tb)
    hit = np.isfinite(tb)
    assert (np.isfinite(t) == hit).all()
    assert np.allclose(t[hit], tb[hit], rtol=1e-4, atol=1e-6)


def test_cluster_sweep_matches_brute_force():
    T, N = 4096, 2048
    from mitsuba_nlvrl_tpu.ops import isect_clusters as ic
    v0, e1, e2 = _soup(T)
    from mitsuba_nlvrl_tpu.ops import bvh as bvh_mod
    b = bvh_mod._build_numpy(v0, e1, e2)
    ordn = np.asarray(b.order)
    v0, e1, e2 = v0[ordn], e1[ordn], e2[ordn]
    cl = ic.build(v0, e1, e2)
    rng = np.random.default_rng(9)
    o = jnp.asarray(rng.uniform(-2, 2, (N, 3)).astype(np.float32))
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    mint = jnp.zeros((N,))
    for maxt in (jnp.full((N,), np.inf), jnp.full((N,), 1.8)):
        t, i, u, v = ic.traverse(cl, o, d, mint, maxt)
        ray = Ray(o, d, mint, maxt)
        tb, ib, _, _, _ = _scan_tris(ray, jnp.asarray(v0), jnp.asarray(e1),
                                     jnp.asarray(e2), False, maxt)
        t, i, tb, ib = map(np.asarray, (t, i, tb, ib))
        hit = np.isfinite(tb)
        assert (np.isfinite(t) == hit).all()
        assert np.allclose(t[hit], tb[hit], rtol=1e-4, atol=1e-6)
        assert (i[hit] == ib[hit]).mean() > 0.995
        t2, _, _, _ = ic.traverse(cl, o, d, mint, maxt, any_hit=True)
        assert (np.isfinite(np.asarray(t2)) == hit).all()


def test_scene_builder_attaches_clusters():
    """Scenes over the tri threshold carry the cluster arrays and the TPU
    dispatch sites see them (on CPU the dense/binary paths still run)."""
    from mitsuba_nlvrl_tpu import build_scene
    from mitsuba_nlvrl_tpu.core import transform as tr
    v0, e1, e2 = _soup(2000, seed=5)
    faces = np.arange(6000, dtype=np.int32).reshape(-1, 3)
    verts = np.concatenate([v0, v0 + e1, v0 + e2], axis=0).astype(np.float32)
    faces = np.stack([np.arange(2000), np.arange(2000) + 2000,
                      np.arange(2000) + 4000], axis=-1).astype(np.int32)
    from mitsuba_nlvrl_tpu.scene.mesh_io import MeshData
    desc = {
        'integrator': {'type': 'path', 'max_depth': 2},
        'sensor': {'type': 'perspective', 'fov': 60.0,
                   'to_world': tr.look_at((0, 0, -4), (0, 0, 0), (0, 1, 0)),
                   'film': {'width': 8, 'height': 8,
                            'rfilter': {'type': 'box'}},
                   'sampler': {'type': 'independent', 'sample_count': 1}},
        'shapes': [{'type': 'mesh',
                    'mesh': MeshData(verts, faces, None, None),
                    'bsdf': {'type': 'diffuse'}}],
        'emitters': [{'type': 'constant', 'radiance': (1.0, 1.0, 1.0)}],
    }
    scene, meta = build_scene(desc)
    assert scene.clusters is not None
    from mitsuba_nlvrl_tpu.ops.isect_clusters import K_TRIS
    assert scene.clusters.rows.shape[1] == K_TRIS * 9
