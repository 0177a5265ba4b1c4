"""Wavefront ray-scene intersection.

TPU-native replacement for the reference's ShapeKDTree / Embree traversal
(include/mitsuba/render/kdtree.h:2069-2299, scene_embree.inl): rays are
intersected against the SoA triangle/sphere arrays as a chunked dense
(rays x prims) computation — regular, branch-free work that XLA tiles onto
the VPU/MXU. A Pallas kernel (ops/pallas/intersect_tpu.py) implements the
same contract for large wavefronts; an LBVH path covers large meshes.

Contract (mirrors Scene::ray_intersect / ray_test, scene.cpp:113-162):
  intersect_preliminary -> (t, prim_idx, prim_kind, u, v) nearest hit
  ray_test              -> bool any-hit (shadow rays)
  compute_si            -> full SurfaceInteraction from a preliminary hit
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core.frame import Frame
from ..core.ray import Ray
from ..core.records import SurfaceInteraction

TRI_CHUNK = 1024

# Backend selection: the fused Pallas kernel (ops/pallas/intersect_tpu.py)
# currently matches the component-wise XLA path on TPU (both VPU-bound);
# opt in via MNT_INTERSECT=pallas. The BVH path (scene.bvh) wins on CPU and
# is kept for very large meshes, but its gather/scatter traversal loses to
# dense brute force on TPU at reference-scene sizes.
import os
_USE_PALLAS = os.environ.get('MNT_INTERSECT', '') == 'pallas'
# measured dense-vs-cluster crossover on TPU v5e (scripts/bench_isect.py)
_CLUSTER_MIN_TRIS = int(os.environ.get('MNT_CLUSTER_MIN', 262144))

KIND_TRI = 0
KIND_SPHERE = 1


class PreliminaryHit(NamedTuple):
    valid: jnp.ndarray     # (N,) bool
    t: jnp.ndarray         # (N,)
    prim_idx: jnp.ndarray  # (N,) int32 index within its kind's array
    kind: jnp.ndarray      # (N,) int32 KIND_*
    u: jnp.ndarray         # (N,) barycentric / param coords
    v: jnp.ndarray


def _moller_trumbore(o, d, v0, e1, e2):
    """Batched Möller-Trumbore: o,d (N,1,3); v0,e1,e2 (1,T,3).
    Returns (t, u, v, hit_geo) each (N, T).

    Written COMPONENT-WISE on (N, T) planes rather than (N, T, 3) vector
    ops: XLA fuses the scalar chains without materializing 3-vector
    intermediates in HBM (the (N,T,3) form was memory-bound, ~13x slower
    on TPU)."""
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    e1x, e1y, e1z = e1[..., 0], e1[..., 1], e1[..., 2]
    e2x, e2y, e2z = e2[..., 0], e2[..., 1], e2[..., 2]
    # pvec = d x e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tx = o[..., 0] - v0[..., 0]
    ty = o[..., 1] - v0[..., 1]
    tz = o[..., 2] - v0[..., 2]
    u = (tx * px + ty * py + tz * pz) * inv_det
    # qvec = tvec x e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    hit = (jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1)
    return t, u, v, hit


def _sphere_hits(o, d, center, radius):
    """o,d (N,1,3); center (1,S,3); radius (1,S). Returns (t_near, t_far, hit)."""
    oc = o - center
    b = jnp.sum(oc * d, -1)
    c = jnp.sum(oc * oc, -1) - radius * radius
    disc = b * b - c
    hit = disc >= 0
    sq = m.safe_sqrt(disc)
    return -b - sq, -b + sq, hit


def _scan_tris(ray: Ray, v0, e1, e2, any_hit: bool, maxt, tri_mask=None):
    """Chunked nearest (or any) hit over the triangle array. ``tri_mask``
    (T,) bool restricts the sweep to a primitive subset (e.g. occluders
    only for shadow queries) at zero extra sweep cost."""
    N = ray.o.shape[0]
    T = v0.shape[0]
    # chunk adapts to the scene: lane-dim multiple of 128, capped
    chunk = min(TRI_CHUNK, max(128, -(-T // 128) * 128))
    nchunk = max(1, -(-T // chunk))
    Tpad = nchunk * chunk
    pad = Tpad - T
    if pad:
        v0 = jnp.pad(v0, ((0, pad), (0, 0)))
        e1 = jnp.pad(e1, ((0, pad), (0, 0)))
        e2 = jnp.pad(e2, ((0, pad), (0, 0)))
        if tri_mask is not None:
            tri_mask = jnp.pad(tri_mask, (0, pad))
    v0c = v0.reshape(nchunk, chunk, 3)
    e1c = e1.reshape(nchunk, chunk, 3)
    e2c = e2.reshape(nchunk, chunk, 3)
    maskc = (tri_mask.reshape(nchunk, chunk) if tri_mask is not None
             else jnp.ones((nchunk, chunk), bool))
    o = ray.o[:, None, :]
    d = ray.d[:, None, :]

    def body(carry, chunk):
        best_t, best_i, best_u, best_v, occluded = carry
        cv0, ce1, ce2, cmask, base = chunk
        t, u, v, hit = _moller_trumbore(o, d, cv0[None], ce1[None], ce2[None])
        valid = hit & (t >= ray.mint[:, None]) & (t <= maxt[:, None]) \
            & cmask[None, :]
        if any_hit:
            occluded = occluded | jnp.any(valid, axis=1)
            return (best_t, best_i, best_u, best_v, occluded), None
        t = jnp.where(valid, t, jnp.inf)
        # min + one-hot select instead of argmin + take_along_axis: the
        # per-lane (N, chunk) gathers lower to serial dynamic-gathers on
        # TPU (~4ms each at N=262k) while the masked reduce is free VPU
        j = jnp.argmin(t, axis=1)
        tj = jnp.min(t, axis=1)
        oh = jnp.arange(t.shape[1])[None, :] == j[:, None]
        better = tj < best_t
        best_t = jnp.where(better, tj, best_t)
        best_i = jnp.where(better, base + j.astype(jnp.int32), best_i)
        best_u = jnp.where(better, jnp.sum(jnp.where(oh, u, 0.0), axis=1),
                           best_u)
        best_v = jnp.where(better, jnp.sum(jnp.where(oh, v, 0.0), axis=1),
                           best_v)
        return (best_t, best_i, best_u, best_v, occluded), None

    init = (jnp.full((N,), jnp.inf), jnp.full((N,), -1, jnp.int32),
            jnp.zeros((N,)), jnp.zeros((N,)), jnp.zeros((N,), bool))
    bases = (jnp.arange(nchunk, dtype=jnp.int32) * chunk)
    carry, _ = jax.lax.scan(body, init, (v0c, e1c, e2c, maskc, bases))
    return carry


def intersect_preliminary(scene, ray: Ray, maxt=None) -> PreliminaryHit:
    """Nearest-hit over all primitives. ``maxt`` overrides ray.maxt."""
    geo = scene.geo
    N = ray.o.shape[0]
    maxt = ray.maxt if maxt is None else maxt
    best_t = jnp.full((N,), jnp.inf)
    best_i = jnp.full((N,), -1, jnp.int32)
    best_u = jnp.zeros((N,))
    best_v = jnp.zeros((N,))
    kind = jnp.zeros((N,), jnp.int32)

    if geo.v0.shape[0] > 0:
        if getattr(scene, 'clusters', None) is not None \
                and geo.v0.shape[0] >= _CLUSTER_MIN_TRIS \
                and jax.default_backend() == 'tpu':
            # cluster sweep (ops/isect_clusters.py): dense (N, C) AABB
            # plane + one fat-row gather per visited cluster — beats the
            # dense triangle sweep above ~300k tris on TPU (measured
            # crossover, docs/PERF.md; per-lane BVH stack walks lose at
            # every size — scripts/bench_isect.py)
            from . import isect_clusters as ic_mod
            t, i, u, v = ic_mod.traverse(scene.clusters, ray.o, ray.d,
                                         ray.mint, maxt, any_hit=False)
            best_t = jnp.where(jnp.isfinite(t), t, jnp.inf)
            best_i, best_u, best_v = i, u, v
        elif _USE_PALLAS and jax.default_backend() == 'tpu':
            from .pallas.intersect_tpu import intersect_tris
            cols = [geo.v0[:, 0], geo.v0[:, 1], geo.v0[:, 2],
                    geo.e1[:, 0], geo.e1[:, 1], geo.e1[:, 2],
                    geo.e2[:, 0], geo.e2[:, 1], geo.e2[:, 2]]
            t, i, u, v = intersect_tris(cols, ray.o, ray.d, ray.mint, maxt)
            best_t = jnp.where(jnp.isfinite(t), t, jnp.inf)
            best_i, best_u, best_v = i, u, v
        elif scene.bvh is not None and jax.default_backend() != 'tpu':
            from . import bvh as bvh_mod
            t, i, u, v = bvh_mod.traverse(
                scene.bvh, geo.v0, geo.e1, geo.e2, ray.o, ray.d, ray.mint,
                maxt, any_hit=False)
            best_t = jnp.where(jnp.isfinite(t), t, jnp.inf)
            best_i, best_u, best_v = i, u, v
        else:
            t, i, u, v, _ = _scan_tris(ray, geo.v0, geo.e1, geo.e2, False,
                                       maxt)
            best_t, best_i, best_u, best_v = t, i, u, v

    if geo.sph_center.shape[0] > 0:
        tn, tf, hit = _sphere_hits(ray.o[:, None], ray.d[:, None],
                                   geo.sph_center[None], geo.sph_radius[None])
        tn_ok = hit & (tn >= ray.mint[:, None]) & (tn <= maxt[:, None])
        tf_ok = hit & (tf >= ray.mint[:, None]) & (tf <= maxt[:, None])
        ts = jnp.where(tn_ok, tn, jnp.where(tf_ok, tf, jnp.inf))
        j = jnp.argmin(ts, axis=1)
        tj = jnp.min(ts, axis=1)
        better = tj < best_t
        best_t = jnp.where(better, tj, best_t)
        best_i = jnp.where(better, j.astype(jnp.int32), best_i)
        kind = jnp.where(better, KIND_SPHERE, kind)

    valid = jnp.isfinite(best_t)
    return PreliminaryHit(valid=valid, t=best_t, prim_idx=best_i, kind=kind,
                          u=best_u, v=best_v)


def ray_test(scene, ray: Ray, maxt=None) -> jnp.ndarray:
    """Shadow-ray any-hit (reference Scene::ray_test, scene.cpp:138)."""
    geo = scene.geo
    maxt = ray.maxt if maxt is None else maxt
    occluded = jnp.zeros((ray.o.shape[0],), bool)
    if geo.v0.shape[0] > 0:
        if getattr(scene, 'clusters', None) is not None \
                and geo.v0.shape[0] >= _CLUSTER_MIN_TRIS \
                and jax.default_backend() == 'tpu':
            from . import isect_clusters as ic_mod
            t, _, _, _ = ic_mod.traverse(scene.clusters, ray.o, ray.d,
                                         ray.mint, maxt, any_hit=True)
            occluded = occluded | jnp.isfinite(t)
        elif _USE_PALLAS and jax.default_backend() == 'tpu':
            from .pallas.intersect_tpu import intersect_tris
            cols = [geo.v0[:, 0], geo.v0[:, 1], geo.v0[:, 2],
                    geo.e1[:, 0], geo.e1[:, 1], geo.e1[:, 2],
                    geo.e2[:, 0], geo.e2[:, 1], geo.e2[:, 2]]
            t, _, _, _ = intersect_tris(cols, ray.o, ray.d, ray.mint, maxt,
                                        any_hit=True)
            occluded = occluded | jnp.isfinite(t)
        elif scene.bvh is not None and jax.default_backend() != 'tpu':
            from . import bvh as bvh_mod
            t, _, _, _ = bvh_mod.traverse(
                scene.bvh, geo.v0, geo.e1, geo.e2, ray.o, ray.d, ray.mint,
                maxt, any_hit=True)
            occluded = occluded | jnp.isfinite(t)
        else:
            _, _, _, _, occ = _scan_tris(ray, geo.v0, geo.e1, geo.e2, True,
                                         maxt)
            occluded = occluded | occ
    if geo.sph_center.shape[0] > 0:
        tn, tf, hit = _sphere_hits(ray.o[:, None], ray.d[:, None],
                                   geo.sph_center[None], geo.sph_radius[None])
        ok = hit & (((tn >= ray.mint[:, None]) & (tn <= maxt[:, None]))
                    | ((tf >= ray.mint[:, None]) & (tf <= maxt[:, None])))
        occluded = occluded | jnp.any(ok, axis=1)
    return occluded


def ray_test_occluders(scene, ray: Ray, maxt=None) -> jnp.ndarray:
    """Any-hit against NON-NULL-BSDF primitives only: the shadow-query
    core of the single-segment NEE fast path (volpath.py) — pure-null
    boundary shells (medium containers) are skipped in the sweep itself,
    so no surface-crossing walk is needed to pass through them. Uses the
    chunked dense sweep with a per-triangle mask (cluster/pallas variants
    have no mask support; callers gate the fast path to scenes below the
    cluster crossover)."""
    from ..scene.types import BSDF_TYPES
    geo = scene.geo
    maxt = ray.maxt if maxt is None else maxt
    null_code = BSDF_TYPES['null']
    occluded = jnp.zeros((ray.o.shape[0],), bool)
    if geo.v0.shape[0] > 0:
        tri_b = scene.shapes.bsdf_idx[geo.shape_idx]
        tri_occ = scene.bsdfs.type[tri_b] != null_code
        _, _, _, _, occ = _scan_tris(ray, geo.v0, geo.e1, geo.e2, True,
                                     maxt, tri_mask=tri_occ)
        occluded = occluded | occ
    if geo.sph_center.shape[0] > 0:
        sph_b = scene.shapes.bsdf_idx[geo.sph_shape_idx]
        sph_occ = (scene.bsdfs.type[sph_b] != null_code)[None, :]
        tn, tf, hit = _sphere_hits(ray.o[:, None], ray.d[:, None],
                                   geo.sph_center[None], geo.sph_radius[None])
        ok = hit & sph_occ \
            & (((tn >= ray.mint[:, None]) & (tn <= maxt[:, None]))
               | ((tf >= ray.mint[:, None]) & (tf <= maxt[:, None])))
        occluded = occluded | jnp.any(ok, axis=1)
    return occluded


def compute_si(scene, ray: Ray, pi: PreliminaryHit) -> SurfaceInteraction:
    """Fill a full SurfaceInteraction from a preliminary hit (analog of
    Shape::compute_surface_interaction, shape.h:166)."""
    geo = scene.geo
    N = ray.o.shape[0]
    idx = jnp.maximum(pi.prim_idx, 0)
    is_tri = (pi.kind == KIND_TRI) & pi.valid

    # triangle attributes — one fused one-hot-matmul gather for the whole
    # attribute block (ops/gather.py: per-lane dynamic gathers are the
    # dominant cost of compute_si on TPU, ~6ms/262k lanes vs ~0 for MXU)
    if geo.v0.shape[0] > 0:
        from .gather import take_many
        te1, te2, n0, n1, n2, uv0, uv1, uv2, shape_tri = take_many(
            [geo.e1, geo.e2, geo.n0, geo.n1, geo.n2,
             geo.uv0, geo.uv1, geo.uv2, geo.shape_idx], idx)
        gn_tri = m.normalize(jnp.cross(te1, te2))
        w = 1.0 - pi.u - pi.v
        ns_tri = m.normalize(w[:, None] * n0 + pi.u[:, None] * n1
                             + pi.v[:, None] * n2)
        uv_tri = (w[:, None] * uv0 + pi.u[:, None] * uv1
                  + pi.v[:, None] * uv2)
    else:
        gn_tri = ns_tri = jnp.zeros((N, 3))
        uv_tri = jnp.zeros((N, 2))
        shape_tri = jnp.zeros((N,), jnp.int32)

    # clamp miss-t to 0 before evaluating positions: inf*0 would produce
    # NaNs that poison reverse-mode AD through jnp.where
    t_safe = jnp.where(pi.valid, pi.t, 0.0)
    p = ray.at(t_safe)

    if geo.sph_center.shape[0] > 0:
        sidx = jnp.clip(idx, 0, geo.sph_center.shape[0] - 1)
        gn_sph = m.normalize(p - geo.sph_center[sidx])
        shape_sph = geo.sph_shape_idx[sidx]
        theta = m.safe_acos(gn_sph[:, 2])
        phi = jnp.arctan2(gn_sph[:, 1], gn_sph[:, 0])
        uv_sph = jnp.stack([phi * m.InvTwoPi + 0.5, theta * m.InvPi], -1)
        gn = jnp.where(is_tri[:, None], gn_tri, gn_sph)
        ns = jnp.where(is_tri[:, None], ns_tri, gn_sph)
        uv = jnp.where(is_tri[:, None], uv_tri, uv_sph)
        shape_idx = jnp.where(is_tri, shape_tri, shape_sph)
    else:
        gn, ns, uv, shape_idx = gn_tri, ns_tri, uv_tri, shape_tri

    # orient geometric normal against the ray (two-sided geo normal like the
    # reference Mesh::compute_surface_interaction keeps gn fixed; we keep gn
    # as-is and let BSDF sidedness use the shading frame)
    sh_frame = Frame.from_normal(ns)
    wi_local = sh_frame.to_local(-ray.d)

    shape_idx = jnp.where(pi.valid, shape_idx, -1)
    safe_shape = jnp.maximum(shape_idx, 0)
    st = scene.shapes
    from .gather import take_many
    bsdf_i, emitter_i, int_m, ext_m = take_many(
        [st.bsdf_idx, st.emitter_idx, st.int_medium, st.ext_medium],
        safe_shape)
    return SurfaceInteraction(
        valid=pi.valid,
        t=jnp.where(pi.valid, pi.t, jnp.inf),
        p=p, n=gn, sh_frame=sh_frame, uv=uv, wi=wi_local,
        prim_index=pi.prim_idx, shape_idx=shape_idx,
        bsdf_idx=jnp.where(pi.valid, bsdf_i, 0),
        emitter_idx=jnp.where(pi.valid, emitter_i, -1),
        int_medium=jnp.where(pi.valid, int_m, -1),
        ext_medium=jnp.where(pi.valid, ext_m, -1))


def ray_intersect(scene, ray: Ray, maxt=None) -> SurfaceInteraction:
    """Closest-hit intersection. DETACHED from reverse-mode AD: geometric
    derivatives (shape gradients) are out of scope — the reference's
    differentiable mode likewise detaches its sampling structure and
    differentiates throughput weights only (autodiff.py:177-190 /
    vrl.cpp:185 detach). Without this, parameter-dependent ray origins
    (e.g. sampled medium collision points) push cotangents into the
    masked Möller-Trumbore lanes whose degenerate-triangle guards turn
    them into NaN."""
    ray = jax.tree_util.tree_map(jax.lax.stop_gradient, ray)
    si = compute_si(scene, ray, intersect_preliminary(scene, ray, maxt))
    return jax.tree_util.tree_map(jax.lax.stop_gradient, si)
