"""Ray / bounding-box primitives as pytrees.

TPU-native analogs of the reference's ``include/mitsuba/core/ray.h`` and
``bbox.h``. Rays are SoA arrays with leading wavefront dims; mint/maxt are
carried explicitly so masked wavefront loops can clamp segments.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from . import math as m


class Ray(NamedTuple):
    o: jnp.ndarray        # (..., 3) origin
    d: jnp.ndarray        # (..., 3) direction (unit unless noted)
    mint: jnp.ndarray     # (...,)
    maxt: jnp.ndarray     # (...,)

    @staticmethod
    def make(o, d, mint=None, maxt=None) -> "Ray":
        batch = jnp.broadcast_shapes(o.shape[:-1], d.shape[:-1])
        if mint is None:
            mint = jnp.full(batch, m.RayEpsilon, o.dtype)
        else:
            mint = jnp.broadcast_to(jnp.asarray(mint, o.dtype), batch)
        if maxt is None:
            maxt = jnp.full(batch, jnp.inf, o.dtype)
        else:
            maxt = jnp.broadcast_to(jnp.asarray(maxt, o.dtype), batch)
        return Ray(o=jnp.broadcast_to(o, batch + (3,)),
                   d=jnp.broadcast_to(d, batch + (3,)), mint=mint, maxt=maxt)

    def at(self, t) -> jnp.ndarray:
        return self.o + self.d * jnp.asarray(t)[..., None]


def spawn_ray(p: jnp.ndarray, d: jnp.ndarray, maxt=None) -> Ray:
    """Offset-origin secondary ray (reference Interaction::spawn_ray)."""
    return Ray.make(p, d, mint=m.RayEpsilon, maxt=maxt)


class BBox(NamedTuple):
    lo: jnp.ndarray  # (..., 3)
    hi: jnp.ndarray  # (..., 3)

    def center(self):
        return 0.5 * (self.lo + self.hi)

    def extents(self):
        return self.hi - self.lo

    def contains(self, p, eps=0.0):
        return jnp.all((p >= self.lo - eps) & (p <= self.hi + eps), axis=-1)

    def expand(self, other: "BBox") -> "BBox":
        return BBox(jnp.minimum(self.lo, other.lo), jnp.maximum(self.hi, other.hi))

    def surface_area(self):
        e = self.extents()
        return 2.0 * (e[..., 0] * e[..., 1] + e[..., 1] * e[..., 2]
                      + e[..., 2] * e[..., 0])


def ray_bbox_intersect(ray: Ray, box: BBox) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Slab test. Returns (hit_mask, near_t, far_t) — unclamped by mint/maxt.

    Mirrors BoundingBox::ray_intersect (reference bbox.h) semantics; division
    by zero direction components yields +-inf which the min/max handle.
    """
    inv_d = 1.0 / ray.d  # inf where d==0 is fine under IEEE
    t0 = (box.lo - ray.o) * inv_d
    t1 = (box.hi - ray.o) * inv_d
    tsmall = jnp.minimum(t0, t1)
    tbig = jnp.maximum(t0, t1)
    near = jnp.max(tsmall, axis=-1)
    far = jnp.min(tbig, axis=-1)
    hit = near <= far
    return hit, near, far
