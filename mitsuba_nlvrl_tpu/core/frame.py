"""Shading frame: local orthonormal basis around a normal.

TPU-native analog of the reference's ``include/mitsuba/core/frame.h``:
a pytree of three unit vectors with to_local/to_world and the cos/sin/tan
helpers used by every BSDF. All functions broadcast over leading wavefront
dimensions.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import math as m


class Frame(NamedTuple):
    s: jnp.ndarray  # tangent
    t: jnp.ndarray  # bitangent
    n: jnp.ndarray  # normal

    @staticmethod
    def from_normal(n: jnp.ndarray) -> "Frame":
        s, t = m.coordinate_system(n)
        return Frame(s=s, t=t, n=n)

    def to_local(self, v: jnp.ndarray) -> jnp.ndarray:
        return jnp.stack(
            [m.dot(v, self.s), m.dot(v, self.t), m.dot(v, self.n)], axis=-1)

    def to_world(self, v: jnp.ndarray) -> jnp.ndarray:
        return (self.s * v[..., 0:1] + self.t * v[..., 1:2]
                + self.n * v[..., 2:3])


# local-frame trig helpers (v in local coordinates, z = normal)
def cos_theta(v):
    return v[..., 2]


def cos_theta_2(v):
    return m.sqr(v[..., 2])


def sin_theta_2(v):
    return jnp.maximum(0.0, 1.0 - cos_theta_2(v))


def sin_theta(v):
    return m.safe_sqrt(sin_theta_2(v))


def tan_theta(v):
    return m.safe_div(sin_theta(v), cos_theta(v))


def tan_theta_2(v):
    return m.safe_div(sin_theta_2(v), cos_theta_2(v))


def sin_phi(v):
    st = sin_theta(v)
    return jnp.where(st == 0.0, 0.0, jnp.clip(m.safe_div(v[..., 1], st), -1.0, 1.0))


def cos_phi(v):
    st = sin_theta(v)
    return jnp.where(st == 0.0, 1.0, jnp.clip(m.safe_div(v[..., 0], st), -1.0, 1.0))
