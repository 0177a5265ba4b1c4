"""Interaction & sampling record pytrees.

TPU-native SoA analogs of the reference's record types
(include/mitsuba/render/interaction.h:83,368 and records.h:20,121): every
field is a wavefront array with leading batch dims; an explicit ``valid``
mask replaces the `is_valid()` sentinel-t test. Integer fields index into
the flattened SoA scene tables (bsdf_idx, emitter_idx, medium indices)
replacing per-lane C++ pointers.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .frame import Frame
from . import math as m


class SurfaceInteraction(NamedTuple):
    valid: jnp.ndarray        # (...,) bool — hit anything
    t: jnp.ndarray            # (...,) hit distance (inf if miss)
    p: jnp.ndarray            # (..., 3) hit position
    n: jnp.ndarray            # (..., 3) geometric normal
    sh_frame: Frame           # shading frame
    uv: jnp.ndarray           # (..., 2)
    wi: jnp.ndarray           # (..., 3) incident dir in LOCAL shading frame
    prim_index: jnp.ndarray   # (...,) int32 triangle/prim id
    shape_idx: jnp.ndarray    # (...,) int32 shape id
    bsdf_idx: jnp.ndarray     # (...,) int32 index into scene bsdf table
    emitter_idx: jnp.ndarray  # (...,) int32 index into emitter table (-1 none)
    int_medium: jnp.ndarray   # (...,) int32 interior medium id (-1 none)
    ext_medium: jnp.ndarray   # (...,) int32 exterior medium id (-1 none)

    def to_world(self, v):
        return self.sh_frame.to_world(v)

    def to_local(self, v):
        return self.sh_frame.to_local(v)

    @property
    def wi_world(self):
        return self.sh_frame.to_world(self.wi)

    def target_medium(self, d_world):
        """Medium on the side of the geo normal that ``d_world`` points to
        (reference interaction.h target_medium)."""
        cos = m.dot(d_world, self.n)
        return jnp.where(cos > 0, self.ext_medium, self.int_medium)

    def is_medium_transition(self):
        return (self.int_medium >= 0) | (self.ext_medium >= 0)

    @staticmethod
    def invalid(batch_shape) -> "SurfaceInteraction":
        z3 = jnp.zeros(batch_shape + (3,), jnp.float32)
        z2 = jnp.zeros(batch_shape + (2,), jnp.float32)
        zi = jnp.full(batch_shape, -1, jnp.int32)
        return SurfaceInteraction(
            valid=jnp.zeros(batch_shape, bool),
            t=jnp.full(batch_shape, jnp.inf, jnp.float32),
            p=z3, n=z3, sh_frame=Frame(z3, z3, z3), uv=z2, wi=z3,
            prim_index=zi, shape_idx=zi, bsdf_idx=jnp.zeros(batch_shape, jnp.int32),
            emitter_idx=zi, int_medium=zi, ext_medium=zi)


class MediumInteraction(NamedTuple):
    valid: jnp.ndarray          # (...,) bool — scattered inside the medium
    t: jnp.ndarray              # (...,) distance along ray
    p: jnp.ndarray              # (..., 3)
    wi: jnp.ndarray             # (..., 3) WORLD incident direction (-ray.d)
    medium_idx: jnp.ndarray     # (...,) int32
    sigma_s: jnp.ndarray        # (..., 3)
    sigma_n: jnp.ndarray        # (..., 3)
    sigma_t: jnp.ndarray        # (..., 3)
    combined_extinction: jnp.ndarray  # (..., 3) majorant


class PositionSample(NamedTuple):
    p: jnp.ndarray       # (..., 3)
    n: jnp.ndarray       # (..., 3)
    uv: jnp.ndarray      # (..., 2)
    pdf: jnp.ndarray     # (...,) area-measure pdf
    delta: jnp.ndarray   # (...,) bool


class DirectionSample(NamedTuple):
    """Solid-angle emitter sample toward a reference point
    (reference records.h:121)."""
    p: jnp.ndarray           # (..., 3) point on emitter
    n: jnp.ndarray           # (..., 3) normal at emitter point
    uv: jnp.ndarray          # (..., 2)
    d: jnp.ndarray           # (..., 3) unit dir from ref point to emitter
    dist: jnp.ndarray        # (...,)
    pdf: jnp.ndarray         # (...,) solid-angle pdf
    delta: jnp.ndarray       # (...,) bool (point/directional)
    emitter_idx: jnp.ndarray  # (...,) int32
