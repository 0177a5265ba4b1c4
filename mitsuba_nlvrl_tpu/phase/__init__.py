"""Phase functions: isotropic + Henyey-Greenstein.

TPU-native analog of src/phase/{isotropic,hg}.cpp with masked per-medium
dispatch. Conventions follow the reference phase.h: ``wi`` is the reversed
incident direction (mi.wi = -ray.d, world space); ``eval`` returns the
phase value == its sampling pdf; ``sample`` draws wo in world space around
the propagation direction (-wi).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..core import math as m
from ..core.frame import Frame
from ..scene.types import PHASE_TYPES, M_PHASE_G

P_ISO = PHASE_TYPES['isotropic']
P_HG = PHASE_TYPES['hg']


def _hg_eval(g, cos_theta):
    temp = 1.0 + g * g + 2.0 * g * cos_theta
    return m.InvFourPi * (1.0 - g * g) / jnp.maximum(temp * m.safe_sqrt(temp),
                                                     1e-12)


def eval(scene, meta, medium_idx, wi, wo, active):
    """Phase value p(wi -> wo) per lane (== pdf, both reference phases are
    perfectly importance sampled). wi, wo world-space; wi = -incident dir."""
    midx = jnp.maximum(medium_idx, 0)
    from ..ops.gather import take_many
    ptype, Pm = take_many([scene.media.phase_type, scene.media.params],
                          midx)
    g = Pm[:, M_PHASE_G]
    out = jnp.zeros(wi.shape[:-1], jnp.float32)
    cos_theta = m.dot(wo, wi)
    for code in meta.phase_types:
        if code == P_ISO:
            val = jnp.full_like(out, m.InvFourPi)
        elif code == P_HG:
            val = _hg_eval(g, cos_theta)
        else:
            continue
        out = jnp.where(ptype == code, val, out)
    return jnp.where(active, out, 0.0)


def sample(scene, meta, medium_idx, wi, u2, active) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample wo (world) and its pdf. wi = -incident propagation dir; the
    local frame is built around the propagation direction d = -wi
    (reference: mi.sh_frame = Frame(ray.d), hg.cpp:60-68)."""
    midx = jnp.maximum(medium_idx, 0)
    from ..ops.gather import take_many
    ptype, Pm = take_many([scene.media.phase_type, scene.media.params],
                          midx)
    g = Pm[:, M_PHASE_G]
    N = wi.shape[0]

    # HG: sample cos_theta around propagation dir
    gg = jnp.where(jnp.abs(g) < 1e-4, 1e-4, g)  # guarded; selected below
    sqr_term = (1.0 - gg * gg) / (1.0 - gg + 2.0 * gg * u2[:, 0])
    cos_hg = (1.0 + gg * gg - sqr_term * sqr_term) / (2.0 * gg)
    cos_iso = 1.0 - 2.0 * u2[:, 0]
    use_hg = (ptype == P_HG) & (jnp.abs(g) >= 1e-4)
    cos_theta = jnp.where(use_hg, cos_hg, cos_iso)
    sin_theta = m.safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = 2.0 * m.Pi * u2[:, 1]
    local = jnp.stack([sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi),
                       cos_theta], axis=-1)
    frame = Frame.from_normal(m.normalize(-wi))
    wo = frame.to_world(local)
    pdf = eval(scene, meta, medium_idx, wi, wo, active)
    return wo, pdf
