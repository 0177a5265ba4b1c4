"""Sensors: perspective / thinlens / radiancemeter / irradiancemeter.

TPU-native analog of the reference sensor plugins (src/sensors/*.cpp).
``sample_ray`` maps film-plane samples in [0,1)^2 (+ aperture samples) to
world-space camera rays for the whole wavefront at once. The perspective
mapping mirrors PerspectiveCamera::sample_ray (src/sensors/perspective.cpp:
119-230): sample -> near-plane point in camera space -> normalized direction,
with fov applied along the axis chosen by ``fov_axis``.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..core import math as m
from ..core import warp
from ..core.ray import Ray
from ..scene.types import SENSOR_TYPES, SensorData


def build_sensor(props: dict, film_w: int, film_h: int) -> Tuple[int, SensorData]:
    from ..core import transform as tr
    stype = SENSOR_TYPES[props.get('type', 'perspective')]
    to_world = props.get('to_world', tr.Transform.identity())
    fov = float(props.get('fov', 34.0))
    fov_axis = props.get('fov_axis', 'x')
    aspect = film_w / film_h
    tan_half = np.tan(np.deg2rad(fov) / 2.0)
    # express as horizontal (x) tangent
    if fov_axis == 'x' or (fov_axis == 'smaller' and aspect >= 1.0) or \
       (fov_axis == 'larger' and aspect < 1.0):
        tan_x = tan_half
    elif fov_axis in ('y', 'smaller', 'larger'):
        tan_x = tan_half * aspect
    elif fov_axis == 'diagonal':
        diag = np.sqrt(1.0 + 1.0 / (aspect * aspect))
        tan_x = tan_half / diag
    else:
        raise ValueError(f"fov_axis {fov_axis}")
    tan_y = tan_x / aspect
    return stype, SensorData(
        to_world=to_world,
        tan_fov_x=jnp.float32(tan_x),
        tan_fov_y=jnp.float32(tan_y),
        near_clip=jnp.float32(props.get('near_clip', 1e-2)),
        far_clip=jnp.float32(props.get('far_clip', 1e4)),
        aperture_radius=jnp.float32(props.get('aperture_radius', 0.0)),
        focus_distance=jnp.float32(props.get('focus_distance', 1.0)))


def sample_ray(scene, meta, pos_sample: jnp.ndarray,
               aperture_sample: jnp.ndarray) -> Tuple[Ray, jnp.ndarray]:
    """pos_sample (N,2) in [0,1)^2 (0,0 = top-left pixel corner).

    Returns (world ray, importance weight (N,3) — 1 for these sensors).
    """
    sen = scene.sensor
    stype = meta.sensor_type
    N = pos_sample.shape[0]
    sx = pos_sample[:, 0]
    sy = pos_sample[:, 1]

    if stype in (SENSOR_TYPES['perspective'], SENSOR_TYPES['thinlens']):
        # camera space: +z forward, +y up (image top = small sy -> +y)
        dx = (1.0 - 2.0 * sx) * sen.tan_fov_x
        dy = (1.0 - 2.0 * sy) * sen.tan_fov_y
        d_cam = jnp.stack([dx, dy, jnp.ones_like(dx)], axis=-1)

        if stype == SENSOR_TYPES['thinlens']:
            # focus plane point, lens offset (reference thinlens.cpp)
            p_lens2 = warp.square_to_uniform_disk_concentric(aperture_sample) \
                * sen.aperture_radius
            p_lens = jnp.concatenate(
                [p_lens2, jnp.zeros((N, 1))], axis=-1)
            p_focus = d_cam * sen.focus_distance
            d_cam = m.normalize(p_focus - p_lens)
            o_cam = p_lens
        else:
            d_cam = m.normalize(d_cam)
            o_cam = jnp.zeros((N, 3))

        o = sen.to_world.apply_point(o_cam)
        d = m.normalize(sen.to_world.apply_vector(d_cam))
        inv_z = 1.0 / d_cam[:, 2]
        ray = Ray(o=o, d=d, mint=sen.near_clip * inv_z,
                  maxt=sen.far_clip * inv_z)
        return ray, jnp.ones((N, 3))

    if stype == SENSOR_TYPES['radiancemeter']:
        o = sen.to_world.apply_point(jnp.zeros((N, 3)))
        d = m.normalize(sen.to_world.apply_vector(
            jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (N, 3))))
        return Ray.make(o, d), jnp.ones((N, 3))

    if stype == SENSOR_TYPES['irradiancemeter']:
        # cosine-weighted hemisphere from the origin (shape-attached meters
        # are approximated by the sensor frame)
        local = warp.square_to_cosine_hemisphere(pos_sample)
        o = sen.to_world.apply_point(jnp.zeros((N, 3)))
        d = m.normalize(sen.to_world.apply_vector(local))
        return Ray.make(o, d), jnp.full((N, 3), m.Pi)

    raise NotImplementedError(f"sensor type {stype}")
