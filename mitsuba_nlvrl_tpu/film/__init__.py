"""Film accumulation: reconstruction-filtered sample splatting.

TPU-native analog of the reference HDRFilm + ImageBlock::put
(src/librender/imageblock.cpp:80-130) and the rfilter plugins
(src/rfilters/*.cpp): each sample at continuous pixel position p spreads
over the static (2k+1)^2 filter footprint via one big scatter-add —
deterministic given the fixed tap enumeration order. A weight channel is
accumulated alongside and divided out in ``develop`` (hdrfilm.cpp:193-227).
"""
from __future__ import annotations

import math as pymath
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core import math as m
from ..scene.types import FilmMeta, RFILTER_TYPES

FILTER_RADII = {'box': 0.5, 'tent': 1.0, 'gaussian': 2.0, 'mitchell': 2.0,
                'catmullrom': 2.0, 'lanczos': 3.0}


def filter_eval(name: str, x: jnp.ndarray) -> jnp.ndarray:
    """1D filter kernels (separable), x = distance in pixels."""
    ax = jnp.abs(x)
    if name == 'box':
        return jnp.where(ax <= 0.5, 1.0, 0.0)
    if name == 'tent':
        return jnp.maximum(0.0, 1.0 - ax)
    if name == 'gaussian':
        std = 0.5
        alpha = -1.0 / (2.0 * std * std)
        r = FILTER_RADII['gaussian']
        return jnp.maximum(0.0, jnp.exp(alpha * ax * ax)
                           - jnp.exp(alpha * r * r))
    if name in ('mitchell', 'catmullrom'):
        if name == 'mitchell':
            B = C = 1.0 / 3.0
        else:
            B, C = 0.0, 0.5
        x2 = ax * ax
        x3 = x2 * ax
        y1 = ((12.0 - 9.0 * B - 6.0 * C) * x3
              + (-18.0 + 12.0 * B + 6.0 * C) * x2 + (6.0 - 2.0 * B)) / 6.0
        y2 = ((-B - 6.0 * C) * x3 + (6.0 * B + 30.0 * C) * x2
              + (-12.0 * B - 48.0 * C) * ax + (8.0 * B + 24.0 * C)) / 6.0
        return jnp.where(ax < 1.0, y1, jnp.where(ax < 2.0, y2, 0.0))
    if name == 'lanczos':
        tau = 3.0
        sx = jnp.sinc(ax)          # sinc(pi x)/(pi x)
        st = jnp.sinc(ax / tau)
        return jnp.where(ax < tau, sx * st, 0.0)
    raise ValueError(name)


def splat(film: FilmMeta, pos: jnp.ndarray, values: jnp.ndarray,
          weights: jnp.ndarray, image: jnp.ndarray) -> jnp.ndarray:
    """Accumulate N samples into image (H, W, C+1).

    pos: (N, 2) continuous pixel coords (x, y); values (N, C); weights (N,)
    sample weights (0 disables a lane). Returns updated image.
    """
    H, W = image.shape[0], image.shape[1]
    radius = FILTER_RADII[film.rfilter]
    k = int(pymath.ceil(2.0 * radius))  # taps per axis
    if film.rfilter == 'box':
        k = 1

    N, C = values.shape
    base = jnp.floor(pos - (0.5 * (k - 1) + 0.5) + 0.5).astype(jnp.int32) \
        if k > 1 else jnp.floor(pos).astype(jnp.int32)

    vals_w = jnp.concatenate([values, jnp.ones((N, 1), values.dtype)], -1) \
        * weights[:, None]

    img = image
    for oy in range(k):
        for ox in range(k):
            px = base[:, 0] + ox
            py = base[:, 1] + oy
            if k == 1:
                w = jnp.ones((N,), values.dtype)
            else:
                wx = filter_eval(film.rfilter, px + 0.5 - pos[:, 0])
                wy = filter_eval(film.rfilter, py + 0.5 - pos[:, 1])
                w = wx * wy
            inside = (px >= 0) & (px < W) & (py >= 0) & (py < H)
            w = jnp.where(inside & (weights > 0), w, 0.0)
            flat = jnp.clip(py, 0, H - 1) * W + jnp.clip(px, 0, W - 1)
            img = img.reshape(H * W, C + 1).at[flat].add(
                vals_w * w[:, None]).reshape(H, W, C + 1)
    return img


def splat_pixel_ordered(film: FilmMeta, jitter: jnp.ndarray,
                        values: jnp.ndarray, image: jnp.ndarray
                        ) -> jnp.ndarray:
    """Fast splat for the camera wavefront: exactly one sample per pixel in
    row-major order at position pixel+jitter. The filter footprint becomes
    a FIXED set of relative taps, so the scatter-add collapses to dense
    shifted adds (pad+slice) — no scatter ops, ~10x faster on TPU.

    jitter: (N, 2) in [0,1); values (N, C); image (H, W, C+1).
    """
    H, W = image.shape[0], image.shape[1]
    C = values.shape[1]
    radius = FILTER_RADII[film.rfilter]
    k = 1 if film.rfilter == 'box' else int(pymath.ceil(2.0 * radius))

    vals = jnp.concatenate([values, jnp.ones((values.shape[0], 1),
                                             values.dtype)], -1)
    vals = vals.reshape(H, W, C + 1)
    jx = jitter[:, 0].reshape(H, W)
    jy = jitter[:, 1].reshape(H, W)

    if k == 1:
        return image + vals

    # tap pixels p+d with |d + 0.5 - jitter| < radius for some jitter in
    # [0,1): d in [-ceil(r - 0.5), ceil(r - 0.5)]
    kk = int(pymath.ceil(radius - 0.5))
    img = image
    for dx in range(-kk, kk + 1):
        for dy in range(-kk, kk + 1):
            # distance from tap center (pixel+dx+0.5) to sample (pixel+jx)
            wx = filter_eval(film.rfilter, dx + 0.5 - jx)
            wy = filter_eval(film.rfilter, dy + 0.5 - jy)
            contrib = vals * (wx * wy)[..., None]
            # shift contrib by (dy, dx) into the image
            pad_y = (max(dy, 0), max(-dy, 0))
            pad_x = (max(dx, 0), max(-dx, 0))
            shifted = jnp.pad(contrib, (pad_y, pad_x, (0, 0)))
            shifted = shifted[pad_y[1]:pad_y[1] + H, pad_x[1]:pad_x[1] + W]
            img = img + shifted
    return img


def new_image(film: FilmMeta, channels: int = 3) -> jnp.ndarray:
    # default float dtype: float64 under the double variant (jax x64)
    dt = jnp.zeros(()).dtype
    return jnp.zeros((film.height, film.width, channels + 1), dt)


def develop(image: jnp.ndarray) -> jnp.ndarray:
    """Normalize by the accumulated filter weight (hdrfilm develop)."""
    w = image[..., -1:]
    return image[..., :-1] * m.safe_rcp(w)
