"""Texture evaluation (bitmap / checkerboard / constant).

TPU-native analog of the reference texture plugins
(src/textures/{bitmap,checkerboard}.cpp): per-lane texture ids gather from
a stacked padded bitmap array; checkerboards evaluate procedurally.
Host-side loading uses PIL (png/jpg) or the native EXR reader.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

from ..scene.types import TEXTURE_TYPES, TEX_NPARAM


def load_bitmap(path: str, gamma: bool = True) -> np.ndarray:
    """Load an image file to linear float32 (H, W, 3)."""
    if path.lower().endswith('.exr'):
        from ..utils.io import read_exr
        img, names = read_exr(path)
        if set('RGB') <= set(names):
            img = img[:, :, [names.index(c) for c in 'RGB']]
        return np.ascontiguousarray(img[:, :, :3], np.float32)
    from PIL import Image
    img = np.asarray(Image.open(path).convert('RGB'), np.float32) / 255.0
    if gamma:  # sRGB -> linear
        img = np.where(img <= 0.04045, img / 12.92,
                       ((img + 0.055) / 1.055) ** 2.4)
    return img.astype(np.float32)


def pack(props: dict, bitmaps: list) -> Tuple[int, list]:
    """Returns (type_code, params); appends loaded bitmaps to ``bitmaps``."""
    t = props.get('type', 'constant')
    p = [0.0] * TEX_NPARAM

    def rgb(key, default):
        v = props.get(key, default)
        if isinstance(v, (int, float)):
            return [float(v)] * 3
        return [float(x) for x in v]

    if t == 'bitmap':
        img = load_bitmap(props['filename'],
                          gamma=props.get('raw', False) is False)
        p[0] = len(bitmaps)        # bitmap slot
        p[6] = float(props.get('uscale', 1.0))
        p[7] = float(props.get('vscale', 1.0))
        bitmaps.append(img)
        return TEXTURE_TYPES['bitmap'], p
    if t == 'checkerboard':
        p[0:3] = rgb('color0', 0.4)
        p[3:6] = rgb('color1', 0.2)
        p[6] = float(props.get('uscale', 1.0))
        p[7] = float(props.get('vscale', 1.0))
        return TEXTURE_TYPES['checkerboard'], p
    # constant fallback
    p[0:3] = rgb('value', 0.5)
    return TEXTURE_TYPES['constant'], p


def eval(scene, tex_id, uv):
    """Per-lane texture lookup: tex_id (N,) int32 (-1 -> zeros), uv (N,2).
    Returns (N, 3)."""
    tt = scene.textures
    tid = jnp.maximum(tex_id, 0)
    ttype = tt.type[tid]
    P = tt.params[tid]
    us = P[:, 6]
    vs = P[:, 7]
    u = uv[:, 0] * jnp.where(us != 0, us, 1.0)
    v = uv[:, 1] * jnp.where(vs != 0, vs, 1.0)

    out = P[:, 0:3]  # constant / checkerboard color0 default

    # checkerboard (reference checkerboard.cpp: parity of floor(2u)+floor(2v))
    par = (jnp.floor(u * 2.0).astype(jnp.int32)
           + jnp.floor(v * 2.0).astype(jnp.int32)) & 1
    chk = jnp.where((par == 0)[:, None], P[:, 0:3], P[:, 3:6])
    out = jnp.where((ttype == TEXTURE_TYPES['checkerboard'])[:, None], chk,
                    out)

    if tt.data.shape[0] > 0 and tt.data.shape[1] > 1:
        slot = P[:, 0].astype(jnp.int32)
        H = tt.size[tid, 0]
        W = tt.size[tid, 1]
        # bilinear with wrap in u, flip v (image row 0 = top, uv v=0 bottom)
        x = (u % 1.0) * W.astype(jnp.float32) - 0.5
        y = ((1.0 - (v % 1.0)) * H.astype(jnp.float32)) - 0.5
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        tx = x - x0
        ty = y - y0

        def at(yy, xx):
            yy = jnp.clip(yy, 0, H - 1)
            xx = jnp.mod(xx, jnp.maximum(W, 1))
            return tt.data[slot, yy, xx]

        bil = (at(y0, x0) * ((1 - tx) * (1 - ty))[:, None]
               + at(y0, x0 + 1) * (tx * (1 - ty))[:, None]
               + at(y0 + 1, x0) * ((1 - tx) * ty)[:, None]
               + at(y0 + 1, x0 + 1) * (tx * ty)[:, None])
        out = jnp.where((ttype == TEXTURE_TYPES['bitmap'])[:, None], bil,
                        out)
    return jnp.where((tex_id >= 0)[:, None], out, 0.0)
