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


def pack(props: dict, bitmaps: list, volumes: list = None
         ) -> Tuple[int, list]:
    """Returns (type_code, params); appends loaded bitmaps/volumes to the
    given lists."""
    t = props.get('type', 'constant')
    p = [0.0] * TEX_NPARAM

    def rgb(key, default):
        v = props.get(key, default)
        if isinstance(v, (int, float)):
            return [float(v)] * 3
        return [float(x) for x in v]

    if t == 'grid3d' or (t == 'gridvolume' and volumes is not None):
        # 3D grid texture evaluated at the world hit position
        # (src/textures/grid3d.cpp:254-293): the stored transform maps
        # world space into the grid's unit cube
        from ..scene.vol_io import load_vol
        if 'grid' in props:          # direct ndarray (tests / python API)
            data = np.asarray(props['grid'], np.float32)
            bb_lo = np.asarray(props.get('bbox_min', (0, 0, 0)), np.float32)
            bb_hi = np.asarray(props.get('bbox_max', (1, 1, 1)), np.float32)
        else:
            vg = load_vol(props['filename'])
            data, bb_lo, bb_hi = vg.data, vg.bbox_min, vg.bbox_max
        if data.ndim == 3:
            data = data[..., None]
        if data.shape[-1] == 1:
            data = np.repeat(data, 3, axis=-1)
        tw = props.get('to_world')
        M = np.asarray(tw.m) if tw is not None else np.eye(4)
        Minv = np.linalg.inv(M)
        ext = np.maximum(bb_hi - bb_lo, 1e-12)
        # p_unit = (Minv @ p_world - bb_lo) / ext, folded into one 3x4
        A = Minv[:3, :3] / ext[:, None]
        b = (Minv[:3, 3] - bb_lo) / ext
        p[0] = len(volumes)
        p[8:20] = np.concatenate([A, b[:, None]], axis=1).reshape(-1)
        p[20] = float(props.get('scale', 1.0))
        volumes.append(data[..., :3].astype(np.float32))
        return TEXTURE_TYPES['grid3d'], p
    if t == 'constant3d':
        # (src/textures/constant3d.cpp): spatially constant 3D texture
        p[0:3] = rgb('value', rgb('color', 0.5))
        return TEXTURE_TYPES['constant3d'], p
    if t == 'mesh_attribute':
        # per-vertex attribute interpolated at the hit
        # (src/textures/mesh_attribute.cpp); the wavefront carries the
        # interpolated vertex color in si.attr
        p[20] = float(props.get('scale', 1.0))
        return TEXTURE_TYPES['mesh_attribute'], p
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


def vertex_attr(scene, si):
    """Interpolated per-vertex color at a surface hit (reference
    src/textures/mesh_attribute.cpp eval: barycentric interpolation of the
    named vertex attribute). The wavefront SI does not carry barycentrics,
    so they are reconstructed from the hit position by solving the 2x2
    normal equations of p - v0 = u*e1 + v*e2 — exact for points on the
    triangle's plane. Lanes whose prim is not a triangle of the hit shape
    (spheres, misses) return zeros."""
    geo = scene.geo
    if not isinstance(getattr(geo, 'c0', ()), jnp.ndarray):
        return jnp.zeros(si.p.shape, jnp.float32)
    T = geo.v0.shape[0]
    idx = jnp.clip(si.prim_index, 0, max(T - 1, 0))
    d = si.p - geo.v0[idx]
    e1 = geo.e1[idx]
    e2 = geo.e2[idx]
    a11 = jnp.sum(e1 * e1, -1)
    a12 = jnp.sum(e1 * e2, -1)
    a22 = jnp.sum(e2 * e2, -1)
    b1 = jnp.sum(d * e1, -1)
    b2 = jnp.sum(d * e2, -1)
    det = jnp.maximum(a11 * a22 - a12 * a12, 1e-18)
    u = (a22 * b1 - a12 * b2) / det
    v = (a11 * b2 - a12 * b1) / det
    w = 1.0 - u - v
    col = (w[:, None] * geo.c0[idx] + u[:, None] * geo.c1[idx]
           + v[:, None] * geo.c2[idx])
    # guard: the prim must actually be a triangle of the hit shape and the
    # reconstructed point must lie on its plane (rejects sphere prim ids)
    recon = geo.v0[idx] + u[:, None] * e1 + v[:, None] * e2
    on_tri = (jnp.sum((recon - si.p) ** 2, -1)
              <= 1e-6 * jnp.maximum(a11, a22))
    ok = si.valid & (geo.shape_idx[idx] == si.shape_idx) & on_tri
    return jnp.where(ok[:, None], col, 0.0)


def eval(scene, tex_id, uv, p_world=None, attr=None):
    """Per-lane texture lookup: tex_id (N,) int32 (-1 -> zeros), uv (N,2).
    ``p_world`` enables 3D (grid3d) textures, ``attr`` the interpolated
    vertex attribute for mesh_attribute. Returns (N, 3)."""
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

    # grid3d: trilerp the volume at the world-to-unit-cube mapped position
    vol = getattr(tt, 'vol', ())
    if p_world is not None and isinstance(vol, jnp.ndarray) and vol.ndim == 5:
        A = P[:, 8:20].reshape(-1, 3, 4)
        lp = jnp.einsum('nij,nj->ni', A[:, :, :3], p_world) + A[:, :, 3]
        slot = P[:, 0].astype(jnp.int32)
        D = tt.vol_size[tid, 0].astype(jnp.float32)
        Hh = tt.vol_size[tid, 1].astype(jnp.float32)
        Ww = tt.vol_size[tid, 2].astype(jnp.float32)
        inside = jnp.all((lp >= 0.0) & (lp <= 1.0), axis=-1)
        # voxel-center sampling like the medium grids (grid3d.cpp eval)
        fx = jnp.clip(lp[:, 0] * Ww - 0.5, 0.0, Ww - 1.0)
        fy = jnp.clip(lp[:, 1] * Hh - 0.5, 0.0, Hh - 1.0)
        fz = jnp.clip(lp[:, 2] * D - 0.5, 0.0, D - 1.0)
        x0 = fx.astype(jnp.int32)
        y0 = fy.astype(jnp.int32)
        z0 = fz.astype(jnp.int32)
        txf, tyf, tzf = fx - x0, fy - y0, fz - z0
        acc = 0.0
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    w = (jnp.where(dx, txf, 1 - txf)
                         * jnp.where(dy, tyf, 1 - tyf)
                         * jnp.where(dz, tzf, 1 - tzf))
                    xi = jnp.minimum(x0 + dx, (Ww - 1).astype(jnp.int32))
                    yi = jnp.minimum(y0 + dy, (Hh - 1).astype(jnp.int32))
                    zi = jnp.minimum(z0 + dz, (D - 1).astype(jnp.int32))
                    acc = acc + w[:, None] * tt.vol[slot, zi, yi, xi]
        g3 = jnp.where(inside[:, None], acc * P[:, 20:21], 0.0)
        out = jnp.where((ttype == TEXTURE_TYPES['grid3d'])[:, None], g3,
                        out)

    if attr is not None and isinstance(attr, jnp.ndarray):
        out = jnp.where((ttype == TEXTURE_TYPES['mesh_attribute'])[:, None],
                        attr * P[:, 20:21], out)
    return jnp.where((tex_id >= 0)[:, None], out, 0.0)
