"""Scene builder: description dicts -> SoA device arrays.

TPU-native replacement for the reference's Properties/PluginManager object
instantiation (src/libcore/plugin.cpp, scene.cpp:22): a scene *description*
(nested python dicts, produced by the XML loader or constructed procedurally
in tests) is flattened on host into the SceneData pytree + static SceneMeta.

All geometry is pre-transformed to world space; analytic rectangles/cubes
become exact triangle pairs; disks/cylinders tessellate; spheres stay
analytic. Area emitters get per-emitter triangle CDF tables for sampling.
"""
from __future__ import annotations

import math as pymath
import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..core import transform as tr
from ..core.transform import Transform
from .types import (SceneData, SceneMeta, FilmMeta, Geometry, ShapeTable,
                    BSDFTable, EmitterTable, MediumTable, SensorData,
                    BSDF_TYPES, EMITTER_TYPES, MEDIUM_TYPES, PHASE_TYPES,
                    BSDF_NPARAM, EMITTER_NPARAM, MEDIUM_NPARAM,
                    M_SIGMA_T, M_ALBEDO, M_SCALE, M_PHASE_G, M_BBOX_MIN,
                    M_BBOX_MAX, M_MAJORANT, M_NL_TOP_IOR, M_NL_BOT_IOR,
                    M_NL_RES, M_NL_FROM_BOTTOM, TEXTURE_TYPES)
from .mesh_io import load_obj, load_ply, load_serialized, MeshData, \
    compute_vertex_normals
from .vol_io import load_vol, VolumeGrid
from .. import bsdf as bsdf_mod
from .. import emitter as emitter_mod
from ..sensor import build_sensor


def _rectangle_mesh() -> MeshData:
    v = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    n = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    return MeshData(v, f, n, uv)


def _cube_mesh() -> MeshData:
    corners = np.array([[x, y, z] for z in (-1, 1) for y in (-1, 1)
                        for x in (-1, 1)], np.float32)
    faces = []
    # outward winding (CCW seen from outside): -z, +z, -y, +y, -x, +x
    quads = [(0, 2, 3, 1), (4, 5, 7, 6), (0, 1, 5, 4), (2, 6, 7, 3),
             (0, 4, 6, 2), (1, 3, 7, 5)]
    for a, b, c, d in quads:
        faces += [[a, b, c], [a, c, d]]
    return MeshData(corners, np.asarray(faces, np.int32), None, None)


def _disk_mesh(segments: int = 64) -> MeshData:
    ang = np.linspace(0, 2 * np.pi, segments, endpoint=False)
    rim = np.stack([np.cos(ang), np.sin(ang), np.zeros(segments)], -1)
    v = np.concatenate([[[0, 0, 0]], rim]).astype(np.float32)
    f = np.asarray([[0, 1 + i, 1 + (i + 1) % segments]
                    for i in range(segments)], np.int32)
    n = np.tile(np.array([[0, 0, 1]], np.float32), (segments + 1, 1))
    return MeshData(v, f, n, None)


def _cylinder_mesh(radius: float, p0, p1, segments: int = 64) -> MeshData:
    p0 = np.asarray(p0, np.float32)
    p1 = np.asarray(p1, np.float32)
    axis = p1 - p0
    ln = np.linalg.norm(axis)
    axis = axis / ln
    # orthonormal frame
    a = np.array([1.0, 0, 0]) if abs(axis[0]) < 0.9 else np.array([0, 1.0, 0])
    u = np.cross(axis, a); u /= np.linalg.norm(u)
    w = np.cross(axis, u)
    ang = np.linspace(0, 2 * np.pi, segments, endpoint=False)
    ring = np.outer(np.cos(ang), u) + np.outer(np.sin(ang), w)
    v = np.concatenate([p0 + radius * ring, p1 + radius * ring]).astype(np.float32)
    n = np.concatenate([ring, ring]).astype(np.float32)
    f = []
    for i in range(segments):
        j = (i + 1) % segments
        f += [[i, j, segments + i], [j, segments + j, segments + i]]
    return MeshData(v, np.asarray(f, np.int32), n, None)


def _icosphere_mesh(subdiv: int = 3) -> MeshData:
    """Unit icosphere (used for emissive spheres: area-emitter sampling
    tables are triangle-based; analytic sphere emitters tessellate)."""
    phi = (1.0 + 5 ** 0.5) / 2.0
    v = np.array([[-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
                  [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
                  [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1]],
                 np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
                  [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
                  [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
                  [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
                 np.int64)
    for _ in range(subdiv):
        mid = {}
        verts = list(v)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in mid:
                p = verts[a] + verts[b]
                p = p / np.linalg.norm(p)
                mid[key] = len(verts)
                verts.append(p)
            return mid[key]

        nf = []
        for a, b, c in f:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            nf += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        v = np.asarray(verts)
        f = np.asarray(nf, np.int64)
    vf = v.astype(np.float32)
    return MeshData(vf, f.astype(np.int32), vf.copy(), None)


def _load_shape_mesh(sh: dict) -> Optional[MeshData]:
    t = sh['type']
    if t == 'mesh':
        return sh['mesh']
    if t == 'sphere' and sh.get('emitter') is not None:
        mesh = _icosphere_mesh()
        c = np.asarray(sh.get('center', (0, 0, 0)), np.float32)
        r = float(sh.get('radius', 1.0))
        return MeshData(mesh.vertices * r + c, mesh.faces, mesh.normals, None)
    if t == 'obj':
        mesh = load_obj(sh['filename'])
    elif t == 'ply':
        mesh = load_ply(sh['filename'])
    elif t == 'serialized':
        mesh = load_serialized(sh['filename'], int(sh.get('shape_index', 0)))
    elif t == 'blender':
        from .mesh_io import load_blender
        mesh = load_blender(sh)
    elif t == 'rectangle':
        mesh = _rectangle_mesh()
    elif t == 'cube':
        mesh = _cube_mesh()
    elif t == 'disk':
        mesh = _disk_mesh()
    elif t == 'cylinder':
        mesh = _cylinder_mesh(float(sh.get('radius', 1.0)),
                              sh.get('p0', (0, 0, 0)), sh.get('p1', (0, 0, 1)))
    elif t == 'sphere':
        return None   # analytic
    else:
        raise NotImplementedError(f"shape type {t}")
    if sh.get('face_normals', False):
        mesh = mesh._replace(normals=None)
    return mesh


_NULL_BSDF = {'type': 'null'}


def _procedural_sky(H: int = 64, W: int = 128) -> np.ndarray:
    """Structured stand-in environment for missing envmap EXRs: a
    blue-to-horizon vertical gradient, a bright warm sun disk at 30 deg
    elevation, and a dim brown ground hemisphere. Mean radiance is kept
    near 1 so scenes keep roughly the uniform-substitute exposure."""
    theta = (np.arange(H) + 0.5) / H * np.pi          # 0 = up
    phi = (np.arange(W) + 0.5) / W * 2.0 * np.pi
    t, p = np.meshgrid(theta, phi, indexing='ij')
    sky_t = np.clip(t / (0.5 * np.pi), 0.0, 1.0)      # 0 zenith -> 1 horizon
    zen = np.array([0.35, 0.55, 1.15])
    hor = np.array([1.05, 0.95, 0.85])
    img = zen[None, None] * (1 - sky_t[..., None]) \
        + hor[None, None] * sky_t[..., None]
    # ground: dim warm brown below the horizon
    ground = t > 0.5 * np.pi
    img[ground] = np.array([0.22, 0.17, 0.12])
    # sun disk: ~4 deg radius at 30 deg elevation, strongly peaked
    sun_dir = np.array([np.cos(np.radians(30)) * 1.0, 0.0,
                        np.sin(np.radians(30))])      # (x, y-ish, up)
    d = np.stack([np.sin(t) * np.cos(p), np.sin(t) * np.sin(p),
                  np.cos(t)], axis=-1)
    cosang = d @ np.array([sun_dir[0], sun_dir[1], sun_dir[2]])
    sun = cosang > np.cos(np.radians(4.0))
    img[sun] = np.array([60.0, 52.0, 40.0])
    return img.astype(np.float32)


# duplicate the density grid 8x only up to this size (4M voxels -> 128MB)
_PACK_MAX_VOXELS = 1 << 22


# supervoxel block edge (voxels). 8 is the shipped default; MNT_SUP_K
# exists so the majorant-tightness / crossing-count tradeoff can be
# measured per scene (docs/PERF.md round-4 notes).
_SUP_K = max(2, int(os.environ.get('MNT_SUP_K', '8')))


def _corner_pack(grid: np.ndarray, sup2: np.ndarray = None,
                 sup2_min: np.ndarray = None, sup_k: int = None) -> np.ndarray:
    """Corner-packed grid: row (z*Dy+y)*Dx+x holds the 8 trilinear corners
    of voxel (z,y,x), order dz*4+dy*2+dx, edge-clamped, PLUS (slot 8) the
    dilated supervoxel block-max and (slot 9) the eroded block-min of the
    voxel's block. One TPU row-gather then fetches a full trilinear
    footprint AND the local majorant/control of the block the point lies
    in (~8x cheaper than 8 element gathers + sup gathers,
    scripts/bench_gather.py). The block-min is the residual-ratio-tracking
    control (Novak et al. 2014): transmittance walks sample collisions at
    the RESIDUAL rate max-min only.

    Slot-8/9 soundness (vs the one-voxel bounds in grid_sup used by the
    exact-block fallback): the walk addresses this row by the probe's
    trilinear BASE voxel v = floor(rel*D-0.5). The probe is the MIDPOINT
    of a DDA interval confined to one supervoxel block, so per axis the
    probe lies in [v+0.5, v+1.5) and the interval's trilinear footprints
    reach at most voxel index max(blockhi(v)+1, v+2) on the high side
    and blocklo(v)-1 on the low side. For v INTERIOR to its block
    (v < blockhi) that is exactly the 1-voxel-dilated block window; only
    when v is the LAST voxel of its block on some axis (the probe's true
    containing voxel v+1 then lies in the NEXT block) does the window
    extend to blockhi+2. Rows therefore store the tight 1-dilated block
    bound for all-interior voxels and a [lo-1, hi+2] asymmetric window
    for block-boundary voxels — a 1-voxel window for boundary voxels
    under-bounds sharp densities just inside the face (bmaj=0 vs true
    density > 0), biasing delta tracking and the ratio-tracking
    control, while a uniform 2-voxel window would loosen the majorant
    (hence slow the walks) everywhere."""
    sup_k = _SUP_K if sup_k is None else sup_k
    Dz, Dy, Dx = grid.shape
    zi = np.minimum(np.arange(Dz) + 1, Dz - 1)
    yi = np.minimum(np.arange(Dy) + 1, Dy - 1)
    xi = np.minimum(np.arange(Dx) + 1, Dx - 1)
    out = np.empty((Dz, Dy, Dx, 10), np.float32)
    for k in range(8):
        dz, dy, dx = (k >> 2) & 1, (k >> 1) & 1, k & 1
        g = grid
        if dz:
            g = g[zi]
        if dy:
            g = g[:, yi]
        if dx:
            g = g[:, :, xi]
        out[..., k] = g
    del sup2, sup2_min   # bounds are derived here (two windows, below)
    supA = _supervoxel_max(grid, sup_k, dilate=1)
    supA_min = _supervoxel_min(grid, sup_k, dilate=1)
    supB = _supervoxel_max(grid, sup_k, dilate=1, dilate_hi=2)
    supB_min = _supervoxel_min(grid, sup_k, dilate=1, dilate_hi=2)
    # broadcast each block's bounds over its voxels; block-boundary
    # voxels (last of their block on any axis) take the extended window
    bz = np.arange(Dz) // sup_k
    by = np.arange(Dy) // sup_k
    bx = np.arange(Dx) // sup_k

    def last_of_block(D):
        v = np.arange(D)
        return ((v % sup_k) == sup_k - 1) | (v == D - 1)

    bnd = (last_of_block(Dz)[:, None, None]
           | last_of_block(Dy)[None, :, None]
           | last_of_block(Dx)[None, None, :])
    out[..., 8] = np.where(bnd, supB[bz][:, by][:, :, bx],
                           supA[bz][:, by][:, :, bx])
    out[..., 9] = np.where(bnd, supB_min[bz][:, by][:, :, bx],
                           supA_min[bz][:, by][:, :, bx])
    # Empty-space LEAP distances: for voxels whose slot-8 block bound is
    # zero the control slot is unused (c = 0 anyway), so slot 9 stores -D
    # instead, where D = Chebyshev distance (in blocks) from the voxel's
    # block to the nearest block whose WIDEST-window max (supB, the
    # 1/2-dilated bound that covers every trilinear footprint anywhere in
    # the block) is nonzero. Every block within Chebyshev distance < D
    # therefore has IDENTICALLY ZERO density everywhere (not merely zero
    # voxels — footprints can straddle borders, hence the dilated
    # occupancy), so the tracking walk can jump
    # min_axis(t_next + (D-1)*t_delta) in ONE crossing event instead of
    # stepping block-by-block (distance-field empty-space skipping — the
    # dominant event count in sparse grids like hetvol's smoke, 12% of
    # blocks occupied). Decoded in medium._majorant_walk.
    occ = supB > 0.0
    Sz, Sy, Sx = occ.shape

    def _dilate1(mask):
        p = np.pad(mask, 1, mode='constant')
        acc = np.zeros_like(mask)
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    acc |= p[dz:dz + Sz, dy:dy + Sy, dx:dx + Sx]
        return acc

    Dfield = np.zeros(occ.shape, np.float32)
    cur = occ.copy()
    dist = 0
    while not cur.all() and dist < 126:
        dist += 1
        nxt = _dilate1(cur)
        Dfield[nxt & ~cur] = dist
        cur = nxt
    if not cur.all():
        Dfield[~cur] = 127.0
    vac = out[..., 8] <= 0.0
    # The walk addresses this row by the trilinear BASE voxel
    # v = floor(rel*D-0.5); a face-confined interval whose base voxel is
    # the LAST of its block on some axis actually lies in the block of
    # v+1 there (the same reason slots 8/9 use the wider supB window for
    # bnd rows). The stored distance must therefore be valid for
    # WHICHEVER candidate block the interval lies in: min(Dfield) over
    # the voxel's own block and the blocks of v+1 along each axis
    # (identical to the own block for interior voxels; Chebyshev
    # 1-Lipschitz bounds the loss at one block for boundary rows).
    bzh = np.minimum(np.arange(Dz) + 1, Dz - 1) // sup_k
    byh = np.minimum(np.arange(Dy) + 1, Dy - 1) // sup_k
    bxh = np.minimum(np.arange(Dx) + 1, Dx - 1) // sup_k
    Dsafe = np.full(grid.shape, np.inf, np.float32)
    for az in (bz, bzh):
        for ay in (by, byh):
            for ax in (bx, bxh):
                Dsafe = np.minimum(Dsafe, Dfield[az][:, ay][:, :, ax])
    out[..., 9] = np.where(vac, -Dsafe, out[..., 9])
    return out.reshape(-1, 10)


def _supervoxel_min(grid: np.ndarray, k: int = None, dilate: int = 1,
                    dilate_hi: int = None) -> np.ndarray:
    """Block-min density over k^3 supervoxels, ERODED by ``dilate``
    voxels on the low side and ``dilate_hi`` (default: same) on the high
    side of every axis (any trilinear value inside a block is >= the min
    over the 1-voxel-dilated corner set; the packed copy's boundary rows
    use an asymmetric 1/2 window, see _corner_pack) — the
    residual-ratio-tracking control."""
    return _supervoxel_reduce(grid, k, dilate, dilate_hi, np.min)


def _supervoxel_max(grid: np.ndarray, k: int = None, dilate: int = 1,
                    dilate_hi: int = None) -> np.ndarray:
    """Block-max density over k^3 supervoxels, DILATED by ``dilate``
    voxels on the low side and ``dilate_hi`` (default: same) on the high
    side of every axis so any trilinear tap whose footprint straddles a
    block border is still bounded by its block's majorant (the packed
    copy's boundary rows need the 1/2 asymmetric window, see
    _corner_pack). Feeds the empty-space-skipping delta tracker
    (medium.sample_real_interaction)."""
    return _supervoxel_reduce(grid, k, dilate, dilate_hi, np.max)


def _supervoxel_reduce(grid, k, dilate, dilate_hi, op):
    k = _SUP_K if k is None else k
    if dilate_hi is None:
        dilate_hi = dilate
    Dz, Dy, Dx = grid.shape
    Sz, Sy, Sx = (max(1, -(-Dz // k)), max(1, -(-Dy // k)),
                  max(1, -(-Dx // k)))
    pad = max(dilate, dilate_hi)
    gp = np.pad(grid, pad, mode='edge')
    sup = np.zeros((Sz, Sy, Sx), np.float32)
    a0 = pad - dilate                   # window start offset into gp
    w = dilate + k + dilate_hi          # window width per axis
    for bz in range(Sz):
        for by in range(Sy):
            for bx in range(Sx):
                blk = gp[bz * k + a0:bz * k + a0 + w,
                         by * k + a0:by * k + a0 + w,
                         bx * k + a0:bx * k + a0 + w]
                sup[bz, by, bx] = op(blk)
    return sup


class SceneBuilder:
    def __init__(self, desc: dict):
        self.desc = desc
        self.bsdf_cache: Dict[int, int] = {}
        self.bsdf_rows: List[Tuple[int, int, list]] = []
        self.media_cache: Dict[int, int] = {}
        self.media_rows: List[dict] = []
        self.tex_rows: List[Tuple[int, list]] = []
        self.tex_bitmaps: List[np.ndarray] = []
        self.tex_volumes: List[np.ndarray] = []
        self.tex_cache: Dict[int, int] = {}
        self.measured: List[tuple] = []   # (MeasuredData, MeasuredMeta)
        self.measured_pol: List = []      # MeasuredPolData per material

    def _texture_index(self, props: dict) -> int:
        from .. import texture as tex_mod
        key = id(props)
        if key in self.tex_cache:
            return self.tex_cache[key]
        if props.get('type') == 'mesh_attribute':
            # the per-corner attribute buffer (geo.c0/c1/c2) is filled from
            # whichever named attribute the scene's mesh_attribute textures
            # request ("vertex_color" / "face_color" / "face_weight", the
            # reference's naming contract, mesh_attribute.cpp:66-68). One
            # buffered name per scene; a second distinct name warns.
            name = props.get('name', 'vertex_color')
            prev = getattr(self, 'mesh_attr_name', None)
            if prev is not None and prev != name:
                print(f"warning: multiple mesh_attribute names "
                      f"({prev!r}, {name!r}); only {prev!r} is buffered")
            else:
                self.mesh_attr_name = name
        row = tex_mod.pack(props, self.tex_bitmaps, self.tex_volumes)
        idx = len(self.tex_rows)
        self.tex_rows.append(row)
        self.tex_cache[key] = idx
        return idx

    def _bsdf_index(self, props: Optional[dict]) -> int:
        if props is None:
            props = {'type': 'diffuse'}
        key = id(props)
        if key in self.bsdf_cache:
            return self.bsdf_cache[key]
        if props.get('type') in ('normalmap', 'bumpmap'):
            # frame-perturbing wrapper (reference src/bsdfs/normalmap.cpp:
            # 82-118 and bumpmap.cpp:83-135): row stores the nested bsdf
            # index, the perturbation texture id, and the bump scale; the
            # dispatch (_resolve_perturb) rewrites the shading frame and
            # forwards to the nested row.
            from .types import BSDF_TYPES, BSDF_NPARAM
            kind = props['type']
            nested = props.get('bsdf', {'type': 'diffuse'})
            if isinstance(nested, list):
                nested = nested[0]
            row_n = self._bsdf_index(nested)
            tex = props.get(kind) or props.get('texture')
            if tex is None:  # any remaining dict child with a texture type
                from .types import TEXTURE_TYPES
                for v in props.values():
                    if isinstance(v, dict) \
                            and v.get('type') in TEXTURE_TYPES:
                        tex = v
                        break
            tex_id = self._texture_index(tex) if tex is not None else -1
            p = [0.0] * BSDF_NPARAM
            p[0] = float(row_n)
            p[1] = float(tex_id)
            p[2] = float(props.get('scale', 1.0))
            fl = self.bsdf_rows[row_n][1]
            idx = len(self.bsdf_rows)
            self.bsdf_rows.append((BSDF_TYPES[kind], fl, p))
            self.bsdf_cache[key] = idx
            return idx
        if props.get('type') == 'blendbsdf':
            subs = props.get('bsdf', [])
            if isinstance(subs, dict):
                subs = [subs, {'type': 'diffuse'}]
            rowA = self._bsdf_index(subs[0])
            rowB = self._bsdf_index(subs[1])
            from .types import BSDF_TYPES, F_SMOOTH, BSDF_NPARAM
            w = props.get('weight', 0.5)
            p = [0.0] * BSDF_NPARAM
            p[0], p[1] = float(rowA), float(rowB)
            if isinstance(w, dict):
                # textured blend weight (blendbsdf.cpp holds a Texture):
                # slot 19 = texture id + 1, rewritten per lane in
                # bsdf._blend_weight
                p[2] = 0.5
                p[19] = float(self._texture_index(w)) + 1.0
            else:
                p[2] = float(w)
            fl = self.bsdf_rows[rowA][1] | self.bsdf_rows[rowB][1]
            idx = len(self.bsdf_rows)
            self.bsdf_rows.append((BSDF_TYPES['blendbsdf'], fl, p))
            self.bsdf_cache[key] = idx
            return idx
        if props.get('type') == 'measured':
            # data-driven BSDF (src/bsdfs/measured.cpp): the tensor-file
            # warps live in scene.measured; the row stores the slot index
            from ..bsdf import measured as meas_mod
            from .types import BSDF_TYPES, F_SMOOTH, BSDF_NPARAM
            if '_fields' in props:       # pre-parsed tensors (tests)
                mdata, mmeta = meas_mod.load_fields(props['_fields'])
            else:
                mdata, mmeta = meas_mod.load(props['filename'])
            slot = len(self.measured)
            self.measured.append((mdata, mmeta))
            p = [0.0] * BSDF_NPARAM
            p[0] = float(slot)
            idx = len(self.bsdf_rows)
            self.bsdf_rows.append((BSDF_TYPES['measured'], F_SMOOTH, p))
            self.bsdf_cache[key] = idx
            return idx
        if props.get('type') == 'measured_polarized':
            # polarized pBRDF (src/bsdfs/measured_polarized.cpp): the
            # Mueller grid lives in scene.measured_pol; the row stores
            # (slot, alpha_sample, wavelength) in params[0:3]
            from ..bsdf import measured_pol as mp_mod
            from .types import BSDF_TYPES, F_SMOOTH, BSDF_NPARAM
            if '_fields' in props:       # pre-parsed tensors (tests)
                mdata = mp_mod.load_fields(props['_fields'])
            else:
                mdata = mp_mod.load(props['filename'])
            slot = len(self.measured_pol)
            self.measured_pol.append(mdata)
            p = [0.0] * BSDF_NPARAM
            p[0] = float(slot)
            p[1] = float(props.get('alpha_sample', 0.1))
            p[2] = float(props.get('wavelength', -1.0))
            idx = len(self.bsdf_rows)
            self.bsdf_rows.append((BSDF_TYPES['measured_polarized'],
                                   F_SMOOTH, p))
            self.bsdf_cache[key] = idx
            return idx
        # textured parameters -> register textures, record their ids
        # (reflectance feeds the diffuse slot-15 path; alpha and
        # specular_reflectance feed the slot-16/17 rewrite in
        # bsdf._apply_param_textures)
        for key, marker in (('reflectance', '_texture_id'),
                            ('diffuse_reflectance', '_texture_id'),
                            ('alpha', '_alpha_tex'),
                            ('specular_reflectance', '_spec_tex'),
                            ('opacity', '_opacity_tex')):
            if isinstance(props.get(key), dict) and marker not in props:
                props = dict(
                    props, **{marker: self._texture_index(props[key])})
        row = bsdf_mod.pack_params(props)
        idx = len(self.bsdf_rows)
        self.bsdf_rows.append(row)
        self.bsdf_cache[key] = idx
        return idx

    def _medium_index(self, props: Optional[dict]) -> int:
        if props is None:
            return -1
        key = id(props)
        if key in self.media_cache:
            return self.media_cache[key]
        idx = len(self.media_rows)
        self.media_rows.append(props)
        self.media_cache[key] = idx
        return idx

    def build(self) -> Tuple[SceneData, SceneMeta]:
        desc = self.desc
        # --- film / sensor ---------------------------------------------------
        sensor_desc = desc.get('sensor', {'type': 'perspective'})
        film_desc = sensor_desc.get('film', {})
        rfilter = film_desc.get('rfilter', {'type': 'gaussian'})
        if isinstance(rfilter, dict):
            rfilter = rfilter.get('type', 'gaussian')
        film = FilmMeta(width=int(film_desc.get('width', 256)),
                        height=int(film_desc.get('height', 256)),
                        rfilter=rfilter)
        sensor_type, sensor_data = build_sensor(sensor_desc, film.width,
                                                film.height)
        sampler_desc = sensor_desc.get('sampler', {'type': 'independent'})
        spp = int(sampler_desc.get('sample_count', 16))

        # --- shapes ----------------------------------------------------------
        tri_v, tri_n, tri_uv, tri_shape = [], [], [], []
        tri_c = []              # per-corner vertex colors (mesh_attribute)
        any_colors = False
        sph_c, sph_r, sph_shape = [], [], []
        shape_rows = []   # (bsdf, emitter, int_med, ext_med)
        area_emitters = []  # (props, shape_idx)
        shape_tri_ranges = []

        # expand instances (reference src/shapes/{instance,shapegroup}.cpp:
        # instancing is flattened — geometry duplicated with the composed
        # transform; shapegroups are never drawn directly)
        shapes = []
        for sh in desc.get('shapes', []):
            t = sh.get('type')
            if t == 'shapegroup':
                continue
            if t == 'instance':
                grp = sh.get('shapegroup', {})
                subs = grp.get('shape', [])
                if isinstance(subs, dict):
                    subs = [subs]
                T_inst = sh.get('to_world', Transform.identity())
                for sub in subs:
                    sub2 = dict(sub)
                    sub2['to_world'] = T_inst @ sub.get(
                        'to_world', Transform.identity())
                    shapes.append(sub2)
                continue
            shapes.append(sh)
        for sh in shapes:
            to_world: Transform = sh.get('to_world', Transform.identity())
            shape_idx = len(shape_rows)
            bsdf_props = sh.get('bsdf')
            if bsdf_props is None and (sh.get('interior') is not None
                                       or sh.get('exterior') is not None):
                # medium boundaries default to a null BSDF (reference
                # Shape ctor behavior for medium-only shapes)
                bsdf_props = _NULL_BSDF
            bsdf_idx = self._bsdf_index(bsdf_props)
            int_med = self._medium_index(sh.get('interior'))
            ext_med = self._medium_index(sh.get('exterior'))
            emitter_idx = -1
            if 'emitter' in sh and sh['emitter'] is not None:
                emitter_idx = len(area_emitters)   # resolved later
                area_emitters.append((sh['emitter'], shape_idx))

            tri_start = sum(len(t) for t in tri_shape)
            mesh = _load_shape_mesh(sh)
            if mesh is None:  # sphere
                M = np.asarray(to_world.m)
                center = (M @ np.array([*sh.get('center', (0, 0, 0)), 1.0]))[:3]
                scale_f = float(np.linalg.norm(M[:3, 0]))
                sph_c.append(center + 0 * center)
                sph_r.append(float(sh.get('radius', 1.0)) * scale_f)
                sph_shape.append(shape_idx)
                shape_tri_ranges.append((tri_start, 0))
            else:
                M = np.asarray(to_world.m, np.float64)
                Minv = np.asarray(to_world.inv, np.float64)
                v = mesh.vertices @ M[:3, :3].T + M[:3, 3]
                flip = np.linalg.det(M[:3, :3]) < 0
                faces = mesh.faces
                if flip:
                    faces = faces[:, [0, 2, 1]]
                if mesh.normals is not None:
                    n = mesh.normals @ Minv[:3, :3]
                    ln = np.linalg.norm(n, axis=1, keepdims=True)
                    ln[ln == 0] = 1
                    n = n / ln
                else:
                    mw = MeshData(v.astype(np.float32), faces, None, None)
                    n = compute_vertex_normals(mw)
                uv = mesh.uvs if mesh.uvs is not None else \
                    np.zeros((len(v), 2), np.float32)
                tri_v.append(v[faces].astype(np.float32))       # (F,3,3)
                tri_n.append(n[faces].astype(np.float32))
                tri_uv.append(uv[faces].astype(np.float32))
                attr_name = getattr(self, 'mesh_attr_name', 'vertex_color') \
                    or 'vertex_color'
                fa = getattr(mesh, 'face_attrs', None) or {}
                if attr_name.startswith('face_') \
                        and attr_name[5:] in fa:
                    # constant per-face attribute: identical corners make
                    # the barycentric interpolation exact
                    fv = fa[attr_name[5:]].astype(np.float32)   # (F, 3)
                    tri_c.append(np.repeat(fv[:, None, :], 3, axis=1))
                    any_colors = True
                elif getattr(mesh, 'colors', None) is not None:
                    tri_c.append(mesh.colors[faces].astype(np.float32))
                    any_colors = True
                else:
                    tri_c.append(np.zeros((len(faces), 3, 3), np.float32))
                tri_shape.append(np.full(len(faces), shape_idx, np.int32))
                shape_tri_ranges.append((tri_start, len(faces)))
            shape_rows.append([bsdf_idx, emitter_idx, int_med, ext_med])

        if tri_v:
            V = np.concatenate(tri_v)      # (T, 3, 3)
            Nrm = np.concatenate(tri_n)
            UV = np.concatenate(tri_uv)
            TS = np.concatenate(tri_shape)
            C = np.concatenate(tri_c) if any_colors else None
        else:
            V = np.zeros((0, 3, 3), np.float32)
            Nrm = np.zeros((0, 3, 3), np.float32)
            UV = np.zeros((0, 3, 2), np.float32)
            TS = np.zeros((0,), np.int32)
            C = None
        T = len(V)

        # --- BVH for larger scenes: Morton-reorder triangles and build the
        # node arrays (ops/bvh.py); emitter tri indices are remapped below.
        bvh_arrays = None
        cluster_arrays = None
        tri_perm_inv = None
        if T >= 1024:
            from ..ops import bvh as bvh_mod
            e1_np = V[:, 1] - V[:, 0]
            e2_np = V[:, 2] - V[:, 0]
            bvh_np = bvh_mod.build(V[:, 0], e1_np, e2_np)
            perm = bvh_np.order
            tri_perm_inv = np.empty(T, np.int64)
            tri_perm_inv[perm] = np.arange(T)
            V, Nrm, UV, TS = V[perm], Nrm[perm], UV[perm], TS[perm]
            if C is not None:
                C = C[perm]
            bvh_arrays = bvh_mod.BVHArrays(
                *[jnp.asarray(x) for x in bvh_np])
            # TPU traversal structure over the SAME (already applied)
            # Morton order: the cluster sweep (ops/isect_clusters.py) is
            # the one that actually beats the dense sweep on TPU
            # (crossover ~300k tris, docs/PERF.md); the packed BVH4
            # (ops/bvh4.py) is kept as the measured negative result.
            from ..ops import isect_clusters as ic_mod
            e1o = V[:, 1] - V[:, 0]
            e2o = V[:, 2] - V[:, 0]
            cluster_arrays = ic_mod.build(V[:, 0], e1o, e2o)

        # --- emitters --------------------------------------------------------
        emitter_rows = []       # (type, params, shape_idx)
        em_tri_idx, em_tri_cdf, em_area = [], [], []
        tri_offsets, tri_counts = [], []
        emitter_specs = []      # (kind, param, scale) per emitter
        spd_rows = []           # tabulated SPDs referenced by SPEC_TABLE
        def _reg_spec(spec):
            kind, param, sscale, table = spec
            if table is not None:
                param = float(len(spd_rows))
                spd_rows.append(np.asarray(table, np.float32))
            emitter_specs.append((kind, param, sscale))

        for props, shape_idx in area_emitters:
            code, params, espec = emitter_mod.pack_params(props)
            _reg_spec(espec)
            start, count = shape_tri_ranges[shape_idx]
            idxs = np.arange(start, start + count, dtype=np.int32)
            if tri_perm_inv is not None:
                idxs = tri_perm_inv[idxs].astype(np.int32)
            e1 = V[idxs, 1] - V[idxs, 0]
            e2 = V[idxs, 2] - V[idxs, 0]
            areas = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1)
            total = float(areas.sum()) if count else 0.0
            cdf = np.cumsum(areas) / max(total, 1e-30)
            tri_offsets.append(len(em_tri_idx) and sum(len(x) for x in em_tri_idx))
            tri_offsets[-1] = sum(len(x) for x in em_tri_idx)
            tri_counts.append(count)
            em_tri_idx.append(idxs)
            em_tri_cdf.append(cdf.astype(np.float32))
            em_area.append(total)
            emitter_rows.append((code, params, shape_idx))
        for props in desc.get('emitters', []):
            if props.get('type') == 'projector' \
                    and isinstance(props.get('irradiance'), dict):
                tid = self._texture_index(props['irradiance'])
                tc, tp = self.tex_rows[tid]
                aspect = 1.0
                if tc == TEXTURE_TYPES['bitmap']:
                    b = self.tex_bitmaps[int(tp[0])]
                    aspect = b.shape[1] / b.shape[0]
                props = dict(props, _irradiance_tex=tid, _aspect=aspect)
            code, params, espec = emitter_mod.pack_params(props)
            _reg_spec(espec)
            tw = props.get('to_world')
            if tw is not None and code == EMITTER_TYPES['point']:
                M = np.asarray(tw.m)
                params[0:3] = list((M @ np.array([*params[0:3], 1.0]))[:3])
            emitter_rows.append((code, params, -1))
            tri_offsets.append(sum(len(x) for x in em_tri_idx))
            tri_counts.append(0)
            em_area.append(0.0)

        E = len(emitter_rows)
        TE = sum(len(x) for x in em_tri_idx)

        # --- environment map (at most one) -------------------------------
        from ..core import distr2d
        env_map = np.zeros((1, 1, 3), np.float32)
        env_lum = np.ones((2, 2), np.float32)
        env_to_world = tr.Transform.identity()
        env_scale = 1.0
        env_descs = [e for e in desc.get('emitters', [])
                     if e.get('type') == 'envmap']
        if env_descs:
            eprops = env_descs[0]
            from ..utils.io import read_exr
            try:
                img, names = read_exr(eprops['filename'])
                if set('RGB') <= set(names):
                    img = img[:, :, [names.index(c) for c in 'RGB']]
                img = img[:, :, :3]
            except FileNotFoundError:
                # reference checkouts ship scenes whose envmap EXRs are
                # absent (mirage.xml -> venice_sunset_4k.exr); substitute
                # a STRUCTURED procedural sky (vertical gradient + warm
                # sun disk + ground) instead of failing the whole scene.
                # A uniform substitute made the mirage renders
                # deterministic (~1e-17 variance) and useless as an
                # equal-time variance datum (round-3 verdict); the
                # gradient+sun sky restores directional structure so
                # importance sampling and lightcut comparisons measure
                # something real.
                from ..utils.logger import Log, Warn
                Log(Warn, f"envmap '{eprops.get('filename')}' not found; "
                          f"substituting a procedural gradient+sun sky")
                img = _procedural_sky()
            env_map = np.ascontiguousarray(img, np.float32)
            env_scale = float(eprops.get('scale', 1.0))
            env_to_world = eprops.get('to_world', tr.Transform.identity())
            He, We = env_map.shape[:2]
            lum = (env_map * np.array([0.2126, 0.7152, 0.0722])).sum(-1)
            # node-grid luminance * sin(theta) with theta = y/(H-1)*pi
            # (envmap.cpp:89-113); rows 0 / H-1 get sin = 0 like the
            # reference (the poles carry no solid angle)
            sin_t = np.sin(np.arange(He) / max(He - 1, 1) * np.pi)
            env_lum = (lum * sin_t[:, None] + 1e-12).astype(np.float32)

        # --- media -----------------------------------------------------------
        M_n = len(self.media_rows)
        # always allocate >=1 row so per-lane gathers are well-formed even in
        # medium-free scenes (lanes carry medium_idx == -1)
        M_rows = max(M_n, 1)
        med_type = np.zeros(M_rows, np.int32)
        med_phase = np.zeros(M_rows, np.int32)
        med_params = np.zeros((M_rows, MEDIUM_NPARAM), np.float32)
        grid_sigma = np.zeros((1, 1, 1), np.float32)
        grid_albedo = np.zeros((1, 1, 1, 3), np.float32)
        grid_medium = -1
        nl_ior = np.ones((1,), np.float32)
        nl_medium = -1
        medium_types_meta = []
        phase_types_present = set()

        # medium bboxes: from shapes that reference them as interior
        med_bbox = {}
        for srow, sh in zip(shape_rows, shapes):
            if srow[2] >= 0:
                to_world = sh.get('to_world', Transform.identity())
                mesh = _load_shape_mesh(sh)
                if mesh is None:
                    c = np.asarray(sh.get('center', (0, 0, 0)), np.float64)
                    r = float(sh.get('radius', 1.0))
                    lo_, hi_ = c - r, c + r
                else:
                    M = np.asarray(to_world.m, np.float64)
                    v = mesh.vertices @ M[:3, :3].T + M[:3, 3]
                    lo_, hi_ = v.min(0), v.max(0)
                prev = med_bbox.get(srow[2])
                if prev is not None:
                    lo_ = np.minimum(lo_, prev[0]); hi_ = np.maximum(hi_, prev[1])
                med_bbox[srow[2]] = (lo_, hi_)

        for mi, props in enumerate(self.media_rows):
            mt = props['type']
            med_type[mi] = MEDIUM_TYPES[mt]
            medium_types_meta.append(MEDIUM_TYPES[mt])
            ph = props.get('phase', {'type': 'isotropic'})
            med_phase[mi] = PHASE_TYPES[ph.get('type', 'isotropic')]
            phase_types_present.add(int(med_phase[mi]))
            # reference HG default asymmetry g=0.8 (src/phase/hg.cpp:43)
            med_params[mi, M_PHASE_G] = float(ph.get('g', 0.8)) \
                if ph.get('type') == 'hg' else float(ph.get('g', 0.0))
            scale_v = float(props.get('scale', 1.0))
            med_params[mi, M_SCALE] = scale_v

            def rgb_of(key, default):
                v = props.get(key, default)
                if isinstance(v, dict):
                    return None
                if isinstance(v, (int, float)):
                    return np.full(3, float(v), np.float32)
                return np.asarray([float(x) for x in v], np.float32)

            lo_, hi_ = med_bbox.get(mi, (np.zeros(3), np.ones(3)))
            med_params[mi, M_BBOX_MIN:M_BBOX_MIN + 3] = lo_
            med_params[mi, M_BBOX_MAX:M_BBOX_MAX + 3] = hi_

            if mt in ('homogeneous', 'nonlinear'):
                if 'sigma_s' in props or 'sigma_a' in props:
                    # scattering/absorption parameterization (reference
                    # homogeneous.cpp alt ctor; brain.xml sigmaS/sigmaA)
                    ss = rgb_of('sigma_s', 0.0)
                    sa = rgb_of('sigma_a', 0.0)
                    st = ss + sa
                    al = np.where(st > 0, ss / np.maximum(st, 1e-30), 0.0)
                else:
                    st = rgb_of('sigma_t', 1.0)
                    al = rgb_of('albedo', 0.75)
                med_params[mi, M_SIGMA_T:M_SIGMA_T + 3] = st
                med_params[mi, M_ALBEDO:M_ALBEDO + 3] = al
                med_params[mi, M_MAJORANT:M_MAJORANT + 3] = st * scale_v
            if mt == 'heterogeneous':
                stv = props.get('sigma_t')
                if isinstance(stv, dict) and stv.get('type') == 'gridvolume':
                    vg: VolumeGrid = stv.get('_grid') or load_vol(stv['filename'])
                    grid_sigma = vg.data[..., 0]
                    grid_medium = mi
                    # grid bbox overrides medium bbox for lookup mapping
                    med_params[mi, M_BBOX_MIN:M_BBOX_MIN + 3] = vg.bbox_min
                    med_params[mi, M_BBOX_MAX:M_BBOX_MAX + 3] = vg.bbox_max
                    med_params[mi, M_SIGMA_T:M_SIGMA_T + 3] = 1.0
                    med_params[mi, M_MAJORANT:M_MAJORANT + 3] = \
                        vg.max_value * scale_v
                else:
                    st = rgb_of('sigma_t', 1.0)
                    med_params[mi, M_SIGMA_T:M_SIGMA_T + 3] = st
                    med_params[mi, M_MAJORANT:M_MAJORANT + 3] = st * scale_v
                al = rgb_of('albedo', 0.75)
                if al is None:
                    av = props['albedo']
                    if av.get('type') == 'gridvolume':
                        vg2 = av.get('_grid') or load_vol(av['filename'])
                        d = vg2.data
                        grid_albedo = d if d.shape[-1] == 3 else \
                            np.repeat(d, 3, axis=-1)
                        al = np.ones(3, np.float32)
                    elif av.get('type') == 'constvolume':
                        cv = av.get('value', av.get('color', 0.75))
                        al = np.full(3, float(cv), np.float32) \
                            if isinstance(cv, (int, float)) else \
                            np.asarray(cv, np.float32)
                med_params[mi, M_ALBEDO:M_ALBEDO + 3] = al
            if mt == 'nonlinear':
                res = (int(props.get('res_x', 4)), int(props.get('res_y', 4)),
                       int(props.get('res_z', 4)))
                med_params[mi, M_NL_TOP_IOR] = float(props.get('top_ior', 0.7))
                med_params[mi, M_NL_BOT_IOR] = float(props.get('bottom_ior', 1.0))
                med_params[mi, M_NL_RES:M_NL_RES + 3] = res
                med_params[mi, M_NL_FROM_BOTTOM] = \
                    1.0 if props.get('from_bottom', True) else 0.0
                nl_medium = mi
                # voxelize IOR (reference nonlinear.cpp:62-89 build():
                # lerp bottom->top over relative height, cell centers)
                rx, ry, rz = res
                cell = (hi_ - lo_) / np.asarray(res, np.float64)
                ys = lo_[1] + (np.arange(ry) + 0.5) * cell[1]
                h = hi_[1] - lo_[1]
                t = (ys - lo_[1]) / max(h, 1e-30)
                ior_y = (1 - t) * med_params[mi, M_NL_BOT_IOR] + \
                    t * med_params[mi, M_NL_TOP_IOR]
                # grid layout: index = (x*ry + y)*rz + z (reference order)
                grid = np.broadcast_to(ior_y[None, :, None], (rx, ry, rz))
                nl_ior = np.ascontiguousarray(grid, np.float32).reshape(-1)

        # --- assemble --------------------------------------------------------
        if T:
            v0 = V[:, 0]
            e1 = V[:, 1] - V[:, 0]
            e2 = V[:, 2] - V[:, 0]
        else:
            v0 = e1 = e2 = np.zeros((0, 3), np.float32)

        all_pts = [V.reshape(-1, 3)] if T else []
        for c, r in zip(sph_c, sph_r):
            all_pts.append(np.asarray(c)[None, :] - r)
            all_pts.append(np.asarray(c)[None, :] + r)
        if all_pts:
            pts = np.concatenate(all_pts)
            lo, hi = pts.min(0), pts.max(0)
        else:
            lo, hi = np.zeros(3), np.ones(3)
        center = 0.5 * (lo + hi)
        radius = float(np.linalg.norm(hi - center)) + 1e-4

        geo = Geometry(
            v0=jnp.asarray(v0), e1=jnp.asarray(e1), e2=jnp.asarray(e2),
            n0=jnp.asarray(Nrm[:, 0]) if T else jnp.zeros((0, 3)),
            n1=jnp.asarray(Nrm[:, 1]) if T else jnp.zeros((0, 3)),
            n2=jnp.asarray(Nrm[:, 2]) if T else jnp.zeros((0, 3)),
            uv0=jnp.asarray(UV[:, 0]) if T else jnp.zeros((0, 2)),
            uv1=jnp.asarray(UV[:, 1]) if T else jnp.zeros((0, 2)),
            uv2=jnp.asarray(UV[:, 2]) if T else jnp.zeros((0, 2)),
            shape_idx=jnp.asarray(TS),
            sph_center=jnp.asarray(np.asarray(sph_c, np.float32).reshape(-1, 3)),
            sph_radius=jnp.asarray(np.asarray(sph_r, np.float32)),
            sph_shape_idx=jnp.asarray(np.asarray(sph_shape, np.int32)),
            c0=jnp.asarray(C[:, 0]) if C is not None else (),
            c1=jnp.asarray(C[:, 1]) if C is not None else (),
            c2=jnp.asarray(C[:, 2]) if C is not None else ())

        sr = np.asarray(shape_rows, np.int32).reshape(-1, 4)
        # area emitter indices were provisional (list position); they are
        # already correct because area emitters were appended first.
        shapes_t = ShapeTable(
            bsdf_idx=jnp.asarray(sr[:, 0]) if len(sr) else jnp.zeros((0,), jnp.int32),
            emitter_idx=jnp.asarray(sr[:, 1]) if len(sr) else jnp.zeros((0,), jnp.int32),
            int_medium=jnp.asarray(sr[:, 2]) if len(sr) else jnp.zeros((0,), jnp.int32),
            ext_medium=jnp.asarray(sr[:, 3]) if len(sr) else jnp.zeros((0,), jnp.int32))

        if self.bsdf_rows:
            btype = np.asarray([r[0] for r in self.bsdf_rows], np.int32)
            bflags = np.asarray([r[1] for r in self.bsdf_rows], np.int32)
            bparams = np.asarray([r[2] for r in self.bsdf_rows], np.float32)
        else:
            btype = np.zeros((1,), np.int32)
            bflags = np.zeros((1,), np.int32)
            bparams = np.zeros((1, BSDF_NPARAM), np.float32)
        bsdfs_t = BSDFTable(type=jnp.asarray(btype), flags=jnp.asarray(bflags),
                            params=jnp.asarray(bparams))

        # tabulated conductor eta/k curves for spectral per-wavelength
        # Fresnel: a row is live when some conductor's param slot 13 points
        # at it (pack_params registered the curve via conductor_spd_id)
        from .ior_data import spd_curves
        from ..core.cie_data import CIE_SAMPLES
        _curves = spd_curves()
        has_cond_spd = bool(
            _curves is not None
            and any(r[0] in (BSDF_TYPES['conductor'],
                             BSDF_TYPES['roughconductor'])
                    and r[2][13] > 0 for r in self.bsdf_rows))
        cond_spd = jnp.asarray(_curves if has_cond_spd
                               else np.zeros((1, 2, CIE_SAMPLES), np.float32))

        emitters_t = EmitterTable(
            type=jnp.asarray(np.asarray([r[0] for r in emitter_rows], np.int32)),
            params=jnp.asarray(np.asarray([r[1] for r in emitter_rows],
                                          np.float32).reshape(E, EMITTER_NPARAM)),
            shape_idx=jnp.asarray(np.asarray([r[2] for r in emitter_rows],
                                             np.int32)),
            tri_offset=jnp.asarray(np.asarray(tri_offsets, np.int32)),
            tri_count=jnp.asarray(np.asarray(tri_counts, np.int32)),
            em_tri_idx=jnp.asarray(np.concatenate(em_tri_idx)
                                   if em_tri_idx else np.zeros(0, np.int32)),
            em_tri_cdf=jnp.asarray(np.concatenate(em_tri_cdf)
                                   if em_tri_cdf else np.zeros(0, np.float32)),
            em_area=jnp.asarray(np.asarray(em_area, np.float32)),
            env_map=jnp.asarray(env_map),
            env_warp=distr2d.build_hierarchical(env_lum),
            env_to_world=env_to_world,
            env_scale=jnp.float32(env_scale),
            spec_kind=jnp.asarray(np.asarray(
                [s[0] for s in emitter_specs], np.int32).reshape(E)),
            spec_param=jnp.asarray(np.asarray(
                [s[1] for s in emitter_specs], np.float32).reshape(E)),
            spec_scale=jnp.asarray(np.asarray(
                [s[2] for s in emitter_specs], np.float32).reshape(E)),
            spec_table=jnp.asarray(np.stack(spd_rows) if spd_rows
                                   else np.zeros((1, 95), np.float32)))

        _sup = (_supervoxel_max(grid_sigma) if grid_sigma.size > 1
                else np.ones((1, 1, 1), np.float32))
        _sup_min = (_supervoxel_min(grid_sigma) if grid_sigma.size > 1
                    else np.zeros((1, 1, 1), np.float32))
        media_t = MediumTable(
            type=jnp.asarray(med_type), phase_type=jnp.asarray(med_phase),
            params=jnp.asarray(med_params),
            grid_sigma_t=jnp.asarray(grid_sigma),
            grid_sup=jnp.asarray(_sup),
            grid_albedo=jnp.asarray(grid_albedo),
            grid_medium=jnp.asarray(grid_medium, jnp.int32),
            nl_ior=jnp.asarray(nl_ior),
            nl_medium=jnp.asarray(nl_medium, jnp.int32),
            grid_sup_min=jnp.asarray(_sup_min),
            grid_sigma_p8=(jnp.asarray(_corner_pack(grid_sigma))
                           if 1 < grid_sigma.size <= _PACK_MAX_VOXELS
                           else None))

        # --- textures --------------------------------------------------------
        from .types import TextureTable, TEX_NPARAM
        if self.tex_rows:
            ttype = np.asarray([r[0] for r in self.tex_rows], np.int32)
            tparams = np.asarray([r[1] for r in self.tex_rows], np.float32)
            if self.tex_bitmaps:
                Hm = max(b.shape[0] for b in self.tex_bitmaps)
                Wm = max(b.shape[1] for b in self.tex_bitmaps)
                data = np.zeros((len(self.tex_bitmaps), Hm, Wm, 3),
                                np.float32)
                sizes = np.zeros((len(self.tex_rows), 2), np.int32)
                for bi, b in enumerate(self.tex_bitmaps):
                    data[bi, :b.shape[0], :b.shape[1]] = b
                for ti, (tc, tp) in enumerate(self.tex_rows):
                    if tc == 0:  # bitmap
                        b = self.tex_bitmaps[int(tp[0])]
                        sizes[ti] = (b.shape[0], b.shape[1])
            else:
                data = np.zeros((1, 1, 1, 3), np.float32)
                sizes = np.zeros((len(self.tex_rows), 2), np.int32)
            # 3D volumes (grid3d): stack padded to the largest resolution;
            # vol_size rows are indexed by TEXTURE id (non-grid3d rows 1).
            if self.tex_volumes:
                Dm = max(vv.shape[0] for vv in self.tex_volumes)
                Hm3 = max(vv.shape[1] for vv in self.tex_volumes)
                Wm3 = max(vv.shape[2] for vv in self.tex_volumes)
                vol = np.zeros((len(self.tex_volumes), Dm, Hm3, Wm3, 3),
                               np.float32)
                for vi, vv in enumerate(self.tex_volumes):
                    vol[vi, :vv.shape[0], :vv.shape[1], :vv.shape[2]] = vv
                vol_size = np.ones((len(self.tex_rows), 3), np.int32)
                from .types import TEXTURE_TYPES as _TT
                for ti, (tc, tp) in enumerate(self.tex_rows):
                    if tc == _TT['grid3d']:
                        vv = self.tex_volumes[int(tp[0])]
                        vol_size[ti] = vv.shape[:3]
                vol_j = jnp.asarray(vol)
                vol_size_j = jnp.asarray(vol_size)
            else:
                vol_j, vol_size_j = (), ()
            textures_t = TextureTable(
                type=jnp.asarray(ttype), params=jnp.asarray(tparams),
                data=jnp.asarray(data), size=jnp.asarray(sizes),
                vol=vol_j, vol_size=vol_size_j)
        else:
            textures_t = TextureTable(
                type=jnp.zeros((1,), jnp.int32),
                params=jnp.zeros((1, TEX_NPARAM), jnp.float32),
                data=jnp.zeros((1, 1, 1, 3), jnp.float32),
                size=jnp.zeros((1, 2), jnp.int32))

        integ = desc.get('integrator', {'type': 'path'})

        # SceneMeta is a jit static argument — every prop value must be
        # hashable. Nested dicts (e.g. moment/stokes wrapper integrators)
        # freeze into sorted (key, value) tuples.
        def _freeze(v):
            if isinstance(v, dict):
                return tuple(sorted((k, _freeze(x)) for k, x in v.items()))
            if isinstance(v, list):
                return tuple(_freeze(x) for x in v)
            return v

        iprops = tuple(sorted((k, _freeze(v)) for k, v in integ.items()
                              if k != 'type'))

        scene = SceneData(
            geo=geo, bvh=bvh_arrays, clusters=cluster_arrays,
            shapes=shapes_t, bsdfs=bsdfs_t,
            emitters=emitters_t, media=media_t, textures=textures_t,
            sensor=sensor_data,
            bbox_lo=jnp.asarray(lo, jnp.float32),
            bbox_hi=jnp.asarray(hi, jnp.float32),
            bsphere_c=jnp.asarray(center, jnp.float32),
            bsphere_r=jnp.asarray(radius, jnp.float32),
            measured=tuple(md for md, _ in self.measured),
            measured_pol=tuple(self.measured_pol),
            conductor_spd=cond_spd)

        # camera medium: if the camera origin is inside a medium-bearing
        # shape's bbox and that shape has a null/transparent boundary we
        # still start in vacuum (reference: sensors carry an explicit medium
        # ref; scenes here start outside media).
        meta = SceneMeta(
            n_tris=T, n_spheres=len(sph_c), n_shapes=len(shape_rows),
            n_bsdfs=len(btype), n_emitters=E, n_media=M_n,
            bsdf_types=tuple(sorted(set(int(x) for x in btype))),
            emitter_types=tuple(sorted(set(int(r[0]) for r in emitter_rows))),
            medium_types=tuple(medium_types_meta),
            phase_types=tuple(sorted(phase_types_present)),
            sensor_type=sensor_type, film=film,
            sampler=sampler_desc.get('type', 'independent'), spp=spp,
            integrator=integ.get('type', 'path'), integrator_props=iprops,
            has_bvh=bvh_arrays is not None,
            has_media=M_n > 0,
            has_textures=len(self.tex_rows) > 0,
            has_3d_textures=any(
                r[0] == TEXTURE_TYPES['grid3d'] for r in self.tex_rows),
            has_attr_textures=C is not None and any(
                r[0] == TEXTURE_TYPES['mesh_attribute']
                for r in self.tex_rows),
            has_param_textures=any(
                r[2][16] > 0 or r[2][17] > 0 or r[2][18] > 0
                or (r[0] in (BSDF_TYPES['plastic'],
                             BSDF_TYPES['roughplastic'],
                             BSDF_TYPES['pplastic']) and r[2][15] >= 0)
                for r in self.bsdf_rows),
            spectral=bool(self.desc.get('spectral', False)),
            has_conductor_spd=has_cond_spd,
            measured_meta=tuple(mm for _, mm in self.measured))
        return scene, meta


def enable_double():
    """Switch the process to the double-precision variant (the reference's
    ``*_double`` build configs, resources/mitsuba.conf.template:100-110):
    enables jax x64 so every ``jnp.zeros``/literal in the wavefront code
    defaults to float64. Must run before any array is traced; scenes built
    afterwards (or with ``desc['double']=True``) carry float64 tables."""
    import jax
    jax.config.update('jax_enable_x64', True)


def _cast_scene_double(scene: SceneData) -> SceneData:
    import jax
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float64)
        if hasattr(x, 'dtype') and x.dtype == jnp.float32 else x, scene)


def build_scene(desc: dict) -> Tuple[SceneData, SceneMeta]:
    import os
    double = bool(desc.get('double', False)) \
        or os.environ.get('MNT_DOUBLE', '') == '1'
    if double:
        enable_double()
    scene, meta = SceneBuilder(desc).build()
    if double:
        scene = _cast_scene_double(scene)
    return scene, meta
