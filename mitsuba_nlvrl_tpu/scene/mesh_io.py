"""Host-side mesh loaders: OBJ, PLY (ascii/binary), Mitsuba .serialized.

TPU-native replacements for the reference plugins src/shapes/{obj,ply,
serialized}.cpp: parse on host with numpy, emit flat float32 arrays that the
scene builder uploads as SoA device tensors. No Object/Properties machinery —
just (vertices, faces, normals, uvs).
"""
from __future__ import annotations

import struct
import zlib
from typing import NamedTuple, Optional

import numpy as np


class MeshData(NamedTuple):
    vertices: np.ndarray            # (V, 3) float32
    faces: np.ndarray               # (F, 3) int32
    normals: Optional[np.ndarray]   # (V, 3) float32 per-vertex or None
    uvs: Optional[np.ndarray]       # (V, 2) float32 or None
    colors: Optional[np.ndarray] = None  # (V, 3) float32 vertex colors
    # per-OUTPUT-triangle face attributes (after fan-triangulation):
    # {"color": (F, 3), "weight": (F, 3), ...} — the reference's
    # "face_<name>" mesh attributes (mesh_attribute.cpp, ply.cpp)
    face_attrs: Optional[dict] = None


def load_obj(path: str) -> MeshData:
    """Wavefront OBJ loader (reference src/shapes/obj.cpp behavior: v/vn/vt/f,
    polygons fan-triangulated, per-corner normal/uv indices re-welded to
    per-vertex by splitting vertices on distinct index triples)."""
    vs, vns, vts = [], [], []
    corner_map = {}
    out_v, out_n, out_t, tris = [], [], [], []

    def corner(spec: str) -> int:
        if spec in corner_map:
            return corner_map[spec]
        parts = spec.split('/')
        vi = int(parts[0])
        vi = vi - 1 if vi > 0 else len(vs) + vi
        ti = ni = None
        if len(parts) > 1 and parts[1]:
            ti = int(parts[1]); ti = ti - 1 if ti > 0 else len(vts) + ti
        if len(parts) > 2 and parts[2]:
            ni = int(parts[2]); ni = ni - 1 if ni > 0 else len(vns) + ni
        idx = len(out_v)
        out_v.append(vs[vi])
        out_n.append(vns[ni] if ni is not None else None)
        out_t.append(vts[ti] if ti is not None else None)
        corner_map[spec] = idx
        return idx

    with open(path, 'r', errors='replace') as f:
        for line in f:
            if not line or line[0] in '#\n':
                continue
            tok = line.split()
            if not tok:
                continue
            if tok[0] == 'v':
                vs.append([float(tok[1]), float(tok[2]), float(tok[3])])
            elif tok[0] == 'vn':
                vns.append([float(tok[1]), float(tok[2]), float(tok[3])])
            elif tok[0] == 'vt':
                vts.append([float(tok[1]), float(tok[2])])
            elif tok[0] == 'f':
                ids = [corner(s) for s in tok[1:]]
                for k in range(1, len(ids) - 1):
                    tris.append([ids[0], ids[k], ids[k + 1]])

    v = np.asarray(out_v, np.float32)
    f_arr = np.asarray(tris, np.int32)
    has_n = any(n is not None for n in out_n)
    has_t = any(t is not None for t in out_t)
    n = np.asarray([x if x is not None else (0, 0, 0) for x in out_n],
                   np.float32) if has_n else None
    t = np.asarray([x if x is not None else (0, 0) for x in out_t],
                   np.float32) if has_t else None
    return MeshData(v, f_arr, n, t)


def load_ply(path: str) -> MeshData:
    """PLY loader: ascii and binary little/big endian, x/y/z + optional
    nx/ny/nz, u/v (or s/t), face vertex_indices (reference src/shapes/ply.cpp
    feature set)."""
    with open(path, 'rb') as f:
        data = f.read()
    if not data.startswith(b'ply'):
        raise ValueError(f"{path}: not a PLY file")
    header_end = data.index(b'end_header') + len(b'end_header')
    # consume the newline after end_header
    while data[header_end] in (0x0d, 0x0a):
        header_end += 1
    header = data[:header_end].decode('ascii', errors='replace')

    fmt = 'ascii'
    elements = []  # (name, count, [(type, prop_name) or ('list', ctype, itype, name)])
    for line in header.splitlines():
        tok = line.split()
        if not tok:
            continue
        if tok[0] == 'format':
            fmt = tok[1]
        elif tok[0] == 'element':
            elements.append((tok[1], int(tok[2]), []))
        elif tok[0] == 'property':
            if tok[1] == 'list':
                elements[-1][2].append(('list', tok[2], tok[3], tok[4]))
            else:
                elements[-1][2].append((tok[1], tok[2]))

    type_map = {'char': 'i1', 'uchar': 'u1', 'uint8': 'u1', 'int8': 'i1',
                'short': 'i2', 'ushort': 'u2', 'int16': 'i2', 'uint16': 'u2',
                'int': 'i4', 'uint': 'u4', 'int32': 'i4', 'uint32': 'u4',
                'float': 'f4', 'float32': 'f4', 'double': 'f8', 'float64': 'f8'}
    endian = '<' if 'little' in fmt else '>'

    verts = normals = uvs = colors = None
    faces = []
    face_arrays = []  # vectorized chunks from the uniform-arity fast path
    face_attr_cols = {}   # per-output-triangle scalar columns by name
    if fmt == 'ascii':
        body = data[header_end:].decode('ascii', errors='replace').split()
        pos = 0
        for name, count, props in elements:
            if name == 'vertex':
                names = [p[-1] for p in props]
                ncols = len(props)
                arr = np.asarray(body[pos:pos + count * ncols], np.float64)
                pos += count * ncols
                arr = arr.reshape(count, ncols)
                cols = {nm: arr[:, i] for i, nm in enumerate(names)}
                verts, normals, uvs, colors = _ply_vertex_cols(cols)
            elif name == 'face':
                extras = [p[-1] for p in props if p[0] != 'list']
                fa_rows = {e: [] for e in extras}
                for _ in range(count):
                    n = int(body[pos]); pos += 1
                    ids = [int(x) for x in body[pos:pos + n]]; pos += n
                    ex = [float(x) for x in body[pos:pos + len(extras)]]
                    pos += len(extras)
                    for k in range(1, n - 1):
                        faces.append([ids[0], ids[k], ids[k + 1]])
                        for e, val in zip(extras, ex):
                            fa_rows[e].append(val)
                face_attr_cols.update(
                    {e: np.asarray(v, np.float32) for e, v in
                     fa_rows.items()})
            else:
                # skip unknown ascii element conservatively
                ncols = len(props)
                pos += count * ncols
    else:
        off = header_end
        for name, count, props in elements:
            if name == 'vertex' and all(p[0] != 'list' for p in props):
                dt = np.dtype([(p[1], endian + type_map[p[0]]) for p in props])
                arr = np.frombuffer(data, dt, count, off)
                off += dt.itemsize * count
                cols = {nm: arr[nm].astype(np.float64) for nm in arr.dtype.names}
                verts, normals, uvs, colors = _ply_vertex_cols(cols)
            elif name == 'face':
                li = next(i for i, p in enumerate(props) if p[0] == 'list')
                ct = np.dtype(endian + type_map[props[li][1]])
                it = np.dtype(endian + type_map[props[li][2]])
                # scalar per-face properties after the index list
                # (reference ply.cpp face attributes, e.g. color_0/weight_0)
                extras = [(p[-1], np.dtype(endian + type_map[p[0]]))
                          for p in props[li + 1:]]
                ex_size = sum(dt.itemsize for _, dt in extras)
                # uniform-arity fast path: nearly every PLY has all-tri or
                # all-quad faces — reinterpret the whole block with a
                # strided record dtype instead of a per-face python loop
                n0 = int(np.frombuffer(data, ct, 1, off)[0]) if count else 0
                rec = ct.itemsize + n0 * it.itemsize + ex_size
                uniform = False
                if count and off + rec * count <= len(data):
                    fdt = np.dtype([('n', ct), ('ids', it, (n0,))]
                                   + [(e, dt) for e, dt in extras])
                    block = np.frombuffer(data, fdt, count, off)
                    if (block['n'] == n0).all():
                        ids = block['ids'].astype(np.int64)   # (count, n0)
                        face_arrays.extend(
                            np.stack([ids[:, 0], ids[:, k], ids[:, k + 1]],
                                     -1)                      # fan-triangulate
                            for k in range(1, n0 - 1))
                        # one attribute row per fan triangle, in the same
                        # concatenation order as face_arrays (k-major)
                        for e, _ in extras:
                            face_attr_cols[e] = np.tile(
                                block[e].astype(np.float32), n0 - 2)
                        off += rec * count
                        uniform = True
                if not uniform:
                    fa_rows = {e: [] for e, _ in extras}
                    for _ in range(count):
                        n = int(np.frombuffer(data, ct, 1, off)[0])
                        off += ct.itemsize
                        ids = np.frombuffer(data, it, n, off).astype(np.int64)
                        off += it.itemsize * n
                        ex = {}
                        for e, dt in extras:
                            ex[e] = float(np.frombuffer(data, dt, 1, off)[0])
                            off += dt.itemsize
                        for k in range(1, n - 1):
                            faces.append([ids[0], ids[k], ids[k + 1]])
                            for e, _ in extras:
                                fa_rows[e].append(ex[e])
                    face_attr_cols.update(
                        {e: np.asarray(v, np.float32) for e, v in
                         fa_rows.items()})
            else:
                row = sum(np.dtype(type_map[p[0]]).itemsize for p in props
                          if p[0] != 'list')
                off += row * count

    if verts is None:
        raise ValueError(f"{path}: no vertex element")
    all_faces = np.vstack(
        [np.asarray(faces, np.int64).reshape(-1, 3)] + face_arrays)
    return MeshData(verts, all_faces.astype(np.int32), normals, uvs, colors,
                    face_attrs=_group_attr_cols(face_attr_cols) or None)


def _group_attr_cols(cols: dict) -> dict:
    """Group scalar columns name_0/name_1/... into (F, 3) attributes;
    single columns broadcast to 3 channels (the reference exposes
    1- and 3-channel mesh attributes, mesh_attribute.cpp eval/eval_1)."""
    out = {}
    bases = {}
    for key in cols:
        if '_' in key and key.rsplit('_', 1)[1].isdigit():
            base, ix = key.rsplit('_', 1)
            bases.setdefault(base, {})[int(ix)] = cols[key]
        else:
            bases.setdefault(key, {})[0] = cols[key]
    for base, parts in bases.items():
        n = max(parts) + 1
        first = parts[0]
        stack = [parts.get(i, first) for i in range(min(n, 3))]
        while len(stack) < 3:
            stack.append(stack[-1])
        out[base] = np.stack(stack, -1).astype(np.float32)
    return out


def _ply_vertex_cols(cols):
    verts = np.stack([cols['x'], cols['y'], cols['z']], -1).astype(np.float32)
    normals = None
    if 'nx' in cols:
        normals = np.stack([cols['nx'], cols['ny'], cols['nz']], -1).astype(np.float32)
    uvs = None
    for ukey, vkey in (('u', 'v'), ('s', 't'), ('texture_u', 'texture_v')):
        if ukey in cols and vkey in cols:
            uvs = np.stack([cols[ukey], cols[vkey]], -1).astype(np.float32)
            break
    colors = None
    if 'red' in cols and 'green' in cols and 'blue' in cols:
        colors = np.stack([cols['red'], cols['green'], cols['blue']],
                          -1).astype(np.float32)
        if colors.max() > 1.0:     # uchar-encoded colors
            colors = colors / 255.0
    elif 'color_0' in cols:
        # float vertex attributes named color_0/1/2 (the reference's
        # "vertex_color" mesh attribute, ply.cpp attribute columns)
        colors = np.stack([cols['color_0'],
                           cols.get('color_1', cols['color_0']),
                           cols.get('color_2', cols['color_0'])],
                          -1).astype(np.float32)
    return verts, normals, uvs, colors


def load_blender(props: dict) -> MeshData:
    """Convert Blender mesh arrays to a MeshData (reference
    src/shapes/blender.cpp:95-328, used by the Blender exporter add-on).

    Inputs mirror Blender's data layout as ndarrays instead of raw
    pointers: ``verts`` (V,3) positions, ``vert_normals`` (V,3),
    ``loops`` (L,) per-loop vertex index, ``loop_tris`` (T,3) loop
    indices, ``loop_tri_polys`` (T,) poly index per triangle,
    ``poly_smooth`` (P,) smooth-shading flags, ``poly_mat`` (P,)
    material ids filtered by ``mat_nr``, optional per-loop ``uvs`` (L,2)
    (v flipped, blender.cpp:249) and ``cols`` (L,3|4) (uchar scaled by
    1/255, blender.cpp:218).

    Deviation from the reference: no hash-based vertex de-duplication —
    the reference dedups only to compress its vertex buffers, while the
    SoA scene flattens to per-corner arrays regardless, so corners are
    emitted expanded (faces = arange) in one vectorized pass."""
    verts = np.asarray(props['verts'], np.float32).reshape(-1, 3)
    loops = np.asarray(props['loops'], np.int64).reshape(-1)
    loop_tris = np.asarray(props['loop_tris'], np.int64).reshape(-1, 3)
    tri_polys = np.asarray(props['loop_tri_polys'], np.int64).reshape(-1)
    poly_smooth = np.asarray(props.get(
        'poly_smooth', np.zeros(tri_polys.max() + 1 if len(tri_polys)
                                else 1)), bool).reshape(-1)
    mat_nr = int(props.get('mat_nr', 0))
    poly_mat = np.asarray(props.get(
        'poly_mat', np.zeros(len(poly_smooth))), np.int64).reshape(-1)

    keep = poly_mat[tri_polys] == mat_nr
    loop_tris = loop_tris[keep]
    tri_polys = tri_polys[keep]
    corner_v = loops[loop_tris]                      # (T, 3) vertex ids
    pos = verts[corner_v]                            # (T, 3, 3)

    # normals: smooth polys use vertex normals, flat polys the face normal
    e1 = pos[:, 1] - pos[:, 0]
    e2 = pos[:, 2] - pos[:, 0]
    face_n = np.cross(e1, e2)
    nondegen = (face_n * face_n).sum(-1) > 0
    vn = props.get('vert_normals')
    smooth = poly_smooth[tri_polys]
    if vn is not None:
        vn = np.asarray(vn, np.float32).reshape(-1, 3)
        n = np.where(smooth[:, None, None], vn[corner_v],
                     face_n[:, None, :])
    else:
        n = np.broadcast_to(face_n[:, None, :], pos.shape).copy()
    # flat-shaded degenerate triangles are dropped (blender.cpp:212)
    drop = ~nondegen & ~smooth
    if drop.any():
        sel = ~drop
        pos, n, loop_tris = pos[sel], n[sel], loop_tris[sel]
    ln = np.linalg.norm(n, axis=-1, keepdims=True)
    ln[ln == 0] = 1.0
    n = (n / ln).astype(np.float32)

    uvs = props.get('uvs')
    if uvs is not None:
        uvs = np.asarray(uvs, np.float32).reshape(-1, 2)[loop_tris]
        uvs[..., 1] = 1.0 - uvs[..., 1]
    cols = props.get('cols')
    if cols is not None:
        cols = np.asarray(cols, np.float32).reshape(len(loops), -1)
        cols = cols[:, :3][loop_tris]
        if cols.max() > 1.0:
            cols = cols / 255.0

    T = len(pos)
    faces = np.arange(3 * T, dtype=np.int32).reshape(T, 3)
    flat = lambda a: None if a is None else \
        np.ascontiguousarray(a.reshape(3 * T, -1), np.float32)
    return MeshData(flat(pos), faces, flat(n),
                    flat(uvs), flat(cols))


# --- Mitsuba .serialized format ---------------------------------------------
# File layout (reference src/shapes/serialized.cpp docs): uint16 magic 0x041C,
# uint16 version, zlib-deflated stream per mesh: uint32 flags, name string
# (version>=4), uint64 vertex_count, uint64 face_count, then vertex positions,
# normals (flag 0x1), uvs (flag 0x2), colors (flag 0x8), faces. Flag 0x1000 =
# single precision, 0x2000 = double. Footer: uint64 offsets table + uint32
# mesh count (end of file).

_MTS_HAS_NORMALS = 0x0001
_MTS_HAS_UV = 0x0002
_MTS_HAS_COLORS = 0x0008
_MTS_FACE_NORMALS = 0x0010
_MTS_SINGLE = 0x1000
_MTS_DOUBLE = 0x2000


def load_serialized(path: str, shape_index: int = 0) -> MeshData:
    with open(path, 'rb') as f:
        data = f.read()
    magic, version = struct.unpack_from('<HH', data, 0)
    if magic != 0x041C:
        raise ValueError(f"{path}: bad magic {magic:#x}")
    (mesh_count,) = struct.unpack_from('<I', data, len(data) - 4)
    if shape_index >= mesh_count:
        raise ValueError(f"{path}: shape_index {shape_index} >= {mesh_count}")
    if mesh_count == 1:
        offset = 0
    else:
        # footer offset width: uint64 from format v4, uint32 before
        osize, ofmt = (8, '<Q') if version >= 4 else (4, '<I')
        table = len(data) - 4 - osize * mesh_count
        (offset,) = struct.unpack_from(ofmt, data, table + osize * shape_index)
    # stream begins after per-mesh header (magic+version repeated at offset)
    stream = zlib.decompressobj().decompress(data[offset + 4:])
    pos = 0
    (flags,) = struct.unpack_from('<I', stream, pos); pos += 4
    if version >= 4:
        end = stream.index(b'\x00', pos)
        pos = end + 1
    vcount, fcount = struct.unpack_from('<QQ', stream, pos); pos += 16
    ftype = np.dtype('<f8') if flags & _MTS_DOUBLE else np.dtype('<f4')

    def read(n):
        nonlocal pos
        arr = np.frombuffer(stream, ftype, n, pos)
        pos += ftype.itemsize * n
        return arr.astype(np.float32)

    verts = read(vcount * 3).reshape(-1, 3)
    normals = read(vcount * 3).reshape(-1, 3) if flags & _MTS_HAS_NORMALS else None
    uvs = read(vcount * 2).reshape(-1, 2) if flags & _MTS_HAS_UV else None
    if flags & _MTS_HAS_COLORS:
        read(vcount * 3)
    itype = np.dtype('<u4') if vcount <= 0xFFFFFFFF else np.dtype('<u8')
    faces = np.frombuffer(stream, itype, fcount * 3, pos).reshape(-1, 3).astype(np.int32)
    return MeshData(verts, faces, normals, uvs)


def compute_vertex_normals(mesh: MeshData) -> np.ndarray:
    """Area-weighted smooth vertex normals (reference mesh.cpp
    recompute_vertex_normals semantics)."""
    v, f = mesh.vertices.astype(np.float64), mesh.faces
    n = np.zeros_like(v)
    fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    for k in range(3):
        np.add.at(n, f[:, k], fn)
    ln = np.linalg.norm(n, axis=1, keepdims=True)
    ln[ln == 0] = 1.0
    return (n / ln).astype(np.float32)
