"""Image IO: OpenEXR (float32, uncompressed & zip-read) and PNG writers.

Host-side replacement for the reference's OpenEXR/libpng Bitmap IO
(src/libcore/bitmap.cpp): pure python + zlib, enough for film output and
golden-image tests. EXR files written here are standard scanline float32
images readable by any OpenEXR tool.
"""
from __future__ import annotations

import struct
import zlib
from typing import Dict, Tuple

import numpy as np


# --- EXR --------------------------------------------------------------------

_PIXELTYPE_FLOAT = 2  # 32-bit float


def _exr_attr(name: str, type_: str, data: bytes) -> bytes:
    return name.encode() + b'\x00' + type_.encode() + b'\x00' + \
        struct.pack('<i', len(data)) + data


def write_exr(path: str, image: np.ndarray, channel_names=None) -> None:
    """Write (H, W, C) float32 as an uncompressed scanline EXR."""
    image = np.asarray(image, np.float32)
    if image.ndim == 2:
        image = image[:, :, None]
    H, W, C = image.shape
    if channel_names is None:
        channel_names = {1: ['Y'], 3: ['R', 'G', 'B'],
                         4: ['R', 'G', 'B', 'A']}.get(C) or \
            [f'ch{i:02d}' for i in range(C)]
    # channels must be stored alphabetically
    order = sorted(range(C), key=lambda i: channel_names[i])

    chan_data = b''
    for i in order:
        chan_data += channel_names[i].encode() + b'\x00' + \
            struct.pack('<iiii', _PIXELTYPE_FLOAT, 0, 1, 1)
    chan_data += b'\x00'

    header = b''
    header += _exr_attr('channels', 'chlist', chan_data)
    header += _exr_attr('compression', 'compression', b'\x00')  # none
    box = struct.pack('<iiii', 0, 0, W - 1, H - 1)
    header += _exr_attr('dataWindow', 'box2i', box)
    header += _exr_attr('displayWindow', 'box2i', box)
    header += _exr_attr('lineOrder', 'lineOrder', b'\x00')
    header += _exr_attr('pixelAspectRatio', 'float', struct.pack('<f', 1.0))
    header += _exr_attr('screenWindowCenter', 'v2f', struct.pack('<ff', 0, 0))
    header += _exr_attr('screenWindowWidth', 'float', struct.pack('<f', 1.0))
    header += b'\x00'

    magic = struct.pack('<i', 20000630) + struct.pack('<i', 2)
    offset_table_pos = len(magic) + len(header)
    data_start = offset_table_pos + 8 * H

    scanline_size = 8 + W * 4 * C
    offsets = b''.join(struct.pack('<Q', data_start + y * scanline_size)
                       for y in range(H))

    with open(path, 'wb') as f:
        f.write(magic)
        f.write(header)
        f.write(offsets)
        for y in range(H):
            f.write(struct.pack('<ii', y, W * 4 * C))
            row = np.concatenate([image[y, :, i] for i in order])
            f.write(row.astype('<f4').tobytes())


def read_exr(path: str) -> Tuple[np.ndarray, list]:
    """Minimal scanline EXR reader (none/zip/zips compression, float32/half).
    Returns (H, W, C) float32 and channel names (alphabetical order)."""
    with open(path, 'rb') as f:
        data = f.read()
    magic, version = struct.unpack_from('<ii', data, 0)
    if magic != 20000630:
        raise ValueError(f"{path}: not an EXR")
    pos = 8
    attrs: Dict[str, tuple] = {}
    while data[pos] != 0:
        e = data.index(b'\x00', pos); name = data[pos:e].decode(); pos = e + 1
        e = data.index(b'\x00', pos); atype = data[pos:e].decode(); pos = e + 1
        (size,) = struct.unpack_from('<i', data, pos); pos += 4
        attrs[name] = (atype, data[pos:pos + size]); pos += size
    pos += 1
    # channels
    chans = []
    cdata = attrs['channels'][1]
    cpos = 0
    while cdata[cpos] != 0:
        e = cdata.index(b'\x00', cpos)
        cname = cdata[cpos:e].decode(); cpos = e + 1
        ptype, = struct.unpack_from('<i', cdata, cpos); cpos += 16
        chans.append((cname, ptype))
    comp = attrs['compression'][1][0]
    x0, y0, x1, y1 = struct.unpack('<iiii', attrs['dataWindow'][1])
    W, H = x1 - x0 + 1, y1 - y0 + 1
    C = len(chans)
    lines_per_block = {0: 1, 2: 1, 3: 16, 4: 32}.get(comp)
    if lines_per_block is None:
        raise ValueError(f"{path}: unsupported compression {comp}")
    nblocks = -(-H // lines_per_block)
    pos += 8 * nblocks  # skip offset table
    out = np.zeros((H, W, C), np.float32)
    dtypes = {1: np.dtype('<u4'), 2: np.dtype('<f4'), 0: np.dtype('<u4')}
    for _ in range(nblocks):
        y, size = struct.unpack_from('<ii', data, pos); pos += 8
        block = data[pos:pos + size]; pos += size
        ny = min(lines_per_block, H - (y - y0))
        raw_size = sum(W * (2 if pt == 1 else 4) for _, pt in chans) * ny
        if comp == 4:  # PIZ
            from .exr_piz import piz_uncompress
            per_chan = piz_uncompress(block, chans, W, ny)
            for ci, (cname, ptype) in enumerate(chans):
                rows = per_chan[cname]
                if ptype == 1:   # half
                    vals = rows.view(np.uint16).astype('<u2').view('<f2')
                    out[y - y0:y - y0 + ny, :, ci] = vals.astype(np.float32)
                else:            # float: two uint16 halves per value
                    b = rows.reshape(ny, W, 2).astype('<u2')
                    fl = (b[..., 0].astype(np.uint32) << 16) \
                        | b[..., 1].astype(np.uint32)
                    out[y - y0:y - y0 + ny, :, ci] = fl.view(np.float32)
            continue
        if comp in (2, 3) and size < raw_size:
            raw = zlib.decompress(block)
            # exr zip predictor: delta + interleave
            arr = np.frombuffer(raw, np.uint8).astype(np.int16)
            arr = np.cumsum(np.concatenate([arr[:1], (arr[1:] - 128)]) %
                            256).astype(np.uint8) if False else None
            raw = _exr_unpredict(np.frombuffer(zlib.decompress(block),
                                               np.uint8))
        else:
            raw = np.frombuffer(block, np.uint8)
        rpos = 0
        for line in range(ny):
            for ci, (cname, ptype) in enumerate(chans):
                esize = 2 if ptype == 1 else 4
                n = W * esize
                buf = raw[rpos:rpos + n]; rpos += n
                if ptype == 1:  # half
                    vals = np.frombuffer(buf.tobytes(), '<f2').astype(np.float32)
                else:
                    vals = np.frombuffer(buf.tobytes(), '<f4')
                out[y - y0 + line, :, ci] = vals
    return out, [c for c, _ in chans]


def _exr_unpredict(d: np.ndarray) -> np.ndarray:
    """Undo EXR zip predictor: running delta then de-interleave halves."""
    d = d.astype(np.uint8).copy()
    d = (np.cumsum(d.astype(np.int64) - 128) + 128 * 1).astype(np.uint8) \
        if False else d
    # reference algorithm: t[i] += t[i-1] - 128
    acc = np.cumsum(d.astype(np.int64))
    acc = acc - 128 * np.arange(len(d))
    t = (acc % 256).astype(np.uint8)
    half = (len(t) + 1) // 2
    out = np.empty_like(t)
    out[0::2] = t[:half]
    out[1::2] = t[half:len(t)]
    return out


# --- PNG --------------------------------------------------------------------

def write_png(path: str, image: np.ndarray, gamma: bool = True) -> None:
    """Write (H, W, 3) image; float inputs are tonemapped (sRGB) to 8-bit."""
    img = np.asarray(image)
    if img.dtype != np.uint8:
        x = np.clip(img, 0.0, 1.0)
        if gamma:
            x = np.where(x <= 0.0031308, 12.92 * x,
                         1.055 * np.power(np.maximum(x, 1e-8), 1 / 2.4) - 0.055)
        img = (np.clip(x, 0, 1) * 255 + 0.5).astype(np.uint8)
    if img.ndim == 2:
        img = img[:, :, None].repeat(3, 2)
    H, W, C = img.shape
    ctype = {1: 0, 3: 2, 4: 6}[C]

    def chunk(tag: bytes, payload: bytes) -> bytes:
        c = struct.pack('>I', len(payload)) + tag + payload
        return c + struct.pack('>I', zlib.crc32(tag + payload) & 0xFFFFFFFF)

    ihdr = struct.pack('>IIBBBBB', W, H, 8, ctype, 0, 0, 0)
    raw = b''.join(b'\x00' + img[y].tobytes() for y in range(H))
    with open(path, 'wb') as f:
        f.write(b'\x89PNG\r\n\x1a\n')
        f.write(chunk(b'IHDR', ihdr))
        f.write(chunk(b'IDAT', zlib.compress(raw, 6)))
        f.write(chunk(b'IEND', b''))
