"""Native (C++) runtime components, loaded via ctypes.

The reference keeps its accel-structure builder, loaders, and runtime in
C++ (include/mitsuba/render/kdtree.h, src/libcore); this package holds the
TPU build's native equivalents. Libraries are compiled on first use with
the system toolchain (no pybind11 — plain C ABI + ctypes) and cached next
to the sources; every caller must keep a pure-python/numpy fallback for
environments without a compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS: dict = {}


def _load(name: str):
    """Compile (if stale) and dlopen native/<name>.cpp. Returns the CDLL
    or None when no toolchain is available."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        src = os.path.join(_DIR, f'{name}.cpp')
        so = os.path.join(_DIR, f'lib{name}.so')
        lib = None
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                cmd = ['g++', '-O3', '-std=c++17', '-shared', '-fPIC',
                       '-march=native', src, '-o', so + '.tmp']
                subprocess.run(cmd, check=True, capture_output=True,
                               timeout=120)
                os.replace(so + '.tmp', so)
            lib = ctypes.CDLL(so)
        except Exception:
            lib = None
        _LIBS[name] = lib
        return lib


def bvh_builder():
    """Returns the native binned-SAH BVH build function or None.

    Signature: build(v0, e1, e2, leaf_size) -> (lo, hi, a, b, leaf, order)
    with numpy outputs matching ops/bvh.py BVHArrays field layout."""
    lib = _load('bvh_native')
    if lib is None:
        return None
    import numpy as np

    fn = lib.mnt_build_bvh
    fn.restype = ctypes.c_int64
    fn.argtypes = [ctypes.POINTER(ctypes.c_float)] * 3 + [
        ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32)]

    def build(v0, e1, e2, leaf_size):
        v0 = np.ascontiguousarray(v0, np.float32)
        e1 = np.ascontiguousarray(e1, np.float32)
        e2 = np.ascontiguousarray(e2, np.float32)
        T = len(v0)
        cap = 2 * T + 1
        lo = np.empty((cap, 3), np.float32)
        hi = np.empty((cap, 3), np.float32)
        a = np.empty(cap, np.int32)
        b = np.empty(cap, np.int32)
        leaf = np.empty(cap, np.uint8)
        order = np.empty(T, np.int32)

        def p(arr, ty):
            return arr.ctypes.data_as(ctypes.POINTER(ty))

        M = fn(p(v0, ctypes.c_float), p(e1, ctypes.c_float),
               p(e2, ctypes.c_float), T, leaf_size,
               p(lo, ctypes.c_float), p(hi, ctypes.c_float),
               p(a, ctypes.c_int32), p(b, ctypes.c_int32),
               p(leaf, ctypes.c_uint8), p(order, ctypes.c_int32))
        return (lo[:M], hi[:M], a[:M], b[:M], leaf[:M].astype(bool), order)

    return build
