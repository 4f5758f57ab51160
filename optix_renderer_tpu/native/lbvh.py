"""ctypes wrapper for the native LBVH builder (lbvh.cpp).

`build(v0, v1, v2, leaf_size)` returns the same
(node_min, node_max, skip, first, prim) tuple as
ops/bvh.py `build_lbvh_numpy`, or None when the native library is
unavailable (callers fall back to numpy).
"""

from __future__ import annotations

import ctypes

import numpy as np

from optix_renderer_tpu.native import _build_and_load

_sig_done = False


def _lib():
    global _sig_done
    lib = _build_and_load("lbvh")
    if lib is not None and not _sig_done:
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.lbvh_build.argtypes = [
            f32p, f32p, f32p, ctypes.c_int64, ctypes.c_int64,
            f32p, f32p, i32p, i32p, i32p,
        ]
        lib.lbvh_build.restype = ctypes.c_int
        _sig_done = True
    return lib


def build(v0, v1, v2, leaf_size: int):
    lib = _lib()
    if lib is None:
        return None
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    n = v0.shape[0]
    n_leaves = (n + leaf_size - 1) // leaf_size
    n_nodes = 2 * n_leaves - 1
    node_min = np.empty((n_nodes, 3), np.float32)
    node_max = np.empty((n_nodes, 3), np.float32)
    skip = np.empty(n_nodes, np.int32)
    first = np.empty(n_nodes, np.int32)
    prim = np.empty(n_leaves * leaf_size, np.int32)

    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    rc = lib.lbvh_build(
        v0.ctypes.data_as(f32p), v1.ctypes.data_as(f32p), v2.ctypes.data_as(f32p),
        ctypes.c_int64(n), ctypes.c_int64(leaf_size),
        node_min.ctypes.data_as(f32p), node_max.ctypes.data_as(f32p),
        skip.ctypes.data_as(i32p), first.ctypes.data_as(i32p),
        prim.ctypes.data_as(i32p),
    )
    if rc != 0:
        return None
    return node_min, node_max, skip, first, prim
