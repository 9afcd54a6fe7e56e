"""ctypes binding for the native C++ geometry runtime (native/g4native.cpp).

Builds lazily with `make -C native` on first use; every entry point has a
pure-Python/scipy fallback, so the framework never hard-depends on the
toolchain. Consumers: eval/mesh_metrics (k-NN correspondences), gaussian
scale seeding (mean-3NN), voxel downsampling.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libg4native.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        lib.g4_knn.argtypes = [f32p, ctypes.c_int32, f32p, ctypes.c_int32,
                               ctypes.c_int32, f32p, i32p]
        lib.g4_knn.restype = ctypes.c_int
        lib.g4_mean_knn3_sq_dist.argtypes = [f32p, ctypes.c_int32, f32p]
        lib.g4_mean_knn3_sq_dist.restype = ctypes.c_int
        lib.g4_morton_codes.argtypes = [f32p, ctypes.c_int32, u32p]
        lib.g4_morton_codes.restype = ctypes.c_int
        lib.g4_voxel_downsample.argtypes = [f32p, ctypes.c_int32,
                                            ctypes.c_float, f32p,
                                            ctypes.c_int32]
        lib.g4_voxel_downsample.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def knn(points: np.ndarray, queries: np.ndarray, k: int
        ) -> Tuple[np.ndarray, np.ndarray]:
    """(dists (M, k), idx (M, k)): exact k nearest points per query."""
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    qs = np.ascontiguousarray(queries, np.float32)
    if lib is not None:
        m = len(qs)
        d = np.empty((m, k), np.float32)
        i = np.empty((m, k), np.int32)
        rc = lib.g4_knn(pts, len(pts), qs, m, k, d, i)
        if rc == 0:
            return d, i
    from scipy.spatial import cKDTree

    d, i = cKDTree(pts).query(qs, k=k)
    if k == 1:
        d, i = d[:, None], i[:, None]
    return d.astype(np.float32), i.astype(np.int32)


def mean_knn3_sq_dist(points: np.ndarray) -> np.ndarray:
    """Exact mean squared distance to the 3 nearest neighbors — the
    simple-knn distCUDA2 contract."""
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    if lib is not None:
        out = np.empty(len(pts), np.float32)
        if lib.g4_mean_knn3_sq_dist(pts, len(pts), out) == 0:
            return out
    d, i = knn(pts, pts, 4)
    # drop self (distance 0 column)
    d2 = d.astype(np.float64) ** 2
    mask = i != np.arange(len(pts))[:, None]
    # keep first 3 non-self per row
    out = np.zeros(len(pts), np.float32)
    for r in range(len(pts)):
        vals = d2[r][mask[r]][:3]
        out[r] = vals.mean() if len(vals) else 0.0
    return out


def morton_codes(points: np.ndarray) -> np.ndarray:
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    if lib is not None:
        out = np.empty(len(pts), np.uint32)
        if lib.g4_morton_codes(pts, len(pts), out) == 0:
            return out
    # numpy fallback (matches ops/knn._morton_codes semantics)
    lo = pts.min(0)
    hi = pts.max(0)
    q = ((pts - lo) / np.maximum(hi - lo, 1e-12) * 1023).astype(np.uint32)

    def spread(v):
        v = v & 0x3FF
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)


def voxel_downsample(points: np.ndarray, voxel: float) -> np.ndarray:
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    if lib is not None:
        out = np.empty_like(pts)
        n = lib.g4_voxel_downsample(pts, len(pts), voxel, out, len(pts))
        if n >= 0:
            return out[:n].copy()
    from g4splat_tpu.eval.mesh_metrics import voxel_downsample as vd

    return vd(pts.astype(np.float64), voxel).astype(np.float32)
