"""Image / depth-map file IO matching the reference's on-disk zoo:
`rgb_frame*.png`, `depth_frame*.tiff` (float32 TIFF), `*_normal_*.npy`,
`visibility_frame*.npy`, `confident_map_frame*.png`."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
from PIL import Image


def load_image(path: str) -> np.ndarray:
    """→ (H, W, 3) float32 in [0, 1]."""
    img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    return img


def save_image(path: str, img: np.ndarray):
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def load_depth_tiff(path: str) -> np.ndarray:
    return np.asarray(Image.open(path), np.float32)


def save_depth_tiff(path: str, depth: np.ndarray):
    Image.fromarray(np.asarray(depth, np.float32), mode="F").save(path)


def save_mask_png(path: str, mask: np.ndarray):
    Image.fromarray((np.asarray(mask) > 0).astype(np.uint8) * 255).save(path)


def load_mask_png(path: str) -> np.ndarray:
    return np.asarray(Image.open(path)) > 127


# --------------------------------------------------------------- async writes
# The pipeline's stages write O(views) PNG/TIFF/NPY zoos; encoding on the
# main thread serializes against device compute. A small bounded thread pool
# overlaps them (the reference does its image IO through a thread pool too,
# dust3r/dust3r/utils/parallel.py:12 parallel_threads). Arrays are converted/
# copied synchronously so callers may reuse buffers; call `flush_io()` before
# reading anything written in the same stage (stage re-entry reads artifacts).

import threading as _threading
from concurrent.futures import Future, ThreadPoolExecutor

_POOL: Optional[ThreadPoolExecutor] = None
_POOL_LOCK = _threading.Lock()
_PENDING: list = []


def _pool() -> ThreadPoolExecutor:
    global _POOL
    with _POOL_LOCK:
        if _POOL is None:
            _POOL = ThreadPoolExecutor(
                max_workers=int(os.environ.get("G4_IO_THREADS", "8")),
                thread_name_prefix="g4io",
            )
        return _POOL


def _submit(fn) -> Future:
    fut = _pool().submit(fn)
    _PENDING.append(fut)
    return fut


def save_image_async(path: str, img: np.ndarray):
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
    else:
        arr = arr.copy()
    _submit(lambda: Image.fromarray(arr).save(path))


def save_depth_tiff_async(path: str, depth: np.ndarray):
    arr = np.array(depth, np.float32, copy=True)
    _submit(lambda: Image.fromarray(arr, mode="F").save(path))


def save_npy_async(path: str, arr: np.ndarray):
    arr = np.array(arr, copy=True)
    _submit(lambda: np.save(path, arr))


def flush_io():
    """Barrier: wait for every queued async write; re-raise the first error."""
    pending, _PENDING[:] = _PENDING[:], []
    for fut in pending:
        fut.result()
