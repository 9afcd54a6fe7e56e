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
