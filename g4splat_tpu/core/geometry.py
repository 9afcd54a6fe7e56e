"""Depth/point/normal geometry ops.

Replaces the reference's scattered helpers (2d-gaussian-splatting/utils/
point_utils.py:9-39, matcha/dm_utils/rendering.py depths_to_points_parallel /
depth2normal_parallel). Everything is single-view and `vmap`-able over a
camera batch — the batched variants the reference hand-wrote come for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from g4splat_tpu.core.cameras import Camera
from g4splat_tpu.core.transforms import normalize


def depth_to_points(cam: Camera, depth: jnp.ndarray) -> jnp.ndarray:
    """(H, W) view-z depth → (H, W, 3) world points."""
    return cam.backproject(depth)


def depth_to_normal(cam: Camera, depth: jnp.ndarray) -> jnp.ndarray:
    """(H, W) depth → (H, W, 3) world normals via central differences of the
    backprojected point map (same stencil as reference point_utils.py:26-39:
    n = normalize(d_points/d_row × d_points/d_col), zero on the 1px border)."""
    pts = cam.backproject(depth)
    dx = pts[2:, 1:-1] - pts[:-2, 1:-1]   # d/d_row
    dy = pts[1:-1, 2:] - pts[1:-1, :-2]   # d/d_col
    n = normalize(jnp.cross(dx, dy))
    return jnp.zeros_like(pts).at[1:-1, 1:-1].set(n)


def normal_to_curvature(normal: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) normal map → (H, W) curvature proxy: mean 1-cos similarity to
    the 4-neighborhood (used by chart-alignment / GS prior losses)."""
    def shift(a, dr, dc):
        return jnp.roll(a, (dr, dc), axis=(0, 1))

    sims = []
    for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        sims.append(jnp.sum(normal * shift(normal, dr, dc), axis=-1))
    sim = jnp.stack(sims, axis=0).mean(0)
    curv = 1.0 - jnp.clip(sim, -1.0, 1.0)
    # Invalidate the border (rolled wrap-around is meaningless there).
    curv = curv.at[0, :].set(0.0).at[-1, :].set(0.0)
    curv = curv.at[:, 0].set(0.0).at[:, -1].set(0.0)
    return curv


def image_gradient(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W[, C]) → (H, W[, C], 2) central-difference gradients (d_row, d_col)."""
    gr = jnp.zeros_like(img).at[1:-1].set((img[2:] - img[:-2]) * 0.5)
    gc = jnp.zeros_like(img).at[:, 1:-1].set((img[:, 2:] - img[:, :-2]) * 0.5)
    return jnp.stack([gr, gc], axis=-1)


def points_to_depth(cam: Camera, pts_world: jnp.ndarray) -> jnp.ndarray:
    """(…, 3) world points → view-z depths under `cam`."""
    R, t = cam.w2c[:3, :3], cam.w2c[:3, 3]
    return pts_world @ R[2] + t[2]


def bilinear_sample(img: jnp.ndarray, xy: jnp.ndarray, pad_mode: str = "edge"):
    """Sample (H, W, C) image at float pixel coords xy (..., 2) (x=col, y=row).

    Returns (..., C). Out-of-range coords clamp to the border.
    """
    H, W = img.shape[0], img.shape[1]
    x = jnp.clip(xy[..., 0], 0.0, W - 1.0)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    wx = x - x0
    wy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    wx = wx[..., None] if img.ndim == 3 else wx
    wy = wy[..., None] if img.ndim == 3 else wy
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )
