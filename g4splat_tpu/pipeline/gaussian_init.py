"""Gaussian surfel initialization from per-view depth maps.

Two init paths matching the reference (SURVEY §2.4):

1. `init_from_manifold_meshes` — each depth map becomes a pixel-grid manifold
   mesh (2 triangles per pixel quad, matcha/dm_scene/meshes.py:172-244);
   elongated faces (altitude ratio > 5) are dropped (charts.py:251-265); one
   surfel per remaining face via barycentric placement: two in-triangle axes
   Gram-Schmidt-orthogonalized biggest-first, quaternion from
   [axis1, axis2, normal], 2D scales = 0.5 × axis norms
   (dm_scene/gaussians.py:51-167). Optional voxel downsample
   (charts.py:122-164, sans open3d).

2. `init_by_warp_from_depths` — the low-VRAM dedup init
   (gaussian_model.py:868-1020): iterate views in order, spawn a Gaussian
   only for pixels whose 3D point isn't already explained by an earlier view
   within 1% relative depth error under warping; scale = half the min
   neighbor-point distance, orientation from the local normal, drop scales
   ≥ 0.05, floor at 5e-4.

All heavy math is vectorized jnp per view; the cross-view warp test reuses
one jitted projector.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from g4splat_tpu.core.cameras import Camera
from g4splat_tpu.core.transforms import normalize, rotmat_to_quat


# --------------------------------------------------------- manifold-mesh init
def manifold_mesh_from_points(points: np.ndarray):
    """(H, W, 3) point map → (verts (H·W, 3), faces (2·(H-1)·(W-1), 3))."""
    H, W, _ = points.shape
    verts = points.reshape(-1, 3)
    idx = np.arange(H * W).reshape(H, W)
    a = idx[:-1, :-1].reshape(-1)
    b = idx[:-1, 1:].reshape(-1)
    c = idx[1:, :-1].reshape(-1)
    d = idx[1:, 1:].reshape(-1)
    faces = np.concatenate(
        [np.stack([a, c, b], 1), np.stack([b, c, d], 1)], axis=0
    )
    return verts, faces


def _altitude_ratio(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Per-face max/min altitude ratio (charts.py:251-265)."""
    fv = verts[faces]                          # (F, 3, 3)
    sides = jnp.roll(fv, 1, axis=1) - fv       # (F, 3, 3)
    ns = normalize(sides)
    alts = sides - jnp.sum(
        sides * jnp.roll(ns, -1, axis=1), axis=-1, keepdims=True
    ) * jnp.roll(ns, -1, axis=1)
    al = jnp.linalg.norm(alts, axis=-1)
    return jnp.max(al, axis=1) / jnp.maximum(jnp.min(al, axis=1), 1e-12)


def surfels_from_mesh(
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    vert_colors: Optional[jnp.ndarray] = None,
    normalized_scales: float = 0.5,
):
    """One surfel per face at the centroid (dm_scene/gaussians.py:51-167,
    barycentric_coords=1 → the regular-triangle center).
    Returns dict(means, scales(2), quaternions, colors)."""
    fv = verts[faces]                          # (F, 3, 3)
    means = fv.mean(axis=1)

    # Two canonical in-triangle axes from regular-triangle barycentric shifts.
    s2 = np.sqrt(2.0) / 2.0
    s6 = 1.0 / np.sqrt(6.0)
    shifts = jnp.array(
        [[-s2, s2, 0.0], [-s6, -s6, 2.0 / np.sqrt(6.0)]], jnp.float32
    )  # (2, 3)
    axes = jnp.einsum("kj,fjd->fkd", shifts, fv)   # (F, 2, 3)

    # Gram-Schmidt, biggest axis first.
    n0 = jnp.linalg.norm(axes, axis=-1)            # (F, 2)
    first_is_0 = n0[:, 0] >= n0[:, 1]
    a1 = jnp.where(first_is_0[:, None], axes[:, 0], axes[:, 1])
    a2 = jnp.where(first_is_0[:, None], axes[:, 1], axes[:, 0])
    a2 = a2 - jnp.sum(a2 * a1, -1, keepdims=True) * a1 / jnp.maximum(
        jnp.sum(a1 * a1, -1, keepdims=True), 1e-20
    )
    # Restore original ordering (reference re-gathers back, :128-141).
    o1 = jnp.where(first_is_0[:, None], a1, a2)
    o2 = jnp.where(first_is_0[:, None], a2, a1)

    u1 = normalize(o1)
    u2 = normalize(o2)
    nrm = jnp.cross(u1, u2)
    R = jnp.stack([u1, u2, nrm], axis=-1)          # columns = axes
    quats = rotmat_to_quat(R)
    scales = jnp.stack(
        [jnp.linalg.norm(o1, axis=-1), jnp.linalg.norm(o2, axis=-1)], axis=-1
    ) * normalized_scales

    out = {"means": means, "scales": scales, "quaternions": quats}
    if vert_colors is not None:
        out["colors"] = vert_colors[faces].mean(axis=1)
    return out


def voxel_downsample_indices(points: np.ndarray, voxel: float) -> np.ndarray:
    """First point per occupied voxel (charts.py voxel_downsample_gaussians
    without the open3d color-index trick)."""
    keys = np.floor(np.asarray(points) / voxel).astype(np.int64)
    _, first = np.unique(keys, axis=0, return_index=True)
    return np.sort(first)


def init_from_manifold_meshes(
    cameras: Camera,                 # batched (V,)
    depths: np.ndarray,              # (V, H, W)
    images: np.ndarray,              # (V, H, W, 3)
    visibility_masks: Optional[np.ndarray] = None,   # (V, H, W) bool
    ratio_th: float = 5.0,
    normalized_scales: float = 0.5,
    voxel_downsample: float = 0.0,
):
    """Per-pixel manifold-mesh surfel init (charts.py:221-276)."""
    V = depths.shape[0]
    all_parts = {"means": [], "scales": [], "quaternions": [], "colors": []}
    for v in range(V):
        cam = jax.tree.map(lambda x: x[v], cameras)
        pts = np.asarray(cam.backproject(jnp.asarray(depths[v])))
        verts, faces = manifold_mesh_from_points(pts)
        keep = np.asarray(
            _altitude_ratio(jnp.asarray(verts), jnp.asarray(faces))
        ) < ratio_th
        if visibility_masks is not None:
            face_vis = visibility_masks[v].reshape(-1)[faces].all(axis=1)
            keep &= face_vis
        faces = faces[keep]
        if len(faces) == 0:
            continue
        out = surfels_from_mesh(
            jnp.asarray(verts), jnp.asarray(faces),
            vert_colors=jnp.asarray(images[v].reshape(-1, 3)),
            normalized_scales=normalized_scales,
        )
        for k in all_parts:
            all_parts[k].append(np.asarray(out[k]))
    parts = {k: np.concatenate(vs, axis=0) for k, vs in all_parts.items()}
    if voxel_downsample > 0:
        idx = voxel_downsample_indices(parts["means"], voxel_downsample)
        parts = {k: v[idx] for k, v in parts.items()}
    return parts


# ------------------------------------------------------------ warp-dedup init
def _points_to_distance_map(points: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) → (H, W) min distance to 4-neighbors (gaussian_model.py:931-942)."""
    dh = jnp.linalg.norm(points[:, 1:] - points[:, :-1], axis=-1)
    dv = jnp.linalg.norm(points[1:] - points[:-1], axis=-1)
    dr = jnp.concatenate([dh, dh[:, -1:]], axis=1)
    dl = jnp.concatenate([dh[:, :1], dh], axis=1)
    dd = jnp.concatenate([dv, dv[-1:]], axis=0)
    du = jnp.concatenate([dv[:1], dv], axis=0)
    return jnp.minimum(jnp.minimum(dr, dl), jnp.minimum(dd, du))


def _points_to_normal_map(points: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) → (H, W, 3), border-replicated (gaussian_model.py:890-905)."""
    n = jnp.zeros_like(points)
    dx = points[2:, 1:-1] - points[:-2, 1:-1]
    dy = points[1:-1, 2:] - points[1:-1, :-2]
    inner = normalize(jnp.cross(dx, dy))
    n = n.at[1:-1, 1:-1].set(inner)
    n = n.at[0].set(n[1]).at[-1].set(n[-2])
    n = n.at[:, 0].set(n[:, 1]).at[:, -1].set(n[:, -2])
    return n


def _normals_to_quaternions(normals: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) → (N, 4) quats with z-axis = normal (gaussian_model.py:920-928)."""
    z = normalize(normals)
    ref = jnp.where(
        (jnp.abs(z[:, 0]) > 0.9)[:, None],
        jnp.array([0.0, 1.0, 0.0]),
        jnp.array([1.0, 0.0, 0.0]),
    )
    x = normalize(jnp.cross(ref, z))
    y = jnp.cross(z, x)
    R = jnp.stack([x, y, z], axis=-1)
    return rotmat_to_quat(R)


@jax.jit
def _warp_coverage(points_world, valid, cam_w2c, fx, fy, cx, cy,
                   target_depth, thresh):
    """(H, W) bool: is each source point already explained by target view?"""
    H, W = target_depth.shape
    pc = points_world @ cam_w2c[:3, :3].T + cam_w2c[:3, 3]
    z = pc[..., 2]
    u = pc[..., 0] / jnp.maximum(z, 1e-6) * fx + cx
    v = pc[..., 1] / jnp.maximum(z, 1e-6) * fy + cy
    in_img = (
        (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1) & (z > 0) & valid
    )
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
    td = target_depth[vi, ui]
    rel = jnp.abs(z - td) / (jnp.abs(z) + 1e-6)
    return in_img & (td > 0) & (rel < thresh)


def init_by_warp_from_depths(
    cameras: Camera,
    depths: np.ndarray,              # (V, H, W)
    images: np.ndarray,              # (V, H, W, 3)
    depth_error_thresh: float = 0.01,
    min_scale: float = 5e-4,
    max_scale: float = 0.05,
    downsample_pixel_grid_size: int = -1,
):
    """Memory-saving dedup init (gaussian_model.py:945-1020)."""
    V, H, W = depths.shape
    parts = {"means": [], "scales": [], "quaternions": [], "colors": []}
    pts_cache = []
    for v in range(V):
        cam = jax.tree.map(lambda x: x[v], cameras)
        depth = jnp.asarray(depths[v])
        pts = cam.backproject(depth)
        pts_cache.append(pts)
        valid = depth > 0

        covered = jnp.zeros((H, W), bool)
        for prev in range(v):
            pcam = jax.tree.map(lambda x: x[prev], cameras)
            covered = covered | _warp_coverage(
                pts, valid, pcam.w2c, pcam.fx, pcam.fy, pcam.cx, pcam.cy,
                jnp.asarray(depths[prev]), depth_error_thresh,
            )
        keep = (~covered) & valid
        if downsample_pixel_grid_size > 0:
            grid = jnp.zeros((H, W), bool)
            grid = grid.at[::downsample_pixel_grid_size,
                           ::downsample_pixel_grid_size].set(True)
            keep = keep & grid
        keep = np.asarray(keep).reshape(-1)
        if not keep.any():
            continue

        dist = np.asarray(_points_to_distance_map(pts)).reshape(-1)[keep]
        scale = dist / 2.0
        if downsample_pixel_grid_size > 0:
            scale = scale * downsample_pixel_grid_size
        normals = np.asarray(_points_to_normal_map(pts)).reshape(-1, 3)[keep]
        quats = np.asarray(_normals_to_quaternions(jnp.asarray(normals)))
        parts["means"].append(np.asarray(pts).reshape(-1, 3)[keep])
        parts["scales"].append(np.repeat(scale[:, None], 2, 1))
        parts["quaternions"].append(quats)
        parts["colors"].append(images[v].reshape(-1, 3)[keep])

    out = {k: np.concatenate(vs, 0) for k, vs in parts.items()}
    ok = out["scales"][:, 0] < max_scale
    out = {k: v[ok] for k, v in out.items()}
    out["scales"] = np.maximum(out["scales"], min_scale)
    return out


def scene_from_init(parts, capacity: Optional[int] = None,
                    max_sh_degree: int = 3, initial_opacity: float = 0.1):
    """Init dict → GaussianScene. Non-finite rows are dropped first:
    garbage prior depths (e.g. random-weight See3D lifts) backproject to
    NaN means, and a NaN splat is inert in the renderer (preprocess culls
    it) but IMMORTAL under the reference prune rule (`opacity < eps` is
    False for NaN) — the r05 budget run carried ~7% NaN slots through
    every round, wasting capacity the clamp had reserved for real points."""
    import numpy as np

    from g4splat_tpu.models.gaussians import GaussianScene

    means = np.asarray(parts["means"])
    finite = np.isfinite(means).all(axis=1)
    for k in ("scales", "quaternions", "colors"):
        if parts.get(k) is not None:
            finite &= np.isfinite(np.asarray(parts[k])).reshape(
                len(means), -1).all(axis=1)
    if not finite.all():
        print(f"[gaussian_init] dropping {int((~finite).sum())} non-finite "
              f"init points of {len(means)}", flush=True)
        parts = {k: (np.asarray(v)[finite] if getattr(v, "ndim", 0) >= 1
                     and len(v) == len(means) else v)
                 for k, v in parts.items()}

    return GaussianScene.from_points(
        parts["means"], parts.get("colors"),
        capacity=capacity, max_sh_degree=max_sh_degree,
        initial_opacity=initial_opacity,
        scales=parts["scales"], quats=parts["quaternions"],
    )
