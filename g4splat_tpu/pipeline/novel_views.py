"""Novel-view proposal and selection for generative inpainting.

Re-build of the reference's See3D camera machinery
(2d-gaussian-splatting/render_novel_views.py:128-167, guidance/vis_grid.py,
guidance/cam_utils.py:899-1000,1330-1357,1568-1620):

- `VisibilityGrid`: a voxel grid marking space observed by any input view
  (centers projecting inside an input frustum in front of its depth map);
  proposal cameras must sit in visible space.
- Stage-dependent camera proposals: stage 1 = object-centric ring + scene
  look-at; stage 2 = look-around rotations at input positions; stage 3 =
  plane-targeted wide-FOV cameras.
- `none_visible_rate`: fraction of a candidate render not explained by the
  current model (alpha mask or warp-to-input-views test).
- `select_need_inpaint_views`: shuffled greedy selection keeping candidates
  with none-visible rate ∈ [lo, hi] whose splat-covisibility with already
  selected views ≤ 0.8, with two constraint-relaxation fallbacks.
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from g4splat_tpu.core.cameras import Camera, lookat_camera, stack_cameras


# ------------------------------------------------------------ visibility grid
class VisibilityGrid:
    def __init__(
        self,
        bbox_min: np.ndarray,
        bbox_max: np.ndarray,
        resolution: int,
        input_cameras: Camera,       # batched (V,)
        input_depths: np.ndarray,    # (V, H, W)
    ):
        self.bbox_min = np.asarray(bbox_min, np.float32)
        self.bbox_max = np.asarray(bbox_max, np.float32)
        # Degenerate (e.g. planar-scene) extents would zero grid_size and NaN
        # every index computation — inflate them to a minimal slab.
        thin = self.bbox_max - self.bbox_min < 1e-6
        pad = np.where(thin, 0.5 * max(1e-3, float(
            (self.bbox_max - self.bbox_min).max())), 0.0).astype(np.float32)
        self.bbox_min -= pad
        self.bbox_max += pad
        self.resolution = resolution
        self.grid_size = (self.bbox_max - self.bbox_min) / resolution

        r = resolution
        xs = self.bbox_min[0] + (np.arange(r) + 0.5) * self.grid_size[0]
        ys = self.bbox_min[1] + (np.arange(r) + 0.5) * self.grid_size[1]
        zs = self.bbox_min[2] + (np.arange(r) + 0.5) * self.grid_size[2]
        centers = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), -1)
        flat = jnp.asarray(centers.reshape(-1, 3))
        valid = check_visible_from_depths(
            input_cameras, jnp.asarray(input_depths), flat
        )
        self.grid = np.asarray(valid).reshape(r, r, r)

    def is_visible(self, points: np.ndarray) -> np.ndarray:
        """(N, 3) world points → bool mask (outside bbox = invisible)."""
        idx = np.floor(
            (np.asarray(points) - self.bbox_min) / self.grid_size
        ).astype(np.int64)
        inside = ((idx >= 0) & (idx < self.resolution)).all(axis=-1)
        idx = np.clip(idx, 0, self.resolution - 1)
        return inside & self.grid[idx[:, 0], idx[:, 1], idx[:, 2]]


@jax.jit
def check_visible_from_depths(cameras: Camera, depths: jnp.ndarray,
                              points: jnp.ndarray) -> jnp.ndarray:
    """A point is visible when some input view sees it in front of (or near)
    its depth surface (cam_utils.py:1568-1620)."""
    H, W = depths.shape[1:]

    def per_view(cam, depth):
        xy, z = cam.project(points)
        u = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, W - 1)
        v = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, H - 1)
        in_img = (
            (xy[:, 0] >= 0) & (xy[:, 0] <= W - 1)
            & (xy[:, 1] >= 0) & (xy[:, 1] <= H - 1) & (z > 0)
        )
        d = depth[v, u]
        return in_img & (d > 0) & (z < d * 1.02)

    vis = jax.vmap(per_view)(cameras, depths)
    return jnp.any(vis, axis=0)


# ----------------------------------------------------------------- proposals
@dataclass
class ProposalConfig:
    n_frames: int = 60
    width: int = 512
    height: int = 512
    fov_deg: float = 60.0
    stage3_fov_deg: float = 100.0


def _fov_to_focal(fov_deg: float, pixels: int) -> float:
    return pixels / (2.0 * np.tan(np.radians(fov_deg) / 2.0))


def propose_object_centric(
    input_cameras: Camera,
    grid: Optional[VisibilityGrid],
    traj_center: Optional[np.ndarray] = None,
    cfg: ProposalConfig = ProposalConfig(),
) -> Camera:
    """Stage-1 ring: orbit the scene center at the input cameras' mean radius,
    keeping only positions in visible space (render_novel_views.py:128-142)."""
    centers = np.asarray(input_cameras.center)
    target = traj_center if traj_center is not None else centers.mean(0)
    radius = np.linalg.norm(centers - target, axis=1).mean()
    up = np.array([0.0, -1.0, 0.0])
    f = _fov_to_focal(cfg.fov_deg, cfg.height)
    eyes = []
    for k in range(cfg.n_frames):
        a = 2 * np.pi * k / cfg.n_frames
        elev = 0.25 * np.sin(2 * a)
        eyes.append(target + radius * np.array(
            [np.cos(a) * np.cos(elev), np.sin(elev), np.sin(a) * np.cos(elev)]
        ))
    eyes = np.stack(eyes)
    if grid is not None:
        eyes = eyes[grid.is_visible(eyes)]
        if len(eyes) == 0:
            # Reference fallback (cam_utils.py:1055-1070): when the whole
            # orbit lies in unobserved space, propose from the train camera
            # centers instead; skip the stage only if even those are out.
            eyes = centers[grid.is_visible(centers)]
    cams = [
        lookat_camera(eye, target, up, fx=f, fy=f,
                      width=cfg.width, height=cfg.height)
        for eye in eyes
    ]
    return stack_cameras(cams) if cams else None


def propose_look_around(
    input_cameras: Camera,
    cfg: ProposalConfig = ProposalConfig(),
    yaw_range: float = np.pi / 2,
    n_per_view: int = 12,
) -> Camera:
    """Stage-2: rotate in place at each input camera position
    (render_novel_views.py:144-153)."""
    V = input_cameras.w2c.shape[0]
    f = _fov_to_focal(cfg.fov_deg, cfg.height)
    cams = []
    for v in range(V):
        c2w = np.asarray(jax.tree.map(lambda x: x[v], input_cameras).c2w)
        eye = c2w[:3, 3]
        fwd = c2w[:3, 2]
        up = -c2w[:3, 1]
        right = c2w[:3, 0]
        for k in range(n_per_view):
            yaw = -yaw_range / 2 + yaw_range * k / max(n_per_view - 1, 1)
            d = np.cos(yaw) * fwd + np.sin(yaw) * right
            cams.append(
                lookat_camera(eye, eye + d, -up, fx=f, fy=f,
                              width=cfg.width, height=cfg.height)
            )
    return stack_cameras(cams)


def propose_plane_targeted(
    input_cameras: Camera,
    plane_centers: np.ndarray,        # (K, 3)
    plane_normals: np.ndarray,        # (K, 3)
    grid: Optional[VisibilityGrid] = None,
    cfg: ProposalConfig = ProposalConfig(),
    standoff: float = 1.5,
) -> Optional[Camera]:
    """Stage-3: wide-FOV cameras on each plane's normal looking at its center
    (render_novel_views.py:155-167)."""
    f = _fov_to_focal(cfg.stage3_fov_deg, cfg.height)
    up = np.array([0.0, -1.0, 0.0])
    mean_center = np.asarray(input_cameras.center).mean(0)
    cams = []
    for c, n in zip(plane_centers, plane_normals):
        n = n / (np.linalg.norm(n) + 1e-12)
        # Face the plane from the side the cameras are on.
        if np.dot(mean_center - c, n) < 0:
            n = -n
        eye = c + standoff * n
        if grid is not None and not grid.is_visible(eye[None])[0]:
            eye = 0.5 * (eye + mean_center)
        if np.linalg.norm(np.cross(c - eye, up)) < 1e-6:
            up = np.array([0.0, 0.0, 1.0])
        cams.append(
            lookat_camera(eye, c, up, fx=f, fy=f,
                          width=cfg.width, height=cfg.height)
        )
    return stack_cameras(cams) if cams else None


# ------------------------------------------------------------------ selection
def visible_points_mask(camera: Camera, points: jnp.ndarray,
                        znear: float = 0.01) -> jnp.ndarray:
    """Frustum test (cam_utils.get_visible_points_mask)."""
    xy, z = camera.project(points)
    W, H = camera.width, camera.height
    return (
        (xy[:, 0] >= 0) & (xy[:, 0] <= W - 1)
        & (xy[:, 1] >= 0) & (xy[:, 1] <= H - 1) & (z > znear)
    )


def covisibility_by_splats(cam1: Camera, cam2: Camera,
                           xyz: jnp.ndarray) -> float:
    """max over the two directions of |visible in both| / |visible in one|
    (cam_utils.py:1330-1357)."""
    m1 = visible_points_mask(cam1, xyz)
    m2 = visible_points_mask(cam2, xyz)
    common = float(jnp.sum(m1 & m2))
    n1 = float(jnp.sum(m1))
    n2 = float(jnp.sum(m2))
    r1 = common / n1 if n1 > 0 else 0.0
    r2 = common / n2 if n2 > 0 else 0.0
    return max(r1, r2)


def none_visible_rate_from_alpha(alpha: np.ndarray,
                                 thresh: float = 0.5) -> float:
    """Fraction of a candidate render not covered by the current model."""
    return float((np.asarray(alpha) < thresh).mean())


def select_need_inpaint_views(
    candidate_cameras: Camera,            # batched (N,)
    none_visible_rates: Sequence[float],
    splat_xyz: jnp.ndarray,               # alive splat positions
    select_num: int = 10,
    low_bound: float = 0.05,
    high_bound: float = 0.5,
    covisible_high_bound: float = 0.8,
    seed: int = 0,
) -> List[int]:
    """Greedy diverse selection (cam_utils.py:899-995)."""
    rng = random.Random(seed)
    N = len(none_visible_rates)
    cams = [jax.tree.map(lambda x, i=i: x[i], candidate_cameras)
            for i in range(N)]
    view_rates = list(enumerate(none_visible_rates))
    rng.shuffle(view_rates)

    filtered = [(i, r) for i, r in view_rates if low_bound <= r <= high_bound]
    selected: List[int] = []
    if filtered:
        selected.append(filtered[0][0])

    def try_add(pool):
        for vid, _ in pool:
            if vid in selected:
                continue
            if any(
                covisibility_by_splats(cams[s], cams[vid], splat_xyz)
                > covisible_high_bound
                for s in selected
            ):
                continue
            selected.append(vid)
            if len(selected) >= select_num:
                return True
        return False

    if not try_add(filtered) and len(selected) < select_num:
        low_pool = [(i, r) for i, r in view_rates
                    if r < low_bound and i not in selected]
        try_add(low_pool)
    if len(selected) < select_num:
        remaining = [i for i in range(N)
                     if i not in selected and none_visible_rates[i] <= high_bound]
        rng.shuffle(remaining)
        selected.extend(remaining[: select_num - len(selected)])
    return selected
