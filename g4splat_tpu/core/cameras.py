"""Camera model.

One camera type for the whole framework (the reference maintains two parallel
stacks — 2dgs ``Camera``/``MiniCam`` (2d-gaussian-splatting/scene/cameras.py:17-65)
and matcha ``GSCamera``/pytorch3d (matcha/dm_scene/cameras.py:335,726) with
converters between them; we deliberately collapse that into a single pytree).

Conventions:
- ``w2c`` is the 4x4 world→camera (view) matrix, column-vector convention,
  OpenCV/COLMAP axes: +x right, +y down, +z forward into the screen.
- Intrinsics are pixel-space ``fx, fy, cx, cy`` (traced arrays so pose/intrinsic
  optimization can differentiate through them); image size is static metadata.
- Pixel centers are at integer coordinates; NDC→pixel uses the reference's
  ``x_pix = (W/2)·x_ndc + (W-1)/2`` mapping
  (diff-surfel-rasterization/cuda_rasterizer/forward.cu:106-110) so renders are
  pixel-exact comparable with the reference.

``Camera`` is a flax.struct dataclass, so a *batch* of cameras is just a Camera
whose array fields carry a leading batch axis — build with ``jax.vmap`` /
``jax.tree.map(stack, …)`` and shard the batch axis across the device mesh.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Camera:
    w2c: jnp.ndarray          # (4, 4) world→camera
    fx: jnp.ndarray           # () focal, pixels
    fy: jnp.ndarray           # ()
    cx: jnp.ndarray           # () principal point, pixels
    cy: jnp.ndarray           # ()
    width: int = struct.field(pytree_node=False, default=0)
    height: int = struct.field(pytree_node=False, default=0)
    znear: float = struct.field(pytree_node=False, default=0.01)
    zfar: float = struct.field(pytree_node=False, default=100.0)

    # ------------------------------------------------------------------ poses
    @property
    def c2w(self) -> jnp.ndarray:
        """(…, 4, 4) camera→world (inverse of the rigid w2c, closed form)."""
        R = self.w2c[..., :3, :3]
        t = self.w2c[..., :3, 3]
        Rt = jnp.swapaxes(R, -1, -2)
        top = jnp.concatenate([Rt, (-(Rt @ t[..., None]))], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), top.shape[:-2] + (1, 4)
        )
        return jnp.concatenate([top, bottom], axis=-2)

    @property
    def center(self) -> jnp.ndarray:
        """(…, 3) camera origin in world space."""
        return self.c2w[..., :3, 3]

    # ------------------------------------------------------------- intrinsics
    @property
    def K(self) -> jnp.ndarray:
        """(…, 3, 3) pixel intrinsics matrix."""
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        rows = jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], axis=-1),
                jnp.stack([z, self.fy, self.cy], axis=-1),
                jnp.stack([z, z, o], axis=-1),
            ],
            axis=-2,
        )
        return rows

    @property
    def tanfov(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(tan(fovx/2), tan(fovy/2))."""
        return self.width / (2.0 * self.fx), self.height / (2.0 * self.fy)

    @property
    def fov(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        tx, ty = self.tanfov
        return 2.0 * jnp.arctan(tx), 2.0 * jnp.arctan(ty)

    # ------------------------------------------------------------ projections
    @property
    def projection(self) -> jnp.ndarray:
        """(…, 4, 4) camera→NDC projection (column-vector).

        Matches the reference `getProjectionMatrix` (2d-gaussian-splatting/
        utils/graphics_utils.py:69-94) generalized to off-center principal
        points: z maps to [~0, 1] via `zf/(zf-zn)·(1 - zn/z)`, w = z.
        """
        W, H = float(self.width), float(self.height)
        zn, zf = self.znear, self.zfar
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        p00 = 2.0 * self.fx / W
        p11 = 2.0 * self.fy / H
        p02 = (2.0 * self.cx - (W - 1.0)) / W
        p12 = (2.0 * self.cy - (H - 1.0)) / H
        p22 = o * (zf / (zf - zn))
        p23 = o * (-(zf * zn) / (zf - zn))
        rows = jnp.stack(
            [
                jnp.stack([p00, z, p02, z], axis=-1),
                jnp.stack([z, p11, p12, z], axis=-1),
                jnp.stack([z, z, p22, p23], axis=-1),
                jnp.stack([z, z, o, z], axis=-1),
            ],
            axis=-2,
        )
        return rows

    @property
    def full_proj(self) -> jnp.ndarray:
        """(…, 4, 4) world→NDC: projection ∘ w2c."""
        return self.projection @ self.w2c

    @property
    def ndc2pix(self) -> jnp.ndarray:
        """(3, 4) homogeneous NDC→pixel map (reference forward.cu:106-110)."""
        W, H = float(self.width), float(self.height)
        return jnp.array(
            [
                [W / 2.0, 0.0, 0.0, (W - 1.0) / 2.0],
                [0.0, H / 2.0, 0.0, (H - 1.0) / 2.0],
                [0.0, 0.0, 0.0, 1.0],
            ],
            dtype=jnp.float32,
        )

    @property
    def world2pix(self) -> jnp.ndarray:
        """(…, 3, 4) world → homogeneous pixel (x·w, y·w, w), w = view-depth."""
        return self.ndc2pix @ self.full_proj

    # ------------------------------------------------------------------- rays
    def pixel_rays(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """World-space rays through every pixel center.

        Returns (origins (3,), directions (H, W, 3)); directions are scaled so
        that ``origin + depth*dir`` with *view-space z* depth lands on the
        surface (i.e. dir has unit view-z).
        """
        ys, xs = jnp.meshgrid(
            jnp.arange(self.height, dtype=jnp.float32),
            jnp.arange(self.width, dtype=jnp.float32),
            indexing="ij",
        )
        dirs_cam = jnp.stack(
            [(xs - self.cx) / self.fx, (ys - self.cy) / self.fy, jnp.ones_like(xs)],
            axis=-1,
        )
        R_c2w = self.c2w[:3, :3]
        dirs_world = dirs_cam @ R_c2w.T
        return self.center, dirs_world

    def backproject(self, depth: jnp.ndarray) -> jnp.ndarray:
        """(H, W) view-z depth map → (H, W, 3) world points."""
        origin, dirs = self.pixel_rays()
        return origin + depth[..., None] * dirs

    def project(self, pts_world: jnp.ndarray, eps: float = 1e-8):
        """(…, 3) world points → pixel coords (…, 2) and view depth (…,)."""
        M = self.world2pix
        ph = pts_world @ M[..., :3].T + M[..., 3]
        z = ph[..., 2]
        xy = ph[..., :2] / (z[..., None] + eps)
        return xy, z


def make_camera(
    w2c,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    width: int,
    height: int,
    znear: float = 0.01,
    zfar: float = 100.0,
) -> Camera:
    return Camera(
        w2c=jnp.asarray(w2c, dtype=jnp.float32),
        fx=jnp.asarray(fx, dtype=jnp.float32),
        fy=jnp.asarray(fy, dtype=jnp.float32),
        cx=jnp.asarray(cx, dtype=jnp.float32),
        cy=jnp.asarray(cy, dtype=jnp.float32),
        width=int(width),
        height=int(height),
        znear=float(znear),
        zfar=float(zfar),
    )


def make_camera_from_fov(
    w2c, fov_x: float, fov_y: float, width: int, height: int, **kw
) -> Camera:
    """Reference-style constructor: centered principal point, fov in radians."""
    fx = width / (2.0 * math.tan(fov_x / 2.0))
    fy = height / (2.0 * math.tan(fov_y / 2.0))
    return make_camera(
        w2c, fx, fy, (width - 1) / 2.0, (height - 1) / 2.0, width, height, **kw
    )


def stack_cameras(cams) -> Camera:
    """Stack a list of same-size Cameras into one batched Camera pytree."""
    assert len({(c.width, c.height, c.znear, c.zfar) for c in cams}) == 1, (
        "batched cameras must share static metadata"
    )
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)


def interpolate_cameras(
    cameras: "Camera",
    n_neighbors: int = 2,
    n_per_neighbor: int = 10,
) -> "Camera":
    """Interpolated cameras between each camera and its nearest neighbors
    (reference extract_mesh_adaptive_tsdf interp cams; configs/
    adaptive_tetrahedralization: n_neighbors_to_interpolate=2,
    n_interpolated_cameras_for_each_neighbor=10). Rotation slerp via
    quaternions, linear center/focal interpolation."""
    import numpy as np

    from g4splat_tpu.core.transforms import quat_to_rotmat, rotmat_to_quat

    V = cameras.w2c.shape[0]
    centers = np.asarray(cameras.center)
    w2c = np.asarray(cameras.w2c)
    fx = np.asarray(cameras.fx)
    fy = np.asarray(cameras.fy)
    cx = np.asarray(cameras.cx)
    cy = np.asarray(cameras.cy)

    def slerp(q0, q1, t):
        d = float(np.dot(q0, q1))
        if d < 0:
            q1, d = -q1, -d
        if d > 0.9995:
            q = q0 + t * (q1 - q0)
            return q / np.linalg.norm(q)
        th = np.arccos(np.clip(d, -1, 1))
        return (np.sin((1 - t) * th) * q0 + np.sin(t * th) * q1) / np.sin(th)

    quats = np.stack([
        np.asarray(rotmat_to_quat(jnp.asarray(m[:3, :3]))) for m in w2c
    ])
    out = []
    for i in range(V):
        d = np.linalg.norm(centers - centers[i], axis=1)
        d[i] = np.inf
        neigh = np.argsort(d)[: min(n_neighbors, V - 1)]
        for j in neigh:
            for k in range(1, n_per_neighbor + 1):
                t = k / (n_per_neighbor + 1)
                q = slerp(quats[i], quats[int(j)], t)
                R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
                c = (1 - t) * centers[i] + t * centers[int(j)]
                m = np.eye(4, dtype=np.float32)
                m[:3, :3] = R
                m[:3, 3] = -R @ c
                out.append(make_camera(
                    m,
                    (1 - t) * fx[i] + t * fx[int(j)],
                    (1 - t) * fy[i] + t * fy[int(j)],
                    (1 - t) * cx[i] + t * cx[int(j)],
                    (1 - t) * cy[i] + t * cy[int(j)],
                    cameras.width, cameras.height,
                    znear=cameras.znear, zfar=cameras.zfar,
                ))
    return stack_cameras(out)


def lookat_camera(
    eye, target, up, fx, fy, width, height, **kw
) -> Camera:
    """Build a camera looking from `eye` toward `target` (OpenCV axes)."""
    eye = jnp.asarray(eye, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    fwd = target - eye
    fwd = fwd / (jnp.linalg.norm(fwd) + 1e-12)
    right = jnp.cross(fwd, up)
    right = right / (jnp.linalg.norm(right) + 1e-12)
    down = jnp.cross(fwd, right)
    R_c2w = jnp.stack([right, down, fwd], axis=1)  # columns = camera axes
    R = R_c2w.T
    t = -R @ eye
    w2c = jnp.eye(4, dtype=jnp.float32).at[:3, :3].set(R).at[:3, 3].set(t)
    return make_camera(
        w2c, fx, fy, (width - 1) / 2.0, (height - 1) / 2.0, width, height, **kw
    )
