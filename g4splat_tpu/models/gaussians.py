"""Gaussian surfel scene state.

TPU-native counterpart of the reference `GaussianModel`
(2d-gaussian-splatting/scene/gaussian_model.py). Key design departures:

- **Pure pytree, static capacity.** XLA wants static shapes, so the scene is a
  fixed-capacity buffer of `capacity` surfels with an `alive` mask. The
  reference grows/shrinks torch tensors every densify step; we mask instead,
  and recompact/grow on the host at interval boundaries (bucketed capacities
  keep recompiles rare). Dead slots carry zero opacity so every consumer —
  rasterizer, mesh extractor, IO — can ignore them without special-casing.
- **Functional.** No in-place optimizer surgery: the optimizer state lives
  beside the scene in the train loop and is masked with the same `alive` mask.
- 2DGS surfels: 2 tangent scales (log-space), wxyz quaternion, SH color
  (degree ≤ 3), scalar opacity (logit-space), optional per-splat mip (low-pass)
  filter scale in world units (gaussian_model.py:388-434).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from g4splat_tpu.core import sh as sh_lib
from g4splat_tpu.core.transforms import normalize, quat_to_rotmat


@struct.dataclass
class GaussianScene:
    xyz: jnp.ndarray            # (N, 3) world positions
    f_dc: jnp.ndarray           # (N, 1, 3) SH degree-0 coeffs
    f_rest: jnp.ndarray         # (N, K-1, 3) higher SH coeffs
    opacity_raw: jnp.ndarray    # (N, 1) logit opacity
    scaling_raw: jnp.ndarray    # (N, 2) log tangent scales
    rotation_raw: jnp.ndarray   # (N, 4) unnormalized wxyz quats
    alive: jnp.ndarray          # (N,) bool
    mip_filter: jnp.ndarray     # (N, 1) world-space low-pass scale (0 = off)
    max_sh_degree: int = struct.field(pytree_node=False, default=3)
    active_sh_degree: int = struct.field(pytree_node=False, default=0)
    use_mip_filter: bool = struct.field(pytree_node=False, default=False)

    # ------------------------------------------------------------- properties
    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def num_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive)

    def scaling(self) -> jnp.ndarray:
        """(N, 2) activated tangent scales; mip filter adds its variance
        (gaussian_model.py:158-163)."""
        s = jnp.exp(self.scaling_raw)
        if self.use_mip_filter:
            s = jnp.sqrt(jnp.square(s) + jnp.square(self.mip_filter))
        return s

    def opacity(self) -> jnp.ndarray:
        """(N, 1) activated opacity, mip-compensated (gaussian_model.py:180-192)
        and zeroed on dead slots."""
        o = jax.nn.sigmoid(self.opacity_raw)
        if self.use_mip_filter:
            s2 = jnp.exp(2.0 * self.scaling_raw)
            det1 = jnp.prod(s2, axis=1)
            det2 = jnp.prod(s2 + jnp.square(self.mip_filter), axis=1)
            o = o * jnp.sqrt(det1 / jnp.maximum(det2, 1e-30))[..., None]
        return o * self.alive[..., None]

    def rotation(self) -> jnp.ndarray:
        return normalize(self.rotation_raw)

    def rotmats(self) -> jnp.ndarray:
        """(N, 3, 3); columns 0,1 are tangent axes, column 2 the normal."""
        return quat_to_rotmat(self.rotation_raw)

    def features(self) -> jnp.ndarray:
        """(N, K, 3) concatenated SH coefficients."""
        return jnp.concatenate([self.f_dc, self.f_rest], axis=1)

    def normals(self) -> jnp.ndarray:
        """(N, 3) world normals (3rd rotation column)."""
        return self.rotmats()[..., :, 2]

    def colors(self, camera_center: jnp.ndarray) -> jnp.ndarray:
        """(N, 3) view-dependent RGB from the active SH degree."""
        dirs = normalize(self.xyz - camera_center)
        return sh_lib.sh_to_rgb(self.active_sh_degree, self.features(), dirs)

    # --------------------------------------------------------------- editing
    def one_up_sh_degree(self) -> "GaussianScene":
        if self.active_sh_degree < self.max_sh_degree:
            return self.replace(active_sh_degree=self.active_sh_degree + 1)
        return self

    def reset_opacity(self, ceiling: float = 0.01) -> "GaussianScene":
        """Clamp activated opacity to `ceiling` (gaussian_model.py:436-439)."""
        o = jnp.minimum(jax.nn.sigmoid(self.opacity_raw), ceiling)
        o = jnp.clip(o, 1e-6, 1.0 - 1e-6)
        return self.replace(opacity_raw=jnp.log(o) - jnp.log1p(-o))

    def compute_mip_filter(self, cameras, znear: float = 0.2,
                           filter_variance: float = 0.2) -> "GaussianScene":
        """Per-splat screen-space low-pass scale: min view depth / max focal ×
        sqrt(filter_variance) over all cameras seeing the splat
        (gaussian_model.py:388-434). `cameras` is a batched Camera pytree."""
        xyz = self.xyz

        def per_cam(cam_w2c, fx, fy, cx, cy, width, height):
            p_cam = xyz @ cam_w2c[:3, :3].T + cam_w2c[:3, 3]
            z = jnp.maximum(p_cam[:, 2], 1e-3)
            x = p_cam[:, 0] / z * fx + width / 2.0
            y = p_cam[:, 1] / z * fy + height / 2.0
            in_screen = (
                (x >= -0.15 * width) & (x <= 1.15 * width)
                & (y >= -0.15 * height) & (y <= 1.15 * height)
            )
            valid = (p_cam[:, 2] > znear) & in_screen
            return jnp.where(valid, z, jnp.inf), valid

        width, height = cameras.width, cameras.height
        dists, valids = jax.vmap(
            lambda w2c, fx, fy, cx, cy: per_cam(w2c, fx, fy, cx, cy, width, height)
        )(cameras.w2c, cameras.fx, cameras.fy, cameras.cx, cameras.cy)
        distance = jnp.min(dists, axis=0)
        seen = jnp.any(valids, axis=0)
        # Unseen splats get the max distance among seen ones.
        fallback = jnp.max(jnp.where(seen, distance, -jnp.inf))
        distance = jnp.where(seen, distance, fallback)
        focal = jnp.max(cameras.fx)
        mip = (distance / focal * filter_variance ** 0.5)[..., None]
        return self.replace(mip_filter=mip, use_mip_filter=True)

    # ----------------------------------------------------------- construction
    @staticmethod
    def empty(capacity: int, max_sh_degree: int = 3) -> "GaussianScene":
        K = sh_lib.num_sh_coeffs(max_sh_degree)
        return GaussianScene(
            xyz=jnp.zeros((capacity, 3), jnp.float32),
            f_dc=jnp.zeros((capacity, 1, 3), jnp.float32),
            f_rest=jnp.zeros((capacity, K - 1, 3), jnp.float32),
            opacity_raw=jnp.full((capacity, 1), -10.0, jnp.float32),
            scaling_raw=jnp.full((capacity, 2), -10.0, jnp.float32),
            rotation_raw=jnp.tile(
                jnp.array([[1.0, 0, 0, 0]], jnp.float32), (capacity, 1)
            ),
            alive=jnp.zeros((capacity,), bool),
            mip_filter=jnp.zeros((capacity, 1), jnp.float32),
            max_sh_degree=max_sh_degree,
        )

    @staticmethod
    def from_points(
        points: np.ndarray,
        colors: Optional[np.ndarray] = None,
        capacity: Optional[int] = None,
        max_sh_degree: int = 3,
        initial_opacity: float = 0.1,
        scales: Optional[np.ndarray] = None,
        quats: Optional[np.ndarray] = None,
    ) -> "GaussianScene":
        """Seed a scene from a point cloud (reference create_from_pcd,
        gaussian_model.py:198-232). If `scales` is None, tangent scales are
        sqrt(mean 3-NN squared distance) per point (simple-knn's distCUDA2)."""
        from g4splat_tpu.ops.knn import mean_knn_sq_dist

        n = points.shape[0]
        capacity = capacity or n
        assert capacity >= n
        scene = GaussianScene.empty(capacity, max_sh_degree)
        pts = jnp.asarray(points, jnp.float32)
        if scales is None:
            d2 = jnp.maximum(mean_knn_sq_dist(pts), 1e-7)
            s = jnp.sqrt(d2)[:, None].repeat(2, axis=1)
        else:
            s = jnp.asarray(scales, jnp.float32)
            if s.ndim == 1:
                s = s[:, None].repeat(2, axis=1)
        if quats is None:
            q = jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (n, 1))
        else:
            q = jnp.asarray(quats, jnp.float32)
        if colors is None:
            dc = jnp.zeros((n, 1, 3), jnp.float32)
        else:
            dc = sh_lib.rgb_to_sh0(jnp.asarray(colors, jnp.float32))[:, None, :]
        op = float(np.log(initial_opacity / (1 - initial_opacity)))
        return scene.replace(
            xyz=scene.xyz.at[:n].set(pts),
            f_dc=scene.f_dc.at[:n].set(dc),
            scaling_raw=scene.scaling_raw.at[:n].set(jnp.log(s)),
            rotation_raw=scene.rotation_raw.at[:n].set(q),
            opacity_raw=scene.opacity_raw.at[:n].set(op),
            alive=scene.alive.at[:n].set(True),
        )

    # ------------------------------------------------------------------- mesh
    def tetra_points(self, downsample_ratio: float = 1.0,
                     flatness: float = 2e-4, seed: int = 0):
        """Candidate tetrahedralization vertices: 8 box corners + center per
        (optionally subsampled) surfel, with the flat axis padded to
        `flatness` (gaussian_model.py:318-382). Host-side helper (np)."""
        xyz = np.asarray(self.xyz)
        alive = np.asarray(self.alive)
        R = np.asarray(self.rotmats())
        s2 = np.asarray(self.scaling())
        xyz, R, s2 = xyz[alive], R[alive], s2[alive]
        # Non-finite splats (diverged training steps can leave NaN positions
        # or exp-overflowed scales in live slots) would poison every corner
        # point and abort Qhull downstream — drop them here.
        finite = (np.isfinite(xyz).all(1) & np.isfinite(s2).all(1)
                  & np.isfinite(R).all((1, 2)))
        if not finite.all():
            xyz, R, s2 = xyz[finite], R[finite], s2[finite]
        n = xyz.shape[0]
        if downsample_ratio < 1.0 and n > 0:
            rng = np.random.default_rng(seed)
            keep = rng.choice(n, max(1, int(n * downsample_ratio)), replace=False)
            xyz, R, s2 = xyz[keep], R[keep], s2[keep]
            n = xyz.shape[0]
        s3 = np.concatenate([s2, np.full((n, 1), flatness, np.float32)], axis=1)
        corners = np.array(
            [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
            np.float32,
        )  # (8, 3)
        offs = np.einsum("nij,cj,nj->nci", R, corners, s3)
        pts = np.concatenate(
            [(xyz[:, None, :] + offs).reshape(-1, 3), xyz], axis=0
        )
        scale = np.max(s3, axis=1)
        vert_scale = np.concatenate([np.repeat(scale, 8), scale], axis=0)
        return pts, vert_scale
