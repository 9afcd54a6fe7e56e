import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g4splat_tpu.core.cameras import make_camera, stack_cameras
from g4splat_tpu.core.transforms import quat_to_rotmat
from g4splat_tpu.ops.rasterize import render
from g4splat_tpu.pipeline.gaussian_init import (
    init_by_warp_from_depths,
    init_from_manifold_meshes,
    manifold_mesh_from_points,
    scene_from_init,
    surfels_from_mesh,
    voxel_downsample_indices,
)


def plane_setup(V=2, H=24, W=32, z=2.0, shift=0.15):
    cams = []
    for i in range(V):
        w2c = jnp.eye(4).at[0, 3].set(-shift * i)
        cams.append(make_camera(w2c, 30.0, 30.0, (W - 1) / 2, (H - 1) / 2, W, H))
    cameras = stack_cameras(cams)
    depths = np.full((V, H, W), z, np.float32)
    rng = np.random.RandomState(0)
    images = rng.rand(V, H, W, 3).astype(np.float32)
    return cameras, depths, images


class TestManifoldInit:
    def test_mesh_topology(self):
        pts = np.random.rand(4, 5, 3).astype(np.float32)
        verts, faces = manifold_mesh_from_points(pts)
        assert len(verts) == 20
        assert len(faces) == 2 * 3 * 4

    def test_surfels_on_plane(self):
        cameras, depths, images = plane_setup(V=1)
        parts = init_from_manifold_meshes(cameras, depths, images)
        n = len(parts["means"])
        assert n == 2 * 23 * 31
        # All surfels on the z=2 plane with normals ±z.
        np.testing.assert_allclose(parts["means"][:, 2], 2.0, atol=1e-4)
        R = np.asarray(quat_to_rotmat(jnp.asarray(parts["quaternions"])))
        nz = np.abs(R[:, 2, 2])
        np.testing.assert_allclose(nz, 1.0, atol=1e-3)
        # Scales ~ half pixel footprint: pixel size = z/f = 2/30.
        assert 0.2 * (2 / 30) < np.median(parts["scales"]) < 1.2 * (2 / 30)

    def test_elongated_faces_removed(self):
        # Severe depth discontinuity → elongated faces dropped.
        cameras, depths, images = plane_setup(V=1)
        depths[0, :, 16:] = 6.0
        parts = init_from_manifold_meshes(cameras, depths, images)
        assert len(parts["means"]) < 2 * 23 * 31

    def test_voxel_downsample(self):
        pts = np.random.RandomState(0).rand(1000, 3)
        idx = voxel_downsample_indices(pts, 0.2)
        assert len(idx) <= 5 ** 3 + 30
        assert len(idx) < 1000

    def test_renderable(self):
        cameras, depths, images = plane_setup(V=1)
        parts = init_from_manifold_meshes(cameras, depths, images)
        scene = scene_from_init(parts, initial_opacity=0.9)
        cam = jax.tree.map(lambda x: x[0], cameras)
        out = render(cam, scene, backend="tiled")
        # Inner pixels must be covered.
        alpha = np.asarray(out["rend_alpha"])[4:-4, 4:-4]
        assert alpha.min() > 0.3


class TestNonFiniteInit:
    def test_scene_from_init_drops_nan_rows(self):
        """Garbage prior depths backproject to NaN means; scene_from_init
        must drop them before they occupy immortal capacity slots."""
        n = 50
        rng = np.random.RandomState(0)
        parts = {
            "means": rng.randn(n, 3).astype(np.float32),
            "scales": np.full((n, 2), 0.05, np.float32),
            "quaternions": np.tile(np.array([[1, 0, 0, 0]], np.float32),
                                   (n, 1)),
            "colors": rng.rand(n, 3).astype(np.float32),
        }
        parts["means"][:5] = np.nan
        parts["scales"][5:8] = np.inf
        scene = scene_from_init(parts)
        assert int(scene.num_alive) == n - 8
        alive = np.asarray(scene.alive)
        assert np.isfinite(np.asarray(scene.xyz)[alive]).all()
        assert np.isfinite(np.asarray(scene.scaling_raw)[alive]).all()


class TestWarpInit:
    def test_dedup_across_views(self):
        cameras, depths, images = plane_setup(V=2, shift=0.1)
        parts = init_by_warp_from_depths(cameras, depths, images)
        n = len(parts["means"])
        npix = 24 * 32
        # First view spawns ~all pixels; second only the ~few unseen columns.
        assert npix < n < npix + 0.3 * npix
        # All on the plane.
        np.testing.assert_allclose(parts["means"][:, 2], 2.0, atol=1e-3)

    def test_single_view_full(self):
        cameras, depths, images = plane_setup(V=1)
        parts = init_by_warp_from_depths(cameras, depths, images)
        assert len(parts["means"]) == 24 * 32

    def test_scale_bounds(self):
        cameras, depths, images = plane_setup(V=1)
        parts = init_by_warp_from_depths(
            cameras, depths, images, min_scale=5e-4, max_scale=0.05
        )
        assert parts["scales"].min() >= 5e-4
        assert parts["scales"].max() < 0.05


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
