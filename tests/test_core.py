import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g4splat_tpu.core import sh
from g4splat_tpu.core.cameras import (
    lookat_camera,
    make_camera,
    make_camera_from_fov,
    stack_cameras,
)
from g4splat_tpu.core.geometry import (
    bilinear_sample,
    depth_to_normal,
    depth_to_points,
)
from g4splat_tpu.core.transforms import (
    normalize,
    quat_multiply,
    quat_to_rotmat,
    rotmat_to_quat,
)


def rand_quats(key, n):
    q = jax.random.normal(key, (n, 4))
    return normalize(q)


class TestTransforms:
    def test_quat_rotmat_roundtrip(self):
        q = rand_quats(jax.random.PRNGKey(0), 64)
        q = jnp.where(q[:, :1] < 0, -q, q)  # canonical sign
        R = quat_to_rotmat(q)
        # Orthonormality
        eye = jnp.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (64, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)
        q2 = rotmat_to_quat(R)
        np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-5)

    def test_quat_multiply_matches_matmul(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        qa, qb = rand_quats(k1, 8), rand_quats(k2, 8)
        Rab = quat_to_rotmat(quat_multiply(qa, qb))
        np.testing.assert_allclose(
            np.asarray(Rab),
            np.asarray(quat_to_rotmat(qa) @ quat_to_rotmat(qb)),
            atol=1e-5,
        )

    def test_identity_quat(self):
        R = quat_to_rotmat(jnp.array([1.0, 0, 0, 0]))
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-7)


class TestSH:
    def test_degree0_constant(self):
        coeffs = jnp.zeros((5, 16, 3)).at[:, 0, :].set(1.0)
        dirs = normalize(jax.random.normal(jax.random.PRNGKey(0), (5, 3)))
        out = sh.eval_sh(0, coeffs, dirs)
        np.testing.assert_allclose(np.asarray(out), sh.C0, atol=1e-6)

    def test_rgb_roundtrip_sh0(self):
        rgb = jnp.array([[0.2, 0.5, 0.9]])
        coeffs = jnp.zeros((1, 1, 3)).at[:, 0, :].set(sh.rgb_to_sh0(rgb))
        out = sh.sh_to_rgb(0, coeffs, jnp.array([[0.0, 0.0, 1.0]]))
        np.testing.assert_allclose(np.asarray(out), np.asarray(rgb), atol=1e-6)

    def test_orthogonality_degree3(self):
        # Monte-Carlo check: SH basis functions are orthonormal on the sphere.
        key = jax.random.PRNGKey(42)
        dirs = normalize(jax.random.normal(key, (200000, 3)))
        basis = []
        for i in range(16):
            coeffs = jnp.zeros((1, 16, 1)).at[0, i, 0].set(1.0)
            basis.append(
                sh.eval_sh(3, jnp.broadcast_to(coeffs, (dirs.shape[0], 16, 1)), dirs)[:, 0]
            )
        B = jnp.stack(basis, axis=1)
        gram = (B.T @ B) * (4 * np.pi / dirs.shape[0])
        np.testing.assert_allclose(np.asarray(gram), np.eye(16), atol=0.05)


class TestCameras:
    def _cam(self, w=64, h=48):
        R = quat_to_rotmat(normalize(jnp.array([0.9, 0.1, -0.2, 0.3])))
        w2c = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(jnp.array([0.1, -0.2, 2.0]))
        return make_camera(w2c, 60.0, 55.0, (w - 1) / 2, (h - 1) / 2, w, h)

    def test_project_backproject_roundtrip(self):
        cam = self._cam()
        depth = 1.5 + 0.3 * jax.random.uniform(jax.random.PRNGKey(0), (48, 64))
        pts = cam.backproject(depth)
        xy, z = cam.project(pts)
        ys, xs = jnp.meshgrid(jnp.arange(48.0), jnp.arange(64.0), indexing="ij")
        np.testing.assert_allclose(np.asarray(xy[..., 0]), np.asarray(xs), atol=1e-3)
        np.testing.assert_allclose(np.asarray(xy[..., 1]), np.asarray(ys), atol=1e-3)
        np.testing.assert_allclose(np.asarray(z), np.asarray(depth), atol=1e-4)

    def test_c2w_inverse(self):
        cam = self._cam()
        np.testing.assert_allclose(
            np.asarray(cam.c2w @ cam.w2c), np.eye(4), atol=1e-6
        )

    def test_full_proj_matches_reference_convention(self):
        # For a centered-pp camera, full_proj must equal the reference
        # getProjectionMatrix @ w2c (graphics_utils.py:69-94).
        import math

        cam = self._cam()
        fovx = 2 * math.atan(cam.width / (2 * float(cam.fx)))
        fovy = 2 * math.atan(cam.height / (2 * float(cam.fy)))
        tx, ty = math.tan(fovx / 2), math.tan(fovy / 2)
        zn, zf = cam.znear, cam.zfar
        P = np.zeros((4, 4), np.float32)
        P[0, 0] = 1 / tx
        P[1, 1] = 1 / ty
        P[2, 2] = zf / (zf - zn)
        P[2, 3] = -(zf * zn) / (zf - zn)
        P[3, 2] = 1.0
        # Our projection allows the half-pixel cx=(W-1)/2 offset: the
        # reference's ndc2pix folds it in later; composing with ndc2pix must
        # agree exactly on pixel coordinates (checked in roundtrip test). Here
        # check the focal terms.
        ours = np.asarray(cam.projection)
        np.testing.assert_allclose(ours[0, 0], P[0, 0], rtol=1e-6)
        np.testing.assert_allclose(ours[1, 1], P[1, 1], rtol=1e-6)
        np.testing.assert_allclose(ours[2:, :], P[2:, :], atol=1e-7)

    def test_lookat(self):
        cam = lookat_camera(
            eye=[0, 0, -3], target=[0, 0, 0], up=[0, -1, 0],
            fx=50.0, fy=50.0, width=32, height=32,
        )
        xy, z = cam.project(jnp.array([[0.0, 0.0, 0.0]]))
        np.testing.assert_allclose(float(z[0]), 3.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(xy[0]), [15.5, 15.5], atol=1e-4)

    def test_stack_and_vmap(self):
        cams = [self._cam(), self._cam()]
        batch = stack_cameras(cams)
        centers = batch.center
        assert centers.shape == (2, 3)

    def test_depth_to_normal_plane(self):
        # A fronto-parallel plane at z=2 must give normals ±z (world = cam
        # here since w2c = I).
        cam = make_camera(jnp.eye(4), 40.0, 40.0, 31.5, 23.5, 64, 48)
        depth = jnp.full((48, 64), 2.0)
        n = depth_to_normal(cam, depth)
        inner = np.asarray(n[5:-5, 5:-5])
        nz = np.abs(inner[..., 2])
        np.testing.assert_allclose(nz, 1.0, atol=1e-4)

    def test_bilinear_sample(self):
        img = jnp.arange(12.0).reshape(3, 4, 1)
        v = bilinear_sample(img, jnp.array([[1.5, 0.5]]))  # x=1.5, y=0.5
        np.testing.assert_allclose(float(v[0, 0]), (1.5 + 5.5) / 2, atol=1e-6)


class TestKNN:
    def test_exact_grid(self):
        from g4splat_tpu.ops.knn import mean_knn_sq_dist_exact

        # Unit grid: each interior point's 3 NNs are at distance 1.
        xs = jnp.arange(5.0)
        pts = jnp.stack(jnp.meshgrid(xs, xs, xs, indexing="ij"), -1).reshape(-1, 3)
        d2 = mean_knn_sq_dist_exact(pts, block=32)
        np.testing.assert_allclose(np.asarray(d2), 1.0, atol=1e-5)

    def test_morton_approx_matches_exact(self):
        from g4splat_tpu.ops.knn import mean_knn_sq_dist, mean_knn_sq_dist_exact

        pts = jax.random.uniform(jax.random.PRNGKey(0), (6000, 3))
        approx = mean_knn_sq_dist(pts, window=128)
        exact = mean_knn_sq_dist_exact(pts, block=1024)
        rel = np.abs(np.asarray(approx) - np.asarray(exact)) / np.asarray(exact)
        # Approximation (seeds initial scales only): the bulk must be spot-on,
        # a Z-order-discontinuity tail is acceptable (overestimates only).
        assert np.median(rel) < 0.01
        assert np.mean(rel) < 0.35
        assert np.all(np.asarray(approx) >= np.asarray(exact) - 1e-5)


class TestPLY:
    def test_gaussian_ply_roundtrip(self, tmp_path):
        from g4splat_tpu.io.ply import load_gaussian_ply, save_gaussian_ply
        from g4splat_tpu.models.gaussians import GaussianScene

        key = jax.random.PRNGKey(0)
        pts = jax.random.normal(key, (100, 3))
        cols = jax.random.uniform(key, (100, 3))
        scene = GaussianScene.from_points(
            np.asarray(pts), np.asarray(cols), capacity=128
        ).replace(active_sh_degree=3)
        p = str(tmp_path / "pc.ply")
        save_gaussian_ply(p, scene)
        back = load_gaussian_ply(p)
        assert back.capacity == 100
        np.testing.assert_allclose(np.asarray(back.xyz), np.asarray(pts), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(back.f_dc), np.asarray(scene.f_dc[:100]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(back.scaling_raw),
            np.asarray(scene.scaling_raw[:100]),
            atol=1e-6,
        )

    def test_mesh_roundtrip(self, tmp_path):
        from g4splat_tpu.io.ply import load_mesh_ply, save_mesh_ply

        verts = np.random.rand(10, 3).astype(np.float32)
        faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        colors = np.random.rand(10, 3)
        p = str(tmp_path / "mesh.ply")
        save_mesh_ply(p, verts, faces, colors)
        v, f, c = load_mesh_ply(p)
        np.testing.assert_allclose(v, verts, atol=1e-6)
        np.testing.assert_array_equal(f, faces)
        assert c is not None


class TestGaussianScene:
    def test_masking(self):
        scene = GaussianSceneFactory.simple(8, capacity=16)
        assert int(scene.num_alive) == 8
        op = scene.opacity()
        assert np.all(np.asarray(op[8:]) == 0)

    def test_reset_opacity(self):
        scene = GaussianSceneFactory.simple(8, capacity=16)
        scene2 = scene.reset_opacity()
        op = np.asarray(scene2.opacity()[:8])
        assert np.all(op <= 0.0101)


class GaussianSceneFactory:
    @staticmethod
    def simple(n, capacity=None):
        from g4splat_tpu.models.gaussians import GaussianScene

        pts = np.random.RandomState(0).randn(n, 3).astype(np.float32)
        cols = np.random.RandomState(1).rand(n, 3).astype(np.float32)
        return GaussianScene.from_points(pts, cols, capacity=capacity)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
