import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g4splat_tpu.core.cameras import lookat_camera, make_camera, stack_cameras
from g4splat_tpu.pipeline.planes import (
    PlaneExcavator,
    PlaneExcavatorConfig,
    compute_plane_aligned_depth,
    covisibility_rate,
    fit_plane_ransac,
    fit_plane_svd,
    merge_global_planes,
    normals_cluster,
    refine_depths_with_planes,
)


def synthetic_normals(H=48, W=64):
    """Three regions with distinct normals: floor, left wall, right wall."""
    n = np.zeros((H, W, 3), np.float32)
    n[: H // 2] = [0, 0, 1]          # back wall
    n[H // 2 :, : W // 2] = [0, 1, 0]  # floor left
    n[H // 2 :, W // 2 :] = [1, 0, 0]  # right wall
    n += np.random.RandomState(0).randn(H, W, 3) * 0.02
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    return n


class TestNormalClustering:
    def test_three_regions(self):
        normals = synthetic_normals()
        masks = normals_cluster(normals, (48, 64))
        assert 3 <= len(masks) <= 6
        # The union covers most of the image and masks are disjoint-ish.
        union = np.zeros((48, 64), bool)
        for m in masks:
            union |= m
        assert union.mean() > 0.8

    def test_excavator_without_sam(self):
        normals = synthetic_normals()
        exc = PlaneExcavator(PlaneExcavatorConfig())
        out = exc(np.zeros((48, 64, 3)), normals)
        seg = out["seg_mask"]
        assert seg.max() >= 3
        assert out["normal"].shape[1] == 3
        # Mean instance normals are near axis directions.
        dots = np.abs(out["normal"] @ np.eye(3).T).max(axis=1)
        assert np.all(dots > 0.95)

    def test_excavator_with_mask_generator(self):
        normals = synthetic_normals()
        # Proposal generator: left half / right half rectangles.
        def gen(img):
            a = np.zeros((48, 64), bool)
            a[:, :32] = True
            return [a, ~a]

        exc = PlaneExcavator(PlaneExcavatorConfig(), mask_generator=gen)
        out = exc(np.zeros((48, 64, 3)), normals)
        # back wall split by the two proposals → ≥4 instances
        assert out["seg_mask"].max() >= 4


class TestGlobalMerge:
    def test_merge_two_views_same_plane(self):
        H, W = 8, 8
        # Shared cloud ids: view0 sees ids 1..32 in its plane, view1 sees
        # 17..48 → covisibility 16/32 = 0.5 → NOT > 0.5; use bigger overlap.
        pid0 = np.zeros((H, W), np.int32)
        pid0[:4] = np.arange(1, 33).reshape(4, 8)
        pid1 = np.zeros((H, W), np.int32)
        pid1[:4] = np.arange(9, 41).reshape(4, 8)  # overlap 24/32 = 0.75
        pm0 = np.zeros((H, W), np.int32)
        pm0[:4] = 1
        pm1 = np.zeros((H, W), np.int32)
        pm1[:4] = 1
        pts, d = merge_global_planes([pid0, pid1], [pm0, pm1])
        assert len(pts) == 1
        assert d[0] == [(0, 1), (1, 1)]
        assert len(pts[0]) == 40  # union 1..40

    def test_no_merge_disjoint(self):
        H, W = 8, 8
        pid0 = np.zeros((H, W), np.int32)
        pid0[:4] = np.arange(1, 33).reshape(4, 8)
        pid1 = np.zeros((H, W), np.int32)
        pid1[:4] = np.arange(100, 132).reshape(4, 8)
        pm = np.zeros((H, W), np.int32)
        pm[:4] = 1
        pts, d = merge_global_planes([pid0, pid1], [pm, pm])
        assert len(pts) == 2

    def test_covisibility(self):
        a = np.arange(10)
        b = np.arange(5, 20)
        assert covisibility_rate(a, b) == pytest.approx(0.5)


class TestPlaneFit:
    def test_svd_exact_plane(self):
        rng = np.random.RandomState(0)
        n = np.array([1.0, 2.0, -1.0])
        n /= np.linalg.norm(n)
        # Points on plane n·p = 3
        basis = np.linalg.svd(n[None])[2][1:]
        pts = 3 * n + rng.randn(200, 2) @ basis
        normal, d = fit_plane_svd(pts)
        assert abs(abs(normal @ n) - 1) < 1e-6
        assert abs(abs(d) - 3) < 1e-6

    def test_ransac_with_outliers(self):
        rng = np.random.RandomState(1)
        n = np.array([0.0, 0.0, 1.0])
        basis = np.eye(3)[:2]
        pts = np.concatenate([
            2 * n + rng.randn(300, 2) @ basis + rng.randn(300, 3) * 0.002,
            rng.randn(60, 3) * 2 + 5,   # outliers
        ])
        normal, center, inliers = fit_plane_ransac(pts, threshold=0.02)
        assert abs(abs(normal[2]) - 1) < 0.01
        assert inliers[:300].mean() > 0.95
        assert inliers[300:].mean() < 0.2
        assert abs(center[2] - 2.0) < 0.02

    def test_prior_normal_pulls_fit(self):
        rng = np.random.RandomState(2)
        basis = np.eye(3)[:2]
        pts = rng.randn(100, 2) @ basis + rng.randn(100, 3) * 0.05
        prior = np.array([0.1, 0.1, 0.99])
        prior /= np.linalg.norm(prior)
        normal, _, _ = fit_plane_ransac(pts, threshold=0.2, prior_normal=prior)
        assert normal @ prior > 0.97


class TestPlaneDepth:
    def test_frontoparallel_plane_depth(self):
        cam = make_camera(jnp.eye(4), 32.0, 32.0, 15.5, 15.5, 32, 32)
        depth = compute_plane_aligned_depth(
            np.array([0, 0, -1.0]), np.array([0, 0, 2.5]), cam, (32, 32)
        )
        np.testing.assert_allclose(depth, 2.5, atol=1e-5)

    def test_tilted_plane_matches_backprojection(self):
        cam = make_camera(jnp.eye(4), 40.0, 40.0, 15.5, 15.5, 32, 32)
        n = np.array([0.3, -0.2, -1.0])
        n /= np.linalg.norm(n)
        c = np.array([0.1, 0.0, 3.0])
        depth = compute_plane_aligned_depth(n, c, cam, (32, 32))
        pts = np.asarray(cam.backproject(jnp.asarray(depth)))
        resid = np.abs((pts - c) @ n)
        np.testing.assert_allclose(resid, 0.0, atol=1e-4)


class TestRefineDriver:
    def test_depth_overwrite(self):
        # One view, one global plane covering the top half; noisy depths get
        # snapped to the analytic plane depth.
        cam = make_camera(jnp.eye(4), 32.0, 32.0, 15.5, 15.5, 32, 32)
        cameras = stack_cameras([cam])
        rng = np.random.RandomState(0)
        # True plane z=2; member points from it.
        pts = np.concatenate(
            [np.zeros((1, 3)),  # id 0 = unused sentinel
             np.stack([rng.uniform(-1, 1, 400), rng.uniform(-1, 1, 400),
                       np.full(400, 2.0)], 1)]
        )
        pid_map = np.zeros((32, 32), np.int32)
        pid_map[:16] = rng.randint(1, 401, (16, 32))
        pmask = np.zeros((32, 32), np.int32)
        pmask[:16] = 1
        depths = np.full((1, 32, 32), 2.0) + rng.randn(1, 32, 32) * 0.2
        refined, planes = refine_depths_with_planes(
            cameras, depths, [pmask], {0: [(0, 1)]}, pts,
            [np.arange(1, 401)],
        )
        assert len(planes) == 1
        np.testing.assert_allclose(refined[0][:16], 2.0, atol=1e-3)
        # Non-plane region untouched.
        np.testing.assert_array_equal(refined[0][16:], depths[0][16:])


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
