import numpy as np
import pytest
from scipy.spatial import cKDTree

from g4splat_tpu import native


@pytest.fixture(scope="module")
def pts():
    return np.random.RandomState(0).rand(3000, 3).astype(np.float32)


class TestNative:
    def test_builds(self):
        # The native lib should build in this environment; the fallback path
        # is exercised implicitly by other platforms.
        assert native.available()

    def test_knn_matches_scipy(self, pts):
        qs = np.random.RandomState(1).rand(200, 3).astype(np.float32)
        d, i = native.knn(pts, qs, 5)
        dr, ir = cKDTree(pts).query(qs, k=5)
        np.testing.assert_allclose(d, dr, atol=1e-5)
        assert (i == ir).mean() > 0.999  # ties may reorder

    def test_mean3nn_matches(self, pts):
        m3 = native.mean_knn3_sq_dist(pts)
        dd, _ = cKDTree(pts).query(pts, k=4)
        ref = (dd[:, 1:] ** 2).mean(1)
        np.testing.assert_allclose(m3, ref, rtol=1e-4)

    def test_voxel_downsample(self, pts):
        out = native.voxel_downsample(pts, 0.25)
        assert 30 <= len(out) <= 64
        # Each output is a voxel mean → inside the unit cube.
        assert out.min() >= 0 and out.max() <= 1

    def test_morton_locality(self, pts):
        codes = native.morton_codes(pts)
        order = np.argsort(codes)
        sorted_pts = pts[order]
        # Z-order neighbors are spatially close on average.
        step = np.linalg.norm(np.diff(sorted_pts, axis=0), axis=1)
        rand_step = np.linalg.norm(
            pts[np.random.RandomState(2).permutation(len(pts))][1:]
            - pts[:-1], axis=1,
        )
        assert step.mean() < 0.5 * rand_step.mean()

    def test_eval_uses_native(self, pts):
        from g4splat_tpu.eval.mesh_metrics import evaluate_mesh

        m = evaluate_mesh(pts, None, pts + 0.01, None, down_sample=0.0)
        assert m["Chamfer-L1"] < 2.0


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
