import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g4splat_tpu.core.cameras import make_camera
from g4splat_tpu.ops.depth_align import (
    affine_fit,
    depth_linear_align,
    depth_linear_align_depth_space,
    depth_linear_align_ransac,
    fit_disparity_to_depth,
    sample_disparity_at_points,
)


class TestAffineFit:
    def test_exact_recovery(self):
        rng = np.random.RandomState(0)
        s = jnp.asarray(rng.rand(500) + 0.1)
        t = 0.7 + 2.3 * s
        a, b = affine_fit(s, t, jnp.ones(500))
        assert float(a) == pytest.approx(0.7, abs=1e-5)
        assert float(b) == pytest.approx(2.3, abs=1e-5)

    def test_weights_exclude_outliers(self):
        rng = np.random.RandomState(1)
        s = jnp.asarray(rng.rand(100) + 0.1)
        t = 1.0 + 0.5 * s
        t = t.at[:10].set(99.0)  # corrupted
        w = jnp.ones(100).at[:10].set(0.0)
        a, b = affine_fit(s, t, w)
        assert float(a) == pytest.approx(1.0, abs=1e-4)
        assert float(b) == pytest.approx(0.5, abs=1e-4)


class TestDisparityAlignment:
    def test_synthetic_disparity_roundtrip(self):
        # True depth field; disparity = affine-corrupted 1/depth; the fit must
        # recover depth exactly.
        rng = np.random.RandomState(0)
        depth_gt = jnp.asarray(1.0 + 2.0 * rng.rand(32, 32))
        a_true, b_true = -0.3, 4.0
        disp = (1.0 / depth_gt - a_true) / b_true
        # Reference samples: 200 random pixels with known metric depth.
        ys = rng.randint(0, 32, 200)
        xs = rng.randint(0, 32, 200)
        ref_depth = depth_gt[ys, xs]
        sample_disp = disp[ys, xs]
        aligned, alpha, beta = fit_disparity_to_depth(
            disp, ref_depth, sample_disp, jnp.ones(200)
        )
        assert float(alpha) == pytest.approx(a_true, abs=1e-4)
        assert float(beta) == pytest.approx(b_true, abs=1e-4)
        np.testing.assert_allclose(np.asarray(aligned), np.asarray(depth_gt),
                                   rtol=1e-4)

    def test_dense_align(self):
        rng = np.random.RandomState(2)
        depth_gt = jnp.asarray(2.0 + rng.rand(16, 16))
        disp = (1.0 / depth_gt) * 3.0 + 0.1
        mask = jnp.ones((16, 16), bool).at[:4].set(False)
        aligned, _, _ = depth_linear_align(disp, depth_gt, mask)
        np.testing.assert_allclose(np.asarray(aligned), np.asarray(depth_gt),
                                   rtol=1e-4)

    def test_depth_space_align(self):
        rng = np.random.RandomState(3)
        depth_gt = jnp.asarray(2.0 + rng.rand(16, 16))
        depth_src = (depth_gt - 0.5) / 2.0
        aligned, a, b = depth_linear_align_depth_space(
            depth_src, depth_gt, jnp.ones((16, 16), bool)
        )
        assert float(b) == pytest.approx(2.0, abs=1e-4)
        np.testing.assert_allclose(np.asarray(aligned), np.asarray(depth_gt),
                                   rtol=1e-4)

    def test_ransac_rejects_outliers(self):
        rng = np.random.RandomState(4)
        src = 1.0 + rng.rand(400)
        tgt = 0.2 + 1.5 * src
        tgt[:80] += rng.rand(80) * 5 + 1  # 20% gross outliers
        aligned, a, b, ratio = depth_linear_align_ransac(
            src, tgt, np.ones(400, bool)
        )
        assert a == pytest.approx(0.2, abs=0.02)
        assert b == pytest.approx(1.5, abs=0.02)
        assert 0.7 < ratio <= 0.85

    def test_sample_at_points(self):
        cam = make_camera(jnp.eye(4), 30.0, 30.0, 15.5, 15.5, 32, 32)
        depth = jnp.full((32, 32), 2.0)
        pts = cam.backproject(depth).reshape(-1, 3)[::37]
        vals, in_fov, z = sample_disparity_at_points(depth, cam, pts)
        assert bool(jnp.all(in_fov))
        np.testing.assert_allclose(np.asarray(vals), 2.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(z), 2.0, atol=1e-4)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
