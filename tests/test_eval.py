import jax.numpy as jnp
import numpy as np
import pytest

from g4splat_tpu.eval.image_metrics import (
    LPIPS,
    evaluate_images,
    init_lpips_params,
    lpips,
)
from g4splat_tpu.eval.mesh_metrics import (
    evaluate_mesh,
    sample_mesh_surface,
    voxel_downsample,
)


def unit_cube_mesh(offset=0.0, scale=1.0):
    v = np.array([
        [0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
        [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1],
    ], np.float32) * scale + offset
    f = np.array([
        [0, 2, 1], [1, 2, 3], [4, 5, 6], [5, 7, 6],
        [0, 1, 4], [1, 5, 4], [2, 6, 3], [3, 6, 7],
        [0, 4, 2], [2, 4, 6], [1, 3, 5], [3, 7, 5],
    ], np.int32)
    return v, f


class TestMeshMetrics:
    def test_identical_meshes(self):
        v, f = unit_cube_mesh()
        # Denser sampling: subdivide by sampling the surface as "vertices".
        pts, _ = sample_mesh_surface(v, f, 5000)
        m = evaluate_mesh(pts, f, pts, f, down_sample=0.02)
        assert m["Chamfer-L1"] == pytest.approx(0.0, abs=1e-6)
        assert m["F-score"] == pytest.approx(100.0)

    def test_shifted_mesh_chamfer(self):
        v, f = unit_cube_mesh()
        p1, _ = sample_mesh_surface(v, f, 20000, seed=0)
        p2 = p1 + np.array([0.1, 0, 0])
        m = evaluate_mesh(p1, None, p2, None, threshold=0.05, down_sample=0.0)
        # Chamfer between shifted clouds ≈ something < 10cm but > 0.
        assert 1.0 < m["Chamfer-L1"] < 10.0
        assert m["F-score"] < 100.0

    def test_normal_consistency_same_mesh(self):
        v, f = unit_cube_mesh()
        m = evaluate_mesh(v, f, v, f, down_sample=0.0, n_normal_samples=5000)
        # Not exactly 100: independent sample sets pair across edges where
        # adjacent cube faces meet (perpendicular normals).
        assert m["Normal-Consistency"] == pytest.approx(100.0, abs=5.0)
        assert m["Chamfer-L1"] == pytest.approx(0.0, abs=1e-6)

    def test_voxel_downsample(self):
        pts = np.random.RandomState(0).rand(1000, 3)
        down = voxel_downsample(pts, 0.25)
        assert len(down) <= 4 ** 3
        assert len(down) > 20


class TestImageMetrics:
    def test_lpips_zero_for_identical(self):
        params = init_lpips_params(seed=0)
        img = jnp.asarray(np.random.RandomState(0).rand(64, 64, 3))
        assert float(lpips(params, img, img)) == pytest.approx(0.0, abs=1e-6)

    def test_lpips_positive_and_monotone(self):
        model = LPIPS(seed=0)
        rng = np.random.RandomState(0)
        img = rng.rand(64, 64, 3).astype(np.float32)
        small = np.clip(img + rng.randn(64, 64, 3) * 0.02, 0, 1)
        big = np.clip(img + rng.randn(64, 64, 3) * 0.3, 0, 1)
        d_small = model(img, small)
        d_big = model(img, big)
        assert 0 < d_small < d_big

    def test_evaluate_images(self):
        rng = np.random.RandomState(1)
        gts = rng.rand(3, 32, 32, 3).astype(np.float32)
        renders = np.clip(gts + rng.randn(3, 32, 32, 3) * 0.05, 0, 1)
        out = evaluate_images(renders, gts)
        assert 20 < out["PSNR"] < 35
        assert 0.3 < out["SSIM"] <= 1.0

    def test_torch_checkpoint_conversion_shapes(self):
        # Synthesize a torch-layout state dict and convert.
        from g4splat_tpu.eval.image_metrics import (
            TAP_CHANNELS,
            load_torch_lpips_weights,
        )

        tv_conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
        chans = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
        vgg_state = {}
        cin = 3
        for idx, cout in zip(tv_conv_idx, chans):
            vgg_state[f"features.{idx}.weight"] = np.zeros((cout, cin, 3, 3))
            vgg_state[f"features.{idx}.bias"] = np.zeros(cout)
            cin = cout
        lpips_state = {
            f"lin{i}.model.1.weight": np.ones((1, ch, 1, 1))
            for i, ch in enumerate(TAP_CHANNELS)
        }
        params = load_torch_lpips_weights(vgg_state, lpips_state)
        img = jnp.zeros((32, 32, 3))
        val = lpips(params, img, img)
        assert float(val) == pytest.approx(0.0, abs=1e-6)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
