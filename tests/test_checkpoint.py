import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g4splat_tpu.train.checkpoint import load_trainer_state, save_trainer_state
from g4splat_tpu.train.trainer import TrainConfig, Trainer


def make_trainer():
    import sys

    sys.path.insert(0, "tests")
    from test_train import make_synthetic_problem

    from g4splat_tpu.models.gaussians import GaussianScene

    gt, cameras, views = make_synthetic_problem(n_views=2, res=24, n_gauss=20)
    init = GaussianScene.from_points(
        np.asarray(gt.xyz), np.full((20, 3), 0.5, np.float32), capacity=32,
        scales=np.full(20, 0.15, np.float32),
    )
    cfg = TrainConfig(
        iterations=20, densify_from_iter=10_000, opacity_reset_interval=10_000,
        use_mip_filter=False, use_depth_order=False, backend="tiled",
        sh_increase_interval=10_000,
    )
    return Trainer(init, cameras, views, cfg)


class TestCheckpoint:
    @pytest.mark.slow
    def test_exact_resume(self, tmp_path):
        t1 = make_trainer()
        for _ in range(5):
            t1.step()
        p = str(tmp_path / "ckpt.npz")
        save_trainer_state(p, t1)
        xyz_at_5 = np.asarray(t1.scene.xyz).copy()
        opa_at_5 = np.asarray(t1.scene.opacity_raw).copy()

        # Fresh trainer, restore → exact state at iteration 5.
        t2 = make_trainer()
        load_trainer_state(p, t2)
        assert t2.iteration == 5
        np.testing.assert_allclose(np.asarray(t2.scene.xyz), xyz_at_5,
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray(t2.scene.opacity_raw), opa_at_5,
                                   atol=1e-7)
        # Training continues cleanly from the restored state.
        for _ in range(3):
            m2 = t2.step()
        assert np.isfinite(m2["loss"])
        assert t2.iteration == 8

    def test_capacity_mismatch_rejected(self, tmp_path):
        t1 = make_trainer()
        t1.step()
        p = str(tmp_path / "ckpt.npz")
        save_trainer_state(p, t1)
        t2 = make_trainer()
        from g4splat_tpu.train.densify import compact_and_grow

        t2.scene = compact_and_grow(t2.scene, 64)
        with pytest.raises(AssertionError):
            load_trainer_state(p, t2)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
