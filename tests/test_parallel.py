import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g4splat_tpu.parallel.mesh import (
    data_parallel_train_step,
    make_mesh,
    replicate,
    shard_batch,
    view_parallel_render,
)

# The DP-equivalence test aborts inside XLA:CPU when run after ~15 other
# test modules in one interpreter (accumulated runtime state; it passes
# standalone). Under the full suite, re-exec it in a fresh interpreter.
_ISOLATED = os.environ.get("G4_TEST_PARALLEL_DIRECT") == "1"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestDataParallel:
    @pytest.mark.slow
    def test_dp_train_step_pallas_interpret(self):
        """backend="pallas" under shard_map (interpret mode on CPU): guards
        the check_vma wiring the on-chip smoke hit (pallas_call outputs
        carry no vma; scripts/smoke_pallas_mesh.py runs this on the real
        chip)."""
        import __graft_entry__ as ge

        from g4splat_tpu.train.trainer import (
            TrainConfig, make_optimizer, scene_params)

        mesh = make_mesh(n_data=2, devices=jax.devices()[:2])
        scene, cameras, views = ge._tiny_problem(
            n_gauss=64, n_views=2, res=32, capacity=128)
        views["scale_factor"] = jnp.full((2,), 10.0)
        cfg = TrainConfig(
            use_mip_filter=False, use_depth_order=False, backend="pallas",
            lambda_dist=10.0, distortion_from=0, normal_consistency_from=0,
        )
        optimizer = make_optimizer(cfg)
        opt_state = optimizer.init(scene_params(scene))
        scene_r = replicate(mesh, scene)
        opt_state = replicate(mesh, opt_state)
        cameras_s = shard_batch(mesh, cameras)
        views_s = shard_batch(mesh, views)
        step = data_parallel_train_step(mesh, cfg, optimizer)
        scene2, _, loss = step(scene_r, opt_state, cameras_s, views_s,
                               jnp.asarray(1), jax.random.PRNGKey(0))
        assert np.isfinite(float(loss))
        assert float(jnp.abs(scene2.xyz - scene_r.xyz).max()) > 0

    @pytest.mark.slow
    def test_dp_step_matches_single_device(self):
        if not _ISOLATED:
            env = dict(os.environ, G4_TEST_PARALLEL_DIRECT="1")
            r = subprocess.run(
                [sys.executable, "-m", "pytest", __file__, "-x", "-q",
                 "-k", "dp_step_matches"],
                env=env, capture_output=True, text=True, timeout=1200,
            )
            assert r.returncode == 0, r.stdout[-4000:] + r.stderr[-4000:]
            return
        self._run_dp_equivalence()

    def _run_dp_equivalence(self):
        import __graft_entry__ as ge

        from g4splat_tpu.train.trainer import (
            TrainConfig,
            compute_losses,
            make_optimizer,
            scene_params,
            with_params,
        )
        import optax

        scene, cameras, views = ge._tiny_problem(n_views=8)
        views["scale_factor"] = jnp.full((8,), 10.0)
        cfg = TrainConfig(
            use_mip_filter=False, use_depth_order=False, backend="tiled",
            lambda_dist=10.0, distortion_from=0, normal_consistency_from=0,
        )
        optimizer = make_optimizer(cfg)
        opt_state = optimizer.init(scene_params(scene))

        # Single-device reference: mean loss/grads over all 8 views.
        def loss_fn(params):
            s = with_params(scene, params)
            total = 0.0
            for i in range(8):
                cam = jax.tree.map(lambda x: x[i], cameras)
                view = {k: v[i] if v.ndim else v for k, v in views.items()}
                l, _ = compute_losses(
                    s, cam, view, cfg, jnp.asarray(1),
                    jax.random.fold_in(jax.random.PRNGKey(0), i),
                    jnp.zeros((s.capacity, 2)),
                )
                total += l
            return total / 8

        ref_loss, ref_grads = jax.value_and_grad(loss_fn)(scene_params(scene))

        # 8-way data parallel.
        mesh = make_mesh(n_data=8)
        scene_r = replicate(mesh, scene)
        opt_r = replicate(mesh, opt_state)
        cams_s = shard_batch(mesh, cameras)
        views_s = shard_batch(mesh, views)
        step = data_parallel_train_step(mesh, cfg, optimizer)
        scene2, opt2, loss = step(
            scene_r, opt_r, cams_s, views_s, jnp.asarray(1),
            jax.random.PRNGKey(0),
        )
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)

        # Params after the DP update equal the single-device update.
        import optax as _optax

        updates, _ = optimizer.update(ref_grads, opt_state,
                                      scene_params(scene))
        ref_params = _optax.apply_updates(scene_params(scene), updates)
        np.testing.assert_allclose(
            np.asarray(scene2.xyz), np.asarray(ref_params["xyz"]), atol=1e-5
        )

    @pytest.mark.slow
    def test_dp_training_with_densify_matches_mesh1(self):
        """VERDICT item 4: the full DP training step (grads pmean'd AND
        densify stats psum'd) is invariant to the mesh size, so a subsequent
        densify/prune produces the identical scene."""
        if not _ISOLATED:
            env = dict(os.environ, G4_TEST_PARALLEL_DIRECT="1")
            r = subprocess.run(
                [sys.executable, "-m", "pytest", __file__, "-x", "-q",
                 "-k", "dp_training_with_densify"],
                env=env, capture_output=True, text=True, timeout=1200,
            )
            assert r.returncode == 0, r.stdout[-4000:] + r.stderr[-4000:]
            return
        self._run_dp_densify_equivalence()

    def _run_dp_densify_equivalence(self):
        import __graft_entry__ as ge

        from g4splat_tpu.train.densify import DensifyState, densify_and_prune
        from g4splat_tpu.train.trainer import (
            TrainConfig,
            make_dp_train_step,
            make_optimizer,
            scene_params,
        )

        cfg = TrainConfig(
            use_mip_filter=False, use_depth_order=False, backend="tiled",
            densify_from_iter=0, densify_until_iter=10_000,
            densify_grad_threshold=1e-7,   # low → clones/splits actually fire
        )
        optimizer = make_optimizer(cfg)
        dens = jax.jit(densify_and_prune, static_argnames=("max_screen_size",))

        results = []
        for n_data in (1, 8):
            # Fresh (deterministic) inputs per mesh size: the DP step donates
            # its scene/opt/dstate buffers.
            scene, cameras, views = ge._tiny_problem(n_views=8)
            views["scale_factor"] = jnp.full((8,), 10.0)
            mesh = make_mesh(n_data=n_data, devices=jax.devices()[:n_data])
            step = make_dp_train_step(mesh, cfg, optimizer)
            s = replicate(mesh, scene)
            o = replicate(mesh, optimizer.init(scene_params(scene)))
            d = replicate(mesh, DensifyState.zero(scene.capacity))
            s2, o2, d2, m = step(
                s, o, d, shard_batch(mesh, cameras), shard_batch(mesh, views),
                jnp.asarray(1), jax.random.PRNGKey(0),
            )
            s3, _, _, report = dens(
                jax.random.PRNGKey(7), s2, d2, 1.0,
                cfg.densify_grad_threshold, 0.05, 0.0, cfg.percent_dense,
            )
            results.append((np.asarray(d2.grad_accum), np.asarray(d2.denom),
                            np.asarray(s3.xyz), np.asarray(s3.alive),
                            float(m["loss"]), report))
        a, b = results
        np.testing.assert_allclose(a[4], b[4], rtol=1e-4)        # loss
        # The screen-grad statistic is a catastrophically-cancelling
        # scatter-add sum: XLA's f32 accumulation order differs between the
        # 1- and 8-device SPMD modules, so it is mesh-invariant only up to
        # an ABSOLUTE reassociation floor (~1e-3 here; primal drift is 2e-6,
        # verified A/B/C/C2 ablation 2026-08-17). Decisions downstream are
        # insensitive: hot/cold flips need a sign change, and the stat is a
        # norm ≥ 0.
        np.testing.assert_allclose(a[0], b[0], atol=8e-3)        # psum'd stats
        np.testing.assert_allclose(a[1], b[1], atol=0)           # denom counts
        # Adam's bias-corrected first step is ~sign(g)·lr, so a reassociation
        # sign flip on a near-zero cancelling grad component moves a param by
        # up to 2·lr (scaling_lr 5e-3 feeds split-child positions).
        np.testing.assert_allclose(a[2], b[2], atol=2e-2)        # densified xyz
        np.testing.assert_array_equal(a[3], b[3])                # alive masks
        n_new = int(results[0][5].n_cloned) + int(results[0][5].n_split)
        assert n_new > 0, "densify never fired — test is vacuous"

    @pytest.mark.slow
    def test_trainer_dp_mode_smoke(self):
        if not _ISOLATED:
            env = dict(os.environ, G4_TEST_PARALLEL_DIRECT="1")
            r = subprocess.run(
                [sys.executable, "-m", "pytest", __file__, "-x", "-q",
                 "-k", "trainer_dp_mode"],
                env=env, capture_output=True, text=True, timeout=1200,
            )
            assert r.returncode == 0, r.stdout[-4000:] + r.stderr[-4000:]
            return
        import __graft_entry__ as ge

        from g4splat_tpu.train.trainer import TrainConfig, Trainer, ViewData

        scene, cameras, views = ge._tiny_problem(n_views=8)
        vd = ViewData(
            image=views["image"], prior_depth=views["prior_depth"],
            prior_normal=views["prior_normal"],
            prior_curv=views["prior_curv"], confidence=views["confidence"],
            color_weight=views["color_weight"], scale_factor=jnp.asarray(10.0),
        )
        cfg = TrainConfig(
            use_mip_filter=True, use_depth_order=False, backend="tiled",
            densify_from_iter=0, densification_interval=2,
            densify_until_iter=1000, densify_grad_threshold=1e-7,
            opacity_reset_interval=2,
        )
        mesh = make_mesh(n_data=8)
        tr = Trainer(scene, cameras, vd, cfg, mesh=mesh)
        hist = tr.train(2, log_every=1)
        assert len(hist) == 2
        assert all(np.isfinite(h["loss"]) for h in hist), hist
        assert int(tr.scene.num_alive) > 0

    @pytest.mark.slow
    def test_slab_compose_matches_single_render(self):
        """Gaussian-buffer sharding algebra (SURVEY §5.7): depth-slab
        partials composed per-pixel must reproduce the single-buffer render
        exactly (color/alpha/depth/normal/distortion; median via the
        crossing slab)."""
        from g4splat_tpu.core.cameras import lookat_camera
        from g4splat_tpu.models.gaussians import GaussianScene
        from g4splat_tpu.ops.rasterize import render
        from g4splat_tpu.ops.rasterize_common import RenderConfig
        from g4splat_tpu.parallel.gaussian_shard import (
            compose_slabs,
            partition_by_view_depth,
            slab_maps_from_render,
        )

        rng = np.random.RandomState(7)
        n = 300
        scene = GaussianScene.from_points(
            rng.uniform(-1, 1, (n, 3)).astype(np.float32),
            rng.rand(n, 3).astype(np.float32),
            scales=np.exp(rng.uniform(-2.8, -1.8, n)).astype(np.float32),
            quats=rng.randn(n, 4).astype(np.float32),
            initial_opacity=0.75,
        )
        cam = lookat_camera([0.3, 0.2, -3.0], [0, 0, 0], [0, -1, 0],
                            fx=40.0, fy=40.0, width=32, height=32)
        bg = jnp.asarray([0.2, 0.1, 0.3])
        ref = render(cam, scene, config=RenderConfig(bg=bg), backend="tiled")

        slabs = partition_by_view_depth(scene, cam, 4)
        maps = jnp.stack([
            slab_maps_from_render(render(
                cam, s, config=RenderConfig(bg=jnp.zeros(3)),
                backend="tiled"))
            for s in slabs
        ])
        out = compose_slabs(maps, bg)
        np.testing.assert_allclose(np.asarray(out["render"]),
                                   np.asarray(ref["render"]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out["rend_alpha"]),
                                   np.asarray(ref["rend_alpha"]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out["rend_normal"]),
                                   np.asarray(ref["rend_normal"]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out["rend_depth"]),
                                   np.asarray(ref["rend_depth"]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(out["rend_dist"]),
                                   np.asarray(ref["rend_dist"]),
                                   atol=1e-5)
        # Median: exact where the T=0.5 crossing happens in slab 0 (its
        # incoming T is exactly 1) and where T never crosses (last
        # contributor everywhere); only deeper-slab crossings carry the
        # documented threshold skew.
        med_err = np.abs(np.asarray(out["depth_median"])
                         - np.asarray(ref["depth_median"]))
        slab0_alpha = np.asarray(maps[0, ..., 7])
        exact_px = (slab0_alpha >= 0.5) | (np.asarray(ref["rend_alpha"]) < 0.5)
        assert exact_px.mean() > 0.3, "test scene too deep to be meaningful"
        assert (med_err[exact_px] < 1e-4).all()
        assert np.mean(med_err < 1e-4) > 0.7, np.mean(med_err < 1e-4)

    @pytest.mark.slow
    def test_render_gaussian_sharded_on_mesh(self):
        from g4splat_tpu.core.cameras import lookat_camera
        from g4splat_tpu.models.gaussians import GaussianScene
        from g4splat_tpu.ops.rasterize import render
        from g4splat_tpu.ops.rasterize_common import RenderConfig
        from g4splat_tpu.parallel.gaussian_shard import (
            partition_by_view_depth,
            render_gaussian_sharded,
        )

        rng = np.random.RandomState(9)
        n = 200
        scene = GaussianScene.from_points(
            rng.uniform(-1, 1, (n, 3)).astype(np.float32),
            rng.rand(n, 3).astype(np.float32),
            scales=np.full(n, 0.1, np.float32),
            initial_opacity=0.8,
        )
        cam = lookat_camera([0, 0, -3.0], [0, 0, 0], [0, -1, 0],
                            fx=40.0, fy=40.0, width=32, height=32)
        mesh = make_mesh(n_data=2, n_model=4)
        slabs = partition_by_view_depth(scene, cam, 4)
        out = render_gaussian_sharded(mesh, slabs, cam, backend="tiled")
        ref = render(cam, scene, config=RenderConfig(), backend="tiled")
        np.testing.assert_allclose(np.asarray(out["render"]),
                                   np.asarray(ref["render"]), atol=5e-5)
        np.testing.assert_allclose(np.asarray(out["rend_alpha"]),
                                   np.asarray(ref["rend_alpha"]), atol=5e-5)

    def test_shard_batch_places_across_devices(self):
        mesh = make_mesh(n_data=8)
        x = jnp.arange(16.0).reshape(16, 1)
        xs = shard_batch(mesh, x)
        assert len(xs.sharding.device_set) == 8

    def test_view_parallel_render_matches_sequential(self):
        from g4splat_tpu.core.cameras import lookat_camera, stack_cameras
        from g4splat_tpu.models.gaussians import GaussianScene
        from g4splat_tpu.ops.rasterize import render

        rng = np.random.RandomState(3)
        n = 96
        scene = GaussianScene.from_points(
            rng.uniform(-1, 1, (n, 3)).astype(np.float32),
            rng.rand(n, 3).astype(np.float32),
            scales=np.full(n, 0.12, np.float32),
            initial_opacity=0.8,
        )
        cams = [
            lookat_camera(
                [1.8 * np.sin(a), 0.1, -1.8 * np.cos(a)], [0, 0, 0],
                [0, -1, 0], fx=40.0, fy=40.0, width=32, height=32,
            )
            for a in np.linspace(0, 1.5, 8)
        ]
        cameras = stack_cameras(cams)
        mesh = make_mesh(n_data=8)
        scene_r = replicate(mesh, scene)
        cams_s = shard_batch(mesh, cameras)
        out = view_parallel_render(mesh, scene_r, cams_s, backend="tiled")
        assert out["render"].shape == (8, 32, 32, 3)
        for i in (0, 3, 7):
            ref = render(cams[i], scene, backend="tiled")
            np.testing.assert_allclose(
                np.asarray(out["render"][i]), np.asarray(ref["render"]),
                atol=2e-4,
            )
            np.testing.assert_allclose(
                np.asarray(out["surf_depth"][i]),
                np.asarray(ref["surf_depth"]), atol=2e-3,
            )

    def test_view_parallel_render_rejects_indivisible(self):
        from g4splat_tpu.core.cameras import lookat_camera, stack_cameras
        from g4splat_tpu.models.gaussians import GaussianScene

        scene = GaussianScene.from_points(
            np.zeros((4, 3), np.float32), np.ones((4, 3), np.float32),
            scales=np.full(4, 0.1, np.float32),
        )
        cams = [
            lookat_camera([0, 0, -2], [0, 0, 0], [0, -1, 0],
                          fx=20.0, fy=20.0, width=16, height=16)
            for _ in range(3)
        ]
        mesh = make_mesh(n_data=8)
        with pytest.raises(ValueError, match="divide"):
            view_parallel_render(mesh, scene, stack_cameras(cams))


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestTileParallel:
    @pytest.mark.slow
    def test_tile_parallel_render_matches_full_frame(self):
        """Strip-sharded megapixel path: each device renders a band of tile
        rows through an exactly-equivalent cropped camera; the assembled
        image must match the full-frame single-device render, including
        splats whose footprint crosses strip seams, and surf_normal must be
        recomputed globally (seam rows use cross-strip neighbors)."""
        from g4splat_tpu.core.cameras import lookat_camera
        from g4splat_tpu.models.gaussians import GaussianScene
        from g4splat_tpu.ops.rasterize import render
        from g4splat_tpu.parallel.mesh import tile_parallel_render

        rng = np.random.RandomState(7)
        n = 160
        scene = GaussianScene.from_points(
            rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32),
            rng.rand(n, 3).astype(np.float32),
            # Mix of small and strip-crossing footprints.
            scales=np.where(np.arange(n) % 5 == 0, 0.35, 0.08
                            ).astype(np.float32),
            initial_opacity=0.75,
        )
        # H=72: 5 tile rows over 8 devices -> rows_per=1, strips of 16 px,
        # three all-padding strips at the bottom.
        cam = lookat_camera([0.0, 0.2, -2.6], [0, 0, 0], [0, -1, 0],
                            fx=55.0, fy=55.0, width=48, height=72)
        mesh = make_mesh(n_data=8)
        out = tile_parallel_render(
            mesh, replicate(mesh, scene), replicate(mesh, cam),
            backend="tiled",
            keys=("render", "rend_alpha", "surf_depth", "surf_normal"),
        )
        ref = render(cam, scene, backend="tiled")
        assert out["render"].shape == (72, 48, 3)
        for k in ("render", "rend_alpha", "surf_depth", "surf_normal"):
            np.testing.assert_allclose(
                np.asarray(out[k]), np.asarray(ref[k]), atol=3e-4,
                err_msg=k)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
class TestSlabShardedTraining:
    """make_slab_sharded_train_step must reproduce the single-device
    train_step exactly (same view, same key, same iteration): splat-buffer
    sharding is the quality-preserving multi-chip training mode (the DP
    alternative measured −11 dB, logs/ab_dp_r05.json)."""

    @pytest.mark.slow
    def test_matches_single_device_step(self):
        import __graft_entry__ as ge

        from g4splat_tpu.parallel.gaussian_shard import (
            make_slab_sharded_train_step,
            view_depth_permutations,
        )
        from g4splat_tpu.train import trainer as T
        from g4splat_tpu.train.densify import DensifyState

        cfg = T.TrainConfig(
            use_mip_filter=False, backend="tiled", lambda_dist=10.0,
            distortion_from=0, normal_consistency_from=0,
            raster_buf_auto=False,
        )
        optimizer = T.make_optimizer(cfg)
        it = jnp.asarray(600)            # inside the densify window
        key = jax.random.PRNGKey(7)

        def view0(views):
            return {
                "image": views["image"][0],
                "prior_depth": views["prior_depth"][0],
                "prior_normal": views["prior_normal"][0],
                "prior_curv": views["prior_curv"][0],
                "confidence": views["confidence"][0],
                "color_weight": views["color_weight"][0],
                "scale_factor": views["scale_factor"],
            }

        # Single-device reference (fresh problem: train_step donates args).
        scene, cameras, views = ge._tiny_problem(n_views=4, capacity=128)
        cam0 = jax.tree.map(lambda x: x[0], cameras)
        opt_state = optimizer.init(T.scene_params(scene))
        dstate = DensifyState.zero(scene.capacity)
        ref_scene, _, ref_dstate, ref_m = T.train_step(
            scene, opt_state, dstate, cam0, view0(views), it, key, cfg,
            optimizer,
        )

        # 4-way slab-sharded step over the model axis.
        scene, cameras, views = ge._tiny_problem(n_views=4, capacity=128)
        mesh = make_mesh(n_data=1, n_model=4)
        opt_state = optimizer.init(T.scene_params(scene))
        dstate = DensifyState.zero(scene.capacity)
        perms = view_depth_permutations(scene, cameras)
        perm = perms[0]
        inv_perm = jnp.argsort(perm).astype(jnp.int32)
        step = make_slab_sharded_train_step(mesh, cfg, optimizer)
        s2, _, d2, m2 = step(
            replicate(mesh, scene), replicate(mesh, opt_state),
            replicate(mesh, dstate), cam0, view0(views), it, key, perm,
            inv_perm,
        )

        # Every composed channel is algebraically exact except median
        # depth: the T=0.5 crossing is resolved within the crossing slab
        # against its LOCAL transmittance (gaussian_shard.py module
        # docstring), so with depth_ratio=0.5 the surf_depth gradient can
        # route to a neighboring entry on crossing pixels. Contract: loss
        # within 1e-3 rel, ≥98% of parameter updates bit-tight, the rest
        # bounded (the handful of median-boundary splats).
        np.testing.assert_allclose(float(m2["loss"]), float(ref_m["loss"]),
                                   rtol=1e-3)
        for name, a, b in [
            ("xyz", s2.xyz, ref_scene.xyz),
            ("opacity_raw", s2.opacity_raw, ref_scene.opacity_raw),
        ]:
            diff = np.abs(np.asarray(a) - np.asarray(b))
            assert diff.max() < 1e-3, (name, diff.max())
            assert (diff > 1e-5).mean() < 0.02, (
                name, (diff > 1e-5).mean())
        # Densification statistics must match too (screen-grad accumulation
        # flows through the slab gather + all_gather transpose).
        np.testing.assert_allclose(np.asarray(d2.grad_accum),
                                   np.asarray(ref_dstate.grad_accum),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(d2.max_radii2d),
                                   np.asarray(ref_dstate.max_radii2d),
                                   atol=1e-3)
