"""Integration test: the in-process pipeline flows end-to-end on a tiny
synthetic scene (posed, no pretrained priors) and writes the
reference-compatible artifact layout."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g4splat_tpu.core.cameras import lookat_camera, stack_cameras
from g4splat_tpu.models.gaussians import GaussianScene
from g4splat_tpu.ops.rasterize import render
from g4splat_tpu.pipeline.orchestrator import (
    G4SplatPipeline,
    PipelineConfig,
    Priors,
    filter_mesh_by_edge_length,
)


def synthetic_room(V=3, res=48):
    """GT scene: a colored box-ish splat cloud; render GT images + depths."""
    rng = np.random.RandomState(0)
    n = 400
    pts = np.concatenate(
        [rng.uniform(-0.8, 0.8, (n, 2)), np.full((n, 1), 0.0)], axis=1
    ).astype(np.float32)
    cols = rng.rand(n, 3).astype(np.float32)
    gt_scene = GaussianScene.from_points(
        pts, cols, scales=np.full(n, 0.08, np.float32), initial_opacity=0.9
    )
    cams = []
    for i in range(V):
        a = (i - (V - 1) / 2) * 0.35
        cams.append(
            lookat_camera([2.2 * np.sin(a), 0.25, -2.2 * np.cos(a)],
                          [0, 0, 0], [0, -1, 0], fx=float(res), fy=float(res),
                          width=res, height=res)
        )
    cameras = stack_cameras(cams)
    imgs, depths = [], []
    for i in range(V):
        cam = jax.tree.map(lambda x: x[i], cameras)
        out = render(cam, gt_scene, backend="tiled")
        imgs.append(np.asarray(out["render"]))
        d = np.array(out["surf_depth"])  # writable copy
        d[d <= 0] = 2.2  # fill background with a far plane depth
        depths.append(d)
    return cameras, np.stack(imgs), np.stack(depths)


@pytest.mark.slow
class TestPipelineIntegration:
    def test_posed_pipeline_flows(self, tmp_path):
        cameras, images, depths = synthetic_room()
        cfg = PipelineConfig(
            vis_grid_resolution=0,  # planar card scene: a faithful grid rejects all eyes
            source_path="synthetic",
            output_path=str(tmp_path),
            train_iterations=25,
            render_backend="tiled",
            select_inpaint_num=2,
            n_see3d_stages=1,
            none_visible_high=1.0,   # synthetic scene: accept any candidate
            use_multires_tsdf=True,   # cheap mesh path for the test
            tsdf_resolution=40,
            alignment_config="fast",
        )
        pipe = G4SplatPipeline(cfg, Priors())
        pipe.load_inputs(images, cameras)
        # Inject SfM outputs directly (SfM unit-tested separately): posed
        # cameras + GT depths as the "canonical" depths.
        pipe.state.prior_depths = depths.copy()
        pipe.state.depths = depths.copy()

        pipe.align_charts()
        assert os.path.exists(pipe.store.charts)
        pipe.render_chart_views()
        assert pipe.state.normals.shape == images.shape
        pipe.excavate_planes()
        assert len(pipe.state.plane_masks) == 3
        pipe.refine_plane_depths()
        assert np.isfinite(pipe.state.depths).all()
        assert os.path.exists(
            os.path.join(pipe.store.plane_root, "refine_depth_frame000000.tiff")
        )
        pipe.train_gaussians()
        assert pipe.state.scene is not None
        assert int(pipe.state.scene.num_alive) > 100
        assert os.path.exists(
            os.path.join(pipe.store.point_cloud_dir(25), "point_cloud.ply")
        )

        n_views_before = len(pipe.state.images)
        pipe.see3d_stage(1)
        assert len(pipe.state.images) > n_views_before  # views grew
        # Stage artifact zoo (render_novel_views.py:93-315): train-view
        # snapshot, per-candidate raw-gs files, selected-view depth/points.
        sdir = os.path.join(pipe.store.see3d_root, "stage1")
        assert os.path.exists(os.path.join(
            sdir, "render-train-views", "00000.png"))
        assert os.path.exists(os.path.join(
            sdir, "render-train-views", "depth_00000.tiff"))
        assert os.path.exists(os.path.join(
            sdir, "raw-gs", "ori_warp_frame000000.png"))
        assert os.path.exists(os.path.join(
            sdir, "raw-gs", "alpha_000000.npy"))
        assert os.path.exists(os.path.join(
            sdir, "select-gs", "depth_frame000000.tiff"))
        assert os.path.exists(os.path.join(
            sdir, "stage1_need_inpaint_views_points.ply"))
        pipe.refine_plane_depths()
        pipe.train_gaussians()

        renders = pipe.render_all()
        assert renders.shape[0] == 3
        mesh = pipe.extract_mesh()
        assert len(mesh.faces) > 0
        # GT mesh: the synthetic scene is a splat plane at z=0 spanning
        # [-0.8, 0.8]² — mesh eval (P17) runs against it.
        gv = np.array([[-0.8, -0.8, 0], [0.8, -0.8, 0],
                       [0.8, 0.8, 0], [-0.8, 0.8, 0]], np.float32)
        gf = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        results = pipe.evaluate(gt_images=images, gt_mesh=(gv, gf))
        assert "PSNR" in results
        assert "Chamfer-L1" in results and np.isfinite(results["Chamfer-L1"])
        # Flow test, not a quality test (25 iters at 48px): just sane output.
        assert results["PSNR"] > 8, results
        assert os.path.exists(str(tmp_path / "result_iter_25.json"))

    def test_see3d_stage_uses_multiview_unet(self, tmp_path):
        """VERDICT item 5: the orchestrator must batch ALL selected views of a
        stage jointly through the MV UNet (F > 1) with the input views pinned
        as reference frames (gt_num = input_view_num) — not one frame at a
        time with zero context."""
        from g4splat_tpu.models.gaussians import GaussianScene
        from g4splat_tpu.priors.see3d import (
            TINY_UNET, DDIMConfig, MultiViewUNet, See3DPipeline,
        )
        from g4splat_tpu.priors.vae import AutoencoderKL

        cameras, images, depths = synthetic_room()
        cfg = PipelineConfig(
            output_path=str(tmp_path), render_backend="tiled",
            vis_grid_resolution=0,  # planar card scene: a faithful grid rejects all eyes
            select_inpaint_num=2, none_visible_high=1.0,
            mvd_resolution=None,  # tiny test: run MVD at warp resolution
        )
        unet = MultiViewUNet(TINY_UNET)
        uparams = unet.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 8, 8, TINY_UNET.in_channels)),
            jnp.zeros(1, jnp.int32),
            jnp.zeros((1, 4, TINY_UNET.context_dim)), num_frames=1)
        see3d = See3DPipeline(unet, uparams, DDIMConfig(num_steps=2))
        vae = AutoencoderKL(base_ch=8, ch_mult=(1, 2), z_ch=4)
        vparams = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)))

        calls = []
        orig = see3d.inpaint_latents

        def spy(key, z, m, ctx, gt_num=0):
            calls.append((int(z.shape[0]), int(gt_num)))
            return orig(key, z, m, ctx, gt_num=gt_num)

        see3d.inpaint_latents = spy
        pipe = G4SplatPipeline(cfg, Priors(see3d=see3d, vae=(vae, vparams)))
        pipe.load_inputs(images, cameras)
        pipe.state.depths = depths.copy()
        pipe.state.prior_depths = depths.copy()
        pipe.render_chart_views()
        pipe.excavate_planes()
        rng = np.random.RandomState(0)
        pts = np.concatenate(
            [rng.uniform(-0.8, 0.8, (400, 2)), np.zeros((400, 1))], axis=1
        ).astype(np.float32)
        pipe.state.scene = GaussianScene.from_points(
            pts, rng.rand(400, 3).astype(np.float32),
            scales=np.full(400, 0.08, np.float32), initial_opacity=0.9)

        n_before = len(pipe.state.images)
        pipe.see3d_stage(1)
        n_new = len(pipe.state.images) - n_before
        assert n_new > 0
        assert len(calls) == 1, "all selected views must share ONE MVD batch"
        F, gt_num = calls[0]
        assert gt_num == 3                      # every input view pinned
        assert F == gt_num + n_new and F > 1    # refs + all warps jointly
        assert os.path.exists(os.path.join(
            pipe.store.see3d_root, "stage1", "select-gs-inpainted",
            "predict_warp_frame000000.png"))

    def test_see3d_stage_skips_when_grid_rejects_all(self, tmp_path):
        """Faithful visibility-grid gating (cam_utils.py:1060-1070): on the
        planar card scene every orbit eye AND every train-center fallback
        lies in unobserved space, so stage 1 must skip (views unchanged) —
        after writing the train-view snapshot and invisible_points.ply
        (render_novel_views.py:93-122)."""
        from g4splat_tpu.models.gaussians import GaussianScene

        cameras, images, depths = synthetic_room()
        cfg = PipelineConfig(
            output_path=str(tmp_path), render_backend="tiled",
            vis_grid_resolution=16,
            select_inpaint_num=2, none_visible_high=1.0,
        )
        pipe = G4SplatPipeline(cfg, Priors())
        pipe.load_inputs(images, cameras)
        pipe.state.depths = depths.copy()
        pipe.state.prior_depths = depths.copy()
        rng = np.random.RandomState(0)
        pts = np.concatenate(
            [rng.uniform(-0.8, 0.8, (400, 2)), np.zeros((400, 1))], axis=1
        ).astype(np.float32)
        pipe.state.scene = GaussianScene.from_points(
            pts, rng.rand(400, 3).astype(np.float32),
            scales=np.full(400, 0.08, np.float32), initial_opacity=0.9)

        n_before = len(pipe.state.images)
        pipe.see3d_stage(1)
        assert len(pipe.state.images) == n_before  # stage skipped
        sdir = os.path.join(pipe.store.see3d_root, "stage1")
        assert os.path.exists(os.path.join(
            sdir, "render-train-views", "00000.png"))
        assert os.path.exists(os.path.join(sdir, "invisible_points.ply"))
        assert not os.path.exists(os.path.join(sdir, "select-gs"))

    def test_images_to_sfm_pipeline_integration(self, tmp_path):
        """VERDICT weak #7: the one seam the reference exercises end-to-end —
        images → run_sfm (tiny MASt3R) → charts → planes → training — must
        flow without injecting GT depths."""
        from g4splat_tpu.priors.mast3r import TINY_CONFIG, MASt3RModel

        from g4splat_tpu.io import colmap as colmap_io

        cameras, images, _ = synthetic_room(V=3, res=32)
        # Source scene with a calibrated COLMAP model + dense_view.json so
        # the posed-mode writeout exercises all-sparse/0 and
        # dense-view-sparse/0 (run_mast3r.py:848-948).
        src = tmp_path / "source"
        os.makedirs(src / "sparse" / "0")
        src_cams, src_imgs = {}, {}
        for v in range(3):
            src_cams[v + 1] = colmap_io.ColmapCamera(
                v + 1, "PINHOLE", 32, 32,
                np.array([32.0, 32.0, 15.5, 15.5]))
            w2c = np.asarray(cameras.w2c[v])
            src_imgs[v + 1] = colmap_io.ColmapImage(
                v + 1, colmap_io.rotmat2qvec(w2c[:3, :3]), w2c[:3, 3],
                v + 1, f"frame_{v:06d}.png")
        colmap_io.write_model(src_cams, src_imgs, {},
                              str(src / "sparse" / "0"))
        with open(src / "dense_view.json", "w") as f:
            json.dump({"train": [0, 2]}, f)

        cfg = PipelineConfig(
            source_path=str(src), output_path=str(tmp_path),
            sfm_config="posed", train_iterations=10,
            vis_grid_resolution=0,  # planar card scene: a faithful grid rejects all eyes
            render_backend="tiled", alignment_config="fast",
        )
        model = MASt3RModel(TINY_CONFIG, init_size=32)
        pipe = G4SplatPipeline(cfg, Priors(mast3r=model))
        pipe.load_inputs(images, cameras)
        pipe.run_sfm()
        # SfM artifacts (run_mast3r.py:840-971 layout).
        sfm_root = os.path.dirname(os.path.dirname(pipe.store.sparse))
        for f in ("sparse/0/cameras.bin", "sparse/0/images.bin",
                  "points.ply", "cameras.json",
                  "pointmaps/frame_000000.json",
                  "all-sparse/0/cameras.bin", "all-sparse/0/images.txt",
                  "dense-view-sparse/0/cameras.bin"):
            assert os.path.exists(os.path.join(sfm_root, f)), f
        d_cams, d_imgs, _ = colmap_io.read_model(
            os.path.join(sfm_root, "dense-view-sparse", "0"))
        assert len(d_imgs) == 2  # the dense_view.json subset
        assert np.isfinite(pipe.state.depths).all()
        assert (pipe.state.depths > 0).all()

        pipe.align_charts()
        pipe.render_chart_views()
        pipe.excavate_planes()
        pipe.refine_plane_depths()
        pipe.train_gaussians()
        assert int(pipe.state.scene.num_alive) > 50

    def test_see3d_super_resolution_pass(self, tmp_path):
        """The optional 2x SR re-inpainting pass runs and writes SR_predict_*
        side artifacts while downstream keeps the base predictions
        (see3d_util.py:223-275 semantics)."""
        from g4splat_tpu.models.gaussians import GaussianScene
        from g4splat_tpu.priors.see3d import (
            TINY_UNET, DDIMConfig, MultiViewUNet, See3DPipeline,
        )
        from g4splat_tpu.priors.vae import AutoencoderKL

        cameras, images, depths = synthetic_room()
        cfg = PipelineConfig(
            output_path=str(tmp_path), render_backend="tiled",
            vis_grid_resolution=0,  # planar card scene: a faithful grid rejects all eyes
            select_inpaint_num=1, none_visible_high=1.0,
            mvd_resolution=16, see3d_super_resolution=True,
        )
        unet = MultiViewUNet(TINY_UNET)
        uparams = unet.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 8, 8, TINY_UNET.in_channels)),
            jnp.zeros(1, jnp.int32),
            jnp.zeros((1, 4, TINY_UNET.context_dim)), num_frames=1)
        see3d = See3DPipeline(unet, uparams, DDIMConfig(num_steps=2))
        vae = AutoencoderKL(base_ch=8, ch_mult=(1, 2), z_ch=4)
        vparams = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)))
        pipe = G4SplatPipeline(cfg, Priors(see3d=see3d, vae=(vae, vparams)))
        pipe.load_inputs(images, cameras)
        pipe.state.depths = depths.copy()
        pipe.state.prior_depths = depths.copy()
        pipe.render_chart_views()
        pipe.excavate_planes()
        rng = np.random.RandomState(0)
        pts = np.concatenate(
            [rng.uniform(-0.8, 0.8, (400, 2)), np.zeros((400, 1))], axis=1
        ).astype(np.float32)
        pipe.state.scene = GaussianScene.from_points(
            pts, rng.rand(400, 3).astype(np.float32),
            scales=np.full(400, 0.08, np.float32), initial_opacity=0.9)
        pipe.see3d_stage(1)
        inp = os.path.join(pipe.store.see3d_root, "stage1",
                           "select-gs-inpainted")
        assert os.path.exists(os.path.join(inp, "predict_warp_frame000000.png"))
        assert os.path.exists(
            os.path.join(inp, "SR_predict_warp_frame000000.png"))

    def test_eval_split_held_out_metrics(self, tmp_path):
        """VERDICT item 6: eval_split holds views out of training and
        evaluate() reports PSNR/SSIM/LPIPS on them in the reference schema
        (eval/eval.py:67-104), rendering the test split to disk."""
        from g4splat_tpu.models.gaussians import GaussianScene

        cameras, images, depths = synthetic_room(V=4)
        cfg = PipelineConfig(
            output_path=str(tmp_path), render_backend="tiled",
            train_iterations=25, eval_split=[3],
        )
        pipe = G4SplatPipeline(cfg, Priors())
        pipe.load_inputs(images, cameras)
        assert pipe.state.input_view_num == 3
        assert pipe.state.test_images.shape[0] == 1
        np.testing.assert_array_equal(pipe.state.test_images[0], images[3])

        rng = np.random.RandomState(0)
        pts = np.concatenate(
            [rng.uniform(-0.8, 0.8, (400, 2)), np.zeros((400, 1))], axis=1
        ).astype(np.float32)
        pipe.state.scene = GaussianScene.from_points(
            pts, rng.rand(400, 3).astype(np.float32),
            scales=np.full(400, 0.08, np.float32), initial_opacity=0.9)

        results = pipe.evaluate()
        assert results["test_views_num"] == 1
        for k in ("Average-PSNR", "Average-SSIM", "Average-LPIPS"):
            assert k in results and np.isfinite(results[k]), results
        assert os.path.exists(os.path.join(
            pipe.store.gaussians, "test", "ours_25", "renders", "00000.png"))
        assert os.path.exists(str(tmp_path / "result_iter_25.json"))

    def test_view_split_loader(self, tmp_path):
        from g4splat_tpu.io.splits import load_view_split

        with open(tmp_path / "split-5views.json", "w") as f:
            json.dump({"train": [4, 0, 2], "test": [3, 1]}, f)
        tr, te = load_view_split(str(tmp_path), 5)
        assert tr == [0, 2, 4] and te == [1, 3]
        with open(tmp_path / "train_test_split_7.json", "w") as f:
            json.dump({"train_ids": [1], "test_ids": [0]}, f)
        tr, te = load_view_split(str(tmp_path), 7)
        assert tr == [1] and te == [0]
        assert load_view_split(str(tmp_path), 9) is None

    def test_posed_bootstrap_batched_mono_prior(self, tmp_path):
        """Posed bootstrap with a real (tiny) DA2 attached: the batched
        view-stack disparity path (one ViT dispatch, view axis sharded over
        the 8-device virtual mesh) must produce per-view median-scaled
        depths exactly like the reference's per-view loop."""
        from g4splat_tpu.priors.depth_anything import DepthAnything

        cameras, images, _ = synthetic_room()
        cfg = PipelineConfig(
            output_path=str(tmp_path), render_backend="tiled",
            sfm_config="posed",
        )
        pipe = G4SplatPipeline(
            cfg, Priors(depth_model=DepthAnything("vits", input_size=56)))
        pipe.load_inputs(images, cameras)
        pipe.run_sfm()  # posed bootstrap (no MASt3R): DA2 prior depths
        d = pipe.state.prior_depths
        assert d.shape == images.shape[:3]
        assert np.isfinite(d).all() and (d > 0).all()
        # Per-view median equals the camera extent (the bootstrap's scaling).
        from g4splat_tpu.pipeline.mesh_extraction import cameras_spatial_extent
        extent = max(cameras_spatial_extent(pipe.state.cameras), 1e-3)
        med = np.median(d.reshape(d.shape[0], -1), axis=1)
        np.testing.assert_allclose(med, extent, rtol=1e-3)

    def test_resume_from_artifacts(self, tmp_path):
        """Stage re-entry (SURVEY §5.3): a fresh pipeline object rebuilds
        its state from the artifact store and reports which stages are
        complete — the counterpart of rerunning a reference stage script
        against upstream files."""
        cameras, images, depths = synthetic_room()
        cfg = PipelineConfig(
            output_path=str(tmp_path), render_backend="tiled",
            sfm_config="posed", train_iterations=20,
            vis_grid_resolution=0,  # planar card scene: a faithful grid rejects all eyes
        )
        pipe = G4SplatPipeline(cfg, Priors())
        pipe.load_inputs(images, cameras)
        pipe.run_sfm()           # posed bootstrap (no MASt3R needed)
        pipe.state.depths = depths.copy()
        pipe.state.prior_depths = depths.copy()
        pipe.render_chart_views()
        pipe.excavate_planes()
        pipe.refine_plane_depths()
        pipe.train_gaussians()

        fresh = G4SplatPipeline(cfg, Priors())
        done = fresh.resume_from_artifacts()
        assert done["sfm"] and done["chart_views"] and done["planes"]
        assert done["refine"] and done["train"]
        assert not done["see3d_1"]
        st = fresh.state
        assert st.input_view_num == 3
        np.testing.assert_allclose(st.images, pipe.state.images, atol=1/255)
        np.testing.assert_allclose(st.depths, pipe.state.depths, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(st.cameras.w2c), np.asarray(pipe.state.cameras.w2c),
            atol=1e-5)
        assert len(st.plane_masks) == 3
        assert st.scene is not None
        assert int(st.scene.num_alive) == int(pipe.state.scene.num_alive)
        # The resumed state is actionable: render a view from it.
        from g4splat_tpu.ops.rasterize import render as _render
        cam0 = jax.tree.map(lambda x: x[0], st.cameras)
        out = _render(cam0, st.scene, backend="tiled")
        assert np.isfinite(np.asarray(out["render"])).all()

    def test_mesh_filter(self):
        from g4splat_tpu.pipeline.mesh_extraction import ExtractedMesh

        v = np.array([[0, 0, 0], [0.1, 0, 0], [0, 0.1, 0], [5, 5, 5]],
                     np.float32)
        f = np.array([[0, 1, 2], [0, 1, 3]], np.int32)
        m = filter_mesh_by_edge_length(ExtractedMesh(v, f, None), 0.5)
        assert len(m.faces) == 1


class TestCLI:
    def test_parser_reference_flags(self):
        from g4splat_tpu.cli import build_parser

        p = build_parser()
        args = p.parse_args([
            "-s", "data/scene", "-o", "out", "--sfm_config", "posed",
            "--use_view_config", "--config_view_num", "5",
            "--select_inpaint_num", "10", "--tetra_downsample_ratio", "0.25",
        ])
        assert args.sfm_config == "posed"
        assert args.config_view_num == 5
        assert args.tetra_downsample_ratio == 0.25


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
