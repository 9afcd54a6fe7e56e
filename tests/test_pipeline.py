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


class TestPipelineIntegration:
    def test_posed_pipeline_flows(self, tmp_path):
        cameras, images, depths = synthetic_room()
        cfg = PipelineConfig(
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
        pipe.refine_plane_depths()
        pipe.train_gaussians()

        renders = pipe.render_all()
        assert renders.shape[0] == 3
        mesh = pipe.extract_mesh()
        assert len(mesh.faces) > 0
        results = pipe.evaluate(gt_images=images)
        assert "PSNR" in results
        # Flow test, not a quality test (25 iters at 48px): just sane output.
        assert results["PSNR"] > 8, results
        assert os.path.exists(str(tmp_path / "result_iter_25.json"))

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
