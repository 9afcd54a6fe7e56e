import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g4splat_tpu.core.cameras import (
    interpolate_cameras,
    lookat_camera,
    stack_cameras,
)


def ring_cameras(V=3, res=32):
    cams = []
    for i in range(V):
        a = (i - 1) * 0.4
        cams.append(
            lookat_camera([2 * np.sin(a), 0.1, -2 * np.cos(a)], [0, 0, 0],
                          [0, -1, 0], fx=float(res), fy=float(res),
                          width=res, height=res)
        )
    return stack_cameras(cams)


class TestInterpolateCameras:
    def test_count_and_validity(self):
        cams = ring_cameras()
        interp = interpolate_cameras(cams, n_neighbors=2, n_per_neighbor=4)
        assert interp.w2c.shape[0] == 3 * 2 * 4
        R = np.asarray(interp.w2c)[:, :3, :3]
        eye = np.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (24, 1, 1)),
                                   atol=1e-5)

    def test_centers_between_endpoints(self):
        cams = ring_cameras()
        interp = interpolate_cameras(cams, n_neighbors=1, n_per_neighbor=3)
        centers = np.asarray(interp.center)
        orig = np.asarray(cams.center)
        # Every interpolated center lies within the bounding box of the
        # originals (convexity of linear interpolation).
        assert (centers >= orig.min(0) - 1e-5).all()
        assert (centers <= orig.max(0) + 1e-5).all()

    def test_interp_cameras_see_scene_center(self):
        cams = ring_cameras()
        interp = interpolate_cameras(cams, n_neighbors=1, n_per_neighbor=2)
        for i in range(interp.w2c.shape[0]):
            c = jax.tree.map(lambda x: x[i], interp)
            xy, z = c.project(jnp.zeros((1, 3)))
            assert float(z[0]) > 0


class TestDenseViewStage:
    @pytest.mark.slow
    def test_dense_stage_replaces_views(self, tmp_path):
        import sys

        sys.path.insert(0, "tests")
        from test_pipeline import synthetic_room

        from g4splat_tpu.pipeline.orchestrator import (
            G4SplatPipeline,
            PipelineConfig,
            Priors,
        )

        cameras, images, depths = synthetic_room(V=2, res=32)
        cfg = PipelineConfig(
            output_path=str(tmp_path), train_iterations=10,
            render_backend="tiled", use_dense_view=True,
        )
        pipe = G4SplatPipeline(cfg, Priors())
        pipe.load_inputs(images, cameras)
        pipe.state.prior_depths = depths.copy()
        pipe.state.depths = depths.copy()
        pipe.render_chart_views()
        pipe.excavate_planes()
        pipe.refine_plane_depths()
        pipe.train_gaussians()

        dense = interpolate_cameras(cameras, n_neighbors=1, n_per_neighbor=3)
        n_dense = dense.w2c.shape[0]   # 2 cams × 1 neighbor × 3 = 6
        pipe.dense_view_stage(dense)
        assert len(pipe.state.images) == n_dense
        assert pipe.state.depths.shape == (n_dense, 32, 32)
        assert np.isfinite(pipe.state.depths).all()
        # Dense retrain runs.
        pipe.refine_plane_depths()
        pipe.train_gaussians()
        assert int(pipe.state.scene.num_alive) > 50


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
