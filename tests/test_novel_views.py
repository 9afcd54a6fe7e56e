import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g4splat_tpu.core.cameras import lookat_camera, stack_cameras
from g4splat_tpu.pipeline.novel_views import (
    ProposalConfig,
    VisibilityGrid,
    covisibility_by_splats,
    none_visible_rate_from_alpha,
    propose_look_around,
    propose_object_centric,
    propose_plane_targeted,
    select_need_inpaint_views,
)


def input_setup(V=3):
    cams = []
    for i in range(V):
        a = (i - 1) * 0.5
        cams.append(
            lookat_camera([2.0 * np.sin(a), 0.0, -2.0 * np.cos(a)],
                          [0, 0, 0], [0, -1, 0], fx=32.0, fy=32.0,
                          width=32, height=32)
        )
    cameras = stack_cameras(cams)
    depths = np.full((V, 32, 32), 4.0, np.float32)  # far wall at z≈2 behind origin
    return cameras, depths


class TestVisibilityGrid:
    def test_observed_space_visible(self):
        cameras, depths = input_setup()
        grid = VisibilityGrid(
            np.array([-2.5, -2.5, -2.5]), np.array([2.5, 2.5, 2.5]),
            resolution=16, input_cameras=cameras, input_depths=depths,
        )
        # Origin is in front of all cameras → visible.
        assert grid.is_visible(np.array([[0.0, 0.0, 0.0]]))[0]
        # Far behind the cameras → invisible.
        assert not grid.is_visible(np.array([[0.0, 0.0, -2.4]]))[0]
        # Outside the bbox → invisible.
        assert not grid.is_visible(np.array([[10.0, 0.0, 0.0]]))[0]


class TestProposals:
    def test_object_centric_ring(self):
        cameras, depths = input_setup()
        cfg = ProposalConfig(n_frames=12, width=32, height=32)
        cams = propose_object_centric(
            cameras, grid=None, traj_center=np.zeros(3), cfg=cfg
        )
        assert cams.w2c.shape[0] == 12
        # All proposals look roughly at the origin.
        for i in range(12):
            c = jax.tree.map(lambda x: x[i], cams)
            xy, z = c.project(jnp.zeros((1, 3)))
            assert float(z[0]) > 0
            assert abs(float(xy[0, 0]) - 15.5) < 1.0

    def test_look_around_count(self):
        cameras, _ = input_setup()
        cams = propose_look_around(
            cameras, ProposalConfig(width=32, height=32), n_per_view=5
        )
        assert cams.w2c.shape[0] == 15
        # Positions unchanged.
        np.testing.assert_allclose(
            np.asarray(cams.center)[:5],
            np.repeat(np.asarray(cameras.center)[:1], 5, 0), atol=1e-5,
        )

    def test_plane_targeted(self):
        cameras, _ = input_setup()
        cams = propose_plane_targeted(
            cameras,
            plane_centers=np.array([[0.0, 0.0, 2.0]]),
            plane_normals=np.array([[0.0, 0.0, 1.0]]),
            cfg=ProposalConfig(width=32, height=32),
        )
        assert cams.w2c.shape[0] == 1
        c = jax.tree.map(lambda x: x[0], cams)
        # Camera is on the camera-side of the plane looking at its center.
        assert float(c.center[2]) < 2.0
        xy, z = c.project(jnp.asarray([[0.0, 0.0, 2.0]]))
        assert abs(float(xy[0, 0]) - 15.5) < 1.0


class TestSelection:
    def test_covisibility_same_camera(self):
        cameras, _ = input_setup()
        cam = jax.tree.map(lambda x: x[0], cameras)
        pts = jax.random.uniform(jax.random.PRNGKey(0), (500, 3),
                                 minval=-1, maxval=1)
        assert covisibility_by_splats(cam, cam, pts) == pytest.approx(1.0)

    def test_none_visible_rate(self):
        alpha = np.zeros((8, 8))
        alpha[:4] = 1.0
        assert none_visible_rate_from_alpha(alpha) == pytest.approx(0.5)

    def test_selection_respects_bounds_and_count(self):
        # 10 candidates on a ring; rates alternate inside/outside the band.
        cams = []
        for k in range(10):
            a = 2 * np.pi * k / 10
            cams.append(
                lookat_camera([2 * np.cos(a), 0, 2 * np.sin(a)], [0, 0, 0],
                              [0, -1, 0], fx=32.0, fy=32.0, width=32, height=32)
            )
        cameras = stack_cameras(cams)
        rates = [0.3 if k % 2 == 0 else 0.9 for k in range(10)]
        pts = jax.random.uniform(jax.random.PRNGKey(1), (300, 3),
                                 minval=-0.5, maxval=0.5)
        sel = select_need_inpaint_views(
            cameras, rates, pts, select_num=3, covisible_high_bound=1.01
        )
        assert len(sel) == 3
        # Views with rate 0.9 (> high bound) are never selected.
        assert all(rates[i] <= 0.5 for i in sel)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
