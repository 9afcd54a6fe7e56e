import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g4splat_tpu.core.cameras import lookat_camera, make_camera, stack_cameras
from g4splat_tpu.pipeline.confidence import (
    compute_confidence_maps,
    project_visibility,
)


def two_view_setup():
    """View 0 (input) and view 1 (generated) both looking at a z=2 plane."""
    cam0 = make_camera(jnp.eye(4), 16.0, 16.0, 7.5, 7.5, 16, 16)
    w2c1 = jnp.eye(4).at[0, 3].set(-0.2)  # shifted right
    cam1 = make_camera(w2c1, 16.0, 16.0, 7.5, 7.5, 16, 16)
    cameras = stack_cameras([cam0, cam1])
    depths = jnp.full((2, 16, 16), 2.0)
    return cameras, depths


class TestVisibility:
    def test_points_on_surface_visible(self):
        cameras, depths = two_view_setup()
        cam0 = jax.tree.map(lambda x: x[0], cameras)
        pts = np.asarray(cam0.backproject(depths[0]).reshape(-1, 3))[::7]
        vis, coords = project_visibility(cameras, jnp.asarray(pts), depths)
        vis = np.asarray(vis)
        assert vis[:, 0].all()        # all points visible in their own view
        assert vis[:, 1].mean() > 0.5  # most visible in the shifted view

    def test_occluded_points_invisible(self):
        cameras, depths = two_view_setup()
        # Points far behind the depth surface.
        pts = np.array([[0, 0, 3.5], [0.1, 0.1, 4.0]], np.float32)
        vis, _ = project_visibility(cameras, jnp.asarray(pts), depths)
        assert not np.asarray(vis).any()


class TestConfidenceMaps:
    def test_input_views_all_ones(self):
        cameras, depths = two_view_setup()
        pts = np.asarray(
            jax.tree.map(lambda x: x[0], cameras).backproject(depths[0])
        ).reshape(-1, 3)
        images = np.random.RandomState(0).rand(2, 16, 16, 3).astype(np.float32)
        out = compute_confidence_maps(
            cameras, pts, np.asarray(depths), images, input_view_num=1
        )
        assert out.confident_maps[0].min() == 1

    def test_generated_view_zeroed_where_input_sees(self):
        cameras, depths = two_view_setup()
        cam0 = jax.tree.map(lambda x: x[0], cameras)
        pts = np.asarray(cam0.backproject(depths[0])).reshape(-1, 3)
        images = np.random.RandomState(0).rand(2, 16, 16, 3).astype(np.float32)
        out = compute_confidence_maps(
            cameras, pts, np.asarray(depths), images, input_view_num=1
        )
        # Much of view 1 sees surface already observed by view 0 → conf 0.
        assert out.confident_maps[1].mean() < 0.9

    def test_color_harmonization_for_new_surface(self):
        # Points seen only by two *generated* views get one shared color.
        cam1 = make_camera(jnp.eye(4), 16.0, 16.0, 7.5, 7.5, 16, 16)
        w2c2 = jnp.eye(4).at[0, 3].set(-0.05)
        cam2 = make_camera(w2c2, 16.0, 16.0, 7.5, 7.5, 16, 16)
        # Input view looks the opposite way — sees nothing.
        w2c0 = jnp.eye(4).at[:3, :3].set(-jnp.eye(3).at[1, 1].set(-1.0))
        cam0 = make_camera(w2c0, 16.0, 16.0, 7.5, 7.5, 16, 16)
        cameras = stack_cameras([cam0, cam1, cam2])
        depths = jnp.full((3, 16, 16), 2.0)
        pts = np.asarray(cam1.backproject(depths[1])).reshape(-1, 3)
        rng = np.random.RandomState(1)
        images = rng.rand(3, 16, 16, 3).astype(np.float32)
        out = compute_confidence_maps(
            cameras, pts, np.asarray(depths), images, input_view_num=1
        )
        # Confidence of generated views stays 1 (nothing seen by input).
        assert out.confident_maps[1].min() == 1
        assert out.confident_maps[2].min() == 1
        # Colors harmonized: view-2 pixels now carry view-1 colors where the
        # same 3D point projects.
        vis = out.visibility
        both = vis[:, 1] & vis[:, 2]
        assert both.sum() > 50
        # Sample one such point and verify shared color.
        h1 = out.harmonized_images
        idx = np.flatnonzero(both)[0]
        # point idx maps to pixel idx in view 1 (pts built from view-1 grid)
        py, px = divmod(idx, 16)
        c1 = h1[1, py, px]
        xy, _ = cam2.project(jnp.asarray(pts[idx]))
        u2, v2 = int(round(float(xy[0]))), int(round(float(xy[1])))
        c2 = h1[2, v2, u2]
        np.testing.assert_allclose(c1, c2, atol=1e-6)


class TestVisibilityMasks:
    def test_covisible_plane_counted(self):
        from g4splat_tpu.pipeline.confidence import build_visibility_masks

        cameras, depths = two_view_setup()
        counts, masks = build_visibility_masks(cameras, np.asarray(depths))
        assert counts.shape == (2, 16, 16)
        # Both views see the same z=2 plane; most pixels covisible once.
        assert counts.max() == 1
        assert masks[0].mean() > 0.5 and masks[1].mean() > 0.5
        # Self-view is excluded: with only one other view, count <= 1.
        assert (counts <= 1).all()

    def test_disagreeing_depths_not_covisible(self):
        from g4splat_tpu.pipeline.confidence import build_visibility_masks

        cameras, depths = two_view_setup()
        depths = np.asarray(depths).copy()
        depths[1] = 5.0  # view 1 disagrees everywhere (>10% relative)
        counts, masks = build_visibility_masks(cameras, depths)
        assert counts[0].max() == 0
        assert not masks[0].any()


class TestAnchorColorHarmonize:
    def test_plane_recolored_from_anchor(self):
        from g4splat_tpu.pipeline.confidence import (
            anchor_plane_color_harmonize,
        )

        cameras, depths = two_view_setup()
        depths = np.asarray(depths)
        masks = [np.zeros((16, 16), np.int32) for _ in range(2)]
        masks[0][4:12, 4:12] = 1
        masks[1][4:12, 4:12] = 1
        gdict = {0: [(0, 1), (1, 1)]}
        images = np.zeros((2, 16, 16, 3), np.float32)
        images[1] = 1.0  # anchor view (view 1) is white
        out = anchor_plane_color_harmonize(
            cameras, depths, images, masks, gdict, anchor_view_ids=[1],
        )
        # View-0 plane pixels that project into view 1 are now white.
        sel = masks[0] == 1
        assert out[0][sel].mean() > 0.5
        # Anchor view itself unchanged.
        np.testing.assert_array_equal(out[1], images[1])

    def test_no_anchor_in_view_is_noop(self):
        from g4splat_tpu.pipeline.confidence import (
            anchor_plane_color_harmonize,
        )

        cameras, depths = two_view_setup()
        depths = np.asarray(depths)
        masks = [np.zeros((16, 16), np.int32) for _ in range(2)]
        masks[0][4:12, 4:12] = 1
        gdict = {0: [(0, 1)]}
        images = np.random.RandomState(0).rand(2, 16, 16, 3).astype(np.float32)
        # Anchor list references a view whose plane points never land in it:
        # make view 1 face away.
        out = anchor_plane_color_harmonize(
            cameras, depths, images.copy(), masks, gdict, anchor_view_ids=[0],
        )
        # Anchor == member view → skipped, images unchanged.
        np.testing.assert_array_equal(out, images)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
