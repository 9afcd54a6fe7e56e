import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g4splat_tpu.core.cameras import lookat_camera, stack_cameras
from g4splat_tpu.models.gaussians import GaussianScene
from g4splat_tpu.ops.tetra import (
    cube_grid_to_tets,
    delaunay_tetrahedralize,
    marching_tetrahedra,
)
from g4splat_tpu.ops.tsdf import TSDFConfig, integrate_views


def sphere_grid(res=24, r=0.6):
    xs = np.linspace(-1, 1, res)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1).reshape(-1, 3)
    sdf = r - np.linalg.norm(g, axis=-1)  # >0 inside
    return g.astype(np.float32), sdf.astype(np.float32)


class TestMarchingTetra:
    def test_sphere_crossings(self):
        pts, sdf = sphere_grid()
        _, tets = cube_grid_to_tets((24, 24, 24))
        out = marching_tetrahedra(pts, tets, sdf, np.ones(len(pts), np.float32))
        assert len(out.faces) > 100
        assert len(out.edge_verts) > 100
        # Every crossing edge must straddle the surface.
        assert np.all(out.edge_sdf[:, 0] * out.edge_sdf[:, 1] <= 0)
        # Linear interp along edges lands near radius 0.6.
        s0 = np.abs(out.edge_sdf[:, 0])
        s1 = np.abs(out.edge_sdf[:, 1])
        w = (s0 / np.maximum(s0 + s1, 1e-12))[:, None]
        verts = out.edge_verts[:, 0] * (1 - w) + out.edge_verts[:, 1] * w
        radii = np.linalg.norm(verts, axis=-1)
        np.testing.assert_allclose(radii, 0.6, atol=0.02)
        # Faces index valid crossing edges.
        assert out.faces.min() >= 0
        assert out.faces.max() < len(out.edge_verts)

    def test_empty_and_full_tets_skipped(self):
        pts, sdf = sphere_grid(res=8)
        _, tets = cube_grid_to_tets((8, 8, 8))
        out = marching_tetrahedra(pts, tets, sdf + 100.0, np.ones(len(pts)))
        assert len(out.faces) == 0

    def test_watertight_euler(self):
        # A closed surface mesh: every edge shared by exactly 2 faces.
        pts, sdf = sphere_grid(res=16)
        _, tets = cube_grid_to_tets((16, 16, 16))
        out = marching_tetrahedra(pts, tets, sdf, np.ones(len(pts)))
        edges = np.concatenate(
            [out.faces[:, [0, 1]], out.faces[:, [1, 2]], out.faces[:, [2, 0]]]
        )
        edges = np.sort(edges, axis=1)
        _, counts = np.unique(edges, axis=0, return_counts=True)
        assert np.all(counts == 2), f"boundary edges: {(counts != 2).sum()}"


class TestDelaunay:
    def test_delaunay_covers_points(self):
        rng = np.random.RandomState(0)
        pts = rng.rand(500, 3)
        cells = delaunay_tetrahedralize(pts)
        assert cells.shape[1] == 4
        assert cells.max() < 500
        # Most points participate in at least one tet.
        assert len(np.unique(cells)) > 480


class TestTetraPoints:
    def test_nonfinite_splats_dropped(self):
        # Diverged training can leave NaN positions / overflowed scales in
        # live slots; tetra_points must drop them so Qhull never sees NaN
        # (budget-run regression: "ValueError: Points cannot contain NaN").
        rng = np.random.RandomState(0)
        xyz = rng.randn(20, 3).astype(np.float32)
        scene = GaussianScene.from_points(
            xyz, np.full((20, 3), 0.5, np.float32))
        bad_xyz = np.asarray(scene.xyz).copy()
        bad_xyz[3] = np.nan
        bad_scale = np.asarray(scene.scaling_raw).copy()
        bad_scale[7] = np.inf
        scene = scene.replace(xyz=jnp.asarray(bad_xyz),
                              scaling_raw=jnp.asarray(bad_scale))
        pts, scales = scene.tetra_points()
        assert np.isfinite(pts).all() and np.isfinite(scales).all()
        assert pts.shape[0] == 9 * 18          # 2 of 20 splats dropped
        cells = delaunay_tetrahedralize(pts)
        assert cells.shape[1] == 4


class TestTSDFIntegration:
    def test_plane_depth_fusion(self):
        # One camera at origin looking +z; depth map = constant 2.0 plane.
        cam = lookat_camera([0, 0, 0], [0, 0, 1], [0, -1, 0],
                            fx=32.0, fy=32.0, width=32, height=32)
        cams = stack_cameras([cam])
        depth = jnp.full((1, 32, 32), 2.0)
        img = jnp.ones((1, 32, 32, 3)) * 0.5
        # Query points along the optical axis.
        zs = np.array([1.5, 1.9, 1.97, 2.0, 2.03, 2.5])
        pts = np.stack([np.zeros_like(zs), np.zeros_like(zs), zs], axis=1)
        cfg = TSDFConfig(trunc_margin=0.1)
        out = integrate_views(jnp.asarray(pts, jnp.float32), cams, img, depth, cfg)
        tsdf = np.asarray(out.tsdf)
        # (depth - z)/trunc clamped to max 1; below -trunc discarded (keeps -1 init).
        np.testing.assert_allclose(tsdf[0], 1.0, atol=1e-5)       # far in front
        np.testing.assert_allclose(tsdf[1], 1.0, atol=1e-5)       # 0.1/0.1 → 1
        np.testing.assert_allclose(tsdf[2], 0.3, atol=1e-5)
        np.testing.assert_allclose(tsdf[3], 0.0, atol=1e-5)
        np.testing.assert_allclose(tsdf[4], -0.3, atol=1e-5)
        np.testing.assert_allclose(tsdf[5], -1.0, atol=1e-5)      # unobserved
        # Colors fused where valid.
        np.testing.assert_allclose(np.asarray(out.colors)[2], 0.5, atol=1e-5)

    def test_binary_opacity_mode(self):
        cam = lookat_camera([0, 0, 0], [0, 0, 1], [0, -1, 0],
                            fx=32.0, fy=32.0, width=32, height=32)
        cams = stack_cameras([cam])
        depth = jnp.full((1, 32, 32), 2.0)
        img = jnp.zeros((1, 32, 32, 3))
        pts = np.array([[0, 0, 1.5], [0, 0, 2.05]], np.float32)
        cfg = TSDFConfig(trunc_margin=0.1, use_binary_opacity=True)
        out = integrate_views(jnp.asarray(pts), cams, img, depth, cfg)
        # Output is 0.5 - min(opacity): in front → 0.5-0=0.5; behind → 0.5-1=-0.5
        np.testing.assert_allclose(np.asarray(out.tsdf), [0.5, -0.5], atol=1e-6)


class TestTSDFOptions:
    """Round-3 option surface (adaptive_tsdf.py:162-341,
    extract_mesh_adaptive_tsdf.py:168-184)."""

    def _setup(self):
        cam = lookat_camera([0, 0, 0], [0, 0, 1], [0, -1, 0],
                            fx=32.0, fy=32.0, width=32, height=32)
        cams = stack_cameras([cam])
        depth = jnp.full((1, 32, 32), 2.0)
        img = jnp.ones((1, 32, 32, 3)) * 0.5
        pts = jnp.asarray([[0, 0, 1.97], [0, 0, 2.03]], jnp.float32)
        return cams, depth, img, pts

    def test_normal_consistency_filter(self):
        cams, depth, img, pts = self._setup()
        nrm = jnp.zeros((1, 32, 32, 3)).at[..., 2].set(-1.0)
        cfg = TSDFConfig(trunc_margin=0.1,
                         filter_with_normal_consistency=True,
                         normal_consistency_threshold=0.5)
        # Agreeing normals (nc = 1 > 0.5): identical to the unfiltered run.
        out_ok = integrate_views(pts, cams, img, depth, cfg,
                                 normals=nrm, reference_normals=nrm)
        base = integrate_views(pts, cams, img, depth,
                               TSDFConfig(trunc_margin=0.1))
        np.testing.assert_allclose(out_ok.tsdf, base.tsdf, atol=1e-6)
        # Opposing normals (nc = -1): every observation filtered → init.
        out_bad = integrate_views(pts, cams, img, depth, cfg,
                                  normals=nrm, reference_normals=-nrm)
        np.testing.assert_allclose(np.asarray(out_bad.tsdf), [-1.0, -1.0])

    def test_normal_consistency_weighting(self):
        cams, depth, img, pts = self._setup()
        nrm = jnp.zeros((1, 32, 32, 3)).at[..., 2].set(-1.0)
        half = nrm * 0.5  # |nc| = 0.5 → weights halved, mean unchanged
        cfg = TSDFConfig(trunc_margin=0.1, weight_by_normal_consistency=True)
        out = integrate_views(pts, cams, img, depth, cfg,
                              normals=nrm, reference_normals=half)
        base = integrate_views(pts, cams, img, depth,
                               TSDFConfig(trunc_margin=0.1))
        np.testing.assert_allclose(out.tsdf, base.tsdf, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.weights),
                                   np.asarray(base.weights) * 0.5, atol=1e-6)

    def test_nearest_interpolation_mode(self):
        cams, depth, img, pts = self._setup()
        # Constant depth: nearest == bilinear; just exercise the branch.
        cfg = TSDFConfig(trunc_margin=0.1, interpolation_mode="nearest")
        out = integrate_views(pts, cams, img, depth, cfg)
        np.testing.assert_allclose(np.asarray(out.tsdf), [0.3, -0.3],
                                   atol=1e-5)

    def test_sdf_tolerance(self):
        from g4splat_tpu.ops.tsdf import apply_sdf_tolerance

        depth = jnp.full((8, 8), 2.0)
        out = apply_sdf_tolerance(depth, focal=32.0, tolerance_px=1.5,
                                  max_tolerance=1e8)
        np.testing.assert_allclose(np.asarray(out), 2.0 - 1.5 / 32.0 * 2.0,
                                   atol=1e-6)
        out = apply_sdf_tolerance(depth, focal=32.0, tolerance_px=1.5,
                                  max_tolerance=0.01)
        np.testing.assert_allclose(np.asarray(out), 1.99, atol=1e-6)

    def test_dilated_depth_moves_surface_toward_camera(self):
        from g4splat_tpu.ops.tsdf import dilate_depth_along_normals

        cam = lookat_camera([0, 0, 0], [0, 0, 1], [0, -1, 0],
                            fx=32.0, fy=32.0, width=32, height=32)
        depth = jnp.full((32, 32), 2.0)
        rgb = jnp.ones((32, 32, 3)) * 0.5
        nd, nr = dilate_depth_along_normals(cam, depth, rgb,
                                            dilation_px=1.5,
                                            max_dilation=1e8)
        nd = np.asarray(nd)
        # Fronto-parallel plane, normals toward camera: depth shrinks by
        # ~dilation_px/focal·depth in the interior.
        interior = nd[8:-8, 8:-8]
        expect = 2.0 - 1.5 / 32.0 * 2.0
        np.testing.assert_allclose(interior, expect, atol=0.02)
        assert np.isfinite(np.asarray(nr)).all()


class TestClusterFilter:
    def test_keeps_largest(self):
        from g4splat_tpu.pipeline.mesh_extraction import (
            ExtractedMesh,
            keep_largest_clusters,
        )

        # Blob A: 3 triangles sharing edges; blob B: 1 isolated triangle.
        verts = np.array([
            [0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0], [2, 0, 0],
            [5, 5, 5], [6, 5, 5], [5, 6, 5],
        ], np.float32)
        faces = np.array([
            [0, 1, 2], [1, 3, 2], [1, 4, 3],   # blob A
            [5, 6, 7],                          # blob B
        ], np.int32)
        mesh = ExtractedMesh(verts, faces, np.zeros((8, 3), np.float32))
        out = keep_largest_clusters(mesh, cluster_to_keep=1, min_triangles=2)
        assert len(out.faces) == 3
        assert len(out.vertices) == 5
        assert out.faces.max() < len(out.vertices)

    def test_small_mesh_untouched(self):
        from g4splat_tpu.pipeline.mesh_extraction import (
            ExtractedMesh,
            keep_largest_clusters,
        )

        verts = np.zeros((3, 3), np.float32)
        faces = np.array([[0, 1, 2]], np.int32)
        mesh = ExtractedMesh(verts, faces, None)
        out = keep_largest_clusters(mesh)  # default min_triangles=50
        assert len(out.faces) == 1


def sphere_scene(n=800, r=0.5, seed=0):
    rng = np.random.RandomState(seed)
    d = rng.randn(n, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = (d * r).astype(np.float32)
    cols = np.full((n, 3), 0.7, np.float32)
    # Orient each splat tangent to the sphere (normal = radial).
    return GaussianScene.from_points(
        pts, cols, scales=np.full(n, 0.08, np.float32), initial_opacity=0.95
    )


class TestEndToEnd:
    @pytest.mark.slow
    def test_grid_tsdf_sphere(self):
        from g4splat_tpu.pipeline.mesh_extraction import extract_mesh_grid_tsdf

        scene = sphere_scene()
        cams = []
        for i in range(6):
            a = i * np.pi / 3
            cams.append(
                lookat_camera([2.5 * np.cos(a), 0.3, 2.5 * np.sin(a)],
                              [0, 0, 0], [0, -1, 0], fx=48.0, fy=48.0,
                              width=48, height=48)
            )
        cameras = stack_cameras(cams)
        mesh = extract_mesh_grid_tsdf(
            scene, cameras, resolution=32, backend="tiled",
            bounds=np.array([[-0.9, -0.9, -0.9], [0.9, 0.9, 0.9]]),
            carve_empty=True,
        )
        assert len(mesh.faces) > 200
        radii = np.linalg.norm(mesh.vertices, axis=-1)
        # Surface should be near the sphere radius (splat thickness ~0.08).
        assert np.median(radii) == pytest.approx(0.5, abs=0.1)
        assert mesh.vertex_colors is not None

    def test_multires_tsdf_sphere(self):
        from g4splat_tpu.pipeline.mesh_extraction import (
            extract_mesh_multires_tsdf,
        )

        scene = sphere_scene()
        cams = []
        for i in range(6):
            a = i * np.pi / 3
            cams.append(
                lookat_camera([2.5 * np.cos(a), 0.3, 2.5 * np.sin(a)],
                              [0, 0, 0], [0, -1, 0], fx=48.0, fy=48.0,
                              width=48, height=48)
            )
        cameras = stack_cameras(cams)
        mesh = extract_mesh_multires_tsdf(
            scene, cameras, factors=(2.0, 8.0, 16.0), resolution=32,
            backend="tiled", point_chunk=65536,
        )
        assert len(mesh.faces) > 200
        radii = np.linalg.norm(mesh.vertices[mesh.faces].reshape(-1, 3),
                               axis=-1)
        # Whole sphere visible within the finest depth_trunc → the coarser
        # levels' redundant near-field faces must be dropped: the merged
        # surface still sits at the sphere radius, not duplicated shells.
        assert np.median(radii) == pytest.approx(0.5, abs=0.12)
        assert mesh.vertex_colors is not None

    def test_multires_merge_drops_covered_faces(self):
        from g4splat_tpu.pipeline.mesh_extraction import _verts_covered

        cams = [lookat_camera([0, 0, -2], [0, 0, 0], [0, -1, 0],
                              fx=20.0, fy=20.0, width=16, height=16)]
        cameras = stack_cameras(cams)
        verts = np.array([[0, 0, 0],      # in frustum, depth 2 < trunc 3
                          [0, 0, 50.0],   # in frustum, beyond trunc
                          [0, 10.0, 0]],  # out of frustum
                         np.float32)
        cov = _verts_covered(cameras, verts, depth_trunc=3.0)
        np.testing.assert_array_equal(cov, [True, False, False])

    @pytest.mark.slow
    def test_adaptive_tsdf_sphere(self):
        from g4splat_tpu.pipeline.mesh_extraction import (
            MeshExtractionConfig,
            extract_mesh_adaptive_tsdf,
        )

        scene = sphere_scene(n=400)
        cams = []
        for i in range(4):
            a = i * np.pi / 2
            cams.append(
                lookat_camera([2.5 * np.cos(a), 0.2, 2.5 * np.sin(a)],
                              [0, 0, 0], [0, -1, 0], fx=40.0, fy=40.0,
                              width=40, height=40)
            )
        cameras = stack_cameras(cams)
        cfg = MeshExtractionConfig(
            downsample_ratio=0.5, n_binary_steps=4, backend="tiled",
            texture_mesh=True, point_chunk=16384,
        )
        mesh = extract_mesh_adaptive_tsdf(scene, cameras, cfg)
        assert len(mesh.faces) > 50
        radii = np.linalg.norm(mesh.vertices, axis=-1)
        assert np.median(radii) == pytest.approx(0.5, abs=0.15)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
