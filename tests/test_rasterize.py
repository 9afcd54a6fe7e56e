import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g4splat_tpu.core.cameras import make_camera
from g4splat_tpu.models.gaussians import GaussianScene
from g4splat_tpu.ops.rasterize import render
from g4splat_tpu.ops.rasterize_common import RenderConfig


def simple_camera(w=64, h=48, f=60.0):
    return make_camera(
        jnp.eye(4), f, f, (w - 1) / 2.0, (h - 1) / 2.0, w, h
    )


def make_scene(xyz, colors, scales, quats=None, opacity=0.9, capacity=None):
    xyz = np.asarray(xyz, np.float32)
    n = xyz.shape[0]
    scene = GaussianScene.from_points(
        xyz,
        np.asarray(colors, np.float32),
        capacity=capacity or n,
        scales=np.asarray(scales, np.float32),
        quats=None if quats is None else np.asarray(quats, np.float32),
        initial_opacity=opacity,
    )
    return scene


def random_scene(key, n, capacity=None, depth_range=(2.0, 6.0), spread=1.2):
    ks = jax.random.split(key, 5)
    xyz = jnp.concatenate(
        [
            jax.random.uniform(ks[0], (n, 2), minval=-spread, maxval=spread),
            jax.random.uniform(
                ks[1], (n, 1), minval=depth_range[0], maxval=depth_range[1]
            ),
        ],
        axis=1,
    )
    colors = jax.random.uniform(ks[2], (n, 3))
    scales = jnp.exp(jax.random.uniform(ks[3], (n,), minval=-3.2, maxval=-1.8))
    quats = jax.random.normal(ks[4], (n, 4))
    return make_scene(
        np.asarray(xyz), np.asarray(colors), np.asarray(scales),
        quats=np.asarray(quats), opacity=0.8, capacity=capacity,
    )


ALL_KEYS = [
    "render", "rend_alpha", "rend_normal", "rend_dist", "rend_depth",
    "depth_median", "surf_depth", "final_T",
]


class TestSingleSplat:
    def test_center_pixel_hit(self):
        cam = simple_camera()
        scene = make_scene([[0, 0, 3.0]], [[1, 0, 0]], [[0.3, 0.3]], opacity=0.9)
        out = render(cam, scene, backend="dense")
        img = np.asarray(out["render"])
        cx, cy = int((64 - 1) / 2), int((48 - 1) / 2)
        # Center pixel: alpha ≈ min(0.99, 0.9·exp(-small)) → strongly red.
        assert img[cy, cx, 0] > 0.6
        assert img[cy, cx, 1] < 0.05
        # Far corner: nothing.
        assert img[0, 0].max() < 1e-3

    def test_analytic_alpha_falloff(self):
        # A fronto-parallel splat: alpha(pixel) = opa·exp(-0.5·min(ρ3d, ρ2d)),
        # ρ3d = (Δx/(f·s/z))², ρ2d = 2·Δx² (FilterInvSquare = 2, auxiliary.h:39).
        cam = simple_camera(w=65, h=49, f=60.0)  # odd → integer center pixel
        s, z, opa = 0.2, 3.0, 0.8
        scene = make_scene([[0, 0, z]], [[1, 1, 1]], [[s, s]], opacity=opa)
        out = render(cam, scene, backend="dense")
        alpha_map = np.asarray(out["rend_alpha"])
        f = 60.0
        sigma_pix = f * s / z
        cx, cy = (65 - 1) // 2, (49 - 1) // 2
        for dx in (0, 3, 7, 12):
            u = dx / sigma_pix
            rho3d = u * u
            rho2d = 2.0 * dx * dx
            expected = opa * np.exp(-0.5 * min(rho3d, rho2d))
            if expected < 1 / 255:
                expected = 0.0
            np.testing.assert_allclose(
                alpha_map[cy, cx + dx], expected, atol=2e-3
            )

    def test_depth_maps(self):
        cam = simple_camera()
        z = 2.5
        scene = make_scene([[0, 0, z]], [[1, 1, 1]], [[0.5, 0.5]], opacity=0.99)
        out = render(cam, scene, backend="dense")
        cx, cy = int((64 - 1) / 2), int((48 - 1) / 2)
        np.testing.assert_allclose(
            float(out["rend_depth"][cy, cx]), z, atol=1e-3
        )
        np.testing.assert_allclose(
            float(out["depth_median"][cy, cx]), z, atol=1e-3
        )

    def test_tilted_splat_depth_gradient(self):
        # 45°-tilted splat: intersection depth varies across the image.
        cam = simple_camera(w=65, h=49, f=60.0)
        c, s_ = np.cos(np.pi / 8), np.sin(np.pi / 8)
        quat = [c, 0.0, s_, 0.0]  # rotate about y → tilt in x
        scene = make_scene(
            [[0, 0, 3.0]], [[1, 1, 1]], [[0.8, 0.8]], quats=[quat], opacity=0.99
        )
        out = render(cam, scene, backend="dense")
        d = np.asarray(out["depth_median"])
        cy = (49 - 1) // 2
        cx = (65 - 1) // 2
        left, right = d[cy, cx - 8], d[cy, cx + 8]
        assert abs(left - right) > 0.05  # tilted → asymmetric depth
        assert d[cy, cx] == pytest.approx(3.0, abs=1e-2)

    def test_normal_facing_camera(self):
        cam = simple_camera()
        scene = make_scene([[0, 0, 3.0]], [[1, 1, 1]], [[0.4, 0.4]], opacity=0.99)
        out = render(cam, scene, backend="dense")
        n = np.asarray(out["rend_normal_cam"])
        cx, cy = int((64 - 1) / 2), int((48 - 1) / 2)
        # DUAL_VISIABLE: normal flipped toward camera → -z in view space.
        assert n[cy, cx, 2] < -0.9

    def test_background(self):
        cam = simple_camera()
        scene = make_scene([[0, 0, 3.0]], [[1, 0, 0]], [[0.05, 0.05]], opacity=0.5)
        cfg = RenderConfig(bg=jnp.array([0.0, 1.0, 0.0]))
        out = render(cam, scene, config=cfg, backend="dense")
        img = np.asarray(out["render"])
        np.testing.assert_allclose(img[0, 0], [0, 1, 0], atol=1e-5)


class TestCompositing:
    def test_two_splats_occlusion(self):
        cam = simple_camera()
        scene = make_scene(
            [[0, 0, 2.0], [0, 0, 4.0]],
            [[1, 0, 0], [0, 0, 1]],
            [[0.5, 0.5], [0.5, 0.5]],
            opacity=0.9,
        )
        out = render(cam, scene, backend="dense")
        img = np.asarray(out["render"])
        cx, cy = int((64 - 1) / 2), int((48 - 1) / 2)
        # Front (red, α=.9) dominates: C = .9·red + .1·.9·blue
        np.testing.assert_allclose(img[cy, cx, 0], 0.9, atol=5e-3)
        np.testing.assert_allclose(img[cy, cx, 2], 0.09, atol=5e-3)

    def test_order_independence_of_input(self):
        # Input order must not matter (depth sort inside).
        cam = simple_camera()
        a = make_scene(
            [[0, 0, 2.0], [0.1, 0, 4.0]], [[1, 0, 0], [0, 0, 1]],
            [[0.4, 0.4], [0.4, 0.4]], opacity=0.7,
        )
        b = make_scene(
            [[0.1, 0, 4.0], [0, 0, 2.0]], [[0, 0, 1], [1, 0, 0]],
            [[0.4, 0.4], [0.4, 0.4]], opacity=0.7,
        )
        ra = np.asarray(render(cam, a, backend="dense")["render"])
        rb = np.asarray(render(cam, b, backend="dense")["render"])
        np.testing.assert_allclose(ra, rb, atol=1e-6)

    def test_early_stop_semantics(self):
        # Stack many opaque splats: T crosses 1e-4 and the tail is skipped.
        cam = simple_camera(w=16, h=16, f=30.0)
        n = 40
        xyz = [[0, 0, 2.0 + 0.05 * i] for i in range(n)]
        scene = make_scene(
            xyz, [[1, 1, 1]] * n, [[1.0, 1.0]] * n, opacity=0.5
        )
        out = render(cam, scene, backend="dense")
        nc = int(np.asarray(out["n_contrib"])[8, 8])
        # T after k splats = 0.5^k < 1e-4 → k = 14 (skip the 14th).
        assert nc == 13
        assert float(out["final_T"][8, 8]) > 1e-4


class TestTiledVsDense:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_agreement(self, seed):
        cam = simple_camera(w=80, h=56, f=70.0)
        scene = random_scene(jax.random.PRNGKey(seed), 300)
        cfg = RenderConfig(bg=jnp.array([0.1, 0.2, 0.3]))
        dense = render(cam, scene, config=cfg, backend="dense")
        tiled = render(cam, scene, config=cfg, backend="tiled")
        for k in ALL_KEYS:
            np.testing.assert_allclose(
                np.asarray(dense[k]), np.asarray(tiled[k]), atol=2e-4,
                err_msg=f"mismatch in {k}",
            )

    @pytest.mark.slow
    def test_agreement_with_dead_splats(self):
        cam = simple_camera()
        scene = random_scene(jax.random.PRNGKey(3), 100, capacity=256)
        dense = render(cam, scene, backend="dense")
        tiled = render(cam, scene, backend="tiled")
        np.testing.assert_allclose(
            np.asarray(dense["render"]), np.asarray(tiled["render"]), atol=2e-4
        )


class TestGradients:
    def _loss(self, scene, cam, backend):
        def f(xyz, scaling_raw, rotation_raw, opacity_raw, f_dc):
            s = scene.replace(
                xyz=xyz, scaling_raw=scaling_raw, rotation_raw=rotation_raw,
                opacity_raw=opacity_raw, f_dc=f_dc,
            )
            out = render(cam, s, backend=backend)
            target = 0.3
            return (
                jnp.mean((out["render"] - target) ** 2)
                + 0.1 * jnp.mean(out["rend_dist"])
                + 0.05 * jnp.mean(out["rend_alpha"])
            )
        return f

    @pytest.mark.parametrize("backend", ["dense", "tiled"])
    @pytest.mark.slow
    def test_finite_difference(self, backend):
        cam = simple_camera(w=24, h=24, f=24.0)
        scene = random_scene(jax.random.PRNGKey(7), 12, spread=0.6)
        f = self._loss(scene, cam, backend)
        args = (
            scene.xyz, scene.scaling_raw, scene.rotation_raw,
            scene.opacity_raw, scene.f_dc,
        )
        grads = jax.grad(f, argnums=(0, 1, 2, 3, 4))(*args)
        # Finite differences on a few random coordinates of each arg.
        rng = np.random.RandomState(0)
        for ai, (a, g) in enumerate(zip(args, grads)):
            a = np.asarray(a, np.float64)
            g = np.asarray(g)
            assert np.isfinite(g).all(), f"non-finite grad for arg {ai}"
            flat = a.reshape(-1)
            for _ in range(4):
                i = rng.randint(flat.size)
                eps = 3e-4 * max(1.0, abs(flat[i]))
                ap, am = flat.copy(), flat.copy()
                ap[i] += eps
                am[i] -= eps
                args_p = list(args)
                args_m = list(args)
                args_p[ai] = jnp.asarray(ap.reshape(a.shape), jnp.float32)
                args_m[ai] = jnp.asarray(am.reshape(a.shape), jnp.float32)
                fd = (float(f(*args_p)) - float(f(*args_m))) / (2 * eps)
                an = g.reshape(-1)[i]
                np.testing.assert_allclose(
                    an, fd, rtol=0.08, atol=2e-4,
                    err_msg=f"arg {ai} coord {i} (backend={backend})",
                )

    @pytest.mark.slow
    def test_dense_tiled_grads_agree(self):
        cam = simple_camera(w=32, h=32, f=30.0)
        scene = random_scene(jax.random.PRNGKey(9), 40, spread=0.8)
        args = (
            scene.xyz, scene.scaling_raw, scene.rotation_raw,
            scene.opacity_raw, scene.f_dc,
        )
        gd = jax.grad(self._loss(scene, cam, "dense"), argnums=(0, 1, 2, 3, 4))(*args)
        gt = jax.grad(self._loss(scene, cam, "tiled"), argnums=(0, 1, 2, 3, 4))(*args)
        for a, b in zip(gd, gt):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)

    def test_center_offset_gradient(self):
        # The screen-space positional gradient hook used for densification.
        cam = simple_camera(w=32, h=32, f=30.0)
        scene = random_scene(jax.random.PRNGKey(11), 20, spread=0.8)

        def f(off):
            out = render(cam, scene, center_offset=off, backend="dense")
            return jnp.mean((out["render"] - 0.2) ** 2)

        off = jnp.zeros((scene.capacity, 2))
        g = jax.grad(f)(off)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0


class TestDeepOverlap:
    @pytest.mark.slow
    def test_tiled_matches_dense_when_cap_covers_tile(self):
        """The tiled backend keeps only the front-most tile_k entries per
        tile; on scenes whose densest tile exceeds the cap its output is
        WRONG (found via the on-chip deep-overlap gate). With the cap raised
        it must match the dense oracle."""
        rng = np.random.RandomState(3)
        n = 1500
        xyz = np.concatenate([
            rng.uniform(-0.15, 0.15, (n, 2)),
            rng.uniform(-0.3, 0.3, (n, 1)) + 3.0,
        ], axis=1).astype(np.float32)
        scene = make_scene(
            xyz, rng.rand(n, 3), np.exp(rng.uniform(-3.5, -2.5, n)),
            opacity=0.7,
        )
        cam = simple_camera(w=48, h=32, f=90.0)
        ref = render(cam, scene, backend="dense")
        capped = render(cam, scene, config=RenderConfig(tile_k=256),
                        backend="tiled")
        raised = render(cam, scene, config=RenderConfig(tile_k=4096),
                        backend="tiled")
        # The capped run must actually be distinguishable (deep tile), and
        # the raised cap must restore oracle agreement.
        assert float(jnp.abs(capped["rend_alpha"] - ref["rend_alpha"]).max()) > 1e-3
        np.testing.assert_allclose(np.asarray(raised["render"]),
                                   np.asarray(ref["render"]), atol=2e-4)
        np.testing.assert_allclose(np.asarray(raised["rend_alpha"]),
                                   np.asarray(ref["rend_alpha"]), atol=2e-4)


class TestDebugDump:
    def test_nonfinite_inputs_dumped(self, tmp_path, monkeypatch):
        # Reference dump-on-error plumbing
        # (diff_surfel_rasterization/__init__.py:83-90).
        import g4splat_tpu.ops.rasterize as R

        monkeypatch.setattr(R, "_DEBUG_DUMP", str(tmp_path))
        scene = make_scene([[0, 0, np.nan]], [[1, 0, 0]], [0.2])
        out = R.render(simple_camera(), scene, backend="tiled")
        assert (tmp_path / "snapshot_fw.npz").exists()
        snap = np.load(tmp_path / "snapshot_fw.npz")
        assert len(snap["bad_outputs"]) > 0
        assert np.isnan(snap["xyz"]).any()

    def test_finite_render_no_dump(self, tmp_path, monkeypatch):
        import g4splat_tpu.ops.rasterize as R

        monkeypatch.setattr(R, "_DEBUG_DUMP", str(tmp_path))
        scene = make_scene([[0, 0, 3.0]], [[1, 0, 0]], [0.2])
        R.render(simple_camera(), scene, backend="tiled")
        assert not (tmp_path / "snapshot_fw.npz").exists()


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


class TestManualGeomVJP:
    """The Pallas backward kernel's hand-derived intersection VJP
    (_chunk_geom_bwd) against jax.vjp over the same math."""

    def test_matches_autodiff(self):
        from g4splat_tpu.ops.rasterize_pallas import SLIM_F
        from g4splat_tpu.ops.rasterize_pallas_bwd import (
            _center_from_T,
            _chunk_geom_bwd,
            _chunk_geom_fwd,
        )

        npix, chunk = 64, 32
        rng = np.random.RandomState(0)
        g = jnp.asarray(rng.randn(SLIM_F, chunk) * 2.0, jnp.float32)
        g = g.at[9].set(jnp.asarray(rng.rand(chunk), jnp.float32))  # opacity
        px = jnp.asarray(rng.rand(npix, 1) * 16, jnp.float32)
        py = jnp.asarray(rng.rand(npix, 1) * 16, jnp.float32)
        pxh = jnp.concatenate([px, py, jnp.ones_like(px)], axis=1).T
        dA = jnp.asarray(rng.randn(npix, chunk), jnp.float32)
        dZ = jnp.asarray(rng.randn(npix, chunk), jnp.float32)

        # The manual VJP treats the recomputed low-pass center as an
        # INDEPENDENT input (its T-chain flows through the d_center output
        # rows + the outer preprocess AD): compare against autodiff with an
        # explicitly injected center.
        cx, cy = _center_from_T(g)
        _, vjp_fn = jax.vjp(
            lambda gg, c: _chunk_geom_fwd(gg, px, py, 0.2, center=c)[:2],
            g, (cx, cy),
        )
        dg_ad, (dcx_ad, dcy_ad) = vjp_fn((dA, dZ))
        *_, saved = _chunk_geom_fwd(g, px, py, 0.2)
        dg_man = _chunk_geom_bwd(g, saved, pxh, dA, dZ)
        man = np.asarray(dg_man)
        ad = np.concatenate(
            [np.asarray(dg_ad[:9]), np.asarray(dcx_ad),
             np.asarray(dcy_ad), np.asarray(dg_ad[9:10])], axis=0
        )
        rel = np.abs(ad - man) / (np.abs(ad) + 1e-3)
        assert rel.max() < 1e-3

        # And the COMPOSED total dT (direct + d_center·∂center/∂T) matches
        # autodiff of the self-recomputing forward — the decomposition the
        # production path relies on.
        _, vjp_full = jax.vjp(
            lambda gg: _chunk_geom_fwd(gg, px, py, 0.2)[:2], g
        )
        (dg_full,) = vjp_full((dA, dZ))
        _, vjp_c = jax.vjp(lambda gg: _center_from_T(gg), g)
        (dg_via_center,) = vjp_c((dg_man[9:10], dg_man[10:11]))
        total = man[:9] + np.asarray(dg_via_center[:9])
        full = np.asarray(dg_full[:9])
        rel2 = np.abs(full - total) / (np.abs(full) + 1e-3)
        assert rel2.max() < 1e-3


class TestCapacityPaths:
    """Static-capacity overflow semantics: per-splat tile cap, entry-buffer
    overflow, and the backward kernel's per-tile gradient-support cap."""

    def _cam(self, wh=64, fl=60.0):
        from g4splat_tpu.core.cameras import lookat_camera
        return lookat_camera([0, 0, -3.0], [0, 0, 0], [0, -1, 0],
                             fx=fl, fy=fl, width=wh, height=wh)

    def test_tile_cap_truncation_reports_dropped(self):
        # One huge splat spanning far more tiles than MAX_TILES_PER_SPLAT.
        from g4splat_tpu.models.gaussians import GaussianScene
        from g4splat_tpu.ops.rasterize import render
        from g4splat_tpu.ops.rasterize_common import RenderConfig, preprocess
        from g4splat_tpu.ops.rasterize_tiled import (
            MAX_TILES_PER_SPLAT, bin_splats,
        )

        # scale 0.6 at z=3 with f=60 → ~36 px radius → ~6×6 tiles on a
        # 128px (8×8-tile) image, well past the 16-tile cap. buf_size is
        # passed explicitly: a 1-splat scene's default buffer (4·P) is
        # smaller than the cap itself.
        scene = GaussianScene.from_points(
            np.zeros((1, 3), np.float32), np.ones((1, 3), np.float32),
            scales=np.full(1, 0.6, np.float32), initial_opacity=0.9,
        )
        cam = self._cam(wh=128)
        prep = preprocess(
            cam, xyz=scene.xyz, scaling=scene.scaling(),
            rotation_raw=scene.rotation_raw, opacity=scene.opacity(),
            features=scene.features(), sh_degree=0, config=RenderConfig(),
        )
        binning = bin_splats(prep, cam.width, cam.height, buf_size=64,
                             ellipse_prune=False)
        n_entries = int(jnp.sum(binning.tile_count))
        assert n_entries == MAX_TILES_PER_SPLAT  # capped, not the full cover
        assert int(binning.n_dropped) > 0
        # With ellipse pruning (default) the cap still truncates the rect
        # first; pruning can only remove zero-contribution slots from the
        # kept prefix.
        pruned = bin_splats(prep, cam.width, cam.height, buf_size=64)
        assert 0 < int(jnp.sum(pruned.tile_count)) <= MAX_TILES_PER_SPLAT
        assert int(pruned.n_dropped) > 0
        out = render(cam, scene, backend="tiled")
        assert np.isfinite(np.asarray(out["render"])).all()

    def test_entry_buffer_overflow_counts_dropped(self):
        from g4splat_tpu.models.gaussians import GaussianScene
        from g4splat_tpu.ops.rasterize_common import RenderConfig, preprocess
        from g4splat_tpu.ops.rasterize_tiled import bin_splats

        rng = np.random.RandomState(0)
        n = 64
        scene = GaussianScene.from_points(
            rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32),
            rng.rand(n, 3).astype(np.float32),
            scales=np.full(n, 0.25, np.float32), initial_opacity=0.8,
        )
        cam = self._cam()
        prep = preprocess(
            cam, xyz=scene.xyz, scaling=scene.scaling(),
            rotation_raw=scene.rotation_raw, opacity=scene.opacity(),
            features=scene.features(), sh_degree=0, config=RenderConfig(),
        )
        full = bin_splats(prep, cam.width, cam.height)
        total = int(jnp.sum(full.tile_count))
        assert total > 8, "scene too sparse for the overflow test"
        small = bin_splats(prep, cam.width, cam.height, buf_size=8)
        kept = int(jnp.sum(jnp.minimum(small.tile_count, 8)))
        assert kept <= 8
        assert int(small.n_dropped) >= total - 8
        # The kept prefix is the lowest tile ids in sorted order.
        tid = np.asarray(small.tile_id[:8])
        assert (np.diff(tid) >= 0).all()

    @pytest.mark.slow
    def test_gradient_support_cap_zeroes_tail(self, monkeypatch):
        # Entries past MAX_CHUNKS_PER_TILE chunks get zero gradient but the
        # forward still composites them; shrink the cap to keep the test
        # small (3 chunks of entries vs a cap of 2).
        import g4splat_tpu.ops.rasterize_pallas_bwd as rb
        from g4splat_tpu.models.gaussians import GaussianScene
        from g4splat_tpu.ops.rasterize import render

        monkeypatch.setattr(rb, "MAX_CHUNKS_PER_TILE", 2)
        rng = np.random.RandomState(1)
        n = 3 * 128  # 3 chunks if every splat lands in one tile's range
        scene = GaussianScene.from_points(
            (rng.randn(n, 3) * np.array([0.002, 0.002, 0.3])).astype(
                np.float32),
            rng.rand(n, 3).astype(np.float32),
            scales=np.full(n, 0.01, np.float32), initial_opacity=0.02,
        )
        cam = self._cam(wh=16, fl=30.0)

        def loss(xyz, backend):
            out = render(cam, scene.replace(xyz=xyz), backend=backend)
            return jnp.mean(out["render"])

        g = jax.grad(loss)(scene.xyz, "pallas")
        g = np.asarray(g)
        assert np.isfinite(g).all()
        assert np.abs(g).max() > 0, "gradient identically zero"


class TestPallasInterpretParity:
    """The production Pallas kernels under interpret mode on CPU — a CI-level
    guard; the authoritative on-chip gate is scripts/check_pallas.py."""

    @pytest.mark.slow
    def test_forward_and_grads_match_tiled(self):
        cam = simple_camera(w=48, h=32, f=45.0)
        scene = random_scene(jax.random.PRNGKey(7), 120)
        cfg = RenderConfig(bg=jnp.array([0.05, 0.1, 0.15]))
        tiled = render(cam, scene, config=cfg, backend="tiled")
        pallas = render(cam, scene, config=cfg, backend="pallas")
        for k in ["render", "rend_alpha", "rend_dist", "surf_depth",
                  "final_T"]:
            np.testing.assert_allclose(
                np.asarray(pallas[k]), np.asarray(tiled[k]), atol=2e-4,
                err_msg=k,
            )

        def loss(xyz, backend):
            out = render(cam, scene.replace(xyz=xyz), config=cfg,
                         backend=backend)
            return (jnp.mean(out["render"] ** 2)
                    + 0.05 * jnp.mean(out["rend_dist"]))

        gt = np.asarray(jax.grad(loss)(scene.xyz, "tiled"))
        gp = np.asarray(jax.grad(loss)(scene.xyz, "pallas"))
        rel = np.linalg.norm(gp - gt) / (np.linalg.norm(gt) + 1e-12)
        assert rel < 5e-3, rel

    @pytest.mark.slow
    def test_grouped_grid_edge_cases(self):
        """Grid-step grouping (RASTER_GROUP tiles per step) under interpret
        mode on a scene that exercises every sub-tile case at once: a
        padding tile (15 tiles → 16), fully dead tiles (empty corner), a
        saturated multi-chunk cluster (early exit + DMA drain), and normal
        tiles."""
        cam = simple_camera(w=80, h=48, f=70.0)   # 5x3 = 15 tiles
        rng = np.random.RandomState(11)
        # Dense cluster in one tile + sprinkle elsewhere; top-left empty.
        n1, n2 = 400, 60
        cluster = np.concatenate([
            rng.uniform(0.25, 0.45, (n1, 2)),
            rng.uniform(2.5, 3.5, (n1, 1)),
        ], axis=1)
        spread = np.concatenate([
            rng.uniform(-0.1, 0.9, (n2, 2)),
            rng.uniform(2.0, 5.0, (n2, 1)),
        ], axis=1)
        xyz = np.concatenate([cluster, spread]).astype(np.float32)
        scene = make_scene(
            xyz, rng.rand(n1 + n2, 3),
            np.exp(rng.uniform(-3.2, -2.2, n1 + n2)), opacity=0.8)
        cfg = RenderConfig(bg=jnp.array([0.3, 0.0, 0.1]), tile_k=2048)
        tiled = render(cam, scene, config=cfg, backend="tiled")
        pallas = render(cam, scene, config=cfg, backend="pallas")
        for k in ["render", "rend_alpha", "rend_dist", "surf_depth",
                  "final_T", "dist_m1", "dist_m2"]:
            np.testing.assert_allclose(
                np.asarray(pallas[k]), np.asarray(tiled[k]), atol=3e-4,
                err_msg=k,
            )

        def loss(xyz, backend):
            out = render(cam, scene.replace(xyz=xyz), config=cfg,
                         backend=backend)
            return (jnp.mean(out["render"] ** 2)
                    + 0.05 * jnp.mean(out["rend_dist"])
                    + 0.1 * jnp.mean(out["rend_alpha"]))

        gt = np.asarray(jax.grad(loss)(scene.xyz, "tiled"))
        gp = np.asarray(jax.grad(loss)(scene.xyz, "pallas"))
        rel = np.linalg.norm(gp - gt) / (np.linalg.norm(gt) + 1e-12)
        assert rel < 1e-2, rel


def test_mark_visible():
    from g4splat_tpu.ops.rasterize import mark_visible

    cam = simple_camera(w=32, h=32, f=30.0)
    xyz = np.array([[0.0, 0.0, 1.0],     # in front
                    [0.0, 0.0, -1.0],    # behind
                    [0.0, 0.0, 0.1]],    # closer than near threshold
                   np.float32)
    vis = np.asarray(mark_visible(cam, jnp.asarray(xyz)))
    assert vis.tolist() == [True, False, False]


class TestDepthRankBinning:
    """RenderConfig.depth_rank_binning: presorted rows + key-only binning
    sort must reproduce the quantized pair-sort path (exact depth order is a
    refinement of 19-bit-quantized order; differences are ordering noise on
    quantization ties, far below these bounds)."""

    def _scene(self, n=3000, seed=7):
        key = jax.random.PRNGKey(seed)
        return random_scene(key, n)

    @pytest.mark.slow
    def test_forward_matches_tiled_default(self):
        scene = self._scene()
        cam = simple_camera(w=96, h=64, f=70.0)
        base = render(cam, scene, backend="tiled")
        rank = render(cam, scene, backend="tiled",
                      config=RenderConfig(depth_rank_binning=True))
        for k in ("render", "rend_alpha", "surf_depth", "rend_dist",
                  "final_T"):
            np.testing.assert_allclose(
                np.asarray(base[k]), np.asarray(rank[k]), atol=2e-4,
                err_msg=k)
        # Per-splat outputs must stay in ORIGINAL splat order.
        np.testing.assert_array_equal(np.asarray(base["radii"]),
                                      np.asarray(rank["radii"]))

    def test_forward_matches_dense_oracle(self):
        scene = self._scene()
        cam = simple_camera(w=96, h=64, f=70.0)
        dense = render(cam, scene, backend="dense")
        rank = render(cam, scene, backend="tiled",
                      config=RenderConfig(depth_rank_binning=True))
        np.testing.assert_allclose(np.asarray(dense["render"]),
                                   np.asarray(rank["render"]), atol=2e-4)

    @pytest.mark.slow
    def test_gradients_match(self):
        scene = self._scene(n=800)
        cam = simple_camera(w=64, h=48, f=60.0)

        def loss(xyz, cfg):
            s = scene.replace(xyz=xyz)
            out = render(cam, s, backend="tiled", config=cfg)
            return (jnp.mean(out["render"] ** 2)
                    + 0.1 * jnp.mean(out["rend_alpha"]))

        g0 = jax.grad(loss)(scene.xyz, RenderConfig())
        g1 = jax.grad(loss)(scene.xyz, RenderConfig(depth_rank_binning=True))
        rel = (np.linalg.norm(np.asarray(g1 - g0))
               / (np.linalg.norm(np.asarray(g0)) + 1e-12))
        assert rel < 1e-3, rel

    @pytest.mark.slow
    def test_pallas_interpret_rank_mode(self):
        scene = self._scene(n=1200)
        cam = simple_camera(w=64, h=48, f=60.0)
        base = render(cam, scene, backend="tiled")
        out = render(cam, scene, backend="pallas",
                     config=RenderConfig(depth_rank_binning=True))
        np.testing.assert_allclose(np.asarray(base["render"]),
                                   np.asarray(out["render"]), atol=5e-3)

    @pytest.mark.slow
    def test_bits_fallback(self):
        """When rank bits don't fit the key, the quantized path is used
        silently (identical API)."""
        from g4splat_tpu.ops.rasterize_tiled import depth_rank_bits_fit

        assert depth_rank_bits_fit(200_000, 768, 576)
        assert not depth_rank_bits_fit(2_000_000, 3840, 2160)
        scene = self._scene(n=500)
        cam = simple_camera(w=64, h=48, f=60.0)
        out = render(cam, scene, backend="tiled",
                     config=RenderConfig(depth_rank_binning=True))
        assert np.isfinite(np.asarray(out["render"])).all()


class TestTileCap:
    """RenderConfig.max_tiles_per_splat: a halved candidate cap must be
    byte-identical whenever the binning drop counter reports zero truncation
    (the gate bench.py checks before self-selecting the cap-8 variant)."""

    @pytest.mark.slow
    def test_cap8_exact_when_no_drops(self):
        scene = random_scene(jax.random.PRNGKey(11), 2500)
        # Shrink radii so no splat's rect exceeds 8 tiles (the gate below
        # proves it for this exact scene).
        scene = scene.replace(scaling_raw=scene.scaling_raw - 1.0)
        cam = simple_camera(w=96, h=64, f=70.0)
        from g4splat_tpu.ops.rasterize_common import preprocess
        from g4splat_tpu.ops.rasterize_tiled import bin_splats

        prep = preprocess(
            cam, xyz=scene.xyz, scaling=scene.scaling(),
            rotation_raw=scene.rotation_raw, opacity=scene.opacity(),
            features=scene.features(), sh_degree=scene.active_sh_degree,
            config=RenderConfig())
        assert int(bin_splats(prep, 96, 64,
                              max_tiles_per_splat=8).n_dropped) == 0
        base = render(cam, scene, backend="tiled")
        cap8 = render(cam, scene, backend="tiled",
                      config=RenderConfig(max_tiles_per_splat=8))
        for k in ("render", "rend_alpha", "surf_depth", "rend_dist"):
            np.testing.assert_array_equal(
                np.asarray(base[k]), np.asarray(cap8[k]), err_msg=k)
        cap8p = render(cam, scene, backend="pallas",
                       config=RenderConfig(max_tiles_per_splat=8))
        np.testing.assert_allclose(np.asarray(base["render"]),
                                   np.asarray(cap8p["render"]), atol=5e-3)

    def test_drop_counter_reports_truncation(self):
        """Big splats touching >cap tiles must be counted, not silently cut."""
        key = jax.random.PRNGKey(3)
        scene = random_scene(key, 400, spread=0.4)
        # Inflate scales so radii span many tiles.
        scene = scene.replace(scaling_raw=scene.scaling_raw + 2.5)
        cam = simple_camera(w=128, h=96, f=90.0)
        from g4splat_tpu.ops.rasterize_common import preprocess
        from g4splat_tpu.ops.rasterize_tiled import bin_splats

        prep = preprocess(
            cam, xyz=scene.xyz, scaling=scene.scaling(),
            rotation_raw=scene.rotation_raw, opacity=scene.opacity(),
            features=scene.features(), sh_degree=scene.active_sh_degree,
            config=RenderConfig())
        d4 = int(bin_splats(prep, 128, 96, max_tiles_per_splat=4).n_dropped)
        d64 = int(bin_splats(prep, 128, 96, max_tiles_per_splat=64,
                             buf_size=400 * 64).n_dropped)
        assert d4 > d64


class TestCompaction:
    """Row-compacted binning (compact_width): the surviving key multiset is
    exact vs the uncompacted sort whenever the overflow block fits, and
    block exhaustion degrades to an effective cap of compact_width with
    exact n_dropped accounting — never a silent whole-splat loss."""

    W, H = 160, 112

    def _prep(self, n=600, inflate=1.4, seed=7):
        from g4splat_tpu.ops.rasterize_common import preprocess

        scene = random_scene(jax.random.PRNGKey(seed), n, spread=0.6)
        # Inflate some scales so a meaningful fraction of splats touch >8
        # tiles (asserted below — otherwise the tests are vacuous).
        scene = scene.replace(scaling_raw=scene.scaling_raw + inflate)
        cam = simple_camera(w=self.W, h=self.H, f=90.0)
        prep = preprocess(
            cam, xyz=scene.xyz, scaling=scene.scaling(),
            rotation_raw=scene.rotation_raw, opacity=scene.opacity(),
            features=scene.features(), sh_degree=scene.active_sh_degree,
            config=RenderConfig())
        return scene, cam, prep

    def _rect_counts(self, prep, cap):
        """Numpy oracle for per-splat candidate counts (rect binning,
        prune off): min(tiles in the dual-conic AABB, cap)."""
        from g4splat_tpu.ops.rasterize_common import TILE

        c = np.asarray(prep.center)
        r = np.asarray(prep.radius)
        valid = np.asarray(prep.valid)
        gx = (self.W + TILE - 1) // TILE
        gy = (self.H + TILE - 1) // TILE
        rmin_x = np.clip(((c[:, 0] - r) / TILE).astype(np.int32), 0, gx)
        rmin_y = np.clip(((c[:, 1] - r) / TILE).astype(np.int32), 0, gy)
        rmax_x = np.clip(
            ((c[:, 0] + r + TILE - 1) / TILE).astype(np.int32), 0, gx)
        rmax_y = np.clip(
            ((c[:, 1] + r + TILE - 1) / TILE).astype(np.int32), 0, gy)
        counts = np.where(valid, (rmax_x - rmin_x) * (rmax_y - rmin_y), 0)
        return np.minimum(counts, cap)

    def _entry_multiset(self, binning, n_tiles):
        """Sorted (tile, gauss) pairs of the real (non-padding) entries —
        invariant to tie order inside the sort."""
        tile = np.asarray(binning.tile_id)
        gid = np.asarray(binning.gauss_id)
        real = tile < n_tiles
        packed = tile[real].astype(np.int64) * (gid.max() + 2) + gid[real]
        return np.sort(packed)

    def test_compact_matches_uncompacted(self):
        from g4splat_tpu.ops.rasterize_common import TILE
        from g4splat_tpu.ops.rasterize_tiled import bin_splats

        scene, cam, prep = self._prep()
        counts = self._rect_counts(prep, cap=16)
        assert (counts > 8).sum() >= 10, "scene must overflow compact_width"
        kw = dict(buf_size=600 * 16, ellipse_prune=False)
        b0 = bin_splats(prep, self.W, self.H, compact_width=0, **kw)
        b8 = bin_splats(prep, self.W, self.H, compact_width=8, **kw)
        n_tiles = ((self.W + TILE - 1) // TILE) * ((self.H + TILE - 1) // TILE)
        assert int(b0.n_dropped) == int(b8.n_dropped)
        np.testing.assert_array_equal(np.asarray(b0.tile_count),
                                      np.asarray(b8.tile_count))
        np.testing.assert_array_equal(self._entry_multiset(b0, n_tiles),
                                      self._entry_multiset(b8, n_tiles))

    def test_block_exhaustion_exact_accounting(self):
        """With a 1-row overflow block, every other >compact_w splat keeps
        exactly compact_w candidates; the excess is counted in n_dropped."""
        from g4splat_tpu.ops.rasterize_tiled import bin_splats

        scene, cam, prep = self._prep()
        counts = self._rect_counts(prep, cap=16)
        ovf = counts > 8
        assert ovf.sum() >= 2
        # All overflow rows except the first (by row id — the block pick
        # order) lose (count - compact_w) candidates.
        expected_extra = int(counts[ovf][1:].sum() - 8 * (ovf.sum() - 1))
        kw = dict(buf_size=600 * 16, ellipse_prune=False)
        base = bin_splats(prep, self.W, self.H, compact_width=8, **kw)
        tiny = bin_splats(prep, self.W, self.H, compact_width=8,
                          compact_overflow_rows=1, **kw)
        assert int(tiny.n_dropped) - int(base.n_dropped) == expected_extra
        # Exhausted rows are reduced-cap, not dropped whole: every splat
        # with candidates still appears in the entry stream.
        gid = np.asarray(tiny.gauss_id)
        from g4splat_tpu.ops.rasterize_common import TILE

        n_tiles = ((self.W + TILE - 1) // TILE) * ((self.H + TILE - 1) // TILE)
        real = np.asarray(tiny.tile_id) < n_tiles
        present = np.unique(gid[real])
        want = np.where(counts > 0)[0]
        np.testing.assert_array_equal(np.intersect1d(present, want), want)

    def test_render_parity_compact_on_off(self):
        scene, cam, prep = self._prep()
        base = render(cam, scene, backend="tiled",
                      config=RenderConfig(binning_compact_width=0))
        comp = render(cam, scene, backend="tiled",
                      config=RenderConfig(binning_compact_width=8))
        for k in ("render", "rend_alpha", "surf_depth", "rend_dist"):
            np.testing.assert_allclose(
                np.asarray(base[k]), np.asarray(comp[k]),
                atol=1e-5, err_msg=k)


class TestEllipsePrune:
    """RenderConfig.tile_ellipse_prune: exact ellipse-level tile culling.

    Pruned candidate tiles provably contain no pixel with alpha >= 1/255,
    so every output map must match the unpruned binning (up to f32
    chunk-regrouping noise) and the dense oracle."""

    def _scene(self, n=3000, seed=21):
        key = jax.random.PRNGKey(seed)
        scene = random_scene(key, n)
        # Elongate: per-axis scale jitter (up to ~e^1.5 aspect) exercises
        # rotated-ellipse corners, the case rect binning is worst at; a low
        # opacity stripe exercises the tau-shrunken support.
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed + 1))
        # Jitter kept moderate so the UNPRUNED baseline stays under the 4P
        # entry buffer (overflow would make the baseline the lossy one —
        # guarded in test_tiled_outputs_match_unpruned).
        jit = jax.random.uniform(k1, scene.scaling_raw.shape,
                                 minval=-0.6, maxval=0.45)
        stripe = (jnp.arange(scene.opacity_raw.shape[0]) % 4 == 0).reshape(
            (-1,) + (1,) * (scene.opacity_raw.ndim - 1))
        opa = jnp.where(stripe, scene.opacity_raw - 4.0, scene.opacity_raw)
        return scene.replace(scaling_raw=scene.scaling_raw + jit,
                             opacity_raw=opa)

    def test_prune_reduces_entries(self):
        scene = self._scene()
        cam = simple_camera(w=128, h=96, f=110.0)
        from g4splat_tpu.ops.rasterize_common import preprocess
        from g4splat_tpu.ops.rasterize_tiled import bin_splats

        prep = preprocess(
            cam, xyz=scene.xyz, scaling=scene.scaling(),
            rotation_raw=scene.rotation_raw, opacity=scene.opacity(),
            features=scene.features(), sh_degree=scene.active_sh_degree,
            config=RenderConfig())
        n_raw = int(jnp.sum(bin_splats(prep, 128, 96,
                                       ellipse_prune=False).tile_count))
        n_pruned = int(jnp.sum(bin_splats(prep, 128, 96,
                                          ellipse_prune=True).tile_count))
        assert n_pruned < n_raw, (n_pruned, n_raw)

    def test_tiled_outputs_match_unpruned(self):
        scene = self._scene()
        cam = simple_camera(w=128, h=96, f=110.0)
        # Equality only holds when the unpruned baseline loses nothing to
        # buffer overflow (drops beyond the rect-truncation floor shared by
        # both paths).
        from g4splat_tpu.ops.rasterize_common import preprocess
        from g4splat_tpu.ops.rasterize_tiled import bin_splats

        prep = preprocess(
            cam, xyz=scene.xyz, scaling=scene.scaling(),
            rotation_raw=scene.rotation_raw, opacity=scene.opacity(),
            features=scene.features(), sh_degree=scene.active_sh_degree,
            config=RenderConfig())
        P = prep.depth.shape[0]
        d_buf = int(bin_splats(prep, 128, 96, ellipse_prune=False).n_dropped)
        d_nobuf = int(bin_splats(prep, 128, 96, buf_size=P * 16,
                                 ellipse_prune=False).n_dropped)
        assert d_buf == d_nobuf, f"baseline overflows: {d_buf} vs {d_nobuf}"
        base = render(cam, scene, backend="tiled",
                      config=RenderConfig(tile_ellipse_prune=False))
        pruned = render(cam, scene, backend="tiled",
                        config=RenderConfig(tile_ellipse_prune=True))
        for k in ("render", "rend_alpha", "surf_depth", "rend_dist",
                  "depth_median", "final_T"):
            # atol covers f32 regrouping noise: removing zero-alpha entries
            # shifts chunk boundaries, so log-space partial sums re-associate.
            np.testing.assert_allclose(
                np.asarray(base[k]), np.asarray(pruned[k]), atol=5e-5,
                err_msg=k)

    def test_matches_dense_oracle(self):
        # cap=32: this scene's elongated splats overflow the default cap-16
        # rect truncation, a pre-existing lossy knob the dense oracle does
        # not have (verified identical with ellipse_prune off); atol covers
        # depth-quantization tie reordering on overlapping splats.
        scene = self._scene()
        cam = simple_camera(w=128, h=96, f=110.0)
        dense = render(cam, scene, backend="dense")
        for rank in (False, True):
            out = render(cam, scene, backend="tiled",
                         config=RenderConfig(tile_ellipse_prune=True,
                                             max_tiles_per_splat=32,
                                             depth_rank_binning=rank))
            np.testing.assert_allclose(
                np.asarray(dense["render"]), np.asarray(out["render"]),
                atol=5e-4, err_msg=f"rank={rank}")
            np.testing.assert_allclose(
                np.asarray(dense["rend_alpha"]),
                np.asarray(out["rend_alpha"]), atol=5e-4,
                err_msg=f"alpha rank={rank}")

    def test_pallas_interpret_matches(self):
        scene = self._scene(n=1200)
        cam = simple_camera(w=64, h=48, f=60.0)
        base = render(cam, scene, backend="tiled",
                      config=RenderConfig(tile_ellipse_prune=False))
        out = render(cam, scene, backend="pallas",
                     config=RenderConfig(tile_ellipse_prune=True))
        np.testing.assert_allclose(np.asarray(base["render"]),
                                   np.asarray(out["render"]), atol=5e-3)

    @pytest.mark.slow
    def test_gradients_match_unpruned(self):
        scene = self._scene(n=700)
        cam = simple_camera(w=64, h=48, f=60.0)

        def loss(xyz, prune):
            s = scene.replace(xyz=xyz)
            out = render(cam, s, backend="tiled",
                         config=RenderConfig(tile_ellipse_prune=prune))
            return (jnp.sum(out["render"] ** 2)
                    + jnp.sum(out["rend_dist"]) * 0.1
                    + jnp.sum(out["rend_alpha"]))

        g0 = jax.grad(lambda x: loss(x, False))(scene.xyz)
        g1 = jax.grad(lambda x: loss(x, True))(scene.xyz)
        np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                                   rtol=1e-4, atol=1e-6)


class TestBufFactor:
    """RenderConfig.buf_factor: smaller sorted-entry buffers are exact while
    the binning drop counter stays zero."""

    @pytest.mark.slow
    def test_buf3_exact_when_no_drops(self):
        scene = random_scene(jax.random.PRNGKey(5), 2000)
        scene = scene.replace(scaling_raw=scene.scaling_raw - 1.0)
        cam = simple_camera(w=96, h=64, f=70.0)
        from g4splat_tpu.ops.rasterize_common import preprocess
        from g4splat_tpu.ops.rasterize_tiled import bin_splats

        prep = preprocess(
            cam, xyz=scene.xyz, scaling=scene.scaling(),
            rotation_raw=scene.rotation_raw, opacity=scene.opacity(),
            features=scene.features(), sh_degree=scene.active_sh_degree,
            config=RenderConfig())
        assert int(bin_splats(prep, 96, 64,
                              buf_size=2 * 2000).n_dropped) == 0
        base = render(cam, scene, backend="tiled")
        for bf in (3, 2):
            out = render(cam, scene, backend="tiled",
                         config=RenderConfig(buf_factor=bf))
            np.testing.assert_array_equal(
                np.asarray(base["render"]), np.asarray(out["render"]),
                err_msg=f"bf={bf}")
        outp = render(cam, scene, backend="pallas",
                      config=RenderConfig(buf_factor=2))
        np.testing.assert_allclose(np.asarray(base["render"]),
                                   np.asarray(outp["render"]), atol=5e-3)

    def test_overflow_still_counted(self):
        scene = random_scene(jax.random.PRNGKey(6), 1500)
        cam = simple_camera(w=96, h=64, f=70.0)
        from g4splat_tpu.ops.rasterize_common import preprocess
        from g4splat_tpu.ops.rasterize_tiled import bin_splats

        prep = preprocess(
            cam, xyz=scene.xyz, scaling=scene.scaling(),
            rotation_raw=scene.rotation_raw, opacity=scene.opacity(),
            features=scene.features(), sh_degree=scene.active_sh_degree,
            config=RenderConfig())
        d_small = int(bin_splats(prep, 96, 64, buf_size=256).n_dropped)
        assert d_small > 0
