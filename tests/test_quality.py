"""End-to-end quality gate on the synthetic box room (RESULTS.md's test).

The north star is "PSNR/Chamfer within 1% of the reference" — unfalsifiable
without committed numbers. This gate makes quality regression-testable: a
scene with analytically-known geometry runs the full posed pipeline tail
(charts -> planes -> refined depths -> 2DGS training -> TSDF mesh) and the
results must clear committed thresholds. Reference result schema:
eval/eval.py:92-104 (image metrics on the held-out split) +
eval/mesh_eval.py:62-76 (Chamfer vs GT mesh).

Thresholds are set well below the measured numbers recorded in RESULTS.md
(the calibration run at this exact config; on-chip numbers also there) so
they catch real quality regressions, not run-to-run noise.
"""

import numpy as np
import pytest

from g4splat_tpu.eval.synthetic import box_room, quality_run


class TestSyntheticGeometry:
    def test_box_room_mesh_matches_splats(self):
        """GT splats must lie ON the GT mesh (sanity of the benchmark)."""
        gt, (verts, faces) = box_room(points_per_m2=400)
        xyz = np.asarray(gt.xyz[: int(gt.num_alive)])
        # Every patch is axis-aligned: distance to the nearest plane of its
        # patch is 0 by construction; check a necessary condition — points
        # lie within the room bounds and on one of the known plane equations.
        planes = [
            (1, 1.0), (2, 1.5), (0, -1.5), (0, 1.5),  # floor + 3 walls
        ]
        d = np.full(len(xyz), np.inf)
        for ax, off in planes:
            d = np.minimum(d, np.abs(xyz[:, ax] - off))
        # cube faces at c +- h
        c, h = np.array([0.2, 0.7, 0.3]), 0.3
        for ax in range(3):
            for sgn in (-1, 1):
                d = np.minimum(d, np.abs(xyz[:, ax] - (c[ax] + sgn * h)))
        assert float(d.max()) < 1e-5
        # GT mesh vertices must DENSELY cover the surfaces (the Chamfer
        # protocol compares vertex clouds, mesh_eval.py:28-40) and lie on
        # the same plane set as the splats.
        dv = np.full(len(verts), np.inf)
        for ax, off in planes:
            dv = np.minimum(dv, np.abs(verts[:, ax] - off))
        for ax in range(3):
            for sgn in (-1, 1):
                dv = np.minimum(dv, np.abs(verts[:, ax] - (c[ax] + sgn * h)))
        assert float(dv.max()) < 1e-5
        assert len(verts) > 10_000          # dense grid, not corner quads
        assert len(faces) > 20_000


class TestChamferUnits:
    def test_chamfer_is_centimeters(self):
        """evaluate_mesh reports Acc/Comp/Chamfer-L1 ×100 (centimeters for a
        meters-scale scene), matching the reference schema
        (eval/mesh_eval.py:62-76). The quality gate's thresholds are in cm —
        this pins the scale so a unit change breaks loudly, not silently."""
        from g4splat_tpu.eval.mesh_metrics import evaluate_mesh

        rng = np.random.default_rng(0)
        pts = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
        shifted = pts + np.array([0.01, 0.0, 0.0], np.float32)  # 1 cm
        res = evaluate_mesh(pts, None, shifted, None)
        assert abs(res["Chamfer-L1"] - 1.0) < 1e-4, res  # 0.01 m == 1.0 cm
        assert abs(res["Acc"] - 1.0) < 1e-4


@pytest.mark.slow
class TestQualityGate:
    def test_box_room_psnr_and_chamfer(self, tmp_path):
        res = quality_run(
            str(tmp_path), res=128, n_views=8, eval_split=(2, 5),
            train_iters=400, backend="tiled", tsdf_resolution=96,
            points_per_m2=1200,
        )
        # Thresholds = the committed calibration at THIS exact config
        # (scripts/run_quality.py → logs/quality_r05.json:
        # PSNR 14.82 / SSIM 0.554 / Chamfer-L1 6.35 cm) with regression
        # margin. The 400-iter 128px CPU config underfits held-out views —
        # the larger on-chip tag in the same log is the quality headline;
        # this gate exists to catch regressions, not to flatter.
        assert res["Average-PSNR"] > 12.0, res
        assert res["Average-SSIM"] > 0.45, res
        # Mesh Chamfer-L1 vs the analytic GT mesh, in CENTIMETERS
        # (evaluate_mesh reports ×100 — TestChamferUnits pins the scale;
        # the room is 3 m wide). Measured 6.35 cm; gate 12.
        assert res["Chamfer-L1"] < 12.0, res
        assert np.isfinite(res["Chamfer-L1"])
