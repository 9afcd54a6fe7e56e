"""Measure compile-free per-iteration slopes for BUDGET.md's extrapolation.

The budget run's stage walls include one-time XLA/Mosaic compiles, so scaling
them linearly in iteration count overstates the reference schedule. This
probe measures the STEADY-STATE per-iteration cost of the three
iteration-scaling stages on the real chip, at the budget run's exact shapes:

  * SfM optimization phases 1/2  (pipeline.sfm.LAST_STATS — the loop clock
    starts after the compile-carrying first step)
  * chart alignment              (pipeline.chart_alignment.LAST_STATS)
  * GS training                  (warm-up train(20), then timed train(n))

Writes logs/budget_probes_r04.json, consumed by scripts/make_budget.py.
Run AFTER scripts/run_budget.py so the compile cache is warm and the final
point cloud exists (the trainer probe reuses it for the real capacity).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget_out", default="/tmp/budget_run")
    ap.add_argument("--views", type=int, default=5)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--train_probe_iters", type=int, default=200)
    ap.add_argument("--json", default="logs/budget_probes_r05.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from run_budget import build_gt_scene

    from g4splat_tpu.core.cameras import lookat_camera, stack_cameras
    from g4splat_tpu.ops.rasterize import render
    from g4splat_tpu.pipeline import chart_alignment as ca
    from g4splat_tpu.pipeline import sfm as sfm_mod
    from g4splat_tpu.pipeline.orchestrator import (
        G4SplatPipeline, PipelineConfig, Priors,
    )

    out = {}

    def dump():
        os.makedirs(os.path.dirname(args.json), exist_ok=True)
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out, indent=1), flush=True)

    W, H = args.res, args.res * 3 // 4
    V = args.views
    gt = build_gt_scene()
    cams = [
        lookat_camera([4.8 * np.sin(a), 0.3 + 0.2 * np.cos(2 * a),
                       -4.8 * np.cos(a)],
                      [0, 0, 0], [0, -1, 0], fx=W * 0.9, fy=W * 0.9,
                      width=W, height=H)
        for a in np.linspace(-0.5, 0.5, V)
    ]
    cameras = stack_cameras(cams)
    imgs, depths = [], []
    for i in range(V):
        cam = jax.tree.map(lambda x: x[i], cameras)
        o = render(cam, gt, backend="pallas")
        imgs.append(np.asarray(o["render"]))
        d = np.array(o["surf_depth"])
        d[d <= 0] = 7.8
        depths.append(d)
    images = np.stack(imgs)
    depths = np.stack(depths)

    cfg = PipelineConfig(
        source_path="synthetic-budget", output_path="/tmp/probe_run",
        sfm_config="budget", alignment_config="fast",
        render_backend="pallas", work_size=512,
    )

    # ------------------------------------------------- SfM per-iter slopes
    from g4splat_tpu.priors.mast3r import MASt3RModel

    p = G4SplatPipeline(cfg, Priors(mast3r=MASt3RModel()))
    p.load_inputs(images)
    t0 = time.perf_counter()
    p.run_sfm()
    out["sfm_stage_s"] = round(time.perf_counter() - t0, 2)
    out["sfm_phase1_s_per_iter"] = round(
        sfm_mod.LAST_STATS.get("phase1_s_per_iter", 0.0), 4)
    out["sfm_phase2_s_per_iter"] = round(
        sfm_mod.LAST_STATS.get("phase2_s_per_iter", 0.0), 4)
    # Actual per-phase iteration counts from the run itself (the resolved
    # mast3r config drives them; hardcoding desynced make_budget before).
    out["sfm_iters"] = [int(sfm_mod.LAST_STATS.get("phase1_iters", 0)),
                        int(sfm_mod.LAST_STATS.get("phase2_iters", 0))]
    dump()
    del p

    # ------------------------------------------- chart-alignment slope
    pipe = G4SplatPipeline(cfg, Priors())
    pipe.load_inputs(images, cameras)
    pipe.state.prior_depths = depths.copy()
    pipe.state.depths = depths.copy()
    t0 = time.perf_counter()
    pipe.align_charts()
    out["charts_stage_s"] = round(time.perf_counter() - t0, 2)
    out["charts_s_per_iter"] = round(ca.LAST_STATS.get("s_per_iter", 0.0), 4)
    out["charts_iters"] = int(ca.LAST_STATS.get("iters", 0))
    dump()

    # ------------------------------------------------- trainer ms/step
    from g4splat_tpu.io.ply import load_gaussian_ply
    from g4splat_tpu.train.trainer import Trainer, TrainConfig, ViewData

    scene = None
    for tag in ("", "-s2", "-s1", "-ori"):
        d = os.path.join(args.budget_out, "free_gaussians",
                         f"point_cloud{tag}")
        if os.path.isdir(d):
            iters = sorted(os.listdir(d))
            if iters:
                ply = os.path.join(d, iters[-1], "point_cloud.ply")
                if os.path.exists(ply):
                    # Padded capacity: densify stays on below (the reference
                    # schedule densifies for the first half), and headroom
                    # avoids mid-probe capacity-growth recompiles.
                    scene = load_gaussian_ply(ply)
                    n_pts = int(scene.xyz.shape[0])
                    scene = load_gaussian_ply(ply, capacity=n_pts * 13 // 10)
                    out["trainer_scene"] = ply
                    break
    if scene is None:
        # Fallback: init from the GT points (same capacity class).
        from g4splat_tpu.models.gaussians import GaussianScene

        scene = GaussianScene.from_points(
            np.asarray(gt.xyz), np.full((gt.xyz.shape[0], 3), 0.5,
                                        np.float32))
        out["trainer_scene"] = "gt-points fallback"
    cap = int(scene.xyz.shape[0])
    out["capacity"] = cap

    views = ViewData(
        image=jnp.asarray(images), prior_depth=jnp.asarray(depths),
        prior_normal=jnp.zeros((V, H, W, 3)),
        prior_curv=jnp.zeros((V, H, W)), confidence=jnp.ones((V, H, W)),
        color_weight=jnp.ones(V), scale_factor=jnp.asarray(1.0),
    )
    # Production trainer config: pallas backend + compact_width 4 (the
    # orchestrator's settings — the r04 probe accidentally timed the
    # TrainConfig default 'tiled' backend).
    tcfg = TrainConfig(iterations=10 ** 6, densify_until_iter=10 ** 9,
                       opacity_reset_interval=10 ** 9, spatial_lr_scale=1.0,
                       backend="pallas", raster_compact_width=4)
    tr = Trainer(scene, cameras, views, tcfg, seed=0)
    tr.train(20)                               # compile + warm-up
    jax.block_until_ready(tr.scene.xyz)
    n = args.train_probe_iters
    t0 = time.perf_counter()
    tr.train(n)
    jax.block_until_ready(tr.scene.xyz)
    out["train_ms_per_iter"] = round((time.perf_counter() - t0) / n * 1e3, 2)
    out["train_probe_iters"] = n
    dump()


if __name__ == "__main__":
    main()
