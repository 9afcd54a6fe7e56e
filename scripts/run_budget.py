"""On-chip end-to-end wall-clock budget (BUDGET.md's data source).

Runs the FULL pipeline stage sequence (reference train.py:272-368, mirrored
from G4SplatPipeline.run) on the real TPU with 5 synthetic 512x384 views and
full-production-size RANDOM-weight priors: MASt3R ViT-L, DepthAnythingV2
vitl, SAM ViT-H, See3D SD2.1 MV-UNet + VAE + both CLIP towers.  Random
weights give reference-scale compute with garbage semantics — wall-clock is
the product here; quality gates live in tests/test_quality.py.

Reduced schedule (the extrapolation arithmetic lives in BUDGET.md):
  --train_iters   GS iterations per training round (reference: 7000 x 4)
  --ddim_steps    DDIM steps per See3D stage      (reference: 50)
  --inpaint_num   selected views per stage        (reference: 20)
Everything else runs the real schedule: SfM 1000+1000 (configs/mast3r/
unposed.yaml), chart alignment 1000 iters, 3 See3D stages, adaptive-tetra
mesh extraction, full eval.

Honesty notes:
  * SfM is timed with the random-weight MASt3R (real compute, garbage
    poses); its pose/depth outputs are then REPLACED by the synthetic GT so
    every downstream stage processes non-degenerate geometry and does its
    real work (otherwise plane RANSAC/visibility gating would short-circuit
    and undercount).
  * Priors are constructed lazily and dropped after their last consumer —
    the full prior set is ~12 GB of f32 params, more than one v5e chip
    holds alongside activations; the reference has the same property
    (stages run as separate processes, train.py:272-368).

Writes logs/budget_r04.json with per-stage wall seconds plus the per-call
DDIM/MVD instrumentation used for the 50-step extrapolation.
"""

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, ".")

import numpy as np


def build_gt_scene(n=120_000, seed=0):
    """Room shell + clutter (bench.py geometry class) as the synthetic GT."""
    from g4splat_tpu.models.gaussians import GaussianScene

    rng = np.random.RandomState(seed)
    xyz = rng.uniform(-3.0, 3.0, (n, 3)).astype(np.float32)
    wall = rng.randint(0, 6, n)
    xyz[wall == 0, 2] = 3.0
    xyz[wall == 1, 1] = 3.0   # floor
    xyz[wall == 2, 0] = -3.0
    cols = rng.rand(n, 3).astype(np.float32)
    # Low-frequency color so SfM/charts have photometric gradient.
    cols = 0.5 + 0.5 * np.sin(xyz * np.array([1.3, 2.1, 1.7]) + cols)
    scales = np.exp(rng.uniform(-4.2, -3.0, n)).astype(np.float32)
    return GaussianScene.from_points(
        xyz.astype(np.float32), cols.astype(np.float32),
        scales=scales, initial_opacity=0.85)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/budget_run")
    ap.add_argument("--views", type=int, default=5)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--train_iters", type=int, default=600)
    ap.add_argument("--ddim_steps", type=int, default=5)
    ap.add_argument("--inpaint_num", type=int, default=4)
    ap.add_argument("--mvd_res", type=int, default=512,
                    help="See3D MVD resolution (smoke runs shrink it)")
    ap.add_argument("--sfm_config", default="budget",
                    help="mast3r yaml: budget=200+200 iters, unposed=1000+1000")
    ap.add_argument("--align_config", default="fast",
                    help="charts yaml: fast=300 iters, default=1000")
    ap.add_argument("--json", default="logs/budget_r04.json")
    args = ap.parse_args()

    import jax

    # Persistent compile cache: repeated stages (train rounds 2-4, see3d
    # stages 2-3) and reruns after a timeout skip recompiles.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from g4splat_tpu.core.cameras import lookat_camera, stack_cameras
    from g4splat_tpu.io.images import flush_io
    from g4splat_tpu.ops.rasterize import render
    from g4splat_tpu.pipeline.orchestrator import (
        G4SplatPipeline, PipelineConfig, Priors,
    )

    t00 = time.perf_counter()
    stages = []          # (name, seconds, ok, note)
    mvd_calls = []       # (F, steps, seconds) per inpaint_latents call

    def timed(name, fn, *a, fatal=False, **kw):
        flush_io()
        t0 = time.perf_counter()
        ok, note = True, ""
        try:
            out = fn(*a, **kw)
        except Exception as e:  # noqa: BLE001
            ok, note, out = False, f"{type(e).__name__}: {e}", None
            traceback.print_exc()
            if fatal:
                stages.append((name, time.perf_counter() - t0, ok, note))
                dump()
                raise
        flush_io()
        dt = time.perf_counter() - t0
        stages.append((name, dt, ok, note))
        print(f"[budget {time.perf_counter()-t00:7.1f}s] "
              f"{name}: {dt:.1f}s {'OK' if ok else note}", flush=True)
        dump()  # persist after every stage so a timeout keeps partial data
        return out

    def dump():
        os.makedirs(os.path.dirname(args.json), exist_ok=True)
        with open(args.json, "w") as f:
            json.dump({
                "args": vars(args),
                "device": str(jax.devices()[0]),
                "stages": [
                    {"name": n, "seconds": round(s, 2), "ok": ok,
                     "note": note} for n, s, ok, note in stages],
                "mvd_calls": [
                    {"frames": F, "ddim_steps": st, "seconds": round(s, 2)}
                    for F, st, s in mvd_calls],
                "total_seconds": round(time.perf_counter() - t00, 1),
            }, f, indent=1)

    W, H = args.res, args.res * 3 // 4
    V = args.views

    # ---------------------------------------------------------- GT scene
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
        out = render(cam, gt, backend="pallas")
        imgs.append(np.asarray(out["render"]))
        d = np.array(out["surf_depth"])
        d[d <= 0] = 7.8          # far-plane fill for sky pixels
        depths.append(d)
    images = np.stack(imgs)
    depths = np.stack(depths)
    print(f"[budget {time.perf_counter()-t00:7.1f}s] GT rendered "
          f"({V} views {W}x{H})", flush=True)

    cfg = PipelineConfig(
        source_path="synthetic-budget",
        output_path=args.out,
        sfm_config=args.sfm_config,
        alignment_config=args.align_config,
        train_iterations=args.train_iters,
        select_inpaint_num=args.inpaint_num,
        n_see3d_stages=3,
        render_backend="pallas",
        mvd_resolution=args.mvd_res,
        work_size=512,
    )

    # --------------------------------------- Phase A: SfM (MASt3R ViT-L)
    def run_sfm_phase():
        from g4splat_tpu.priors.mast3r import MASt3RModel

        p = G4SplatPipeline(cfg, Priors(mast3r=MASt3RModel()))
        p.load_inputs(images)
        p.run_sfm()
        return p.timings.get("sfm")

    timed(f"sfm (MASt3R ViT-L, {args.sfm_config} schedule)", run_sfm_phase)

    # ----------------------------- Phase B: the rest, on GT poses/depths
    priors = Priors()
    pipe = G4SplatPipeline(cfg, priors)
    pipe.load_inputs(images, cameras)
    pipe.state.prior_depths = depths.copy()
    pipe.state.depths = depths.copy()

    def with_da2():
        from g4splat_tpu.priors.depth_anything import DepthAnything

        if priors.depth_model is None:
            priors.depth_model = DepthAnything()

    timed("init DA2 (vitl, random)", with_da2)
    timed(f"align_charts ({args.align_config} schedule)",
          pipe.align_charts, fatal=True)
    timed("render_chart_views", pipe.render_chart_views, fatal=True)

    def with_sam():
        from g4splat_tpu.priors.sam import SAMPredictor, sam_mask_generator

        priors.sam_generator = sam_mask_generator(SAMPredictor())

    timed("init SAM (ViT-H, random)", with_sam)
    timed("excavate_planes (SAM ViT-H)", pipe.excavate_planes)
    priors.sam_generator = None
    timed("refine_plane_depths", pipe.refine_plane_depths)
    timed(f"train_gaussians r0 ({args.train_iters} iters)",
          pipe.train_gaussians, fatal=True)

    def with_see3d():
        from g4splat_tpu.priors.clip_text import CLIPTextEmbedder
        from g4splat_tpu.priors.clip_vision import CLIPImageEmbedder
        from g4splat_tpu.priors.see3d import (
            DDIMConfig, MultiViewUNet, See3DPipeline, UNetConfig,
        )
        from g4splat_tpu.priors.vae import AutoencoderKL

        ucfg = UNetConfig()
        unet = MultiViewUNet(ucfg)
        uparams = unet.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 8, 8, ucfg.in_channels)),
            jnp.zeros(1, jnp.int32),
            jnp.zeros((1, 4, ucfg.context_dim)), num_frames=1)
        # bf16 prior params, like the reference's fp16 See3D deployment
        # (mv_diffusion.py loads torch_dtype=float16): the full random f32
        # prior set (~7.7 GB UNet+VAE+CLIP×2) plus 2M-splat render
        # transients exceeded one v5e's HBM at see3d_stage3.
        uparams = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            uparams)
        see3d = See3DPipeline(unet, uparams,
                              DDIMConfig(num_steps=args.ddim_steps))
        orig = see3d.inpaint_latents

        def spy(key, z, m, ctx, gt_num=0):
            t0 = time.perf_counter()
            out = orig(key, z, m, ctx, gt_num=gt_num)
            jax.block_until_ready(out)
            mvd_calls.append((int(z.shape[0]), args.ddim_steps,
                              time.perf_counter() - t0))
            return out

        see3d.inpaint_latents = spy
        priors.see3d = see3d

        def bf16(tree):
            return jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                tree)

        vae = AutoencoderKL()
        priors.vae = (vae, bf16(vae.init(jax.random.PRNGKey(1),
                                         jnp.zeros((1, 32, 32, 3)))))
        priors.image_embedder = CLIPImageEmbedder()
        priors.text_embedder = CLIPTextEmbedder()
        for emb in (priors.image_embedder, priors.text_embedder):
            if getattr(emb, "params", None) is not None:
                emb.params = bf16(emb.params)

    timed("init See3D SD2.1 UNet+VAE+CLIPx2 (random)", with_see3d)

    for stage in (1, 2, 3):
        timed(f"see3d_stage{stage} ({args.ddim_steps} DDIM steps, "
              f"<= {args.inpaint_num} views)",
              pipe.see3d_stage, stage)
        timed(f"refine_plane_depths s{stage}", pipe.refine_plane_depths,
              use_anchor_colors=(stage == 3))
        pcd = os.path.join(pipe.store.gaussians, "point_cloud")
        if os.path.exists(pcd):
            tag = {1: "ori", 2: "s1", 3: "s2"}[stage]
            os.rename(pcd, pcd + f"-{tag}")
        timed(f"train_gaussians r{stage} ({args.train_iters} iters)",
              pipe.train_gaussians, fatal=True)

    priors.see3d = priors.vae = None
    priors.image_embedder = priors.text_embedder = None
    timed("render_all (train+test renders)", pipe.render_all)
    timed("extract_mesh (adaptive tetra)", pipe.extract_mesh)
    timed("evaluate", pipe.evaluate, gt_images=images)
    dump()
    print(f"[budget] total {time.perf_counter()-t00:.1f}s; "
          f"wrote {args.json}", flush=True)


if __name__ == "__main__":
    main()
