"""On-chip training smoke: N iterations of the full Trainer on a synthetic
scene with densification active, pallas backend.

Validates training dynamics on real hardware beyond the CPU unit tests:
PSNR must climb, losses stay finite, densify/prune must run. Run with no
args on the TPU (~10 min incl. compiles); `--iters`/`--splats` to scale.

Reference flow being exercised: 2d-gaussian-splatting/train_with_refine_depth.py:71-490
(single-view SGD steps, clone/split/prune densification, SH schedule).
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--splats", type=int, default=40_000)
    ap.add_argument("--res", type=int, default=384)
    ap.add_argument("--backend", default="pallas")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from g4splat_tpu.core.cameras import lookat_camera, stack_cameras
    from g4splat_tpu.models.gaussians import GaussianScene
    from g4splat_tpu.ops.rasterize import render
    from g4splat_tpu.train.trainer import Trainer, TrainConfig, ViewData

    t00 = time.perf_counter()

    def mark(msg):
        print(f"[{time.perf_counter() - t00:7.1f}s] {msg}", flush=True)

    W = args.res
    H = args.res * 3 // 4
    rng = np.random.RandomState(0)
    n = args.splats
    xyz = rng.uniform(-2.5, 2.5, (n, 3)).astype(np.float32)
    cols = rng.rand(n, 3).astype(np.float32)
    scales = np.exp(rng.uniform(-4.0, -2.8, n)).astype(np.float32)
    gt = GaussianScene.from_points(xyz, cols, scales=scales,
                                   initial_opacity=0.85)
    cams = [
        lookat_camera([5.5 * np.sin(a), 0.4, -5.5 * np.cos(a)], [0, 0, 0],
                      [0, -1, 0], fx=W * 0.83, fy=W * 0.83,
                      width=W, height=H)
        for a in (0.0, 0.5, -0.5, 1.0)
    ]
    cameras = stack_cameras(cams)
    imgs, depths, normals = [], [], []
    for i in range(4):
        cam = jax.tree.map(lambda x: x[i], cameras)
        out = render(cam, gt, backend=args.backend)
        imgs.append(out["render"])
        depths.append(out["surf_depth"])
        normals.append(out["rend_normal"])
    views = ViewData(
        image=jnp.stack(imgs), prior_depth=jnp.stack(depths),
        prior_normal=jnp.stack(normals),
        prior_curv=jnp.zeros((4, H, W)), confidence=jnp.ones((4, H, W)),
        color_weight=jnp.ones(4), scale_factor=jnp.asarray(10.0),
    )
    jax.block_until_ready(views.image)
    mark("GT views rendered")

    m = max(n * 3 // 4, 8)
    sel = rng.choice(n, m, replace=False)
    init = GaussianScene.from_points(
        xyz[sel] + 0.02 * rng.randn(m, 3).astype(np.float32),
        np.full((m, 3), 0.5, np.float32),
        capacity=2 * m,
        scales=scales[sel] * 1.5,
        initial_opacity=0.5,
    )
    cfg = TrainConfig(
        iterations=args.iters, backend=args.backend, use_mip_filter=False,
        use_depth_order=False,
        densify_from_iter=args.iters // 6,
        densify_until_iter=args.iters * 5 // 6,
        densification_interval=args.iters // 6,
        opacity_reset_interval=10 ** 9,
        sh_increase_interval=args.iters // 3, spatial_lr_scale=2.5,
    )
    tr = Trainer(init, cameras, views, cfg)
    m0 = tr.step()
    mark(f"first step (compile): psnr={m0['psnr']:.2f}")
    last = m0
    for i in range(args.iters - 1):
        sync = (i + 2) % max(args.iters // 6, 1) == 0
        last = tr.step(sync_metrics=sync)
        if sync:
            mark(f"iter {i + 2}: psnr={last['psnr']:.2f} "
                 f"loss={last['loss']:.4f} n={int(last['n_alive'])}")
    mark(f"FINAL psnr {m0['psnr']:.2f} -> {last['psnr']:.2f}  "
         f"n_alive {int(m0['n_alive'])} -> {int(last['n_alive'])}")
    assert np.isfinite(last["loss"]), "non-finite loss"
    # The default regime (300 iters on-chip) gains ~2 dB; short CPU runs
    # only need to show the loss is actually descending.
    min_gain = 1.0 if args.iters >= 150 else 0.0
    gain = last["psnr"] - m0["psnr"]
    assert gain > min_gain, f"PSNR gain {gain:.2f} <= {min_gain}"
    print("TRAIN SMOKE OK")


if __name__ == "__main__":
    main()
