"""DP wall-clock A/B (VERDICT r3 ask #7): same scene, equal view-visits.

Arms (both on the virtual CPU mesh unless --iters/--dp_iters overridden):
  single : Trainer(mesh=None), N single-view steps (the reference's
           per-iteration semantics, train_with_refine_depth.py:362-632)
  dp8    : Trainer(mesh=8-device data mesh), N/8 steps x 8 views/step
           (one view per device, grads pmean'd — make_dp_train_step)

Equal total view-visits, so equal optimization work; records final PSNR on
the training views for both arms plus per-step wall time.  The CPU mesh is
8 virtual devices on one core, so CPU per-step times show the SHAPE of the
scaling only; the real-chip per-step milliseconds and the ICI allreduce
model live in BUDGET.md (sweep_train.py measures the chip step).

The plain dp8 arm gets 8x fewer Adam steps than single — the round-4 run
showed that costs real quality (13.8 vs 27.3 dB PSNR). ``dp8_lr`` applies
the sqrt-batch learning-rate scaling rule (x sqrt(8) on every param group)
to recover it; ``--arms`` selects which arms run (results merge into the
JSON so arms can run in separate invocations on this 1-core box).

Writes logs/ab_dp_r04.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
# NOTE: no --xla_cpu_multi_thread_eigen=false here (unlike tests/conftest):
# a single-threaded thunk executor deadlocks 8-device all-reduce rendezvous
# (collective participants must run concurrently).
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--points", type=int, default=300)
    ap.add_argument("--arms", default="single,dp8,dp8_lr")
    ap.add_argument("--json", default="logs/ab_dp_r04.json")
    args = ap.parse_args()
    arms = set(args.arms.split(","))

    import jax

    jax.config.update("jax_platforms", "cpu")
    # Persistent compile cache (tests/conftest.py): this 1-core box is
    # compile-dominated; warm runs skip straight to execution.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from g4splat_tpu.eval.synthetic import box_room, room_cameras
    from g4splat_tpu.ops.rasterize import render
    from g4splat_tpu.train.trainer import Trainer, TrainConfig, ViewData

    V = 8
    W, H = args.res, args.res * 3 // 4
    gt, _ = box_room(points_per_m2=args.points)
    cameras = room_cameras(V, W, H)
    imgs, depths, normals = [], [], []
    for i in range(V):
        cam = jax.tree.map(lambda x: x[i], cameras)
        out = render(cam, gt, backend="tiled")
        imgs.append(out["render"])
        d = np.array(out["surf_depth"])
        d[d <= 0] = 3.2
        depths.append(jnp.asarray(d))
        normals.append(out["rend_normal"])
    views = ViewData(
        image=jnp.stack(imgs), prior_depth=jnp.stack(depths),
        prior_normal=jnp.stack(normals),
        prior_curv=jnp.zeros((V, H, W)), confidence=jnp.ones((V, H, W)),
        color_weight=jnp.ones(V), scale_factor=jnp.asarray(1.0),
    )

    # Perturbed init: GT positions jittered, flat gray, inflated disks.
    rng = np.random.RandomState(1)
    n0 = gt.num_alive if isinstance(gt.num_alive, int) else int(gt.num_alive)
    from g4splat_tpu.models.gaussians import GaussianScene

    xyz = np.asarray(gt.xyz[:n0]) + 0.01 * rng.randn(n0, 3).astype(np.float32)
    init = lambda: GaussianScene.from_points(  # noqa: E731
        xyz, np.full((n0, 3), 0.5, np.float32), capacity=2 * n0,
        initial_opacity=0.5)

    def psnr_all(scene):
        vals = []
        for i in range(V):
            cam = jax.tree.map(lambda x: x[i], cameras)
            img = render(cam, scene, backend="tiled")["render"]
            mse = float(jnp.mean((img - views.image[i]) ** 2))
            vals.append(10 * np.log10(1.0 / max(mse, 1e-10)))
        return float(np.mean(vals))

    cfg = TrainConfig(iterations=args.iters, densify_until_iter=args.iters // 2,
                      opacity_reset_interval=10 ** 9,
                      normal_consistency_from=args.iters // 2,
                      distortion_from=args.iters // 4,
                      spatial_lr_scale=1.0)

    results = {}
    if os.path.exists(args.json):
        with open(args.json) as f:
            results = json.load(f)

    def run_arm(name, trainer_cfg, n_steps, mesh=None, extra=None):
        tr = Trainer(init(), cameras, views, trainer_cfg, seed=0, mesh=mesh)
        t0 = time.perf_counter()
        tr.train(n_steps)
        dt = time.perf_counter() - t0
        sc = jax.tree.map(lambda x: np.asarray(x), tr.scene)
        results[name] = {
            "iters": n_steps, "views_per_step": 8 if mesh else 1,
            "wall_s": round(dt, 2),
            "ms_per_step": round(dt / n_steps * 1e3, 1),
            "psnr": round(psnr_all(sc), 3), **(extra or {}),
        }
        print(f"{name}:", results[name], flush=True)

    # ------------------------------------------------- arm A: single device
    if "single" in arms:
        run_arm("single", cfg, args.iters)

    # ------------------------------------------------------- arm B: 8-way DP
    dp_iters = args.iters // 8
    dp_kw = dict(
        iterations=dp_iters, densify_until_iter=dp_iters // 2,
        opacity_reset_interval=10 ** 9,
        normal_consistency_from=dp_iters // 2,
        distortion_from=dp_iters // 4, spatial_lr_scale=1.0)
    if "dp8" in arms:
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        run_arm("dp8", TrainConfig(**dp_kw), dp_iters, mesh=mesh)

    # ------------------- arm C: 8-way DP + sqrt-batch LR scaling (Adam rule)
    if "dp8_lr" in arms:
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        s = float(np.sqrt(8.0))
        base = TrainConfig(**dp_kw)
        cfg_lr = base.replace(
            position_lr_init=base.position_lr_init * s,
            position_lr_final=base.position_lr_final * s,
            feature_lr=base.feature_lr * s,
            opacity_lr=base.opacity_lr * s,
            scaling_lr=base.scaling_lr * s,
            rotation_lr=base.rotation_lr * s,
        )
        run_arm("dp8_lr", cfg_lr, dp_iters, mesh=mesh,
                extra={"lr_scale": round(s, 3)})

    results["note"] = (
        "equal total view-visits; CPU virtual mesh -> per-step times show "
        "scaling shape only (8 shards timeshare one core). Chip per-step ms "
        "and the ICI allreduce model: BUDGET.md.")
    os.makedirs(os.path.dirname(args.json), exist_ok=True)
    with open(args.json, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.json)


if __name__ == "__main__":
    main()
