"""Decompose the budget-run train step (654 ms/iter at 2.4M capacity).

Loads the budget run's trained point cloud (1.87M alive splats, padded the
same way scripts/probe_scaling.py pads it), builds the budget cameras
(512x384), and times each stage of the fused train step on the real chip:

  render fwd            preprocess + binning + pack + pallas fwd kernel
  loss fwd              compute_losses (all 8 losses) forward only
  loss fwd+bwd          value_and_grad of compute_losses
  full train step       trainer.train_step (losses + Adam + stats update)

plus the splat-linear prefix components individually, so the 654 ms has an
attribution. Writes logs/profile_budget_step_r04.json.
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
    ap.add_argument("--ply", default="/tmp/budget_run/free_gaussians/"
                    "point_cloud/iteration_600/point_cloud.ply")
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--views", type=int, default=5)
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--json", default="logs/profile_budget_step_r05.json")
    ap.add_argument("--quick", action="store_true",
                    help="skip the render_fwd variants; just the step rows")
    ap.add_argument("--compact_w", type=int, default=8)
    ap.add_argument("--cap", type=int, default=16)
    ap.add_argument("--backend", default="pallas",
                    help="trainer backend (r04 accidentally profiled the "
                    "TrainConfig default 'tiled'; production is pallas)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from g4splat_tpu.core.cameras import lookat_camera, stack_cameras
    from g4splat_tpu.io.ply import load_gaussian_ply
    from g4splat_tpu.ops.rasterize import render
    from g4splat_tpu.ops.rasterize_common import RenderConfig, preprocess
    from g4splat_tpu.ops.rasterize_tiled import bin_splats
    from g4splat_tpu.train.trainer import (
        TrainConfig, Trainer, ViewData,
    )

    out = {}

    def rec(name, ms):
        out[name] = round(ms, 2)
        print(f"{name:28s} {ms:8.2f} ms", flush=True)

    def timeit(name, f, *a, n=args.n):
        r = f(*a)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*a)
        jax.block_until_ready(r)
        rec(name, (time.perf_counter() - t0) / n * 1e3)
        return r

    W, H = args.res, args.res * 3 // 4
    scene = load_gaussian_ply(args.ply)
    n_pts = int(scene.xyz.shape[0])
    scene = load_gaussian_ply(args.ply, capacity=n_pts * 13 // 10)
    print(f"scene: {n_pts} alive, capacity {scene.xyz.shape[0]}", flush=True)
    out["alive"] = n_pts
    out["capacity"] = int(scene.xyz.shape[0])

    cams = [
        lookat_camera([4.8 * np.sin(a), 0.3 + 0.2 * np.cos(2 * a),
                       -4.8 * np.cos(a)],
                      [0, 0, 0], [0, -1, 0], fx=W * 0.9, fy=W * 0.9,
                      width=W, height=H)
        for a in np.linspace(-0.5, 0.5, args.views)
    ]
    cameras = stack_cameras(cams)
    cam0 = jax.tree.map(lambda x: x[0], cameras)

    cfg = RenderConfig(depth_ratio=0.5)

    # ---------------------------------------------- splat-linear components
    prep_fn = jax.jit(lambda s: preprocess(
        cam0, xyz=s.xyz, scaling=s.scaling(), rotation_raw=s.rotation_raw,
        opacity=s.opacity(), features=s.features(),
        sh_degree=s.active_sh_degree, config=cfg))
    prep = timeit("preprocess", prep_fn, scene)
    timeit("bin_splats", jax.jit(lambda p: bin_splats(p, W, H)), prep)

    # ------------------------------------------------------------ render fwd
    rfwd = jax.jit(lambda s: render(cam0, s, config=cfg,
                                    backend="pallas")["render"])
    timeit("render_fwd", rfwd, scene)

    # Binning variants at this shape (bench.py self-selects these on the
    # bench scene; the budget scene is 12x the splats at 0.44x the pixels).
    for name, kw in ([] if args.quick else [
        ("render_fwd_nodist", dict(compute_distortion=False)),
        ("render_fwd_rankbin", dict(depth_rank_binning=True)),
        ("render_fwd_cap8", dict(max_tiles_per_splat=8)),
    ]):
        c2 = RenderConfig(depth_ratio=0.5, **kw)
        f = jax.jit(lambda s, c2=c2: render(cam0, s, config=c2,
                                            backend="pallas")["render"])
        try:
            timeit(name, f, scene)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: {type(e).__name__}: {e}", flush=True)
    out["compact_w"] = args.compact_w
    out["cap"] = args.cap

    # --------------------------------------------------------- training step
    img = np.asarray(rfwd(scene))
    d = np.array(jax.jit(
        lambda s: render(cam0, s, config=cfg,
                         backend="pallas")["surf_depth"])(scene))
    d[d <= 0] = 7.8
    V = args.views
    views = ViewData(
        image=jnp.tile(jnp.asarray(img)[None], (V, 1, 1, 1)),
        prior_depth=jnp.tile(jnp.asarray(d)[None], (V, 1, 1)),
        prior_normal=jnp.zeros((V, H, W, 3)),
        prior_curv=jnp.zeros((V, H, W)), confidence=jnp.ones((V, H, W)),
        color_weight=jnp.ones(V), scale_factor=jnp.asarray(1.0),
    )
    tcfg = TrainConfig(iterations=10 ** 6, densify_until_iter=10 ** 9,
                       opacity_reset_interval=10 ** 9, spatial_lr_scale=1.0,
                       backend=args.backend,
                       raster_compact_width=args.compact_w,
                       raster_max_tiles_per_splat=args.cap)
    tr = Trainer(scene, cameras, views, tcfg, seed=0)
    tcfg = tr.cfg      # auto-tuned raster_buf_size (measured real entries)
    out["raster_buf_size"] = int(tcfg.raster_buf_size)
    print("auto-tuned buf_size:", out["raster_buf_size"], flush=True)

    from g4splat_tpu.train import trainer as T

    cam, view = tr._view_slice(0)
    it = jnp.asarray(1000)
    key = jax.random.PRNGKey(0)

    loss_fwd = jax.jit(lambda s: T.compute_losses(
        s, cam, view, tcfg, it, key, jnp.zeros((s.capacity, 2)))[0])
    timeit("losses_fwd", loss_fwd, tr.scene)

    # Pure render backward (no losses): grad of a sum over the color +
    # depth + normal channels — isolates the rasterizer fwd+bwd from the
    # image-space loss math.
    def render_sum(s):
        o = render(cam, s, config=RenderConfig(
            bg=jnp.zeros(3), depth_ratio=0.5, compute_distortion=False),
            backend="pallas")
        return (jnp.sum(o["render"]) + jnp.sum(o["surf_depth"])
                + jnp.sum(o["rend_normal"]))

    def render_bwd(s):
        p = T.scene_params(s)
        return jax.grad(lambda p: render_sum(T.with_params(s, p)))(p)

    timeit("render_fwd+bwd_only", jax.jit(render_bwd), tr.scene)

    def loss_bwd(s):
        p = T.scene_params(s)

        def f(p, off):
            return T.compute_losses(T.with_params(s, p), cam, view, tcfg,
                                    it, key, off)[0]
        return jax.grad(f, argnums=(0, 1))(p, jnp.zeros((s.capacity, 2)))

    timeit("losses_fwd+bwd", jax.jit(loss_bwd), tr.scene)

    def full_step(s, opt, dstate):
        return T.train_step(s, opt, dstate, cam, view, it, key, tcfg,
                            tr.optimizer)

    fs = jax.jit(full_step)
    r = fs(tr.scene, tr.opt_state, tr.dstate)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(args.n):
        r = fs(tr.scene, tr.opt_state, tr.dstate)
    jax.block_until_ready(r)
    rec("full_train_step", (time.perf_counter() - t0) / args.n * 1e3)

    os.makedirs(os.path.dirname(args.json), exist_ok=True)
    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.json, flush=True)


if __name__ == "__main__":
    main()
