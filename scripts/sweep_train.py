"""In-process A/B sweep of the FULL jitted train step at bench scale.

Times `trainer.train_step` (render -> 8 losses -> backward -> optax -> stat
accumulation) at 200k splats / 768x576 on one chip under binning variants,
plus a render-grad-only ablation of the ellipse prune. All variants measured
within ONE process (cross-process timings drift +-1.5 ms on the tunnel).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, ".")

from bench import build_scene
from g4splat_tpu.core.cameras import lookat_camera
from g4splat_tpu.ops.rasterize import render
from g4splat_tpu.ops.rasterize_common import RenderConfig
from g4splat_tpu.train.densify import DensifyState
from g4splat_tpu.train.trainer import (
    TrainConfig,
    make_optimizer,
    scene_params,
    train_step,
)


def timeit(name, f, *args, n=10):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt*1e3:8.2f} ms", flush=True)
    return out


def main():
    W, H = 768, 576
    scene = build_scene()
    cam = lookat_camera([0.0, 0.0, -6.5], [0, 0, 0], [0, -1, 0],
                        fx=600.0, fy=600.0, width=W, height=H)
    rng = np.random.RandomState(0)
    view = {
        "image": jnp.asarray(rng.rand(H, W, 3), jnp.float32),
        "prior_depth": jnp.asarray(rng.rand(H, W) + 3.0, jnp.float32),
        "prior_normal": jnp.asarray(rng.randn(H, W, 3), jnp.float32),
        "prior_curv": jnp.zeros((H, W)),
        "confidence": jnp.ones((H, W)),
        "color_weight": jnp.asarray(1.0),
        "scale_factor": jnp.asarray(10.0),
    }
    key = jax.random.PRNGKey(0)
    it = jnp.asarray(2000, jnp.int32)

    variants = [
        ("default", TrainConfig(backend="pallas")),
        ("rank-bin", TrainConfig(backend="pallas", depth_rank_binning=True)),
        ("no-depth-order", TrainConfig(backend="pallas",
                                       use_depth_order=False)),
        ("global-depth-order", TrainConfig(backend="pallas",
                                           depth_order_sample="global")),
    ]
    for tag, cfg in variants:
        # train_step donates its state args — give each variant its own copy
        # (and keep the pristine `scene` for the ablation below).
        scene_v = jax.tree.map(jnp.copy, scene)
        optimizer = make_optimizer(cfg)
        opt_state = optimizer.init(scene_params(scene_v))
        dstate = DensifyState.zero(scene_v.capacity)

        # Sync by FETCHING a loss scalar, not block_until_ready: with
        # donated state args the remote-tunneled runtime has reported
        # aliased/step outputs ready before the step finished, under-
        # measuring ~100x (observed 0.73 ms for a step that costs ~80 ms
        # when timed via host transfer or via the non-donating grad timings
        # below). A device->host float() cannot return early.
        def run(s, o, d, c=cfg, op=optimizer):
            return train_step(s, o, d, cam, view, it, key, c, op)

        *state, m = run(scene_v, opt_state, dstate)
        _ = float(m["loss"])
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            *state, m = run(*state)
        _ = float(m["loss"])
        print(f"train_step {tag:32s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms",
              flush=True)

    # Ablations on the render+grad path alone (the train loss closure pins
    # RenderConfig, so ablate through a direct loss). buf_factor exactness
    # requires n_dropped == 0 — printed alongside.
    from g4splat_tpu.ops.rasterize_common import preprocess
    from g4splat_tpu.ops.rasterize_tiled import bin_splats

    prep = jax.jit(lambda s: preprocess(
        cam, xyz=s.xyz, scaling=s.scaling(), rotation_raw=s.rotation_raw,
        opacity=s.opacity(), features=s.features(),
        sh_degree=s.active_sh_degree, config=RenderConfig()))(scene)
    for bf in (4, 3, 2):
        d = int(jax.jit(lambda p, b=bf: bin_splats(
            p, W, H, buf_size=b * p.depth.shape[0]).n_dropped)(prep))
        print(f"buf_factor={bf}: n_dropped={d}", flush=True)

    ablations = [("prune=False", RenderConfig(tile_ellipse_prune=False)),
                 ("default", RenderConfig()),
                 ("buf3", RenderConfig(buf_factor=3)),
                 ("buf3+rank", RenderConfig(buf_factor=3,
                                            depth_rank_binning=True))]
    for tag, cfgr in ablations:
        def loss(xyz, c=cfgr):
            out = render(cam, scene.replace(xyz=xyz), backend="pallas",
                         config=c)
            return (jnp.mean(out["render"]) + jnp.mean(out["rend_dist"])
                    + jnp.mean(out["surf_depth"]))

        g = jax.jit(jax.grad(loss))
        timeit(f"render fwd+bwd {tag}", g, scene.xyz)


if __name__ == "__main__":
    main()
