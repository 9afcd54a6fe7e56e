"""Decompose the rasterizer BACKWARD at the budget shape (round-5 ask #1).

The r04 profile attributed ~430 ms of the 654 ms train step to "backward"
as one opaque number. This probe splits it into the actual pieces of
rasterize_pallas._render_pallas_bwd + the AD chain around it:

  fwd_residuals     _render_pallas_impl(return_residuals) — what the VJP fwd
                    pays (binning + pack + aux kernel)
  cot_assembly      the (H, W, 16) concat + _disassemble tile relayout
  bwd_kernel        rasterize_backward_pallas alone (residuals fixed)
  entry_mask        entry_valid & in_support masking of (24, E)
  scatter_add       (E, 18) .at[gid].add into (P, 18)
  prep_chain        AD of preprocess: d_prep -> d{xyz, scaling, rot, ...}
  loss_math_bwd     value_and_grad of the image-space loss given render outs

Writes logs/profile_bwd_r05.json.
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
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--json", default="logs/profile_bwd_r05.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from g4splat_tpu.core.cameras import lookat_camera
    from g4splat_tpu.io.ply import load_gaussian_ply
    from g4splat_tpu.ops.rasterize_common import RenderConfig, preprocess
    from g4splat_tpu.ops import rasterize_pallas as RP
    from g4splat_tpu.ops.rasterize_pallas_bwd import (
        MAX_CHUNKS_PER_TILE, rasterize_backward_pallas,
    )
    from g4splat_tpu.ops.rasterize_tiled import bin_splats
    from g4splat_tpu.ops.rasterize_common import TILE

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

    cam = lookat_camera([4.8 * np.sin(-0.5), 0.3 + 0.2 * np.cos(-1.0),
                         -4.8 * np.cos(-0.5)],
                        [0, 0, 0], [0, -1, 0], fx=W * 0.9, fy=W * 0.9,
                        width=W, height=H)
    cfg = RenderConfig(depth_ratio=0.5, compute_distortion=False)

    prep_fn = jax.jit(lambda s: preprocess(
        cam, xyz=s.xyz, scaling=s.scaling(), rotation_raw=s.rotation_raw,
        opacity=s.opacity(), features=s.features(),
        sh_degree=s.active_sh_degree, config=cfg))
    prep = timeit("preprocess_fwd", prep_fn, scene)

    binning = timeit("bin_splats",
                     jax.jit(lambda p: bin_splats(p, W, H)), prep)
    gx = (W + TILE - 1) // TILE
    gy = (H + TILE - 1) // TILE
    n_tiles = gx * gy
    E = int(binning.gauss_id.shape[0])
    real = int(jnp.sum(binning.tile_id < n_tiles))
    out["E_buf"] = E
    out["E_real"] = real
    out["n_dropped"] = int(binning.n_dropped)
    print(f"E buffer {E}, real {real}, dropped {out['n_dropped']}",
          flush=True)

    # ---- the VJP fwd: impl with residuals (bin + pack + aux kernel nodist)
    bgv = jnp.zeros(3, jnp.float32)

    def fwd_res(p):
        return RP._render_pallas_impl(W, H, p, bgv, return_residuals=True,
                                      want_dist=False)

    (outputs, residuals) = timeit("fwd_with_residuals",
                                  jax.jit(fwd_res), prep)
    binning2, comb, entry_valid, aux_tail = jax.block_until_ready(residuals)

    # pack_entries alone
    timeit("pack_entries", jax.jit(
        lambda p, b: RP._pack_entries(p, b.gauss_id, None)), prep, binning)

    # ---- cotangents: random image-space grads
    rng = np.random.RandomState(0)
    g_img = jnp.asarray(rng.randn(H, W, 16) * 1e-3, jnp.float32)

    def cot_assembly(gi):
        return RP._disassemble(gi, gx, gy, W, H)

    cot = timeit("cot_assembly", jax.jit(cot_assembly), g_img)

    # ---- bwd kernel alone
    def bwd_kernel(c, ts, tc, ct, at):
        return rasterize_backward_pallas(
            c, ts, tc, ct, at, bgv, W, H, 0.01, 100.0, want_dist=False)

    dcomb = timeit("bwd_kernel", jax.jit(bwd_kernel), comb,
                   binning2.tile_start, binning2.tile_count, cot, aux_tail)

    # ---- entry mask + scatter-add (as in _render_pallas_bwd)
    gid = binning2.gauss_id
    P = int(prep.depth.shape[0])

    def scatter(dc, b, ev, valid):
        pos = jnp.arange(E, dtype=jnp.int32)
        tile_of = jnp.clip(b.tile_id, 0, n_tiles - 1)
        start_of = b.tile_start[tile_of]
        abase_of = (start_of // 128) * 128
        in_support = (pos - abase_of) < MAX_CHUNKS_PER_TILE * 128
        ok = ev & in_support
        dc = jnp.where(ok[None, :], dc[:, :E], 0.0)
        safe_gid = jnp.where(ok, b.gauss_id, 0)
        d_opa = jnp.where(valid[safe_gid] & ok, dc[11, :], 0.0)
        d_all = jnp.concatenate([dc[:11, :], d_opa[None], dc[12:18, :]],
                                axis=0).T
        return jnp.zeros((P, 18), jnp.float32).at[safe_gid].add(
            d_all, mode="drop")

    timeit("mask+scatter_add", jax.jit(scatter), dcomb, binning2,
           entry_valid, prep.valid)

    # scatter-add via unique (gid, slot) set + slot-axis reduction
    slot = binning2.slot_id
    if slot is not None:
        cap_w = int(jnp.max(slot)) + 1
        print("max slot", cap_w - 1, flush=True)

        def scatter_unique(dc, b, ev, valid):
            pos = jnp.arange(E, dtype=jnp.int32)
            tile_of = jnp.clip(b.tile_id, 0, n_tiles - 1)
            start_of = b.tile_start[tile_of]
            abase_of = (start_of // 128) * 128
            in_support = (pos - abase_of) < MAX_CHUNKS_PER_TILE * 128
            ok = ev & in_support
            dc = jnp.where(ok[None, :], dc[:, :E], 0.0)
            safe_gid = jnp.where(ok, b.gauss_id, 0)
            safe_slot = jnp.where(ok, b.slot_id, 0)
            d_opa = jnp.where(valid[safe_gid] & ok, dc[11, :], 0.0)
            d_all = jnp.concatenate([dc[:11, :], d_opa[None], dc[12:18, :]],
                                    axis=0).T                    # (E, 18)
            # unique (gid, slot) -> flat index; one unique-index scatter-SET
            flat = safe_gid * 16 + safe_slot
            grid = jnp.zeros((P * 16, 18), jnp.float32).at[flat].add(
                d_all, mode="drop")
            return grid.reshape(P, 16, 18).sum(axis=1)

        try:
            timeit("scatter_via_slotgrid", jax.jit(scatter_unique), dcomb,
                   binning2, entry_valid, prep.valid)
        except Exception as e:  # noqa: BLE001
            print("slotgrid failed:", e, flush=True)

    # ---- preprocess AD chain: given d_prep, pull back to scene params
    from g4splat_tpu.train import trainer as T

    params = T.scene_params(scene)
    d_prep_rows = jnp.asarray(rng.randn(P, 18) * 1e-3, jnp.float32)

    def prep_chain(p, acc):
        def f(p):
            s = T.with_params(scene, p)
            pr = preprocess(
                cam, xyz=s.xyz, scaling=s.scaling(),
                rotation_raw=s.rotation_raw, opacity=s.opacity(),
                features=s.features(), sh_degree=s.active_sh_degree,
                config=cfg)
            return (jnp.vdot(pr.T.reshape(P, 9), acc[:, 0:9])
                    + jnp.vdot(pr.center, acc[:, 9:11])
                    + jnp.vdot(pr.opacity, acc[:, 11])
                    + jnp.vdot(pr.rgb, acc[:, 12:15])
                    + jnp.vdot(pr.normal, acc[:, 15:18]))
        return jax.grad(f)(p)

    timeit("prep_chain_bwd", jax.jit(prep_chain), params, d_prep_rows)

    # ---- full render fwd+bwd and full losses fwd+bwd (for cross-checking)
    from g4splat_tpu.ops.rasterize import render

    def render_sum(s):
        o = render(cam, s, config=cfg, backend="pallas")
        return (jnp.sum(o["render"]) + jnp.sum(o["surf_depth"])
                + jnp.sum(o["rend_normal"]))

    def render_bwd(s):
        p = T.scene_params(s)
        return jax.grad(lambda p: render_sum(T.with_params(s, p)))(p)

    timeit("render_fwd+bwd", jax.jit(render_bwd), scene)

    os.makedirs(os.path.dirname(args.json), exist_ok=True)
    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.json, flush=True)


if __name__ == "__main__":
    main()
