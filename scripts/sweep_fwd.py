"""In-process A/B sweep of forward-path variants on the real chip."""
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, ".")

from bench import build_scene
from g4splat_tpu.core.cameras import lookat_camera
from g4splat_tpu.ops.rasterize import render
from g4splat_tpu.ops.rasterize_common import RenderConfig, preprocess
from g4splat_tpu.ops.rasterize_tiled import bin_splats
from g4splat_tpu.ops.rasterize_pallas import (
    _pack_entries, _rasterize_tiles_pallas, CHUNK,
)


def timeit(name, f, *args, n=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:38s} {dt*1e3:8.2f} ms", flush=True)
    return out


def main():
    W, H = 768, 576
    scene = build_scene()
    cam = lookat_camera([0.0, 0.0, -6.5], [0, 0, 0], [0, -1, 0],
                        fx=600.0, fy=600.0, width=W, height=H)
    cfg = RenderConfig()

    prep_fn = jax.jit(lambda s: preprocess(
        cam, xyz=s.xyz, scaling=s.scaling(), rotation_raw=s.rotation_raw,
        opacity=s.opacity(), features=s.features(),
        sh_degree=s.active_sh_degree, config=cfg))
    prep = timeit("preprocess", prep_fn, scene)

    # --- binning variants -------------------------------------------------
    for cap in (16, 8):
        bin_fn = jax.jit(lambda p, c=cap: bin_splats(
            p, W, H, max_tiles_per_splat=c))
        b = timeit(f"bin_splats cap={cap}", bin_fn, prep)
        print(f"    dropped={int(b.n_dropped)} "
              f"real_entries={int(jnp.sum(b.tile_count))}", flush=True)
    binning = jax.jit(lambda p: bin_splats(p, W, H))(prep)
    n_tiles = ((W + 15) // 16) * ((H + 15) // 16)

    # --- pack variants ----------------------------------------------------
    ev = binning.tile_id < n_tiles
    timeit("pack col-gather (current)",
           jax.jit(lambda p, b: _pack_entries(p, b.gauss_id, ev)),
           prep, binning)

    def pack_rows(p, gid):
        P = p.depth.shape[0]
        opa = jnp.where(p.valid, p.opacity, 0.0)
        table = jnp.concatenate(
            [p.T.reshape(P, 9), p.center, opa[:, None], p.rgb, p.normal,
             jnp.zeros((P, 24 - 18))], axis=1).astype(jnp.float32)
        return jnp.take(table, gid, axis=0).T

    timeit("pack row-gather+T", jax.jit(pack_rows), prep, binning.gauss_id)

    def pack_cols_bf16(p, gid):
        P = p.depth.shape[0]
        opa = jnp.where(p.valid, p.opacity, 0.0)
        table = jnp.concatenate(
            [p.T.reshape(P, 9), p.center, opa[:, None], p.rgb, p.normal,
             jnp.zeros((P, 24 - 18))], axis=1)
        out = jnp.take(table.T.astype(jnp.bfloat16), gid, axis=1)
        return out.astype(jnp.float32)

    timeit("pack col-gather bf16->f32",
           jax.jit(pack_cols_bf16), prep, binning.gauss_id)

    # --- kernel variants --------------------------------------------------
    comb = jax.jit(lambda p, b: _pack_entries(p, b.gauss_id, ev))(prep, binning)
    pad = (-comb.shape[1]) % CHUNK
    if pad:
        comb = jnp.pad(comb, ((0, 0), (0, pad)))
    n_chunks_max = comb.shape[1] // CHUNK
    bg = jnp.zeros(3)
    for aux in (True, False):
        kern_fn = jax.jit(lambda g, ts, tc, a=aux: _rasterize_tiles_pallas(
            g, ts, tc, bg, W, H, cfg.near, cfg.far, n_chunks_max, a))
        timeit(f"pallas kernel want_aux={aux}", kern_fn, comb,
               binning.tile_start, binning.tile_count)

    # --- full forward -----------------------------------------------------
    for aux in (True, False):
        full_fn = jax.jit(lambda s, a=aux: render(
            cam, s, backend="pallas", need_aux=a)["render"])
        timeit(f"full forward need_aux={aux}", full_fn, scene)


if __name__ == "__main__":
    main()
