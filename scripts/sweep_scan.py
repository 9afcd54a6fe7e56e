"""A/B the in-kernel scan implementation (MXU triangular matmul vs VPU
cumsum) for the forward and backward Pallas kernels — one process, fresh jit
per variant (rasterize_pallas.SCAN_MODE is read at trace time)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import build_scene
from g4splat_tpu.core.cameras import lookat_camera
from g4splat_tpu.ops import rasterize_pallas as RP
from g4splat_tpu.ops import rasterize_pallas_bwd as RB
from g4splat_tpu.ops.rasterize_common import RenderConfig, preprocess
from g4splat_tpu.ops.rasterize_tiled import bin_splats


def timeit(name, f, *args, n=20):
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
    cfg = RenderConfig()
    n_tiles = ((W + 15) // 16) * ((H + 15) // 16)

    prep = jax.jit(lambda s: preprocess(
        cam, xyz=s.xyz, scaling=s.scaling(), rotation_raw=s.rotation_raw,
        opacity=s.opacity(), features=s.features(),
        sh_degree=s.active_sh_degree, config=cfg))(scene)
    binning = jax.jit(lambda p: bin_splats(p, W, H))(prep)
    comb = jax.jit(lambda p, b: RP._pack_entries(
        p, b.gauss_id, b.tile_id < n_tiles))(prep, binning)
    comb_slim = jax.jit(lambda p, b: RP._pack_entries(
        p, b.gauss_id, b.tile_id < n_tiles))(prep, binning)
    pad = (-comb.shape[1]) % RP.CHUNK
    if pad:
        comb = jnp.pad(comb, ((0, 0), (0, pad)))
        comb_slim = jnp.pad(comb_slim, ((0, 0), (0, pad)))
    n_chunks_max = comb.shape[1] // RP.CHUNK
    bg = jnp.zeros(3)

    outs = {}
    for mode in ("matmul", "cumsum"):
        RP.SCAN_MODE = mode
        kern = jax.jit(
            lambda g, ts, tc, m=n_chunks_max: RP._rasterize_tiles_pallas
            .__wrapped__(g, ts, tc, bg, W, H, cfg.near, cfg.far, m, True))
        o = timeit(f"fwd kernel aux  scan={mode}", kern, comb,
                   binning.tile_start, binning.tile_count)
        outs[mode] = o
        kern_s = jax.jit(
            lambda g, ts, tc, m=n_chunks_max: RP._rasterize_tiles_pallas
            .__wrapped__(g, ts, tc, bg, W, H, cfg.near, cfg.far, m, False))
        timeit(f"fwd kernel slim scan={mode}", kern_s, comb_slim,
               binning.tile_start, binning.tile_count)

    dv = max(float(jnp.max(jnp.abs(outs["matmul"][0] - outs["cumsum"][0]))),
             float(jnp.max(jnp.abs(outs["matmul"][1][..., :5]
                                   - outs["cumsum"][1][..., :5]))))
    print(f"fwd max |matmul - cumsum| (vals + aux[:5]): {dv:.3e}")

    # backward kernel
    aux_tail = outs["matmul"][1][..., 4:8]
    rng = np.random.RandomState(0)
    cot = jnp.asarray(rng.rand(n_tiles, 256, 16), jnp.float32) * 1e-3
    douts = {}
    for mode in ("matmul", "cumsum"):
        RP.SCAN_MODE = mode
        f = jax.jit(lambda c, ts, tc, co, at: RB.rasterize_backward_pallas
                    .__wrapped__(c, ts, tc, co, at, bg, W, H,
                                 cfg.near, cfg.far))
        douts[mode] = timeit(f"bwd kernel scan={mode}", f, comb,
                             binning.tile_start, binning.tile_count,
                             cot, aux_tail, n=10)
    d = jnp.abs(douts["matmul"] - douts["cumsum"])
    rel = float(jnp.max(d) / (jnp.max(jnp.abs(douts["matmul"])) + 1e-12))
    print(f"bwd max |matmul - cumsum| rel: {rel:.3e}")


if __name__ == "__main__":
    main()
