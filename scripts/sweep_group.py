"""On-chip A/B of RASTER_GROUP and CHUNK for the slim forward kernel."""
import sys
import time

sys.path.insert(0, ".")

import jax

from bench import build_scene
from g4splat_tpu.core.cameras import lookat_camera
import g4splat_tpu.ops.rasterize_pallas as rp
from g4splat_tpu.ops.rasterize import render
from g4splat_tpu.ops.rasterize_common import RenderConfig


def timeit(name, f, *args, n=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:42s} {dt*1e3:8.2f} ms", flush=True)
    return out


def main():
    W, H = 768, 576
    scene = build_scene()
    cam = lookat_camera([0.0, 0.0, -6.5], [0, 0, 0], [0, -1, 0],
                        fx=600.0, fy=600.0, width=W, height=H)
    cfg = RenderConfig()

    for group in (2, 4, 8, 16):
        rp.RASTER_GROUP = group
        f = jax.jit(lambda s: render(
            cam, s, backend="pallas", need_aux=False, config=cfg)["render"])
        timeit(f"slim group={group}", f, scene)
        # aux path too (training forward)
        g = jax.jit(lambda s: render(
            cam, s, backend="pallas", need_aux=True, config=cfg)["render"])
        timeit(f"aux  group={group}", g, scene)
    rp.RASTER_GROUP = 4


if __name__ == "__main__":
    main()
