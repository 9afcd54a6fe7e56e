"""Benchmark: differentiable surfel rasterizer throughput on TPU.

Renders a synthetic 200k-splat indoor-like scene at 768×576 (the reference's
eval resolution class) and reports steady-state frames/sec for the forward
render.

Baseline anchor: 180 FPS — an A100-class estimate for the reference CUDA
diff-surfel-rasterization forward at this exact shape, derived from published
3DGS numbers with the arithmetic shown in BASELINE.md §"Derived rasterizer
anchor" (3DGS ≈130 FPS at ≈1.0 MP/3M splats on A6000 → ×2.3 pixel scaling to
0.44 MP → ×0.6 2DGS surfel-kernel overhead; the ≥6× splat-count advantage and
the A100>A6000 bandwidth edge are left as margin). The reference repo itself
publishes no number. vs_baseline = measured_fps / 180.

Prints exactly one JSON line. Falls back through pallas → tiled backends and
reports which one ran.
"""

import json
import sys
import time

import numpy as np


def build_scene(n=200_000, seed=0):
    """Room-like shell: points on walls/floor plus interior clutter.

    Built host-side with numpy so the only device compiles are the render
    path under test (eager jax.random scene construction was an extra
    highly-variable XLA compile through the remote-compile relay)."""
    from g4splat_tpu.models.gaussians import GaussianScene

    rng = np.random.RandomState(seed)
    xyz = rng.uniform(-3.0, 3.0, (n, 3)).astype(np.float32)
    wall = rng.randint(0, 8, n)
    xyz[wall == 0, 2] = 3.0
    cols = rng.rand(n, 3).astype(np.float32)
    scales = np.exp(rng.uniform(-4.5, -3.0, n)).astype(np.float32)
    quats = rng.randn(n, 4).astype(np.float32)
    return GaussianScene.from_points(
        xyz, cols, scales=scales, quats=quats, initial_opacity=0.8,
    )


def main():
    import jax
    import jax.numpy as jnp

    from g4splat_tpu.core.cameras import lookat_camera
    from g4splat_tpu.ops.rasterize import render

    W, H = 768, 576
    scene = build_scene()
    cam = lookat_camera(
        [0.0, 0.0, -6.5], [0, 0, 0], [0, -1, 0],
        fx=600.0, fy=600.0, width=W, height=H,
    )

    from g4splat_tpu.ops.rasterize import RenderConfig

    # Inference benchmark: need_aux=False selects the slim forward kernel
    # (identical "render" output; skips the distortion-moment scan and
    # n_contrib bookkeeping that only gradients consume). Other backends get
    # the same effect from XLA dead-code elimination of the unused outputs.
    # Both binning variants are parity-tested (tests/test_rasterize.py::
    # TestDepthRankBinning); whichever is faster on this chip wins.
    # All candidates are output-identical (row-compacted binning is exact —
    # drops are counted and the parity tests cover every variant); the race
    # just picks the fastest on this chip.
    candidates = [
        ("pallas", "", RenderConfig()),
        ("pallas", "_noprune", RenderConfig(tile_ellipse_prune=False)),
        ("pallas", "_rankbin", RenderConfig(depth_rank_binning=True)),
        # Capacity-trim variants: identical output iff nothing drops — the
        # n_dropped gate below rejects them otherwise (r4 VERDICT #8).
        ("pallas", "_bf3", RenderConfig(buf_factor=3)),
        ("pallas", "_cap8bf3", RenderConfig(max_tiles_per_splat=8,
                                            buf_factor=3)),
        ("pallas", "_cw4", RenderConfig(binning_compact_width=4)),
        ("tiled", "", RenderConfig()),
    ]
    best = None  # (fps, backend, variant)
    base_drops = None  # default-config drop count (the first candidate)
    for backend, variant, config in candidates:
        if best is not None and backend != best[1]:
            break  # pallas ran; skip the fallback backend
        try:
            drops = int(render(cam, scene, backend=backend, need_aux=False,
                               config=config)["n_dropped"])
            if base_drops is None:
                # The bench scene's densest tiles drop a handful of entries
                # under the DEFAULT config already (cap/compaction-owned —
                # 52 at 200k splats, PARITY.md); the gate is therefore
                # baseline-RELATIVE: a trimmed variant is admitted only if
                # it drops no more than the default config does.
                base_drops = drops
            elif drops > base_drops:
                print(f"# {backend}{variant}: {drops} dropped entries vs "
                      f"baseline {base_drops} — not output-identical, "
                      "skipped", file=sys.stderr)
                continue
            f = jax.jit(lambda s, b=backend, c=config: render(
                cam, s, backend=b, need_aux=False, config=c)["render"])
            f(scene).block_until_ready()
            n_iter = 20
            t0 = time.perf_counter()
            for _ in range(n_iter):
                img = f(scene)
            img.block_until_ready()
            fps = n_iter / (time.perf_counter() - t0)
            if best is None or fps > best[0]:
                best = (fps, backend, variant)
        except Exception as e:  # noqa: BLE001
            print(f"# {backend}{variant} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    if best is None:
        print(json.dumps({"metric": "render_fps_768p_200k", "value": 0.0,
                          "unit": "frames/s", "vs_baseline": 0.0,
                          "error": "no backend ran"}))
        return

    fps, backend_used, variant = best
    print(json.dumps({
        "metric": f"render_fps_768p_200k_{backend_used}{variant}",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 180.0, 3),
    }))


if __name__ == "__main__":
    main()
