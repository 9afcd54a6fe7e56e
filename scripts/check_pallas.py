"""TPU parity check: pallas backend vs the differentiable tiled oracle.

Forward maps must agree to ~5e-3 (MXU rounding); gradients to ~1% relative.
Run on the real chip (no args). Exits nonzero on mismatch.
"""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from g4splat_tpu.core.cameras import lookat_camera
from g4splat_tpu.models.gaussians import GaussianScene
from g4splat_tpu.ops.rasterize import render


def build(n=8000, seed=1, spread=2.0):
    rng = np.random.RandomState(seed)
    xyz = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    cols = rng.rand(n, 3).astype(np.float32)
    scales = np.exp(rng.uniform(-3.5, -2.0, n)).astype(np.float32)
    quats = rng.randn(n, 4).astype(np.float32)
    return GaussianScene.from_points(
        xyz, cols, scales=scales, quats=quats, initial_opacity=0.7
    )


def main():
    W, H = 256, 192
    # Scene 2 concentrates 8k splats into a narrow frustum cone so single
    # tiles run ~40+ chunks: the bwd bf16 suffix scans accumulate across many
    # chunks and totals−suffix cancellation is worst for early entries —
    # exactly what CPU CI never exercises (ADVICE r1: keep the deep-overlap
    # case under the 2e-2 gradient bound on-chip).
    # The tiled oracle keeps only the front-most tile_k entries per tile (a
    # documented static cap the pallas kernel does NOT have); the deep scene
    # packs thousands of entries into its central tiles, so the oracle needs
    # a raised cap there to BE an oracle (verified against the dense oracle
    # on CPU: at tile_k below the densest tile the tiled output itself is
    # the wrong one).
    scenes = [("spread", build(), 1024),
              ("deep-overlap", build(spread=0.35, seed=3), 8192)]
    fail = False
    for tag, scene, tile_k in scenes:
        print(f"=== scene: {tag} (oracle tile_k={tile_k}) ===")
        fail |= check_scene(scene, W, H, tile_k)
    print("PARITY:", "FAIL" if fail else "PASS")
    sys.exit(1 if fail else 0)


def check_scene(scene, W, H, tile_k=1024):
    from g4splat_tpu.ops.rasterize_common import RenderConfig

    cam = lookat_camera([0, 0, -5.5], [0, 0, 0], [0, -1, 0],
                        fx=220.0, fy=220.0, width=W, height=H)
    rcfg = RenderConfig(tile_k=tile_k)

    outs = {}
    for backend in ("tiled", "pallas"):
        f = jax.jit(lambda s, b=backend: render(cam, s, config=rcfg,
                                                backend=b))
        outs[backend] = jax.tree.map(np.asarray, f(scene))
    f_slim = jax.jit(
        lambda s: render(cam, s, config=rcfg, backend="pallas",
                         need_aux=False))
    outs["pallas_slim"] = jax.tree.map(np.asarray, f_slim(scene))

    keys = ["render", "rend_alpha", "rend_normal", "rend_depth",
            "depth_median", "rend_dist", "surf_depth", "final_T"]
    # The slim inference kernel skips the distortion / n_contrib channels;
    # everything else must match the oracle to the same bound.
    slim_keys = [k for k in keys if k != "rend_dist"]
    fail = False
    for k in slim_keys:
        a, b = outs["tiled"][k], outs["pallas_slim"][k]
        err = np.abs(a - b)
        scale = max(1.0, float(np.max(np.abs(a))))
        if k == "depth_median":
            frac = float(np.mean(err > 6e-3 * scale))
            ok = frac < 1e-3
            print(f"slim {k:12s} mismatch frac={frac:.2e}"
                  f"  {'ok' if ok else 'FAIL'}")
        else:
            ok = np.max(err) <= 6e-3 * scale
            print(f"slim {k:12s} max|Δ|={np.max(err):.3e}"
                  f"  {'ok' if ok else 'FAIL'}")
        fail |= not ok
    for k in keys:
        a, b = outs["tiled"][k], outs["pallas"][k]
        err = np.abs(a - b)
        scale = max(1.0, float(np.max(np.abs(a))))
        if k == "depth_median":
            # The T>0.5 crossing flips splats at isolated pixels under MXU
            # rounding: grade by mismatch fraction, not max.
            frac = float(np.mean(err > 6e-3 * scale))
            ok = frac < 1e-3
            print(f"fwd {k:12s} mismatch frac={frac:.2e}"
                  f"  {'ok' if ok else 'FAIL'}")
        else:
            ok = np.max(err) <= 6e-3 * scale
            print(f"fwd {k:12s} max|Δ|={np.max(err):.3e}  (scale {scale:.2f})"
                  f"  {'ok' if ok else 'FAIL'}")
        fail |= not ok

    # Gradient parity on a composite scalar loss over every differentiable map.
    def loss(xyz, f_dc, op, sc, rot, backend):
        s = scene.replace(xyz=xyz, f_dc=f_dc, opacity_raw=op,
                          scaling_raw=sc, rotation_raw=rot)
        out = render(cam, s, config=rcfg, backend=backend)
        return (jnp.mean(out["render"] ** 2)
                + 0.1 * jnp.mean(out["rend_alpha"])
                + 0.1 * jnp.mean(jnp.abs(out["rend_normal"]))
                + 0.05 * jnp.mean(out["surf_depth"])
                + 0.02 * jnp.mean(out["rend_dist"]))

    args = (scene.xyz, scene.f_dc, scene.opacity_raw, scene.scaling_raw,
            scene.rotation_raw)
    names = ("xyz", "f_dc", "opacity", "scaling", "rotation")
    g_t = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)),
                  static_argnums=5)(*args, "tiled")
    g_p = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)),
                  static_argnums=5)(*args, "pallas")
    for n_, a, b in zip(names, g_t, g_p):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.linalg.norm(a) + 1e-12
        rel = np.linalg.norm(a - b) / denom
        ok = rel < 2e-2
        print(f"grad {n_:9s} rel‖Δ‖={rel:.3e}  {'ok' if ok else 'FAIL'}")
        fail |= not ok

    # Trainer fast path: compute_distortion=False (λ_dist = 0 production
    # default) must match the full pallas kernels EXACTLY on every non-dist
    # channel and gradient (the only removed terms are multiplied by the
    # identically-zero gdist cotangent).
    rcfg_nd = RenderConfig(tile_k=tile_k, compute_distortion=False)

    def make_loss_nd(cfg):
        def loss_nd(xyz, f_dc, op, sc, rot):
            s = scene.replace(xyz=xyz, f_dc=f_dc, opacity_raw=op,
                              scaling_raw=sc, rotation_raw=rot)
            out = render(cam, s, config=cfg, backend="pallas")
            return (jnp.mean(out["render"] ** 2)
                    + 0.1 * jnp.mean(out["rend_alpha"])
                    + 0.1 * jnp.mean(jnp.abs(out["rend_normal"]))
                    + 0.05 * jnp.mean(out["surf_depth"]))
        return loss_nd

    g_full = jax.jit(
        jax.grad(make_loss_nd(rcfg), argnums=(0, 1, 2, 3, 4)))(*args)
    g_nd = jax.jit(
        jax.grad(make_loss_nd(rcfg_nd), argnums=(0, 1, 2, 3, 4)))(*args)
    for n_, a, b in zip(names, g_full, g_nd):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12)
        ok = rel < 1e-5
        print(f"nodist grad {n_:9s} rel‖Δ‖={rel:.3e}  {'ok' if ok else 'FAIL'}")
        fail |= not ok
    return fail


if __name__ == "__main__":
    main()
