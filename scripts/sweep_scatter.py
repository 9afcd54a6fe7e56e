"""On-chip A/B of per-entry→per-splat gradient assembly strategies.

The backward path ends with (24, E) per-entry gradients that must be
segment-summed into (P, 18) per-splat gradients (the batched atomicAdd).
Round-2 measured the plain scatter-add at 14.6 ms (called XLA-optimal after
segment_sum / unique-set failed to beat it); this sweep re-litigates with the
structural alternative the binning now provides: each sorted entry carries
its (gauss_id, slot_id) candidate coordinates — UNIQUE among valid entries —
so the read-modify-write scatter-add can become (B) a unique-index set +
slot reduction or (C) an inverse-permutation build + column gather + slot
reduction.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, ".")

from bench import build_scene
from g4splat_tpu.core.cameras import lookat_camera
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
    print(f"{name:52s} {dt*1e3:8.2f} ms", flush=True)
    return out


def main():
    W, H = 768, 576
    scene = build_scene()
    cam = lookat_camera([0.0, 0.0, -6.5], [0, 0, 0], [0, -1, 0],
                        fx=600.0, fy=600.0, width=W, height=H)
    cfg = RenderConfig()
    prep = jax.jit(lambda s: preprocess(
        cam, xyz=s.xyz, scaling=s.scaling(), rotation_raw=s.rotation_raw,
        opacity=s.opacity(), features=s.features(),
        sh_degree=s.active_sh_degree, config=cfg))(scene)
    P = int(prep.depth.shape[0])
    binning = jax.jit(lambda p: bin_splats(p, W, H))(prep)
    gid = binning.gauss_id
    slot = binning.slot_id
    E = int(gid.shape[0])
    n_tiles = ((W + 15) // 16) * ((H + 15) // 16)
    ok = binning.tile_id < n_tiles
    print(f"P={P} E={E} real={int(jnp.sum(ok))}")

    rng = np.random.RandomState(0)
    dcomb_raw = jnp.asarray(rng.randn(24, E), jnp.float32)
    # The production path zeroes invalid entries before assembly.
    dcomb = dcomb_raw * jnp.asarray(ok, jnp.float32)[None, :]

    # --- A: current production path: transpose + scatter-add -------------
    def scatter_add(dc, g):
        d_all = jnp.concatenate([dc[:11], dc[11:12], dc[12:18]], axis=0).T
        return jnp.zeros((P, 18), jnp.float32).at[g].add(d_all, mode="drop")

    ref = timeit("A scatter-add (E,18)->(P,18)  [current]",
                 jax.jit(scatter_add), dcomb, gid)

    # --- B: unique-index SET into (P*16, 18) + slot reduction ------------
    def uniq_set(dc, g, s, okm):
        dest = jnp.where(okm, g * 16 + s, P * 16)
        flat = jnp.zeros((P * 16, 18), jnp.float32).at[dest].set(
            dc[:18].T, mode="drop", unique_indices=True)
        return flat.reshape(P, 16, 18).sum(axis=1)

    out_b = timeit("B unique-set (P*16,18) + reduce",
                   jax.jit(uniq_set), dcomb, gid, slot, ok)
    print("   max|B-A| =", float(jnp.max(jnp.abs(out_b - ref))))

    # --- C: inverse permutation + column gather + slot reduction ---------
    def inv_gather(dc, g, s, okm):
        dest = jnp.where(okm, g * 16 + s, P * 16)
        inv = jnp.full((P * 16,), E, jnp.int32).at[dest].set(
            jnp.arange(E, dtype=jnp.int32), mode="drop", unique_indices=True)
        dpad = jnp.concatenate(
            [dc[:18], jnp.zeros((18, 1), jnp.float32)], axis=1)
        cols = jnp.take(dpad, inv, axis=1)          # (18, P*16)
        return cols.reshape(18, P, 16).sum(axis=2).T

    out_c = timeit("C inv-perm + gather (18,P*16) + reduce",
                   jax.jit(inv_gather), dcomb, gid, slot, ok)
    print("   max|C-A| =", float(jnp.max(jnp.abs(out_c - ref))))

    # --- B16: unique-set in lane-major (18, P*16) -------------------------
    def uniq_set_lane(dc, g, s, okm):
        dest = jnp.where(okm, g * 16 + s, P * 16)
        flat = jnp.zeros((18, P * 16), jnp.float32).at[:, dest].set(
            dc[:18], mode="drop", unique_indices=True)
        return flat.reshape(18, P, 16).sum(axis=2).T

    out_b2 = timeit("B' unique-set lane-major (18,P*16) + reduce",
                    jax.jit(uniq_set_lane), dcomb, gid, slot, ok)
    print("   max|B'-A| =", float(jnp.max(jnp.abs(out_b2 - ref))))

    # --- D: bf16 scatter-add ---------------------------------------------
    def scatter_bf16(dc, g):
        return jnp.zeros((P, 18), jnp.bfloat16).at[g].add(
            dc[:18].T.astype(jnp.bfloat16), mode="drop").astype(jnp.float32)

    timeit("D bf16 scatter-add", jax.jit(scatter_bf16), dcomb, gid)

    # --- E: pack-style column gather calibration -------------------------
    table = jnp.asarray(rng.randn(24, P), jnp.float32)
    timeit("E calib: pack col-gather (24,P)->(24,E)",
           jax.jit(lambda t, g: jnp.take(t, g, axis=1)), table, gid)

    # --- F: smaller E (buf_factor 3) -------------------------------------
    E3 = 3 * P
    timeit("F scatter-add at buf_factor=3",
           jax.jit(scatter_add), dcomb[:, :E3], gid[:E3])


if __name__ == "__main__":
    main()
