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
from functools import partial

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
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--ply", default="", help="budget-scene PLY; default = "
                    "synthetic 200k bench scene")
    ap.add_argument("--res", type=int, default=0)
    args = ap.parse_args()

    if args.ply:
        from g4splat_tpu.io.ply import load_gaussian_ply

        W = args.res or 512
        H = W * 3 // 4
        scene = load_gaussian_ply(args.ply)
        n_pts = int(scene.xyz.shape[0])
        scene = load_gaussian_ply(args.ply, capacity=n_pts * 13 // 10)
        cam = lookat_camera([4.8 * np.sin(-0.5), 0.3 + 0.2 * np.cos(-1.0),
                             -4.8 * np.cos(-0.5)],
                            [0, 0, 0], [0, -1, 0], fx=W * 0.9, fy=W * 0.9,
                            width=W, height=H)
    else:
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

    import os
    only = os.environ.get("SWEEP_ONLY", "")   # e.g. "GH" to run just G+H

    def want(letter):
        return (not only) or letter in only

    rng = np.random.RandomState(0)
    dcomb_raw = jnp.asarray(rng.randn(24, E), jnp.float32)
    # The production path zeroes invalid entries before assembly.
    dcomb = dcomb_raw * jnp.asarray(ok, jnp.float32)[None, :]

    # --- A: current production path: transpose + scatter-add -------------
    def scatter_add(dc, g):
        d_all = jnp.concatenate([dc[:11], dc[11:12], dc[12:18]], axis=0).T
        return jnp.zeros((P, 18), jnp.float32).at[g].add(d_all, mode="drop")

    if want("A"):
        ref = timeit("A scatter-add (E,18)->(P,18)  [current]",
                     jax.jit(scatter_add), dcomb, gid)
    else:
        ref = jax.jit(scatter_add)(dcomb[:, :P], gid[:P])  # cheap correctness ref
        ref = None

    # The (P*16,18) grid variants OOM past ~1e9 bytes (XLA materializes the
    # full grid plus a broadcast copy — the budget shape hit a 22.4 GB alloc).
    grid_ok = P * 16 * 18 * 4 < 1e9
    # --- B: unique-index SET into (P*16, 18) + slot reduction ------------
    def uniq_set(dc, g, s, okm):
        dest = jnp.where(okm, g * 16 + s, P * 16)
        flat = jnp.zeros((P * 16, 18), jnp.float32).at[dest].set(
            dc[:18].T, mode="drop", unique_indices=True)
        return flat.reshape(P, 16, 18).sum(axis=1)

    if grid_ok and want("B"):
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

    if grid_ok and want("C"):
        out_c = timeit("C inv-perm + gather (18,P*16) + reduce",
                       jax.jit(inv_gather), dcomb, gid, slot, ok)
        print("   max|C-A| =", float(jnp.max(jnp.abs(out_c - ref))))

    # --- B16: unique-set in lane-major (18, P*16) -------------------------
    def uniq_set_lane(dc, g, s, okm):
        dest = jnp.where(okm, g * 16 + s, P * 16)
        flat = jnp.zeros((18, P * 16), jnp.float32).at[:, dest].set(
            dc[:18], mode="drop", unique_indices=True)
        return flat.reshape(18, P, 16).sum(axis=2).T

    if grid_ok and want("B"):
        out_b2 = timeit("B' unique-set lane-major (18,P*16) + reduce",
                        jax.jit(uniq_set_lane), dcomb, gid, slot, ok)
        print("   max|B'-A| =", float(jnp.max(jnp.abs(out_b2 - ref))))

    # --- D: bf16 scatter-add ---------------------------------------------
    def scatter_bf16(dc, g):
        return jnp.zeros((P, 18), jnp.bfloat16).at[g].add(
            dc[:18].T.astype(jnp.bfloat16), mode="drop").astype(jnp.float32)

    if want("D"):
        timeit("D bf16 scatter-add", jax.jit(scatter_bf16), dcomb, gid)

    # --- E: pack-style column gather calibration -------------------------
    if want("E"):
        table = jnp.asarray(rng.randn(24, P), jnp.float32)
        timeit("E calib: pack col-gather (24,P)->(24,E)",
               jax.jit(lambda t, g: jnp.take(t, g, axis=1)), table, gid)

    # --- F: smaller E (buf_factor 3 / 1) ----------------------------------
    if want("F"):
        for bf in (3, 1):
            Eb = bf * P
            if Eb < E:
                timeit(f"F scatter-add at buf_factor={bf}",
                       jax.jit(scatter_add), dcomb[:, :Eb], gid[:Eb])

    # --- G: pid-sort + searchsorted runs + per-slot gathers (scatter-free) -
    # Group entries by their (row, col) candidate coordinate with ONE pair
    # sort, find each splat's contiguous run by binary search, then reduce
    # the ≤cap entries per splat with `cap` padded row gathers. No scatter.
    slot_bits = 4
    pid = (gid << slot_bits) | slot
    BIG = jnp.int32(jnp.iinfo(jnp.int32).max)

    def sortgather(dc, pid, okm, cap=16):
        pidm = jnp.where(okm, pid, BIG)
        pid2, pos = jax.lax.sort(
            (pidm, jnp.arange(E, dtype=jnp.int32)), num_keys=1)
        row2 = jnp.where(pid2 == BIG, P, pid2 >> slot_bits)
        qs = jnp.arange(P, dtype=jnp.int32)
        run_start = jnp.searchsorted(row2, qs, side="left").astype(jnp.int32)
        run_end = jnp.searchsorted(row2, qs, side="right").astype(jnp.int32)
        d_all = jnp.concatenate(
            [dc[:18].T, jnp.zeros((1, 18), jnp.float32)], axis=0)  # (E+1, 18)
        pos_pad = jnp.concatenate([pos, jnp.asarray([E], jnp.int32)])
        acc = jnp.zeros((P, 18), jnp.float32)
        for s in range(cap):
            j = run_start + s
            has = j < run_end
            p = pos_pad[jnp.where(has, j, E)]
            acc = acc + jnp.where(has[:, None], d_all[p], 0.0)
        return acc

    if want("G"):
        out_g = timeit("G pid-sort + run gathers (scatter-free)",
                       jax.jit(sortgather), dcomb, pid, ok)
        if ref is not None:
            print("   max|G-A| =", float(jnp.max(jnp.abs(out_g - ref))))

    # --- H: pid-sort + sorted-segment scatter-add -------------------------
    def sortedscatter(dc, pid, okm):
        pidm = jnp.where(okm, pid, BIG)
        pid2, pos = jax.lax.sort(
            (pidm, jnp.arange(E, dtype=jnp.int32)), num_keys=1)
        row2 = jnp.where(pid2 == BIG, P, pid2 >> slot_bits)
        d_all = jnp.concatenate([dc[:11], dc[11:12], dc[12:18]], axis=0).T
        d_sorted = d_all[pos]
        return jax.ops.segment_sum(d_sorted, row2, num_segments=P,
                                   indices_are_sorted=True)

    if want("H"):
        out_h = timeit("H pid-sort + sorted segment_sum",
                       jax.jit(sortedscatter), dcomb, pid, ok)
        if ref is not None:
            print("   max|H-A| =", float(jnp.max(jnp.abs(out_h - ref))))

    # --- I: pid-sort + log-pass segmented suffix reduce + head gather ------
    # After the pid sort, each splat's entries are contiguous (≤cap of them).
    # log2(cap) shifted compare-add passes leave each segment's TOTAL on its
    # head row (all sequential reads — HBM-bandwidth, no scatter at all),
    # and one (P,) gather at run_start pulls the per-splat gradients out.
    def logpass_reduce(dc, pid, okm, Eu, cap=16):
        pidm = jnp.where(okm[:Eu], pid[:Eu], BIG)
        pid2, pos = jax.lax.sort(
            (pidm, jnp.arange(Eu, dtype=jnp.int32)), num_keys=1)
        gid2 = pid2 >> slot_bits                       # BIG → huge row id
        d_all = jnp.concatenate([dc[:11, :Eu], dc[11:12, :Eu],
                                 dc[12:18, :Eu]], axis=0).T
        d = d_all[pos]                                  # (Eu, 18)
        g = gid2
        s = 1
        while s < cap:
            take = g == jnp.concatenate(
                [g[s:], jnp.full((s,), -1, jnp.int32)])
            d = d + jnp.where(
                take[:, None],
                jnp.concatenate([d[s:], jnp.zeros((s, 18), jnp.float32)]),
                0.0)
            s *= 2
        qs = jnp.arange(P, dtype=jnp.int32)
        run_start = jnp.searchsorted(gid2, qs, side="left").astype(jnp.int32)
        has = run_start < jnp.searchsorted(
            gid2, qs, side="right").astype(jnp.int32)
        dpad = jnp.concatenate([d, jnp.zeros((1, 18), jnp.float32)])
        return jnp.where(has[:, None],
                         dpad[jnp.minimum(run_start, Eu)], 0.0)

    if want("I"):
        for Eu in (E, P):
            out_i = timeit(f"I pid-sort + log-pass reduce (E={Eu})",
                           jax.jit(partial(logpass_reduce, Eu=Eu)),
                           dcomb, pid, ok)
            if ref is not None and Eu == E:
                print("   max|I-A| =",
                      float(jnp.max(jnp.abs(out_i - ref))))


if __name__ == "__main__":
    main()
