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
        for ep in (False, True):
            bin_fn = jax.jit(lambda p, c=cap, e=ep: bin_splats(
                p, W, H, max_tiles_per_splat=c, ellipse_prune=e))
            b = timeit(f"bin_splats cap={cap} prune={ep}", bin_fn, prep)
            print(f"    dropped={int(b.n_dropped)} "
                  f"real_entries={int(jnp.sum(b.tile_count))}", flush=True)
    binning = jax.jit(lambda p: bin_splats(p, W, H))(prep)
    n_tiles = ((W + 15) // 16) * ((H + 15) // 16)

    # --- depth-rank binning (presort once, key-only 3.2M sort) ------------
    from g4splat_tpu.ops.rasterize_tiled import presort_splats_by_depth

    prep_sorted = timeit("presort_splats_by_depth",
                         jax.jit(presort_splats_by_depth), prep)
    timeit("bin_splats rank-keys (key-only)",
           jax.jit(lambda p: bin_splats(p, W, H, rows_are_depth_ranks=True)),
           prep_sorted)
    timeit("presort + rank bin (combined)",
           jax.jit(lambda p: bin_splats(presort_splats_by_depth(p), W, H,
                                        rows_are_depth_ranks=True)),
           prep)

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

    # --- early-break A/B (same process; flip the module global, re-jit) ---
    import g4splat_tpu.ops.rasterize_pallas as rp
    for eb in (False, True):
        rp.EARLY_BREAK = eb
        for aux in (True, False):
            kern_fn = jax.jit(lambda g, ts, tc, a=aux, e=eb:
                              _rasterize_tiles_pallas(
                                  g, ts, tc, bg, W, H, cfg.near, cfg.far,
                                  n_chunks_max, a))
            timeit(f"pallas kernel early_break={eb} want_aux={aux}",
                   kern_fn, comb, binning.tile_start, binning.tile_count)
    rp.EARLY_BREAK = True

    # --- full forward -----------------------------------------------------
    for aux in (True, False):
        full_fn = jax.jit(lambda s, a=aux: render(
            cam, s, backend="pallas", need_aux=a)["render"])
        timeit(f"full forward need_aux={aux}", full_fn, scene)
    for aux in (True, False):
        full_fn = jax.jit(lambda s, a=aux: render(
            cam, s, backend="pallas", need_aux=a,
            config=RenderConfig(depth_rank_binning=True))["render"])
        timeit(f"full forward rank-bin need_aux={aux}", full_fn, scene)
    # cap=8 variants (exact on this scene iff bin drops == 0 — printed above).
    for rank in (False, True):
        full_fn = jax.jit(lambda s, r=rank: render(
            cam, s, backend="pallas", need_aux=False,
            config=RenderConfig(depth_rank_binning=r,
                                max_tiles_per_splat=8))["render"])
        timeit(f"full forward cap8 rank={rank} need_aux=False", full_fn, scene)
    # Ellipse-prune A/B (default ON above; here the raw-rect ablation).
    for aux in (True, False):
        full_fn = jax.jit(lambda s, a=aux: render(
            cam, s, backend="pallas", need_aux=a,
            config=RenderConfig(tile_ellipse_prune=False))["render"])
        timeit(f"full forward NOPRUNE need_aux={aux}", full_fn, scene)


def sort_variants():
    """Binning-sort alternatives on synthetic (numpy-built) key arrays: the
    real candidate array is P·cap = 3.2M packed int32 keys + int32 payload,
    ~25% non-sentinel."""
    P, cap = 200_000, 16
    n = P * cap
    rng = np.random.RandomState(0)
    valid = rng.rand(n) < 0.25
    raw = rng.randint(0, (1 << 31) - 2, size=n, dtype=np.int64)
    SENT32 = np.int32(np.iinfo(np.int32).max)
    k32 = np.where(valid, raw.astype(np.int32), SENT32)
    gid = np.tile(np.arange(P, dtype=np.int32)[:, None], (1, cap)).reshape(-1)

    k32j = jnp.asarray(k32)
    gidj = jnp.asarray(gid)

    timeit("sort (i32 key, i32 gid) pair",
           jax.jit(lambda k, g: jax.lax.sort((k, g), num_keys=1)),
           k32j, gidj)

    # Fused single-operand i64: key<<18 | gid (gid < 2^18 at P=200k).
    def fused64(k, g):
        k64 = (k.astype(jnp.int64) << 18) | g.astype(jnp.int64)
        s = jax.lax.sort(k64)
        return (s >> 18).astype(jnp.int32), (s & ((1 << 18) - 1)).astype(jnp.int32)

    timeit("sort fused i64 single-op", jax.jit(fused64), k32j, gidj)

    timeit("sort i32 key only (floor)",
           jax.jit(lambda k: jax.lax.sort(k)), k32j)

    half = n // 2
    timeit("sort pair, half size (cap=8)",
           jax.jit(lambda k, g: jax.lax.sort((k, g), num_keys=1)),
           k32j[:half], gidj[:half])

    # Sanity: fused result must equal the pair sort.
    ks, gs = jax.jit(lambda k, g: jax.lax.sort((k, g), num_keys=1))(k32j, gidj)
    kf, gf_ = jax.jit(fused64)(k32j, gidj)
    print("fused == pair:",
          bool(jnp.all(ks[:100000] == kf[:100000])),
          bool(jnp.all(gs[:100000] == gf_[:100000])))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "sort":
        sort_variants()
    else:
        main()
