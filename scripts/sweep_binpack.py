"""On-chip A/B of binning-sort and entry-pack variants (bench scene).

Times, in one process on the real chip:
  - raw jax.lax.sort cost at the candidate-key sizes the variants produce
  - bin_splats under compact_width {0, 8, 4} and rank mode (key-only sort)
  - pack_entries f32 vs split f32/bf16 table
  - end-to-end slim forward under the promising combos
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_scene
from g4splat_tpu.core.cameras import lookat_camera
from g4splat_tpu.ops.rasterize import render
from g4splat_tpu.ops.rasterize_common import RenderConfig, preprocess
from g4splat_tpu.ops.rasterize_tiled import bin_splats, presort_splats_by_depth
from g4splat_tpu.ops.rasterize_pallas import _pack_entries


def timeit(name, f, *args, n=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:42s} {dt*1e3:8.2f} ms")
    return out


def main():
    W, H = 768, 576
    scene = build_scene()
    cam = lookat_camera([0.0, 0.0, -6.5], [0, 0, 0], [0, -1, 0],
                        fx=600.0, fy=600.0, width=W, height=H)
    cfg = RenderConfig()
    prep_f = jax.jit(lambda s: preprocess(
        cam, xyz=s.xyz, scaling=s.scaling(), rotation_raw=s.rotation_raw,
        opacity=s.opacity(), features=s.features(),
        sh_degree=s.active_sh_degree, config=cfg))
    prep = jax.block_until_ready(prep_f(scene))

    # Raw sort cost at candidate sizes.
    rng = np.random.RandomState(0)
    for n_keys in (800_000, 1_200_000, 1_800_000, 3_200_000):
        keys = jnp.asarray(rng.randint(0, 2**31 - 1, n_keys, np.int32))
        pay = jnp.asarray(rng.randint(0, 2**31 - 1, n_keys, np.int32))
        timeit(f"lax.sort pair   {n_keys/1e6:.1f}M",
               jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1)),
               keys, pay)
        timeit(f"lax.sort keyonly {n_keys/1e6:.1f}M",
               jax.jit(jax.lax.sort), keys)

    variants = [
        ("bin cw=8 (default)", dict(compact_width=8)),
        ("bin cw=4", dict(compact_width=4)),
        ("bin cw=0 (none)", dict(compact_width=0)),
        ("bin cw=8 rank", dict(compact_width=8, rows_are_depth_ranks=True)),
        ("bin cw=4 rank", dict(compact_width=4, rows_are_depth_ranks=True)),
    ]
    prep_sorted = jax.block_until_ready(
        jax.jit(presort_splats_by_depth)(prep))
    for name, kw in variants:
        p = prep_sorted if kw.get("rows_are_depth_ranks") else prep
        b = timeit(name, jax.jit(lambda pp, kw=kw: bin_splats(
            pp, W, H, **kw)), p)
        print(f"    n_dropped={int(b.n_dropped)}")

    binning = jax.block_until_ready(jax.jit(
        lambda pp: bin_splats(pp, W, H))(prep))
    E = binning.gauss_id.shape[0]
    ev = jnp.arange(E) >= 0
    timeit("pack f32 slim", jax.jit(
        lambda pp, g: _pack_entries(pp, g, ev)),
        prep, binning.gauss_id)

    # Split pack: f32 rows [T(9), opa] + bf16 rows [rgb, normal]
    def pack_split(pp, gid):
        P = pp.depth.shape[0]
        opa = jnp.where(pp.valid, pp.opacity, 0.0)
        t32 = jnp.concatenate([pp.T.reshape(P, 9), opa[:, None]], axis=1)
        t16 = jnp.concatenate([pp.rgb, pp.normal], axis=1).astype(jnp.bfloat16)
        a = jnp.take(t32.T.astype(jnp.float32), gid, axis=1)
        b = jnp.take(t16.T, gid, axis=1)
        return a, b
    timeit("pack split f32/bf16", jax.jit(pack_split), prep, binning.gauss_id)

    # bf16 everything (measurement only; precision unacceptable for T rows)
    def pack_bf16(pp, gid):
        P = pp.depth.shape[0]
        opa = jnp.where(pp.valid, pp.opacity, 0.0)
        t = jnp.concatenate([pp.T.reshape(P, 9), opa[:, None], pp.rgb,
                             pp.normal], axis=1).astype(jnp.bfloat16)
        return jnp.take(t.T, gid, axis=1)
    timeit("pack all-bf16", jax.jit(pack_bf16), prep, binning.gauss_id)

    # End-to-end slim forward for promising configs.
    for name, rcfg in [
        ("e2e slim default", RenderConfig()),
        ("e2e slim cw=4", RenderConfig(binning_compact_width=4)),
        ("e2e slim rank", RenderConfig(depth_rank_binning=True)),
        ("e2e slim rank cw=4", RenderConfig(depth_rank_binning=True,
                                            binning_compact_width=4)),
    ]:
        f = jax.jit(lambda s, c=rcfg: render(
            cam, s, backend="pallas", need_aux=False, config=c)["render"])
        timeit(name, f, scene)


if __name__ == "__main__":
    main()


def sort_stability_ab():
    """A/B stable vs unstable lax.sort at binning sizes (called manually)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    rng = np.random.RandomState(0)
    for n_keys in (800_000, 1_800_000):
        keys = jnp.asarray(rng.randint(0, 2**31 - 1, n_keys, np.int32))
        pay = jnp.asarray(rng.randint(0, 2**31 - 1, n_keys, np.int32))
        timeit(f"pair stable   {n_keys/1e6:.1f}M",
               jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1,
                                                 is_stable=True)), keys, pay)
        timeit(f"pair UNstable {n_keys/1e6:.1f}M",
               jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1,
                                                 is_stable=False)), keys, pay)
        timeit(f"key  UNstable {n_keys/1e6:.1f}M",
               jax.jit(lambda k: jax.lax.sort(k, is_stable=False)), keys)
