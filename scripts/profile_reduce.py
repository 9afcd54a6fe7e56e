"""Decompose the entry→splat gradient-reduction candidates on chip.

sweep_scatter measured (budget shape, E=2.43M slice): scatter-add 299 ms,
pid-sort+log-pass 866 ms. This probe times each PIECE of the sort-based
path so the slow primitive is identified instead of guessed:

  pair_sort        lax.sort((pid, iota)) at E
  row_gather       d_all[pos]  (E, 18) random row gather
  log_passes       4 shifted compare-add passes on (E, 18)
  searchsorted_l   jnp.searchsorted(gid2, arange(P))
  binsearch_manual 22 hand-vectorized binary-search steps (gather-based)
  head_scatter_set unique-index scatter-SET of head rows into (P, 18)
  scatter_add_ref  the plain .at[gid].add baseline at the same E
"""
import time
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, f, *args, n=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:36s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms", flush=True)
    return out


def main():
    import os

    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    P = 2_431_305
    E = P                      # buf_factor-1 slice of the budget shape
    rng = np.random.RandomState(0)
    gid = jnp.asarray(rng.randint(0, P, E), jnp.int32)
    slot = jnp.asarray(rng.randint(0, 16, E), jnp.int32)
    pid = (gid << 4) | slot
    d_all = jnp.asarray(rng.randn(E, 18), jnp.float32)
    iota = jnp.arange(E, dtype=jnp.int32)

    timeit("pair_sort", jax.jit(
        lambda p: jax.lax.sort((p, iota), num_keys=1)), pid)
    pid2, pos = jax.jit(
        lambda p: jax.lax.sort((p, iota), num_keys=1))(pid)
    gid2 = pid2 >> 4

    timeit("row_gather (E,18)", jax.jit(lambda d, p: d[p]), d_all, pos)
    d_sorted = jax.jit(lambda d, p: d[p])(d_all, pos)

    def log_passes(d, g):
        x = d
        s = 1
        while s < 16:
            take = g == jnp.concatenate(
                [g[s:], jnp.full((s,), -1, jnp.int32)])
            x = x + jnp.where(
                take[:, None],
                jnp.concatenate([x[s:], jnp.zeros((s, 18), jnp.float32)]),
                0.0)
            s *= 2
        return x

    timeit("log_passes x4", jax.jit(log_passes), d_sorted, gid2)

    qs = jnp.arange(P, dtype=jnp.int32)
    timeit("searchsorted_left", jax.jit(
        lambda g: jnp.searchsorted(g, qs, side="left")), gid2)

    def binsearch(g):
        lo = jnp.zeros(P, jnp.int32)
        hi = jnp.full(P, E, jnp.int32)
        for _ in range(22):
            mid = (lo + hi) >> 1
            v = g[jnp.minimum(mid, E - 1)]
            go_right = v < qs
            lo = jnp.where(go_right, mid + 1, lo)
            hi = jnp.where(go_right, hi, mid)
        return lo

    timeit("binsearch_manual x22", jax.jit(binsearch), gid2)

    head = jnp.concatenate(
        [jnp.ones(1, bool), gid2[1:] != gid2[:-1]])
    safe = jnp.where(head, gid2, P)

    def head_scatter_set(d, dest):
        return jnp.zeros((P, 18), jnp.float32).at[dest].set(
            d, mode="drop", unique_indices=True)

    timeit("head_scatter_set unique", jax.jit(head_scatter_set),
           d_sorted, safe)

    def head_scatter_add(d, dest):
        return jnp.zeros((P, 18), jnp.float32).at[dest].add(
            jnp.where(head[:, None], d, 0.0), mode="drop")

    timeit("scatter_add_ref", jax.jit(
        lambda d, g: jnp.zeros((P, 18), jnp.float32).at[g].add(
            d, mode="drop")), d_all, gid)


if __name__ == "__main__":
    main()
