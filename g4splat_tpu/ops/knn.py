"""Nearest-neighbor distance ops (TPU replacement for the reference's
simple-knn CUDA extension: submodules/simple-knn/simple_knn.cu — Morton-code
sort + boxed candidate search, used once to seed Gaussian scales).

Two paths:
- `mean_knn_sq_dist_exact`: blocked O(N²) brute force — the oracle, fine to
  ~50k points, maps to big MXU matmuls (|a-b|² = |a|²+|b|²-2a·b).
- `mean_knn_sq_dist`: Morton-sorted sliding-window approximation — sort points
  along a 3D Z-order curve and only compare each point to its `window`
  neighbors in that order. Exactness is not needed (it only seeds initial
  scales); the reference's boxed search is itself approximate in spirit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

K_NEIGHBORS = 3


def _pairwise_sq_dist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(n, 3), (m, 3) → (n, m) squared distances via the MXU-friendly
    expansion."""
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True).T
    ab = a @ b.T
    return jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)


@functools.partial(jax.jit, static_argnames=("block",))
def mean_knn_sq_dist_exact(points: jnp.ndarray, block: int = 2048) -> jnp.ndarray:
    """(N, 3) → (N,) mean squared distance to the 3 nearest neighbors."""
    n = points.shape[0]
    pad = (-n) % block
    pts = jnp.pad(points, ((0, pad), (0, 0)), constant_values=jnp.inf)
    npad = pts.shape[0]

    def row_block(i):
        a = jax.lax.dynamic_slice(pts, (i * block, 0), (block, 3))
        d2 = _pairwise_sq_dist(a, pts)
        # Exclude self-distance (diagonal of this block).
        rows = jnp.arange(block)[:, None]
        cols = jnp.arange(npad)[None, :]
        d2 = jnp.where(cols == (i * block + rows), jnp.inf, d2)
        d2 = jnp.where(jnp.isnan(d2), jnp.inf, d2)
        neg_top, _ = jax.lax.top_k(-d2, K_NEIGHBORS)
        return jnp.mean(-neg_top, axis=-1)

    out = jax.lax.map(row_block, jnp.arange(npad // block))
    return out.reshape(-1)[:n]


def _morton_codes(points: jnp.ndarray, bits: int = 10) -> jnp.ndarray:
    """(N, 3) → (N,) interleaved-bit Z-order codes on a 2^bits grid."""
    lo = jnp.min(points, axis=0)
    hi = jnp.max(points, axis=0)
    q = ((points - lo) / jnp.maximum(hi - lo, 1e-12) * (2**bits - 1)).astype(jnp.uint32)

    def spread(v):
        # Insert two zero bits between each of the low `bits` bits.
        v = v & jnp.uint32(0x3FF)
        v = (v | (v << 16)) & jnp.uint32(0x030000FF)
        v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
        v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x09249249)
        return v

    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)


@functools.partial(jax.jit, static_argnames=("window",))
def mean_knn_sq_dist(points: jnp.ndarray, window: int = 128) -> jnp.ndarray:
    """Approximate (N,) mean-3NN squared distance via Morton-order windows.

    Each point is compared against the `2*window` points adjacent to it in
    Z-order. Memory O(N·window); compute is elementwise (VPU).
    """
    n = points.shape[0]
    if n <= 4096:
        return mean_knn_sq_dist_exact(points, block=min(2048, max(8, n)))
    order = jnp.argsort(_morton_codes(points))
    sorted_pts = points[order]
    pad = jnp.full((window, 3), jnp.inf, sorted_pts.dtype)
    padded = jnp.concatenate([pad, sorted_pts, pad], axis=0)

    # Gather the window around each sorted point: (N, 2*window, 3).
    offs = jnp.concatenate(
        [jnp.arange(0, window), jnp.arange(window + 1, 2 * window + 1)]
    )
    idx = jnp.arange(n)[:, None] + offs[None, :]
    neigh = padded[idx]
    diff = neigh - sorted_pts[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(jnp.isfinite(d2), d2, jnp.inf)
    neg_top, _ = jax.lax.top_k(-d2, K_NEIGHBORS)
    mean_sorted = jnp.mean(-neg_top, axis=-1)
    # Scatter back to original order.
    return jnp.zeros(n, mean_sorted.dtype).at[order].set(mean_sorted)
