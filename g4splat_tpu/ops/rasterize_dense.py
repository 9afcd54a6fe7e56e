"""Dense (all-splats × all-pixels) differentiable surfel rasterizer.

The correctness oracle: O(P·H·W) memory, so only for small scenes/tests, but
it implements *exactly* the reference compositing semantics (renderCUDA,
forward.cu:258-443) in closed vectorized form — including the 1/255 alpha
cutoff, the 0.99 clamp and the T<1e-4 early-stop — so the tiled and Pallas
backends can be validated against it bit-for-bit-ish. Differentiable by XLA AD.

The sequential front-to-back loop is replaced by exclusive cumulative
products/sums along the depth-sorted splat axis; the early-stop is exact
because T is monotonically non-increasing, so "the first splat whose inclusive
T drops below 1e-4, and everything after it, is skipped" is a pure mask.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from g4splat_tpu.ops.rasterize_common import (
    FAR_N,
    NEAR_N,
    T_EPS,
    TILE,
    Preprocessed,
    splat_alpha_depth,
)


class CompositeOut(NamedTuple):
    color: jnp.ndarray        # (npix, 3)
    depth_acc: jnp.ndarray    # (npix,) unnormalized expected depth Σ w·z
    alpha: jnp.ndarray        # (npix,)
    normal: jnp.ndarray       # (npix, 3) view-space, unnormalized
    median_depth: jnp.ndarray # (npix,)
    distortion: jnp.ndarray   # (npix,)
    final_T: jnp.ndarray      # (npix,)
    n_contrib: jnp.ndarray    # (npix,) int32 — 1-based index of last contributor
    weight_sum_per_splat: jnp.ndarray  # (K,) Σ_pix w — handy for stats
    m1_tot: jnp.ndarray       # (npix,) Σ w·m  — distortion moment totals
    m2_tot: jnp.ndarray       # (npix,) Σ w·m² (needed to compose depth-slab
                              # renders across a sharded splat buffer)


def composite(
    alpha: jnp.ndarray,    # (K, npix) in front-to-back order
    depth: jnp.ndarray,    # (K, npix)
    rgb: jnp.ndarray,      # (K, 3)
    normal: jnp.ndarray,   # (K, 3)
    bg: jnp.ndarray,       # (3,)
    near: float = NEAR_N,
    far: float = FAR_N,
) -> CompositeOut:
    K = alpha.shape[0]
    # Early-stop mask (forward.cu:384-389): a splat whose *inclusive*
    # transmittance falls below T_EPS is skipped, as is everything behind it.
    T_incl_naive = jnp.cumprod(1.0 - alpha, axis=0)
    alpha_eff = jnp.where(T_incl_naive < T_EPS, 0.0, alpha)
    om = 1.0 - alpha_eff
    T_excl = jnp.concatenate(
        [jnp.ones_like(om[:1]), jnp.cumprod(om, axis=0)[:-1]], axis=0
    )
    w = alpha_eff * T_excl  # (K, npix)

    color = jnp.einsum("kp,kc->pc", w, rgb)
    nrm = jnp.einsum("kp,kc->pc", w, normal)
    depth_acc = jnp.sum(w * depth, axis=0)

    # Depth distortion (forward.cu:392-400): NDC-ish depth m, running moments.
    m = far / (far - near) * (1.0 - near / jnp.maximum(depth, 1e-8))
    mw = m * w
    m2w = m * m * w
    excl = lambda x: jnp.concatenate(
        [jnp.zeros_like(x[:1]), jnp.cumsum(x, axis=0)[:-1]], axis=0
    )
    M1, M2 = excl(mw), excl(m2w)
    A = 1.0 - T_excl
    distortion = jnp.sum((m * m * A + M2 - 2.0 * m * M1) * w, axis=0)

    # Median depth: last contributor with incoming T > 0.5 (forward.cu:402-406).
    contrib = alpha_eff > 0.0
    med_mask = (T_excl > 0.5) & contrib
    kidx = jnp.arange(K)[:, None]
    best = jnp.max(jnp.where(med_mask, kidx, -1), axis=0)
    median_depth = jnp.where(
        best >= 0, jnp.take_along_axis(depth, best[None].clip(0), axis=0)[0], 0.0
    )

    final_T = T_excl[-1] * om[-1]
    color = color + final_T[:, None] * bg[None, :]
    last = jnp.max(jnp.where(contrib, kidx + 1, 0), axis=0)
    return CompositeOut(
        color=color,
        depth_acc=depth_acc,
        alpha=1.0 - final_T,
        normal=nrm,
        median_depth=median_depth,
        distortion=distortion,
        final_T=final_T,
        n_contrib=last.astype(jnp.int32),
        weight_sum_per_splat=jnp.sum(w, axis=1),
        m1_tot=jnp.sum(mw, axis=0),
        m2_tot=jnp.sum(m2w, axis=0),
    )


def render_dense(camera, prep: Preprocessed, bg: jnp.ndarray,
                 near: float = NEAR_N, far: float = FAR_N) -> CompositeOut:
    """Rasterize every splat against every pixel. Returns flat (H·W, …) maps."""
    H, W = camera.height, camera.width
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    px = xs.reshape(-1)
    py = ys.reshape(-1)

    # Depth sort (invalid splats to the back).
    sort_key = jnp.where(prep.valid, prep.depth, jnp.inf)
    order = jnp.argsort(sort_key)
    prep_sorted = Preprocessed(
        T=prep.T[order],
        center=prep.center[order],
        radius=prep.radius[order],
        depth=prep.depth[order],
        normal=prep.normal[order],
        opacity=prep.opacity[order],
        rgb=prep.rgb[order],
        valid=prep.valid[order],
    )
    alpha, depth = splat_alpha_depth(prep_sorted, px, py, near=near)

    # Tile-rect culling, matching the binned backends (and the CUDA reference,
    # which only composites a splat in tiles its ±radius AABB touches —
    # rasterizer_impl.cu getRect; the Gaussian tail beyond that is dropped).
    gxn = (W + TILE - 1) // TILE
    gyn = (H + TILE - 1) // TILE
    c = prep_sorted.center
    r = prep_sorted.radius
    rmin_x = jnp.clip(((c[:, 0] - r) / TILE).astype(jnp.int32), 0, gxn)
    rmin_y = jnp.clip(((c[:, 1] - r) / TILE).astype(jnp.int32), 0, gyn)
    rmax_x = jnp.clip(((c[:, 0] + r + TILE - 1) / TILE).astype(jnp.int32), 0, gxn)
    rmax_y = jnp.clip(((c[:, 1] + r + TILE - 1) / TILE).astype(jnp.int32), 0, gyn)
    tx = (px / TILE).astype(jnp.int32)[None, :]
    ty = (py / TILE).astype(jnp.int32)[None, :]
    in_rect = (
        (tx >= rmin_x[:, None]) & (tx < rmax_x[:, None])
        & (ty >= rmin_y[:, None]) & (ty < rmax_y[:, None])
    )
    alpha = jnp.where(in_rect, alpha, 0.0)
    return composite(
        alpha, depth, prep_sorted.rgb, prep_sorted.normal, bg, near=near, far=far
    )
