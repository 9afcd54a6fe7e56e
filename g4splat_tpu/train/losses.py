"""Training losses for 2DGS with chart/plane priors.

Functional JAX re-implementations of every loss term the reference trainer
assembles (2d-gaussian-splatting/train_with_refine_depth.py:382-490, utils/
loss_utils.py, matcha/dm_regularization/depth.py:142-223, matcha/dm_utils/
rendering.py:392-407). All images are (H, W, C) or (H, W); everything is pure
and jit/vmap-friendly (the batched-over-views variants the reference
hand-wrote come from `jax.vmap`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def _gaussian_kernel1d(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x**2) / (2.0 * sigma**2))
    return g / jnp.sum(g)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM with an 11×11 σ=1.5 Gaussian window (loss_utils.py:29-77).

    Inputs (H, W, C) in [0, 1]. Separable depthwise convolution (VPU-friendly);
    SAME padding like the reference's F.conv2d(padding=window_size//2).
    """
    if img1.ndim == 2:
        img1 = img1[..., None]
        img2 = img2[..., None]
    k = _gaussian_kernel1d(window_size)

    def blur(x):
        # x: (H, W, C) — separable SAME conv along H then W.
        x = jnp.moveaxis(x, -1, 0)[:, None]  # (C, 1, H, W)
        kh = k.reshape(1, 1, -1, 1)
        kw = k.reshape(1, 1, 1, -1)
        x = jax.lax.conv_general_dilated(x, kh, (1, 1), "SAME")
        x = jax.lax.conv_general_dilated(x, kw, (1, 1), "SAME")
        return jnp.moveaxis(x[:, 0], 0, -1)

    mu1, mu2 = blur(img1), blur(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = blur(img1 * img1) - mu1_sq
    sigma2_sq = blur(img2 * img2) - mu2_sq
    sigma12 = blur(img1 * img2) - mu12
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu12 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return jnp.mean(ssim_map)


def dssim_color_loss(pred, target, lambda_dssim: float = 0.2) -> jnp.ndarray:
    """(1-λ)·L1 + λ·(1-SSIM) — the reference's photometric loss (:382-384)."""
    return (1.0 - lambda_dssim) * l1_loss(pred, target) + lambda_dssim * (
        1.0 - ssim(pred, target)
    )


def normal_consistency_loss(rend_normal, surf_normal) -> jnp.ndarray:
    """2DGS normal consistency: mean(1 - n_rend·n_surf) (:395-397)."""
    return jnp.mean(1.0 - jnp.sum(rend_normal * surf_normal, axis=-1))


def distortion_loss(rend_dist) -> jnp.ndarray:
    return jnp.mean(rend_dist)


def normal_to_curvature(normal: jnp.ndarray, mask=None) -> jnp.ndarray:
    """(H, W, 3) → (H, W) curvature: L1 norm of the sum of 4-neighbor normal
    differences, replicate padding (matcha normal2curv, rendering.py:392-407)."""
    if mask is None:
        mask = jnp.ones(normal.shape[:2] + (1,), normal.dtype)
    elif mask.ndim == 2:
        mask = mask[..., None]
    n = jnp.pad(normal, ((1, 1), (1, 1), (0, 0)), mode="edge")
    m = jnp.pad(mask, ((1, 1), (1, 1), (0, 0)), mode="edge")
    n_c = n[1:-1, 1:-1] * m[1:-1, 1:-1]
    n_u = (n[:-2, 1:-1] - n_c) * m[:-2, 1:-1]
    n_l = (n[1:-1, :-2] - n_c) * m[1:-1, :-2]
    n_b = (n[2:, 1:-1] - n_c) * m[2:, 1:-1]
    n_r = (n[1:-1, 2:] - n_c) * m[1:-1, 2:]
    curv = (n_u + n_l + n_b + n_r) * m[1:-1, 1:-1]
    return jnp.sum(jnp.abs(curv), axis=-1)


def depth_prior_loss(surf_depth, prior_depth, scale_factor,
                     confidence_weighting: float = 0.5) -> jnp.ndarray:
    """Log-compressed absolute depth prior (:425-428):
    mean(cw·log(1 + scale·|prior - surf|))."""
    return jnp.mean(
        confidence_weighting
        * jnp.log1p(scale_factor * jnp.abs(prior_depth - surf_depth))
    )


def depth_derivative_prior_loss(surf_normal, prior_normal) -> jnp.ndarray:
    """mean(1 - n_surf·n_prior) (:429-432)."""
    return jnp.mean(1.0 - jnp.sum(surf_normal * prior_normal, axis=-1))


def normal_prior_loss(rend_normal, prior_normal) -> jnp.ndarray:
    return jnp.mean(1.0 - jnp.sum(rend_normal * prior_normal, axis=-1))


def curvature_prior_loss(rend_normal, prior_curv) -> jnp.ndarray:
    rend_curv = normal_to_curvature(rend_normal)
    return jnp.mean(jnp.abs(prior_curv - rend_curv))


def depth_order_loss(
    key: jax.Array,
    depth: jnp.ndarray,
    prior_depth: jnp.ndarray,
    scene_extent: float = 1.0,
    max_pixel_shift_ratio: float = 0.05,
    normalize: bool = True,
    log_space: bool = True,
    log_scale: float = 20.0,
    sample: str = "per_pixel",
    n_global_shifts: int = 4,
) -> jnp.ndarray:
    """Pairwise relative-depth-order loss (matcha depth.py:142-223): each pixel
    is paired with a uniformly-shifted neighbor (≤5% of image size); penalize
    sign disagreement of the depth differences vs the prior,
    -min(0, Δd·sign-ish(Δd_prior)), optionally log-compressed.

    sample="per_pixel" is the reference's independent per-pixel shift — an
    (H·W)-element random gather whose backward is an equally random
    scatter-add; TPU runs one-element gathers at ~14 ns each, so at 768×576
    this one term costs ~10 ms/step. sample="global" draws `n_global_shifts`
    image-wide shifts instead and pairs via jnp.roll (slice+concat, no
    gather): the same order-violation statistic, sampled coarsely per step
    and densely across steps (shifts are iid per iteration). Out-of-range
    pairs are masked out rather than clamped-to-border like the reference
    (a clamped border pair is a self-pair with zero loss; masking only
    changes the mean's denominator)."""
    H, W = depth.shape
    max_shift = int(round(max_pixel_shift_ratio * max(H, W)))

    def pair_loss(sd, spd, valid):
        diff = (depth - sd) / scene_extent
        prior_diff = (prior_depth - spd) / scene_extent
        if normalize:
            prior_diff = prior_diff / jnp.maximum(
                jax.lax.stop_gradient(jnp.abs(prior_diff)), 1e-8
            )
        loss = -jnp.minimum(diff * prior_diff, 0.0)
        if log_space:
            loss = jnp.log1p(log_scale * loss)
        if valid is None:
            return jnp.mean(loss)
        return (jnp.sum(loss * valid)
                / jnp.maximum(jnp.sum(valid), 1.0))

    if sample == "global":
        rows = jnp.arange(H)[:, None]
        cols = jnp.arange(W)[None, :]

        def one(k):
            dy, dx = jax.random.randint(k, (2,), -max_shift, max_shift + 1)
            sd = jnp.roll(depth, (-dy, -dx), axis=(0, 1))
            spd = jnp.roll(prior_depth, (-dy, -dx), axis=(0, 1))
            valid = ((rows + dy >= 0) & (rows + dy < H)
                     & (cols + dx >= 0) & (cols + dx < W)
                     ).astype(depth.dtype)
            return pair_loss(sd, spd, valid)

        ks = jax.random.split(key, n_global_shifts)
        return jnp.mean(jax.vmap(one)(ks))

    coords = jnp.stack(
        jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij"), axis=-1
    )
    shifts = jax.random.randint(key, (H, W, 2), -max_shift, max_shift + 1)
    shifted = jnp.clip(
        coords + shifts, jnp.array([0, 0]), jnp.array([H - 1, W - 1])
    )
    sd = depth[shifted[..., 0], shifted[..., 1]]
    spd = prior_depth[shifted[..., 0], shifted[..., 1]]
    return pair_loss(sd, spd, None)


def anisotropy_loss(scaling: jnp.ndarray, alive: jnp.ndarray,
                    max_ratio: float = 5.0) -> jnp.ndarray:
    """Penalize scale anisotropy beyond `max_ratio` (:484-490), masked mean
    over alive splats."""
    ratio = jnp.max(scaling, axis=-1) / jnp.maximum(jnp.min(scaling, axis=-1), 1e-12)
    pen = jnp.maximum(ratio, max_ratio) - max_ratio
    pen = pen * alive
    return jnp.sum(pen) / jnp.maximum(jnp.sum(alive), 1.0)


def schedule_regularization_factor(
    iteration, initial_factor: float = 0.5, time_interval: int = 1000,
    downscale_factor: float = 2.0, min_factor: float = 0.015,
):
    """Halve every 1000 iters, floored (matcha charts.py:108-113). Works on
    traced iteration (jnp) for fully-jitted training steps."""
    n = iteration // time_interval
    return jnp.maximum(initial_factor / (downscale_factor ** n), min_factor)


def schedule_depth_order_lambda(iteration):
    """0 → 1 → .1 → .01 → .001 at 1.5k/3k/4.5k/6k (:450-478)."""
    it = jnp.asarray(iteration)
    lam = jnp.where(it > 1500, 1.0, 0.0)
    lam = jnp.where(it > 3000, 0.1, lam)
    lam = jnp.where(it > 4500, 0.01, lam)
    lam = jnp.where(it > 6000, 0.001, lam)
    return lam


def psnr(pred, target) -> jnp.ndarray:
    mse = jnp.mean((pred - target) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
