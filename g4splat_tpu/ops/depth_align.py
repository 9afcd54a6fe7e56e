"""Closed-form affine alignment of monocular disparity/depth to metric depth.

Re-implements the reference's alignment family (matcha/pointmap/
depthanythingv2.py:156-339): a weighted least squares fit of
``target ≈ alpha + beta·source`` — in *disparity* space for monocular
relative-depth models (DepthAnythingV2 outputs disparity up to an affine
transform) or in depth space — with an optional RANSAC variant for outlier
tolerance (See3D lifts use it, :311-339).

The normal equations (documented analytically in the reference docstring,
:171-192, which doubles as the test oracle):
    beta  = [Σw·t·s − Σw·t·Σw·s/Σw] / [Σw·s² − (Σw·s)²/Σw]
    alpha = Σw·(t − beta·s) / Σw
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def affine_fit(source: jnp.ndarray, target: jnp.ndarray,
               weights: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted LS fit target ≈ alpha + beta·source. Masked samples get w=0."""
    w = weights
    sw = jnp.sum(w)
    sws = jnp.sum(w * source)
    swt = jnp.sum(w * target)
    swss = jnp.sum(w * source * source)
    swts = jnp.sum(w * target * source)
    beta_num = swts - swt * sws / sw
    beta_den = swss - sws * sws / sw
    beta = beta_num / jnp.where(jnp.abs(beta_den) < 1e-20, 1.0, beta_den)
    alpha = (swt - beta * sws) / sw
    return alpha, beta


@jax.jit
def fit_disparity_to_depth(
    disp: jnp.ndarray,        # (H, W) monocular disparity (affine-ambiguous)
    ref_depth: jnp.ndarray,   # (K,) metric depths of reference samples
    sample_disp: jnp.ndarray, # (K,) disparity sampled at those locations
    weights: jnp.ndarray,     # (K,) 0 for invalid samples
):
    """Affine fit in disparity space: 1/ref_depth ≈ alpha + beta·disp, then
    depth = 1/(alpha + beta·disp) (fit_depth_to_point_cloud, :245-255).
    Returns (aligned_depth (H, W), alpha, beta)."""
    true_disp = 1.0 / jnp.maximum(ref_depth, 1e-8)
    alpha, beta = affine_fit(sample_disp, true_disp, weights)
    aligned = 1.0 / jnp.maximum(alpha + beta * disp, 1e-8)
    return aligned, alpha, beta


@jax.jit
def depth_linear_align(
    disp: jnp.ndarray,
    render_depth: jnp.ndarray,
    visible_mask: jnp.ndarray,
):
    """Dense variant: fit against a rendered depth map under a visibility mask
    (depth_linear_align, :260-284). Returns (aligned_depth, alpha, beta)."""
    w = visible_mask.astype(jnp.float32).reshape(-1)
    t = 1.0 / jnp.maximum(render_depth.reshape(-1), 1e-8)
    s = disp.reshape(-1)
    alpha, beta = affine_fit(s, t, w)
    return 1.0 / jnp.maximum(alpha + beta * disp, 1e-8), alpha, beta


@jax.jit
def depth_linear_align_depth_space(
    depth: jnp.ndarray,
    render_depth: jnp.ndarray,
    visible_mask: jnp.ndarray,
):
    """Depth-space variant (depth_linear_align_2, :287-310)."""
    w = visible_mask.astype(jnp.float32).reshape(-1)
    alpha, beta = affine_fit(depth.reshape(-1), render_depth.reshape(-1), w)
    return alpha + beta * depth, alpha, beta


def depth_linear_align_ransac(
    depth: np.ndarray,
    render_depth: np.ndarray,
    visible_mask: np.ndarray,
    min_samples: int = 5,
    residual_threshold: float = 0.02,
    seed: int = 42,
):
    """RANSAC affine fit in depth space (depth_linear_align_ransac, :311-339;
    sklearn RANSACRegressor semantics). Host-side (tiny problem: a line fit).
    Returns (aligned_depth, alpha, beta, inlier_ratio)."""
    s = np.asarray(depth)[np.asarray(visible_mask, bool)].reshape(-1)
    t = np.asarray(render_depth)[np.asarray(visible_mask, bool)].reshape(-1)
    n = len(s)
    if n < min_samples:
        return np.asarray(depth), 0.0, 1.0, 0.0
    rng = np.random.default_rng(seed)
    best_inliers = None
    best_count = -1
    n_trials = 100
    for _ in range(n_trials):
        idx = rng.choice(n, min_samples, replace=False)
        A = np.stack([np.ones(min_samples), s[idx]], axis=1)
        try:
            coef, *_ = np.linalg.lstsq(A, t[idx], rcond=None)
        except np.linalg.LinAlgError:
            continue
        resid = np.abs(coef[0] + coef[1] * s - t)
        inliers = resid < residual_threshold
        c = int(inliers.sum())
        if c > best_count:
            best_count = c
            best_inliers = inliers
    if best_inliers is None or best_count < 2:
        alpha, beta = 0.0, 1.0
        inlier_ratio = 0.0
    else:
        A = np.stack([np.ones(best_count), s[best_inliers]], axis=1)
        coef, *_ = np.linalg.lstsq(A, t[best_inliers], rcond=None)
        alpha, beta = float(coef[0]), float(coef[1])
        inlier_ratio = best_count / n
    return alpha + beta * np.asarray(depth), alpha, beta, inlier_ratio


def sample_disparity_at_points(disp: jnp.ndarray, cam, pts_world: jnp.ndarray):
    """Project world points into the view and bilinearly sample disparity;
    returns (samples (N,), in-fov mask) (get_points_depth_in_depthmap
    equivalent)."""
    from g4splat_tpu.core.geometry import bilinear_sample

    xy, z = cam.project(pts_world)
    H, W = disp.shape
    in_fov = (
        (xy[:, 0] >= 0) & (xy[:, 0] <= W - 1)
        & (xy[:, 1] >= 0) & (xy[:, 1] <= H - 1) & (z > 0)
    )
    vals = bilinear_sample(disp[..., None], xy)[..., 0]
    return vals, in_fov, z
