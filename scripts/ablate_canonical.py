"""Ablation: canonical-depth construction — plain conf-weighted z-average
(avg-z) vs the reference's block-angle canonicalization (avg-angle;
sparse_ga.py:875-913). Round-3 VERDICT ask #8.

Synthetic ground truth: V views of a wavy surface; each view receives K
simulated pointmap predictions = GT pointmap corrupted with (a) a
per-prediction DEPTH BIAS (the MASt3R failure mode the avg-angle trick
targets: per-pair global depth offsets), (b) smooth low-frequency warp,
(c) per-pixel noise, with varying confidence maps. Both canonicalizations
reconstruct per-view depths; we report depth RMSE vs GT and the downstream
pose error after sparse_global_alignment on fixture correspondences.

Writes one markdown table to stdout (paste into PARITY.md).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np


def synth_view_pointmaps(V=4, H=32, W=40, f=40.0, seed=0):
    """GT per-view pointmaps of a wavy surface in CAMERA frame + cameras."""
    import jax.numpy as jnp

    from g4splat_tpu.core.cameras import lookat_camera

    cams = []
    for i in range(V):
        a = (i - (V - 1) / 2) * 0.3
        cams.append(lookat_camera([2.5 * np.sin(a), 0.2, -2.5 * np.cos(a)],
                                  [0, 0, 0], [0, -1, 0],
                                  fx=f, fy=f, width=W, height=H))
    gt_pm = []
    for c in cams:
        o, d = c.pixel_rays()
        o, d = np.asarray(o), np.asarray(d).reshape(H, W, 3)
        # Intersect rays with the wavy heightfield z = h(x, y) by fixed-point
        # iteration from the z=0 plane (amplitude << depth ⇒ converges fast).
        t = -(o @ np.array([0, 0, 1.0])) / d[..., 2]
        for _ in range(25):
            p = o + t[..., None] * d
            h = 0.18 * np.sin(2.3 * p[..., 0]) * np.cos(1.9 * p[..., 1])
            t = (h - o[2]) / d[..., 2]
        p_world = o + t[..., None] * d
        w2c = np.asarray(c.w2c)
        p_cam = p_world @ w2c[:3, :3].T + w2c[:3, 3]
        gt_pm.append(p_cam.astype(np.float32))
    return cams, np.stack(gt_pm)


def corrupt(pm, rng, depth_bias_sigma=0.15, warp_sigma=0.02, noise=0.01):
    """One simulated prediction of a GT pointmap (camera frame)."""
    H, W, _ = pm.shape
    out = pm.copy()
    out[..., 2] += rng.randn() * depth_bias_sigma          # per-pred bias
    # low-frequency warp on depth
    gy = rng.randn(4, 5)
    from scipy.ndimage import zoom

    lowf = zoom(gy, (H / 4, W / 5), order=1)
    out[..., 2] *= 1.0 + warp_sigma * lowf
    out += rng.randn(H, W, 3) * noise
    conf = 1.0 + np.exp(rng.randn(H, W) * 0.3)
    return out.astype(np.float32), conf.astype(np.float32)


def main(seed=0):
    from g4splat_tpu.pipeline.sfm import (
        SfMConfig, align_to_calibrated_locations, canonical_views_from_pairs,
        sparse_global_alignment, build_pairs_exhaustive)
    from test_sfm import make_sfm_problem

    rng = np.random.RandomState(seed)
    V, H, W, f = 4, 32, 40, 40.0
    cams, gt_pm = synth_view_pointmaps(V=V, H=H, W=W, f=f, seed=seed)
    gt_depth = gt_pm[..., 2]

    # Simulated pair outputs (exhaustive graph → K=V-1 predictions/view).
    pair_outputs = {}
    for i, j in build_pairs_exhaustive(V):
        mk = lambda v: {"pts3d": corrupt(gt_pm[v], rng)[0][None],
                        "conf": None}
        o11p, o11c = corrupt(gt_pm[i], rng)
        o22p, o22c = corrupt(gt_pm[j], rng)
        pair_outputs[(i, j)] = (
            {"pts3d": o11p[None], "conf": o11c[None]},
            None,
            {"pts3d": o22p[None], "conf": o22c[None]},
            None,
        )

    rows = []
    # Pose-error fixture: GT correspondences + perturbed init, depth maps
    # swapped between the two canonicalizations.
    _, w2c_gt, _, _, pairs, _ = make_sfm_problem(V=V, H=H, W=W)
    for mode in ("avg-z", "avg-angle"):
        depths, focals = canonical_views_from_pairs(V, pair_outputs,
                                                    mode=mode)
        rmse = float(np.sqrt(np.mean((depths - gt_depth) ** 2)))
        rel = float(np.mean(np.abs(depths - gt_depth) / gt_depth))
        w2c_bad = w2c_gt.copy()
        w2c_bad[:, :3, 3] += np.random.RandomState(3).randn(V, 3) * 0.1
        cfg = SfMConfig(niter1=400, niter2=200)
        res = sparse_global_alignment(depths, np.full(V, f, np.float32),
                                      pairs, cfg, init_w2c=w2c_bad)
        aligned = align_to_calibrated_locations(
            res, np.stack([np.linalg.inv(m)[:3, 3] for m in w2c_gt]))
        c_gt = np.stack([np.linalg.inv(m)[:3, 3] for m in w2c_gt])
        c_out = np.stack([np.linalg.inv(m)[:3, 3] for m in aligned.w2c])
        pose_err = float(np.linalg.norm(c_out - c_gt, axis=1).mean())
        # Depth error of the OPTIMIZED maps vs GT (median-scale aligned).
        dm = res.depthmaps
        scale = np.median(gt_depth / np.maximum(dm, 1e-6))
        opt_rel = float(np.mean(np.abs(dm * scale - gt_depth) / gt_depth))
        rows.append((mode, rmse, rel, pose_err, opt_rel))

    print("| canonical mode | depth RMSE (m) | rel depth err | "
          "pose err (m) | optimized rel depth err |")
    print("|---|---|---|---|---|")
    for mode, rmse, rel, pe, orel in rows:
        print(f"| {mode} | {rmse:.4f} | {rel:.4%} | {pe:.4f} | {orel:.4%} |")


if __name__ == "__main__":
    main()
