"""Synthetic box-room quality benchmark: known geometry, known images.

The reference's quality product is ``result_iter_{it}.json`` with image
metrics on a held-out split plus mesh Acc/Comp/Chamfer against a GT mesh
(eval/eval.py:92-104, eval/mesh_eval.py:62-76) — but its scenes need real
captures and pretrained priors.  This module provides a fully self-contained
stand-in with an analytically-known surface so end-to-end quality is
falsifiable in CI and on-chip:

* ``box_room()`` — three walls + floor + a box, as surfel splats sampled ON
  the surfaces (normal-aligned disks, procedural multi-frequency texture)
  together with the exact GT triangle mesh of those surfaces.
* ``quality_run()`` — renders V posed views from the GT splats, holds out
  ``eval_split`` views, runs the posed pipeline tail (charts → planes →
  refined depths → 2DGS training → mesh) with no learned priors, and
  returns the reference-schema results dict (held-out PSNR/SSIM + Chamfer).

tests/test_quality.py asserts the committed thresholds; RESULTS.md records
the measured numbers (CPU tier and on-chip).
"""

import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def _normal_quats(normals: np.ndarray) -> np.ndarray:
    """(w,x,y,z) quaternions rotating the disk normal +z onto ``normals``."""
    z = np.array([0.0, 0.0, 1.0], np.float32)
    n = normals / np.maximum(np.linalg.norm(normals, axis=1, keepdims=True),
                             1e-9)
    w = 1.0 + n @ z                      # = 1 + cos(theta)
    axis = np.cross(np.tile(z, (len(n), 1)), n)
    # Antipodal (n == -z): rotate pi about x.
    flip = w < 1e-6
    axis[flip] = [1.0, 0.0, 0.0]
    w = np.where(flip, 0.0, w)
    q = np.concatenate([w[:, None], axis], axis=1).astype(np.float32)
    return q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-9)


def _texture(p: np.ndarray) -> np.ndarray:
    """Deterministic multi-frequency RGB texture over 3D points."""
    f = np.stack([
        np.sin(3.1 * p[:, 0] + 1.7 * p[:, 2]),
        np.sin(2.3 * p[:, 1] + 2.9 * p[:, 0] + 1.0),
        np.sin(4.1 * p[:, 2] + 1.3 * p[:, 1] + 2.0),
    ], axis=1)
    checker = ((np.floor(p[:, 0] * 2.5) + np.floor(p[:, 2] * 2.5)) % 2.0)
    return (0.45 + 0.3 * f + 0.2 * checker[:, None]).clip(0.02, 0.98)


def _plane_patch(origin, u, v, rng, density, grid_spacing=0.025):
    """Sample points + (normal, grid mesh) for a rectangle patch.

    The mesh is a ``grid_spacing``-spaced triangle grid, NOT two big quads:
    the reference's Chamfer protocol (mesh_eval.py:28-40) compares voxel-
    downsampled VERTEX clouds, which is only meaningful when vertices
    densely cover the surface (true for Replica scan meshes). Corner-only
    quads made every predicted vertex ~0.6 m from its nearest GT vertex."""
    uu = rng.uniform(0, 1, (density, 1))
    vv = rng.uniform(0, 1, (density, 1))
    pts = (np.asarray(origin)[None]
           + uu * np.asarray(u)[None] + vv * np.asarray(v)[None])
    nrm = np.cross(u, v)
    nrm = nrm / np.linalg.norm(nrm)
    o = np.asarray(origin, np.float32)
    u = np.asarray(u, np.float32)
    v = np.asarray(v, np.float32)
    nu = max(int(np.ceil(np.linalg.norm(u) / grid_spacing)), 1)
    nv = max(int(np.ceil(np.linalg.norm(v) / grid_spacing)), 1)
    gu = np.linspace(0.0, 1.0, nu + 1, dtype=np.float32)
    gv = np.linspace(0.0, 1.0, nv + 1, dtype=np.float32)
    verts = (o[None, None]
             + gu[:, None, None] * u[None, None]
             + gv[None, :, None] * v[None, None]).reshape(-1, 3)
    idx = np.arange((nu + 1) * (nv + 1)).reshape(nu + 1, nv + 1)
    a = idx[:-1, :-1].ravel()
    b = idx[1:, :-1].ravel()
    c = idx[1:, 1:].ravel()
    d = idx[:-1, 1:].ravel()
    faces = np.concatenate(
        [np.stack([a, b, c], 1), np.stack([a, c, d], 1)]).astype(np.int32)
    return pts.astype(np.float32), nrm.astype(np.float32), verts, faces


def box_room(points_per_m2: int = 9000, seed: int = 0):
    """GT splat scene + exact mesh. Room: floor y=+1, back wall z=+1.5,
    side walls x=±1.5, plus a 0.6-cube on the floor."""
    rng = np.random.RandomState(seed)
    patches = [
        # floor: y = 1, spanning x,z in [-1.5, 1.5]
        ([-1.5, 1.0, -1.5], [3.0, 0, 0], [0, 0, 3.0]),
        # back wall z = 1.5
        ([-1.5, -1.0, 1.5], [3.0, 0, 0], [0, 2.0, 0]),
        # left wall x = -1.5
        ([-1.5, -1.0, -1.5], [0, 0, 3.0], [0, 2.0, 0]),
        # right wall x = 1.5
        ([1.5, -1.0, -1.5], [0, 2.0, 0], [0, 0, 3.0]),
    ]
    # 0.6 cube sitting on the floor, centred at (0.2, 0.7, 0.3)
    c, h = np.array([0.2, 0.7, 0.3]), 0.3
    for axis in range(3):
        for sgn in (-1.0, 1.0):
            if axis == 1 and sgn > 0:
                continue  # bottom face touches the floor — skip
            u = np.zeros(3)
            v = np.zeros(3)
            u[(axis + 1) % 3] = 2 * h
            v[(axis + 2) % 3] = 2 * h * sgn  # winding flips with the side
            o = c.copy()
            o[axis] += sgn * h
            o[(axis + 1) % 3] -= h
            o[(axis + 2) % 3] -= h * sgn
            patches.append((o.tolist(), u.tolist(), v.tolist()))

    pts_all, quats_all, verts_all, faces_all = [], [], [], []
    voff = 0
    for origin, u, v in patches:
        area = np.linalg.norm(np.cross(u, v))
        dens = max(int(points_per_m2 * area), 64)
        pts, nrm, verts, faces = _plane_patch(origin, u, v, rng, dens)
        pts_all.append(pts)
        quats_all.append(_normal_quats(np.tile(nrm, (len(pts), 1))))
        verts_all.append(verts)
        faces_all.append(faces + voff)
        voff += len(verts)
    pts = np.concatenate(pts_all)
    quats = np.concatenate(quats_all)
    cols = _texture(pts).astype(np.float32)
    # Disk radius from sampling density: ~2x mean NN spacing closes holes.
    scales = np.full(len(pts), 2.2 / np.sqrt(points_per_m2), np.float32)

    from g4splat_tpu.models.gaussians import GaussianScene

    gt = GaussianScene.from_points(pts, cols, scales=scales, quats=quats,
                                   initial_opacity=0.95)
    return gt, (np.concatenate(verts_all), np.concatenate(faces_all))


def cull_mesh_to_views(verts: np.ndarray, faces: np.ndarray,
                       cameras, depths: np.ndarray,
                       tol: float = 0.05):
    """Restrict a GT mesh to the region observable from ``cameras``.

    The reference evaluates against prepared scene GT meshes that cover
    (roughly) the scanned region; an analytic room mesh includes surfaces no
    train camera ever sees, which would charge Comp/Chamfer for geometry the
    pipeline had zero evidence of. A vertex is kept when some camera sees it
    within ``tol`` of that camera's GT depth map (frustum + occlusion test);
    faces keep only fully-visible triangles."""
    import jax

    V = jax.tree.leaves(cameras)[0].shape[0]
    keep = np.zeros(len(verts), bool)
    for i in range(V):
        cam = jax.tree.map(lambda x, i=i: np.asarray(x[i]), cameras)
        w2c = np.asarray(cam.w2c)
        p = verts @ w2c[:3, :3].T + w2c[:3, 3]
        z = p[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            u = p[:, 0] / z * float(cam.fx) + float(cam.cx)
            v = p[:, 1] / z * float(cam.fy) + float(cam.cy)
        H, W = depths[i].shape
        inb = (z > 1e-6) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
        ui = np.clip(u.astype(np.int64), 0, W - 1)
        vi = np.clip(v.astype(np.int64), 0, H - 1)
        d = depths[i][vi, ui]
        keep |= inb & (z <= d + tol)
    fkeep = keep[faces].all(axis=1)
    used = np.unique(faces[fkeep])
    remap = np.full(len(verts), -1, np.int64)
    remap[used] = np.arange(len(used))
    return verts[used], remap[faces[fkeep]].astype(np.int32)


def room_cameras(n: int, width: int, height: int):
    """Ring of n cameras inside the room looking past the box."""
    from g4splat_tpu.core.cameras import lookat_camera, stack_cameras

    cams = []
    for i, a in enumerate(np.linspace(-0.75, 0.75, n)):
        eye = [1.1 * np.sin(a), -0.25 + 0.1 * np.cos(3 * a),
               -1.4 + 0.15 * np.cos(a)]
        tgt = [0.25 * np.sin(a * 0.5), 0.45, 0.6]
        cams.append(lookat_camera(eye, tgt, [0, -1, 0],
                                  fx=width * 0.85, fy=width * 0.85,
                                  width=width, height=height))
    return stack_cameras(cams)


def quality_run(out_dir: str,
                res: int = 128,
                n_views: int = 8,
                eval_split: Sequence[int] = (2, 5),
                train_iters: int = 600,
                backend: str = "tiled",
                tsdf_resolution: int = 96,
                points_per_m2: int = 9000,
                extra_cfg: Optional[Dict] = None) -> Dict:
    """End-to-end posed quality run; returns the results dict (held-out
    Average-PSNR/SSIM + mesh Chamfer-L1 vs the analytic GT mesh)."""
    import jax

    from g4splat_tpu.ops.rasterize import render
    from g4splat_tpu.pipeline.orchestrator import (
        G4SplatPipeline, PipelineConfig, Priors,
    )

    W, H = res, res * 3 // 4
    gt, gt_mesh = box_room(points_per_m2=points_per_m2)
    cameras = room_cameras(n_views, W, H)
    imgs, depths = [], []
    for i in range(n_views):
        cam = jax.tree.map(lambda x: x[i], cameras)
        out = render(cam, gt, backend=backend)
        imgs.append(np.asarray(out["render"]))
        d = np.array(out["surf_depth"])
        d[d <= 0] = 3.2
        depths.append(d)
    images = np.stack(imgs)
    depths = np.stack(depths)

    cfg = PipelineConfig(
        source_path="synthetic-box-room",
        output_path=out_dir,
        sfm_config="posed",
        train_iterations=train_iters,
        n_see3d_stages=0,          # no generative priors in the gate
        render_backend=backend,
        use_multires_tsdf=True,
        tsdf_resolution=tsdf_resolution,
        eval_split=list(eval_split),
        vis_grid_resolution=0,
        **(extra_cfg or {}),
    )
    pipe = G4SplatPipeline(cfg, Priors())
    pipe.load_inputs(images, cameras)
    train_ids = [i for i in range(n_views) if i not in set(eval_split)]
    pipe.state.prior_depths = depths[train_ids].copy()
    pipe.state.depths = depths[train_ids].copy()

    pipe.align_charts()
    pipe.render_chart_views()
    pipe.excavate_planes()
    pipe.refine_plane_depths()
    pipe.train_gaussians()
    # Chamfer against the train-visible region only (cull_mesh_to_views):
    # surfaces no train camera sees are not reconstruction failures.
    tc = jax.tree.map(lambda x: x[np.asarray(train_ids)], cameras)
    gt_mesh = cull_mesh_to_views(gt_mesh[0], gt_mesh[1], tc,
                                 depths[train_ids])
    results = pipe.evaluate(gt_mesh=gt_mesh)
    results["timings"] = {k: round(v, 2) for k, v in pipe.timings.items()}
    return results
