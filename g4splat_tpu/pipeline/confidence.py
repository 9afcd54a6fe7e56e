"""Cross-view consistency ("confidence") maps for generated views.

Re-build of the reference's inconsistency solver
(2d-gaussian-splatting/guidance/inconsistence_solver.py:30-274): after plane
refinement, each view's refined point cloud is projected into every view;
a point is *visible* in a view when its projected depth agrees with that
view's refined depth map within 10% relative error. For See3D-generated
views, pixels whose surface point was already seen from an input view get
confidence 0 (the generated content there conflicts with real observations
and should not supervise color); points unseen by any input view propagate
one consistent color across the generated views that see them (color
harmonization, :140-233). Input views are all-ones (:36-48).

Pure-array re-formulation: the reference's per-view python loops with index
bookkeeping become a (num_points × num_views) visibility matrix computed in
one vmapped JAX pass; the color/confidence assignment stays in numpy (tiny,
data-dependent scatter).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class ConsistencyOut(NamedTuple):
    confident_maps: np.ndarray      # (V, H, W) uint8 in {0, 1}
    harmonized_images: np.ndarray   # (V, H, W, 3) images with colors unified
    visibility: np.ndarray          # (P, V) bool


def project_visibility(
    cameras,                 # batched Camera (V,)
    points: jnp.ndarray,     # (P, 3)
    depths: jnp.ndarray,     # (V, H, W) refined depths
    depth_threshold: float = 0.1,
):
    """(P, V) visibility + (P, V, 2) integer pixel coords."""
    H, W = depths.shape[1:]

    def per_view(cam, depth):
        xy, z = cam.project(points)
        u = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, W - 1)
        v = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, H - 1)
        in_img = (
            (xy[:, 0] >= -0.5) & (xy[:, 0] <= W - 0.5)
            & (xy[:, 1] >= -0.5) & (xy[:, 1] <= H - 0.5) & (z > 0)
        )
        d_at = depth[v, u]
        rel = jnp.abs(z - d_at) / (z + 1e-6)
        vis = in_img & (rel < depth_threshold)
        return vis, jnp.stack([u, v], axis=-1)

    vis, coords = jax.vmap(per_view)(cameras, depths)
    return jnp.swapaxes(vis, 0, 1), jnp.swapaxes(coords, 0, 1)  # (P,V), (P,V,2)


def build_visibility_masks(
    cameras,                  # batched Camera (V,)
    depths,                   # (V, H, W)
    depth_threshold: float = 0.1,
    least_num_views: int = 1,
):
    """Per-view multi-view covisibility (guidance/cam_utils.py:1620-1715).

    count[v][y, x] = number of OTHER views whose depth map agrees (<10%
    relative) with view v's pixel point projected into them; the binary mask
    is count >= least_num_views. Returns (counts (V,H,W) float32,
    masks (V,H,W) bool)."""
    import numpy as np

    depths = jnp.asarray(depths)
    V, H, W = depths.shape
    counts = []
    for i in range(V):
        cam_i = jax.tree.map(lambda x: x[i], cameras)
        pts = cam_i.backproject(depths[i]).reshape(-1, 3)
        vis, _ = project_visibility(cameras, pts, depths, depth_threshold)
        c = vis.sum(axis=1) - vis[:, i]  # exclude the source view itself
        counts.append(np.asarray(c.reshape(H, W), np.float32))
    counts = np.stack(counts)
    return counts, counts >= least_num_views


def anchor_plane_color_harmonize(
    cameras,                  # batched Camera (V,)
    depths,                   # (V, H, W) refined depths
    images,                   # (V, H, W, 3)
    plane_masks,              # list of (H, W) int instance masks
    global_plane_dict,        # {gid: [(view, plane_id), ...]}
    anchor_view_ids,          # stage anchor ids (merge anchor_view_id.json)
    depth_threshold: float = 0.1,
):
    """Stage-3 anchor-view plane color harmonization
    (guidance/plane_inconsistency_solver.py:119-262): for every global plane
    pick the anchor view seeing the most plane points; in every member view,
    plane pixels whose points project depth-consistently into that anchor are
    recolored from the anchor image. The confident maps for this pass are
    all-ones (:232-239). Returns the recolored image stack."""
    import numpy as np

    images = np.array(images, copy=True)
    depths = jnp.asarray(depths)
    V, H, W = depths.shape
    pts = []
    # Host-side projection matrices, fetched ONCE per view: the per-plane ×
    # per-anchor loop below issues thousands of tiny projections, and each
    # device dispatch over a remote-tunneled TPU costs ~0.1 s (the r05
    # budget run measured 313.7 s for this stage; the matmuls themselves are
    # microseconds of numpy).
    w2p = np.stack([
        np.asarray(jax.tree.map(lambda x, v=v: x[v], cameras).world2pix)
        for v in range(V)
    ])  # (V, 3, 4)

    def np_project(view, p):
        ph = p @ w2p[view, :, :3].T + w2p[view, :, 3]
        z = ph[:, 2]
        return ph[:, :2] / (z[:, None] + 1e-8), z

    for v in range(V):
        cam = jax.tree.map(lambda x, v=v: x[v], cameras)
        pts.append(np.asarray(cam.backproject(depths[v])).reshape(-1, 3))

    for gid, members in global_plane_dict.items():
        plane_pts = [
            pts[v][np.asarray(plane_masks[v]).reshape(-1) == pid]
            for (v, pid) in members
        ]
        if not plane_pts:
            continue
        pool = np.concatenate([p for p in plane_pts if len(p)] or
                              [np.zeros((0, 3), np.float32)])
        if len(pool) == 0:
            continue
        best, best_n = -1, 0
        for a in anchor_view_ids:
            xy, z = np_project(a, pool)
            in_img = (
                (xy[:, 0] >= 0) & (xy[:, 0] < W)
                & (xy[:, 1] >= 0) & (xy[:, 1] < H) & (z > 0)
            )
            n = int(in_img.sum())
            if n > best_n:
                best, best_n = a, n
        if best < 0:
            continue
        adepth = np.asarray(depths[best])
        aimg = images[best]
        for (v, pid), p in zip(members, plane_pts):
            if v == best or len(p) == 0:
                continue
            xy, z = np_project(best, p)
            u = np.clip(np.round(xy[:, 0]).astype(np.int64), 0, W - 1)
            vv = np.clip(np.round(xy[:, 1]).astype(np.int64), 0, H - 1)
            in_img = (
                (xy[:, 0] >= 0) & (xy[:, 0] < W)
                & (xy[:, 1] >= 0) & (xy[:, 1] < H) & (z > 0)
            )
            rel = np.abs(z - adepth[vv, u]) / (z + 1e-6)
            ok = in_img & (rel < depth_threshold)
            ys, xs = np.where(np.asarray(plane_masks[v]) == pid)
            images[v, ys[ok], xs[ok]] = aimg[vv[ok], u[ok]]
    return images


def compute_confidence_maps(
    cameras,
    points: np.ndarray,          # (P, 3) union of refined per-view points
    depths: np.ndarray,          # (V, H, W)
    images: np.ndarray,          # (V, H, W, 3) float [0,1]
    input_view_num: int,
    depth_threshold: float = 0.1,
) -> ConsistencyOut:
    V, H, W = depths.shape
    vis, coords = project_visibility(
        cameras, jnp.asarray(points, jnp.float32), jnp.asarray(depths),
        depth_threshold,
    )
    vis = np.asarray(vis)
    coords = np.asarray(coords)
    images = np.array(images, copy=True)

    seen_in_input = vis[:, :input_view_num].any(axis=1)     # (P,)

    # One canonical color per input-unseen point: from its first seeing view.
    P = len(points)
    point_colors = np.zeros((P, 3), np.float32)
    unseen_idx = np.flatnonzero(~seen_in_input & vis.any(axis=1))
    if len(unseen_idx):
        first_view = np.argmax(vis[unseen_idx], axis=1)
        uu = coords[unseen_idx, first_view, 0]
        vv = coords[unseen_idx, first_view, 1]
        point_colors[unseen_idx] = images[first_view, vv, uu]

    conf = np.ones((V, H, W), np.uint8)
    for view in range(input_view_num, V):
        visible = np.flatnonzero(vis[:, view])
        if len(visible) == 0:
            continue
        u = coords[visible, view, 0]
        v = coords[visible, view, 1]
        in_input = seen_in_input[visible]
        # Generated content over already-observed surface → not confident.
        conf[view, v[in_input], u[in_input]] = 0
        # Unify colors of newly-hallucinated surface across generated views.
        new = ~in_input
        images[view, v[new], u[new]] = point_colors[visible[new]]
    return ConsistencyOut(conf, images, vis)
