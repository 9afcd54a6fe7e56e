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
