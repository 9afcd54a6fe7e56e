"""Adaptive TSDF evaluation at arbitrary query points.

JAX re-build of the reference's AdaptiveTSDF
(matcha/dm_extractors/adaptive_tsdf.py:115-345): instead of a voxel volume,
the truncated signed distance is evaluated *at arbitrary points* (tetrahedra
vertices, binary-search midpoints) by projecting them into every rendered
depth map and fusing per-view observations.

The reference mutates buffers view-by-view; here integration is one
`lax.scan` over a batched camera/image pytree, jitted once and reused for
every binary-search refinement step. Points are chunked so millions of query
points stream through fixed-size device buffers.

Semantics preserved: bilinear depth sampling with gradient-aware fallback to
nearest (:270-283), frustum + znear/zfar validity (:247-252), optional depth-
gradient and normal-consistency filters (:255-264), sdf = clamp_max(Δ/trunc, 1)
with discard below −trunc (:288-296), optional unbiasing by |ray·normal|
(:290-297), weighted running mean (or min() for binary-opacity mode) plus
color mean (:313-339), softmax-by-distance / normal-consistency weighting
(:299-306), and the final 0.5−v flip for binary mode (:341-345).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from g4splat_tpu.core.cameras import Camera
from g4splat_tpu.core.geometry import bilinear_sample


@struct.dataclass
class TSDFConfig:
    trunc_margin: float = struct.field(pytree_node=False, default=0.05)
    znear: float = struct.field(pytree_node=False, default=1e-6)
    zfar: float = struct.field(pytree_node=False, default=1e6)
    use_binary_opacity: bool = struct.field(pytree_node=False, default=False)
    interpolate_depth: bool = struct.field(pytree_node=False, default=True)
    weight_interpolation_by_depth_gradient: bool = struct.field(
        pytree_node=False, default=False
    )
    depth_gradient_threshold: float = struct.field(pytree_node=False, default=1.0)
    filter_with_depth_gradient: bool = struct.field(pytree_node=False, default=False)
    depth_gradient_threshold_for_filtering: float = struct.field(
        pytree_node=False, default=1.0
    )
    unbias_depth_using_normals: bool = struct.field(pytree_node=False, default=False)
    weight_by_softmax: bool = struct.field(pytree_node=False, default=False)
    softmax_temperature: float = struct.field(pytree_node=False, default=1.0)
    # 'bilinear' | 'nearest' — sampling mode when interpolate_depth is on
    # (adaptive_tsdf.py integrate(interpolation_mode), configs
    # adaptive_tetrahedralization/default.yaml).
    interpolation_mode: str = struct.field(pytree_node=False, default="bilinear")
    # Drop observations whose rendered-vs-surface normal agreement
    # (reference_normals · normals) is below threshold (:257-264), and/or
    # weight observations by |agreement| (:305-306).
    filter_with_normal_consistency: bool = struct.field(
        pytree_node=False, default=False
    )
    normal_consistency_threshold: float = struct.field(
        pytree_node=False, default=0.5
    )
    weight_by_normal_consistency: bool = struct.field(
        pytree_node=False, default=False
    )


class TSDFOut(NamedTuple):
    tsdf: jnp.ndarray     # (N,)
    colors: jnp.ndarray   # (N, 3)
    weights: jnp.ndarray  # (N,)


def _depth_gradient(depth: jnp.ndarray) -> jnp.ndarray:
    """Replicate-padded central differences magnitude (reference :215-221)."""
    p = jnp.pad(depth, 1, mode="edge")
    gx = p[2:, 1:-1] - p[:-2, 1:-1]
    gy = p[1:-1, 2:] - p[1:-1, :-2]
    return jnp.sqrt(gx * gx + gy * gy)


@functools.partial(jax.jit, static_argnames=("cfg",))
def integrate_views(
    points: jnp.ndarray,              # (N, 3)
    cameras: Camera,                  # batched (V, …)
    images: jnp.ndarray,              # (V, H, W, 3)
    depths: jnp.ndarray,              # (V, H, W)
    cfg: TSDFConfig,
    normals: Optional[jnp.ndarray] = None,   # (V, H, W, 3) surface normals
    reference_normals: Optional[jnp.ndarray] = None,  # (V, H, W, 3) rendered
) -> TSDFOut:
    N = points.shape[0]
    init = (
        jnp.ones(N) if cfg.use_binary_opacity else -jnp.ones(N),
        jnp.zeros(N),
        jnp.zeros((N, 3)),
    )
    need_nc = (cfg.filter_with_normal_consistency
               or cfg.weight_by_normal_consistency)

    def view_step(carry, inp):
        tsdf, weights, colors = carry
        cam_leaves, img, depth, nrm, ref_nrm = inp
        cam = cam_leaves

        W = img.shape[1]
        H = img.shape[0]
        xy, z = cam.project(points)
        px, py = xy[:, 0], xy[:, 1]
        ix = jnp.clip(jnp.round(px).astype(jnp.int32), 0, W - 1)
        iy = jnp.clip(jnp.round(py).astype(jnp.int32), 0, H - 1)

        valid = (
            (px >= 0) & (px <= W - 1) & (py >= 0) & (py <= H - 1)
            & (z > cfg.znear) & (z < cfg.zfar)
        )

        grad = _depth_gradient(depth)
        if cfg.filter_with_depth_gradient:
            valid = valid & (
                grad[iy, ix] < cfg.depth_gradient_threshold_for_filtering
            )

        if need_nc:
            # Per-pixel agreement between the alpha-blended splat normals and
            # the depth-derived surface normals (adaptive_tsdf.py:257-264).
            nc = jnp.sum(ref_nrm * nrm, axis=-1)[iy, ix]
            if cfg.filter_with_normal_consistency:
                valid = valid & (nc > cfg.normal_consistency_threshold)

        if cfg.interpolate_depth and cfg.interpolation_mode != "nearest":
            d_at = bilinear_sample(depth[..., None], xy)[..., 0]
            if cfg.weight_interpolation_by_depth_gradient:
                d_near = depth[iy, ix]
                d_at = jnp.where(
                    grad[iy, ix] > cfg.depth_gradient_threshold, d_near, d_at
                )
        else:
            d_at = depth[iy, ix]

        diff = d_at - z
        valid = valid & (d_at > 0) & (diff >= -cfg.trunc_margin)

        if cfg.unbias_depth_using_normals and normals is not None:
            rays = points - cam.center
            rays = rays / (jnp.linalg.norm(rays, axis=-1, keepdims=True) + 1e-12)
            n_at = nrm[iy, ix]
            diff = diff * jnp.abs(jnp.sum(rays * n_at, axis=-1))

        dist = jnp.minimum(diff / cfg.trunc_margin, 1.0)

        w = jnp.ones(N)
        if cfg.weight_by_softmax:
            w = w * jnp.exp(cfg.softmax_temperature * dist)
        if cfg.weight_by_normal_consistency:
            w = w * jnp.abs(nc)
        w = jnp.where(valid, w, 0.0)

        new_weights = weights + w
        safe = jnp.maximum(new_weights, 1e-12)
        if cfg.use_binary_opacity:
            opacity = (dist < 0.0).astype(jnp.float32)
            tsdf = jnp.where(valid, jnp.minimum(tsdf, opacity), tsdf)
        else:
            tsdf = jnp.where(
                valid, (tsdf * weights + dist * w) / safe, tsdf
            )

        img_at = (
            bilinear_sample(img, xy)
            if cfg.interpolate_depth and cfg.interpolation_mode != "nearest"
            else img[iy, ix]
        )
        colors = jnp.where(
            valid[:, None],
            jnp.clip((colors * weights[:, None] + img_at * w[:, None])
                     / safe[:, None], 0.0, 1.0),
            colors,
        )
        return (tsdf, new_weights, colors), None

    nrm = normals if normals is not None else jnp.zeros_like(images)
    ref_nrm = (reference_normals if reference_normals is not None
               else jnp.zeros_like(images))
    (tsdf, weights, colors), _ = jax.lax.scan(
        view_step, init, (cameras, images, depths, nrm, ref_nrm)
    )
    if cfg.use_binary_opacity:
        tsdf = 0.5 - tsdf
    return TSDFOut(tsdf, colors, weights)


def apply_sdf_tolerance(depth: jnp.ndarray, focal: float,
                        tolerance_px: float = 1.5,
                        max_tolerance: float = 0.01) -> jnp.ndarray:
    """Shrink depths by a pixel-scaled tolerance so the TSDF zero-crossing
    sits slightly in front of the rendered surface
    (extract_mesh_adaptive_tsdf.py:175-184: tolerance = clamp(tol_px / focal
    · depth, max=1e-3·extent), depth -= tolerance)."""
    tol = jnp.minimum(tolerance_px / focal * depth, max_tolerance)
    return depth - tol


def dilate_depth_along_normals(cam, depth: jnp.ndarray, rgb: jnp.ndarray,
                               dilation_px: float = 1.5,
                               max_dilation: float = 0.01):
    """Depth/RGB dilation (extract_mesh_adaptive_tsdf.py:49-137): backproject
    the depth map, displace each surface point along its (depth-derived)
    normal by clamp(dilation_px/focal·depth, max_dilation), and re-render.

    TPU-native deviation: the reference builds a pytorch3d manifold mesh and
    rasterizes it; for a ~1.5-pixel displacement the re-render is equivalent
    to a z-buffer point splat of the displaced points at their new pixel
    coordinates (scatter-min over depth), which avoids a mesh rasterizer
    entirely. Pixels no displaced point lands on keep the original values
    (the reference's rendered-zero fallback, :133-134)."""
    from g4splat_tpu.core.geometry import depth_to_normal

    H, W = depth.shape
    pts = cam.backproject(depth)                      # (H, W, 3) world
    nrm = depth_to_normal(cam, depth)                 # (H, W, 3) world, unit
    focal = (cam.fx + cam.fy) / 2.0
    fac = jnp.minimum(dilation_px / focal * depth, max_dilation)[..., None]
    moved = (pts + fac * nrm).reshape(-1, 3)
    xy, z = cam.project(moved)
    ix = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, W - 1)
    iy = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, H - 1)
    ok = (
        (xy[:, 0] >= -0.5) & (xy[:, 0] <= W - 0.5)
        & (xy[:, 1] >= -0.5) & (xy[:, 1] <= H - 0.5)
        & (z > 1e-6) & (depth.reshape(-1) > 0)
    )
    flat = iy * W + ix
    big = jnp.float32(1e10)
    zb = jnp.full(H * W, big).at[jnp.where(ok, flat, 0)].min(
        jnp.where(ok, z, big))
    # Color of the winning (nearest) point per pixel: argmin via a second
    # scatter keyed on exact-z match.
    win = zb[flat] == z
    cb = jnp.zeros((H * W, 3)).at[flat].max(
        jnp.where((ok & win)[:, None], rgb.reshape(-1, 3), 0.0))
    hit = zb < big
    new_depth = jnp.where(hit.reshape(H, W), zb.reshape(H, W), depth)
    new_rgb = jnp.where(hit.reshape(H, W, 1), cb.reshape(H, W, 3), rgb)
    return new_depth, new_rgb


def integrate_views_chunked(
    points,
    cameras,
    images,
    depths,
    cfg: TSDFConfig,
    normals=None,
    reference_normals=None,
    chunk: int = 262_144,
) -> TSDFOut:
    """Stream large point sets through fixed-size chunks (stable jit shapes)."""
    import numpy as np

    N = points.shape[0]
    outs = []
    for s in range(0, N, chunk):
        e = min(N, s + chunk)
        pts = jnp.asarray(points[s:e])
        pad = chunk - (e - s)
        if pad:
            pts = jnp.pad(pts, ((0, pad), (0, 0)))
        out = integrate_views(pts, cameras, images, depths, cfg, normals,
                              reference_normals)
        outs.append(jax.tree.map(lambda x: np.asarray(x[: e - s]), out))
    return TSDFOut(
        np.concatenate([o.tsdf for o in outs]),
        np.concatenate([o.colors for o in outs]),
        np.concatenate([o.weights for o in outs]),
    )
