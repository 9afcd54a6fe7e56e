"""Shared machinery for all surfel-rasterizer backends.

Math follows the 2DGS surfel formulation exactly as implemented by the
reference CUDA rasterizer (diff-surfel-rasterization/cuda_rasterizer/
forward.cu), re-derived for a column-vector convention:

- A surfel is a 2D Gaussian on a tangent plane: world point of local (u, v) is
  ``c + u·s1·r1 + v·s2·r2``; stacking into a 4x3 ``splat2world`` matrix S and
  composing with the 3x4 world→homogeneous-pixel matrix M gives the 3x3
  ``T = M @ S`` mapping (u, v, 1) → (x·w, y·w, w)  (forward.cu:75-115).
- Ray-splat intersection solves two homogeneous plane equations
  (k = x·Tw − Tu, l = y·Tv − Tv, s = cross(k,l))  (forward.cu:352-366).
- Screen-space AABB/center from the dual conic           (forward.cu:119-147).
- Object-space falloff is min'd with a 2D screen-space low-pass filter of
  inverse variance 2 (σ² = 0.5 px)                        (auxiliary.h:39).
- Alpha compositing front-to-back with 0.99 alpha clamp, 1/255 alpha cutoff
  and 1e-4 transmittance early-out                        (forward.cu:377-389).
- Auxiliary channels: expected depth, alpha, view-space normal, median depth
  (last splat with incoming T > 0.5), per-pixel depth distortion
  (forward.cu:392-409).

All backends consume the same `Preprocessed` struct so they agree bit-for-bit
on everything but the compositing loop itself.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from g4splat_tpu.core import sh as sh_lib
from g4splat_tpu.core.cameras import Camera
from g4splat_tpu.core.transforms import normalize, quat_to_rotmat

# Reference constants (auxiliary.h:18,37-39; config.h:15-17)
TILE = 16
NEAR_N = 0.2
FAR_N = 100.0
FILTER_INV_SQUARE = 2.0
ALPHA_EPS = 1.0 / 255.0
T_EPS = 1e-4
ALPHA_CLAMP = 0.99
CUTOFF = 3.0  # Gaussian support cutoff in σ


@struct.dataclass
class RenderConfig:
    bg: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros(3))
    scale_modifier: float = struct.field(pytree_node=False, default=1.0)
    depth_ratio: float = struct.field(pytree_node=False, default=0.0)
    near: float = struct.field(pytree_node=False, default=NEAR_N)
    far: float = struct.field(pytree_node=False, default=FAR_N)
    # Tiled-backend static depth cap (front-most kept). The pallas kernel
    # has no such cap; raise this when using `tiled` as a parity oracle on
    # scenes whose densest tile exceeds it.
    tile_k: int = struct.field(pytree_node=False, default=1024)
    # Depth-rank binning: presort splats front-to-back once (row index ==
    # depth rank) so the 16×-duplicated binning sort goes key-only with the
    # gauss id packed in the key's low bits — half the sorted data and EXACT
    # depth order (vs 19-bit quantized). Auto-falls back to the quantized
    # pair sort when tile_bits + ceil_log2(P) > 31 or on the dense backend.
    depth_rank_binning: bool = struct.field(pytree_node=False, default=False)
    # Per-splat candidate-tile cap for binning (the sorted key count is
    # P × cap). 16 covers any splat the radius-rect culling admits; scenes
    # whose splats all fit in ≤8 tiles can halve the binning sort with
    # cap=8 — EXACT iff the binning's n_dropped stays 0 (bench.py checks
    # this before self-selecting the variant).
    max_tiles_per_splat: int = struct.field(pytree_node=False, default=16)
    # Exact ellipse-level tile pruning in binning (see
    # rasterize_tiled._ellipse_keep): drop candidate tiles where no pixel
    # can reach alpha ≥ 1/255. Output-identical on every backend; False
    # keeps the raw CUDA-style rect duplication (ablation).
    tile_ellipse_prune: bool = struct.field(pytree_node=False, default=True)
    # Sorted-entry buffer = buf_factor × P (rasterize_tiled.BUF_FACTOR). The
    # pack gather, the backward kernel's per-entry gradient buffer, and the
    # entry→splat scatter all scale with it; overflow degrades gracefully
    # (farthest entries of the highest tiles drop, counted in n_dropped).
    # With ellipse pruning the mean entries/splat drops ~24%, so smaller
    # factors fit more scenes — measure with scripts/sweep_train.py.
    buf_factor: int = struct.field(pytree_node=False, default=4)
    # Absolute sorted-entry buffer size; overrides buf_factor when > 0.
    # The trainer auto-tunes this from a measured real-entry count
    # (Trainer._autotune_buf): at high-splat/low-res shapes the factor-4
    # default is ~6x oversized, and the pack gather + backward scatter both
    # scale with it.
    buf_size: int = struct.field(pytree_node=False, default=0)
    # Compute the 2DGS depth-distortion channel (rend_dist + its moment
    # bookkeeping). The reference's production default is lambda_dist = 0.0
    # (2d-gaussian-splatting/arguments/__init__.py:86), so the trainer turns
    # this off statically when the loss weight is zero: the pallas kernels
    # then skip the distortion-moment prefix/suffix scans (~1/3 of forward
    # matmul work, 3 of 4 backward suffix-scan rows) and rend_dist/dist_m1/
    # dist_m2 come back as zeros with zero gradient — numerically identical
    # to multiplying the full channel by λ=0.
    compute_distortion: bool = struct.field(pytree_node=False, default=True)
    # Row-compacted binning (rasterize_tiled._compact_candidates): per-splat
    # candidate rows are lane-sorted so the global (tile, depth) sort runs on
    # P·width + overflow keys instead of P·cap — ~2× fewer at width = cap/2,
    # and the sort is the binning's dominant cost. Output-identical while the
    # static overflow block holds every splat with more than `width` real
    # candidate tiles (excess counted in n_dropped). 0 disables.
    binning_compact_width: int = struct.field(pytree_node=False, default=8)


@struct.dataclass
class Preprocessed:
    """Per-splat screen-space quantities (all shape (P, …))."""
    T: jnp.ndarray           # (P, 3, 3) rows = Tu, Tv, Tw
    center: jnp.ndarray      # (P, 2) low-pass filter center, pixels
    radius: jnp.ndarray      # (P,) screen radius, pixels
    depth: jnp.ndarray       # (P,) view-space z of the splat center
    normal: jnp.ndarray      # (P, 3) view-space normal (camera-facing)
    opacity: jnp.ndarray     # (P,)
    rgb: jnp.ndarray         # (P, 3)
    valid: jnp.ndarray       # (P,) bool — frustum & extent culling


def preprocess(
    camera: Camera,
    xyz: jnp.ndarray,
    scaling: jnp.ndarray,
    rotation_raw: jnp.ndarray,
    opacity: jnp.ndarray,
    features: Optional[jnp.ndarray] = None,
    sh_degree: int = 0,
    colors: Optional[jnp.ndarray] = None,
    config: RenderConfig = None,
    center_offset: Optional[jnp.ndarray] = None,
) -> Preprocessed:
    """Vectorized splat preprocess (reference preprocessCUDA, forward.cu:151-253).

    `center_offset` is a (P, 2) zeros tensor whose gradient is the screen-space
    positional gradient used for densification (the reference's `means2D`
    dummy, gaussian_renderer/__init__.py:27-31).
    """
    config = config or RenderConfig()
    P = xyz.shape[0]

    # View-space position / frustum cull (auxiliary.h in_frustum: z >= 0.2).
    R_w2c = camera.w2c[:3, :3]
    t_w2c = camera.w2c[:3, 3]
    p_view = xyz @ R_w2c.T + t_w2c
    in_front = p_view[:, 2] >= 0.2

    # splat2world (4, 3): columns [s1·r1, 0], [s2·r2, 0], [c, 1].
    R = quat_to_rotmat(rotation_raw)  # (P, 3, 3)
    s = scaling * config.scale_modifier
    ax_u = R[..., :, 0] * s[:, 0:1]
    ax_v = R[..., :, 1] * s[:, 1:2]
    zeros = jnp.zeros((P, 1))
    ones = jnp.ones((P, 1))
    S = jnp.stack(
        [
            jnp.concatenate([ax_u, zeros], axis=1),
            jnp.concatenate([ax_v, zeros], axis=1),
            jnp.concatenate([xyz, ones], axis=1),
        ],
        axis=-1,
    )  # (P, 4, 3)
    M = camera.world2pix  # (3, 4)
    T = jnp.einsum("ij,pjk->pki", M, S)  # (P, 3, 3): row r of T[p] = (M @ S)ᵀ…

    # Careful: we want rows Tu, Tv, Tw where Tu maps (u,v,1) → x·w.
    # (M @ S[p]) is (3, 3) with *rows* x,y,w and *columns* u,v,1; the per-pixel
    # equations use Tu = x-row. einsum above produced its transpose; fix:
    T = jnp.swapaxes(T, -1, -2)  # (P, 3, 3) rows = Tu, Tv, Tw

    # View-space normal with camera-facing flip (DUAL_VISIABLE, forward.cu:211-216).
    normal_view = R[..., :, 2] @ R_w2c.T
    cos = -jnp.sum(p_view * normal_view, axis=-1)
    normal_view = normal_view * jnp.where(cos > 0, 1.0, -1.0)[:, None]

    # Screen AABB via the dual conic (compute_aabb, forward.cu:119-147).
    Tu, Tv, Tw = T[:, 0], T[:, 1], T[:, 2]
    tmp = jnp.array([CUTOFF * CUTOFF, CUTOFF * CUTOFF, -1.0])
    dist = jnp.sum(Tw * Tw * tmp, axis=-1)
    ok = jnp.abs(dist) > 1e-12
    f = tmp[None, :] / jnp.where(ok, dist, 1.0)[:, None]
    center = jnp.stack(
        [jnp.sum(f * Tu * Tw, axis=-1), jnp.sum(f * Tv * Tw, axis=-1)], axis=-1
    )
    if center_offset is not None:
        center = center + center_offset
    half_sq = center * center - jnp.stack(
        [jnp.sum(f * Tu * Tu, axis=-1), jnp.sum(f * Tv * Tv, axis=-1)], axis=-1
    )
    extent = jnp.sqrt(jnp.maximum(1e-4, half_sq))
    radius = jnp.ceil(jnp.max(extent, axis=-1))

    # Tile rect emptiness (getRect, auxiliary.h).
    gx = (camera.width + TILE - 1) // TILE
    gy = (camera.height + TILE - 1) // TILE
    rmin_x = jnp.clip(((center[:, 0] - radius) / TILE).astype(jnp.int32), 0, gx)
    rmin_y = jnp.clip(((center[:, 1] - radius) / TILE).astype(jnp.int32), 0, gy)
    rmax_x = jnp.clip(
        ((center[:, 0] + radius + TILE - 1) / TILE).astype(jnp.int32), 0, gx
    )
    rmax_y = jnp.clip(
        ((center[:, 1] + radius + TILE - 1) / TILE).astype(jnp.int32), 0, gy
    )
    nonempty = ((rmax_x - rmin_x) * (rmax_y - rmin_y)) > 0

    if colors is None:
        dirs = normalize(xyz - camera.center)
        colors = sh_lib.sh_to_rgb(sh_degree, features, dirs)

    # Cull zero-opacity splats (dead buffer slots and fully-transparent
    # splats): alpha = opa·exp(≤0) < 1/255 can never contribute
    # (forward.cu:381-383), and their near-singular transforms would otherwise
    # poison gradients with inf·0 NaNs and bloat tile binning.
    valid = in_front & ok & nonempty & (opacity.reshape(-1) >= ALPHA_EPS)
    center = jnp.where(valid[:, None], center, 0.0)
    return Preprocessed(
        T=T,
        center=center,
        radius=jnp.where(valid, radius, 0.0),
        depth=p_view[:, 2],
        normal=normal_view,
        opacity=opacity.reshape(-1),
        rgb=colors,
        valid=valid,
    )


def splat_alpha_depth(prep: Preprocessed, px: jnp.ndarray, py: jnp.ndarray,
                      near: float = NEAR_N):
    """Per-(splat, pixel) alpha and intersection depth (forward.cu:352-389).

    px, py broadcast against the splat axis: shapes (P, ...) outputs.
    """
    T = prep.T
    Tu = T[:, 0][:, None, :]  # (P, 1, 3)
    Tv = T[:, 1][:, None, :]
    Tw = T[:, 2][:, None, :]
    pix = jnp.stack([px, py], axis=-1)  # (..., 2)
    x = px[None, ..., None]  # (1, ..., 1)
    y = py[None, ..., None]
    # Broadcast to (P, ..., 3)
    k = x * Tw - Tu
    l = y * Tw - Tv
    p = jnp.cross(k, l)
    pz = p[..., 2]
    safe_pz = jnp.where(jnp.abs(pz) < 1e-20, 1.0, pz)
    # Clamp the intersection coordinates: grazing/degenerate splats give huge
    # |s|, whose square overflows f32 and turns gradients into inf·0 = NaN.
    # The clip's backward is an exact zero mask, and exp(-0.5·ρ) is already 0
    # far below the clamp, so results are unchanged.
    su = jnp.clip(p[..., 0] / safe_pz, -3e4, 3e4)
    sv = jnp.clip(p[..., 1] / safe_pz, -3e4, 3e4)
    rho3d = su * su + sv * sv
    d = prep.center[:, None, :] - pix[None]
    rho2d = FILTER_INV_SQUARE * jnp.sum(d * d, axis=-1)
    use3d = rho3d <= rho2d
    rho = jnp.minimum(rho3d, rho2d)
    depth = jnp.where(
        use3d,
        su * Tw[..., 0] + sv * Tw[..., 1] + Tw[..., 2],
        Tw[..., 2],
    )
    alpha = jnp.minimum(ALPHA_CLAMP, prep.opacity[:, None] * jnp.exp(-0.5 * rho))
    live = (
        (jnp.abs(pz) >= 1e-20)
        & (depth >= near)
        & (alpha >= ALPHA_EPS)
        & prep.valid[:, None]
    )
    alpha = jnp.where(live, alpha, 0.0)
    return alpha, depth
