"""Public differentiable rendering API.

`render(camera, scene, …)` mirrors the reference wrapper
(2d-gaussian-splatting/gaussian_renderer/__init__.py:19-170): one call returns
the RGB render plus every auxiliary map the trainer's losses consume (alpha,
world/camera normals, expected/median/surface depth, distortion, surface
normals from depth) and densification hooks (screen radii, visibility, and the
screen-space positional gradient via the `center_offset` zeros input).

Backends:
- "dense":  O(P·npix) oracle (tests/small scenes)          rasterize_dense.py
- "tiled":  tile-binned pure-JAX (CPU-friendly, AD)        rasterize_tiled.py
- "pallas": tile-binned Pallas TPU kernels (production)    rasterize_pallas.py
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from g4splat_tpu.core.cameras import Camera
from g4splat_tpu.core.geometry import depth_to_normal
from g4splat_tpu.models.gaussians import GaussianScene
from g4splat_tpu.ops.rasterize_common import RenderConfig, preprocess


def render(
    camera: Camera,
    scene: GaussianScene,
    config: Optional[RenderConfig] = None,
    center_offset: Optional[jnp.ndarray] = None,
    override_color: Optional[jnp.ndarray] = None,
    backend: str = "tiled",
    need_aux: bool = True,
) -> Dict[str, jnp.ndarray]:
    """need_aux=False selects the non-differentiable inference kernel on the
    pallas backend (no distortion / n_contrib — those outputs are zeros);
    other backends ignore it (XLA dead-code-eliminates unused outputs)."""
    config = config or RenderConfig()
    H, W = camera.height, camera.width

    prep = preprocess(
        camera,
        xyz=scene.xyz,
        scaling=scene.scaling(),
        rotation_raw=scene.rotation_raw,
        opacity=scene.opacity(),
        features=scene.features(),
        sh_degree=scene.active_sh_degree,
        colors=override_color,
        config=config,
        center_offset=center_offset,
    )
    bg = jnp.asarray(config.bg, jnp.float32)

    # Depth-rank binning (see RenderConfig): feed the backend a depth-sorted
    # copy; per-splat outputs (radii/visibility for the densifier) stay in
    # the ORIGINAL order via `prep`, and gradients flow back through the
    # permutation gather's VJP.
    prep_b = prep
    rank_mode = False
    if backend in ("tiled", "pallas") and config.depth_rank_binning:
        from g4splat_tpu.ops.rasterize_tiled import (
            depth_rank_bits_fit,
            presort_splats_by_depth,
        )

        if depth_rank_bits_fit(prep.depth.shape[0], W, H):
            prep_b = presort_splats_by_depth(prep)
            rank_mode = True

    if backend == "dense":
        from g4splat_tpu.ops.rasterize_dense import render_dense

        out = render_dense(camera, prep, bg, near=config.near, far=config.far)
        color = out.color.reshape(H, W, 3)
        alpha = out.alpha.reshape(H, W)
        normal_cam = out.normal.reshape(H, W, 3)
        depth_acc = out.depth_acc.reshape(H, W)
        median_depth = out.median_depth.reshape(H, W)
        distortion = out.distortion.reshape(H, W)
        final_T = out.final_T.reshape(H, W)
        n_contrib = out.n_contrib.reshape(H, W)
        m1_tot = out.m1_tot.reshape(H, W)
        m2_tot = out.m2_tot.reshape(H, W)
        n_dropped = jnp.int32(0)   # dense oracle composites every splat
        n_overflow = jnp.int32(0)
    elif backend == "tiled":
        from g4splat_tpu.ops.rasterize_tiled import render_tiled

        buf = (config.buf_size if config.buf_size > 0
               else None if config.buf_factor == 4
               else config.buf_factor * prep.depth.shape[0])
        (color, alpha, normal_cam, depth_acc, median_depth, distortion,
         final_T, n_contrib, m1_tot, m2_tot, n_dropped, n_overflow) = (
            render_tiled(camera, prep_b, bg, near=config.near,
                         far=config.far, tile_k=config.tile_k,
                         buf_size=buf,
                         rows_are_depth_ranks=rank_mode,
                         max_tiles_per_splat=config.max_tiles_per_splat,
                         ellipse_prune=config.tile_ellipse_prune,
                         compact_width=config.binning_compact_width)
        )
    elif backend == "pallas":
        from g4splat_tpu.ops.rasterize_pallas import render_pallas

        buf = (config.buf_size if config.buf_size > 0
               else None if config.buf_factor == 4
               else config.buf_factor * prep.depth.shape[0])
        (color, alpha, normal_cam, depth_acc, median_depth, distortion,
         final_T, n_contrib, m1_tot, m2_tot, n_dropped, n_overflow) = (
            render_pallas(camera, prep_b, bg, near=config.near,
                          far=config.far, need_aux=need_aux,
                          buf_size=buf,
                          rows_are_depth_ranks=rank_mode,
                          max_tiles_per_splat=config.max_tiles_per_splat,
                          ellipse_prune=config.tile_ellipse_prune,
                          compact_width=config.binning_compact_width,
                          want_dist=config.compute_distortion)
        )
    else:
        raise ValueError(f"unknown backend {backend!r}")

    # ---- post-processing identical to the reference wrapper (:117-164) ----
    R_c2w = camera.c2w[:3, :3]
    normal_world = normal_cam @ R_c2w.T

    depth_expected = jnp.nan_to_num(depth_acc / jnp.maximum(alpha, 1e-10))
    depth_median = jnp.nan_to_num(median_depth)
    surf_depth = (
        depth_expected * (1.0 - config.depth_ratio)
        + config.depth_ratio * depth_median
    )
    surf_normal_world = depth_to_normal(camera, surf_depth)
    surf_normal_world = surf_normal_world * jax.lax.stop_gradient(alpha)[..., None]
    surf_normal_cam = surf_normal_world @ R_c2w  # world→cam rotation

    out = {
        "render": color,
        "radii": prep.radius,
        "visibility_filter": prep.radius > 0,
        "rend_alpha": alpha,
        "rend_normal": normal_world,
        "rend_normal_cam": normal_cam,
        "rend_dist": distortion,
        "rend_depth": depth_expected,
        "depth_median": depth_median,
        "surf_depth": surf_depth,
        "surf_normal": surf_normal_world,
        "surf_normal_cam": surf_normal_cam,
        "final_T": final_T,
        "n_contrib": n_contrib,
        # Distortion moment totals Σw·m / Σw·m² — consumed by the depth-slab
        # composition of splat-sharded rendering (parallel/gaussian_shard.py);
        # stop-gradient outputs.
        "dist_m1": m1_tot,
        "dist_m2": m2_tot,
        # Entries lost to static binning caps. n_dropped = total (incl.
        # the per-splat rect-cap truncation, a static semantic cap shared
        # with every round since r3); n_overflow = just the entry-buffer /
        # compaction-block component — 0 in healthy operation, and what
        # the trainer's buffer auto-bump keys on.
        "n_dropped": n_dropped,
        "n_overflow": n_overflow,
    }
    if _DEBUG_DUMP:
        _dump_if_nonfinite(out, camera, scene, backend)
    return out


def mark_visible(camera: Camera, xyz: jnp.ndarray) -> jnp.ndarray:
    """Frustum visibility of 3D points — the rasterizer binding's
    markVisible helper (diff_surfel_rasterization/__init__.py:177-186 →
    rasterizer_impl.cu in_frustum): view-space z ≥ 0.2."""
    p_view = xyz @ camera.w2c[:3, :3].T + camera.w2c[:3, 3]
    return p_view[:, 2] >= 0.2


# Debug dump-on-nonfinite (reference dump-on-error plumbing,
# diff_surfel_rasterization/__init__.py:83-90 snapshot_fw.dump): set
# G4_DEBUG_DUMP=/path/dir to snapshot the rasterizer inputs whenever a render
# output goes non-finite. Costs one host sync per render — debug only. Under
# jit-of-render the check cannot run (traced values); it guards the common
# eager/orchestrator call sites.
import os as _os

_DEBUG_DUMP = _os.environ.get("G4_DEBUG_DUMP", "")


def _dump_if_nonfinite(out, camera, scene, backend):
    import numpy as np

    if isinstance(out["render"], jax.core.Tracer):
        return  # inside jit: values are abstract, nothing to check
    bad = [k for k, v in out.items()
           if v.dtype.kind == "f" and not bool(jnp.isfinite(v).all())]
    if not bad:
        return
    _os.makedirs(_DEBUG_DUMP, exist_ok=True)
    path = _os.path.join(_DEBUG_DUMP, "snapshot_fw.npz")
    np.savez_compressed(
        path,
        bad_outputs=np.array(bad),
        backend=np.array(backend),
        w2c=np.asarray(camera.w2c), fx=np.asarray(camera.fx),
        fy=np.asarray(camera.fy), cx=np.asarray(camera.cx),
        cy=np.asarray(camera.cy),
        xyz=np.asarray(scene.xyz), scaling_raw=np.asarray(scene.scaling_raw),
        rotation_raw=np.asarray(scene.rotation_raw),
        opacity_raw=np.asarray(scene.opacity_raw),
        f_dc=np.asarray(scene.f_dc), alive=np.asarray(scene.alive),
    )
    print(f"[g4splat] non-finite render outputs {bad} — inputs dumped to "
          f"{path}")
