"""Gaussian-buffer sharding: render scenes larger than one chip's HBM.

The reference caps scenes at 10M splats on one GPU
(train_with_refine_depth.py:147); here the splat buffer itself can shard
over the mesh's `model` axis — the "long context" axis of this workload
(SURVEY §5.7). Each device holds a depth-slab of the scene (equal-count
quantile partition along the camera ray), composites it locally with the
ordinary single-device rasterizer, and the slabs are combined EXACTLY with
per-pixel algebra:

- Every accumulated map is a Σ w_i·x_i form, and a slab's global weights are
  its local weights scaled by the product of the nearer slabs' final
  transmittances P_d = Π_{e<d} T_e: color/normal/depth/moment maps compose
  as Σ_d P_d·X_d, alpha as 1 − Π_d T_d.
- The 2DGS depth distortion is the pairwise form Σ_{i<j} w_i w_j (m_i−m_j)²
  (the reference's running-moment accumulation is algebraically identical,
  forward.cu:392-400), so it splits into within-slab terms P_d²·dist_d plus
  cross-slab terms P_d P_e (W_d M2_e + W_e M2_d − 2 M1_d M1_e) built from
  each slab's exposed moment totals (render()'s dist_m1 / dist_m2).
- Median depth (last entry with incoming T > 0.5) is taken from the slab
  where the global transmittance crosses 0.5. Exact whenever the crossing
  slab is entered with T ≈ 1 (always true for slab 0, the overwhelmingly
  common case); within-slab threshold skew is the documented approximation.

The partition is by per-splat VIEW depth, so slabs occupy disjoint depth
intervals along every ray and front-to-back slab order is globally correct.

Communication: one all_gather of (H, W, 14) per device over the `model`
axis; compute scales linearly in slabs.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from g4splat_tpu.models.gaussians import GaussianScene

# Channel layout of the per-slab map stack fed to compose_slabs.
_CH = ("r", "g", "b", "nx", "ny", "nz", "depth_acc", "alpha", "dist",
       "median", "final_T", "m1", "m2")


def partition_by_view_depth(
    scene: GaussianScene, camera, n_slabs: int
) -> List[GaussianScene]:
    """Host-side equal-count quantile partition of the alive splats by view
    depth. Every slab gets the same static capacity (⌈alive/n⌉ rounded up to
    a multiple of 8), so the sharded render compiles once per (scene size,
    n_slabs)."""
    alive = np.asarray(scene.alive)
    idx = np.flatnonzero(alive)
    xyz = np.asarray(scene.xyz)[idx]
    w2c = np.asarray(camera.w2c)
    z = xyz @ w2c[2, :3] + w2c[2, 3]
    order = idx[np.argsort(z)]
    cap = max(8, int(-(-len(order) // n_slabs) + 7) // 8 * 8)
    slabs = []
    for d in range(n_slabs):
        sel = order[d * len(order) // n_slabs:
                    (d + 1) * len(order) // n_slabs]
        slab = GaussianScene.empty(cap, scene.max_sh_degree)
        n = len(sel)

        def put(dst, src):
            return dst.at[:n].set(jnp.asarray(np.asarray(src)[sel]))

        slabs.append(slab.replace(
            xyz=put(slab.xyz, scene.xyz),
            f_dc=put(slab.f_dc, scene.f_dc),
            f_rest=put(slab.f_rest, scene.f_rest),
            opacity_raw=put(slab.opacity_raw, scene.opacity_raw),
            scaling_raw=put(slab.scaling_raw, scene.scaling_raw),
            rotation_raw=put(slab.rotation_raw, scene.rotation_raw),
            mip_filter=put(slab.mip_filter, scene.mip_filter),
            alive=slab.alive.at[:n].set(True),
            active_sh_degree=scene.active_sh_degree,
            use_mip_filter=scene.use_mip_filter,
        ))
    return slabs


def slab_maps_from_render(out) -> jnp.ndarray:
    """Stack the compose inputs from a render() dict (bg MUST be zero)."""
    depth_acc = out["rend_depth"] * out["rend_alpha"]
    return jnp.stack([
        out["render"][..., 0], out["render"][..., 1], out["render"][..., 2],
        out["rend_normal"][..., 0], out["rend_normal"][..., 1],
        out["rend_normal"][..., 2],
        depth_acc, out["rend_alpha"], out["rend_dist"], out["depth_median"],
        out["final_T"], out["dist_m1"], out["dist_m2"],
    ], axis=-1)                                     # (H, W, 13)


def compose_slabs(maps: jnp.ndarray, bg: jnp.ndarray):
    """(n_slabs, H, W, 13) front-to-back slab maps → final render dict."""
    n = maps.shape[0]
    T_d = maps[..., 10]                              # (n, H, W)
    P_d = jnp.concatenate(
        [jnp.ones_like(T_d[:1]), jnp.cumprod(T_d, axis=0)[:-1]], axis=0)

    def lin(c):
        return jnp.sum(P_d[..., None] * maps[..., c:c + 1], axis=0)[..., 0]

    color = jnp.stack([lin(0), lin(1), lin(2)], axis=-1)
    normal = jnp.stack([lin(3), lin(4), lin(5)], axis=-1)
    depth_acc = lin(6)
    T_fin = jnp.prod(T_d, axis=0)
    alpha = 1.0 - T_fin

    # Pairwise distortion: within-slab (P² scaled) + cross-slab moments.
    W_d = maps[..., 7]
    dist_d = maps[..., 8]
    M1_d = P_d * maps[..., 11]
    M2_d = P_d * maps[..., 12]
    Wg = P_d * W_d
    dist = jnp.sum(P_d * P_d * dist_d, axis=0)
    # Σ_{d<e} Wg_d M2_e + Wg_e M2_d − 2 M1_d M1_e via prefix sums over d.
    cumW = jnp.cumsum(Wg, axis=0) - Wg               # Σ_{d<e} at index e
    cumM1 = jnp.cumsum(M1_d, axis=0) - M1_d
    cumM2 = jnp.cumsum(M2_d, axis=0) - M2_d
    dist = dist + jnp.sum(
        cumW * M2_d + Wg * cumM2 - 2.0 * cumM1 * M1_d, axis=0)

    # Median: the slab whose span contains the global T=0.5 crossing; if T
    # never crosses 0.5, the single-device semantics pick the LAST
    # contributor (its incoming T is still > 0.5), i.e. the last slab with
    # any weight.
    T_after = jnp.cumprod(T_d, axis=0)               # T entering slab d+1
    crossing = (P_d > 0.5) & (T_after <= 0.5)
    has_cross = jnp.any(crossing, axis=0)
    first = jnp.argmax(crossing, axis=0)
    contrib_d = W_d > 0
    any_contrib = jnp.any(contrib_d, axis=0)
    last_c = (n - 1) - jnp.argmax(contrib_d[::-1], axis=0)
    pick = jnp.where(has_cross, first, last_c)
    median = jnp.where(
        has_cross | any_contrib,
        jnp.take_along_axis(maps[..., 9], pick[None], axis=0)[0],
        0.0,
    )

    depth_expected = jnp.nan_to_num(depth_acc / jnp.maximum(alpha, 1e-10))
    return {
        "render": color + T_fin[..., None] * jnp.asarray(bg)[None, None, :3],
        "rend_alpha": alpha,
        "rend_normal": normal,
        "rend_depth": depth_expected,
        "rend_dist": dist,
        "depth_median": median,
        "final_T": T_fin,
    }


def view_depth_permutations(scene: GaussianScene, cameras) -> jnp.ndarray:
    """(V, P) per-view depth permutations for slab-sharded training.

    perm[v] sorts splat ids front-to-back in view v's camera frame (dead
    buffer slots last), so equal slices of perm[v] are depth-disjoint
    slabs along every ray of view v — the exactness precondition of
    compose_slabs. Recomputed at densify/growth boundaries (splats move
    slowly between them; the ORDER is what matters, and the global binning
    sort inside each slab re-sorts exactly anyway, so a stale partition
    only loses exactness at slab boundaries — refreshed before that
    matters in practice and verified by the parity test)."""
    xyz = scene.xyz
    alive = scene.alive

    def one(w2c):
        z = xyz @ w2c[2, :3] + w2c[2, 3]
        key = jnp.where(alive, z, jnp.inf)
        return jnp.argsort(key).astype(jnp.int32)

    return jax.vmap(one)(cameras.w2c)


def outputs_from_slab_maps(camera, maps: jnp.ndarray, depth_ratio: float):
    """compose_slabs + the render() post-processing tail
    (ops/rasterize.py:122-156) — produces the output dict
    losses_from_render consumes. Fully differentiable."""
    from g4splat_tpu.core.geometry import depth_to_normal

    out = compose_slabs(maps, jnp.zeros(3))
    R_c2w = camera.c2w[:3, :3]
    # compose_slabs emits WORLD normals (slab renders return rend_normal in
    # world space); the camera-space variant is derived, as in render().
    normal_world = out["rend_normal"]
    depth_expected = out["rend_depth"]
    depth_median = jnp.nan_to_num(out["depth_median"])
    surf_depth = (depth_expected * (1.0 - depth_ratio)
                  + depth_ratio * depth_median)
    surf_normal_world = depth_to_normal(camera, surf_depth)
    surf_normal_world = surf_normal_world * jax.lax.stop_gradient(
        out["rend_alpha"])[..., None]
    return {
        "render": out["render"],
        "rend_alpha": out["rend_alpha"],
        "rend_normal": normal_world,
        "rend_normal_cam": normal_world @ R_c2w,
        "rend_dist": out["rend_dist"],
        "rend_depth": jnp.nan_to_num(depth_expected),
        "depth_median": depth_median,
        "surf_depth": surf_depth,
        "surf_normal": surf_normal_world,
        "surf_normal_cam": surf_normal_world @ R_c2w,
        "final_T": out["final_T"],
    }


def make_slab_sharded_train_step(mesh: Mesh, cfg, optimizer):
    """EXACT splat-sharded 2DGS training step over the mesh's `model` axis.

    The multi-chip training answer that *preserves* single-device quality:
    the measured data-parallel A/B (logs/ab_dp_r05.json) shows large-batch
    few-step DP losing ~11 dB, so instead each step keeps the reference's
    one-view-per-iteration semantics (train_with_refine_depth.py:362-632)
    and shards the SPLAT BUFFER: device d renders depth-slab d of the
    current view (per-view permutation from view_depth_permutations), one
    (n, H, W, 13) all_gather combines the slabs exactly (compose_slabs),
    and the loss/optimizer runs replicated. Gradients flow back through
    the all_gather (psum_scatter transpose) and the slab gather (local
    scatter + cross-device psum of the replicated-param cotangent), so
    per-splat gradients, densify statistics, and Adam state match the
    single-device step on ≥98% of parameters bit-tight; the only inexact
    channel is median depth (resolved against the crossing slab's LOCAL
    transmittance — module docstring), which can route the surf_depth
    gradient to a neighboring entry on crossing pixels. Contract verified
    by tests/test_parallel.py::TestSlabShardedTraining.

    Everything splat-linear (preprocess, binning sort, entry pack, both
    rasterizer kernels, the entry→splat scatter) scales 1/n; the
    replicated remainder is the image-space loss math + optimizer.
    """
    from g4splat_tpu.ops.rasterize import render
    from g4splat_tpu.ops.rasterize_common import RenderConfig
    from g4splat_tpu.train.densify import DensifyState, accumulate_stats
    from g4splat_tpu.train.trainer import (
        losses_from_render,
        scene_params,
        with_params,
    )
    import optax

    n = mesh.shape["model"]

    def step(scene, opt_state, dstate, camera, view, iteration, key, perm,
             inv_perm):
        params = scene_params(scene)
        N = scene.capacity
        rcfg = RenderConfig(
            bg=jnp.zeros(3), depth_ratio=cfg.depth_ratio,
            compute_distortion=cfg.lambda_dist != 0.0,
            buf_factor=cfg.raster_buf_factor,
            buf_size=(cfg.raster_buf_size + n - 1) // n if cfg.raster_buf_size
            else 0,
            max_tiles_per_splat=cfg.raster_max_tiles_per_splat,
            binning_compact_width=cfg.raster_compact_width,
        )
        def loss_fn(params, offset):
            s = with_params(scene, params)

            @partial(
                jax.shard_map, mesh=mesh,
                in_specs=(P(), P(), P("model"), P()),
                out_specs=(P(), P("model"), P(), P()),
                check_vma=False,
            )
            def render_slabs(s_rep, offset_rep, perm_shard, cam):
                # `cam` rides the operand list (NOT closure capture): a
                # replicated camera's leaves carry an Auto-mesh
                # NamedSharding that zeros_like would try to preserve
                # inside this Manual context.
                idx = perm_shard                      # (N/n,) this slab
                slab = jax.tree.map(
                    lambda x: x[idx]
                    if (getattr(x, "ndim", 0) >= 1 and x.shape[0] == N)
                    else x,
                    s_rep,
                )
                out = render(cam, slab, config=rcfg,
                             center_offset=offset_rep[idx],
                             backend=cfg.backend)
                maps = slab_maps_from_render(out)[None]      # (1, H, W, 13)
                gathered = jax.lax.all_gather(maps, "model", axis=0,
                                              tiled=True)   # (n, H, W, 13)
                radii = jax.lax.stop_gradient(out["radii"])[None]
                ndrop = jax.lax.psum(out["n_dropped"], "model")
                novf = jax.lax.psum(out["n_overflow"], "model")
                return gathered, radii, ndrop, novf

            maps, radii_sorted, ndrop, novf = render_slabs(
                s, offset, perm, camera)
            out = outputs_from_slab_maps(camera, maps, cfg.depth_ratio)
            radii = radii_sorted.reshape(N)[inv_perm]        # back to id order
            out["radii"] = radii
            out["visibility_filter"] = radii > 0
            out["n_dropped"] = ndrop
            out["n_overflow"] = novf
            return losses_from_render(s, out, view, cfg, iteration, key)

        offset = jnp.zeros((N, 2))
        (loss, aux), (gparams, goffset) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, offset)

        updates, opt_state = optimizer.update(gparams, opt_state, params)
        params = optax.apply_updates(params, updates)
        scene = with_params(scene, params)

        densify_window = (iteration >= cfg.densify_from_iter) & (
            iteration < cfg.densify_until_iter
        )
        dstate = jax.lax.cond(
            densify_window,
            lambda d: accumulate_stats(d, goffset, aux["radii"],
                                       aux["visibility"]),
            lambda d: d,
            dstate,
        )
        metrics = {
            "loss": loss,
            "l1": aux["l1"],
            "psnr": aux["psnr"],
            "n_alive": scene.num_alive,
            "n_dropped": aux["n_dropped"],
        }
        return scene, opt_state, dstate, metrics

    return jax.jit(step, donate_argnums=(0, 1, 2))


def render_gaussian_sharded(
    mesh: Mesh,
    slab_scenes: Sequence[GaussianScene],
    camera,
    backend: str = "pallas",
    bg=None,
):
    """Render a splat-sharded scene: slab d on device d of the `model` axis,
    one all_gather of the per-slab maps, replicated composition."""
    from g4splat_tpu.ops.rasterize import render
    from g4splat_tpu.ops.rasterize_common import RenderConfig

    n = len(slab_scenes)
    if mesh.shape["model"] != n:
        raise ValueError(
            f"{n} slabs need a model axis of size {n}, "
            f"mesh has {mesh.shape['model']}")
    bg = jnp.zeros(3) if bg is None else jnp.asarray(bg)
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs), *slab_scenes)
    sharded = jax.tree.map(
        lambda x: jax.device_put(
            x, jax.sharding.NamedSharding(mesh, P("model"))),
        stacked,
    )

    @jax.jit
    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("model"),), out_specs=P(),
        # The tiled all_gather makes the output identical on every `model`
        # device, but the varying-manifest analysis can't infer that.
        check_vma=False,
    )
    def go(slabs):
        slab = jax.tree.map(lambda x: x[0], slabs)
        out = render(camera, slab, config=RenderConfig(bg=jnp.zeros(3)),
                     backend=backend)
        local = slab_maps_from_render(out)[None]     # (1, H, W, 13)
        return jax.lax.all_gather(
            local, "model", axis=0, tiled=True)      # (n, H, W, 13)

    maps = go(sharded)
    return compose_slabs(maps, bg)
