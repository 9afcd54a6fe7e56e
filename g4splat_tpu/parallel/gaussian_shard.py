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
