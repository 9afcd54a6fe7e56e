"""Adaptive density control with static-capacity buffers.

Re-designs the reference's tensor-resizing densification
(scene/gaussian_model.py:586-660) for XLA's static-shape world: the scene is a
fixed-capacity buffer with an `alive` mask, and clone/split/prune are pure
masked scatter ops — no reallocation, no host round-trip, fully jit-able.

Semantics preserved (gaussian_model.py):
- clone  (:614-625): grad ≥ τ AND max scale ≤ percent_dense·extent → copy.
- split  (:586-612): grad ≥ τ AND max scale >  percent_dense·extent →
  2 children sampled N(0, scale) in the tangent plane (z-std 0), rotated,
  scales ÷ 1.6, parent pruned.
- prune  (:627-647): opacity < 0.05, or (after first opacity reset) screen
  radius > max_screen, or world scale > 0.1·extent.
- Grad statistic: accumulated ‖∂L/∂(screen center)‖ per visible splat ÷ count
  (:649-651, add_densification_stats).

New splats land in free (dead) slots; when free slots run out, candidates are
dropped from the back (large-gradient splats first in slot order — overflow is
reported so the trainer can grow capacity on the host at the next interval).
Changed slots are returned so the caller can zero optimizer moments (the
reference resets Adam state for replaced tensors the same way).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from g4splat_tpu.core.transforms import quat_to_rotmat
from g4splat_tpu.models.gaussians import GaussianScene


@struct.dataclass
class DensifyState:
    grad_accum: jnp.ndarray   # (N,) Σ‖screen-grad‖ over visible iters
    denom: jnp.ndarray        # (N,) visible-iteration count
    max_radii2d: jnp.ndarray  # (N,) max screen radius seen

    @staticmethod
    def zero(capacity: int) -> "DensifyState":
        return DensifyState(
            grad_accum=jnp.zeros(capacity),
            denom=jnp.zeros(capacity),
            max_radii2d=jnp.zeros(capacity),
        )


def accumulate_stats(
    state: DensifyState,
    center_offset_grad: jnp.ndarray,  # (N, 2) ∂L/∂(screen center)
    radii: jnp.ndarray,               # (N,)
    visible: jnp.ndarray,             # (N,) bool
) -> DensifyState:
    g = jnp.linalg.norm(center_offset_grad, axis=-1)
    vis = visible.astype(g.dtype)
    return DensifyState(
        grad_accum=state.grad_accum + g * vis,
        denom=state.denom + vis,
        max_radii2d=jnp.maximum(state.max_radii2d, radii * vis),
    )


class DensifyReport(NamedTuple):
    n_cloned: jnp.ndarray
    n_split: jnp.ndarray
    n_pruned: jnp.ndarray
    n_dropped: jnp.ndarray   # candidates lost to capacity exhaustion


def densify_and_prune(
    key: jax.Array,
    scene: GaussianScene,
    state: DensifyState,
    scene_extent: float,
    grad_threshold: float = 2e-4,
    min_opacity: float = 0.05,
    max_screen_size: float = 0.0,   # 0 disables the screen-size prune
    percent_dense: float = 0.01,
) -> Tuple[GaussianScene, DensifyState, jnp.ndarray, DensifyReport]:
    """Returns (scene, fresh stats, changed_slots mask, report)."""
    N = scene.capacity
    alive = scene.alive
    grads = jnp.nan_to_num(state.grad_accum / jnp.maximum(state.denom, 1.0))

    # Mip filter is excluded during densification decisions
    # (gaussian_model.py:628-630: flag temporarily disabled).
    scaling = jnp.exp(scene.scaling_raw)
    max_scale = jnp.max(scaling, axis=-1)
    base_opacity = jax.nn.sigmoid(scene.opacity_raw[:, 0])

    hot = alive & (grads >= grad_threshold)
    clone_mask = hot & (max_scale <= percent_dense * scene_extent)
    split_mask = hot & (max_scale > percent_dense * scene_extent)

    prune_mask = alive & (base_opacity < min_opacity)
    # Non-finite splats are inert in the renderer (preprocess culls them)
    # but `NaN < eps` is False, so the reference rule alone never reclaims
    # their slots — prune them explicitly.
    finite = (jnp.isfinite(scene.xyz).all(axis=-1)
              & jnp.isfinite(scene.scaling_raw).all(axis=-1)
              & jnp.isfinite(scene.opacity_raw[:, 0]))
    prune_mask = prune_mask | (alive & ~finite)
    if max_screen_size:
        prune_mask = prune_mask | (alive & (state.max_radii2d > max_screen_size))
        prune_mask = prune_mask | (alive & (max_scale > 0.1 * scene_extent))

    alive_after = alive & ~prune_mask & ~split_mask

    # ---- Candidate emission: slot i emits [clone_i, childA_i, childB_i]. ----
    # Split children: xyz = parent + R @ (ε ⊙ [s0, s1, 0]), scales /= 1.6.
    eps = jax.random.normal(key, (N, 2, 2))  # (N, child, tangent-axis)
    R = quat_to_rotmat(scene.rotation_raw)   # (N, 3, 3)
    tangent = R[:, :, :2]                    # (N, 3, 2)
    offsets = jnp.einsum("nij,ncj->nci", tangent, eps * scaling[:, None, :])
    child_xyz = scene.xyz[:, None, :] + offsets          # (N, 2, 3)
    child_scaling_raw = scene.scaling_raw - jnp.log(1.6)  # ÷ 0.8·N, N=2

    cand_valid = jnp.stack([clone_mask, split_mask, split_mask], axis=1)  # (N, 3)
    cand_xyz = jnp.stack([scene.xyz, child_xyz[:, 0], child_xyz[:, 1]], axis=1)
    cand_scaling = jnp.stack(
        [scene.scaling_raw, child_scaling_raw, child_scaling_raw], axis=1
    )

    flat_valid = cand_valid.reshape(-1)              # (3N,)
    src = jnp.repeat(jnp.arange(N), 3)               # (3N,) parent slot
    # Rank among valid candidates → target free slot.
    rank = jnp.cumsum(flat_valid) - flat_valid       # exclusive
    free = ~alive_after
    free_rank = jnp.cumsum(free) - free              # exclusive; rank of each free slot
    n_free = jnp.sum(free)
    # free_slot_of_rank[r] = index of the r-th free slot.
    free_slot_of_rank = jnp.zeros(N, jnp.int32).at[
        jnp.where(free, free_rank, N - 1)
    ].set(jnp.arange(N, dtype=jnp.int32), mode="drop")
    take = flat_valid & (rank < n_free)
    target = jnp.where(take, free_slot_of_rank[jnp.clip(rank, 0, N - 1)], N)

    def scatter(dst, src_vals):
        return dst.at[target].set(src_vals, mode="drop")

    new_scene = scene.replace(
        xyz=scatter(scene.xyz, cand_xyz.reshape(3 * N, 3)),
        f_dc=scatter(scene.f_dc, jnp.repeat(scene.f_dc, 3, axis=0)),
        f_rest=scatter(scene.f_rest, jnp.repeat(scene.f_rest, 3, axis=0)),
        opacity_raw=scatter(scene.opacity_raw, jnp.repeat(scene.opacity_raw, 3, axis=0)),
        scaling_raw=scatter(scene.scaling_raw, cand_scaling.reshape(3 * N, 2)),
        rotation_raw=scatter(
            scene.rotation_raw, jnp.repeat(scene.rotation_raw, 3, axis=0)
        ),
        mip_filter=scatter(scene.mip_filter, jnp.repeat(scene.mip_filter, 3, axis=0)),
        alive=alive_after.at[target].set(True, mode="drop"),
    )

    changed = (~alive_after) & new_scene.alive | prune_mask | split_mask
    report = DensifyReport(
        n_cloned=jnp.sum(clone_mask),
        n_split=jnp.sum(split_mask),
        n_pruned=jnp.sum(prune_mask),
        n_dropped=jnp.sum(flat_valid & ~take),
    )
    return new_scene, DensifyState.zero(N), changed, report


def compact_and_grow(scene: GaussianScene, new_capacity: int) -> GaussianScene:
    """Host-side recompaction: pack alive splats to the front and grow the
    buffer. Call between jit'd training segments when capacity runs low
    (capacities should be bucketed to bound recompilation)."""
    import numpy as np

    alive = np.asarray(scene.alive)
    idx = np.flatnonzero(alive)
    n = len(idx)
    assert new_capacity >= n
    out = GaussianScene.empty(new_capacity, scene.max_sh_degree)

    def put(dst, src):
        return dst.at[:n].set(jnp.asarray(np.asarray(src)[idx]))

    return out.replace(
        xyz=put(out.xyz, scene.xyz),
        f_dc=put(out.f_dc, scene.f_dc),
        f_rest=put(out.f_rest, scene.f_rest),
        opacity_raw=put(out.opacity_raw, scene.opacity_raw),
        scaling_raw=put(out.scaling_raw, scene.scaling_raw),
        rotation_raw=put(out.rotation_raw, scene.rotation_raw),
        mip_filter=put(out.mip_filter, scene.mip_filter),
        alive=out.alive.at[:n].set(True),
        max_sh_degree=scene.max_sh_degree,
        active_sh_degree=scene.active_sh_degree,
        use_mip_filter=scene.use_mip_filter,
    )
