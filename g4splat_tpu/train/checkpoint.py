"""Trainer checkpoint/resume.

Counterpart of the reference's `gaussians.capture()` torch.save /
`restore()` flow (train_with_refine_depth.py:606-608, gaussian_model.py:64-97):
the full training state — GaussianScene buffers, Adam moments, densification
statistics, RNG key, iteration — round-trips through one npz (flattened
pytree with jax.tree_util key paths; no pickle, no framework lock-in).
PLY snapshots at save_iterations are handled by the trainer/orchestrator
(save_gaussian_ply); this is the exact-resume path.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_with_paths(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_trainer_state(path: str, trainer) -> None:
    """Write scene + optimizer + densify state + loop bookkeeping."""
    scene = trainer.scene
    payload = {
        "scene": _flatten_with_paths(
            {k: getattr(scene, k) for k in (
                "xyz", "f_dc", "f_rest", "opacity_raw", "scaling_raw",
                "rotation_raw", "alive", "mip_filter",
            )}
        ),
        "opt": _flatten_with_paths(trainer.opt_state),
        "dstate": _flatten_with_paths(trainer.dstate),
    }
    arrays = {}
    for group, d in payload.items():
        for k, v in d.items():
            arrays[f"{group}|{k}"] = v
    arrays["key"] = np.asarray(trainer.key)
    meta = {
        "iteration": trainer.iteration,
        "active_sh_degree": scene.active_sh_degree,
        "max_sh_degree": scene.max_sh_degree,
        "use_mip_filter": scene.use_mip_filter,
        "capacity": scene.capacity,
    }
    arrays["meta"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_trainer_state(path: str, trainer) -> None:
    """Restore in place (trainer must be built with the same capacity/config)."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(data["meta"]).decode())
    assert meta["capacity"] == trainer.scene.capacity, (
        f"capacity mismatch: ckpt {meta['capacity']} vs {trainer.scene.capacity}"
    )

    groups: Dict[str, Dict[str, np.ndarray]] = {"scene": {}, "opt": {},
                                                "dstate": {}}
    for k in data.files:
        if "|" not in k:
            continue
        g, rest = k.split("|", 1)
        groups[g][rest] = data[k]

    def restore_tree(template, flat):
        leaves_with_paths = jax.tree_util.tree_flatten_with_path(template)
        new_leaves = []
        for path, leaf in leaves_with_paths[0]:
            key = "/".join(str(p) for p in path)
            arr = flat[key]
            new_leaves.append(jnp.asarray(arr).astype(leaf.dtype)
                              if hasattr(leaf, "dtype") else arr)
        return jax.tree_util.tree_unflatten(leaves_with_paths[1], new_leaves)

    scene_fields = restore_tree(
        {k: getattr(trainer.scene, k) for k in (
            "xyz", "f_dc", "f_rest", "opacity_raw", "scaling_raw",
            "rotation_raw", "alive", "mip_filter",
        )},
        groups["scene"],
    )
    trainer.scene = trainer.scene.replace(
        **scene_fields,
        active_sh_degree=meta["active_sh_degree"],
        use_mip_filter=meta["use_mip_filter"],
    )
    trainer.opt_state = restore_tree(trainer.opt_state, groups["opt"])
    trainer.dstate = restore_tree(trainer.dstate, groups["dstate"])
    trainer.key = jnp.asarray(data["key"])
    trainer.iteration = meta["iteration"]
