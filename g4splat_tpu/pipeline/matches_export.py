"""Standalone pairwise-match export.

Counterpart of the reference's matcher tool family (mast3r/compute_matches.py,
run_matching.py, resize_matcher.py, make_pairs.py — SURVEY §2.4 "standalone
matcher tools"): run MASt3R on image pairs and export the reciprocal-NN
correspondences to npz, in the schema the (optional) chart-alignment
reprojection loss consumes (matcha/pointmap/mast3r.py:26-129 loader:
per-pair xy coordinates + confidences + image ids).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def compute_and_export_matches(
    model,                       # MASt3RModel
    images: np.ndarray,          # (V, H, W, 3)
    pairs: Optional[Sequence[Tuple[int, int]]] = None,
    out_path: str = "matches.npz",
    subsample: int = 8,
) -> dict:
    from g4splat_tpu.pipeline.sfm import build_pairs_exhaustive
    from g4splat_tpu.priors.mast3r import extract_correspondences

    V = len(images)
    pairs = list(pairs) if pairs is not None else build_pairs_exhaustive(V)

    xs1, xs2, confs, pair_i, pair_j, offsets = [], [], [], [], [], [0]
    for (i, j) in pairs:
        out11, _, out22, _ = model.symmetric_inference(
            jnp.asarray(images[i : i + 1]), jnp.asarray(images[j : j + 1])
        )
        xy1, xy2, conf = extract_correspondences(
            out11["desc"][0], out22["desc"][0],
            out11["desc_conf"][0], out22["desc_conf"][0],
            subsample=subsample,
        )
        xs1.append(xy1)
        xs2.append(xy2)
        confs.append(conf)
        pair_i.append(i)
        pair_j.append(j)
        offsets.append(offsets[-1] + len(conf))

    data = {
        "xy1": np.concatenate(xs1) if xs1 else np.zeros((0, 2)),
        "xy2": np.concatenate(xs2) if xs2 else np.zeros((0, 2)),
        "conf": np.concatenate(confs) if confs else np.zeros(0),
        "pair_i": np.asarray(pair_i, np.int32),
        "pair_j": np.asarray(pair_j, np.int32),
        "offsets": np.asarray(offsets, np.int32),
    }
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        np.savez(out_path, **data)
    return data


def load_matches(path: str) -> List[dict]:
    """npz → list of per-pair match dicts."""
    d = np.load(path)
    out = []
    for k in range(len(d["pair_i"])):
        s, e = d["offsets"][k], d["offsets"][k + 1]
        out.append({
            "i": int(d["pair_i"][k]),
            "j": int(d["pair_j"][k]),
            "xy1": d["xy1"][s:e],
            "xy2": d["xy2"][s:e],
            "conf": d["conf"][s:e],
        })
    return out
