"""Two-tier config system mirroring the reference (SURVEY §5.6):

(a) YAML files under `configs/` (same tree/filenames as the reference's —
    mast3r/{posed,unposed}, charts_alignment/{default,strong},
    free_gaussians_refinement/{default,long}, adaptive_tetrahedralization,
    multiresolution_tsdf) loaded by `load_config(group, name)`;
(b) dataclass param groups (PipelineConfig / TrainConfig / …) that YAML dicts
    overlay via `apply_overrides` — the counterpart of the reference's
    argparse ParamGroups + cfg_args persistence
    (2d-gaussian-splatting/arguments/__init__.py:19-116), except the persisted
    run config is JSON (`save_run_config`), not an eval()'d Namespace repr.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict

import yaml

CONFIG_ROOT = os.path.join(os.path.dirname(__file__), "..", "..", "configs")


def load_config(group: str, name: str = "default") -> Dict[str, Any]:
    path = os.path.join(CONFIG_ROOT, group, f"{name}.yaml")
    with open(path) as f:
        return yaml.safe_load(f) or {}


def apply_overrides(obj, overrides: Dict[str, Any], strict: bool = False):
    """Return a copy of a dataclass (or flax struct) with YAML overrides
    applied; unknown keys are ignored unless strict."""
    fields = {f.name for f in dataclasses.fields(obj)}
    known = {k: v for k, v in overrides.items() if k in fields}
    unknown = set(overrides) - fields
    if strict and unknown:
        raise KeyError(f"unknown config keys: {sorted(unknown)}")
    return dataclasses.replace(obj, **known)


def save_run_config(output_dir: str, **groups):
    """Persist the resolved run configuration (reference writes `cfg_args`
    into the model dir; we write cfg_args.json)."""
    os.makedirs(output_dir, exist_ok=True)
    payload = {}
    for name, obj in groups.items():
        if dataclasses.is_dataclass(obj):
            payload[name] = dataclasses.asdict(obj)
        else:
            payload[name] = obj
    with open(os.path.join(output_dir, "cfg_args.json"), "w") as f:
        json.dump(payload, f, indent=2, default=str)


def load_run_config(output_dir: str) -> Dict[str, Any]:
    with open(os.path.join(output_dir, "cfg_args.json")) as f:
        return json.load(f)
