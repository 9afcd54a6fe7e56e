"""Train/test view-split files.

The reference datasets carry a `split-{N}views.json` per scene
(`{"train": [...], "test": [...]}`) consumed by `train.py --use_view_config`
(train view selection) and `eval/eval.py:67-80` (held-out image metrics),
with an older `train_test_split_{N}.json` (`train_ids`/`test_ids`) fallback.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Tuple


def load_view_split(
    source_path: str, n_views: int
) -> Optional[Tuple[List[int], List[int]]]:
    """Return (train_ids, test_ids) from the scene's split file, or None if
    the scene has no split file (reference eval.py:67-80)."""
    path = os.path.join(source_path, f"split-{n_views}views.json")
    if os.path.exists(path):
        with open(path) as f:
            d = json.load(f)
        return sorted(d["train"]), sorted(d["test"])
    path = os.path.join(source_path, f"train_test_split_{n_views}.json")
    if os.path.exists(path):
        with open(path) as f:
            d = json.load(f)
        return sorted(d["train_ids"]), sorted(d["test_ids"])
    return None
