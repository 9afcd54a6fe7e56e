"""Tracing / profiling / metrics utilities.

The reference has only wall-clock prints and CUDA events (SURVEY §5.1);
here profiling is first-class:

- `trace(logdir)`      — jax.profiler context producing a Perfetto/XProf
                         trace of device + host activity.
- `annotate(name)`     — TraceAnnotation for host-side stage labeling.
- `StageTimer`         — accumulating wall-clock registry (the pipeline's
                         per-stage timings feed it).
- `MetricsLogger`      — scalars to TensorBoard when available, always to an
                         in-memory history + JSONL file (replaces the
                         reference's tqdm EMA + TensorBoard-if-importable
                         logging, train_with_refine_depth.py:49-53,667-725).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in XProf/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Host-side named region visible in traces."""
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": self.totals[k], "count": self.counts[k],
                "mean_ms": 1000 * self.totals[k] / max(self.counts[k], 1)}
            for k in self.totals
        }

    def report(self) -> str:
        lines = []
        for k, v in sorted(self.summary().items(),
                           key=lambda kv: -kv[1]["total_s"]):
            lines.append(
                f"{k:32s} {v['total_s']:8.2f}s  ×{v['count']:<6d} "
                f"{v['mean_ms']:8.1f}ms/it"
            )
        return "\n".join(lines)


class MetricsLogger:
    def __init__(self, logdir: Optional[str] = None,
                 use_tensorboard: bool = True):
        self.history: List[dict] = []
        self._jsonl = None
        self._tb = None
        if logdir:
            os.makedirs(logdir, exist_ok=True)
            self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
            if use_tensorboard:
                try:
                    from torch.utils.tensorboard import SummaryWriter  # noqa

                    self._tb = SummaryWriter(logdir)
                except Exception:
                    self._tb = None

    def log(self, step: int, metrics: Dict[str, float]):
        rec = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        self.history.append(rec)
        if self._jsonl:
            self._jsonl.write(json.dumps(rec) + "\n")
            self._jsonl.flush()
        if self._tb:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), step)

    def close(self):
        if self._jsonl:
            self._jsonl.close()
        if self._tb:
            self._tb.close()
