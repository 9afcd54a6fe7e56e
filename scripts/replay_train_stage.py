"""Replay ONE train_gaussians stage from a saved budget-run artifact store.

The r05 19-stage budget run measured train r3 at 2455.8 s for 600 iters —
5.9× the r2 rate (419.3 s) at the same 2M capacity and splat-footprint
stats. This probe re-enters the orchestrator from the on-disk artifacts
(resume_from_artifacts: cameras from COLMAP + the cumulative See3D archive,
refined depths / normals / confidences from plane-refine-depths/) and
re-runs exactly that stage with per-chunk wall-clock, capacity, and
entry-buffer instrumentation, so the overage decomposes into
init / compile / capacity-growth / steady-state-iteration parts.

Usage:
  cp -al /tmp/budget_run_r05 /tmp/replay_r3   # hardlink copy (writes PLYs)
  python scripts/replay_train_stage.py --out /tmp/replay_r3 --json logs/replay_train_r3_r05.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/replay_r3")
    ap.add_argument("--train_iters", type=int, default=600)
    ap.add_argument("--chunk", type=int, default=50)
    ap.add_argument("--json", default="logs/replay_train_r3_r05.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from g4splat_tpu.pipeline.orchestrator import (
        G4SplatPipeline, PipelineConfig, Priors,
    )
    import g4splat_tpu.train.trainer as trainer_mod

    cfg = PipelineConfig(
        source_path="synthetic-budget",
        output_path=args.out,
        train_iterations=args.train_iters,
        select_inpaint_num=4,
        n_see3d_stages=3,
        render_backend="pallas",
        work_size=512,
    )
    pipe = G4SplatPipeline(cfg, Priors())
    t0 = time.perf_counter()
    done = pipe.resume_from_artifacts()
    print(f"[replay] resume: {time.perf_counter()-t0:.1f}s done={done} "
          f"V={len(pipe.state.images)}", flush=True)

    chunks = []
    events = []

    orig_grow = trainer_mod.Trainer._grow_capacity

    def loud_grow(self, new_capacity):
        t = time.perf_counter()
        orig_grow(self, new_capacity)
        events.append({"t": round(time.perf_counter() - t0, 1),
                       "event": "grow_capacity",
                       "new_capacity": int(new_capacity),
                       "grow_s": round(time.perf_counter() - t, 1)})
        print(f"[replay] grow_capacity -> {new_capacity} "
              f"({events[-1]['grow_s']}s host-side)", flush=True)

    def timed_train(self, num_iters=None, log_every=0):
        num_iters = num_iters or self.cfg.iterations
        print(f"[replay] trainer ready at t={time.perf_counter()-t0:.1f}s "
              f"cap={self.scene.capacity} buf={self.cfg.raster_buf_size} "
              f"alive={int(self.scene.num_alive)}", flush=True)
        last = time.perf_counter()
        for i in range(num_iters):
            self.step(sync_metrics=False)
            if (i + 1) % args.chunk == 0:
                jax.block_until_ready(self.scene.xyz)
                now = time.perf_counter()
                chunks.append({
                    "iter": i + 1,
                    "chunk_s": round(now - last, 2),
                    "capacity": int(self.scene.capacity),
                    "buf": int(self.cfg.raster_buf_size),
                })
                print(f"[replay] iter {i+1:4d}: {now-last:6.1f}s  "
                      f"cap={self.scene.capacity} "
                      f"buf={self.cfg.raster_buf_size}", flush=True)
                last = now
        return []

    trainer_mod.Trainer._grow_capacity = loud_grow
    trainer_mod.Trainer.train = timed_train

    t1 = time.perf_counter()
    pipe.train_gaussians()
    total = time.perf_counter() - t1
    iter_s = sum(c["chunk_s"] for c in chunks)
    print(f"[replay] stage total {total:.1f}s = init/compile "
          f"{total-iter_s:.1f}s + iters {iter_s:.1f}s", flush=True)
    os.makedirs(os.path.dirname(args.json), exist_ok=True)
    with open(args.json, "w") as f:
        json.dump({
            "stage_total_s": round(total, 1),
            "iters_s": round(iter_s, 1),
            "init_compile_s": round(total - iter_s, 1),
            "chunks": chunks,
            "events": events,
        }, f, indent=1)
    print(f"[replay] wrote {args.json}", flush=True)


if __name__ == "__main__":
    main()
