"""Quality-gate calibration run (RESULTS.md's data source).

Runs g4splat_tpu.eval.synthetic.quality_run at the exact config of
tests/test_quality.py::TestQualityGate and prints/records the measured
held-out PSNR/SSIM and Chamfer-L1 so the committed thresholds are grounded
in a real run rather than guessed.  Defaults to the test's CPU config;
``--chip`` runs the larger on-chip variant (512px, pallas backend).
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chip", action="store_true",
                    help="on-chip variant: 512px, pallas backend")
    ap.add_argument("--json", default="logs/quality_r04.json")
    args = ap.parse_args()

    import jax

    if not args.chip:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from g4splat_tpu.eval.synthetic import quality_run

    out = tempfile.mkdtemp(prefix="quality_run_")
    if args.chip:
        res = quality_run(out, res=512, n_views=8, eval_split=(2, 5),
                          train_iters=2000, backend="pallas",
                          tsdf_resolution=192, points_per_m2=9000)
        tag = "chip_512px_pallas_2000it"
    else:
        # EXACT test config (tests/test_quality.py::TestQualityGate).
        res = quality_run(out, res=128, n_views=8, eval_split=(2, 5),
                          train_iters=400, backend="tiled",
                          tsdf_resolution=96, points_per_m2=1200)
        tag = "cpu_128px_tiled_400it"

    payload = {}
    if os.path.exists(args.json):
        with open(args.json) as f:
            payload = json.load(f)
    payload[tag] = res
    os.makedirs(os.path.dirname(args.json), exist_ok=True)
    with open(args.json, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({tag: res}, indent=1), flush=True)


if __name__ == "__main__":
    main()
