"""Generate BUDGET.md's measured tables from the budget-run JSONs.

Inputs (all produced by other scripts, committed under logs/):
  logs/budget_r04_cold.json  first run, cold XLA/Mosaic cache (partial ok)
  logs/budget_r04.json       rerun with the persistent compile cache warm —
                             stages present in both runs separate compile
                             (cold-warm) from steady-state compute (warm)
  logs/budget_probes_r04.json  optional: measured per-iteration slopes from
                             scripts/probe_scaling.py {"sfm_s_per_iter": ...,
                             "charts_s_per_iter": ..., "train_ms_per_iter": ...}
  logs/ab_dp_r04.json        DP equal-work A/B (quality parity evidence)

Emits markdown to stdout; BUDGET.md embeds the output verbatim.  Every
extrapolation rule is printed next to the number it produces.

Reference schedule being extrapolated to (BASELINE.md):
  SfM 1000+1000 iters, charts 1000 iters, GS 7000 iters x 4 rounds,
  DDIM 50 steps x 3 stages, <=20 selected views/stage (we model the
  measured per-view MVD cost linearly in views and steps).
"""

import json
import os
import sys

TAG = os.environ.get("BUDGET_TAG", "r05")

REF = {
    "sfm_iters": 2000,        # 1000 coarse + 1000 refine
    "charts_iters": 1000,
    "train_iters": 7000,      # per round, 4 rounds
    "ddim_steps": 50,
}


def load(path, default=None):
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return default


def stage_map(run):
    if not run:
        return {}
    return {s["name"].split(" (")[0]: s for s in run.get("stages", [])
            if s.get("ok")}


def main():
    def load_tagged(stem, default=None):
        return load(f"logs/{stem}_{TAG}.json",
                    load(f"logs/{stem}_r04.json", default))

    warm = load_tagged("budget")
    cold = load_tagged("budget_cold") or load("logs/budget_r04_cold.json")
    probes = load_tagged("budget_probes", {})
    ab = load_tagged("ab_dp", {})
    step_prof = load_tagged("profile_budget_step", {})
    # Stage replay (scripts/replay_train_stage.py): per-chunk wall clock for
    # the LAST training round re-entered from the budget run's artifacts.
    # Separates the one-time init/compile cost from the steady-state rate —
    # the r3 scene (See3D-merged points) runs ~3x the entries/splat of the
    # earlier rounds, so its own measured slope replaces the whole-stage
    # linear scaling that would otherwise extrapolate its compile too.
    replay = load(f"logs/replay_train_r3_{TAG}.json")
    replay_slope = replay_fixed = None
    if replay and len(replay.get("chunks", [])) >= 3:
        ch = replay["chunks"][1:]            # first chunk carries compile
        iters_per = replay["chunks"][1]["iter"] - replay["chunks"][0]["iter"]
        replay_slope = (sum(c["chunk_s"] for c in ch)
                        / (len(ch) * iters_per))
        replay_fixed = replay["init_compile_s"]
    if warm is None:
        sys.exit(f"logs/budget_{TAG}.json missing — run scripts/run_budget.py")
    args = warm["args"]
    V = args["views"]
    wm, cm = stage_map(warm), stage_map(cold)

    sfm_iters = 400 if args.get("sfm_config") == "budget" else 2000
    charts_iters = 300 if args.get("align_config") == "fast" else 1000
    train_iters = args["train_iters"]
    ddim_steps = args["ddim_steps"]

    # --- per-stage extrapolation rules -----------------------------------
    # (stage-name prefix, iteration scale factor to the reference schedule,
    #  v5e-8 divisor, rule text). Divisors are conservative: view fan-out
    #  stages divide by min(V, 8) — only as many shards as views; coupled
    #  global optimizations and the joint-frame MVD denoise divide by 1.
    fan = min(V, 8)
    rules = [
        ("sfm", REF["sfm_iters"] / sfm_iters, 1,
         f"x{REF['sfm_iters'] / sfm_iters:g} iters ({sfm_iters}->"
         f"{REF['sfm_iters']}); global optimization, no fan-out"),
        ("init DA2", 1, 1, "param init, once"),
        ("align_charts", REF["charts_iters"] / charts_iters, 1,
         f"x{REF['charts_iters'] / charts_iters:g} iters ({charts_iters}->"
         f"{REF['charts_iters']}); global optimization, no fan-out"),
        ("render_chart_views", 1, fan,
         f"/{fan} view fan-out (view_parallel_render)"),
        ("init SAM", 1, 1, "param init, once"),
        ("excavate_planes", 1, fan, f"/{fan} SAM mesh-sharded encode"),
        ("refine_plane_depths", 1, fan, f"/{fan} per-view RANSAC renders"),
        ("train_gaussians", REF["train_iters"] / train_iters, None,
         f"x{REF['train_iters'] / train_iters:g} iters ({train_iters}->"
         f"{REF['train_iters']}); v5e-8 = slab-sharded step (model below)"),
        ("init See3D", 1, 1, "param init, once"),
        ("see3d_stage", None, 1,
         "MVD: measured per-call s, x(50/%d) DDIM steps; denoise sharded "
         "over the CFG pair + frame groups (priors/see3d.py axis_name "
         "path, parity-tested)" % ddim_steps),
        ("render_all", 1, fan, f"/{fan} view fan-out"),
        ("extract_mesh", 1, fan, f"/{fan} TSDF view renders"),
        ("evaluate", 1, fan, f"/{fan} per-view renders+metrics"),
    ]

    def rule_for(name):
        for prefix, f, d, txt in rules:
            if name.startswith(prefix):
                return f, d, txt
        return 1, 1, "no scaling"

    # v5e-8 training: the SLAB-SHARDED step (quality-preserving; the DP
    # quality-parity arm failed — ab_dp dp8_lr 16.2 vs 27.3 dB single, so
    # large-batch/few-step DP is ruled out, see logs/ab_dp_r05.json and the
    # orchestrator default). Model: every splat-linear component (preprocess,
    # binning sort, entry pack, both kernels, gradient reduction, preprocess
    # AD chain) divides by 8; the replicated remainder is the image-space
    # loss math (LM) + optimizer (full_step - losses_fwd+bwd); comm = one
    # (8, H, W, 13) maps all_gather + the final cotangent scatter psum over
    # ICI (~8 ms modeled at 45 GB/s/link). Exactness of the sharded step:
    # tests/test_parallel.py::TestSlabShardedTraining.
    dp_speedup = None
    dp_quality_ok = ("single" in ab and "dp8_lr" in ab
                     and ab["dp8_lr"]["psnr"] >= ab["single"]["psnr"] - 1.0)
    cap = probes.get("capacity")
    step_ms = probes.get("train_ms_per_iter") or step_prof.get(
        "full_train_step")
    slab_model_txt = ""
    if step_ms:
        LM = 15.0      # image-space loss math fwd+bwd (est from probes)
        ADAM = max(step_prof.get("full_train_step", step_ms)
                   - step_prof.get("losses_fwd+bwd", step_ms - 9.0), 5.0)
        COMM = 8.0     # maps all_gather + grad psum over ICI, modeled
        t8 = (step_ms - LM - ADAM) / 8.0 + LM + ADAM + COMM
        dp_speedup = step_ms / t8
        slab_model_txt = (
            f"slab-8 step = ({step_ms:.0f} − {LM:.0f} − {ADAM:.0f})/8 + "
            f"{LM:.0f} + {ADAM:.0f} + {COMM:.0f} = {t8:.0f} ms "
            f"(x{dp_speedup:.2f})")

    print("### Measured stages (cold vs warm cache) and extrapolation\n")
    print("| Stage | cold s | warm s | ref-schedule 1-chip s | v5e-8 s |"
          " rule |")
    print("|---|---|---|---|---|---|")
    tot_1chip = tot_8 = 0.0
    mvd_total_8 = 0.0
    for s in warm["stages"]:
        name = s["name"].split(" (")[0]
        if not s.get("ok"):
            print(f"| {s['name']} | — | FAILED: {s['note'][:60]} | | | |")
            continue
        w = s["seconds"]
        c = cm.get(name, {}).get("seconds")
        f, d, txt = rule_for(name)
        # Per-iteration probes override whole-stage linear scaling where
        # available (subtracting the fixed non-iterating part).
        if name == "sfm" and probes.get("sfm_phase1_s_per_iter"):
            p1 = probes["sfm_phase1_s_per_iter"]
            p2 = probes["sfm_phase2_s_per_iter"]
            i1, i2 = probes.get("sfm_iters", [sfm_iters // 2, sfm_iters // 2])
            fixed = max(w - p1 * i1 - p2 * i2, 0.0)
            ref_s = fixed + (p1 + p2) * (REF["sfm_iters"] // 2)
            txt = (f"fixed {fixed:.0f}s + ({p1:.3f}+{p2:.3f}) s/iter x "
                   f"{REF['sfm_iters'] // 2} (probe)")
        elif name == "align_charts" and probes.get("charts_s_per_iter"):
            per = probes["charts_s_per_iter"]
            fixed = max(w - per * charts_iters, 0.0)
            ref_s = fixed + per * REF["charts_iters"]
            txt = (f"fixed {fixed:.0f}s + {per:.3f} s/iter x "
                   f"{REF['charts_iters']} (probe)")
        elif name.startswith("train_gaussians") and (
                replay_slope is not None and "r3" in s["name"]):
            # The stage's own replayed steady-state rate: the r3 scene
            # (See3D-merged init) costs ~3x/iter vs the earlier rounds, and
            # the measured stage wall carries a fresh step compile that
            # must not be multiplied by the iteration scale.
            ref_s = replay_fixed + replay_slope * REF["train_iters"]
            txt = (f"replay: fixed {replay_fixed:.0f}s + "
                   f"{replay_slope * 1e3:.0f} ms/iter x "
                   f"{REF['train_iters']} (logs/replay_train_r3_{TAG}.json;"
                   f" stage wall includes a one-time step compile)")
        elif name.startswith("train_gaussians") and probes.get("train_ms_per_iter"):
            per = probes["train_ms_per_iter"] / 1e3
            fixed = max(w - per * train_iters, 0.0)
            ref_s = fixed + per * REF["train_iters"]
            txt = (f"fixed {fixed:.0f}s + {per * 1e3:.1f} ms/iter x "
                   f"{REF['train_iters']} (probe)")
        elif name.startswith("see3d_stage"):
            # per-stage MVD calls are instrumented separately; the non-MVD
            # remainder (warps, VAE, selection renders) doesn't scale with
            # DDIM steps.
            ref_s = None
        elif f is not None:
            ref_s = w * f
        if name.startswith("see3d_stage"):
            print(f"| {s['name']} | {c if c is not None else '—'} | {w} |"
                  f" see MVD table | | {txt} |")
            tot_1chip += w  # non-MVD remainder counted at measured cost
            tot_8 += w / (d or 1)
            continue
        if d is None:
            d8 = ref_s / dp_speedup if dp_speedup else ref_s
            if dp_speedup:
                dtxt = f"slab-sharded x{dp_speedup:.2f} ({slab_model_txt})"
            else:
                dtxt = "no slab model (step probe missing)"
            txt += f"; {dtxt}"
        else:
            d8 = ref_s / d
        tot_1chip += ref_s
        tot_8 += d8
        print(f"| {s['name']} | {c if c is not None else '—'} | {w} |"
              f" {ref_s:.0f} | {d8:.0f} | {txt} |")

    # ----- MVD calls ------------------------------------------------------
    calls = warm.get("mvd_calls", [])
    if calls:
        print("\n### MVD (See3D UNet) DDIM extrapolation\n")
        print("| call | frames | measured s @%d steps | s @50 steps |"
              % ddim_steps)
        print("|---|---|---|---|")
        # With >=2 same-shape calls, the cheapest per-step rate is the
        # steady state and the first call's excess is a ONE-TIME UNet/VAE
        # compile — extrapolating it x(50/5) would charge the compile ten
        # times. One-shape guard: only applied when all calls share the
        # frame count.
        steady = None
        if (len(calls) >= 2
                and len({c["frames"] for c in calls}) == 1):
            steady = min(c["seconds"] / c["ddim_steps"] for c in calls)
        extra = 0.0
        for i, cll in enumerate(calls):
            if steady is not None:
                once = cll["seconds"] - steady * cll["ddim_steps"]
                s50 = once + steady * REF["ddim_steps"]
            else:
                s50 = cll["seconds"] * REF["ddim_steps"] / cll["ddim_steps"]
            extra += s50 - cll["seconds"]
            print(f"| {i} | {cll['frames']} | {cll['seconds']} | {s50:.0f} |")
        if steady is not None:
            print(f"\n(steady per-step rate {steady:.2f} s — the min over "
                  "same-shape calls; each call's excess over it is counted "
                  "once, not x(50/%d))" % ddim_steps)
        # v5e-8 MVD: the denoise shards the 2F cond/uncond frames over the
        # data axis (joint attention all_gathers tokens; parity-tested to
        # 2e-5 — tests/test_see3d.py::TestShardedDenoise). Divisor =
        # (2F)/ceil(2F/8) x 0.85 attention-gather efficiency.
        import math as _math

        def mvd_div(frames):
            tf = 2 * frames
            return max(1.0, tf / _math.ceil(tf / 8) * 0.85)

        div = mvd_div(calls[0]["frames"]) if calls else 1.0
        print(f"\nAdditional MVD seconds at 50 steps: +{extra:.0f}s 1-chip; "
              f"v5e-8 /{div:.2f} (sharded denoise) = +{extra / div:.0f}s")
        tot_1chip += extra
        tot_8 += extra / div

    print(f"\n**Totals**: reference schedule on 1 v5e chip ~= "
          f"{tot_1chip:.0f}s ({tot_1chip / 60:.1f} min); on v5e-8 ~= "
          f"{tot_8:.0f}s ({tot_8 / 60:.1f} min) vs the 30-min target.")

    if step_ms:
        print(f"\n### v5e-8 training model\n\n{slab_model_txt}; the slab "
              "step preserves single-device quality exactly (per-view "
              "depth-slab splat sharding + exact composition; "
              "tests/test_parallel.py::TestSlabShardedTraining), unlike DP:")
    if ab:
        print(f"\n### DP quality A/B (logs/ab_dp_{TAG}.json) — why v5e-8 "
              "does NOT use data-parallel training\n")
        for k in ("single", "dp8", "dp8_lr"):
            if k in ab:
                print(f"- {k}: {ab[k]}")
        if not dp_quality_ok:
            print("\nEqual-view-visit DP loses >1 dB even with sqrt-batch "
                  "LR scaling -> the orchestrator keeps DP off by default "
                  "and multi-chip training uses the slab-sharded step.")


if __name__ == "__main__":
    main()
