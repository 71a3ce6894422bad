#!/usr/bin/env python
"""Aligned-ablation differential under hardware-scale disturbances
(VERDICT r4 item 5).

The reference's RA-L'23 freespace ablation (upright_cmd/config/ral23/
experiments/freespace/{aligned,full}/, arXiv 2305.17484) shows the
inertial-alignment heuristic DROPPING the stacked foam dice where the full
balancing controller holds them.  In a noise-free sim both hold: alignment
drives the required friction to ~zero, and the hardware-scale effects that
break it (velocity measurement noise -> tray vibration, tracking error)
are absent by default.

This study ramps one of the plant's noise knobs (reference
sim/robot.py:123-167) on the dice leaf for both controllers:
  --knob process      perturbs the EXECUTED velocity command (tracking
                      error / actuation vibration) while both controllers
                      keep clean state beliefs — the default, because it
                      isolates the margin question: aligned plans at ZERO
                      friction margin, full plans inside the cone;
  --knob measurement  perturbs the controller's state belief as well
                      (the noisy velocity also feeds the command
                      double-integration).
The recorded table shows the disturbance level at which aligned loses the
stacked dice while full holds them — restoring the reference's
experimental differential in-sim.  Writes docs/aligned_differential.{json,md}.

Usage: python scripts/aligned_differential_study.py [--levels ...] [--seeds N]
"""

from __future__ import annotations

import argparse
import copy
import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

import upright_tpu.config as cfg
from mpc_sim import run_closed_loop


def run_leaf(variant, v_std, seed, duration=4.0, ctrl_rate=100.0,
             knob="process"):
    config = copy.deepcopy(
        cfg.load_config(f"configs/ral23/freespace/{variant}_dice_point1.yaml")
    )
    robot = config["simulation"].setdefault("robot", {})
    noise = robot.setdefault("noise", {})
    if knob == "measurement":
        noise["measurement"] = {"q_std_dev": 0.0, "v_std_dev": float(v_std)}
    elif knob == "process":
        noise["process"] = {"v_std_dev": float(v_std)}
    else:
        raise ValueError(knob)
    sim, state, ctrl, _ = run_closed_loop(
        config, duration=duration, ctrl_rate=ctrl_rate,
        seed=None if v_std == 0.0 else seed,
    )
    disp = np.asarray(sim.object_displacements(state))
    worst = float(disp.max())
    return worst if np.isfinite(worst) else float("inf")


def _git_hash():
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=Path(__file__).resolve().parents[1],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="0.0,0.002,0.005,0.01")
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--variants", default="full,aligned")
    ap.add_argument("--duration", type=float, default=4.0)
    ap.add_argument(
        "--knob", default="process", choices=["process", "measurement"],
        help="which noise knob to ramp: 'process' perturbs the EXECUTED "
        "velocity command (tracking error / vibration — the hardware "
        "effect the aligned heuristic has no friction margin against); "
        "'measurement' perturbs the controller's state belief as well",
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    out = Path(args.out or Path(__file__).resolve().parents[1]
               / "docs" / "aligned_differential.json")
    levels = [float(s) for s in args.levels.split(",")]
    variants = args.variants.split(",")

    rows = []
    for v_std in levels:
        seeds = [0] if v_std == 0.0 else list(range(args.seeds))
        for variant in variants:
            disps = []
            for seed in seeds:
                t0 = time.time()
                worst = run_leaf(variant, v_std, seed, duration=args.duration, knob=args.knob)
                print(
                    f"  {variant:8s} v_std={v_std:5.3f} seed={seed}: "
                    f"max disp {worst:.4f} m ({time.time()-t0:.0f}s)",
                    flush=True,
                )
                disps.append(worst)
            rows.append(
                {
                    "variant": variant,
                    "v_std_rad_s": v_std,
                    "seeds": len(seeds),
                    "max_disp_m": max(disps),
                    "median_disp_m": float(np.median(disps)),
                    "all_disp_m": [round(d, 4) for d in disps],
                }
            )

    results = {
        "rows": rows,
        "_provenance": {
            "script": "scripts/aligned_differential_study.py",
            "noise_knob": args.knob,
            "dtype": "float32 (production precision; under f64 both controllers hold through 0.008 rad/s — scoped r5)",
            "matmul_precision": "n/a (CPU run; dtype governs)",
            "git_hash": _git_hash(),
            "duration_s": args.duration,
            "ctrl_rate_hz": 100.0,
            "friction_model": "per-leaf default",
            "generated_utc": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
            ),
        },
    }
    out.write_text(json.dumps(results, indent=2))
    print(f"saved {out}")

    md = out.with_suffix(".md")
    prov = results["_provenance"]
    lines = [
        "# Aligned-ablation differential under disturbance (recorded study)",
        "",
        "Generated by `scripts/aligned_differential_study.py` — the RA-L'23",
        "freespace dice ablation (aligned vs full) rerun closed-loop with",
        f"increasing joint-velocity noise (knob: **{args.knob}** — "
        + ("perturbs the executed velocity command / tracking error while "
           "both controllers keep clean state beliefs"
           if args.knob == "process" else
           "perturbs the measured state, feeding both the controller "
           "belief and the command double-integration")
        + " — the hardware-scale effect absent from the noise-free sim).",
        "max/median over seeds of the worst balanced-object displacement",
        f"after {args.duration:.0f} s; `inf` = plant divergence latch",
        "(object left the tray and tumbled).",
        f"Generated at git `{prov['git_hash']}`, {prov['generated_utc']}.",
        "",
        "| v noise (rad/s) | variant | median disp (m) | max disp (m) |",
        "|---|---|---|---|",
    ]
    for r in rows:
        med = r["median_disp_m"]
        mx = r["max_disp_m"]
        lines.append(
            f"| {r['v_std_rad_s']:.3f} | {r['variant']} "
            f"| {f'{med:.4f}' if np.isfinite(med) else 'inf'} "
            f"| {f'{mx:.4f}' if np.isfinite(mx) else 'inf'} |"
        )
    lines.append("")
    md.write_text("\n".join(lines))
    print(f"saved {md}")


if __name__ == "__main__":
    main()
