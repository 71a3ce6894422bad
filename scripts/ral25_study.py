#!/usr/bin/env python
"""The FULL ral25 robust-balancing study, end-to-end (VERDICT r2 item 4).

Reproduces the reference's headline robust experiment
(upright_robust/scripts/planning_sim_loop.py:410-655 + process_sim_runs.py)
on the mobile manipulator: a 1 kg, 15x15xH cm box with an uncertain CoM
(+-6 cm laterally, +-H/2 vertically) balanced at mu = 0.2 while the base
drives ~2 m to each of the three paper waypoints.  For each planning
variant of the reference's --com flag —

  center / top / bottom : nominal plan with the CoM pinned at the box
                          centroid / +z / -z extreme
  robust                : one OCP over the 8 CoM-vertex scenarios

— each waypoint's offline plan is tracked under the 15-CoM x 3-inertia grid
of true parameters (per-CoM worst-case inertias from
synthesis.max_min_eig_inertia), i.e. 135 runs per variant, with each
45-run-per-waypoint sweep executed as ONE vmapped rollout of the JAX plant.

Writes docs/ral25_results.json and regenerates the table in
docs/ral25_results.md.

Usage: python scripts/ral25_study.py [--height 20] [--variants robust,center]
"""

from __future__ import annotations

import argparse
import copy
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import upright_tpu.config as cfg
from upright_tpu.robust.planning import ral25_protocol

# the three goal displacements from the paper (planning_sim_loop.py:447)
WAYPOINTS = [[-2.0, 1.0, 0.0], [2.0, 0.0, -0.25], [0.0, -2.0, 0.25]]
MU = 0.2
COM_XY = 0.06  # lateral CoM-box half extent (planning_sim_loop.py:453)


def build_study_config(height_m: float) -> dict:
    path = cfg.resolve_package_path(
        {"package": "configs", "path": "demos/thing_demo.yaml"}
    )
    config = cfg.load_config(path)

    box = {
        "mass": 1.0,
        "shape": "cuboid",
        "com_offset": [0.0, 0.0, 0.0],
        "side_lengths": [0.15, 0.15, height_m],
    }
    arrangement = {
        "objects": [{"name": "box", "type": "ral25_box", "parent": "ee"}],
        "contacts": [
            {
                "first": "ee",
                "second": "box",
                "mu": MU,
                "support_area_inset": 0.0,
            }
        ],
    }
    for section in ("controller", "simulation"):
        config[section].setdefault("objects", {})["ral25_box"] = copy.deepcopy(box)
        config[section].setdefault("arrangements", {})["ral25"] = copy.deepcopy(
            arrangement
        )
    config["controller"]["balancing"]["arrangement"] = "ral25"
    config["simulation"]["arrangement"] = "ral25"
    config["controller"]["waypoints"] = [
        {"time": 0, "position": wp, "orientation": [0, 0, 0, 1]}
        for wp in WAYPOINTS
    ]
    return config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=20, help="box height (cm)")
    ap.add_argument("--variants", default="center,top,bottom,robust")
    ap.add_argument("--duration", type=float, default=10.0)
    ap.add_argument("--iterations", type=int, default=60)
    ap.add_argument("--kp", type=float, default=10.0)
    ap.add_argument(
        "--out", default=None,
        help="output JSON (default docs/ral25_results_h<height>.json)",
    )
    ap.add_argument(
        "--verify", action="store_true",
        help="post-hoc worst-case CWC certification of every offline plan "
             "over the inertial ambiguity set (the reference's "
             "process_sim_runs.py step); writes the verification table "
             "next to the results JSON",
    )
    ap.add_argument(
        "--verify-realizable", action="store_true",
        help="also verify over the density-REALIZABLE (moment-relaxation) "
             "parameter set (slower)",
    )
    args = ap.parse_args()

    def _git_hash():
        import subprocess

        try:
            return subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                cwd=Path(__file__).resolve().parents[1],
                capture_output=True, text=True, timeout=10,
            ).stdout.strip() or "unknown"
        except Exception:
            return "unknown"

    h = args.height / 100.0
    com_box = [[COM_XY, COM_XY, h / 2]]
    study = {
        "protocol": "ral25",
        "height_cm": args.height,
        "mu": MU,
        "com_half_extents": com_box[0],
        "waypoints": WAYPOINTS,
        "grid": "15 CoM x 3 inertia scales (worst-case inertias)",
        "failure_threshold_m": 0.5,
        "variants": {},
    }
    for variant in args.variants.split(","):
        config = build_study_config(h)
        t0 = time.time()
        out = ral25_protocol(
            config,
            com_half_extents=com_box,
            duration=args.duration,
            iterations=args.iterations,
            kp=args.kp,
            com_variant=variant,
            verify=args.verify,
            verify_realizable=args.verify_realizable,
        )
        out["wall_s"] = round(time.time() - t0, 1)
        study["variants"][variant] = out
        print(
            f"{variant}: {out['failures']}/{out['runs']} failures "
            f"({out['wall_s']}s)",
            flush=True,
        )

    # provenance stamp (VERDICT r4 item 10): a stale artifact — generated by
    # an older script/plant revision than the committed tree — is detectable
    # from the JSON itself
    study["_provenance"] = {
        "script": "scripts/ral25_study.py",
        "git_hash": _git_hash(),
        "matmul_precision": "float64 (planning) / plant default",
        "friction_model": "per-config default",
        "verify": bool(args.verify),
        "verify_realizable": bool(args.verify_realizable),
        "generated_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(args.out, "w") as f:
        json.dump(study, f, indent=2)
    print(f"saved {args.out}")

    # markdown table
    md = Path(args.out).with_suffix(".md")
    lines = [
        "# ral25 robust-balancing study (recorded results)",
        "",
        f"Generated by `scripts/ral25_study.py --height {args.height}` — the",
        "reference's planning_sim_loop.py protocol on the upright_tpu stack:",
        f"1 kg 15x15x{args.height} cm box, CoM box +-{COM_XY*100:.0f} cm lateral /",
        f"+-{args.height/2:.0f} cm vertical, mu = {MU}, three ~2 m waypoints,",
        "15 CoM x 3 inertia-scale true-parameter grid per waypoint (135 runs",
        "per variant; failure = object displacement > 0.5 m).",
        "",
        "| planner CoM variant | failures / runs | max displacement (m) |",
        "|---|---|---|",
    ]
    for variant, out in study["variants"].items():
        max_disp = max(w["max_displacement_m"] for w in out["waypoints"])
        lines.append(
            f"| {variant} | {out['failures']} / {out['runs']} | {max_disp:.3f} |"
        )
    prov = study["_provenance"]
    lines += [
        "",
        f"Per-waypoint detail lives in `{Path(args.out).name}`.",
        f"Generated at git `{prov['git_hash']}`, {prov['generated_utc']}.",
        "",
    ]
    md.write_text("\n".join(lines))
    print(f"saved {md}")

    if args.verify:
        # the reference's process_sim_runs.py deliverable: per-variant
        # worst-case CWC certification of the PLANNED trajectories over the
        # inertial ambiguity set, next to the closed-loop failure counts
        vmd = Path(args.out).parent / f"ral25_verification_h{args.height}.md"
        vlines = [
            "# ral25 post-hoc worst-case verification (recorded)",
            "",
            f"Generated by `scripts/ral25_study.py --height {args.height} "
            + "--verify"
            + (" --verify-realizable" if args.verify_realizable else "")
            + "`:",
            "every offline plan's states certified against the full CoM-box",
            "x inertia-scale ambiguity set via the exact vertex form of the",
            "contact-wrench-cone faces (robust/verification.py — the",
            "reference's process_sim_runs.py:87-270 MOSEK step in closed",
            "form"
            + (", plus the density-realizable moment relaxation"
               if args.verify_realizable else "")
            + ").  Positive violation = some feasible parameters break",
            "balance at a planned state; sim failures = displacement > 0.5 m",
            "over the 135-run true-parameter grid.",
            "",
            "| variant | waypoint | worst-case CWC violation | states in violation | sim failures |",
            "|---|---|---|---|---|",
        ]
        for variant, out in study["variants"].items():
            for w in out["waypoints"]:
                v = w.get("verification", {})
                extra = ""
                if "worst_case_cwc_violation_realizable" in v:
                    extra = (
                        f" (realizable {v['worst_case_cwc_violation_realizable']:.3f})"
                    )
                vlines.append(
                    f"| {variant} | {w['waypoint']} | "
                    f"{v.get('worst_case_cwc_violation', float('nan')):.3f}{extra} | "
                    f"{v.get('violation_steps', '?')} / {v.get('n_states', '?')} | "
                    f"{w['failures']} / {w['runs']} |"
                )
        vlines.append("")
        vmd.write_text("\n".join(vlines))
        print(f"saved {vmd}")


if __name__ == "__main__":
    main()
