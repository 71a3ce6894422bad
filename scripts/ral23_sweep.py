#!/usr/bin/env python
"""Run a ral23 experiment family end-to-end and record the results table
(VERDICT r2 item 4b): closed-loop MPC over every leaf of
configs/ral23/<family>/, with each experiment group's three waypoints
executed as ONE vmapped on-device closed loop (runtime/device_loop.py —
replan + policy + plant in a single lax.scan, batched over targets).

Reference parity: the reference runs these one at a time through
upright_cmd/scripts/mpc_sim.py per leaf (upright_cmd/config/ral23/**);
here a family is a handful of compiles + vmapped batches.

Metrics per run: final EE error to the commanded waypoint, max balanced-
object displacement in the tray frame (failure if > 7 cm — half the tray),
and the max balance-constraint violation the solver reported along the way.

Writes docs/ral23_results.json + docs/ral23_results.md.
Usage: python scripts/ral23_sweep.py [--families static_obstacles,freespace]
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import os

import jax
import jax.numpy as jnp

# persistent compiled-executable cache (same as bench.py): regeneration
# and resumed sweeps skip the multi-minute per-group compiles
_cache = os.environ.get("BENCH_CACHE_DIR", ".jax_cache")
if _cache:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import upright_tpu.config as cfg
from upright_tpu.ocp.problem import build_problem
from upright_tpu.ocp.reference import TargetTrajectory
from upright_tpu.runtime.device_loop import build_device_loop
from upright_tpu.sim.simulation import UprightSimulation
from upright_tpu.solver.al import ALConfig

FAIL_DISP_M = 0.07  # half the tray half-extent: the object is gone


def discover_groups(family_dir: Path):
    """Group leaves by experiment stem: ``<variant>_<arr>_point{k}`` leaves
    form one vmapped group; other leaves (arm_only, sudden-obstacle times)
    are single-run groups."""
    leaves = sorted(
        p for p in glob.glob(str(family_dir / "*.yaml"))
        if not Path(p).name.startswith("_")
    )
    groups = collections.defaultdict(list)
    for p in leaves:
        m = re.match(r"(.+)_point(\d+)$", Path(p).stem)
        key = m.group(1) if m else Path(p).stem
        groups[key].append(p)
    return dict(groups)


def run_group(name, paths, ctrl_rate=100.0, friction_model=None):
    config = cfg.load_config(paths[0])
    if friction_model:
        config["simulation"]["friction_model"] = friction_model
    prob = build_problem(config)
    sim = UprightSimulation(config["simulation"])
    # ControllerManager's exact replan ALConfig via the single source of
    # truth (MPCSettings.al_config) — in particular dual_reset_violation,
    # which bounds multiplier windup on infeasible runs (the unreachable
    # arm_only waypoints blow up without it)
    from upright_tpu.solver.mpc import MPCSettings

    settings = MPCSettings.from_config(config["controller"])
    sqp_conf = config["controller"].get("sqp", {})
    al_cfg = settings.al_config()
    init_carry, run = build_device_loop(
        prob, sim, al_cfg=al_cfg, ctrl_rate=ctrl_rate,
        use_feedback_policy=bool(sqp_conf.get("use_feedback_policy", True)),
    )

    # one target per leaf, built exactly as build_problem does
    nq = prob.dims.robot_q
    R0, r0 = prob.robot.ee_pose(prob.x0[:nq])
    from upright_tpu.core.math import rot_to_quat

    q0 = rot_to_quat(R0)
    targets = []
    for p in paths:
        c = cfg.load_config(p)
        targets.append(
            TargetTrajectory.from_waypoints(
                c["controller"].get("waypoints", [{"time": 0.0}]),
                np.asarray(r0), np.asarray(q0),
            )
        )
    tgt_batch = jax.tree.map(lambda *xs: jnp.stack(xs), *targets)

    duration = float(config["simulation"].get("duration", 5.0))
    n_replans = int(round(duration * ctrl_rate))

    t0 = time.time()
    carries = jax.jit(jax.vmap(lambda t: init_carry(target=t)))(tgt_batch)
    batched = jax.jit(
        jax.vmap(lambda c, t: run(c, n_replans, target=t))
    )
    final, metrics = batched(carries, tgt_batch)
    jax.block_until_ready(final.t)
    wall = time.time() - t0

    rows = []
    for b, path in enumerate(paths):
        one = jax.tree.map(lambda x: x[b], final)
        tgt = jax.tree.map(lambda x: x[b], tgt_batch)
        disp = (
            np.asarray(sim.object_displacements(one.sim))
            if sim.n_obj
            else np.zeros(1)
        )
        ee_err = float(
            np.linalg.norm(
                np.asarray(metrics.r_ew_w[b, -1]) - np.asarray(tgt.poses[-1, :3])
            )
        )
        worst = float(disp.max())
        # a non-finite displacement is the plant diverging AFTER the object
        # left the tray (free tumbling overflows in f32) — a failure, not
        # a measurement
        rows.append(
            {
                "leaf": str(Path(path).relative_to(Path(path).parents[2])),
                "ee_err_m": round(ee_err, 4),
                "max_obj_disp_m": (
                    round(worst, 4) if np.isfinite(worst) else "diverged"
                ),
                "failed": bool(worst > FAIL_DISP_M or not np.isfinite(worst)),
                "max_eq_viol": float(np.asarray(metrics.eq_viol[b]).max()),
            }
        )
    disps = [
        r["max_obj_disp_m"] for r in rows
        if isinstance(r["max_obj_disp_m"], float)
    ]
    n_div = sum(1 for r in rows if r["max_obj_disp_m"] == "diverged")
    print(
        f"  {name}: {len(paths)} runs in {wall:.0f}s, "
        f"max disp {max(disps) if disps else float('nan'):.3f} m"
        + (f" ({n_div} diverged)" if n_div else ""),
        flush=True,
    )
    return rows


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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default="static_obstacles,freespace")
    ap.add_argument("--groups", default=None,
                    help="comma-separated group-name filter (debugging)")
    ap.add_argument("--friction-model", default=None,
                    choices=["regularized", "stiction"],
                    help="override the plant friction model for every leaf "
                    "(default: each leaf's configured model — stiction "
                    "unless the leaf opts out)")
    ap.add_argument("--precision", default="highest",
                    choices=["default", "high", "highest"],
                    help="matmul precision the sweep runs at (recorded in "
                    "the artifact)")
    ap.add_argument("--ctrl-rate", type=float, default=100.0)
    ap.add_argument(
        "--out", default=None,
        help="output JSON (default docs/ral23_results.json, or "
        "docs/ral23_results_stiction.json under --friction-model stiction)",
    )
    args = ap.parse_args()

    if args.precision != "default":
        jax.config.update("jax_default_matmul_precision", args.precision)
    if args.out is None:
        stem = "ral23_results"
        if args.friction_model:
            stem += f"_{args.friction_model}"
        args.out = str(
            Path(__file__).resolve().parents[1] / "docs" / f"{stem}.json"
        )

    root = Path(__file__).resolve().parents[1] / "configs" / "ral23"
    results = {}
    for family in args.families.split(","):
        print(f"family {family}:", flush=True)
        fam_rows = []
        wanted = args.groups.split(",") if args.groups else None
        for name, paths in sorted(discover_groups(root / family).items()):
            if wanted and name not in wanted:
                continue
            fam_rows.extend(
                run_group(
                    name, paths, ctrl_rate=args.ctrl_rate,
                    friction_model=args.friction_model,
                )
            )
        results[family] = fam_rows

    # provenance stamp (VERDICT r4 item 10): a stale artifact — generated by
    # an older script/plant revision than the committed tree — is detectable
    # from the JSON itself
    results["_provenance"] = {
        "script": "scripts/ral23_sweep.py",
        "git_hash": _git_hash(),
        "matmul_precision": str(args.precision),
        "friction_model": args.friction_model or "per-leaf default (stiction)",
        "ctrl_rate_hz": args.ctrl_rate,
        "generated_utc": time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
        ),
    }
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"saved {args.out}")

    md = Path(args.out).with_suffix(".md")
    fm = args.friction_model or "per-leaf default (stiction)"
    prov = results["_provenance"]
    lines = [
        "# ral23 experiment sweep (recorded results)",
        "",
        "Generated by `scripts/ral23_sweep.py` — every leaf of each family",
        "run closed-loop (100 Hz replanning, full duration), experiment",
        "groups batched as single vmapped device loops.  failure = balanced",
        f"object displaced > {FAIL_DISP_M*100:.0f} cm in the tray frame.",
        f"Plant friction model: **{fm}**.  Matmul precision: "
        f"**{prov['matmul_precision']}**.  Generated at git "
        f"`{prov['git_hash']}`, {prov['generated_utc']}.",
        "",
        "Reading the failures:",
        "- `none_*` / `upward_*` leaves are ABLATIONS (no tray control /",
        "  tray held level): flinging the payload is the experiment's",
        "  expected differential, not a defect.",
        "- `aligned_arch_*`: the alignment heuristic cannot supply the",
        "  lateral force balance the arch bridge needs — expected ablation",
        "  physics (the balancing controllers hold the same arch).",
        "- `aligned_dice_*`: the alignment heuristic plans at ZERO friction",
        "  margin, so micro-scale disturbance (bf16-3-pass stage math on",
        "  TPU, or >= 0.001 rad/s commanded-velocity noise — see",
        "  `docs/aligned_differential.md`) drops the 0.02 kg stacked dice",
        "  that the balancing controllers hold — the reference's hardware",
        "  ablation result (arXiv 2305.17484).  In a noise-free f64 run",
        "  the same leaf holds.",
        "- `*_arm_only` leaves pull permanently against a waypoint 2.9 m",
        "  from the fixed UR10's base (~1.3 m reach; the reference uses",
        "  the same geometry, so its arm cannot reach it either) — the",
        "  ee_error_clamp bounds the pull and the arm orbits its",
        "  workspace envelope for the whole run.  The frictionless-model",
        "  `robust_arch` variant is the minimum-margin case of this",
        "  regime: the controller cannot reserve lateral friction for",
        "  the arch while sloshing near the extension singularity, and",
        "  the outcome (hold at ~2 mm vs one pillar tipping) flips with",
        "  the numeric environment — recorded regenerations show both.",
        "  Every reachable-waypoint arch leaf holds at sub-mm.",
        "- under the REGULARIZED friction model (the recorded sensitivity,",
        "  `ral23_results_regularized.md`), leaves that demand sustained",
        "  force at the friction-cone boundary (`full_arch_*`) or a",
        "  stacked die held quasi-statically for > ~5 s (`*_dice_*`",
        "  tails) CREEP — regularized Coulomb friction only transmits",
        "  force through slip.  The default STICTION model (anchor-spring",
        "  static friction — the reference's PyBullet LCP contact regime)",
        "  holds those leaves.  Displacements capped at ~1 m are the",
        "  plant's divergence containment (the object left the tray and",
        "  froze).",
        "",
    ]
    for family, rows in results.items():
        if family == "_provenance":
            continue
        n_fail = sum(r["failed"] for r in rows)
        lines += [
            f"## {family} — {len(rows)} runs, {n_fail} failures",
            "",
            "| leaf | EE err (m) | max obj disp (m) | failed |",
            "|---|---|---|---|",
        ]
        for r in rows:
            disp = r["max_obj_disp_m"]
            disp_s = f"{disp:.3f}" if isinstance(disp, float) else disp
            lines.append(
                f"| {Path(r['leaf']).name} | {r['ee_err_m']:.3f} "
                f"| {disp_s} | {'X' if r['failed'] else ''} |"
            )
        lines.append("")
    md.write_text("\n".join(lines))
    print(f"saved {md}")

    # The plant default IS stiction (configs/simulation.yaml, r5): a
    # per-leaf-default run therefore resolves to the stiction model for
    # every leaf (no leaf overrides it), and the historical
    # `ral23_results_stiction.*` artifact names denote the same table.
    # Mirror the run under those names so both stay regenerable from one
    # sweep, with the mirroring recorded in the provenance.
    if args.friction_model is None and Path(args.out).stem == "ral23_results":
        import upright_tpu.config as _c

        default_model = _c.load_config(
            str(Path(__file__).resolve().parents[1] / "configs" / "simulation.yaml")
        ).get("friction_model", "regularized")
        if default_model == "stiction":
            results["_provenance"] = dict(
                results["_provenance"],
                friction_model="stiction (per-leaf default)",
                mirror_of="ral23_results.json",
            )
            mirror = Path(args.out).with_name("ral23_results_stiction.json")
            with open(mirror, "w") as f:
                json.dump(results, f, indent=2)
            mirror.with_suffix(".md").write_text(
                "\n".join(lines)
                + "\n(Mirror of `ral23_results.md` — the per-leaf default "
                "friction model resolves to stiction for every leaf.)\n"
            )
            print(f"saved {mirror} (+.md mirror)")


if __name__ == "__main__":
    main()
