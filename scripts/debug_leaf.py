#!/usr/bin/env python
"""Time-resolved closed-loop diagnosis of ONE ral23 leaf: runs the same
fused device loop as scripts/ral23_sweep.py but in host-visible chunks,
printing per-interval object displacements / tilts / EE error / constraint
violation so a failing leaf's displacement history (sudden tip vs gradual
creep, and when relative to the waypoint) is visible.

Usage: python scripts/debug_leaf.py configs/ral23/<family>/<leaf>.yaml
         [--friction-model stiction] [--duration 5] [--chunk 0.25]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

_cache = os.environ.get("BENCH_CACHE_DIR", ".jax_cache")
if _cache:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import upright_tpu.config as cfg
from upright_tpu.core.math import quat_to_rot, rot_to_quat
from upright_tpu.ocp.problem import build_problem
from upright_tpu.ocp.reference import TargetTrajectory
from upright_tpu.runtime.device_loop import build_device_loop
from upright_tpu.sim.simulation import UprightSimulation
from upright_tpu.solver.mpc import MPCSettings


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("leaf")
    ap.add_argument("--friction-model", default=None)
    ap.add_argument("--precision", default="highest")
    ap.add_argument("--duration", type=float, default=None)
    ap.add_argument("--chunk", type=float, default=0.25)
    ap.add_argument("--ctrl-rate", type=float, default=100.0)
    args = ap.parse_args()

    if args.precision != "default":
        jax.config.update("jax_default_matmul_precision", args.precision)

    config = cfg.load_config(args.leaf)
    if args.friction_model:
        config["simulation"]["friction_model"] = args.friction_model
    prob = build_problem(config)
    sim = UprightSimulation(config["simulation"])
    settings = MPCSettings.from_config(config["controller"])
    sqp_conf = config["controller"].get("sqp", {})
    init_carry, run = build_device_loop(
        prob, sim, al_cfg=settings.al_config(), ctrl_rate=args.ctrl_rate,
        use_feedback_policy=bool(sqp_conf.get("use_feedback_policy", True)),
    )

    nq = prob.dims.robot_q
    R0, r0 = prob.robot.ee_pose(prob.x0[:nq])
    q0 = rot_to_quat(R0)
    target = TargetTrajectory.from_waypoints(
        config["controller"].get("waypoints", [{"time": 0.0}]),
        np.asarray(r0), np.asarray(q0),
    )
    print("waypoints:", config["controller"].get("waypoints"))

    duration = args.duration or float(config["simulation"].get("duration", 5.0))
    chunk_replans = max(1, int(round(args.chunk * args.ctrl_rate)))
    n_chunks = int(round(duration * args.ctrl_rate / chunk_replans))

    carry = jax.jit(lambda: init_carry(target=target))()
    step = jax.jit(lambda c: run(c, chunk_replans, target=target))

    q_init = [np.asarray(sp.q_init) for sp in sim.specs]
    print(f"{'t':>6} {'ee_err':>8} {'eq_viol':>9} "
          + " ".join(f"{sp.name[:10]:>10}" for sp in sim.specs)
          + "  tilts(deg)")
    for k in range(n_chunks):
        carry, metrics = step(carry)
        jax.block_until_ready(carry.t)
        disp = sim.object_displacements(carry.sim)
        R_we, r_ew = sim.robot.ee_pose(carry.sim.q)
        ee_err = np.linalg.norm(
            np.asarray(metrics.r_ew_w[-1]) - np.asarray(target.poses[-1, :3])
        )
        tilts = []
        for i, sp in enumerate(sim.specs):
            Rn = np.asarray(R_we) @ np.asarray(quat_to_rot(jnp.asarray(q_init[i])))
            Ro = np.asarray(quat_to_rot(carry.sim.objects.q[i]))
            c = np.clip((Rn @ [0, 0, 1]) @ (Ro @ [0, 0, 1]), -1, 1)
            tilts.append(np.degrees(np.arccos(c)))
        print(
            f"{float(carry.t):6.2f} {ee_err:8.4f} "
            f"{float(np.asarray(metrics.eq_viol).max()):9.2e} "
            + " ".join(f"{d:10.4f}" for d in disp)
            + "  " + " ".join(f"{t:5.1f}" for t in tilts),
            flush=True,
        )


if __name__ == "__main__":
    main()
