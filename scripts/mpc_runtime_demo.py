#!/usr/bin/env python
"""Multi-process-style runtime demo: asynchronous planner + native real-time
executor + plant, wall-clock scheduled.

The reference achieves this with two ROS nodes (mpc_node + mrt_node,
launch/mpc_mrt_simulation.launch); here the planner runs in a background
thread (device solves are asynchronous) and the C++ executor owns the
125 Hz loop.

Usage: python scripts/mpc_runtime_demo.py --config configs/demos/ur10_demo.yaml --duration 5
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import upright_tpu.config as cfg
from upright_tpu.runtime.native import NativeExecutor
from upright_tpu.runtime.tracker import AsyncPlanner
from upright_tpu.sim.simulation import UprightSimulation
from upright_tpu.solver.mpc import ControllerManager


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--duration", type=float, default=5.0)
    parser.add_argument("--rate", type=float, default=125.0)
    parser.add_argument(
        "--time-scale", type=float, default=1.0,
        help="sim seconds per wall second; < 1 runs the whole pipeline in "
        "slow motion for hosts whose solver/plant cannot keep real time "
        "(CPU-hosted runs; on TPU leave at 1.0)",
    )
    args = parser.parse_args()
    scale = args.time_scale

    config = cfg.load_config(args.config)
    sim = UprightSimulation(config["simulation"])
    ctrl = ControllerManager.from_config(config)
    nq = sim.robot.nq

    state = sim.initial_state()
    x0 = np.concatenate([np.asarray(state.q), np.zeros(2 * nq)])
    executor = NativeExecutor(nq, rate=args.rate, x0=x0, time_scale=scale)

    planner = AsyncPlanner(ctrl, min_update_time=0.01)
    planner.set_observation(0.0, x0)
    print("warm-starting the planner (compiles both solve paths)...")
    planner.solve_once()  # warm-start solve (compiles the warmstart path)
    planner.solve_once()  # one replan (compiles the 1-iteration path)
    sol = ctrl.solution
    executor.post_policy(
        0.0, ctrl.problem.dt,
        np.asarray(sol.state.X)[:, : 3 * nq],
        np.asarray(sol.state.U)[:, :nq],
        np.asarray(sol.K)[:, :nq, : 3 * nq],
    )

    planner.start()
    executor.start(t_now=0.0)  # align the executor clock with sim time

    dt = 1.0 / args.rate
    t = 0.0
    t_wall0 = time.perf_counter()
    try:
        while t < args.duration:
            executor.post_observation(t, np.asarray(state.q), np.asarray(state.v))
            planner.set_observation(t, executor.state_estimate())

            pol = planner.get_policy()
            if pol is not None:
                executor.post_policy(pol.t0, pol.dt, pol.X[:, : 3 * nq],
                                     pol.U[:, :nq], pol.K[:, :nq, : 3 * nq])

            v_cmd, _ = executor.get_command()
            if v_cmd is None:
                v_cmd = np.zeros(nq)
            state = sim.step(state, v_cmd, n_steps=max(1, int(dt / sim.timestep)))
            t += dt
            # pace to wall clock (scaled: 1 sim second = 1/scale wall seconds)
            lag = (t_wall0 + t / scale) - time.perf_counter()
            if lag > 0:
                time.sleep(lag)
    finally:
        planner.stop()
        executor.stop()

    stats = executor.stats()
    durations = np.asarray(ctrl.replanning_durations[1:] or [0.0])
    _, r_ew = sim.ee_pose(state)
    target = np.asarray(ctrl.target.poses[0, :3])
    print(f"executor: {stats['ticks']} ticks, {stats['overruns']} overruns, "
          f"{stats['policy_switches']} policy switches, "
          f"max tick {stats['max_tick_seconds']*1e3:.3f} ms")
    print(f"planner: {len(durations)} replans, mean {durations.mean()*1e3:.1f} ms, "
          f"p99 {np.percentile(durations, 99)*1e3:.1f} ms")
    print(f"EE error: {np.linalg.norm(r_ew - target):.4f} m")
    if sim.n_obj:
        print(f"object displacement: {np.round(sim.object_displacements(state), 4)} m")


if __name__ == "__main__":
    main()
