#!/usr/bin/env python
"""Launch the full stack as separate OS processes (launch-file equivalent).

Reference: upright_ros_interface/launch/mpc_mrt_simulation.launch starts
mpc_node, mrt_node and the simulation as separate ROS nodes.  Here:

  * planner process (PlannerNode): owns the solver device, replans
    continuously from the latest observation (mpc_node);
  * this process: plant simulation + native C++ real-time executor
    (mrt_node + sim), exchanging observations/policies over a Pipe.

Usage:
  python scripts/launch_stack.py --config configs/demos/ur10_demo.yaml \
      --duration 5 [--time-scale 0.05] [--planner-platform cpu]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import upright_tpu.config as cfg
from upright_tpu.runtime.launch import PlannerNode
from upright_tpu.runtime.native import NativeExecutor
from upright_tpu.sim.simulation import UprightSimulation


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--duration", type=float, default=5.0)
    parser.add_argument("--rate", type=float, default=125.0)
    parser.add_argument("--time-scale", type=float, default=1.0,
                        help="sim seconds per wall second (see mpc_runtime_demo)")
    parser.add_argument("--planner-platform", default=None,
                        help="JAX_PLATFORMS for the planner process "
                             "(default: inherit)")
    args = parser.parse_args()
    scale = args.time_scale

    config = cfg.load_config(args.config)
    sim = UprightSimulation(config["simulation"])
    nq = sim.robot.nq

    state = sim.initial_state()
    x0 = np.concatenate([np.asarray(state.q), np.zeros(2 * nq)])

    print("starting planner process...")
    planner = PlannerNode(args.config, min_update_time=0.01,
                          jax_platform=args.planner_platform)
    planner.set_observation(0.0, x0)
    planner.wait_ready()
    print(f"planner ready (compile {planner.compile_seconds:.1f}s)")

    executor = NativeExecutor(nq, rate=args.rate, x0=x0, time_scale=scale)
    pol = planner.get_policy()
    while pol is None:  # the first policy follows "ready" on the pipe
        time.sleep(0.01)
        pol = planner.get_policy()
    executor.post_policy(pol.t0, pol.dt, pol.X[:, : 3 * nq],
                         pol.U[:, :nq], pol.K[:, :nq, : 3 * nq])
    executor.start(t_now=0.0)

    dt = 1.0 / args.rate
    t = 0.0
    switches = 0
    t_wall0 = time.perf_counter()
    try:
        while t < args.duration:
            executor.post_observation(t, np.asarray(state.q), np.asarray(state.v))
            planner.set_observation(t, executor.state_estimate())

            new_pol = planner.get_policy()
            if new_pol is not None and new_pol is not pol:
                pol = new_pol
                switches += 1
                executor.post_policy(pol.t0, pol.dt, pol.X[:, : 3 * nq],
                                     pol.U[:, :nq], pol.K[:, :nq, : 3 * nq])

            v_cmd, _ = executor.get_command()
            if v_cmd is None:
                v_cmd = np.zeros(nq)
            state = sim.step(state, v_cmd, n_steps=max(1, int(dt / sim.timestep)))
            t += dt
            lag = (t_wall0 + t / scale) - time.perf_counter()
            if lag > 0:
                time.sleep(lag)
    finally:
        planner.stop()
        executor.stop()

    stats = executor.stats()
    _, r_ew = sim.ee_pose(state)
    print(f"executor: {stats['ticks']} ticks, {stats['overruns']} overruns, "
          f"{stats['policy_switches']} policy switches "
          f"({switches} received), max tick {stats['max_tick_seconds']*1e3:.3f} ms")
    print(f"EE position: {np.round(np.asarray(r_ew), 4)}")
    if sim.n_obj:
        disp = sim.object_displacements(state)
        print(f"object displacement: {np.round(disp, 4)} m")


if __name__ == "__main__":
    main()
