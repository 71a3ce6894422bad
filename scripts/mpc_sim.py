#!/usr/bin/env python
"""Closed-loop MPC simulation (reference upright_cmd/scripts/simulations/
mpc_sim.py:30-330, re-designed for the JAX plant + solver).

Loop structure mirrors the reference: measure joints (+ noise), MPC step
(replan gated at min_policy_update_time), jerk double-integration into a
velocity command, plant step.

Usage: python scripts/mpc_sim.py --config configs/demos/ur10_demo.yaml
"""

import argparse
import time

import numpy as np

import upright_tpu.config as cfg
from upright_tpu.core.logging import DataLogger
from upright_tpu.sim.simulation import UprightSimulation
from upright_tpu.solver.mpc import ControllerManager


def run_closed_loop(config, duration=None, ctrl_rate=125.0, log=None, verbose=False):
    """Run the closed loop; returns (sim, state, controller, logger)."""
    sim_conf = config["simulation"]
    sim = UprightSimulation(sim_conf)
    ctrl = ControllerManager.from_config(config)

    duration = float(duration or sim_conf.get("duration", 5.0))
    dt_ctrl = 1.0 / ctrl_rate
    n_sub = max(1, int(round(dt_ctrl / sim.timestep)))

    state = sim.initial_state()
    nq = sim.robot.nq
    a_state = np.zeros(nq)  # controller's acceleration state (triple
    # integrator belief; reference mpc_sim.py:148-158)

    logger = log if log is not None else DataLogger(timestep=0.05)

    t = 0.0
    steps = int(round(duration / dt_ctrl))
    for i in range(steps):
        q_meas, v_meas = sim.measure(state)
        x = np.concatenate([np.asarray(q_meas), np.asarray(v_meas), a_state])
        assert not np.isnan(x).any(), "NaN in controller state"

        xd, u = ctrl.step(t, x)
        u_cmd = u[:nq]

        # double-integrate jerk into the velocity command
        v_cmd = np.asarray(v_meas) + dt_ctrl * a_state + 0.5 * dt_ctrl**2 * u_cmd
        a_state = a_state + dt_ctrl * u_cmd

        state = sim.step(state, v_cmd, n_steps=n_sub)
        t += dt_ctrl

        if logger.ready(t):
            R_we, r_ew = sim.ee_pose(state)
            entry = {
                "t": t,
                "x": x,
                "u": np.asarray(u),
                "r_ew_w": r_ew,
                "solve_time": ctrl.replanning_durations[-1]
                if ctrl.replanning_durations
                else 0.0,
            }
            if sim.n_obj:
                r_obj, q_obj = sim.object_poses(state)
                entry["r_ow_w"] = r_obj
                entry["object_displacement"] = sim.object_displacements(state)
            logger.append_dict(entry)

        if verbose and i % 25 == 0:
            _, r_ew = sim.ee_pose(state)
            print(f"t={t:6.2f}s  r_ee={np.round(r_ew, 3)}")

    return sim, state, ctrl, logger


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--duration", type=float, default=None)
    parser.add_argument("--log", default=None, help="directory to save npz log")
    args = parser.parse_args()

    config = cfg.load_config(args.config)
    t0 = time.time()
    sim, state, ctrl, logger = run_closed_loop(config, args.duration, verbose=True)
    wall = time.time() - t0

    durations = np.asarray(ctrl.replanning_durations[1:])  # skip warm start
    print(f"\nwall time: {wall:.1f}s")
    if durations.size:
        print(
            f"solve time: mean {durations.mean()*1e3:.2f} ms, "
            f"max {durations.max()*1e3:.2f} ms, p99 {np.percentile(durations, 99)*1e3:.2f} ms"
        )
    if sim.n_obj:
        disp = sim.object_displacements(state)
        print(f"final object displacement: {np.round(disp, 4)} m")
    if args.log:
        logger.save(args.log, config)


if __name__ == "__main__":
    main()
