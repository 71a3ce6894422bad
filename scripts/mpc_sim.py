#!/usr/bin/env python
"""Closed-loop MPC simulation (reference upright_cmd/scripts/simulations/
mpc_sim.py:30-330, re-designed for the JAX plant + solver).

Loop structure mirrors the reference: measure joints (+ noise), MPC step
(replan gated at min_policy_update_time), jerk double-integration into a
velocity command, plant step.

Usage: python scripts/mpc_sim.py --config configs/demos/ur10_demo.yaml
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import time

import numpy as np

import upright_tpu.config as cfg
from upright_tpu.core.logging import DataLogger
from upright_tpu.sim.simulation import UprightSimulation
from upright_tpu.solver.mpc import ControllerManager


def run_closed_loop(config, duration=None, ctrl_rate=125.0, log=None, verbose=False,
                    seed=None):
    """Run the closed loop; returns (sim, state, controller, logger).

    ``seed`` enables the configured measurement/process noise
    (simulation.robot.noise, reference sim/robot.py:123-167): each control
    cycle draws fresh keys for sim.measure and sim.step.  With seed=None
    (default) the loop is deterministic and noise-free regardless of
    config, matching the reference's noise-off default."""
    from upright_tpu.runtime.projectile import ProjectileTracker
    from upright_tpu.sim.obstacles import build_dynamic_obstacles

    sim_conf = config["simulation"]
    sim = UprightSimulation(sim_conf)
    rng_key = None
    if seed is not None:
        import jax

        rng_key = jax.random.PRNGKey(int(seed))
    ctrl = ControllerManager.from_config(config)

    duration = float(duration or sim_conf.get("duration", 5.0))
    dt_ctrl = 1.0 / ctrl_rate
    n_sub = max(1, int(round(dt_ctrl / sim.timestep)))

    state = sim.initial_state()
    nq = sim.robot.nq
    a_state = np.zeros(nq)  # controller's acceleration state (triple
    # integrator belief; reference mpc_sim.py:148-158)

    # dynamic obstacles: sim-side ballistic balls + controller-side tracker
    # (the "simulated Vicon" loop of mpc_sim_ros.py:108-109)
    _, r_ee0 = sim.ee_pose(state)
    dyn_obstacles = build_dynamic_obstacles(sim_conf, ee_position=r_ee0)
    num_ctrl_obs = ctrl.problem.dims.num_obstacles
    # projectile estimation only applies to ballistic obstacles with the
    # path constraint enabled; sudden/controlled obstacles feed their state
    # directly (the reference gets it from the obstacle's joint state)
    use_projectile = bool(
        config["controller"].get("projectile_path_constraint", {}).get("enabled")
    )
    proj_tracker = (
        ProjectileTracker(dt_ctrl)
        if (dyn_obstacles and num_ctrl_obs and use_projectile)
        else None
    )

    logger = log if log is not None else DataLogger(timestep=0.05)

    t = 0.0
    steps = int(round(duration / dt_ctrl))
    for i in range(steps):
        k_meas = k_proc = None
        if rng_key is not None:
            import jax

            rng_key, k_meas, k_proc = jax.random.split(rng_key, 3)
        q_meas, v_meas = sim.measure(state, rng_key=k_meas)
        x = np.concatenate([np.asarray(q_meas), np.asarray(v_meas), a_state])

        # feed obstacle estimates into the controller state tail + the
        # target's projectile-activation flag (mrt_node.cpp:239-283)
        if proj_tracker is not None:
            obs_state, s_flag = proj_tracker.update(dyn_obstacles[0].position(t))
            tails = [obs_state] + [np.zeros(9)] * (num_ctrl_obs - 1)
            x = np.concatenate([x] + tails)
            poses = np.asarray(ctrl.target.poses)
            if poses[0, 7] != s_flag:
                import jax.numpy as jnp

                poses = poses.copy()
                poses[:, 7] = s_flag
                ctrl.target = ctrl.target.replace(poses=jnp.asarray(poses))
        elif num_ctrl_obs and dyn_obstacles:
            tails = [
                dyn_obstacles[i].state(t) if i < len(dyn_obstacles) else np.zeros(9)
                for i in range(num_ctrl_obs)
            ]
            x = np.concatenate([x] + tails)
        elif num_ctrl_obs:
            x = np.concatenate([x] + [np.zeros(9)] * num_ctrl_obs)
        assert not np.isnan(x).any(), "NaN in controller state"

        xd, u = ctrl.step(t, x)
        u_cmd = u[:nq]

        # double-integrate jerk into the velocity command
        v_cmd = np.asarray(v_meas) + dt_ctrl * a_state + 0.5 * dt_ctrl**2 * u_cmd
        a_state = a_state + dt_ctrl * u_cmd

        state = sim.step(state, v_cmd, n_steps=n_sub, rng_key=k_proc)
        t += dt_ctrl
        for obs in dyn_obstacles:
            obs.step(t)  # advance controlled-obstacle velocity servos

        if logger.ready(t):
            R_we, r_ew = sim.ee_pose(state)
            cons = ctrl.problem.evaluate_constraints(x, u, t, ctrl.target)
            diag = ctrl.problem.diagnostics(x, u, t, ctrl.target)
            from upright_tpu.core.math import rot_to_quat

            ee = ctrl.problem.robot.ee_state(
                np.asarray(x)[: ctrl.problem.dims.robot_x]
            )
            rd, qd, _s = ctrl.target.interpolate(t)
            entry = {
                "t": t,
                "x": x,
                "xd": np.asarray(xd),
                "u": np.asarray(u),
                "cmd_vel": v_cmd,
                "r_ew_w": r_ew,
                "r_ew_w_d": np.asarray(rd),
                "Q_we": np.asarray(rot_to_quat(R_we)),
                "Q_we_d": np.asarray(qd),
                "v_ew_w": np.asarray(ee.v_ew_w),
                "w_ew_w": np.asarray(ee.w_ew_w),
                "constraint_eq": np.asarray(cons["equality"]),
                "constraint_ineq_min": float(np.min(np.asarray(cons["inequality"])))
                if cons["inequality"].shape[0]
                else 0.0,
                "solve_time": ctrl.replanning_durations[-1]
                if ctrl.replanning_durations
                else 0.0,
                "orn_err": float(diag["orn_err"]),
                "ddC_we_norm": float(diag["ddC_we_norm"]),
                "cost": float(diag["cost"]),
            }
            if ctrl.problem.dims.f:
                entry["contact_forces"] = np.asarray(diag["contact_forces"])
            # per-named-constraint values (controller_python_interface.h:31-88)
            for name, _n in ctrl.problem.ineq_groups:
                entry[name] = np.asarray(cons[name])
            if sim.n_obj:
                r_obj, q_obj = sim.object_poses(state)
                entry["r_ow_w"] = r_obj
                entry["object_displacement"] = sim.object_displacements(state)
            logger.append_dict(entry)

        if verbose and i % 25 == 0:
            _, r_ew = sim.ee_pose(state)
            print(f"t={t:6.2f}s  r_ee={np.round(r_ew, 3)}")

    run_closed_loop.last_obstacles = dyn_obstacles
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
