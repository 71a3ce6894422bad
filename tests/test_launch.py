"""Multi-process orchestration test (launch-file parity, VERDICT r1 §2.4).

Spawns the planner in a separate OS process (runtime/launch.py PlannerNode)
and runs a short closed loop against the JAX plant + native executor —
the mpc_node / mrt_node split as real processes."""

import sys
import time
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

import upright_tpu.config as cfg


@pytest.mark.slow
def test_launch_stack_closed_loop():
    from upright_tpu.runtime.launch import PlannerNode
    from upright_tpu.runtime.native import NativeExecutor
    from upright_tpu.sim.simulation import UprightSimulation

    path = cfg.resolve_package_path(
        {"package": "configs", "path": "demos/ur10_demo.yaml"}
    )
    config = cfg.load_config(path)
    sim = UprightSimulation(config["simulation"])
    nq = sim.robot.nq
    state = sim.initial_state()
    x0 = np.concatenate([np.asarray(state.q), np.zeros(2 * nq)])

    planner = PlannerNode(path, min_update_time=0.01)
    try:
        planner.set_observation(0.0, x0)
        planner.wait_ready(timeout=600.0)
        assert planner.compile_seconds > 0

        pol = planner.get_policy()
        deadline = time.monotonic() + 30.0
        while pol is None and time.monotonic() < deadline:
            time.sleep(0.05)
            pol = planner.get_policy()
        assert pol is not None, "no policy after ready"

        scale = 0.02  # slow motion: CPU planner replans keep up
        executor = NativeExecutor(nq, rate=125.0, x0=x0, time_scale=scale)
        executor.post_policy(pol.t0, pol.dt, pol.X[:, : 3 * nq],
                             pol.U[:, :nq], pol.K[:, :nq, : 3 * nq])
        executor.start(t_now=0.0)
        try:
            dt = 1.0 / 125.0
            t = 0.0
            t_wall0 = time.perf_counter()
            switches = 0
            while t < 1.0:
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
                state = sim.step(state, v_cmd,
                                 n_steps=max(1, int(dt / sim.timestep)))
                t += dt
                lag = (t_wall0 + t / scale) - time.perf_counter()
                if lag > 0:
                    time.sleep(lag)
        finally:
            executor.stop()

        assert switches > 0, "planner process produced no new policies"
        disp = sim.object_displacements(state)
        assert (disp < 0.05).all(), disp
        assert planner.alive
    finally:
        planner.stop()
