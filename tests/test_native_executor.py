"""Tests for the native (C++) real-time executor."""

import time

import numpy as np
import pytest

from upright_tpu.runtime.native import NativeExecutor


def make_policy(nq, N=10, dt=0.1, jerk=0.0, gain=0.0):
    nx = 3 * nq
    X = np.zeros((N + 1, nx))
    U = jerk * np.ones((N, nq))
    K = np.zeros((N, nq, nx))
    if gain:
        for k in range(N):
            K[k, :, :nq] = gain * np.eye(nq)
    return X, U, K


def test_tick_produces_command():
    nq = 3
    ex = NativeExecutor(nq, rate=125.0)
    X, U, K = make_policy(nq, jerk=1.0)
    ex.post_policy(0.0, 0.1, X, U, K)
    ex.post_observation(0.0, np.zeros(nq), np.zeros(nq))
    ex.tick(0.0)
    v_cmd, t = ex.get_command()
    assert v_cmd is not None
    # v_cmd = v + dt a + 0.5 dt^2 u with v = a = 0 -> 0.5 dt^2 * 1
    dt = 1.0 / 125.0
    assert np.allclose(v_cmd, 0.5 * dt**2 * 1.0, atol=1e-6)
    ex.close()


def test_kf_tracks_measurements():
    nq = 2
    ex = NativeExecutor(nq, rate=100.0, kf_meas_var=1e-6)
    X, U, K = make_policy(nq)
    ex.post_policy(0.0, 0.1, X, U, K)
    q = np.array([0.3, -0.2])
    v = np.array([0.1, 0.05])
    for i in range(50):
        ex.post_observation(i * 0.01, q, v)
        ex.tick(i * 0.01)
    x = ex.state_estimate()
    assert np.allclose(x[:nq], q, atol=1e-3)
    assert np.allclose(x[nq : 2 * nq], v, atol=1e-3)
    ex.close()


def test_feedback_gain_applied():
    nq = 2
    ex = NativeExecutor(nq, rate=100.0, kf_meas_var=1e-8, kf_init_var=1e3)
    X, U, K = make_policy(nq, gain=-2.0)  # u = -2 (q - 0)
    ex.post_policy(0.0, 0.1, X, U, K)
    q = np.array([1.0, 0.0])
    for i in range(30):
        ex.post_observation(i * 0.01, q, np.zeros(nq))
        ex.tick(i * 0.01)
    v_cmd, _ = ex.get_command()
    # u ~ -2 -> v_cmd ~ 0.5 dt^2 * (-2) (v and a estimates near zero)
    assert v_cmd[0] < 0
    assert abs(v_cmd[1]) < abs(v_cmd[0])
    ex.close()


def test_safety_brake_latches():
    nq = 2
    nx = 3 * nq
    ex = NativeExecutor(nq, rate=100.0, kf_meas_var=1e-8, kf_init_var=1e3)
    ex.set_state_limits(-0.5 * np.ones(nx), 0.5 * np.ones(nx), margin=0.0)
    X, U, K = make_policy(nq, jerk=1.0)
    ex.post_policy(0.0, 0.1, X, U, K)
    for i in range(20):
        ex.post_observation(i * 0.01, np.array([2.0, 0.0]), np.zeros(nq))
        ex.tick(i * 0.01)
    assert ex.braked
    v_cmd, _ = ex.get_command()
    assert np.allclose(v_cmd, 0.0)
    ex.close()


def test_realtime_thread_rate():
    nq = 2
    rate = 250.0
    ex = NativeExecutor(nq, rate=rate)
    X, U, K = make_policy(nq)
    ex.post_policy(0.0, 0.1, X, U, K)
    ex.post_observation(0.0, np.zeros(nq), np.zeros(nq))
    ex.start()
    time.sleep(0.5)
    ex.stop()
    stats = ex.stats()
    expected = 0.5 * rate
    assert stats["ticks"] == pytest.approx(expected, rel=0.25)
    # each tick fast and few overruns on an idle box
    assert stats["max_tick_seconds"] < 0.004
    ex.close()


def test_policy_switch_counting():
    nq = 2
    ex = NativeExecutor(nq, rate=100.0)
    X, U, K = make_policy(nq)
    ex.post_observation(0.0, np.zeros(nq), np.zeros(nq))
    for i in range(5):
        ex.post_policy(float(i), 0.1, X, U, K)
        ex.tick(i * 0.01)
    assert ex.stats()["policy_switches"] == 5
    ex.close()


def test_executor_closed_loop_with_sim():
    """Full pipeline: JAX planner posts policies to the native executor, the
    executor (sim-time ticks) produces velocity commands driving the JAX
    plant — the native equivalent of the mpc_node/mrt_node split."""
    import upright_tpu.config as cfg
    from upright_tpu.sim.simulation import UprightSimulation
    from upright_tpu.solver.mpc import ControllerManager

    path = cfg.resolve_package_path({"package": "configs", "path": "demos/ur10_demo.yaml"})
    conf = cfg.load_config(path)
    sim = UprightSimulation(conf["simulation"])
    ctrl = ControllerManager.from_config(conf)
    nq = sim.robot.nq

    state = sim.initial_state()
    x0 = np.concatenate([np.asarray(state.q), np.zeros(2 * nq)])
    ex = NativeExecutor(nq, rate=125.0, kf_meas_var=1e-6, x0=x0)

    replan_every = 5  # planner at 25 Hz, tracker at 125 Hz
    dt = 1.0 / 125.0
    t = 0.0
    for i in range(250):  # 2 seconds
        ex.post_observation(t, np.asarray(state.q), np.asarray(state.v))
        if i % replan_every == 0:
            x_est = ex.state_estimate()
            ctrl.step(t, x_est)  # replan from the executor's estimate
            sol = ctrl.solution
            ex.post_policy(
                ctrl.last_plan_time, ctrl.problem.dt,
                np.asarray(sol.state.X)[:, : 3 * nq],
                np.asarray(sol.state.U)[:, :nq],
                np.asarray(sol.K)[:, :nq, : 3 * nq],
            )
        ex.tick(t)
        v_cmd, _ = ex.get_command()
        state = sim.step(state, v_cmd, n_steps=8)
        t += dt

    assert not ex.braked
    # EE converged toward the waypoint
    target = np.asarray(ctrl.target.poses[0, :3])
    _, r_ew = sim.ee_pose(state)
    err = float(np.linalg.norm(r_ew - target))
    assert err < 0.15, f"EE error {err:.3f}"
    # bottle stayed balanced
    disp = sim.object_displacements(state)
    assert (disp < 0.05).all()
