"""Tests for the runtime layer: KF, safety monitor, projectile tracking,
policy evaluation."""

import numpy as np
import pytest

from upright_tpu.runtime.estimator import projectile_kf, robot_kf
from upright_tpu.runtime.projectile import FlightPhase, ProjectileTracker, fit_ballistic_motion
from upright_tpu.runtime.safety import SafetyMonitor
from upright_tpu.runtime.tracker import Policy, TrackingController


def test_robot_kf_converges():
    """KF tracks a triple-integrator trajectory from noisy measurements."""
    nq, dt = 2, 0.008
    rng = np.random.default_rng(0)
    kf = robot_kf(nq, dt, measurement_variance=1e-4)

    q = np.zeros(nq)
    v = np.zeros(nq)
    a = np.zeros(nq)
    for i in range(500):
        u = np.array([np.sin(0.01 * i), np.cos(0.01 * i)])
        # ground truth triple integrator
        q = q + dt * v + 0.5 * dt**2 * a + dt**3 / 6 * u
        v = v + dt * a + 0.5 * dt**2 * u
        a = a + dt * u
        kf.predict(u)
        y = np.concatenate([q, v]) + 1e-3 * rng.standard_normal(2 * nq)
        kf.correct(y)

    assert np.allclose(kf.x[:nq], q, atol=5e-3)
    assert np.allclose(kf.x[nq : 2 * nq], v, atol=5e-3)
    assert np.allclose(kf.x[2 * nq :], a, atol=5e-2)


def test_projectile_kf_tracks_ballistic():
    dt = 0.01
    kf = projectile_kf(dt)
    g = np.array([0, 0, -9.81])
    r = np.array([0.0, 0, 2.0])
    v = np.array([1.0, 0.5, 3.0])
    kf.x[:3] = r
    kf.x[3:] = v
    for _ in range(100):
        r = r + dt * v + 0.5 * dt**2 * g
        v = v + dt * g
        kf.predict(kf.gravity)
        kf.correct(r + 1e-4 * np.random.default_rng(1).standard_normal(3))
    assert np.allclose(kf.x[:3], r, atol=1e-2)
    assert np.allclose(kf.x[3:], v, atol=5e-2)


def test_projectile_tracker_state_machine():
    dt = 0.01
    tracker = ProjectileTracker(dt, activation_height=1.0, deactivation_height=0.2)
    assert tracker.phase == FlightPhase.PREFLIGHT

    # ball thrown upward from z=0.1
    g = np.array([0, 0, -9.81])
    r = np.array([0.0, 0, 0.1])
    v = np.array([0.5, 0, 6.0])
    phases = []
    for _ in range(150):
        r = r + dt * v + 0.5 * dt**2 * g
        v = v + dt * g
        obs_state, s = tracker.update(r)
        phases.append((tracker.phase, s))
    seen = [p for p, _ in phases]
    assert FlightPhase.FLIGHT in seen
    assert phases[-1][0] == FlightPhase.POSTFLIGHT
    # s flag was 1 only during flight
    s_during = [s for p, s in phases if p == FlightPhase.FLIGHT]
    assert all(s == 1.0 for s in s_during)
    assert phases[-1][1] == 0.0


def test_fit_ballistic_motion():
    t = np.linspace(0, 1, 50)
    r0 = np.array([1.0, 2.0, 0.5])
    v0 = np.array([0.5, -1.0, 4.0])
    g = np.array([0, 0, -9.81])
    pos = r0[None] + t[:, None] * v0[None] + 0.5 * t[:, None] ** 2 * g[None]
    r0_fit, v0_fit, a_fit = fit_ballistic_motion(t, pos)
    assert np.allclose(r0_fit, r0, atol=1e-8)
    assert np.allclose(v0_fit, v0, atol=1e-8)
    assert np.allclose(a_fit, g, atol=1e-6)


def test_safety_monitor():
    mon = SafetyMonitor(
        state_lower=np.array([-1.0, -1.0]),
        state_upper=np.array([1.0, 1.0]),
        input_lower=np.array([-5.0]),
        input_upper=np.array([5.0]),
        state_margin=0.1,
        input_margin=0.5,
        enforce_state=True,
        enforce_input=True,
    )
    ok, _ = mon.check(np.array([0.5, 0.0]), np.array([1.0]))
    assert ok
    ok, reason = mon.check(np.array([1.2, 0.0]), np.array([1.0]))
    assert not ok and "state" in reason
    ok, reason = mon.check(np.array([0.0, 0.0]), np.array([6.0]))
    assert not ok and "input" in reason
    # within margin: allowed
    ok, _ = mon.check(np.array([1.05, 0.0]), np.array([5.2]))
    assert ok


def test_policy_evaluation_and_tracker_tick():
    nq = 2
    N = 5
    dt = 0.1
    X = np.zeros((N + 1, 3 * nq))
    X[:, 0] = np.linspace(0, 1, N + 1)  # q_0 ramps up
    U = np.ones((N, nq))
    K = np.zeros((N, nq, 3 * nq))
    pol = Policy(t0=0.0, dt=dt, X=X, U=U, K=K)

    xd, u = pol.evaluate(0.05, X[0])
    assert np.isclose(xd[0], 0.1)  # halfway interpolation
    assert np.allclose(u, 1.0)

    # feedback: K nonzero responds to state error
    K[:, 0, 0] = -2.0
    x_off = X[0].copy()
    x_off[0] += 0.5
    _, u_fb = pol.evaluate(0.0, x_off)
    assert np.isclose(u_fb[0], 1.0 - 1.0)

    trk = TrackingController(nq=nq, rate=125, use_kf=True)
    v_cmd, x_est, u_cmd = trk.tick(0.0, np.zeros(nq), np.zeros(nq), pol)
    assert v_cmd.shape == (nq,)
    assert not trk.braked

    # safety braking
    mon = SafetyMonitor(
        state_lower=-0.1 * np.ones(3 * nq), state_upper=0.1 * np.ones(3 * nq),
        state_margin=0.0, enforce_state=True,
    )
    trk2 = TrackingController(nq=nq, rate=125, safety=mon)
    v_cmd, _, _ = trk2.tick(0.0, 5 * np.ones(nq), np.zeros(nq), pol)
    assert trk2.braked
    assert np.allclose(v_cmd, 0.0)


def test_trajectory_toolkit(tmp_path):
    from upright_tpu.solver.trajectory import (
        DoubleIntegrator,
        QuinticInterpolator,
        StateInputMapping,
        StateInputTrajectory,
        TrajectoryInterpolator,
        linear_interpolate,
    )

    di = DoubleIntegrator(2)
    v, a = di.step(np.zeros(2), np.ones(2), np.zeros(2), 0.1)
    assert np.allclose(v, 0.1) and np.allclose(a, 1.0)

    ts = np.linspace(0, 1, 11)
    xs = np.stack([np.full(6, t) for t in ts])
    us = np.zeros((10, 2))
    traj = StateInputTrajectory(ts=ts, xs=xs, us=us)
    traj.save(tmp_path / "plan.npz")
    loaded = StateInputTrajectory.load(tmp_path / "plan.npz")
    assert np.allclose(loaded.xs, xs)

    interp = TrajectoryInterpolator(loaded, nq=2)
    x, u = interp.interpolate(0.55)
    assert np.allclose(x, 0.55, atol=1e-9)

    m = StateInputMapping(2)
    q, v, a = m.xva(np.arange(6.0))
    assert np.allclose(q, [0, 1]) and np.allclose(a, [4, 5])

    # quintic hits its boundary conditions
    quin = QuinticInterpolator(0, 1, [0.0], [0.0], [0.0], [1.0], [0.0], [0.0])
    p0, v0, a0 = quin.eval(0.0)
    p1, v1, a1 = quin.eval(1.0)
    assert np.isclose(p0[0], 0) and np.isclose(p1[0], 1)
    assert np.isclose(v1[0], 0, atol=1e-9) and np.isclose(a1[0], 0, atol=1e-8)
    pm, _, _ = quin.eval(0.5)
    assert np.isclose(pm[0], 0.5)
