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
