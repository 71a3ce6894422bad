"""The fused on-device MPC loop must reproduce the host-driven loop.

build_device_loop runs replan + policy + plant inside one lax.scan; this
pins it against the host path (ControllerManager.step + sim.step, the
mpc_sim.py loop) tick for tick, and checks the closed loop actually works.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import upright_tpu.config as cfg
from upright_tpu.ocp.problem import build_problem
from upright_tpu.runtime.device_loop import build_device_loop
from upright_tpu.sim.simulation import UprightSimulation
from upright_tpu.solver.mpc import ControllerManager


@pytest.fixture(scope="module")
def ur10_config():
    path = cfg.resolve_package_path(
        {"package": "configs", "path": "demos/ur10_demo.yaml"}
    )
    return cfg.load_config(path)


def test_device_loop_matches_host_loop(ur10_config):
    """30 control cycles: the scanned device loop and the host loop produce
    the same plant trajectory (same math, same order) to float noise."""
    K = 30
    ctrl_rate = 100.0
    dt_ctrl = 1.0 / ctrl_rate

    # ---- host side: ControllerManager + eager sim stepping --------------
    sim_h = UprightSimulation(ur10_config["simulation"])
    ctrl = ControllerManager.from_config(ur10_config)
    state_h = sim_h.initial_state()
    nq = sim_h.robot.nq
    a_state = np.zeros(nq)
    ctrl.warmstart(0.0, np.concatenate(
        [np.asarray(state_h.q), np.asarray(state_h.v), a_state]
    ))
    n_sub = max(1, int(round(dt_ctrl / sim_h.timestep)))
    t = dt_ctrl
    for _ in range(K):
        q, v = sim_h.measure(state_h)
        x = np.concatenate([np.asarray(q), np.asarray(v), a_state])
        _xd, u = ctrl.step(t, x)
        v_cmd = np.asarray(v) + dt_ctrl * a_state + 0.5 * dt_ctrl**2 * u[:nq]
        a_state = a_state + dt_ctrl * u[:nq]
        state_h = sim_h.step(state_h, v_cmd, n_steps=n_sub)
        t += dt_ctrl

    # ---- device side: one fused scan ------------------------------------
    prob = build_problem(ur10_config)
    sim_d = UprightSimulation(ur10_config["simulation"])
    init_carry, run = build_device_loop(prob, sim_d, ctrl_rate=ctrl_rate)
    # prime with the same warm-started solver state, first replan at t=dt
    carry = init_carry(t0=dt_ctrl)
    run_j = jax.jit(run, static_argnums=1)
    carry, metrics = run_j(carry, K)

    np.testing.assert_allclose(
        np.asarray(carry.sim.q), np.asarray(state_h.q), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(carry.a_state), a_state, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(carry.solver.X), np.asarray(ctrl.state.X), atol=1e-7
    )
    assert np.all(np.isfinite(np.asarray(metrics.cost)))


@pytest.mark.slow
def test_device_loop_closed_loop_converges(ur10_config):
    """4 s fully on-device: EE reaches the waypoint, bottle stays put,
    balance equalities in the 1e-3 regime."""
    prob = build_problem(ur10_config)
    sim = UprightSimulation(ur10_config["simulation"])
    init_carry, run = build_device_loop(prob, sim, ctrl_rate=100.0)
    carry = init_carry()
    run_j = jax.jit(run, static_argnums=1)
    carry, metrics = run_j(carry, 400)

    target_r = np.asarray(prob.target.poses[0, :3])
    r_ew = np.asarray(metrics.r_ew_w[-1])
    assert np.linalg.norm(r_ew - target_r) < 0.1
    disp = sim.object_displacements(carry.sim)
    assert (np.asarray(disp) < 0.03).all(), f"object slid: {disp}"
    assert float(metrics.eq_viol[-1]) < 1e-3
