"""Stress tests for the warm-start shift/heal gates (VERDICT r2 item 9).

The post-brake heal gate (UprightProblem.heal_warm_start) and the fractional
time-shift (shift_warm_start) carry OCS2's primal warm-start semantics
(SqpSolver carry-over); these tests sweep the jump size across the gate
threshold and pin the fractional-shift interpolation identities.
"""

import copy

import numpy as np
import pytest

import upright_tpu.config as cfg
from upright_tpu.ocp.problem import build_problem
from upright_tpu.solver.mpc import ControllerManager


@pytest.fixture(scope="module")
def ur10_config():
    path = cfg.resolve_package_path(
        {"package": "configs", "path": "demos/ur10_demo.yaml"}
    )
    return cfg.load_config(path)


@pytest.fixture(scope="module")
def warm(ur10_config):
    """A converged solver state to perturb."""
    mgr = ControllerManager.from_config(ur10_config)
    sol = mgr.warmstart()
    return mgr.problem, sol.state


def _jump_x0(problem, state, size):
    """x0 displaced from the plan head by ``size`` in joint-position norm."""
    nq = problem.dims.robot_q
    x0 = np.asarray(state.X[0]).copy()
    direction = np.ones(nq) / np.sqrt(nq)
    x0[:nq] += size * direction
    return x0


@pytest.mark.parametrize("size", [0.0, 0.05, 0.19])
def test_heal_keeps_plan_below_threshold(warm, size):
    """Below the gate the stored (near-optimal) robot trajectory is kept
    verbatim — healing must not touch it during normal tracking drift."""
    problem, state = warm
    x0 = _jump_x0(problem, state, size)
    healed = problem.heal_warm_start(state, x0)
    np.testing.assert_array_equal(np.asarray(healed.X), np.asarray(state.X))


@pytest.mark.parametrize("size", [0.21, 0.5, 1.5])
def test_heal_rerolls_plan_above_threshold(warm, size):
    """Above the gate the state trajectory is re-rolled from x0 through the
    stored inputs: head pinned at x0, tail dynamically consistent."""
    problem, state = warm
    x0 = _jump_x0(problem, state, size)
    healed = problem.heal_warm_start(state, x0)
    X = np.asarray(healed.X)
    np.testing.assert_allclose(X[0], x0, atol=1e-12)
    # every stage satisfies the (exact) dynamics through the stored inputs
    for k in range(problem.ocp.N):
        x_next = np.asarray(
            problem.ocp.dynamics(healed.X[k], state.U[k], None)
        )
        np.testing.assert_allclose(X[k + 1], x_next, atol=1e-9)
    # inputs/multipliers are untouched by healing
    np.testing.assert_array_equal(np.asarray(healed.U), np.asarray(state.U))


def test_heal_gate_boundary_is_sharp(warm):
    """The gate flips exactly at the configured threshold: 0.2-eps keeps,
    0.2+eps re-rolls (the default threshold is 0.2 rad)."""
    problem, state = warm
    assert problem.heal_jump_threshold == pytest.approx(0.2)
    eps = 1e-6
    kept = problem.heal_warm_start(state, _jump_x0(problem, state, 0.2 - eps))
    rolled = problem.heal_warm_start(state, _jump_x0(problem, state, 0.2 + eps))
    np.testing.assert_array_equal(np.asarray(kept.X), np.asarray(state.X))
    assert not np.allclose(np.asarray(rolled.X), np.asarray(state.X))


def test_heal_threshold_from_config(ur10_config):
    """controller.mpc.heal_jump_threshold moves the gate."""
    config = copy.deepcopy(ur10_config)
    config["controller"].setdefault("mpc", {})["heal_jump_threshold"] = 0.6
    problem = build_problem(config)
    assert problem.heal_jump_threshold == pytest.approx(0.6)

    mgr = ControllerManager.from_config(config)
    state = mgr.warmstart().state
    # a 0.4 jump would re-roll at the default 0.2 gate but is kept at 0.6
    x0 = _jump_x0(problem, state, 0.4)
    healed = problem.heal_warm_start(state, x0)
    np.testing.assert_array_equal(np.asarray(healed.X), np.asarray(state.X))
    # ... and 0.8 still re-rolls
    x0_big = _jump_x0(problem, state, 0.8)
    healed = problem.heal_warm_start(state, x0_big)
    np.testing.assert_allclose(np.asarray(healed.X[0]), x0_big, atol=1e-12)


def test_shift_zero_is_identity(warm):
    problem, state = warm
    shifted = problem.shift_warm_start(state, 0.0)
    for a, b in [(shifted.X, state.X), (shifted.U, state.U),
                 (shifted.lam, state.lam), (shifted.mu, state.mu)]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_shift_integer_rows(warm):
    """An integer shift moves rows up with tail clamping (OCS2 interpolates
    the previous solution at the new query times; beyond the horizon the
    last stage extrapolates flat)."""
    problem, state = warm
    shifted = problem.shift_warm_start(state, 2.0)
    X, U = np.asarray(state.X), np.asarray(state.U)
    Xs, Us = np.asarray(shifted.X), np.asarray(shifted.U)
    N = U.shape[0]
    np.testing.assert_allclose(Xs[: N - 1], X[2 : N + 1], atol=1e-12)
    np.testing.assert_allclose(
        Xs[N - 1 :], np.broadcast_to(X[N], (2, X.shape[1])), atol=1e-12
    )  # clamped tail
    np.testing.assert_allclose(Us[: N - 2], U[2:], atol=1e-12)
    np.testing.assert_allclose(
        Us[N - 2 :], np.broadcast_to(U[N - 1], (2, U.shape[1])), atol=1e-12
    )


@pytest.mark.parametrize("frac", [0.25, 0.5, 0.75])
def test_shift_fractional_interpolates(warm, frac):
    """A fractional shift is the linear interpolation of the two integer
    shifts — the property that makes replan cadence independent of dt."""
    problem, state = warm
    lo = problem.shift_warm_start(state, 1.0)
    hi = problem.shift_warm_start(state, 2.0)
    mid = problem.shift_warm_start(state, 1.0 + frac)
    for field in ("X", "U", "lam", "mu"):
        a = np.asarray(getattr(lo, field))
        b = np.asarray(getattr(hi, field))
        m = np.asarray(getattr(mid, field))
        np.testing.assert_allclose(m, (1 - frac) * a + frac * b, atol=1e-9)


def test_shift_negative_clamps_to_zero(warm):
    """Negative shifts (clock skew) clamp to the unshifted plan."""
    problem, state = warm
    shifted = problem.shift_warm_start(state, -0.3)
    np.testing.assert_allclose(
        np.asarray(shifted.X), np.asarray(state.X), atol=1e-12
    )


@pytest.mark.slow
def test_closed_loop_brake_reengage_near_threshold(ur10_config):
    """Closed loop with a brake/re-engage whose jump lands right at the
    gate: the loop must recover for jumps on both sides of the threshold."""
    import jax.numpy as jnp

    from upright_tpu.sim.simulation import UprightSimulation

    for bump in (0.18, 0.25):  # straddle the 0.2 gate
        config = copy.deepcopy(ur10_config)
        sim = UprightSimulation(config["simulation"])
        ctrl = ControllerManager.from_config(config)
        state = sim.initial_state()
        nq = sim.robot.nq
        a_state = np.zeros(nq)
        dt_ctrl = 1.0 / 50.0
        n_sub = max(1, int(round(dt_ctrl / sim.timestep)))

        t = 0.0
        bumped = False
        for _ in range(int(4.0 / dt_ctrl)):
            x = np.concatenate([np.asarray(state.q), np.asarray(state.v), a_state])
            xd, u = ctrl.step(t, x)
            assert np.all(np.isfinite(u)), f"non-finite input at t={t}, bump={bump}"
            v_cmd = np.asarray(state.v) + dt_ctrl * a_state + 0.5 * dt_ctrl**2 * u[:nq]
            a_state = a_state + dt_ctrl * u[:nq]
            state = sim.step(state, v_cmd, n_steps=n_sub)
            t += dt_ctrl
            if not bumped and t >= 1.0:
                dq = np.zeros(nq)
                dq[0] = bump
                state = state.replace(q=state.q + jnp.asarray(dq))
                bumped = True

        target_r = np.asarray(ctrl.target.poses[0, :3])
        _, r_ew = sim.ee_pose(state)
        assert np.linalg.norm(r_ew - target_r) < 0.1, f"bump={bump}"
        assert float(ctrl.solution.eq_viol) < 1e-2, f"bump={bump}"
