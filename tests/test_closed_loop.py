"""End-to-end closed-loop integration tests (the reference's de-facto
integration test is mpc_sim.py; here it is an actual pytest).

ur10_demo: fixed-base UR10 carrying a pink bottle to a waypoint.  Success =
EE converges toward the target while the bottle stays on the tray.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

import upright_tpu.config as cfg
from upright_tpu.ocp.problem import build_problem


@pytest.fixture(scope="module")
def ur10_config():
    path = cfg.resolve_package_path({"package": "configs", "path": "demos/ur10_demo.yaml"})
    return cfg.load_config(path)


def test_build_problem(ur10_config):
    prob = build_problem(ur10_config)
    assert prob.ocp.N == 20
    assert prob.ocp.nx == 18
    # u = 6 jerk + 4 frictionless contact forces
    assert prob.ocp.nu == 10
    assert prob.ocp.n_eq == 6
    assert prob.ocp.n_feq == 3 + 12
    assert prob.dims.num_contacts == 4


def test_single_solve(ur10_config):
    import jax.numpy as jnp

    from upright_tpu.solver.al import ALConfig, solve
    from upright_tpu.solver.ocp import zeros_warm_start

    prob = build_problem(ur10_config)
    params = prob.stage_params(0.0)
    cfg_ = ALConfig(iterations=6, rho_eq=10.0, rho_ineq=10.0)
    sol = solve(prob.ocp, cfg_, params, prob.x0, zeros_warm_start(prob.ocp, prob.x0))
    assert np.isfinite(float(sol.cost))
    # the solver should be making the balance residuals small
    assert float(sol.eq_viol) < 0.5
    # contact forces should be holding up the bottle: total normal force of
    # the first stage approximately equals the weight (0.827 kg)
    forces = np.asarray(sol.state.U[0, prob.dims.robot_u :])
    total = forces.sum()
    assert 0.5 * 0.827 * 9.81 < total < 2.0 * 0.827 * 9.81


def test_closed_loop_ur10(ur10_config):
    from mpc_sim import run_closed_loop

    sim, state, ctrl, logger = run_closed_loop(
        ur10_config, duration=4.0, ctrl_rate=50.0
    )

    # EE moved toward the waypoint (-0.25, 0.5, 0.25 relative)
    prob = ctrl.problem
    target_r = np.asarray(prob.target.poses[0, :3])
    _, r_ew = sim.ee_pose(state)
    err = np.linalg.norm(r_ew - target_r)
    assert err < 0.1, f"EE {np.round(r_ew,3)} vs target {np.round(target_r,3)}"

    # the bottle stayed on the tray
    disp = sim.object_displacements(state)
    assert (disp < 0.03).all(), f"object slid: {disp}"

    # solver stayed healthy
    assert float(ctrl.solution.eq_viol) < 0.5
    assert np.isfinite(np.asarray(ctrl.solution.state.X)).all()
