"""Frictional (nf = 3) mode end-to-end (VERDICT r1 item 6).

Contact forces become full 3-D decision variables and the linearized
friction cones (5 rows/contact, reference contact_constraints.h:49-77; nf
logic wrappers.py:307-317) enter the AL inequality path.  The demo uses a
low-friction box (mu = 0.18 after margin) and a lateral waypoint, so the
cones genuinely bind.
"""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

import upright_tpu.config as cfg
from upright_tpu.ocp.problem import build_problem


@pytest.fixture(scope="module")
def friction_config():
    path = cfg.resolve_package_path(
        {"package": "configs", "path": "demos/ur10_friction_demo.yaml"}
    )
    return cfg.load_config(path)


def test_dims_nf3(friction_config):
    prob = build_problem(friction_config)
    assert prob.dims.nf == 3
    assert prob.dims.num_contacts == 4
    # u = 6 jerk + 3 * 4 forces
    assert prob.ocp.nu == 18
    # 5 cone rows per contact lead the inequality block
    assert prob.ocp.n_ineq >= 5 * 4


def test_frictional_solve_converges_and_cones_bind(friction_config):
    """Cold solve with dual safeguarding converges to the 1e-3 regime, and
    at least one cone row is active (binding) rather than slack."""
    from upright_tpu.solver.mpc import ControllerManager

    mgr = ControllerManager.from_config(friction_config)
    assert mgr.settings.dual_update_every == 3  # config plumbed through
    sol = mgr.warmstart()
    assert float(sol.eq_viol) < 1e-3
    assert float(sol.ineq_viol) < 1e-4

    params = mgr.problem.stage_params(0.0)
    h = jax.vmap(lambda x, u, p: mgr.problem.ocp.ineq(x, u, p))(
        sol.state.X[:-1], sol.state.U, params["stage"]
    )
    nc = mgr.problem.dims.num_contacts
    cones = np.asarray(h)[:, : 5 * nc]
    # some cone within 1e-3 of its boundary somewhere over the horizon
    assert cones.min() < 1e-3
    # normal forces hold up the box (mass 0.5 kg): the f_n >= 0 rows
    # (every 5th cone row) carry the weight at stage 0.  Cone rows are
    # evaluated on the scaled force variables (problem.py force_scale), so
    # convert back to newtons per contact.
    fscale_c = np.asarray(mgr.problem.force_scale)[::3]
    f_n = cones[0, 0::5] * fscale_c
    total = f_n.sum()
    assert 0.5 * 0.5 * 9.81 < total < 2.0 * 0.5 * 9.81

    # warm-started production replans stay converged
    x = np.asarray(mgr.problem.x0)
    for k in range(3):
        mgr.step(0.01 * (k + 1), x)
    assert float(mgr.solution.eq_viol) < 1e-3


@pytest.mark.slow
def test_frictional_closed_loop(friction_config):
    """Closed loop: the MPC moves the EE laterally while the low-friction
    box stays on the tray (cones respected in the plant too)."""
    from mpc_sim import run_closed_loop

    sim, state, ctrl, logger = run_closed_loop(
        friction_config, duration=4.0, ctrl_rate=50.0
    )
    target_r = np.asarray(ctrl.problem.target.poses[0, :3])
    _, r_ew = sim.ee_pose(state)
    assert np.linalg.norm(r_ew - target_r) < 0.1
    disp = sim.object_displacements(state)
    assert (disp < 0.03).all(), f"box slid: {disp}"
