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
    # 6 cold iterations already bring the mass-normalized balance residuals
    # well down (the converged gate lives in test_solve_quality.py)
    assert float(sol.eq_viol) < 0.1
    # contact forces should be holding up the bottle: total normal force of
    # the first stage approximately equals the weight (0.827 kg)
    forces = np.asarray(sol.state.U[0, prob.dims.robot_u :]) * np.asarray(
        prob.force_scale
    )
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

    # solver stayed healthy: after 4 s of warm-started replans the balance
    # equalities are satisfied to the BASELINE 1e-3 regime
    assert float(ctrl.solution.eq_viol) < 1e-3
    assert np.isfinite(np.asarray(ctrl.solution.state.X)).all()


@pytest.fixture(scope="module")
def thing_config():
    path = cfg.resolve_package_path({"package": "configs", "path": "demos/thing_demo.yaml"})
    return cfg.load_config(path)


@pytest.mark.slow
def test_closed_loop_thing(thing_config):
    """Full mobile manipulator (omnidirectional base): the base+arm carry the
    bottle to the waypoint."""
    from mpc_sim import run_closed_loop

    sim, state, ctrl, logger = run_closed_loop(thing_config, duration=4.0, ctrl_rate=50.0)
    prob = ctrl.problem
    target_r = np.asarray(prob.target.poses[0, :3])
    _, r_ew = sim.ee_pose(state)
    assert np.linalg.norm(r_ew - target_r) < 0.1
    disp = sim.object_displacements(state)
    assert (disp < 0.03).all()


def test_inertial_alignment_cost(ur10_config):
    """With the alignment cost enabled the solver tilts the tray toward the
    total acceleration: the alignment residual shrinks vs the plain solve."""
    import copy

    import jax
    import jax.numpy as jnp

    from upright_tpu.solver.al import ALConfig, solve
    from upright_tpu.solver.ocp import zeros_warm_start

    conf = copy.deepcopy(ur10_config)
    conf["controller"]["balancing"]["enabled"] = False
    conf["controller"]["inertial_alignment"]["cost_enabled"] = True
    conf["controller"]["inertial_alignment"]["cost_weight"] = 100.0
    prob_align = build_problem(conf)

    conf2 = copy.deepcopy(ur10_config)
    conf2["controller"]["balancing"]["enabled"] = False
    prob_plain = build_problem(conf2)

    al = ALConfig(iterations=10)

    def align_err(prob, sol):
        from upright_tpu.core.math import plane_span

        S = jnp.asarray(np.asarray(plane_span(jnp.array([0.0, 0, 1.0]))))
        g = jnp.asarray([0.0, 0, -9.81])

        def per_stage(x):
            ee = prob.robot.ee_state(x)
            return jnp.linalg.norm(S @ (ee.C_we.T @ (ee.a_ew_w - g))) / 9.81

        return float(jnp.mean(jax.vmap(per_stage)(sol.state.X)))

    sol_a = solve(prob_align.ocp, al, prob_align.stage_params(0.0), prob_align.x0,
                  zeros_warm_start(prob_align.ocp, prob_align.x0))
    sol_p = solve(prob_plain.ocp, al, prob_plain.stage_params(0.0), prob_plain.x0,
                  zeros_warm_start(prob_plain.ocp, prob_plain.x0))
    assert align_err(prob_align, sol_a) < align_err(prob_plain, sol_p)


def test_inertial_alignment_constraint(ur10_config):
    """Constraint form adds 5 inequality rows."""
    import copy

    conf = copy.deepcopy(ur10_config)
    conf["controller"]["inertial_alignment"]["constraint_enabled"] = True
    conf["controller"]["inertial_alignment"]["alpha"] = 0.2
    prob_c = build_problem(conf)
    prob_p = build_problem(ur10_config)
    assert prob_c.ocp.n_ineq - prob_p.ocp.n_ineq == 5


def test_ee_box_constraint_rows(ur10_config):
    import copy

    conf = copy.deepcopy(ur10_config)
    conf["controller"]["end_effector_box_constraint"]["enabled"] = True
    prob_c = build_problem(conf)
    prob_p = build_problem(ur10_config)
    assert prob_c.ocp.n_ineq - prob_p.ocp.n_ineq == 6


def test_data_logger_and_plotter(tmp_path, ur10_config):
    from upright_tpu.core.logging import DataLogger, DataPlotter

    logger = DataLogger(timestep=0.1)
    for i in range(20):
        t = i * 0.05
        if logger.ready(t):
            logger.append_dict(
                {"t": t, "x": np.zeros(18), "u": np.zeros(10), "r_ew_w": np.zeros(3),
                 "solve_time": 0.001}
            )
    out = logger.save(tmp_path, config=ur10_config, name="run")
    assert (out / "data.npz").exists()
    assert (out / "config.yaml").exists()
    data = DataLogger.load(out)
    assert data["t"].shape[0] == 10

    plotter = DataPlotter(data)
    fig = plotter.plot_all(path=tmp_path / "plots.png")
    assert (tmp_path / "plots.png").exists()


def test_nonholonomic_rolling_constraint(thing_config):
    """Unicycle base as an equality constraint: solves produce near-zero
    lateral base velocity."""
    import copy

    import jax
    import jax.numpy as jnp

    from upright_tpu.solver.al import ALConfig, solve
    from upright_tpu.solver.ocp import zeros_warm_start

    conf = copy.deepcopy(thing_config)
    conf["controller"]["robot"]["base_type"] = "nonholonomic"
    prob = build_problem(conf)
    assert prob.ocp.n_eq == 6 + 2  # balance + rolling rows

    al = ALConfig(iterations=15, rho_eq=50.0)
    sol = solve(prob.ocp, al, prob.stage_params(0.0), prob.x0,
                zeros_warm_start(prob.ocp, prob.x0))

    def lateral_speed(x):
        yaw = x[2]
        return -jnp.sin(yaw) * x[9] + jnp.cos(yaw) * x[10]

    lat = jax.vmap(lateral_speed)(sol.state.X)
    assert float(jnp.abs(lat).max()) < 0.05


@pytest.mark.slow
def test_closed_loop_stacked_dice(ur10_config):
    """Two stacked foam dice: 12 equality rows (2 objects), object-on-object
    contact in the plant; both dice must arrive with the tray."""
    import copy

    from mpc_sim import run_closed_loop

    conf = copy.deepcopy(ur10_config)
    conf["simulation"]["arrangement"] = "foam_die2"
    conf["controller"]["balancing"]["arrangement"] = "foam_die2"

    sim, state, ctrl, logger = run_closed_loop(conf, duration=4.0, ctrl_rate=50.0)
    assert ctrl.problem.ocp.n_eq == 12
    assert sim.n_obj == 2

    target_r = np.asarray(ctrl.problem.target.poses[0, :3])
    _, r_ew = sim.ee_pose(state)
    assert np.linalg.norm(r_ew - target_r) < 0.1

    disp = sim.object_displacements(state)
    assert (disp < 0.04).all(), f"dice slid: {disp}"
