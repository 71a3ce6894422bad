"""Tests for obstacle avoidance: constraint assembly, dynamic obstacles,
and a closed-loop collision-free navigation check."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

import upright_tpu.config as cfg
from upright_tpu.ocp.problem import build_problem
from upright_tpu.sim.obstacles import DynamicObstacle, ObstacleMode


@pytest.fixture(scope="module")
def obstacle_config():
    path = cfg.resolve_package_path(
        {"package": "configs", "path": "demos/thing_obstacle_demo.yaml"}
    )
    return cfg.load_config(path)


def test_collision_constraint_rows(obstacle_config):
    prob = build_problem(obstacle_config)
    # 4 robot spheres x 9 static obstacles = 36 collision rows on top of the
    # cones/bounds
    params = prob.stage_params(0.0)
    p0 = {k: v[0] for k, v in params["stage"].items()}
    h = prob.ocp.ineq(prob.x0, jnp.zeros(prob.ocp.nu), p0)

    base_conf = dict(obstacle_config)
    base_conf["controller"] = dict(obstacle_config["controller"])
    base_conf["controller"]["obstacles"] = {"enabled": False}
    prob_nobs = build_problem(base_conf)
    h_nobs = prob_nobs.ocp.ineq(prob_nobs.x0, jnp.zeros(prob_nobs.ocp.nu), p0)
    assert h.shape[0] - h_nobs.shape[0] == 36

    # at the home configuration, far from the obstacles: all distances positive
    assert (np.asarray(h[-36:]) > 0).all()


def test_collision_rows_sign(obstacle_config):
    """Moving the base into an obstacle pillar makes the rows negative."""
    prob = build_problem(obstacle_config)
    params = prob.stage_params(0.0)
    p0 = {k: v[0] for k, v in params["stage"].items()}
    x_bad = prob.x0.at[0].set(1.5).at[1].set(1.0)  # base at pillar 2
    h = prob.ocp.ineq(x_bad, jnp.zeros(prob.ocp.nu), p0)
    assert (np.asarray(h[-36:]) < 0).any()


def test_dynamic_obstacle_modes():
    modes = [
        ObstacleMode(0.0, np.zeros(3), np.array([1.0, 0, 0]), np.zeros(3)),
        ObstacleMode(2.0, np.array([5.0, 0, 0]), np.array([0, 1.0, 0]),
                     np.array([0, 0, -9.81])),
    ]
    obs = DynamicObstacle(modes, radius=0.2)
    assert np.allclose(obs.position(1.0), [1.0, 0, 0])
    s = obs.state(3.0)
    assert np.allclose(s[:3], [5.0, 1.0, -0.5 * 9.81])
    assert np.allclose(s[3:6], [0, 1.0, -9.81])


def test_dynamic_obstacle_in_state(obstacle_config):
    """Dynamic obstacles extend the OCP state and propagate ballistically."""
    conf = cfg.load_config(
        cfg.resolve_package_path({"package": "configs", "path": "demos/thing_demo.yaml"})
    )
    proj = cfg.load_config(
        cfg.resolve_package_path({"package": "configs", "path": "obstacles/projectile.yaml"})
    )
    conf["controller"] = cfg.recursive_dict_update(conf["controller"], proj["controller"])
    prob = build_problem(conf)
    assert prob.ocp.nx == 27 + 9
    # obstacle initial state from the first mode
    assert np.allclose(np.asarray(prob.x0[27:30]), [0, -10, 0])
    assert np.allclose(np.asarray(prob.x0[33:36]), [0, 0, -9.81])
    # dynamics propagate the obstacle ballistically
    params = prob.stage_params(0.0)
    p0 = {k: v[0] for k, v in params["stage"].items()}
    x1 = prob.ocp.dynamics(prob.x0, jnp.zeros(prob.ocp.nu), p0)
    dt = prob.dt
    assert np.isclose(float(x1[29]), 0 - 0.5 * 9.81 * dt**2)
    # projectile path constraint adds a row
    h = prob.ocp.ineq(prob.x0, jnp.zeros(prob.ocp.nu), p0)
    assert h.shape[0] > 0


@pytest.mark.slow
def test_closed_loop_obstacle_avoidance(obstacle_config):
    """The Thing drives across the course without entering any obstacle."""
    from mpc_sim import run_closed_loop

    obstacle_config["simulation"]["duration"] = 6.0
    sim, state, ctrl, logger = run_closed_loop(
        obstacle_config, duration=6.0, ctrl_rate=50.0
    )
    prob = ctrl.problem

    # final EE near the target
    target_r = np.asarray(prob.target.poses[0, :3])
    _, r_ew = sim.ee_pose(state)
    assert np.linalg.norm(r_ew - target_r) < 0.15

    # bottle survived the trip
    disp = sim.object_displacements(state)
    assert (disp < 0.05).all()

    # collision rows stayed nonnegative-ish along the plan
    sol = ctrl.solution
    params = prob.stage_params(ctrl.last_plan_time)
    import jax

    h = jax.vmap(lambda x, u, p: prob.ocp.ineq(x, u, p))(
        sol.state.X[:-1], sol.state.U, params["stage"]
    )
    assert float(jnp.min(h[:, -36:])) > -0.05


@pytest.mark.slow
def test_closed_loop_projectile_dodge():
    """A ball is thrown at the EE; the controller keeps the EE clear of the
    predicted ballistic path while the bottle stays balanced."""
    from mpc_sim import run_closed_loop

    path = cfg.resolve_package_path(
        {"package": "configs", "path": "demos/thing_projectile_demo.yaml"}
    )
    conf = cfg.load_config(path)
    sim, state, ctrl, logger = run_closed_loop(conf, duration=3.0, ctrl_rate=50.0)
    obstacles = run_closed_loop.last_obstacles
    assert obstacles, "demo should create a dynamic obstacle"

    # replay: minimum distance between EE and ball across the run must
    # respect (roughly) the constraint distance
    import upright_tpu.config as _c

    # measure from the logger entries
    data = logger.as_arrays()
    ts = data["t"]
    r_ee = data["r_ew_w"]
    d_min = np.inf
    for t, r in zip(ts, r_ee):
        r_ball = obstacles[0].position(float(t))
        d_min = min(d_min, float(np.linalg.norm(r - r_ball)))
    # ball passes within throwing range but the EE keeps clearance
    assert d_min > 0.25, f"EE got too close to the ball: {d_min:.3f} m"

    # the bottle survived the dodge
    disp = sim.object_displacements(state)
    assert (disp < 0.05).all(), disp


def test_projectile_plane_constraint():
    """Experimental plane variant (reference projectile_plane_constraint.h:
    36-55, disabled in controller_interface.cpp:287-289): one s-gated row
    s * (n.(r_ew - r_obs) - w) appended after the path-distance rows."""
    conf = cfg.load_config(
        cfg.resolve_package_path(
            {"package": "configs", "path": "demos/thing_projectile_demo.yaml"}
        )
    )
    normal = [0.0, 1.0, 0.0]
    conf["controller"]["projectile_plane_constraint"] = {
        "enabled": True,
        "distance": 0.3,
        "normal": normal,
    }
    prob = build_problem(conf)
    assert ("projectile_plane", 1) in prob.ineq_groups

    params = prob.stage_params(0.0)
    p0 = {k: v[0] for k, v in params["stage"].items()}
    x = jnp.asarray(prob.x0)
    h = prob.ocp.ineq(x, jnp.zeros(prob.ocp.nu), p0)

    # hand formula at the initial state
    r_ee = prob.robot.ee_state(x[: prob.dims.robot_x]).r_ew_w
    r_obs = x[prob.dims.robot_x : prob.dims.robot_x + 3]
    s = float(prob.target.poses[0, 7])
    expected = s * (np.asarray(normal) @ np.asarray(r_ee - r_obs) - 0.3)
    assert np.isclose(float(h[-1]), expected, atol=1e-12)

    # the s flag gates the row exactly: activate it and re-evaluate
    import jax.numpy as jnp2

    poses_on = np.asarray(prob.target.poses).copy()
    poses_on[:, 7] = 1.0
    tgt_on = prob.target.replace(poses=jnp2.asarray(poses_on))
    p_on = {
        k: v[0] for k, v in prob.stage_params(0.0, tgt_on)["stage"].items()
    }
    h_on = prob.ocp.ineq(x, jnp.zeros(prob.ocp.nu), p_on)
    expected_on = np.asarray(normal) @ np.asarray(r_ee - r_obs) - 0.3
    assert np.isclose(float(h_on[-1]), expected_on, atol=1e-12)

    # solver runs with the extra row
    from upright_tpu.solver.al import ALConfig, solve
    from upright_tpu.solver.ocp import zeros_warm_start

    sol = solve(
        prob.ocp, ALConfig(iterations=3), params, prob.x0,
        zeros_warm_start(prob.ocp, prob.x0),
    )
    assert np.isfinite(float(sol.cost))
