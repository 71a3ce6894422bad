"""Integration tests for the offline robust planning pipeline."""

import numpy as np
import pytest

import upright_tpu.config as cfg
from upright_tpu.robust.planning import (
    make_param_sweep,
    plan_robust,
    tracking_sweep,
)
from upright_tpu.sim.simulation import UprightSimulation


@pytest.fixture(scope="module")
def config():
    path = cfg.resolve_package_path(
        {"package": "configs", "path": "demos/ur10_demo.yaml"}
    )
    return cfg.load_config(path)


def test_nominal_offline_plan(config):
    prob, sol, plan = plan_robust(config, duration=2.0, iterations=30)
    assert plan.X.shape[0] == 21
    assert float(sol.eq_viol) < 0.05
    # plan reaches toward the waypoint
    target = np.asarray(prob.target.poses[0, :3])
    _, r_end = prob.robot.ee_pose(plan.X[-1][: prob.robot.nq])
    assert np.linalg.norm(np.asarray(r_end) - target) < 0.1


def test_vertex_scenario_plan_expands_model(config):
    prob, sol, plan = plan_robust(
        config, com_half_extents=[[0.01, 0.01, 0.02]], duration=2.0, iterations=30
    )
    # 8 scenario objects, 48 equality rows
    assert prob.ocp.n_eq == 48
    assert np.isfinite(plan.X).all()
    assert float(sol.eq_viol) < 0.2


def test_tracking_sweep_nominal(config):
    """P-control tracking of the nominal plan keeps the bottle in place for
    nominal and perturbed parameters."""
    prob, sol, plan = plan_robust(config, duration=2.0, iterations=30)
    sim = UprightSimulation(config["simulation"])

    sweep = make_param_sweep(
        sim,
        com_offsets=[[0.0, 0, 0], [0.005, 0.005, 0.0]],
        mass_scales=[0.9, 1.1],
        inertia_scales=[1.0],
    )
    disp = tracking_sweep(sim, plan, sweep, kp=10.0, ctrl_rate=125.0)
    assert disp.shape == (4, 1)
    assert (disp < 0.05).all(), disp
