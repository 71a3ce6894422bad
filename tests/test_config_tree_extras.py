"""Build checks for the config-tree extras beyond the ral23 matrix
(VERDICT r3 missing #3): the ral25 real box{1,2,3} demo matrix, the
restaurant obstacle course, the base-only ridgeback + inverted
experimentals, and the unused sim extras (full_h0, high_mu_bottle).
"""

import glob

import numpy as np
import pytest

import upright_tpu.config as cfg
from upright_tpu.ocp.problem import build_problem

RAL25_LEAVES = sorted(glob.glob("configs/ral25/real/*/*.yaml"))


def test_ral25_matrix_shape():
    names = [p.split("/")[-1] for p in RAL25_LEAVES]
    # box1/box3: {center, top, robust} x {point1, point3}; box2 adds exact
    assert len(names) == 20
    for box, count in [("box1", 6), ("box2", 8), ("box3", 6)]:
        assert sum(n.startswith(box) for n in names) == count
    assert sum("_robust_" in n for n in names) == 6
    assert sum("_exact_" in n for n in names) == 2


@pytest.mark.parametrize("path", RAL25_LEAVES)
def test_ral25_leaf_builds(path):
    config = cfg.load_config(path)
    prob = build_problem(config)
    # long-horizon offline plan (reference demos/_base.yaml: 10 s)
    assert prob.ocp.N == 100
    assert prob.dims.num_objects == 1
    name = path.split("/")[-1]
    if "_robust_" in name:
        # the robust leaves carry CoM bounds for the scenario expansion
        from upright_tpu.robust.synthesis import parse_robust_bounds

        half = parse_robust_bounds(config["controller"])
        assert half is not None
        np.testing.assert_allclose(half[0][:2], [0.06, 0.06])
        assert config["controller"]["robust"]["com_variant"] == "robust"
    if "_exact_" in name:
        # measured inertia is used verbatim (explicit-inertia support)
        m = prob.balance_model
        assert abs(float(m.params[0, 0]) - 1.046) < 1e-9


def test_restaurant_course_builds():
    prob = build_problem(cfg.load_config("configs/demos/thing_restaurant_demo.yaml"))
    # 3 robot spheres x 15 scene spheres = 45 collision pairs
    groups = dict(prob.ineq_groups)
    assert groups["collision_pair_distances"] == 45


def test_ridgeback_only_builds():
    prob = build_problem(cfg.load_config("configs/experimental/ridgeback_only.yaml"))
    assert prob.ocp.nx == 9 and prob.dims.robot_q == 3
    # the locked arm still places the EE at the same height as the full
    # Thing at home: FK through folded constants
    import jax.numpy as jnp

    _, r = prob.robot.ee_pose(jnp.asarray(prob.x0[:3]))
    full = build_problem(cfg.load_config("configs/demos/thing_demo.yaml"))
    _, r_full = full.robot.ee_pose(jnp.asarray(full.x0[:9]))
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_full), atol=1e-10)


def test_inverted_builds():
    prob = build_problem(cfg.load_config("configs/experimental/inverted.yaml"))
    # orientation-only EE weight
    assert prob.dims.num_objects == 1
    assert prob.target.times.shape[0] == 3  # three timed waypoints


@pytest.mark.parametrize(
    "path",
    [
        "configs/ral23/simulations/unused/full_h0.yaml",
        "configs/ral23/simulations/unused/high_mu_bottle.yaml",
    ],
)
def test_sim_extras_build(path):
    config = cfg.load_config(path)
    prob = build_problem(config)
    assert prob.dims.num_objects == 1
    if "high_mu" in path:
        # local arrangement override: raised mu, lowered CoM
        assert float(prob.balance_model.mu[0]) == 0.39
        com_z = float(prob.balance_model.params[0, 3] / prob.balance_model.params[0, 0])
        # bottle sits on the tray: CoM z = half height - 0.1 offset
        assert com_z < 0.1
