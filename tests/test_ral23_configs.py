"""The ral23 experiment config matrix (VERDICT r1 item 8): every leaf config
must load, and a representative slice must build into a solvable problem.

Mirrors reference upright_cmd/config/ral23/**: static_obstacles
{full,robust,aligned} x {arch,bottle,cups,dice} x 3 waypoints,
sudden_obstacle t in {0.5,1,1.5,2} + nominal, projectile head/side-on, and
the wedge transport sims.
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
    # full/robust cover all 4 arrangements x 3 points; aligned skips dice
    assert sum(n.startswith("full_") for n in names) == 12
    assert (
        sum(n.startswith("robust_") and "wedge" not in n for n in names) == 12
    )
    assert sum(n.startswith("aligned_") for n in names) == 9
    assert sum(n.startswith("sudden_") for n in names) == 5
    assert sum(n.startswith("projectile_") for n in names) == 2
    assert sum(n.endswith("_with_wedge.yaml") for n in names) == 2


@pytest.mark.parametrize("path", LEAVES)
def test_leaf_loads(path):
    c = cfg.load_config(path)
    assert "waypoints" in c["controller"]
    assert "arrangement" in c["simulation"]


@pytest.mark.parametrize(
    "path",
    [
        "configs/ral23/static_obstacles/full_dice_point1.yaml",
        "configs/ral23/static_obstacles/robust_arch_point2.yaml",
        "configs/ral23/static_obstacles/aligned_cups_point3.yaml",
        "configs/ral23/sudden_obstacle/sudden_t1.0.yaml",
        "configs/ral23/wedge/frictionless_with_wedge.yaml",
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
