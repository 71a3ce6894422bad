"""Closed-loop tests over the harder arrangements (VERDICT r1 items 5+8):
arch, cups, fixture, wedge, and a sudden controlled obstacle.

Each test runs the full MPC + JAX-plant loop (scripts/mpc_sim.py) and checks
the EE reaches its waypoint while the objects stay in place.  All are marked
slow (each costs ~2 compile-heavy minutes on CPU); the fast suite covers the
same machinery on the single-bottle demos.
"""

import copy
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

import upright_tpu.config as cfg


def _ur10_with_arrangement(arrangement, waypoint=(-0.25, -0.45, 0.25),
                           frictionless=True):
    """UR10 demo config with a different arrangement.

    The default waypoint matches the shipped demo: the UR10 home pose is
    close to full extension, so waypoints must move back toward the base
    (+y waypoints from here are unreachable for the fixed arm)."""
    path = cfg.resolve_package_path(
        {"package": "configs", "path": "demos/ur10_demo.yaml"}
    )
    config = copy.deepcopy(cfg.load_config(path))
    config["simulation"]["arrangement"] = arrangement
    config["controller"]["balancing"]["arrangement"] = arrangement
    config["controller"]["balancing"]["frictionless"] = frictionless
    config["controller"]["waypoints"] = [
        {"time": 0, "position": list(waypoint), "orientation": [0, 0, 0, 1]}
    ]
    return config


def _run(config, duration=4.0, disp_tol=0.03, ee_tol=0.1):
    from mpc_sim import run_closed_loop

    sim, state, ctrl, logger = run_closed_loop(
        config, duration=duration, ctrl_rate=50.0
    )
    target_r = np.asarray(ctrl.problem.target.poses[0, :3])
    _, r_ew = sim.ee_pose(state)
    assert np.linalg.norm(r_ew - target_r) < ee_tol, (
        f"EE {np.round(r_ew, 3)} vs target {np.round(target_r, 3)}"
    )
    disp = sim.object_displacements(state)
    assert (disp < disp_tol).all(), f"objects slid: {disp}"
    return sim, state, ctrl


@pytest.mark.slow
def test_closed_loop_arch():
    """Three-block arch: the bridge block touches BOTH pillars."""
    _run(_ur10_with_arrangement("box_arch"))


@pytest.mark.slow
def test_closed_loop_cups():
    """Seven cups on the tray (largest multi-object arrangement)."""
    _run(_ur10_with_arrangement("blue_cups"))


@pytest.mark.slow
def test_closed_loop_fixture():
    """Box next to a rigid fixture block: the fixture's side face supports
    the box laterally (reference simulation.py:484-486,635-653).  Frictional
    mode per the reference's fixture experiments
    (ral23/simulations/full_with_fixture.yaml: frictionless: false)."""
    _run(_ur10_with_arrangement("simulation_box_with_fixture",
                                frictionless=False))


@pytest.mark.slow
def test_closed_loop_wedge():
    """Block riding a wedge's sloped top face.  Frictional controller: the
    arrangement's mu_margin (0.1683, matching the reference) leaves exactly
    the minimum feasible friction, which requires the controller to tilt
    the tray ~7.5 deg — the RAL23 wedge experiment's point.  The sim's true
    mu = 0.3 gives margin over the controller's marginal model; under the
    stiction default (r5) static friction holds the near-critical slope
    without the regularized model's creep, so the gate is the standard
    0.03 m."""
    _run(
        _ur10_with_arrangement("wedge", waypoint=(-0.15, -0.3, 0.15),
                               frictionless=False),
    )


@pytest.mark.slow
@pytest.mark.parametrize(
    "leaf,min_disp",
    [
        ("full_dice_point1", None),     # frictional balancing: holds
        ("robust_dice_point1", None),   # frictionless balancing: holds
        ("aligned_dice_point1", None),  # alignment heuristic: holds in-sim
        ("none_dice_point1", 0.02),     # no constraints: dice slip
        ("upward_dice_point1", 0.02),   # level tray: dice slip
    ],
)
def test_freespace_ablation_differential(leaf, min_disp):
    """The RAL23 freespace ablation reproduced in-sim: balancing controllers
    (full/robust) carry the stacked foam dice through the aggressive point1
    motion with millimetre displacement, while the unconstrained baselines
    (none: no tray control at all; upward: tray held level) lose grip —
    the differential the reference's experiment matrix demonstrates
    (ral23/experiments/freespace/{full,robust,aligned,none,upward}).

    Gate calibration: the ablation motions ride exactly at the dice's
    friction-cone edge (that is the experiments' design).  Under this
    f64 CPU run with the stiction plant the baselines SLIP ~2.5 cm (25x
    the balancing controllers' 1 mm); in the recorded TPU sweep
    (docs/ral23_results.md) and on the reference's hardware the same
    leaves fling the die off entirely.  The CPU gate asserts the
    measurable slip differential, the recorded table the fling.

    aligned (the inertial-alignment heuristic) HOLDS the dice in this
    noise-free f64 run (measured 1-2 mm at the production 100 Hz cadence):
    pointing the tray normal along total acceleration drives the required
    friction to ~zero.  But it does so with ZERO margin — under micro-scale
    disturbance (>= 0.001 rad/s commanded-velocity noise, or the bf16-level
    stage-math noise of a TPU run at the "high" matmul default) the same
    leaf DROPS the top die while the balancing controllers hold it: that is
    the reference's hardware ablation result, reproduced in-sim by
    test_aligned_differential_under_noise below and recorded in
    docs/aligned_differential.md."""
    config = copy.deepcopy(
        cfg.load_config(f"configs/ral23/freespace/{leaf}.yaml")
    )
    from mpc_sim import run_closed_loop

    # the 0.02 kg dice need the production 100 Hz replan cadence (the
    # reference's min_policy_update_time): at the test-economy 50 Hz the
    # balancing controllers lose the top die to inter-replan drift
    sim, state, ctrl, _ = run_closed_loop(config, duration=4.0, ctrl_rate=100.0)
    disp = sim.object_displacements(state)
    if min_disp is None:
        assert (disp < 0.03).all(), f"controller slid objects: {disp}"
    else:
        assert disp.max() > min_disp, f"ablated baseline unexpectedly held: {disp}"


@pytest.mark.slow
def test_aligned_differential_under_noise():
    """The RA-L'23 aligned-ablation differential restored in-sim (VERDICT
    r4 item 5, ADVICE r4 item 5): at 0.002 rad/s commanded-velocity
    (process) noise — hardware-scale tracking error — the full balancing
    controller carries the stacked dice with mm displacement while the
    alignment heuristic, which plans at ZERO friction margin, loses the
    top die entirely.  The gate is the RELATIVE ordering with a wide
    margin (not an absolute pin that tracks plant retuning): aligned must
    displace >= 10x full and beyond the half-tray failure threshold.

    The contrast lives at PRODUCTION precision (f32 — what the TPU runs):
    aligned's margin is below f32 rounding scale, full's is ~3x above the
    noise level that defeats aligned.  Under this harness's f64 both
    controllers hold through 0.008 rad/s (scoped r5), so the probe runs
    in an f32 subprocess — the same regime as the recorded study
    (docs/aligned_differential.md) and the recorded ral23 TPU table."""
    import subprocess

    script = (
        "import sys; sys.path.insert(0, 'scripts'); sys.path.insert(0, '.')\n"
        "from aligned_differential_study import run_leaf\n"
        "full = run_leaf('full', 0.002, seed=0, knob='process')\n"
        "aligned = run_leaf('aligned', 0.002, seed=0, knob='process')\n"
        "print(f'RESULT {full} {aligned}')\n"
    )
    import os

    env = dict(os.environ)
    env.update({"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": ""})
    env.pop("JAX_ENABLE_X64", None)
    out = subprocess.run(
        [sys.executable, "-c", script],
        cwd=str(Path(__file__).resolve().parents[1]),
        env=env, capture_output=True, text=True, timeout=1800,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")][0]
    full, aligned = (float(v) for v in line.split()[1:])
    assert full < 0.03, f"full balancing lost the dice under noise: {full}"
    assert aligned > max(0.07, 10.0 * full), (
        f"aligned ablation unexpectedly held: {aligned} (full {full})"
    )


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["robust", "aligned"])
def test_closed_loop_aligned_failure_stack(mode):
    """extra/aligned_failure family: the Thing carries a cardboard box with a
    bottle stacked on top through the aggressive point1 motion, under both
    the balancing (robust) and alignment-only (aligned) controllers.  In the
    reference this is the hardware experiment where the alignment heuristic
    drops the stack; in this sim's friction regime both hold, so the test
    pins that the configs run green end-to-end with the stack in place (the
    failure contrast itself is a hardware-scale result).  Note the robust
    controller trades EE tracking for constraint satisfaction (larger EE
    error), which is the expected qualitative difference."""
    config = copy.deepcopy(cfg.load_config(
        f"configs/ral23/extra/aligned_failure/{mode}_brown_box_bottle_point1.yaml"
    ))
    from mpc_sim import run_closed_loop

    sim, state, ctrl, _ = run_closed_loop(config, duration=4.0, ctrl_rate=50.0)
    disp = sim.object_displacements(state)
    assert (disp < 0.02).all(), f"stack slid: {disp}"
    target_r = np.asarray(ctrl.problem.target.poses[0, :3])
    _, r_ew = sim.ee_pose(state)
    assert np.linalg.norm(r_ew - target_r) < 0.35


@pytest.mark.slow
def test_closed_loop_sudden_obstacle():
    """A controlled obstacle jumps into the path at t=1.0: the planner must
    re-route around it (ral23 sudden_obstacle family)."""
    config = cfg.load_config("configs/ral23/sudden_obstacle/sudden_t1.0.yaml")
    config = copy.deepcopy(config)
    config["simulation"]["duration"] = 4.0
    sim, state, ctrl = _run(config, duration=4.0, ee_tol=0.35)
    # the obstacle actually moved (controlled servo integrated)
    from mpc_sim import run_closed_loop

    obs = run_closed_loop.last_obstacles[0]
    assert np.linalg.norm(obs.position(4.0) - np.array([1.25, 1.5, 0.25])) < 0.05


@pytest.mark.slow
def test_unreachable_target_with_error_clamp():
    """ral23 arm_only regime: the shared point waypoints sit ~2 m outside
    the fixed UR10's workspace.  With ee_error_clamp the arm stretches to
    its envelope and the bottle STAYS (measured 0.005 m); without the clamp
    the unsatisfiable terminal equality winds its multipliers to lam_max
    and the unbounded pull throws the payload (measured ~87 m)."""
    from mpc_sim import run_closed_loop

    config = cfg.load_config(
        cfg.resolve_package_path(
            {"package": "configs",
             "path": "ral23/freespace/full_bottle_arm_only.yaml"}
        )
    )
    assert config["controller"]["ee_error_clamp"] == 0.5
    sim, state, ctrl, logger = run_closed_loop(
        config, duration=5.0, ctrl_rate=100.0
    )
    disp = float(sim.object_displacements(state)[0])
    # under the stiction default (r5) the sustained near-cone pull of the
    # clamped unreachable target is held by static friction — the r4 gate
    # widening (0.02 -> 0.05 m, absorbing regularized creep) is reverted
    # and tightened: the payload must genuinely stay put
    assert disp < 0.02, disp
    # the arm actually moved toward the target (not frozen by the clamp)
    _, r_ew = sim.ee_pose(state)
    d0 = np.asarray(logger.as_arrays()["r_ew_w"][0])
    target_r = np.asarray(ctrl.problem.target.poses[0, :3])
    assert np.linalg.norm(r_ew - target_r) < np.linalg.norm(d0 - target_r) - 0.5
