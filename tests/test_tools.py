"""Smoke + correctness tests for the portable analysis tools (VERDICT r2
item 8): estimator-tuning playback sweep, inertia calibration (wedge
closed-form check + logged-data fit), and the object-error/solve-time join.
All are fed by one short closed-loop ur10 run logged through DataLogger —
the npz-directory analogue of the reference's rosbag workflow."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

import upright_tpu.config as cfg
from upright_tpu.core.logging import DataLogger


@pytest.fixture(scope="module")
def run_log(tmp_path_factory):
    from mpc_sim import run_closed_loop

    path = cfg.resolve_package_path(
        {"package": "configs", "path": "demos/ur10_demo.yaml"}
    )
    config = cfg.load_config(path)
    logger = DataLogger(timestep=0.02)
    sim, state, ctrl, logger = run_closed_loop(
        config, duration=2.0, ctrl_rate=50.0, log=logger
    )
    root = tmp_path_factory.mktemp("logs")
    run_dir = logger.save(root, config=config, name="run_1")
    return root, run_dir, config


def test_calibrate_wedge_closed_form_vs_monte_carlo():
    from calibrate_inertia import wedge_mode

    J_closed, J_mc = wedge_mode(0.18, 0.206, 0.076, mass=0.09)
    assert np.abs(J_mc - J_closed).max() < 0.01 * np.abs(J_closed).max()


def test_calibrate_inertia_fit_recovers_nominal(run_log):
    from calibrate_inertia import fit_mode

    _, run_dir, config = run_log
    m, c, I_com = fit_mode(run_dir)
    # nominal pink bottle: 0.827 kg
    assert abs(m - 0.827) < 0.05 * 0.827, m
    import upright_tpu.config as cfg_mod

    model, *_ = cfg_mod.parse_control_objects(config["controller"])
    c_nom = np.asarray(model.params[0, 1:4]) / float(model.params[0, 0])
    # lateral CoM is excited by gravity torque -> recovered to ~1e-5 m; the
    # vertical CoM only enters through lateral EE acceleration, which this
    # gentle tracking run barely excites (the tool reports the regressor
    # conditioning) -> gate it loosely
    assert np.abs(c[:2] - c_nom[:2]).max() < 1e-3, (c, c_nom)
    assert abs(c[2] - c_nom[2]) < 0.03, (c, c_nom)


def test_tune_estimator_sweep(run_log, tmp_path):
    import tune_estimator

    root, run_dir, _ = run_log
    out = tmp_path / "est.png"
    argv = sys.argv
    sys.argv = [
        "tune_estimator.py", str(run_dir), "--proc-grid", "1", "100",
        "--meas-grid", "0.001", "--plot", str(out),
    ]
    try:
        tune_estimator.main()
    finally:
        sys.argv = argv
    assert out.exists() and out.stat().st_size > 5_000


def test_obj_err_comp_time_join(run_log, tmp_path):
    import obj_err_comp_time

    root, run_dir, _ = run_log
    row = obj_err_comp_time.analyze_run(run_dir)
    assert row["solve_mean_ms"] > 0
    assert row["obj_err_max_mm"] < 70.0  # bottle stayed on the tray
    csv_out = tmp_path / "join.csv"
    argv = sys.argv
    sys.argv = ["obj_err_comp_time.py", str(root), "--csv", str(csv_out)]
    try:
        obj_err_comp_time.main()
    finally:
        sys.argv = argv
    assert csv_out.exists()
    assert "run_1" in csv_out.read_text()


def test_arrangement_geometry():
    """arch-offsets must reproduce the arrangements.yaml box_arch layout and
    wedge-dims the objects.yaml wedge entry (the tool is how those numbers
    were derived in the reference)."""
    from arrangement_geometry import arch_offsets, wedge_dims

    x1, x2, x3 = arch_offsets([0.103, 0.09, 0.038])
    # configs/arrangements.yaml box_arch offsets: 0.019, 0.084, -0.0325
    assert abs(x1 - 0.019) < 1e-12
    assert abs(x2 - 0.084) < 1e-12
    assert abs(x3 - (-0.0325)) < 1e-12
    # configs/objects.yaml wedge side_lengths z entry
    dims = wedge_dims(15.0, 0.15, 0.15)
    assert abs(dims[2] - 0.0401923788646684) < 1e-12


def test_model_info(capsys):
    from arrangement_geometry import model_info

    import upright_tpu.config as cfg_mod

    path = cfg_mod.resolve_package_path(
        {"package": "configs", "path": "demos/ur10_demo.yaml"}
    )
    prob = model_info(path)
    out = capsys.readouterr().out
    assert "actuated joints (6)" in out
    assert "forces=4" in out
    assert prob.dims.num_contacts == 4
