"""Plot/observability parity (VERDICT r2 item 7): the DataPlotter panel
inventory must cover the reference DataPlotter's figure families
(reference upright_core/src/upright_core/logging.py:89-449) with the
reference's overlay conventions — desired-vs-actual dashed overlays,
limit lines, per-constraint margin figures, and a solve-time percentile
panel."""

import numpy as np

from upright_tpu.core.logging import DataLogger, DataPlotter


def full_feature_log(T=40, nq=6):
    rng = np.random.default_rng(0)
    t = np.linspace(0.0, 2.0, T)
    d = {
        "t": t,
        "x": rng.standard_normal((T, 3 * nq)),
        "xd": rng.standard_normal((T, 3 * nq)),
        "u": rng.standard_normal((T, nq + 4)),
        "cmd_vel": rng.standard_normal((T, nq)),
        "r_ew_w": rng.standard_normal((T, 3)),
        "r_ew_w_d": rng.standard_normal((T, 3)),
        "Q_we": rng.standard_normal((T, 4)),
        "Q_we_d": rng.standard_normal((T, 4)),
        "v_ew_w": rng.standard_normal((T, 3)),
        "w_ew_w": rng.standard_normal((T, 3)),
        "r_ow_w": rng.standard_normal((T, 1, 3)),
        "object_displacement": rng.random((T, 1)),
        "solve_time": rng.random(T) * 1e-2,
        "constraint_eq": rng.standard_normal((T, 6)),
        "contact_force_constraints": rng.standard_normal((T, 20)),
        "state_limits": rng.random((T, 36)),
        "input_limits": rng.random((T, 20)),
        "ee_box_constraints": rng.random((T, 6)),
        "alignment_constraints": rng.random((T, 5)),
        "collision_pair_distances": rng.random((T, 3)),
        "projectile_distances": rng.random((T, 2)),
        "contact_forces": rng.random((T, 4)),
        "orn_err": rng.random(T),
        "ddC_we_norm": rng.random(T),
        "cost": rng.random(T),
        "sa_dist": rng.random(T),
    }
    config = {
        "controller": {
            "limits": {
                "state": {
                    "lower": ["-2pi"] * nq + [-2.0] * nq + [-10.0] * nq,
                    "upper": ["2pi"] * nq + [2.0] * nq + [10.0] * nq,
                },
                "input": {"lower": [-80.0] * nq, "upper": [80.0] * nq},
            }
        }
    }
    return d, config


# the reference's plot families (logging.py plot_* methods + the named
# constraint figures its scripts add), mapped to our panel titles
EXPECTED_TITLES = [
    "joint positions",
    "joint velocities",
    "joint accelerations",
    "inputs (jerk + forces)",
    "actual vs commanded velocity",          # plot_cmd_vs_real_vel
    "EE position (solid) vs target (dashed)",  # plot_ee_position
    "EE orientation (solid) vs target (dashed)",  # plot_ee_orientation
    "EE velocity (linear + angular)",        # plot_ee_velocity
    "object 0 position",                     # plot_object_error family
    "object displacement",
    "solve time [s] (p50/p99 dashed)",       # plot_replanning_durations
    "object dynamics constraint residuals",
    "contact force (cone) margins",
    "state limit margins",
    "input limit margins",
    "EE box constraint margins",
    "inertial alignment margins",
    "obstacle distance margins",             # plot_dynamic_obs_dist
    "projectile distance margins",
    "contact forces",
    "tray normal vs total acceleration [rad]",
    "ddC_we norm",
    "stage cost",                            # plot_value_vs_time
    "distance outside support area",
]


def test_panel_inventory_covers_reference_families():
    d, config = full_feature_log()
    inv = DataPlotter(d, config=config).panel_inventory()
    missing = [t for t in EXPECTED_TITLES if t not in inv]
    assert not missing, missing


def test_overlays_limits_margins_percentiles():
    d, config = full_feature_log()
    panels = {p["title"]: p for p in DataPlotter(d, config=config).build_panels()}
    # desired-vs-actual dashed overlays
    for title in [
        "EE position (solid) vs target (dashed)",
        "EE orientation (solid) vs target (dashed)",
        "actual vs commanded velocity",
        "joint positions",
    ]:
        assert panels[title]["Yd"] is not None, title
    # limit overlays (config-parsed, incl. "2pi" literals)
    assert panels["joint positions"]["hlines"]
    assert panels["inputs (jerk + forces)"]["hlines"]
    # solve-time percentiles
    labels = [lbl for _, lbl in panels["solve time [s] (p50/p99 dashed)"]["hlines"]]
    assert labels == ["p50", "p99"]
    # constraint families render as margin figures
    for title in [
        "contact force (cone) margins",
        "state limit margins",
        "obstacle distance margins",
    ]:
        assert panels[title]["margin"], title


def test_plot_all_renders(tmp_path):
    d, config = full_feature_log()
    out = tmp_path / "plots.png"
    fig = DataPlotter(d, config=config).plot_all(path=str(out))
    assert out.exists() and out.stat().st_size > 10_000
    # every panel got an axes
    assert len(fig.axes) >= len(EXPECTED_TITLES)


def test_roundtrip_from_log_dir(tmp_path):
    d, config = full_feature_log()
    logger = DataLogger(timestep=0.0)
    for k, v in d.items():
        logger.data[k] = list(np.asarray(v))
    run_dir = logger.save(tmp_path, config=config)
    plotter = DataPlotter.from_log_dir(run_dir)
    assert plotter.config["controller"]["limits"]["input"]["upper"][0] == 80.0
    inv = plotter.panel_inventory()
    assert "EE position (solid) vs target (dashed)" in inv
