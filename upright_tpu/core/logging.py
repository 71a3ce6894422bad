"""Data logging + plotting (reference upright_core/src/upright_core/logging.py).

DataLogger: rate-limited in-memory log, saved as a timestamped directory with
``data.npz`` plus the flattened ``config.yaml`` next to it for reproducibility
(reference logging.py:12-69).  DataPlotter: canned matplotlib plot families
(reference logging.py:72-449).
"""

from __future__ import annotations

import datetime
from pathlib import Path

import numpy as np
import yaml


class DataLogger:
    def __init__(self, timestep=0.01):
        self.timestep = timestep
        self.data = {}
        self._last_t = -np.inf

    def ready(self, t):
        """Rate limiter: true when a new sample is due (logging.py:24-31)."""
        if t >= self._last_t + self.timestep - 1e-9:
            self._last_t = t
            return True
        return False

    def append(self, name, value):
        self.data.setdefault(name, []).append(np.asarray(value))

    def append_dict(self, entries: dict):
        for k, v in entries.items():
            self.append(k, v)

    def as_arrays(self):
        return {k: np.asarray(v) for k, v in self.data.items()}

    def save(self, log_dir, config=None, name=None):
        """Save to <log_dir>/<timestamp>/data.npz (+ config.yaml)
        (logging.py:41-69)."""
        stamp = name or datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
        out = Path(log_dir) / stamp
        out.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(out / "data.npz", **self.as_arrays())
        if config is not None:
            with open(out / "config.yaml", "w") as f:
                yaml.safe_dump(_yamlable(config), f)
        return out

    @staticmethod
    def load(path):
        d = np.load(Path(path) / "data.npz")
        return {k: d[k] for k in d.files}


def _yamlable(obj):
    """Recursively convert numpy values for yaml dumping."""
    if isinstance(obj, dict):
        return {k: _yamlable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_yamlable(v) for v in obj]
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    return obj


class DataPlotter:
    """Canned plots of a logged run (reference logging.py:72-449).

    Each panel is built as a dict:
      Y        — solid series (T, k)
      Yd       — optional dashed desired/planned overlay, color-matched to Y
                 (reference plot_ee_position/orientation/cmd_vs_real_vel
                 style: logging.py:89-141, 210-235)
      hlines   — optional (value, label) dashed horizontal overlays (limits,
                 solve-time percentiles)
      margin   — when true the panel is a >=0 constraint margin: draw the
                 zero line and shade the violation region
    ``config`` (the run's saved config.yaml dict) supplies state/input limit
    overlays automatically.
    """

    def __init__(self, data: dict, config: dict = None):
        self.data = data
        self.config = config or {}

    @classmethod
    def from_logger(cls, logger: DataLogger, config: dict = None):
        return cls(logger.as_arrays(), config=config)

    @classmethod
    def from_log_dir(cls, path):
        data = DataLogger.load(path)
        cfg_path = Path(path) / "config.yaml"
        config = None
        if cfg_path.exists():
            with open(cfg_path) as f:
                config = yaml.safe_load(f)
        return cls(data, config=config)

    # -- panel construction ----------------------------------------------

    def _limits(self, kind):
        lim = self.config.get("controller", {}).get("limits", {}).get(kind)
        if not lim:
            return None
        try:
            from upright_tpu.config import parse_array

            lo = np.asarray(parse_array(lim["lower"]), dtype=float)
            hi = np.asarray(parse_array(lim["upper"]), dtype=float)
        except Exception:
            return None  # malformed limits — skip overlays
        return lo, hi

    def build_panels(self):
        d = self.data
        panels = []

        def add(title, Y, Yd=None, hlines=None, margin=False):
            panels.append(
                {
                    "title": title,
                    "Y": np.asarray(Y),
                    "Yd": None if Yd is None else np.asarray(Yd),
                    "hlines": hlines or [],
                    "margin": margin,
                }
            )

        if "x" in d:
            nq = d["x"].shape[1] // 3
            xd = d.get("xd")
            xlim = self._limits("state")
            for name, sl in [
                ("joint positions", slice(0, nq)),
                ("joint velocities", slice(nq, 2 * nq)),
                ("joint accelerations", slice(2 * nq, 3 * nq)),
            ]:
                hl = []
                if xlim is not None and xlim[0].shape[0] >= 3 * nq:
                    lo, hi = xlim[0][sl], xlim[1][sl]
                    hl = [
                        (float(lo.min()), "limit"),
                        (float(hi.max()), None),
                    ]
                add(
                    name,
                    d["x"][:, sl],
                    Yd=None if xd is None else xd[:, sl],
                    hlines=hl,
                )
        if "u" in d:
            ulim = self._limits("input")
            hl = []
            if ulim is not None:
                hl = [
                    (float(ulim[0].min()), "limit"),
                    (float(ulim[1].max()), None),
                ]
            add("inputs (jerk + forces)", d["u"], hlines=hl)
        if "cmd_vel" in d and "x" in d:
            # actual vs commanded joint velocity, color-matched
            nq = d["x"].shape[1] // 3
            nv = d["cmd_vel"].shape[1]
            add(
                "actual vs commanded velocity",
                d["x"][:, nq : nq + nv],
                Yd=d["cmd_vel"],
            )
        if "r_ew_w" in d:
            add("EE position (solid) vs target (dashed)", d["r_ew_w"],
                Yd=d.get("r_ew_w_d"))
        if "Q_we" in d:
            add("EE orientation (solid) vs target (dashed)", d["Q_we"],
                Yd=d.get("Q_we_d"))
        if "v_ew_w" in d:
            Y = d["v_ew_w"]
            if "w_ew_w" in d:
                Y = np.concatenate([Y, d["w_ew_w"]], axis=1)
            add("EE velocity (linear + angular)", Y)
        if "r_ow_w" in d:
            r_ow = np.asarray(d["r_ow_w"])
            for i in range(r_ow.shape[1]):
                add(f"object {i} position", r_ow[:, i])
        if "object_displacement" in d:
            add("object displacement", d["object_displacement"])
        if "solve_time" in d:
            st = np.asarray(d["solve_time"], dtype=float)
            add(
                "solve time [s] (p50/p99 dashed)",
                st,
                hlines=[
                    (float(np.percentile(st, 50)), "p50"),
                    (float(np.percentile(st, 99)), "p99"),
                ],
            )
        if "constraint_eq" in d:
            add("object dynamics constraint residuals", d["constraint_eq"])
        for family, title in [
            ("contact_force_constraints", "contact force (cone) margins"),
            ("state_limits", "state limit margins"),
            ("input_limits", "input limit margins"),
            ("ee_box_constraints", "EE box constraint margins"),
            ("alignment_constraints", "inertial alignment margins"),
            ("collision_pair_distances", "obstacle distance margins"),
            ("projectile_distances", "projectile distance margins"),
        ]:
            if family in d:
                add(title, d[family], margin=True)
        for family, title in [
            ("contact_forces", "contact forces"),
            ("orn_err", "tray normal vs total acceleration [rad]"),
            ("ddC_we_norm", "ddC_we norm"),
            ("cost", "stage cost"),
            ("sa_dist", "distance outside support area"),
        ]:
            if family in d:
                add(title, d[family])
        return panels

    def panel_inventory(self):
        """Titles of every panel plot_all would draw (asserted by
        tests/test_logging_plots.py against the reference family list)."""
        return [p["title"] for p in self.build_panels()]

    # -- rendering --------------------------------------------------------

    def _draw_panel(self, ax, t, p):
        Y = p["Y"].reshape(len(t), -1)
        colors = [f"C{i % 10}" for i in range(Y.shape[1])]
        for i in range(Y.shape[1]):
            ax.plot(t, Y[:, i], color=colors[i], lw=1.0)
        if p["Yd"] is not None:
            Yd = p["Yd"].reshape(len(t), -1)
            for i in range(Yd.shape[1]):
                ax.plot(
                    t, Yd[:, i], color=colors[i % len(colors)],
                    linestyle="--", lw=0.9, alpha=0.8,
                )
        for val, lbl in p["hlines"]:
            ax.axhline(val, color="k", linestyle="--", lw=0.8, alpha=0.6)
            if lbl:
                ax.annotate(
                    lbl, (t[-1], val), fontsize=6, ha="right", va="bottom"
                )
        if p["margin"]:
            ax.axhline(0.0, color="r", lw=0.8)
            lo = float(min(Y.min(), -1e-6))
            ax.axhspan(lo, 0.0, color="r", alpha=0.08)
        ax.set_title(p["title"], fontsize=9)
        ax.grid(True, alpha=0.3)

    def plot_all(self, path=None, show=False):
        import matplotlib

        if not show:
            matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        t = self.data["t"]
        panels = self.build_panels()
        n = len(panels)
        ncols = 2
        nrows = (n + 1) // 2
        fig, axes = plt.subplots(nrows, ncols, figsize=(11, 3 * nrows))
        axes = np.atleast_1d(axes).ravel()
        for ax, p in zip(axes, panels):
            self._draw_panel(ax, t, p)
        for ax in axes[n:]:
            ax.axis("off")
        fig.tight_layout()
        if path:
            fig.savefig(path, dpi=120)
        if show:
            plt.show()
        return fig
