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
    """Canned plots of a logged run (reference logging.py:72-449)."""

    def __init__(self, data: dict):
        self.data = data

    @classmethod
    def from_logger(cls, logger: DataLogger):
        return cls(logger.as_arrays())

    def _plot_series(self, ax, t, Y, labels=None, title=""):
        Y = np.atleast_2d(Y.T).T
        for i in range(Y.shape[1]):
            lbl = labels[i] if labels else None
            ax.plot(t, Y[:, i], label=lbl)
        ax.set_title(title)
        ax.grid(True, alpha=0.3)
        if labels:
            ax.legend(fontsize=6)

    def plot_all(self, path=None, show=False):
        import matplotlib

        if not show:
            matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        t = self.data["t"]
        # ~20 canned families, parity with the reference's DataPlotter
        # (logging.py:72-449 + plot_all:333-449): state split, inputs,
        # commanded vs integrated velocity, EE pose/orientation/velocity,
        # per-object error, every named constraint family, contact forces,
        # solver cost/time, alignment diagnostics
        panels = []
        if "x" in self.data:
            nq = self.data["x"].shape[1] // 3
            panels.append(("joint positions", self.data["x"][:, :nq]))
            panels.append(("joint velocities", self.data["x"][:, nq : 2 * nq]))
            panels.append(("joint accelerations", self.data["x"][:, 2 * nq : 3 * nq]))
        if "u" in self.data:
            panels.append(("inputs (jerk + forces)", self.data["u"]))
        if "cmd_vel" in self.data:
            panels.append(("commanded velocities", self.data["cmd_vel"]))
        if "r_ew_w" in self.data:
            panels.append(("EE position", self.data["r_ew_w"]))
        if "Q_we" in self.data:
            panels.append(("EE orientation (quat)", self.data["Q_we"]))
        if "v_ew_w" in self.data:
            panels.append(("EE velocity", self.data["v_ew_w"]))
        if "r_ow_w" in self.data:
            r_ow = np.asarray(self.data["r_ow_w"])
            for i in range(r_ow.shape[1]):
                panels.append((f"object {i} position", r_ow[:, i]))
        if "object_displacement" in self.data:
            panels.append(("object displacement", self.data["object_displacement"]))
        if "solve_time" in self.data:
            panels.append(("solve time [s]", self.data["solve_time"]))
        if "constraint_eq" in self.data:
            panels.append(("object dynamics constraints", self.data["constraint_eq"]))
        for family, title in [
            ("contact_force_constraints", "contact force (cone) constraints"),
            ("state_limits", "state limit margins"),
            ("input_limits", "input limit margins"),
            ("ee_box_constraints", "EE box constraint margins"),
            ("alignment_constraints", "inertial alignment constraints"),
            ("collision_pair_distances", "obstacle distances"),
            ("projectile_distances", "projectile distances"),
            ("contact_forces", "contact forces"),
            ("orn_err", "tray normal vs total acceleration [rad]"),
            ("ddC_we_norm", "ddC_we norm"),
            ("cost", "stage cost"),
            ("sa_dist", "distance outside support area"),
        ]:
            if family in self.data:
                panels.append((title, self.data[family]))

        n = len(panels)
        ncols = 2
        nrows = (n + 1) // 2
        fig, axes = plt.subplots(nrows, ncols, figsize=(11, 3 * nrows))
        axes = np.atleast_1d(axes).ravel()
        for ax, (title, Y) in zip(axes, panels):
            self._plot_series(ax, t, np.asarray(Y).reshape(len(t), -1), title=title)
        for ax in axes[n:]:
            ax.axis("off")
        fig.tight_layout()
        if path:
            fig.savefig(path, dpi=120)
        if show:
            plt.show()
        return fig
