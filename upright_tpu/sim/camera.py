"""Scene rendering: cameras, photos, video frames.

Replaces the reference's PyBullet camera/video pipeline
(upright_sim/src/upright_sim/camera.py:7-135) with a dependency-free
matplotlib 3-D renderer: robot chain as a polyline, tray as a patch, objects
as boxes/cylinders, obstacles as spheres.  Config-driven camera placement
mirrors the reference (target/position, relative placement, or
target/distance/orientation; simulation.yaml `cameras`/`video` blocks).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional

import numpy as np


@dataclasses.dataclass
class Camera:
    """A viewpoint (reference camera.py Camera.from_config)."""

    target: np.ndarray
    position: Optional[np.ndarray] = None
    distance: Optional[float] = None
    pitch: float = -30.0  # degrees
    yaw: float = 45.0

    @classmethod
    def from_config(cls, conf, r_ew_w=None):
        if "relative_target" in conf or "relative_position" in conf:
            base = np.zeros(3) if r_ew_w is None else np.asarray(r_ew_w)
            target = base + np.asarray(conf.get("relative_target", [0, 0, 0]), dtype=float)
            position = base + np.asarray(conf.get("relative_position", [1, 1, 1]), dtype=float)
            return cls(target=target, position=position)
        target = np.asarray(conf.get("target", [0, 0, 0]), dtype=float)
        if "position" in conf:
            return cls(target=target, position=np.asarray(conf["position"], dtype=float))
        return cls(
            target=target,
            distance=float(conf.get("distance", 2.0)),
            pitch=float(conf.get("pitch", -30.0)),
            yaw=float(conf.get("yaw", 45.0)),
        )

    def view_angles(self):
        """(elev, azim) for matplotlib."""
        if self.position is not None:
            d = self.position - self.target
            azim = np.degrees(np.arctan2(d[1], d[0]))
            elev = np.degrees(np.arctan2(d[2], np.linalg.norm(d[:2])))
            return elev, azim
        return -self.pitch, self.yaw


class SceneRenderer:
    """Render UprightSimulation states to images."""

    def __init__(self, sim, camera: Optional[Camera] = None, figsize=(6, 6)):
        self.sim = sim
        self.camera = camera or Camera(target=np.array([0.0, 0.5, 1.0]), distance=2.5)
        self.figsize = figsize

    def render(self, state, path=None, obstacles=None, t=None):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=self.figsize)
        ax = fig.add_subplot(projection="3d")

        # robot chain polyline
        import jax.numpy as jnp

        P = np.asarray(self.sim.robot.link_positions(jnp.asarray(state.q)))
        ax.plot(P[:, 0], P[:, 1], P[:, 2], "o-", color="tab:blue", lw=3, ms=4)

        # tray patch
        R_we, r_ew = self.sim.ee_pose(state)
        half = 0.5 * 0.285
        corners_local = np.array(
            [[half, half, 0], [-half, half, 0], [-half, -half, 0], [half, -half, 0], [half, half, 0]]
        )
        corners = r_ew + corners_local @ R_we.T
        ax.plot(corners[:, 0], corners[:, 1], corners[:, 2], color="saddlebrown", lw=2)

        # objects as vertical line + marker at CoM
        if self.sim.n_obj:
            r_obj, _q = self.sim.object_poses(state)
            ax.scatter(r_obj[:, 0], r_obj[:, 1], r_obj[:, 2], color="crimson", s=60)

        # obstacles
        if obstacles:
            for obs in obstacles:
                r = obs.position(t or float(state.t))
                ax.scatter([r[0]], [r[1]], [r[2]], color="black", s=200, alpha=0.6)

        elev, azim = self.camera.view_angles()
        ax.view_init(elev=elev, azim=azim)
        tgt = self.camera.target
        span = self.camera.distance or 2.0
        ax.set_xlim(tgt[0] - span, tgt[0] + span)
        ax.set_ylim(tgt[1] - span, tgt[1] + span)
        ax.set_zlim(max(0, tgt[2] - span), tgt[2] + span)
        ax.set_xlabel("x")
        ax.set_ylabel("y")
        if t is not None:
            ax.set_title(f"t = {t:.2f} s")

        if path:
            fig.savefig(path, dpi=100)
            plt.close(fig)
            return path
        return fig


class VideoRecorder:
    """Frame-dump video recorder (reference camera.py VideoRecorder):
    saves numbered PNG frames at a fixed timestep; assemble with ffmpeg or
    view as a sequence."""

    def __init__(self, renderer: SceneRenderer, directory, timestep=0.04):
        self.renderer = renderer
        self.directory = Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)
        self.timestep = timestep
        self._last_t = -np.inf
        self._count = 0

    def maybe_capture(self, state, t, obstacles=None):
        if t >= self._last_t + self.timestep - 1e-9:
            self._last_t = t
            path = self.directory / f"frame_{self._count:05d}.png"
            self.renderer.render(state, path=path, obstacles=obstacles, t=t)
            self._count += 1
            return path
        return None
