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

    # light direction for the Lambert face shading (world frame, normalized)
    LIGHT = np.array([0.4, -0.3, 0.85]) / np.linalg.norm([0.4, -0.3, 0.85])

    def _solid(self, ax, verts_world, base_color, alpha=1.0):
        """Draw a convex solid with occluded, Lambert-shaded faces.

        Faces come from the convex hull of the world-frame vertices;
        Poly3DCollection's painter-style z-sorting provides the occlusion
        (the fidelity upgrade over the round-2 wireframes; reference uses
        PyBullet's rasterizer, camera.py:61-99)."""
        from matplotlib.colors import to_rgb
        from mpl_toolkits.mplot3d.art3d import Poly3DCollection
        from scipy.spatial import ConvexHull

        hull = ConvexHull(verts_world)
        tris = verts_world[hull.simplices]  # (n_f, 3, 3)
        n = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
        n = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
        lam = 0.45 + 0.55 * np.abs(n @ self.LIGHT)
        rgb = np.asarray(to_rgb(base_color))
        colors = np.clip(lam[:, None] * rgb[None, :], 0, 1)
        ax.add_collection3d(
            Poly3DCollection(
                tris, facecolors=colors, edgecolors="none", alpha=alpha,
                zsort="average",
            )
        )

    @staticmethod
    def _sphere_verts(center, radius, n=12):
        u = np.linspace(0, 2 * np.pi, n, endpoint=False)
        v = np.linspace(0.0, np.pi, n // 2 + 1)[1:-1]
        pts = [np.array([0, 0, radius]), np.array([0, 0, -radius])]
        for vi in v:
            for ui in u:
                pts.append(
                    radius
                    * np.array(
                        [np.sin(vi) * np.cos(ui), np.sin(vi) * np.sin(ui), np.cos(vi)]
                    )
                )
        return np.asarray(center) + np.asarray(pts)

    def render(self, state, path=None, obstacles=None, t=None):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=self.figsize)
        ax = fig.add_subplot(projection="3d")

        # robot chain: polyline + joint spheres (URDF visual meshes were
        # deliberately dissolved; the chain itself is the visual)
        import jax.numpy as jnp

        P = np.asarray(self.sim.robot.link_positions(jnp.asarray(state.q)))
        ax.plot(P[:, 0], P[:, 1], P[:, 2], "-", color="tab:blue", lw=4)
        ax.scatter(P[:, 0], P[:, 1], P[:, 2], color="tab:blue", s=30)

        # tray as a thin solid box
        R_we, r_ew = self.sim.ee_pose(state)
        half = 0.5 * 0.285
        box = np.array(
            [
                [sx * half, sy * half, z]
                for sx in (-1, 1)
                for sy in (-1, 1)
                for z in (-0.02, 0.0)
            ]
        )
        self._solid(ax, r_ew + box @ R_we.T, "saddlebrown")

        # balanced objects: true contact polyhedra, solid + shaded
        if self.sim.n_obj:
            from upright_tpu.core.math import quat_to_rot

            r_obj, q_obj = self.sim.object_poses(state)
            for i, spec in enumerate(self.sim.specs):
                R_o = np.asarray(quat_to_rot(jnp.asarray(q_obj[i])))
                V = np.asarray(spec.vertices_local)
                self._solid(ax, r_obj[i] + V @ R_o.T, "crimson", alpha=0.95)

        # obstacles as shaded spheres
        if obstacles:
            for obs in obstacles:
                r = obs.position(t or float(state.t))
                radius = float(getattr(obs, "radius", 0.1) or 0.1)
                self._solid(
                    ax, self._sphere_verts(r, radius), "dimgray", alpha=0.9
                )

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
    """Video recorder (reference camera.py VideoRecorder): saves numbered
    PNG frames at a fixed timestep and encodes them into an animated GIF
    with ``save()`` (Pillow; this environment ships no ffmpeg — the PNG
    sequence also remains on disk for external encoders)."""

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

    def save(self, path=None, fps=None):
        """Encode the captured frames into an animated GIF."""
        from PIL import Image

        frames = sorted(self.directory.glob("frame_*.png"))
        if not frames:
            raise ValueError(f"no frames captured in {self.directory}")
        path = Path(path) if path else self.directory / "video.gif"
        fps = fps or 1.0 / self.timestep
        imgs = [Image.open(f).convert("P") for f in frames]
        imgs[0].save(
            path, save_all=True, append_images=imgs[1:],
            duration=int(1000 / fps), loop=0,
        )
        return path
