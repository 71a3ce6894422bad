"""Target (reference) trajectories with on-device interpolation.

Replaces ocs2::TargetTrajectories + ReferenceManager
(reference upright_control/include/upright_control/reference_trajectory.h:17-47,
wrappers.py:13-75).  A target is a fixed-size array of timed waypoints
``[r(3), q(4), s(1)]`` (position, xyzw orientation, projectile-avoidance
activation flag); interpolation (linear position, slerp orientation) is a pure
jittable function so it can run inside the solver at every stage time.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np

from upright_tpu.core.math import quat_slerp

TARGET_DIM = 8  # r(3) + quat(4) + s(1)


@flax.struct.dataclass
class TargetTrajectory:
    """Timed EE pose waypoints (fixed shape; pad by repeating the last)."""

    times: jnp.ndarray  # (n_wp,)
    poses: jnp.ndarray  # (n_wp, 8) [r, quat_xyzw, s]

    @staticmethod
    def from_waypoints(waypoints, r0, q0):
        """Build from config waypoint dicts relative to the initial EE pose
        (reference wrappers.py:13-75: positions relative to r0, orientations
        composed in the EE body frame: q = q0 * q_rel, i.e.
        R(q0) @ R(q_rel) — matching quat_multiply(Q_we, orientation))."""
        from upright_tpu.core.math import quat_multiply

        times, poses = [], []
        for wp in waypoints:
            t = float(wp.get("time", 0.0))
            r = np.asarray(r0) + np.asarray(wp.get("position", [0, 0, 0]), dtype=float)
            q_rel = np.asarray(wp.get("orientation", [0, 0, 0, 1]), dtype=float)
            q_rel = q_rel / np.linalg.norm(q_rel)
            q = np.asarray(quat_multiply(jnp.asarray(q0), jnp.asarray(q_rel)))
            s = float(wp.get("projectile_flag", 0.0))
            times.append(t)
            poses.append(np.concatenate([r, q, [s]]))
        return TargetTrajectory(
            times=jnp.asarray(np.asarray(times)),
            poses=jnp.asarray(np.stack(poses)),
        )

    def interpolate(self, t):
        """Desired (r, q, s) at time t: linear in position, slerp in
        orientation, previous-value in s (reference_trajectory.h:20-47)."""
        times, poses = self.times, self.poses
        n = times.shape[0]
        if n == 1:
            p = poses[0]
            return p[:3], p[3:7], p[7]

        idx = jnp.clip(jnp.searchsorted(times, t, side="right") - 1, 0, n - 2)
        t0, t1 = times[idx], times[idx + 1]
        alpha = jnp.where(t1 > t0, (t - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0)
        alpha = jnp.clip(alpha, 0.0, 1.0)

        p0, p1 = poses[idx], poses[idx + 1]
        r = (1.0 - alpha) * p0[:3] + alpha * p1[:3]
        q = quat_slerp(p0[3:7], p1[3:7], alpha)
        s = jnp.where(alpha < 1.0, p0[7], p1[7])
        return r, q, s
