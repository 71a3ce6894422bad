"""Projectile (thrown-obstacle) estimation and flight state machine.

Replaces the reference's Vicon projectile estimator + the state machine in
the tracking node (upright_ros_interface/src/mrt_node.cpp:23-30, 239-283):
Preflight -> Flight (above activation height, moving) -> Postflight (below
deactivation height).  While in Flight the controller's dynamic-obstacle
state tail gets the ballistic estimate and the target ``s`` flag is set so
the projectile-path constraint activates.
"""

from __future__ import annotations

import dataclasses
from enum import Enum

import numpy as np

from upright_tpu.runtime.estimator import projectile_kf


class FlightPhase(Enum):
    PREFLIGHT = 0
    FLIGHT = 1
    POSTFLIGHT = 2


@dataclasses.dataclass
class ProjectileTracker:
    dt: float
    activation_height: float = 1.0  # above this + upward velocity => Flight
    deactivation_height: float = 0.2  # below this => Postflight
    gravity: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0.0, 0, -9.81])
    )
    nis_gate: float = 9.0  # reject outlier measurements

    def __post_init__(self):
        self.kf = projectile_kf(self.dt, self.gravity)
        self.phase = FlightPhase.PREFLIGHT
        self._initialized = False

    def update(self, r_measured=None):
        """One tick: KF predict (+ gated correct), then phase transitions.

        Returns (obstacle_state(9), s_flag)."""
        if self._initialized:
            self.kf.predict(self.kf.gravity)
        if r_measured is not None:
            r_measured = np.asarray(r_measured, dtype=float)
            if not self._initialized:
                self.kf.x[:3] = r_measured
                self._initialized = True
            elif self.kf.nis(r_measured) < self.nis_gate:
                self.kf.correct(r_measured)

        r, v = self.kf.x[:3], self.kf.x[3:]

        if self.phase == FlightPhase.PREFLIGHT:
            if self._initialized and r[2] > self.activation_height:
                self.phase = FlightPhase.FLIGHT
        elif self.phase == FlightPhase.FLIGHT:
            if r[2] < self.deactivation_height:
                self.phase = FlightPhase.POSTFLIGHT

        s = 1.0 if self.phase == FlightPhase.FLIGHT else 0.0
        obstacle_state = np.concatenate([r, v, self.gravity])
        return obstacle_state, s


def fit_ballistic_motion(times, positions, drag=False):
    """Least-squares fit of ballistic parameters to a position track
    (reference upright_cmd/scripts/projectile/fit_projectile_motion.py).

    Without drag: r(t) = r0 + v0 t + 0.5 g t^2, solved linearly for
    (r0, v0, g_z).  With drag: iterative fit of the drag coefficient in
    v' = g - b |v| v.
    """
    times = np.asarray(times, dtype=float)
    positions = np.asarray(positions, dtype=float)
    t = times - times[0]

    # linear LS per axis: [1, t, t^2/2] @ [r0, v0, a] = r
    Amat = np.stack([np.ones_like(t), t, 0.5 * t**2], axis=1)
    coeffs, *_ = np.linalg.lstsq(Amat, positions, rcond=None)
    r0, v0, a = coeffs
    if not drag:
        return r0, v0, a

    # crude drag estimate from the residual deceleration along the velocity
    g = np.array([0.0, 0, -9.81])
    a_extra = a - g
    v_norm = np.linalg.norm(v0)
    b = float(np.linalg.norm(a_extra) / max(v_norm**2, 1e-9))
    return r0, v0, g, b
