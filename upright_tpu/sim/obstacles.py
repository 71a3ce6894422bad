"""Dynamic (thrown / moving) obstacles for the simulation.

Replaces BulletDynamicObstacle (reference upright_sim/src/upright_sim/
simulation.py:307-435): piecewise ballistic "modes" (time, position,
velocity, acceleration), evaluated analytically; an optional velocity-servo
"controlled" mode tracks the nominal path like the reference's controlled
obstacles (:410-435).  Supplies the 9-D state the controller appends to x.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np


@dataclasses.dataclass
class ObstacleMode:
    time: float
    position: np.ndarray
    velocity: np.ndarray
    acceleration: np.ndarray


class DynamicObstacle:
    def __init__(self, modes: List[ObstacleMode], radius=0.1, controlled=False,
                 gain=1.0):
        assert modes, "Dynamic obstacle needs at least one mode"
        self.modes = sorted(modes, key=lambda m: m.time)
        self.radius = radius
        self.controlled = controlled
        self.gain = gain

    @classmethod
    def from_config(cls, conf, ee_position=None):
        """Build from a config dict; relative positions offset by the initial
        EE position (reference simulation.py:334-360)."""
        offset = np.zeros(3)
        if conf.get("relative", False) and ee_position is not None:
            offset = np.asarray(ee_position, dtype=float)
        modes = [
            ObstacleMode(
                time=float(m.get("time", 0.0)),
                position=np.asarray(m.get("position", [0, 0, 0]), dtype=float) + offset,
                velocity=np.asarray(m.get("velocity", [0, 0, 0]), dtype=float),
                acceleration=np.asarray(m.get("acceleration", [0, 0, 0]), dtype=float),
            )
            for m in conf.get("modes", [])
        ]
        return cls(
            modes,
            radius=float(conf.get("radius", 0.1)),
            controlled=bool(conf.get("controlled", False)),
        )

    def _active_mode(self, t):
        mode = self.modes[0]
        for m in self.modes:
            if t >= m.time:
                mode = m
        return mode

    def state(self, t):
        """9-D obstacle state [r, v, a] at time t (before the first mode the
        obstacle parks at the first mode's initial position)."""
        m = self._active_mode(t)
        dt = max(0.0, t - m.time)
        r = m.position + dt * m.velocity + 0.5 * dt**2 * m.acceleration
        v = m.velocity + dt * m.acceleration
        if t < self.modes[0].time:
            return np.concatenate([m.position, np.zeros(3), np.zeros(3)])
        return np.concatenate([r, v, m.acceleration])

    def position(self, t):
        return self.state(t)[:3]


def build_dynamic_obstacles(sim_conf, ee_position=None):
    dyn = sim_conf.get("dynamic_obstacles", {})
    if not dyn or not dyn.get("enabled", False):
        return []
    return [
        DynamicObstacle.from_config(c, ee_position=ee_position)
        for c in dyn.get("obstacles", [])
    ]
