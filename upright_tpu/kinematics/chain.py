"""Differentiable serial kinematic chain in JAX.

Replaces the reference's Pinocchio + CppAD-codegen end-effector kinematics
(upright_control/include/upright_control/util.h:16-66,
ocs2::PinocchioEndEffectorKinematicsCppAd usage in controller_interface.cpp:230).

Design: a chain is a *static* sequence of joint descriptors (fixed transform
followed by an optional actuated revolute/prismatic joint).  The forward pass
propagates pose, classical velocity, and classical acceleration of the frame
origin in world coordinates in one sweep — a pure function of (q, v, a) that
JAX differentiates and vmaps; XLA unrolls the ~10-joint loop into straight-line
code, so no codegen machinery is needed.

Locked joints (reference util.h:44-56 buildReducedModel) are folded into the
fixed transforms at construction time.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

# joint type codes
FIXED = "fixed"
REVOLUTE = "revolute"
PRISMATIC = "prismatic"


@dataclasses.dataclass(frozen=True)
class Joint:
    """One link of the chain: fixed transform (R_fix, t_fix) from the parent
    frame, then an actuated DOF about/along ``axis`` (in the post-transform
    frame).  ``kind == FIXED`` means no DOF."""

    name: str
    kind: str
    R_fix: np.ndarray  # (3,3)
    t_fix: np.ndarray  # (3,)
    axis: Optional[np.ndarray] = None  # (3,), unit

    def __post_init__(self):
        object.__setattr__(self, "R_fix", np.asarray(self.R_fix, dtype=float))
        object.__setattr__(self, "t_fix", np.asarray(self.t_fix, dtype=float))
        if self.axis is not None:
            a = np.asarray(self.axis, dtype=float)
            object.__setattr__(self, "axis", a / np.linalg.norm(a))


def _axis_rotation(axis, angle):
    """Rodrigues rotation about a constant unit axis (trace-time constant)."""
    ax = jnp.asarray(axis)
    K = jnp.array(
        [
            [0.0, -ax[2], ax[1]],
            [ax[2], 0.0, -ax[0]],
            [-ax[1], ax[0], 0.0],
        ]
    )
    s, c = jnp.sin(angle), jnp.cos(angle)
    return jnp.eye(3) + s * K + (1.0 - c) * (K @ K)


@dataclasses.dataclass(frozen=True)
class FrameMotion:
    """World-frame motion of a chain frame."""

    R: jnp.ndarray  # (3,3) world<-frame
    p: jnp.ndarray  # (3,) origin position
    v: jnp.ndarray  # (3,) linear velocity of origin
    w: jnp.ndarray  # (3,) angular velocity
    a: jnp.ndarray  # (3,) classical linear acceleration of origin
    al: jnp.ndarray  # (3,) angular acceleration


class KinematicChain:
    """Serial chain with a flat actuated-DOF vector.

    The number of actuated joints defines len(q); FIXED entries consume no
    coordinates.  All methods are pure functions of jnp arrays.
    """

    def __init__(self, joints: Sequence[Joint]):
        self.joints = tuple(joints)
        self.dof_names = [j.name for j in self.joints if j.kind != FIXED]
        self.nq = len(self.dof_names)

    # -- construction helpers -------------------------------------------

    def lock_joints(self, locked: dict) -> "KinematicChain":
        """Fold fixed values for named joints into the chain
        (reference util.h:44-56)."""
        new_joints = []
        for j in self.joints:
            if j.name in locked:
                qv = float(locked[j.name])
                if j.kind == REVOLUTE:
                    R = j.R_fix @ np.asarray(_axis_rotation(j.axis, qv))
                    new_joints.append(Joint(j.name, FIXED, R, j.t_fix))
                elif j.kind == PRISMATIC:
                    t = j.t_fix + j.R_fix @ (j.axis * qv)
                    new_joints.append(Joint(j.name, FIXED, j.R_fix, t))
                else:
                    new_joints.append(j)
            else:
                new_joints.append(j)
        return KinematicChain(new_joints)

    # -- forward propagation --------------------------------------------

    def _propagate(self, q, v, a, upto=None):
        """Sweep the chain, returning FrameMotion per joint frame.

        q, v, a: (nq,) actuated positions / velocities / accelerations.
        """
        R = jnp.eye(3)
        p = jnp.zeros(3)
        vel = jnp.zeros(3)
        w = jnp.zeros(3)
        acc = jnp.zeros(3)
        al = jnp.zeros(3)

        frames = []
        k = 0  # actuated index
        for j in self.joints:
            # rigid extension by the fixed transform
            r = R @ jnp.asarray(j.t_fix)
            p = p + r
            vel = vel + jnp.cross(w, r)
            acc = acc + jnp.cross(al, r) + jnp.cross(w, jnp.cross(w, r))
            R = R @ jnp.asarray(j.R_fix)

            if j.kind == REVOLUTE:
                world_axis = R @ jnp.asarray(j.axis)
                R = R @ _axis_rotation(j.axis, q[k])
                al = al + world_axis * a[k] + jnp.cross(w, world_axis * v[k])
                w = w + world_axis * v[k]
                k += 1
            elif j.kind == PRISMATIC:
                world_axis = R @ jnp.asarray(j.axis)
                d = world_axis * q[k]
                p = p + d
                vel = vel + jnp.cross(w, d) + world_axis * v[k]
                acc = (
                    acc
                    + jnp.cross(al, d)
                    + jnp.cross(w, jnp.cross(w, d))
                    + 2.0 * jnp.cross(w, world_axis * v[k])
                    + world_axis * a[k]
                )
                k += 1

            frames.append(FrameMotion(R=R, p=p, v=vel, w=w, a=acc, al=al))
            if upto is not None and j.name == upto:
                break
        return frames

    def ee_motion(self, q, v=None, a=None) -> FrameMotion:
        """Pose/velocity/acceleration of the final (tool) frame."""
        if v is None:
            v = jnp.zeros_like(q)
        if a is None:
            a = jnp.zeros_like(q)
        return self._propagate(q, v, a)[-1]

    def forward(self, q) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """EE pose only: (R, p)."""
        f = self.ee_motion(q)
        return f.R, f.p

    def frame_motion(self, name, q, v=None, a=None) -> FrameMotion:
        """Motion of a named joint frame."""
        if v is None:
            v = jnp.zeros_like(q)
        if a is None:
            a = jnp.zeros_like(q)
        frames = self._propagate(q, v, a, upto=name)
        names = [j.name for j in self.joints[: len(frames)]]
        return frames[names.index(name)]

    def link_positions(self, q) -> jnp.ndarray:
        """Positions of every joint frame origin, (n_joints, 3).

        Used by the collision-avoidance constraints (analytic sphere
        distances replace the reference's HPP-FCL pairs)."""
        frames = self._propagate(q, jnp.zeros_like(q), jnp.zeros_like(q))
        return jnp.stack([f.p for f in frames])

    @property
    def joint_names(self):
        return [j.name for j in self.joints]
