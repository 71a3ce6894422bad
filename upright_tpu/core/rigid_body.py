"""Rigid-body inertial parameterization.

Reference: upright_core/include/upright_core/rigid_body.h.  A balanced object
is summarized by the 10-vector ``[m, m*c, vech(I)]`` (mass, mass-weighted CoM,
half-vectorized inertia about the CoM, all expressed in the end-effector
frame).  These enter the OCP as runtime parameters, which is what makes the
robust (scenario) variant a pure batch axis.
"""

from __future__ import annotations

import jax.numpy as jnp


def vech3(I):
    """Half-vectorization of a symmetric 3x3 matrix (rigid_body.h:11-18)."""
    return jnp.stack([I[0, 0], I[0, 1], I[0, 2], I[1, 1], I[1, 2], I[2, 2]])


def unvech3(v):
    """Inverse of :func:`vech3` (rigid_body.h:20-25)."""
    return jnp.array(
        [
            [v[0], v[1], v[2]],
            [v[1], v[3], v[4]],
            [v[2], v[4], v[5]],
        ]
    )


def body_to_params(mass, com, inertia):
    """Pack (m, com, I) into the 10-parameter vector (rigid_body.h:44-48)."""
    return jnp.concatenate([jnp.atleast_1d(mass), mass * com, vech3(inertia)])


def params_to_body(p):
    """Unpack the 10-parameter vector into (mass, com, inertia)
    (rigid_body.h:36-42)."""
    mass = p[0]
    com = p[1:4] / mass
    inertia = unvech3(p[4:10])
    return mass, com, inertia
