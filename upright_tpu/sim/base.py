"""Base world<->body velocity mappings (reference upright_sim/robot.py:12-86).

The controller plans base coordinates (x, y, yaw) with world-frame
velocities; real mobile bases are commanded in the body frame.  These
mappings convert a commanded velocity between the two conventions, and the
nonholonomic mapping additionally enforces the rolling constraint (zero
lateral base velocity).  All functions are jit-safe and act on the full
joint-velocity vector (first three entries = base).
"""

from __future__ import annotations

import jax.numpy as jnp


def _rotz2(yaw):
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    return jnp.array([[c, -s], [s, c]])


def fixed_forward(q, v):
    return v


def fixed_inverse(q, v):
    return v


def omnidirectional_forward(q, v_body):
    """Body-frame base velocity command -> world frame
    (OmnidirectionalBaseMapping.forward with bodyframe=True)."""
    xy = _rotz2(q[2]) @ v_body[:2]
    return jnp.concatenate([xy, v_body[2:]])


def omnidirectional_inverse(q, v_world):
    xy = _rotz2(q[2]).T @ v_world[:2]
    return jnp.concatenate([xy, v_world[2:]])


def nonholonomic_forward(q, v_body):
    """Unicycle base: zero the lateral component, then rotate to world
    (NonholonomicBaseMapping.forward)."""
    v_body = v_body.at[1].set(0.0)
    xy = _rotz2(q[2]) @ v_body[:2]
    return jnp.concatenate([xy, v_body[2:]])


def nonholonomic_inverse(q, v_world):
    xy = _rotz2(q[2]).T @ v_world[:2]
    out = jnp.concatenate([xy, v_world[2:]])
    return out.at[1].set(0.0)


_MAPPINGS = {
    "fixed": (fixed_forward, fixed_inverse),
    "omnidirectional": (omnidirectional_forward, omnidirectional_inverse),
    "nonholonomic": (nonholonomic_forward, nonholonomic_inverse),
}


def base_mapping(base_type: str):
    """(forward, inverse) velocity mappings for a base type string."""
    try:
        return _MAPPINGS[base_type.lower()]
    except KeyError:
        raise ValueError(f"Unknown base type {base_type!r}") from None
