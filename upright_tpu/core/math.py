"""Rotation / quaternion / inertia math as pure JAX functions.

TPU-native re-design of the reference's scalar math layer
(reference: upright_core/src/upright_core/math.py, upright_core/include/upright_core/util.h).
Everything here is a pure function of jnp arrays: differentiable, jittable and
vmappable.  Quaternions use ``xyzw`` ordering (reference QUAT_ORDER = "xyzs",
math.py:6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

NEAR_ZERO = 1e-8


# ---------------------------------------------------------------------------
# basic vector ops
# ---------------------------------------------------------------------------


def unit(x, eps=NEAR_ZERO):
    """Normalize a vector to unit magnitude (differentiable)."""
    return x / jnp.linalg.norm(x)


def skew3(v):
    """Skew-symmetric matrix of a 3-vector (reference util.h:27-36)."""
    x, y, z = v[0], v[1], v[2]
    zero = jnp.zeros_like(x)
    return jnp.array(
        [
            [zero, -z, y],
            [z, zero, -x],
            [-y, x, zero],
        ]
    )


def epsilon_norm(x, eps=NEAR_ZERO):
    """Differentiable norm sqrt(x.x + eps) (reference util.h:16-23)."""
    x = jnp.ravel(x)
    return jnp.sqrt(jnp.dot(x, x) + eps)


def dC_dtt(C_we, angular_vel, angular_acc):
    """Second time-derivative of a rotation matrix (reference util.h:38-50).

    ddC/dt^2 = (S(alpha) + S(omega) S(omega)) C
    """
    S_w = skew3(angular_vel)
    S_a = skew3(angular_acc)
    return (S_a + S_w @ S_w) @ C_we


# ---------------------------------------------------------------------------
# rotations
# ---------------------------------------------------------------------------


def rotx(angle):
    c, s = jnp.cos(angle), jnp.sin(angle)
    one = jnp.ones_like(c)
    zero = jnp.zeros_like(c)
    return jnp.array([[one, zero, zero], [zero, c, -s], [zero, s, c]])


def roty(angle):
    c, s = jnp.cos(angle), jnp.sin(angle)
    one = jnp.ones_like(c)
    zero = jnp.zeros_like(c)
    return jnp.array([[c, zero, s], [zero, one, zero], [-s, zero, c]])


def rotz(angle):
    c, s = jnp.cos(angle), jnp.sin(angle)
    one = jnp.ones_like(c)
    zero = jnp.zeros_like(c)
    return jnp.array([[c, -s, zero], [s, c, zero], [zero, zero, one]])


def rpy_to_rot(rpy):
    """URDF-convention fixed-axis roll-pitch-yaw to rotation matrix: Rz@Ry@Rx."""
    r, p, y = rpy[0], rpy[1], rpy[2]
    return rotz(y) @ roty(p) @ rotx(r)


# ---------------------------------------------------------------------------
# quaternions (xyzw)
# ---------------------------------------------------------------------------


def quat_to_rot(q):
    """Convert quaternion [x, y, z, w] to rotation matrix."""
    q = q / jnp.linalg.norm(q)
    x, y, z, w = q[0], q[1], q[2], q[3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.array(
        [
            [1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)],
            [2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)],
            [2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)],
        ]
    )


def rot_to_quat(C):
    """Convert rotation matrix to quaternion [x, y, z, w].

    Branch-free (jit-safe) Shepperd-style conversion: compute all four
    candidate quaternions and select the best-conditioned one.
    """
    t = jnp.trace(C)
    d = jnp.diagonal(C)

    # candidate 0: w-major
    q0 = jnp.array(
        [C[2, 1] - C[1, 2], C[0, 2] - C[2, 0], C[1, 0] - C[0, 1], 1.0 + t]
    )
    # candidate 1: x-major
    q1 = jnp.array(
        [1.0 + d[0] - d[1] - d[2], C[0, 1] + C[1, 0], C[0, 2] + C[2, 0],
         C[2, 1] - C[1, 2]]
    )
    # candidate 2: y-major
    q2 = jnp.array(
        [C[0, 1] + C[1, 0], 1.0 - d[0] + d[1] - d[2], C[1, 2] + C[2, 1],
         C[0, 2] - C[2, 0]]
    )
    # candidate 3: z-major
    q3 = jnp.array(
        [C[0, 2] + C[2, 0], C[1, 2] + C[2, 1], 1.0 - d[0] - d[1] + d[2],
         C[1, 0] - C[0, 1]]
    )

    # pick by largest corresponding pivot
    pivots = jnp.array([1.0 + t, 1.0 + d[0] - d[1] - d[2],
                        1.0 - d[0] + d[1] - d[2], 1.0 - d[0] - d[1] + d[2]])
    idx = jnp.argmax(pivots)
    q = jax.lax.switch(idx, [lambda: q0, lambda: q1, lambda: q2, lambda: q3])
    q = q / jnp.linalg.norm(q)
    # canonical sign: w >= 0
    return jnp.where(q[3] < 0, -q, q)


def quat_multiply(q0, q1):
    """Hamilton product of two xyzw quaternions (rotation composition)."""
    x0, y0, z0, w0 = q0[0], q0[1], q0[2], q0[3]
    x1, y1, z1, w1 = q1[0], q1[1], q1[2], q1[3]
    return jnp.array(
        [
            w0 * x1 + x0 * w1 + y0 * z1 - z0 * y1,
            w0 * y1 - x0 * z1 + y0 * w1 + z0 * x1,
            w0 * z1 + x0 * y1 - y0 * x1 + z0 * w1,
            w0 * w1 - x0 * x1 - y0 * y1 - z0 * z1,
        ]
    )


def quat_inverse(q):
    """Inverse such that quat_multiply(q, quat_inverse(q)) = [0,0,0,1]."""
    return jnp.array([-q[0], -q[1], -q[2], q[3]])


def quat_rotate(q, r):
    """Rotate point r by quaternion q."""
    return quat_to_rot(q) @ r


def quat_transform(r_ba_a, q_ab, r_cb_b):
    """Rotate r_cb_b by q_ab then translate by r_ba_a."""
    return quat_rotate(q_ab, r_cb_b) + r_ba_a


def quat_angle(q):
    """Scalar rotation angle represented by quaternion q."""
    xyz = q[:3]
    w = q[3]
    return 2.0 * jnp.arctan2(jnp.linalg.norm(xyz), w)


def quat_slerp(q0, q1, alpha):
    """Spherical linear interpolation from q0 (alpha=0) to q1 (alpha=1)."""
    q0 = q0 / jnp.linalg.norm(q0)
    q1 = q1 / jnp.linalg.norm(q1)
    d = jnp.dot(q0, q1)
    # take the short way around
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    d = jnp.clip(d, -1.0, 1.0)
    theta = jnp.arccos(d)
    sin_theta = jnp.sin(theta)
    # fall back to lerp for tiny angles
    use_lerp = sin_theta < 1e-6
    w0 = jnp.where(use_lerp, 1.0 - alpha, jnp.sin((1.0 - alpha) * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    w1 = jnp.where(use_lerp, alpha, jnp.sin(alpha * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    q = w0 * q0 + w1 * q1
    return q / jnp.linalg.norm(q)


def orientation_error(q, qd):
    """SO(3) orientation error used by the EE pose cost.

    Matches OCS2's quaternionDistance (reference end_effector_cost.h uses
    kinematics getOrientationError): err = w_d * xyz - w * xyz_d - xyz_d x xyz
    where q = [xyz, w] is the actual and qd the desired orientation.
    """
    xyz, w = q[:3], q[3]
    xyz_d, w_d = qd[:3], qd[3]
    return w_d * xyz - w * xyz_d - jnp.cross(xyz_d, xyz)


def quat_integrate(q, omega, dt):
    """Integrate quaternion q forward by world-frame angular velocity omega."""
    # dq = exp(0.5 * dt * Omega(omega)) q via axis-angle of rotation increment
    angle = jnp.linalg.norm(omega) * dt
    axis = omega / jnp.maximum(jnp.linalg.norm(omega), 1e-12)
    half = 0.5 * angle
    dq = jnp.concatenate([axis * jnp.sin(half), jnp.array([jnp.cos(half)])])
    q_new = quat_multiply(dq, q)
    return q_new / jnp.linalg.norm(q_new)


# ---------------------------------------------------------------------------
# planes / support areas
# ---------------------------------------------------------------------------


def plane_span(normal):
    """Basis of the plane orthogonal to ``normal``: array S with shape (2, 3)
    such that S @ normal = 0 and rows are orthonormal.

    Deterministic jit-safe construction (reference math.py:163-178 uses
    scipy null_space; here we build the span directly).
    """
    n = normal / jnp.linalg.norm(normal)
    # pick the axis least aligned with n
    a = jnp.where(jnp.abs(n[0]) < 0.9, jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0]))
    t1 = jnp.cross(n, a)
    t1 = t1 / jnp.linalg.norm(t1)
    t2 = jnp.cross(n, t1)
    return jnp.stack([t1, t2])


def inset_vertex(v, inset):
    """Move 2-D vertex v toward the origin by ``inset`` (reference math.py:144-152)."""
    d = jnp.linalg.norm(v)
    return (d - inset) * v / d


# ---------------------------------------------------------------------------
# inertias (host-side helpers; plain numpy semantics but jnp-compatible)
# ---------------------------------------------------------------------------


def cylinder_inertia_matrix(mass, radius, height):
    """Inertia of a z-aligned solid cylinder (reference math.py:106-110)."""
    xx = yy = mass * (3 * radius**2 + height**2) / 12
    zz = 0.5 * mass * radius**2
    return np.diag([xx, yy, zz])


def cuboid_inertia_matrix(mass, side_lengths):
    """Inertia of a rectangular cuboid (reference math.py:113-120)."""
    lx, ly, lz = side_lengths
    xx = ly**2 + lz**2
    yy = lx**2 + lz**2
    zz = lx**2 + ly**2
    return mass * np.diag([xx, yy, zz]) / 12.0


def sphere_inertia_matrix(mass, radius):
    """Inertia of a solid sphere (reference math.py solid_sphere_inertia)."""
    xx = 0.4 * mass * radius**2
    return np.diag([xx, xx, xx])


def wedge_inertia_matrix(mass, side_lengths):
    """Inertia of a right-triangular wedge about its CoM (reference math.py:123-141).

    Returns (D, C): D diagonal inertia in the principal frame, C the rotation
    of the principal frame w.r.t. the object frame, so J = C @ D @ C.T.
    """
    hx, hy, hz = 0.5 * np.asarray(side_lengths)
    J = np.array(
        [
            [hy**2 / 3 + 2 * hz**2 / 9, 0, hx * hz / 9],
            [0, 2 * hx**2 / 9 + 2 * hz**2 / 9, 0],
            [hx * hz / 9, 0, 2 * hx**2 / 9 + hy**2 / 3],
        ]
    )
    d, C = np.linalg.eig(J)
    D = np.diag(d)
    return mass * D, C


# r_tau support-area integrals (legacy ZMP math; reference math.py:28-57)


def equilateral_triangle_inscribed_radius(side_length):
    return side_length / (2 * np.sqrt(3))


def equilateral_triangle_area(side_length):
    return np.sqrt(3) * side_length**2 / 4


def circle_r_tau(radius):
    return 2.0 * radius / 3


def _alpha_rect(w, h):
    d = np.sqrt(h * h + w * w)
    return (w * h * d + w**3 * (np.log(h + d) - np.log(w))) / 12.0


def rectangle_r_tau(w, h):
    return (_alpha_rect(w, h) + _alpha_rect(h, w)) / (w * h)


def equilateral_triangle_r_tau(side_length):
    h = equilateral_triangle_inscribed_radius(side_length)
    theta = np.pi / 3.0
    sec = 1.0 / np.cos(theta)
    tan = np.tan(theta)
    area = equilateral_triangle_area(side_length)
    return h**3 * (tan * sec + np.log(tan + sec)) / area
