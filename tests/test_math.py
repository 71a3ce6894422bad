"""Golden-value tests for upright_tpu.core.math.

Mirrors the reference test strategy (upright_core/tests/test_math.py) plus
extra checks on the jit/grad-safety of the rotation utilities.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upright_tpu.core import math as m


def random_quat(rng):
    q = rng.standard_normal(4)
    return q / np.linalg.norm(q)


def test_skew3():
    v = jnp.array([1.0, 2.0, 3.0])
    S = m.skew3(v)
    assert np.allclose(S, -S.T)
    w = jnp.array([-0.5, 0.7, 2.0])
    assert np.allclose(S @ w, np.cross(np.array(v), np.array(w)))


def test_rot_elementary():
    a = 0.3
    assert np.allclose(m.rotx(a) @ m.rotx(-a), np.eye(3), atol=1e-12)
    # rotz(90deg) maps x -> y
    assert np.allclose(m.rotz(np.pi / 2) @ jnp.array([1.0, 0, 0]), [0, 1, 0], atol=1e-12)
    assert np.allclose(m.rotx(np.pi / 2) @ jnp.array([0, 1.0, 0]), [0, 0, 1], atol=1e-12)
    assert np.allclose(m.roty(np.pi / 2) @ jnp.array([0, 0, 1.0]), [1, 0, 0], atol=1e-12)


def test_quat_rot_round_trip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        q = random_quat(rng)
        C = m.quat_to_rot(jnp.asarray(q))
        # valid rotation
        assert np.allclose(C @ C.T, np.eye(3), atol=1e-12)
        assert np.isclose(np.linalg.det(C), 1.0)
        q2 = m.rot_to_quat(C)
        # q and -q are the same rotation
        assert np.allclose(q, q2, atol=1e-8) or np.allclose(q, -np.asarray(q2), atol=1e-8)


def test_rot_to_quat_near_identity_and_pi():
    # identity
    q = m.rot_to_quat(jnp.eye(3))
    assert np.allclose(q, [0, 0, 0, 1], atol=1e-12)
    # 180-degree rotations exercise the non-w-major branches
    for axis in np.eye(3):
        C = m.quat_to_rot(jnp.concatenate([jnp.asarray(axis), jnp.zeros(1)]))
        q = m.rot_to_quat(C)
        C2 = m.quat_to_rot(q)
        assert np.allclose(C, C2, atol=1e-10)


def test_quat_multiply_matches_rotation_composition():
    rng = np.random.default_rng(1)
    q0, q1 = random_quat(rng), random_quat(rng)
    q01 = m.quat_multiply(jnp.asarray(q0), jnp.asarray(q1))
    C01 = m.quat_to_rot(q01)
    C_expected = np.asarray(m.quat_to_rot(jnp.asarray(q0))) @ np.asarray(
        m.quat_to_rot(jnp.asarray(q1))
    )
    assert np.allclose(C01, C_expected, atol=1e-12)


def test_quat_inverse():
    rng = np.random.default_rng(2)
    q = random_quat(rng)
    qi = m.quat_inverse(jnp.asarray(q))
    prod = m.quat_multiply(jnp.asarray(q), qi)
    assert np.allclose(prod, [0, 0, 0, 1], atol=1e-12)


def test_quat_angle():
    axis = np.array([0, 0, 1.0])
    for angle in [0.1, 0.5, 1.5, 3.0]:
        q = np.concatenate([axis * np.sin(angle / 2), [np.cos(angle / 2)]])
        assert np.isclose(m.quat_angle(jnp.asarray(q)), angle)


def test_quat_rotate_transform():
    rng = np.random.default_rng(3)
    q = random_quat(rng)
    r = rng.standard_normal(3)
    assert np.allclose(
        m.quat_rotate(jnp.asarray(q), jnp.asarray(r)),
        np.asarray(m.quat_to_rot(jnp.asarray(q))) @ r,
    )
    t = rng.standard_normal(3)
    assert np.allclose(
        m.quat_transform(jnp.asarray(t), jnp.asarray(q), jnp.asarray(r)),
        np.asarray(m.quat_to_rot(jnp.asarray(q))) @ r + t,
    )


def test_quat_slerp_endpoints_and_midpoint():
    q0 = np.array([0, 0, 0, 1.0])
    angle = np.pi / 2
    q1 = np.array([0, 0, np.sin(angle / 2), np.cos(angle / 2)])
    assert np.allclose(m.quat_slerp(jnp.asarray(q0), jnp.asarray(q1), 0.0), q0, atol=1e-12)
    assert np.allclose(m.quat_slerp(jnp.asarray(q0), jnp.asarray(q1), 1.0), q1, atol=1e-12)
    mid = m.quat_slerp(jnp.asarray(q0), jnp.asarray(q1), 0.5)
    assert np.isclose(m.quat_angle(mid), angle / 2)


def test_quat_integrate():
    q = jnp.array([0.0, 0, 0, 1])
    omega = jnp.array([0.0, 0, 1.0])  # 1 rad/s about z
    dt = 0.1
    q2 = q
    for _ in range(10):
        q2 = m.quat_integrate(q2, omega, dt)
    assert np.isclose(m.quat_angle(q2), 1.0, atol=1e-6)


def test_dC_dtt_vs_autodiff():
    """ddC/dt^2 formula vs exact autodiff of an analytic rotation trajectory.

    For C(t) with Cdot = S(w) C one has Cddot = (S(alpha) + S(w)^2) C, which
    is exactly the dC_dtt formula; extract w and alpha at t=0 from the
    autodiff derivatives and compare.
    """

    def C_of_t(t):
        # smooth analytic trajectory with nonzero angular acceleration
        return m.rotz(0.3 + 0.7 * t + 0.4 * t**2) @ m.roty(-0.2 + 1.1 * t - 0.3 * t**2) @ m.rotx(0.5 - 0.6 * t + 0.2 * t**2)

    dC_fn = jax.jacfwd(C_of_t)
    ddC_fn = jax.jacfwd(dC_fn)

    t0 = 0.0
    C = C_of_t(t0)
    dC = dC_fn(t0)
    ddC_exact = ddC_fn(t0)

    S_w = dC @ C.T
    w = jnp.array([S_w[2, 1], S_w[0, 2], S_w[1, 0]])
    S_a = ddC_exact @ C.T - S_w @ S_w  # S(alpha) = Cddot C^T - S(w)S(w)
    alpha = jnp.array([S_a[2, 1], S_a[0, 2], S_a[1, 0]])

    ddC = m.dC_dtt(C, w, alpha)
    assert np.allclose(ddC, ddC_exact, atol=1e-10)


def test_plane_span():
    rng = np.random.default_rng(5)
    for _ in range(10):
        n = rng.standard_normal(3)
        n /= np.linalg.norm(n)
        S = m.plane_span(jnp.asarray(n))
        assert S.shape == (2, 3)
        assert np.allclose(S @ n, 0, atol=1e-12)
        assert np.allclose(S @ S.T, np.eye(2), atol=1e-12)


def test_inset_vertex():
    v = jnp.array([3.0, 4.0])
    out = m.inset_vertex(v, 1.0)
    assert np.isclose(np.linalg.norm(out), 4.0)
    assert np.allclose(out / np.linalg.norm(out), np.array(v) / 5.0)


def test_inertia_matrices():
    # cylinder
    I = m.cylinder_inertia_matrix(2.0, 0.5, 1.0)
    assert np.isclose(I[2, 2], 0.5 * 2.0 * 0.25)
    assert np.isclose(I[0, 0], 2.0 * (3 * 0.25 + 1.0) / 12)
    # cuboid
    I = m.cuboid_inertia_matrix(3.0, [1.0, 2.0, 3.0])
    assert np.isclose(I[0, 0], 3.0 * (4 + 9) / 12)
    assert np.isclose(I[1, 1], 3.0 * (1 + 9) / 12)
    assert np.isclose(I[2, 2], 3.0 * (1 + 4) / 12)
    # wedge reconstruction is symmetric PSD
    D, C = m.wedge_inertia_matrix(1.0, [0.2, 0.2, 0.1])
    J = C @ D @ C.T
    assert np.allclose(J, J.T)
    assert (np.linalg.eigvalsh(J) > 0).all()


def test_epsilon_norm_grad_at_zero():
    g = jax.grad(lambda x: m.epsilon_norm(x, 1e-8))(jnp.zeros(3))
    assert np.all(np.isfinite(g))


def test_jit_safety():
    """Rotation utilities must be jittable."""
    f = jax.jit(lambda q: m.rot_to_quat(m.quat_to_rot(q)))
    q = jnp.array([0.1, 0.2, 0.3, 0.9])
    q = q / jnp.linalg.norm(q)
    assert np.allclose(f(q), q, atol=1e-8)


def test_r_tau():
    assert np.isclose(m.circle_r_tau(0.3), 0.2)
    # r_tau of a square of side 2a equals known closed form
    w = 2.0
    val = m.rectangle_r_tau(w, w)
    assert 0 < val < w  # sanity: mean distance less than side
