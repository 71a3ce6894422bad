"""Tests for the differentiable kinematic chain.

The key correctness property: the propagated velocity/acceleration of the EE
frame equal the exact time-derivatives of the propagated pose along the
triple-integrator trajectory q(t) = q0 + v0 t + a0 t^2/2.  Verified with
jax.jacfwd (exact autodiff), which plays the role of the reference's
Pinocchio-vs-PyBullet agreement check (planning_sim_loop.py:102-106).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upright_tpu.kinematics.robot import build_robot_model


@pytest.fixture(scope="module")
def thing():
    return build_robot_model({"base_type": "omnidirectional"})


@pytest.fixture(scope="module")
def ur10():
    return build_robot_model(
        {
            "base_type": "fixed",
            "base_pose": [-1.0, 1.0, 0.0],
        }
    )


def test_dof_counts(thing, ur10):
    assert thing.nq == 9
    assert thing.nx == 27
    assert ur10.nq == 6
    assert ur10.nx == 18


def test_base_motion_passthrough(thing):
    """Base translation moves the EE one-to-one; arm at zero."""
    q = jnp.zeros(9)
    _, p0 = thing.ee_pose(q)
    q1 = q.at[0].set(0.5).at[1].set(-0.25)
    _, p1 = thing.ee_pose(q1)
    assert np.allclose(np.asarray(p1 - p0), [0.5, -0.25, 0.0], atol=1e-12)


def test_base_yaw_rotates_ee(thing):
    q = jnp.zeros(9).at[2].set(np.pi / 2)
    R, p = thing.ee_pose(q)
    R0, p0 = thing.ee_pose(jnp.zeros(9))
    # yaw by 90 deg about origin maps (x, y) -> (-y, x)
    assert np.allclose(p, [-p0[1], p0[0], p0[2]], atol=1e-10)
    Rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    assert np.allclose(R, Rz @ np.asarray(R0), atol=1e-10)


def test_fixed_base_equals_locked_omni(ur10, thing):
    """Fixed-base chain == omnidirectional chain with base joints locked
    (reference util.h:31-56)."""
    locked = build_robot_model(
        {
            "base_type": "omnidirectional",
        }
    )
    q_arm = jnp.asarray(np.random.default_rng(0).standard_normal(6))
    q_full = jnp.concatenate([jnp.array([-1.0, 1.0, 0.0]), q_arm])
    R_full, p_full = locked.ee_pose(q_full)
    R_fixed, p_fixed = ur10.ee_pose(q_arm)
    assert np.allclose(p_full, p_fixed, atol=1e-12)
    assert np.allclose(R_full, R_fixed, atol=1e-12)


def test_velocity_acceleration_vs_autodiff(thing):
    rng = np.random.default_rng(1)
    q0 = jnp.asarray(rng.standard_normal(9))
    v0 = jnp.asarray(rng.standard_normal(9))
    a0 = jnp.asarray(rng.standard_normal(9))

    def pose_at(t):
        q = q0 + v0 * t + 0.5 * a0 * t**2
        R, p = thing.ee_pose(q)
        return R, p

    # autodiff derivatives of the trajectory
    (dR, dp) = jax.jacfwd(pose_at)(0.0)
    (ddR, ddp) = jax.jacfwd(lambda t: jax.jacfwd(pose_at)(t))(0.0)

    f = thing.chain.ee_motion(q0, v0, a0)

    # linear velocity / acceleration
    assert np.allclose(f.v, dp, atol=1e-10)
    assert np.allclose(f.a, ddp, atol=1e-10)

    # angular velocity / acceleration from S(w) = Rdot R^T
    R0 = np.asarray(pose_at(0.0)[0])
    S_w = np.asarray(dR) @ R0.T
    w = np.array([S_w[2, 1], S_w[0, 2], S_w[1, 0]])
    assert np.allclose(f.w, w, atol=1e-10)
    S_al = np.asarray(ddR) @ R0.T - S_w @ S_w
    al = np.array([S_al[2, 1], S_al[0, 2], S_al[1, 0]])
    assert np.allclose(f.al, al, atol=1e-10)


def test_ee_state_from_ocp_state(thing):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(27))
    ee = thing.ee_state(x)
    q, v, a = thing.split_state(x)
    f = thing.chain.ee_motion(q, v, a)
    assert np.allclose(ee.C_we, f.R)
    assert np.allclose(ee.a_ew_w, f.a)


def test_link_positions_monotone_chain(thing):
    q = jnp.zeros(9)
    P = np.asarray(thing.link_positions(q))
    # as many frames as joints, all finite
    assert P.shape == (len(thing.chain.joints), 3)
    assert np.isfinite(P).all()
    # the arm mount sits above the chassis
    names = thing.chain.joint_names
    assert P[names.index("arm_mount"), 2] > 0.5


def test_jit_and_vmap(thing):
    rng = np.random.default_rng(3)
    xs = jnp.asarray(rng.standard_normal((4, 27)))
    f = jax.jit(jax.vmap(lambda x: thing.ee_state(x).r_ew_w))
    out = f(xs)
    assert out.shape == (4, 3)
    single = thing.ee_state(xs[1]).r_ew_w
    assert np.allclose(out[1], single, atol=1e-12)


def test_locked_joints_fold(thing):
    """Locking arm joints reduces the DOF and reproduces the full chain."""
    model = build_robot_model(
        {
            "base_type": "omnidirectional",
            "locked_joints": {"ur10_arm_wrist_3_joint": 0.3},
        }
    )
    assert model.nq == 8
    q8 = jnp.asarray(np.random.default_rng(4).standard_normal(8))
    q9 = jnp.concatenate([q8, jnp.array([0.3])])
    R1, p1 = model.ee_pose(q8)
    R2, p2 = thing.ee_pose(q9)
    assert np.allclose(p1, p2, atol=1e-12)
    assert np.allclose(R1, R2, atol=1e-12)
