"""Closed-form physics checks of the JAX contact plant (VERDICT r2 item 1,
plant half): the penalty-contact model must reproduce textbook rigid-body
results that nothing in upright_tpu's code encodes explicitly —

  - Coulomb slide threshold: a block on a tilted surface stays put iff
    tan(theta) < mu, and when it slides the acceleration matches
    g (sin t - mu cos t);
  - tipping threshold: a tall box dragged by a horizontally-accelerating
    support tips iff a > g * (width / height) (support-polygon geometry);
  - energy: a dropped block never gains mechanical energy and comes to
    rest (the penalty contact is dissipative);
  - static equilibrium: a resting block stays resting.

The parent (tray) frame is PRESCRIBED by monkeypatching
UprightSimulation._parent_motion — the code under test is the real contact
model (`_object_substep`), driven by exact boundary conditions instead of
robot kinematics.  Reference context: PyBullet plays this ground-truth role
for the reference (upright_sim/src/upright_sim/simulation.py); these tests
give the in-house plant an equally independent gate.
"""

import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from upright_tpu.core.math import quat_to_rot, rot_to_quat
from upright_tpu.kinematics.chain import FrameMotion
from upright_tpu.sim.simulation import ObjectsState, SimState, UprightSimulation

EE_OBJ = {
    "shape": "cuboid",
    "side_lengths": [0.285, 0.285, 0.02],
    "position": [0, 0, -0.01],
}
ROBOT = {
    "home": [0.0] * 6,
    "base_type": "fixed",
    "dims": {"q": 6, "v": 6, "x": 18, "u": 6},
    "x0": [0.0] * 18,
    # a minimal chain: six revolute z-joints (never moved in these tests —
    # the parent frame is prescribed)
    "urdf_joints": None,
}


def make_sim(mu, side_lengths, mass=0.2, timestep=1e-3):
    sim_config = {
        "timestep": timestep,
        "gravity": [0, 0, -9.81],
        "arrangement": "phys",
        "objects": {
            "ee": EE_OBJ,
            "block": {
                "shape": "cuboid",
                "mass": mass,
                "com_offset": [0, 0, 0],
                "side_lengths": list(side_lengths),
            },
        },
        "arrangements": {
            "phys": {
                "objects": [{"name": "b", "type": "block", "parent": "ee"}],
                "contacts": [{"first": "ee", "second": "b", "mu": mu}],
            }
        },
        "robot": {
            "home": [0.5, -0.25, 0.5, -0.25, 0.5, 0.417],
            "base_type": "fixed",
        },
    }
    # robot chain only provides a parent frame we immediately override; use
    # the stock UR10 chain config
    import upright_tpu.config as cfg

    ur10 = cfg.load_config(
        cfg.resolve_package_path({"package": "configs", "path": "robots/ur10.yaml"})
    )
    sim_config["robot"] = ur10["simulation"]["robot"]
    return UprightSimulation(sim_config)


def prescribe_static_frame(sim, R):
    """Parent frame fixed at rotation R, origin 0."""
    Rj = jnp.asarray(R)
    z = jnp.zeros(3)

    def pm(self, s):
        return FrameMotion(R=Rj, p=z, v=z, w=z, a=z, al=z)

    sim._parent_motion = types.MethodType(pm, sim)


def prescribe_accelerating_frame(sim, a_vec):
    """Parent frame translating with constant acceleration from rest."""
    aj = jnp.asarray(a_vec)
    z = jnp.zeros(3)
    I = jnp.eye(3)

    def pm(self, s):
        t = s.t
        return FrameMotion(R=I, p=0.5 * aj * t * t, v=aj * t, w=z, a=aj, al=z)

    sim._parent_motion = types.MethodType(pm, sim)


def initial_objects_state(sim, R):
    spec = sim.specs[0]
    Rj = jnp.asarray(R)
    r0 = Rj @ jnp.asarray(spec.com_world_ee)
    q0 = rot_to_quat(Rj)
    return SimState(
        t=jnp.zeros(()),
        q=jnp.zeros(6),
        v=jnp.zeros(6),
        objects=ObjectsState(
            r=r0[None], q=q0[None], v=jnp.zeros((1, 3)), w=jnp.zeros((1, 3))
        ),
    )


def rot_x(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def run(sim, state, T):
    n = int(round(T / sim.timestep))
    return sim.step(state, jnp.zeros(6), n_steps=n)


def tangential_displacement(state0, state1, R):
    d = np.asarray(state1.objects.r[0] - state0.objects.r[0])
    n = np.asarray(R) @ np.array([0.0, 0, 1])
    return d - (d @ n) * n


def tilt_angle(state):
    Rb = np.asarray(quat_to_rot(state.objects.q[0]))
    return float(np.arccos(np.clip(Rb[2, 2], -1, 1)))


# ---------------------------------------------------------------------------
# Coulomb slide threshold
# ---------------------------------------------------------------------------

MU = 0.4


def test_no_slide_below_friction_angle():
    """tan(theta) = 0.5 mu: the block must hold (regularized-friction creep
    stays well under a millimeter per second)."""
    theta = np.arctan(0.5 * MU)
    sim = make_sim(MU, [0.06, 0.06, 0.06])
    R = rot_x(theta)
    prescribe_static_frame(sim, R)
    s0 = initial_objects_state(sim, R)
    s1 = run(sim, s0, 1.0)
    disp_t = np.linalg.norm(tangential_displacement(s0, s1, R))
    assert disp_t < 2e-3, disp_t
    assert tilt_angle(s1) - theta < np.radians(1.0)


def test_slides_above_friction_angle_with_correct_acceleration():
    """tan(theta) = 2 mu: slides downhill at g (sin t - mu cos t)."""
    theta = np.arctan(2.0 * MU)
    T = 0.2
    sim = make_sim(MU, [0.06, 0.06, 0.06])
    R = rot_x(theta)
    prescribe_static_frame(sim, R)
    s0 = initial_objects_state(sim, R)
    s1 = run(sim, s0, T)
    d_t = tangential_displacement(s0, s1, R)
    disp = np.linalg.norm(d_t)
    a_expect = 9.81 * (np.sin(theta) - MU * np.cos(theta))
    d_expect = 0.5 * a_expect * T * T
    assert abs(disp - d_expect) < 0.35 * d_expect, (disp, d_expect)
    # downhill direction: gravity projected onto the plane
    g = np.array([0.0, 0, -9.81])
    n = R @ np.array([0.0, 0, 1])
    g_t = g - (g @ n) * n
    downhill = g_t / np.linalg.norm(g_t)
    assert d_t @ downhill > 0.9 * disp


# ---------------------------------------------------------------------------
# tipping threshold (support-polygon geometry)
# ---------------------------------------------------------------------------


def _tall_box_sim():
    # 4 x 4 x 16 cm box: tips when a > g * w/h = 9.81 * 0.25
    return make_sim(0.9, [0.04, 0.04, 0.16])


def test_no_tip_below_threshold():
    sim = _tall_box_sim()
    a_star = 9.81 * 0.04 / 0.16
    prescribe_accelerating_frame(sim, [0.5 * a_star, 0.0, 0.0])
    s0 = initial_objects_state(sim, np.eye(3))
    s1 = run(sim, s0, 1.0)
    assert tilt_angle(s1) < np.radians(15.0)


def test_tips_above_threshold():
    sim = _tall_box_sim()
    a_star = 9.81 * 0.04 / 0.16
    prescribe_accelerating_frame(sim, [2.0 * a_star, 0.0, 0.0])
    s0 = initial_objects_state(sim, np.eye(3))
    # sample the tilt as the run progresses (the box may leave the tray
    # after toppling; the maximum over the run is the verdict)
    s = s0
    max_tilt = 0.0
    for _ in range(15):
        s = run(sim, s, 0.1)
        max_tilt = max(max_tilt, tilt_angle(s))
    assert max_tilt > np.radians(30.0), np.degrees(max_tilt)


# ---------------------------------------------------------------------------
# energy + static equilibrium
# ---------------------------------------------------------------------------


def test_drop_dissipates_energy():
    sim = make_sim(0.5, [0.06, 0.06, 0.06])
    prescribe_static_frame(sim, np.eye(3))
    s0 = initial_objects_state(sim, np.eye(3))
    h0 = 0.02
    s0 = s0.replace(
        objects=s0.objects.replace(r=s0.objects.r + jnp.array([[0.0, 0, h0]]))
    )
    m = float(sim.specs[0].mass)
    I_loc = np.asarray(sim.specs[0].inertia_local)
    z_start = float(s0.objects.r[0, 2])

    def energy(st):
        z = float(st.objects.r[0, 2])
        v = np.asarray(st.objects.v[0])
        w = np.asarray(st.objects.w[0])
        Rb = np.asarray(quat_to_rot(st.objects.q[0]))
        I_w = Rb @ I_loc @ Rb.T
        return m * 9.81 * (z - z_start) + 0.5 * m * v @ v + 0.5 * w @ I_w @ w

    e0 = energy(s0)  # == 0 by construction (release from rest)
    s = s0
    for _ in range(20):
        s = run(sim, s, 0.025)
        assert energy(s) < e0 + 1e-4 * m * 9.81 * h0
    # at rest on the surface, all the PE went into the contact
    assert float(jnp.linalg.norm(s.objects.v[0])) < 5e-3
    assert float(jnp.linalg.norm(s.objects.w[0])) < 5e-2


def test_static_equilibrium_holds():
    sim = make_sim(0.5, [0.06, 0.06, 0.06])
    prescribe_static_frame(sim, np.eye(3))
    s0 = initial_objects_state(sim, np.eye(3))
    s1 = run(sim, s0, 0.5)
    disp_t = np.linalg.norm(tangential_displacement(s0, s1, np.eye(3)))
    assert disp_t < 5e-4, disp_t
    assert tilt_angle(s1) < np.radians(0.5)
    # vertical settle is bounded by the static penalty compression
    dz = float(s1.objects.r[0, 2] - s0.objects.r[0, 2])
    assert -2e-3 < dz <= 1e-6


# ---------------------------------------------------------------------------
# stiction friction model (friction_model: stiction)
# ---------------------------------------------------------------------------


def make_sim_stiction(mu, side_lengths, mass=0.2, timestep=1e-3):
    sim = make_sim(mu, side_lengths, mass=mass, timestep=timestep)
    sim.config["friction_model"] = "stiction"
    import upright_tpu.sim.simulation as sim_mod

    sim2 = sim_mod.UprightSimulation(dict(sim.config, friction_model="stiction"))
    return sim2


def initial_state_for(sim, R):
    s = initial_objects_state(sim, R)
    # stiction mode carries contact anchors in the objects state
    full = sim.initial_state()
    return s.replace(
        objects=s.objects.replace(
            anchors=full.objects.anchors, anchor_valid=full.objects.anchor_valid
        )
    )


def test_stiction_holds_near_cone_boundary():
    """tan(theta) = 0.95 mu: TRUE static friction must hold with microscopic
    displacement.  The regularized model can only transmit force near the
    cone boundary through sustained slip (v ~ v_slip * F/(muN - F)), so it
    drifts — the gap that motivated the stiction model (a controller
    planning AT the cone boundary needs a plant that can stick there)."""
    theta = np.arctan(0.95 * MU)
    R = rot_x(theta)

    sim_st = make_sim_stiction(MU, [0.06, 0.06, 0.06])
    prescribe_static_frame(sim_st, R)
    s0 = initial_state_for(sim_st, R)
    s1 = run(sim_st, s0, 1.0)
    disp_st = np.linalg.norm(tangential_displacement(s0, s1, R))
    assert disp_st < 5e-4, disp_st

    sim_reg = make_sim(MU, [0.06, 0.06, 0.06])
    prescribe_static_frame(sim_reg, R)
    s0r = initial_objects_state(sim_reg, R)
    s1r = run(sim_reg, s0r, 1.0)
    disp_reg = np.linalg.norm(tangential_displacement(s0r, s1r, R))
    # the regularized model visibly creeps at sustained near-boundary load
    assert disp_reg > 5 * disp_st, (disp_reg, disp_st)


def test_stiction_slides_above_friction_angle():
    """Kinetic regime unchanged: above the friction angle the clamped
    anchor spring delivers exactly mu N, so the block accelerates at
    g (sin t - mu cos t) like the regularized model."""
    theta = np.arctan(2.0 * MU)
    T = 0.2
    sim = make_sim_stiction(MU, [0.06, 0.06, 0.06])
    R = rot_x(theta)
    prescribe_static_frame(sim, R)
    s0 = initial_state_for(sim, R)
    s1 = run(sim, s0, T)
    disp = np.linalg.norm(tangential_displacement(s0, s1, R))
    a_expect = 9.81 * (np.sin(theta) - MU * np.cos(theta))
    d_expect = 0.5 * a_expect * T * T
    assert abs(disp - d_expect) < 0.35 * d_expect, (disp, d_expect)


def test_stiction_energy_dissipates():
    sim = make_sim_stiction(0.5, [0.06, 0.06, 0.06])
    prescribe_static_frame(sim, np.eye(3))
    s0 = initial_state_for(sim, np.eye(3))
    h0 = 0.02
    s0 = s0.replace(
        objects=s0.objects.replace(r=s0.objects.r + jnp.array([[0.0, 0, h0]]))
    )
    m = float(sim.specs[0].mass)
    z_start = float(s0.objects.r[0, 2])
    s = s0
    for _ in range(20):
        s = run(sim, s, 0.025)
        e = (
            m * 9.81 * (float(s.objects.r[0, 2]) - z_start)
            + 0.5 * m * float(jnp.sum(s.objects.v[0] ** 2))
        )
        assert e < 1e-4 * m * 9.81 * h0
    assert float(jnp.linalg.norm(s.objects.v[0])) < 5e-3


def test_divergence_latch_reports_inf_displacement():
    """ADVICE r4 (medium): an integrator blow-up (non-finite state) must NOT
    be reclassified as a held run by the divergence freeze — the latch makes
    object_displacements report inf so protocol n_diverged counts fire."""
    sim = make_sim(0.5, [0.06, 0.06, 0.06])
    prescribe_static_frame(sim, np.eye(3))
    s0 = sim.initial_state()
    assert s0.objects.diverged is not None
    assert not bool(np.asarray(s0.objects.diverged).any())

    # poison the velocity: the next substep integrates NaN into r/v, the
    # freeze holds the last finite pose, and the latch must record it
    bad = s0.replace(
        objects=s0.objects.replace(
            v=s0.objects.v.at[0].set(jnp.nan * jnp.ones(3))
        )
    )
    s1 = sim.step(bad, jnp.zeros(sim.robot.nq), n_steps=2)
    assert bool(np.asarray(s1.objects.diverged)[0])
    # frozen pose stays finite (containment) ...
    assert np.isfinite(np.asarray(s1.objects.r)).all()
    # ... but the reported displacement is inf (failure, not success)
    disp = sim.object_displacements(s1)
    assert np.isinf(disp[0])
