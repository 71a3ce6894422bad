"""Tests for the stacked-array balance physics (core/balance.py).

Strategy: golden static-equilibrium checks plus oracle tests — a plain-loop
transcription of the reference formulas (contact_constraints.h) written
independently here, compared against the vectorized incidence-matrix
implementation.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import upright_tpu.config as cfg
from upright_tpu.core import balance
from upright_tpu.core.balance import EEState
from upright_tpu.core.math import dC_dtt, quat_to_rot
from upright_tpu.core.rigid_body import params_to_body

GRAVITY = np.array([0.0, 0.0, -9.81])


def load_model(arrangement, frictionless=True):
    path = cfg.resolve_package_path({"package": "configs", "path": "arrangements.yaml"})
    conf = cfg.load_config(path)
    conf["balancing"] = {"arrangement": arrangement, "frictionless": frictionless}
    return cfg.parse_control_objects(conf)


def oracle_wrenches(model, forces):
    """Plain-loop transcription of compute_object_wrenches
    (contact_constraints.h:106-157)."""
    n_obj = model.num_objects
    S1, S2 = np.asarray(model.S1), np.asarray(model.S2)
    r1, r2 = np.asarray(model.r1), np.asarray(model.r2)
    params = np.asarray(model.params)
    F = np.zeros((n_obj, 3))
    M = np.zeros((n_obj, 3))
    for j in range(n_obj):
        com = params[j, 1:4] / params[j, 0]
        for i in range(model.num_contacts):
            f = np.asarray(forces)[i]
            if S1[j, i]:
                F[j] += f
                M[j] += np.cross(r1[i] - com, f)
            if S2[j, i]:
                F[j] -= f
                M[j] += np.cross(r2[i] - com, -f)
    return F, M


def test_wrench_aggregation_matches_oracle():
    model, names, objects, contacts = load_model("foam_die2")
    rng = np.random.default_rng(0)
    forces = rng.standard_normal((model.num_contacts, 3))
    F, M = balance.compute_object_wrenches(model, jnp.asarray(forces))
    F_o, M_o = oracle_wrenches(model, forces)
    assert np.allclose(F, F_o, atol=1e-12)
    assert np.allclose(M, M_o, atol=1e-12)


def test_static_equilibrium_single_object():
    """A bottle at rest: per-contact share of the weight closes the residual."""
    model, names, objects, contacts = load_model("pink_bottle")
    m = float(model.params[0, 0])
    nc = model.num_contacts

    # normals point down (into the tray); supporting force on the tray is
    # downward, reaction on the bottle is upward
    forces_scalar = jnp.full((nc,), m * 9.81 / nc)
    forces = balance.expand_frictionless_forces(model, forces_scalar)

    ee = EEState.zero()
    res = balance.object_dynamics_constraints(model, forces, ee, jnp.asarray(GRAVITY))
    assert np.allclose(res, 0.0, atol=1e-10)

    # friction cones satisfied with zero tangential force
    cones = balance.contact_force_constraints_linearized(model, forces)
    assert (np.asarray(cones) >= 0).all()
    exact = balance.contact_force_constraints_exact(model, forces)
    assert (np.asarray(exact) >= -1e-12).all()


def test_unbalanced_residual_direction():
    """With no contact forces, the residual equals the gravito-inertial term."""
    model, names, objects, contacts = load_model("pink_bottle")
    ee = EEState.zero()
    forces = jnp.zeros((model.num_contacts, 3))
    res = balance.object_dynamics_constraints(
        model, forces, ee, jnp.asarray(GRAVITY), normalize=False
    )
    # force rows: C_ew (a - g) = +9.81 z; torque rows zero (no rotation)
    assert np.allclose(res[:3], [0, 0, 9.81], atol=1e-12)
    assert np.allclose(res[3:], 0, atol=1e-12)


def test_residual_with_ee_motion():
    """Oracle check of the Newton-Euler residual under full EE motion
    (contact_constraints.h:79-102)."""
    model, names, objects, contacts = load_model("foam_die2")
    rng = np.random.default_rng(1)

    q = rng.standard_normal(4)
    C_we = np.asarray(quat_to_rot(jnp.asarray(q / np.linalg.norm(q))))
    ee = EEState(
        C_we=jnp.asarray(C_we),
        r_ew_w=jnp.asarray(rng.standard_normal(3)),
        v_ew_w=jnp.asarray(rng.standard_normal(3)),
        w_ew_w=jnp.asarray(rng.standard_normal(3)),
        a_ew_w=jnp.asarray(rng.standard_normal(3)),
        alpha_ew_w=jnp.asarray(rng.standard_normal(3)),
    )
    forces = rng.standard_normal((model.num_contacts, 3))

    res = balance.object_dynamics_constraints(
        model, jnp.asarray(forces), ee, jnp.asarray(GRAVITY), normalize=False
    )

    # oracle: direct per-object formula
    F_o, M_o = oracle_wrenches(model, forces)
    C_ew = C_we.T
    ddC = np.asarray(dC_dtt(jnp.asarray(C_we), ee.w_ew_w, ee.alpha_ew_w))
    w_e = C_ew @ np.asarray(ee.w_ew_w)
    al_e = C_ew @ np.asarray(ee.alpha_ew_w)
    expected = []
    for j in range(model.num_objects):
        m, com, inertia = params_to_body(model.params[j])
        m, com, inertia = float(m), np.asarray(com), np.asarray(inertia)
        gi = m * C_ew @ (np.asarray(ee.a_ew_w) + ddC @ com - GRAVITY)
        tau = np.cross(w_e, inertia @ w_e) + inertia @ al_e
        expected.append((gi - F_o[j]) / m)
        expected.append((tau - M_o[j]) / m)
    expected = np.concatenate(expected)
    assert np.allclose(res, expected, atol=1e-10)


def test_normalization_factor():
    model, names, objects, contacts = load_model("foam_die2")
    ee = EEState.zero()
    forces = jnp.zeros((model.num_contacts, 3))
    r_raw = balance.object_dynamics_constraints(
        model, forces, ee, jnp.asarray(GRAVITY), normalize=False
    )
    r_norm = balance.object_dynamics_constraints(
        model, forces, ee, jnp.asarray(GRAVITY), normalize=True
    )
    n = np.sqrt(6 * model.num_objects)
    assert np.allclose(np.asarray(r_raw) / n, r_norm, atol=1e-14)


def test_friction_cone_values():
    """Hand-built single contact: check each linearized cone row."""
    from upright_tpu.core.balance import BalanceModel

    normal = np.array([0.0, 0.0, 1.0])
    span = np.array([[1.0, 0, 0], [0, 1.0, 0]])
    model = BalanceModel(
        params=jnp.ones((1, 10)),
        mu=jnp.array([0.5]),
        normal=jnp.asarray(normal)[None],
        span=jnp.asarray(span)[None],
        r1=jnp.zeros((1, 3)),
        r2=jnp.zeros((1, 3)),
        S1=jnp.zeros((1, 1)),
        S2=jnp.ones((1, 1)),
    )
    f = jnp.array([[0.3, -0.1, 2.0]])
    lin = np.asarray(balance.contact_force_constraints_linearized(model, f))
    mu = 0.5
    expected = [
        2.0,
        mu * 2 - 0.3 - (-0.1),
        mu * 2 - 0.3 + (-0.1),
        mu * 2 + 0.3 - (-0.1),
        mu * 2 + 0.3 + (-0.1),
    ]
    assert np.allclose(lin, expected, atol=1e-12)

    exact = np.asarray(balance.contact_force_constraints_exact(model, f))
    assert np.isclose(exact[0], 2.0)
    assert np.isclose(exact[1], mu**2 * 4 - (0.3**2 + 0.01))

    # slipping force violates the cone
    f_slip = jnp.array([[3.0, 0.0, 1.0]])
    lin = np.asarray(balance.contact_force_constraints_linearized(model, f_slip))
    assert (lin[1:] < 0).any()


def test_vmap_over_scenarios():
    """The residual vmaps over inertial-parameter scenarios (robust mode)."""
    import jax

    model, names, objects, contacts = load_model("pink_bottle")
    ee = EEState.zero()
    nc = model.num_contacts

    def residual(params):
        scen = model.replace(params=params)
        m = params[0, 0]
        forces = balance.expand_frictionless_forces(scen, jnp.full((nc,), m * 9.81 / nc))
        return balance.object_dynamics_constraints(scen, forces, ee, jnp.asarray(GRAVITY))

    # batch of scaled masses: equilibrium force scales with mass, so all zero
    base = np.asarray(model.params)
    batch = jnp.asarray(np.stack([base * s for s in [0.5, 1.0, 2.0]]))
    # mass scaling multiplies the whole parameter vector (m, m*com, I)
    res = jax.vmap(residual)(batch)
    assert res.shape == (3, 6)
    assert np.allclose(res, 0.0, atol=1e-10)
