"""Tests for the robust-planning layer.

Includes the reference's oracle pattern for the double description
(upright_robust/test/test_double_description.py) plus physics sanity checks
of the contact wrench cone and the exact worst-case verification forms.
"""

import numpy as np
import pytest

import upright_tpu.config as cfg
from upright_tpu.robust import modelling as rm
from upright_tpu.robust import verification as rv
from upright_tpu.robust.scenarios import (
    box_vertices,
    com_vertex_params,
    sample_inertial_params,
    stack_vertex_scenarios_in_model,
)


def load_contacts(arrangement="pink_bottle"):
    path = cfg.resolve_package_path({"package": "configs", "path": "arrangements.yaml"})
    conf = cfg.load_config(path)
    conf["balancing"] = {"arrangement": arrangement, "frictionless": False}
    model, names, objects, contacts = cfg.parse_control_objects(conf)
    return model, names, objects, contacts


def oracle_face_form(S):
    """Independent qhull-free oracle: check membership by LP instead.

    For a set of probe points, x in cone(S) iff exists z >= 0 with S z = x.
    The face form A must agree: A x <= 0 iff feasible.
    """
    from scipy.optimize import linprog

    def in_cone(x):
        k = S.shape[1]
        res = linprog(
            np.zeros(k), A_eq=S, b_eq=x, bounds=[(0, None)] * k, method="highs"
        )
        return res.success

    return in_cone


def test_cone_span_to_face_form_3d():
    # symmetric 4-ray cone around +z
    mu = 0.5
    S = np.array(
        [
            [mu, 0, 1.0],
            [-mu, 0, 1.0],
            [0, mu, 1.0],
            [0, -mu, 1.0],
        ]
    ).T
    A = rm.cone_span_to_face_form(S)
    assert A.shape[1] == 3
    in_cone = oracle_face_form(S)

    rng = np.random.default_rng(0)
    for _ in range(40):
        x = rng.standard_normal(3)
        lp = in_cone(x)
        ff = bool((A @ x <= 1e-9).all())
        assert lp == ff, f"disagreement at {x}: lp={lp} ff={ff}"


def test_cwc_face_form_static_equilibrium():
    """Gravity wrench of a resting object is inside the CWC; strong sideways
    wrenches are not."""
    model, names, objects, contacts = load_contacts()
    name_index = rm.compute_object_name_index(names)
    rcps = [rm.RobustContactPoint(c) for c in contacts]
    A = rm.compute_cwc_face_form(name_index, rcps)
    assert A.shape[1] == 6

    obj = objects["bottle"]
    m, c = obj.mass, np.asarray(obj.com)
    g = np.array([0, 0, -9.81])
    # gravito-inertial wrench about EE origin at rest (EE frame = world)
    F = m * (-g)  # must be balanced by contacts: w_gi = [-mg, c x (-mg)]...
    w_gi = np.concatenate([m * -g, np.cross(c, m * -g)])
    # sign convention: A w <= 0 iff contact forces can support w
    assert (A @ w_gi <= 1e-8).all(), "resting wrench should be supportable"

    # a large sideways force (beyond friction) is not supportable
    w_bad = np.concatenate([[50.0 * m, 0, m * 9.81], np.cross(c, [50.0 * m, 0, m * 9.81])])
    assert (A @ w_bad > 1e-8).any(), "slipping wrench should violate the CWC"


def test_uncertain_object_wrench():
    obj = rv and rm.UncertainObject(
        mass=2.0, com=[0.1, 0, 0.05], inertia=np.diag([0.1, 0.1, 0.05])
    )
    V = np.array([0.1, -0.2, 0.3, 0.05, 0.02, -0.1])
    A6 = np.array([1.0, 2, 3, 0.1, 0.2, 0.3])
    w = obj.wrench(A6, V)
    assert w.shape == (6,)
    # static case: A = [-g_body, 0], V = 0: force = m * (-g)
    g = np.array([0, 0, -9.81])
    w_static = obj.wrench(np.concatenate([-g, np.zeros(3)]), np.zeros(6))
    assert np.allclose(w_static[:3], 2.0 * -g)
    # torque = m c x (-g)
    assert np.allclose(w_static[3:], np.cross(2.0 * np.asarray([0.1, 0, 0.05]), -g))


def test_regressor_matches_direct_wrench():
    """Y theta equals the directly-computed gravito-inertial wrench."""
    rng = np.random.default_rng(1)
    from upright_tpu.core.math import quat_to_rot
    import jax.numpy as jnp

    q = rng.standard_normal(4)
    C_we = np.asarray(quat_to_rot(jnp.asarray(q / np.linalg.norm(q))))
    w_w = rng.standard_normal(3)
    al_w = rng.standard_normal(3)
    a_w = rng.standard_normal(3)
    g = np.array([0, 0, -9.81])

    mass, com = 1.5, np.array([0.02, -0.01, 0.12])
    I_com = np.diag([0.02, 0.02, 0.01])
    theta = rv.theta_from_body(mass, com, I_com)

    Y = rv.inertial_regressor(C_we, w_w, al_w, a_w, g)
    w_pred = Y @ theta

    # direct computation
    from upright_tpu.core.math import dC_dtt

    C_ew = C_we.T
    ddC = np.asarray(dC_dtt(jnp.asarray(C_we), jnp.asarray(w_w), jnp.asarray(al_w)))
    b = C_ew @ (a_w - g)
    F = mass * b + C_ew @ ddC @ (mass * com)
    Sc = rm.skew3(com)
    I_o = I_com - mass * Sc @ Sc
    w_e = C_ew @ w_w
    al_e = C_ew @ al_w
    tau = I_o @ al_e + np.cross(w_e, I_o @ w_e) + np.cross(mass * com, b)
    assert np.allclose(w_pred, np.concatenate([F, tau]), atol=1e-10)


def test_parameter_set_max_linear():
    c = np.arange(10.0)
    box = rv.ParameterSet(center=c, box_half=0.5 * np.ones(10))
    mu = np.ones(10)
    assert np.isclose(box.max_linear(mu), c.sum() + 5.0)
    mu2 = -np.ones(10)
    assert np.isclose(box.max_linear(mu2), -c.sum() + 5.0)

    E = 0.1 * np.eye(10)
    ell = rv.ParameterSet(center=c, ellipsoid=E)
    assert np.isclose(ell.max_linear(mu), c.sum() + 0.1 * np.sqrt(10))

    verts = np.stack([c - 1, c + 2])
    vs = rv.ParameterSet(center=c, vertices=verts)
    assert np.isclose(vs.max_linear(mu), (c + 2).sum())


def test_verification_static_plan():
    """A resting trajectory is robustly feasible for small CoM boxes but not
    for huge ones (CoM beyond the support area)."""
    model, names, objects, contacts = load_contacts()
    name_index = rm.compute_object_name_index(names)
    rcps = [rm.RobustContactPoint(c) for c in contacts]
    A = rm.compute_cwc_face_form(name_index, rcps)

    obj = objects["bottle"]
    g = np.array([0, 0, -9.81])
    states = [(np.eye(3), np.zeros(3), np.zeros(3), np.zeros(3))] * 3

    small = rv.ParameterSet.from_com_box(obj.mass, obj.com, obj.inertia, [0.005, 0.005, 0.01])
    viol_small = rv.verify_plan(A, states, g, small)
    assert (viol_small <= 1e-6).all()

    big = rv.ParameterSet.from_com_box(obj.mass, obj.com, obj.inertia, [0.2, 0.2, 0.01])
    viol_big = rv.verify_plan(A, states, g, big)
    assert (viol_big > 1e-6).all()


def test_scenario_generation():
    model, names, objects, contacts = load_contacts()
    base = np.asarray(model.params)
    scen = np.asarray(com_vertex_params(base, [[0.01, 0.01, 0.02]]))
    assert scen.shape == (8, 1, 10)
    # masses unchanged; CoMs at box vertices
    assert np.allclose(scen[:, 0, 0], base[0, 0])
    coms = scen[:, 0, 1:4] / base[0, 0]
    com0 = base[0, 1:4] / base[0, 0]
    assert np.allclose(np.sort(np.unique(np.round(coms[:, 0] - com0[0], 6))), [-0.01, 0.01])

    rng = np.random.default_rng(0)
    samples = np.asarray(
        sample_inertial_params(base, rng, 100, com_half_extents=[[0.01, 0.01, 0.02]],
                               mass_range=(0.8, 1.2), inertia_scale_range=(0.5, 2.0))
    )
    assert samples.shape == (100, 1, 10)
    masses = samples[:, 0, 0]
    assert masses.min() >= 0.8 * base[0, 0] - 1e-9
    assert masses.max() <= 1.2 * base[0, 0] + 1e-9

    stacked = stack_vertex_scenarios_in_model(model, [[0.01, 0.01, 0.02]])
    assert stacked.params.shape == (8, 10)
    # each scenario owns a COPY of the contact set (reference
    # planning_sim_loop.py:513-534 builds 8 objects with their own
    # contacts): block-diagonal incidence, 8x contact count
    nc = model.num_contacts
    assert stacked.S1.shape == (8, 8 * nc)
    assert stacked.num_contacts == 8 * nc
    S1 = np.asarray(stacked.S1)
    for i in range(8):
        assert np.allclose(
            S1[i, i * nc : (i + 1) * nc], np.asarray(model.S1)[0]
        )
        # off-block entries are zero
        assert S1[i].sum() == np.asarray(model.S1)[0].sum()


def test_count_failures():
    disp = np.array([[0.1, 0.2], [0.6, 0.1], [0.0, 0.0]])
    assert rv.count_failures(disp) == 1
