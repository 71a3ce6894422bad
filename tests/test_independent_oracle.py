"""Independent-oracle gate (VERDICT r2 item 1): verify the full constrained
OCP and its physics against a transcription that shares ZERO code with
upright_tpu (tests/independent_oracle.py: torch AD, standard-DH FK,
world-frame Newton-Euler from first principles, scipy SLSQP golden point).

Layers of the gate:
  1. pointwise physics equivalence — FK, EE motion derivatives, the
     Newton-Euler balance rows (ours are the EE-frame rotation of the
     independent world-frame rows, scaled by 1/sqrt(6)), the discrete
     dynamics step, and the stage cost including the OCS2
     quaternionDistance orientation convention;
  2. KKT certificate (slow) — our converged solution is a constrained
     stationary point of the INDEPENDENT transcription: independent-eq
     feasibility, least-squares multipliers give a small stationarity
     residual with correctly-signed inequality/bound multipliers;
  3. golden dominance (slow) — our solution achieves a lower
     independent-objective value than the committed feasible point found
     by SLSQP (tests/data/oracle_slsqp_ur10.npz, an optimizer upright_tpu
     never touches), with stage-0 contact forces agreeing to 1e-3.

Reference parity: the reference's de-facto oracle is third-party code
(PyBullet / Pinocchio cross-asserts, upright_robust planning_sim_loop.py:
102-106); this file is the analogous external gate for upright_tpu.
"""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import independent_oracle as oracle

import upright_tpu.config as cfg_mod
from upright_tpu.ocp.problem import build_problem
from upright_tpu.solver.al import ALConfig, solve
from upright_tpu.solver.ocp import zeros_warm_start


@pytest.fixture(scope="module")
def prob():
    path = cfg_mod.resolve_package_path(
        {"package": "configs", "path": "demos/ur10_demo.yaml"}
    )
    config = oracle.ocp_config_patch(cfg_mod.load_config(path))
    p = build_problem(config)
    assert p.ocp.N == oracle.N
    return p


def to_scaled_u(p, u):
    """Map a PHYSICAL input vector (the oracle's parameterization, forces in
    newtons) to the solver's dimensionless force variables
    (problem.py force_scale)."""
    u = np.asarray(u, dtype=float).copy()
    nq = p.dims.robot_u
    u[nq:] = u[nq:] / np.asarray(p.force_scale)
    return u


def to_physical_U(p, U):
    """Map the solver's (N, nu) input trajectory back to physical newtons
    so the independent transcription (which knows nothing of the scaling)
    can evaluate it."""
    U = np.asarray(U, dtype=float).copy()
    nq = p.dims.robot_u
    U[:, nq:] = U[:, nq:] * np.asarray(p.force_scale)[None, :]
    return U


def rand_xu(rng, scale_q=0.3, scale_v=0.5, scale_a=1.0, scale_f=3.0):
    x = np.concatenate(
        [
            oracle.HOME + scale_q * rng.standard_normal(6),
            scale_v * rng.standard_normal(6),
            scale_a * rng.standard_normal(6),
        ]
    )
    u = np.concatenate(
        [
            2.0 * rng.standard_normal(6),
            oracle.DIE_MASS * 9.81 / 4 + scale_f * rng.random(4),
        ]
    )
    return x, u


def test_parsed_geometry_matches_spec(prob):
    """The config parser must reproduce the hand-written oracle geometry."""
    m = prob.balance_model
    np.testing.assert_allclose(np.asarray(m.normal)[0], oracle.NORMAL, atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.r1), oracle.CONTACTS, atol=1e-12)
    mass = float(m.params[0, 0])
    com = np.asarray(m.params[0, 1:4]) / mass
    assert abs(mass - oracle.DIE_MASS) < 1e-12
    np.testing.assert_allclose(com, oracle.DIE_COM, atol=1e-12)
    # inertia about the CoM in the EE frame, packed as vech3 (6 entries)
    v = np.asarray(m.params[0, 4:10])
    I_com = np.array(
        [
            [v[0], v[1], v[2]],
            [v[1], v[3], v[4]],
            [v[2], v[4], v[5]],
        ]
    )
    np.testing.assert_allclose(I_com, oracle.DIE_I, atol=1e-12)


def test_fk_and_target_match(prob):
    f0 = oracle.fk_flat(torch.tensor(oracle.HOME))
    C_t = f0[:9].reshape(3, 3).numpy()
    r_t = f0[9:].numpy()
    C_j, r_j = prob.robot.ee_pose(jnp.asarray(oracle.HOME))
    np.testing.assert_allclose(np.asarray(r_j), r_t, atol=1e-12)
    np.testing.assert_allclose(np.asarray(C_j), C_t, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(prob.target.poses[0, :3]),
        r_t + oracle.WAYPOINT_OFFSET,
        atol=1e-12,
    )


def test_ee_motion_matches(prob):
    """Velocity/acceleration-level kinematics vs torch nested-JVP."""
    rng = np.random.default_rng(1)
    for _ in range(5):
        x, _ = rand_xu(rng)
        q, v, a = x[:6], x[6:12], x[12:18]
        C, r, rd, Cd, rdd, Cdd = (
            t.detach().numpy()
            for t in oracle.ee_motion(
                torch.tensor(q), torch.tensor(v), torch.tensor(a)
            )
        )
        ee = prob.robot.ee_state(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(ee.r_ew_w), r, atol=1e-10)
        np.testing.assert_allclose(np.asarray(ee.C_we), C, atol=1e-10)
        np.testing.assert_allclose(np.asarray(ee.v_ew_w), rd, atol=1e-9)
        np.testing.assert_allclose(np.asarray(ee.a_ew_w), rdd, atol=1e-8)
        # angular velocity/acceleration from the matrix derivatives
        w = Cd @ C.T
        w_vec = np.array([w[2, 1], w[0, 2], w[1, 0]])
        Sal = Cdd @ C.T + Cd @ Cd.T
        al_vec = np.array([Sal[2, 1], Sal[0, 2], Sal[1, 0]])
        np.testing.assert_allclose(np.asarray(ee.w_ew_w), w_vec, atol=1e-9)
        np.testing.assert_allclose(np.asarray(ee.alpha_ew_w), al_vec, atol=1e-8)


def test_newton_euler_pointwise(prob):
    """Our balance equality rows are the EE-frame rotation of the
    independent world-frame Newton-Euler residual, scaled by 1/sqrt(6)."""
    rng = np.random.default_rng(2)
    params = prob.stage_params(0.0)
    p0 = {k: v[0] for k, v in params["stage"].items()}
    for _ in range(8):
        x, u = rand_xu(rng)
        ours = np.asarray(
            prob.ocp.eq(jnp.asarray(x), jnp.asarray(to_scaled_u(prob, u)), p0)
        )
        r_t = (
            oracle.newton_euler_residual(torch.tensor(x), torch.tensor(u))
            .detach()
            .numpy()
        )
        C = oracle.ee_motion(
            torch.tensor(x[:6]), torch.tensor(x[6:12]), torch.tensor(x[12:18])
        )[0].detach().numpy()
        rot = C.T  # world -> EE
        expected = (
            np.concatenate([rot @ r_t[:3], rot @ r_t[3:]]) / np.sqrt(6.0)
        )
        np.testing.assert_allclose(ours, expected, atol=1e-8)


def test_dynamics_step_matches(prob):
    rng = np.random.default_rng(3)
    for _ in range(5):
        x, u = rand_xu(rng)
        ours = np.asarray(prob.ocp.dynamics(jnp.asarray(x), jnp.asarray(u), None))
        ref = oracle.dyn_step(torch.tensor(x), torch.tensor(u)).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_stage_cost_pointwise(prob):
    rng = np.random.default_rng(4)
    params = prob.stage_params(0.0)
    p0 = {k: v[0] for k, v in params["stage"].items()}
    for _ in range(8):
        x, u = rand_xu(rng)
        ours = float(
            prob.ocp.stage_cost(
                jnp.asarray(x), jnp.asarray(to_scaled_u(prob, u)), p0
            )
        )
        ref = float(oracle.stage_cost(torch.tensor(x), torch.tensor(u)))
        assert abs(ours - ref) < 1e-9 * max(1.0, abs(ref))


def test_stage_cost_orientation_convention():
    """Pin the OCS2 quaternionDistance orientation-error convention: build
    the problem with a nonzero orientation weight and compare the stage
    cost against the independent torch formula at large random rotations
    (cost is invariant to the quaternion sign branch, so this compares the
    conventions, not the sign choices)."""
    path = cfg_mod.resolve_package_path(
        {"package": "configs", "path": "demos/ur10_demo.yaml"}
    )
    config = oracle.ocp_config_patch(cfg_mod.load_config(path))
    config["controller"]["weights"]["end_effector"] = {
        "scale": 1,
        "diag": [1, 1, 1, 1, 1, 1],
    }
    p = build_problem(config)
    qd = oracle.rot_to_quat(torch.tensor(oracle.R0_HOME))
    params = p.stage_params(0.0)
    p0 = {k: v[0] for k, v in params["stage"].items()}
    rng = np.random.default_rng(5)
    for _ in range(8):
        x, u = rand_xu(rng, scale_q=0.8)
        ours = float(
            p.ocp.stage_cost(jnp.asarray(x), jnp.asarray(to_scaled_u(p, u)), p0)
        )
        ref = float(
            oracle.stage_cost(torch.tensor(x), torch.tensor(u), w_orn=1.0, qd=qd)
        )
        assert abs(ours - ref) < 1e-9 * max(1.0, abs(ref))


# ---------------------------------------------------------------------------
# frictional variant (the ral23 "full" controller path: frictionless false)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def prob_frictional():
    path = cfg_mod.resolve_package_path(
        {"package": "configs", "path": "demos/ur10_demo.yaml"}
    )
    config = oracle.ocp_config_patch(cfg_mod.load_config(path))
    config["controller"]["balancing"]["frictionless"] = False
    p = build_problem(config)
    assert p.dims.u == oracle.NU_F
    return p


def rand_xu_frictional(rng):
    x, _ = rand_xu(rng)
    f = np.tile([0.5, -0.3, -oracle.DIE_MASS * 9.81 / 4], 4)
    u = np.concatenate(
        [2.0 * rng.standard_normal(6), f + 0.5 * rng.standard_normal(12)]
    )
    return x, u


def test_newton_euler_frictional_pointwise(prob_frictional):
    rng = np.random.default_rng(6)
    params = prob_frictional.stage_params(0.0)
    p0 = {k: v[0] for k, v in params["stage"].items()}
    for _ in range(6):
        x, u = rand_xu_frictional(rng)
        ours = np.asarray(
            prob_frictional.ocp.eq(
                jnp.asarray(x),
                jnp.asarray(to_scaled_u(prob_frictional, u)), p0,
            )
        )
        r_t = (
            oracle.newton_euler_residual_frictional(
                torch.tensor(x), torch.tensor(u)
            )
            .detach()
            .numpy()
        )
        C = oracle.ee_motion(
            torch.tensor(x[:6]), torch.tensor(x[6:12]), torch.tensor(x[12:18])
        )[0].detach().numpy()
        rot = C.T
        expected = (
            np.concatenate([rot @ r_t[:3], rot @ r_t[3:]]) / np.sqrt(6.0)
        )
        np.testing.assert_allclose(ours, expected, atol=1e-8)


def test_cone_rows_pointwise(prob_frictional):
    """Our linearized cone rows equal the independent formulation as a SET
    per contact (the +- sign rows are basis-order invariant)."""
    rng = np.random.default_rng(7)
    params = prob_frictional.stage_params(0.0)
    p0 = {k: v[0] for k, v in params["stage"].items()}
    for _ in range(6):
        x, u = rand_xu_frictional(rng)
        h = np.asarray(
            prob_frictional.ocp.ineq(
                jnp.asarray(x),
                jnp.asarray(to_scaled_u(prob_frictional, u)), p0,
            )
        )
        # our rows are the physical cone divided by the per-contact force
        # scale (positively homogeneous) — undo it for the comparison
        fscale_c = np.asarray(prob_frictional.force_scale)[::3]
        ours = h[: 5 * 4].reshape(4, 5) * fscale_c[:, None]
        ref = (
            oracle.cone_rows_frictional(torch.tensor(u)).detach().numpy()
        ).reshape(4, 5)
        np.testing.assert_allclose(ours[:, 0], ref[:, 0], atol=1e-12)
        np.testing.assert_allclose(
            np.sort(ours[:, 1:], axis=1), np.sort(ref[:, 1:], axis=1),
            atol=1e-12,
        )


def test_stage_cost_frictional_pointwise(prob_frictional):
    rng = np.random.default_rng(8)
    params = prob_frictional.stage_params(0.0)
    p0 = {k: v[0] for k, v in params["stage"].items()}
    for _ in range(6):
        x, u = rand_xu_frictional(rng)
        ours = float(
            prob_frictional.ocp.stage_cost(
                jnp.asarray(x),
                jnp.asarray(to_scaled_u(prob_frictional, u)), p0,
            )
        )
        ref = float(
            oracle.stage_cost_frictional(torch.tensor(x), torch.tensor(u))
        )
        assert abs(ours - ref) < 1e-9 * max(1.0, abs(ref))


@pytest.mark.slow
def test_kkt_certificate_frictional(prob_frictional):
    """Our frictional solution is a constrained stationary point of the
    independent frictional transcription (cones included)."""
    sol = _solve_ours(prob_frictional)
    z = to_physical_U(prob_frictional, sol.state.U).reshape(-1)

    eq_f, eq_j = oracle.np_fun(oracle.eq_vec_frictional_t)
    iq_f, iq_j = oracle.np_fun(oracle.ineq_vec_frictional_t)
    obj_f, obj_j = oracle.np_fun(oracle.objective_frictional_t)
    c_eq = eq_f(z)
    h = iq_f(z)
    assert np.abs(c_eq).max() < 2e-4, np.abs(c_eq).max()
    assert h.min() > -1e-6, h.min()

    g = obj_j(z)
    Jeq = eq_j(z)
    lo, hi = oracle.z_bounds_frictional()
    act_iq = h < 1e-5
    act_lo = z - lo < 1e-7
    act_hi = hi - z < 1e-7
    cols = [Jeq.T]
    n_eq = Jeq.shape[0]
    if act_iq.any():
        cols.append(-iq_j(z)[act_iq].T)
    B = []
    for i in np.where(act_lo)[0]:
        e = np.zeros_like(z)
        e[i] = -1.0
        B.append(e)
    for i in np.where(act_hi)[0]:
        e = np.zeros_like(z)
        e[i] = 1.0
        B.append(e)
    if B:
        cols.append(-np.stack(B, axis=1))
    A = np.concatenate(cols, axis=1)
    m, *_ = np.linalg.lstsq(A, -g, rcond=None)
    rel = np.linalg.norm(g + A @ m) / max(np.linalg.norm(g), 1e-12)
    assert rel < 1e-2, rel
    mu = m[n_eq:]
    if mu.size:
        assert mu.min() > -1e-3 * max(1.0, np.abs(m).max()), mu.min()


# ---------------------------------------------------------------------------
# full-OCP certificate
# ---------------------------------------------------------------------------


def _solve_ours(prob):
    al = ALConfig(iterations=1000, rho_eq=100.0, rho_ineq=100.0)
    sol = jax.jit(lambda p, x, s: solve(prob.ocp, al, p, x, s))(
        prob.stage_params(0.0), prob.x0, zeros_warm_start(prob.ocp, prob.x0)
    )
    return sol


GOLDEN = os.path.join(os.path.dirname(__file__), "data", "oracle_slsqp_ur10.npz")


@pytest.mark.slow
def test_kkt_certificate_and_golden_dominance(prob):
    sol = _solve_ours(prob)
    U_ours = to_physical_U(prob, sol.state.U)
    z = U_ours.reshape(-1)

    # --- independent feasibility of our solution -------------------------
    eq_f, eq_j = oracle.np_fun(oracle.eq_vec_t)
    iq_f, _ = oracle.np_fun(oracle.ineq_vec_t)
    obj_f, obj_j = oracle.np_fun(oracle.objective_t)
    c_eq = eq_f(z)
    h = iq_f(z)
    assert np.abs(c_eq).max() < 2e-4, np.abs(c_eq).max()
    assert h.min() > -1e-6, h.min()

    # --- KKT stationarity with least-squares multipliers -----------------
    g = obj_j(z)
    Jeq = eq_j(z)
    lo, hi = oracle.z_bounds()
    act_iq = h < 1e-5
    # active bounds (gradient rows are +-unit vectors)
    act_lo = z - lo < 1e-7
    act_hi = hi - z < 1e-7
    cols = [Jeq.T]
    n_eq = Jeq.shape[0]
    if act_iq.any():
        _, iq_jac = oracle.np_fun(oracle.ineq_vec_t)
        cols.append(-iq_jac(z)[act_iq].T)
    B = []
    for i in np.where(act_lo)[0]:
        e = np.zeros_like(z)
        e[i] = -1.0  # lower bound: z - lo >= 0 has gradient +e_i; -grad^T mu
        B.append(e)
    for i in np.where(act_hi)[0]:
        e = np.zeros_like(z)
        e[i] = 1.0
        B.append(e)
    if B:
        cols.append(-np.stack(B, axis=1))
    A = np.concatenate(cols, axis=1)
    m, *_ = np.linalg.lstsq(A, -g, rcond=None)
    resid = np.linalg.norm(g + A @ m)
    rel = resid / max(np.linalg.norm(g), 1e-12)
    # stationarity of the INDEPENDENT transcription at our solution
    assert rel < 1e-2, (rel, resid)
    # inequality/bound multipliers must be (weakly) nonnegative (vacuous
    # when nothing is active — the solution is interior)
    mu = m[n_eq:]
    if mu.size:
        scale = max(1.0, np.abs(m).max())
        assert mu.min() > -1e-3 * scale, mu.min()

    # --- dominance over the committed independent golden point -----------
    data = np.load(GOLDEN)
    z_gold = data["U"].reshape(-1)
    # re-verify the artifact with the independent evaluators (not trusting
    # the stored scalars)
    assert np.abs(eq_f(z_gold)).max() < 1e-8
    assert iq_f(z_gold).min() > -1e-9
    f_gold = obj_f(z_gold)
    f_ours = obj_f(z)
    # our infeasibility can buy at most ~||lambda||*||c|| ~ 1e-4 of cost;
    # require dominance beyond that margin or near-equality
    assert f_ours <= f_gold + 5e-4, (f_ours, f_gold)

    # stage-0 contact forces: fully determined by the (fixed) initial state
    # -> must agree tightly between the two transcriptions
    np.testing.assert_allclose(
        U_ours[0, 6:], data["U"][0, 6:], atol=1e-3
    )


# ---------------------------------------------------------------------------
# flagship certificate (VERDICT r3 weak #5): the benchmark operating point —
# Thing omnidirectional base, frictional bottle, static obstacle course,
# N = 20 @ dt = 0.1
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def prob_flagship():
    path = cfg_mod.resolve_package_path(
        {"package": "configs", "path": "demos/thing_demo.yaml"}
    )
    config = oracle.flagship_config_patch(cfg_mod.load_config(path))
    p = build_problem(config)
    assert p.ocp.N == oracle.FN
    assert p.ocp.nu == oracle.FNU
    assert p.ocp.nx == 27
    return p


def test_flagship_geometry_matches_spec(prob_flagship):
    """Parsed bottle arrangement == the hand-written oracle spec."""
    m = prob_flagship.balance_model
    mass = float(m.params[0, 0])
    assert abs(mass - oracle.BOTTLE_MASS) < 1e-12
    np.testing.assert_allclose(
        np.asarray(m.params[0, 1:4]) / mass, oracle.BOTTLE_COM, atol=1e-12
    )
    v = np.asarray(m.params[0, 4:10])
    I_com = np.array(
        [[v[0], v[1], v[2]], [v[1], v[3], v[4]], [v[2], v[4], v[5]]]
    )
    np.testing.assert_allclose(I_com, oracle.BOTTLE_I, atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.mu), oracle.MU_B, atol=1e-12)
    # object-side contact points (r2 drives the wrench on the bottle)
    np.testing.assert_allclose(
        np.asarray(m.r2), oracle.CONTACTS_B, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(m.normal), np.tile([0.0, 0.0, -1.0], (4, 1)), atol=1e-12
    )


def rand_xu_flagship(rng, scale_q=0.3):
    x = np.concatenate(
        [
            oracle.FLAG_HOME + scale_q * rng.standard_normal(9),
            0.4 * rng.standard_normal(9),
            0.8 * rng.standard_normal(9),
        ]
    )
    f = np.tile([0.3, -0.2, -oracle.BOTTLE_MASS * 9.81 / 4], 4)
    u = np.concatenate(
        [1.5 * rng.standard_normal(9), f + 0.4 * rng.standard_normal(12)]
    )
    return x, u


def test_flagship_fk_matches(prob_flagship):
    """Thing FK (planar base + mount + DH + tool) vs our chain."""
    rng = np.random.default_rng(11)
    for _ in range(6):
        x, _ = rand_xu_flagship(rng)
        q = x[:9]
        f = oracle.fk_flag(torch.tensor(q))
        C_t = f[:9].reshape(3, 3).numpy()
        r_t = f[9:].numpy()
        C_j, r_j = prob_flagship.robot.ee_pose(jnp.asarray(q))
        np.testing.assert_allclose(np.asarray(r_j), r_t, atol=1e-10)
        np.testing.assert_allclose(np.asarray(C_j), C_t, atol=1e-10)


def test_flagship_newton_euler_pointwise(prob_flagship):
    rng = np.random.default_rng(12)
    params = prob_flagship.stage_params(0.0)
    p0 = {k: v[0] for k, v in params["stage"].items()}
    for _ in range(5):
        x, u = rand_xu_flagship(rng)
        ours = np.asarray(
            prob_flagship.ocp.eq(
                jnp.asarray(x), jnp.asarray(to_scaled_u(prob_flagship, u)), p0
            )
        )
        r_t = oracle.newton_euler_flagship(
            torch.tensor(x), torch.tensor(u)
        ).detach().numpy()
        C = oracle.ee_motion_flag(
            torch.tensor(x[:9]), torch.tensor(x[9:18]), torch.tensor(x[18:27])
        )[0].detach().numpy()
        rot = C.T
        expected = (
            np.concatenate([rot @ r_t[:3], rot @ r_t[3:]]) / np.sqrt(6.0)
        )
        np.testing.assert_allclose(ours, expected, atol=1e-8)


def test_flagship_obstacle_rows_pointwise(prob_flagship):
    """Our collision rows == the oracle's sphere-distance rows as a SET
    (our stacking order is robot-sphere-major over obstacles)."""
    rng = np.random.default_rng(13)
    params = prob_flagship.stage_params(0.0)
    p0 = {k: v[0] for k, v in params["stage"].items()}
    groups = dict(prob_flagship.ineq_groups)
    assert groups["collision_pair_distances"] == 18
    for _ in range(5):
        x, u = rand_xu_flagship(rng)
        h = np.asarray(
            prob_flagship.ocp.ineq(
                jnp.asarray(x), jnp.asarray(to_scaled_u(prob_flagship, u)), p0
            )
        )
        off = 0
        for name, n in prob_flagship.ineq_groups:
            if name == "collision_pair_distances":
                ours = h[off : off + n]
                break
            off += n
        ref = oracle.obstacle_rows_flagship(torch.tensor(x)).detach().numpy()
        np.testing.assert_allclose(np.sort(ours), np.sort(ref), atol=1e-9)


def test_flagship_stage_cost_pointwise(prob_flagship):
    rng = np.random.default_rng(14)
    params = prob_flagship.stage_params(0.0)
    p0 = {k: v[0] for k, v in params["stage"].items()}
    for _ in range(5):
        x, u = rand_xu_flagship(rng)
        ours = float(
            prob_flagship.ocp.stage_cost(
                jnp.asarray(x), jnp.asarray(to_scaled_u(prob_flagship, u)), p0
            )
        )
        ref = float(
            oracle.stage_cost_flagship(torch.tensor(x), torch.tensor(u))
        )
        assert abs(ours - ref) < 1e-9 * max(1.0, abs(ref))


@pytest.mark.slow
def test_kkt_certificate_flagship(prob_flagship):
    """Our converged flagship solution is a constrained stationary point of
    the independent flagship transcription: feasibility of the independent
    eq/ineq stacks, then least-squares multipliers give a small
    stationarity residual with correctly-signed inequality/bound
    multipliers (frictional cones + obstacle rows included).

    The cold flagship solve needs the dual safeguarding the frictional
    configs use in production (several primal steps per damped dual step);
    the plain one-step PHR update limit-cycles on the cone/NE coupling
    at this scale (measured: eq 1.2e-2 plain vs 2.9e-4 safeguarded)."""
    al = ALConfig(
        iterations=3000, rho_eq=10.0, rho_ineq=10.0,
        dual_update_every=3, dual_step=0.5,
    )
    sol = jax.jit(
        lambda p, x, s: solve(prob_flagship.ocp, al, p, x, s)
    )(
        prob_flagship.stage_params(0.0), prob_flagship.x0,
        zeros_warm_start(prob_flagship.ocp, prob_flagship.x0),
    )
    z = to_physical_U(prob_flagship, sol.state.U).reshape(-1)

    eq_f, eq_j = oracle.np_fun(oracle.eq_vec_flagship_t)
    iq_f, iq_j = oracle.np_fun(oracle.ineq_vec_flagship_t)
    obj_f, obj_j = oracle.np_fun(oracle.objective_flagship_t)
    c_eq = eq_f(z)
    h = iq_f(z)
    assert np.abs(c_eq).max() < 1e-3, np.abs(c_eq).max()
    assert h.min() > -1e-4, h.min()

    g = obj_j(z)
    Jeq = eq_j(z)
    lo, hi = oracle.z_bounds_flagship()
    # the AL leaves near-active cone rows at h ~ 1e-4 carrying real
    # multipliers, so use a matching activity tolerance and solve the
    # SIGN-CONSTRAINED stationarity system (mu >= 0 built in — the KKT
    # condition itself, strictly stronger than lstsq + a posteriori sign
    # check): min |g + Jeq^T lam - sum mu_i grad h_i| s.t. mu >= 0
    act_iq = h < 1e-3
    act_lo = z - lo < 1e-7
    act_hi = hi - z < 1e-7
    cols = [Jeq.T]
    n_eq = Jeq.shape[0]
    if act_iq.any():
        cols.append(-iq_j(z)[act_iq].T)
    B = []
    for i in np.where(act_lo)[0]:
        e = np.zeros_like(z)
        e[i] = -1.0
        B.append(e)
    for i in np.where(act_hi)[0]:
        e = np.zeros_like(z)
        e[i] = 1.0
        B.append(e)
    if B:
        cols.append(-np.stack(B, axis=1))
    A = np.concatenate(cols, axis=1)
    from scipy.optimize import lsq_linear

    lb = np.concatenate([-np.inf * np.ones(n_eq), np.zeros(A.shape[1] - n_eq)])
    ub = np.inf * np.ones(A.shape[1])
    # bvls: exact active-set BVLS (the default trf stalls at rel ~ 1e2 on
    # this 420 x ~190 system; bvls reaches the lstsq optimum with mu >= 0)
    res = lsq_linear(
        A, -g, bounds=(lb, ub), method="bvls", max_iter=3 * A.shape[1]
    )
    rel = np.linalg.norm(g + A @ res.x) / max(np.linalg.norm(g), 1e-12)
    assert rel < 1e-2, rel
