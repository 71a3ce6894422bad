"""Solver correctness tests on analytic problems.

The AL-SQP solver must reproduce:
  1. the exact unconstrained LQR solution (one iteration, direct KKT oracle);
  2. equality-constrained targets via multiplier iteration;
  3. inequality (box) constraints via the AL penalty;
  4. batched solves identical to individual solves (vmap consistency).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upright_tpu.solver.al import ALConfig, solve
from upright_tpu.solver.ocp import OCP, SolverState, zeros_warm_start


def make_double_integrator(N=10, dt=0.1, n_ineq=0, n_feq=0, u_max=None, x_goal=None):
    """1-D double integrator: x = [pos, vel], u = accel."""
    nx, nu = 2, 1
    A = jnp.array([[1.0, dt], [0.0, 1.0]])
    B = jnp.array([[0.5 * dt**2], [dt]])
    Q = jnp.diag(jnp.array([1.0, 0.1]))
    R = jnp.array([[0.01]])
    Qf = jnp.diag(jnp.array([100.0, 10.0]))

    def dynamics(x, u, p):
        return A @ x + B @ u

    def stage_cost(x, u, p):
        return 0.5 * x @ Q @ x + 0.5 * u @ R @ u

    def eq(x, u, p):
        return jnp.zeros((0,))

    def ineq(x, u, p):
        if n_ineq == 0:
            return jnp.zeros((0,))
        # |u| <= u_max as two rows
        return jnp.concatenate([u_max - u, u + u_max])

    def final_cost(x, p):
        if x_goal is None:
            return 0.5 * x @ Qf @ x
        return 0.0

    def final_eq(x, p):
        if n_feq == 0:
            return jnp.zeros((0,))
        return x - x_goal

    ocp = OCP(
        N=N, nx=nx, nu=nu, n_eq=0, n_ineq=n_ineq, n_feq=n_feq,
        dynamics=dynamics, stage_cost=stage_cost, eq=eq, ineq=ineq,
        final_cost=final_cost, final_eq=final_eq,
        stage_quad=stage_cost, final_quad=final_cost,
        u_lb=None if u_max is None else -u_max,
        u_ub=None if u_max is None else u_max,
    )
    return ocp, (np.asarray(A), np.asarray(B), np.asarray(Q), np.asarray(R), np.asarray(Qf))


def empty_params(N):
    return {"stage": jnp.zeros((N, 0)), "final": jnp.zeros((0,))}


def lqr_oracle(A, B, Q, R, Qf, x0, N):
    """Direct dense KKT solution of the unconstrained LQ problem."""
    nx, nu = B.shape
    nz = N * (nx + nu)  # decision: u_0, x_1, u_1, ..., x_N

    # build H and equality constraints x_{k+1} = A x_k + B u_k
    H = np.zeros((nz, nz))
    # ordering: [u_0, x_1, u_1, x_2, ..., u_{N-1}, x_N]
    def u_idx(k):
        return k * (nx + nu)

    def x_idx(k):  # k >= 1
        return (k - 1) * (nx + nu) + nu

    for k in range(N):
        H[u_idx(k) : u_idx(k) + nu, u_idx(k) : u_idx(k) + nu] = R
    for k in range(1, N):
        H[x_idx(k) : x_idx(k) + nx, x_idx(k) : x_idx(k) + nx] = Q
    H[x_idx(N) : x_idx(N) + nx, x_idx(N) : x_idx(N) + nx] = Qf

    # constraint rows: x_{k+1} - A x_k - B u_k = 0 (x_0 fixed)
    nc = N * nx
    C = np.zeros((nc, nz))
    b = np.zeros(nc)
    for k in range(N):
        rows = slice(k * nx, (k + 1) * nx)
        C[rows, u_idx(k) : u_idx(k) + nu] = -B
        C[rows, x_idx(k + 1) : x_idx(k + 1) + nx] = np.eye(nx)
        if k == 0:
            b[rows] = A @ x0
        else:
            C[rows, x_idx(k) : x_idx(k) + nx] = -A
    KKT = np.block([[H, C.T], [C, np.zeros((nc, nc))]])
    rhs = np.concatenate([np.zeros(nz), b])
    sol = np.linalg.solve(KKT, rhs)
    z = sol[:nz]
    U = np.stack([z[u_idx(k) : u_idx(k) + nu] for k in range(N)])
    X = np.vstack([x0[None], [z[x_idx(k) : x_idx(k) + nx] for k in range(1, N + 1)]])
    return X, U


def test_lqr_matches_oracle():
    N = 10
    ocp, (A, B, Q, R, Qf) = make_double_integrator(N=N)
    x0 = jnp.array([1.0, 0.0])
    cfg = ALConfig(iterations=1, update_multipliers=False, reg=1e-10)
    sol = solve(ocp, cfg, empty_params(N), x0, zeros_warm_start(ocp, x0))

    X_o, U_o = lqr_oracle(A, B, Q, R, Qf, np.array([1.0, 0.0]), N)
    assert np.allclose(sol.state.U, U_o, atol=1e-8)
    assert np.allclose(sol.state.X, X_o, atol=1e-8)
    assert sol.defect < 1e-10


def test_lqr_jit_and_warm_start_idempotent():
    N = 10
    ocp, _ = make_double_integrator(N=N)
    x0 = jnp.array([1.0, 0.0])
    cfg = ALConfig(iterations=1, update_multipliers=False, reg=1e-10)
    jsolve = jax.jit(lambda p, x, s: solve(ocp, cfg, p, x, s))
    sol1 = jsolve(empty_params(N), x0, zeros_warm_start(ocp, x0))
    sol2 = jsolve(empty_params(N), x0, sol1.state)
    # LQ problem: one iteration from the optimum stays at the optimum
    assert np.allclose(sol1.state.U, sol2.state.U, atol=1e-8)


def test_terminal_equality_via_multipliers():
    """Terminal equality converges as multipliers iterate (ALM outer loop)."""
    N = 10
    x_goal = jnp.array([1.0, 0.0])
    ocp, _ = make_double_integrator(N=N, n_feq=2, x_goal=x_goal)
    x0 = jnp.zeros(2)
    cfg = ALConfig(iterations=2, rho_eq=100.0)
    state = zeros_warm_start(ocp, x0)
    params = empty_params(N)
    jsolve = jax.jit(lambda s: solve(ocp, cfg, params, x0, s))
    for _ in range(10):
        sol = jsolve(state)
        state = sol.state
    assert float(sol.eq_viol) < 1e-4
    assert np.allclose(state.X[-1], x_goal, atol=1e-4)


def test_input_box_constraint():
    """Aggressive goal + tight input bound: bound respected to AL tolerance."""
    N = 20
    u_max = jnp.array([1.0])
    ocp, _ = make_double_integrator(N=N, n_ineq=2, u_max=u_max)
    x0 = jnp.array([5.0, 0.0])
    cfg = ALConfig(iterations=5, rho_ineq=100.0)
    state = zeros_warm_start(ocp, x0)
    params = empty_params(N)
    jsolve = jax.jit(lambda s: solve(ocp, cfg, params, x0, s))
    for _ in range(8):
        sol = jsolve(state)
        state = sol.state
    assert float(sol.ineq_viol) < 1e-6  # bounds are clamped in the rollout
    # the bound is actually active for this problem
    assert float(jnp.max(jnp.abs(state.U))) > 0.9


def test_vmap_batch_consistency():
    N = 10
    ocp, _ = make_double_integrator(N=N)
    cfg = ALConfig(iterations=1, update_multipliers=False)
    x0s = jnp.array([[1.0, 0.0], [-2.0, 1.0], [0.5, -0.5]])
    params = empty_params(N)

    batched = jax.vmap(lambda x: solve(ocp, cfg, params, x, zeros_warm_start(ocp, x)))
    sols = batched(x0s)
    for i in range(3):
        si = solve(ocp, cfg, params, x0s[i], zeros_warm_start(ocp, x0s[i]))
        assert np.allclose(sols.state.U[i], si.state.U, atol=1e-10)


def test_feedback_gains_stabilize():
    """The returned K is the LQR feedback: perturbed rollouts converge."""
    N = 10
    ocp, _ = make_double_integrator(N=N)
    x0 = jnp.array([1.0, 0.0])
    cfg = ALConfig(iterations=1, update_multipliers=False)
    sol = solve(ocp, cfg, empty_params(N), x0, zeros_warm_start(ocp, x0))
    K0 = np.asarray(sol.K[0])
    assert K0.shape == (1, 2)
    # gains push the state toward the origin: negative position feedback
    assert K0[0, 0] < 0
