"""ALConfig.backward routing: all three Riccati backends must be reachable
from the production solve path and agree with each other (VERDICT r1 item 3 /
SURVEY §5.7: horizon parallelism as a first-class component)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upright_tpu.solver.al import ALConfig, solve
from upright_tpu.solver.ocp import OCP, zeros_warm_start


def make_problem(N=20, nx=4, nu=2, seed=0):
    rng = np.random.default_rng(seed)
    A = jnp.asarray(np.eye(nx) + 0.05 * rng.standard_normal((nx, nx)))
    B = jnp.asarray(0.1 * rng.standard_normal((nx, nu)))
    Q = jnp.eye(nx)
    R = 0.1 * jnp.eye(nu)

    def dynamics(x, u, p):
        return A @ x + B @ u

    def stage_cost(x, u, p):
        return 0.5 * x @ Q @ x + 0.5 * u @ R @ u

    def zero_eq(x, u, p):
        return jnp.zeros((0,))

    ocp = OCP(
        N=N, nx=nx, nu=nu, n_eq=0, n_ineq=0, n_feq=0,
        dynamics=dynamics, stage_cost=stage_cost, eq=zero_eq, ineq=zero_eq,
        final_cost=lambda x, p: 5.0 * x @ x, final_eq=lambda x, p: jnp.zeros((0,)),
    )
    x0 = jnp.asarray(rng.standard_normal(nx))
    params = {"stage": {"t": jnp.zeros(N)}, "final": {"t": jnp.zeros(())}}
    return ocp, params, x0


@pytest.mark.parametrize("backend", ["pscan", "pallas"])
def test_backend_matches_scan(backend):
    ocp, params, x0 = make_problem()
    base = ALConfig(iterations=3, backward="scan")
    cfg = dataclasses.replace(
        base, backward=backend, pallas_interpret=(backend == "pallas")
    )
    ws = zeros_warm_start(ocp, x0)
    sol_scan = jax.jit(lambda p, x, s: solve(ocp, base, p, x, s))(params, x0, ws)
    sol_alt = jax.jit(lambda p, x, s: solve(ocp, cfg, p, x, s))(params, x0, ws)
    np.testing.assert_allclose(sol_alt.state.X, sol_scan.state.X, atol=1e-6)
    np.testing.assert_allclose(sol_alt.state.U, sol_scan.state.U, atol=1e-6)
    np.testing.assert_allclose(sol_alt.K, sol_scan.K, atol=1e-5)


def test_plan_robust_parallel_scan_real():
    """plan_robust(use_parallel_scan=True) must actually change the backward
    pass and produce the same long-horizon plan."""
    from upright_tpu.config import load_config
    from upright_tpu.robust.planning import plan_robust

    config = load_config("configs/demos/ur10_demo.yaml")
    _, sol_seq, plan_seq = plan_robust(config, duration=4.0, iterations=10)
    _, sol_par, plan_par = plan_robust(
        config, duration=4.0, iterations=10, use_parallel_scan=True
    )
    assert plan_par.X.shape[0] == 41  # N = 40 long horizon
    np.testing.assert_allclose(plan_par.X, plan_seq.X, atol=1e-5)
    np.testing.assert_allclose(plan_par.U, plan_seq.U, atol=1e-5)


def test_linear_dynamics_bit_identical():
    """linear_dynamics=True (one trace-time linearization, A/B as
    loop-invariant scan constants) must match the per-stage jacfwd path
    bit-for-bit — the dynamics here are exactly linear, so the Jacobians
    are the same numbers either way; only the computation layout differs."""
    ocp, params, x0 = make_problem()
    cfg = ALConfig(iterations=3)
    ws = zeros_warm_start(ocp, x0)
    ocp_lin = dataclasses.replace(ocp, linear_dynamics=True)
    sol = jax.jit(lambda p, x, s: solve(ocp, cfg, p, x, s))(params, x0, ws)
    sol_lin = jax.jit(lambda p, x, s: solve(ocp_lin, cfg, p, x, s))(
        params, x0, ws
    )
    np.testing.assert_array_equal(np.asarray(sol_lin.state.X),
                                  np.asarray(sol.state.X))
    np.testing.assert_array_equal(np.asarray(sol_lin.state.U),
                                  np.asarray(sol.state.U))


def test_linear_dynamics_full_problem():
    """sqp.linear_dynamics on the real upright OCP (triple integrator +
    balance constraints): bit-identical solve through build_problem."""
    from upright_tpu.config import load_config
    from upright_tpu.ocp.problem import build_problem

    config = load_config("configs/demos/ur10_demo.yaml")
    prob = build_problem(config)
    config["controller"].setdefault("sqp", {})["linear_dynamics"] = True
    prob_lin = build_problem(config)
    assert prob_lin.ocp.linear_dynamics

    cfg = ALConfig(iterations=2, rho_eq=10.0, rho_ineq=10.0)
    p = prob.stage_params(0.0)
    ws = zeros_warm_start(prob.ocp, prob.x0)
    sol = jax.jit(lambda pp, xx, ss: solve(prob.ocp, cfg, pp, xx, ss))(
        p, prob.x0, ws
    )
    sol_lin = jax.jit(
        lambda pp, xx, ss: solve(prob_lin.ocp, cfg, pp, xx, ss)
    )(p, prob.x0, ws)
    np.testing.assert_array_equal(np.asarray(sol_lin.state.X),
                                  np.asarray(sol.state.X))
    np.testing.assert_array_equal(np.asarray(sol_lin.state.U),
                                  np.asarray(sol.state.U))
