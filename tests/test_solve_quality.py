"""Golden-trajectory solve-quality gate (VERDICT r1 item 1).

BASELINE.md requires control trajectories within 1e-3 of the (converged)
baseline.  The oracle here is a deeply converged AL-SQP solve of the flagship
problems; the production path — the warm-started 1-iteration SQP the MPC runs
at the replan rate (reference config/controller.yaml:55-67) — must stay
within 1e-3 of it in x and u, and the converged constraint violation must be
below 1e-3 on the mass-normalized residuals
(balancing_constraints.cpp:139-151 normalization).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import upright_tpu.config as cfg
from upright_tpu.ocp.problem import build_problem
from upright_tpu.solver.al import ALConfig, solve
from upright_tpu.solver.ocp import zeros_warm_start

LS8 = (1.0, 0.5, 0.25, 0.1, 0.03, 0.01, 0.003, 0.001)


def _load(demo):
    path = cfg.resolve_package_path({"package": "configs", "path": demo})
    return cfg.load_config(path)


def _converged_oracle(prob, iterations=200):
    params = prob.stage_params(0.0)
    oracle_cfg = ALConfig(iterations=iterations)
    sol = jax.jit(lambda p, x, s: solve(prob.ocp, oracle_cfg, p, x, s))(
        params, prob.x0, zeros_warm_start(prob.ocp, prob.x0)
    )
    return params, sol


@pytest.fixture(scope="module")
def ur10_oracle():
    prob = build_problem(_load("demos/ur10_demo.yaml"))
    params, sol = _converged_oracle(prob)
    return prob, params, sol


def test_converged_eq_viol_below_1e3_ur10(ur10_oracle):
    _, _, sol = ur10_oracle
    assert float(sol.eq_viol) < 1e-3
    assert float(sol.ineq_viol) < 1e-6
    assert float(sol.defect) < 1e-9


def test_mpc_path_within_1e3_of_oracle_ur10(ur10_oracle):
    """The production warm-started 1-iteration re-solve sequence stays
    within 1e-3 of the converged solution in x and u."""
    prob, params, oracle = ur10_oracle
    mpc_cfg = ALConfig(iterations=1)
    jsolve = jax.jit(lambda p, x, s: solve(prob.ocp, mpc_cfg, p, x, s))
    st = oracle.state
    for _ in range(5):
        sol = jsolve(params, prob.x0, st)
        dX = float(jnp.abs(sol.state.X - oracle.state.X).max())
        dU = float(jnp.abs(sol.state.U - oracle.state.U).max())
        assert dX < 1e-3, dX
        assert dU < 1e-3, dU
        st = sol.state


def test_line_search_4_equals_8_ur10(ur10_oracle):
    """The benchmark's 4-candidate line search is bit-identical to the full
    8-candidate ladder on the nominal (warm-started tracking) workload —
    the claim bench.py makes, as an actual test."""
    prob, params, oracle = ur10_oracle
    ls8 = ALConfig(iterations=1, line_search_steps=LS8)
    ls4 = dataclasses.replace(ls8, line_search_steps=LS8[:4])
    s8 = jax.jit(lambda p, x, s: solve(prob.ocp, ls8, p, x, s))(
        params, prob.x0, oracle.state
    )
    s4 = jax.jit(lambda p, x, s: solve(prob.ocp, ls4, p, x, s))(
        params, prob.x0, oracle.state
    )
    assert bool(jnp.all(s4.state.X == s8.state.X))
    assert bool(jnp.all(s4.state.U == s8.state.U))
    assert bool(jnp.all(s4.K == s8.K))


def test_line_search_2_matches_8_replanned_ur10(ur10_oracle):
    """The 2-candidate line search tracks the full 8-candidate ladder to
    float-reassociation noise (~1e-14) over a replanned MPC sequence with
    plant drift: on the warm-started nominal workload alpha = 1 always wins,
    so dropping candidates only changes XLA fusion order, not the selected
    step.  (Exact bit-identity holds for 4 vs 8 — test above; at 2 the
    vmapped merit layout changes and float order with it.)  This backs
    bench.py's BENCH_LS=2 configuration."""
    prob, params, oracle = ur10_oracle

    def run(nls, steps=12):
        c = ALConfig(iterations=1, line_search_steps=LS8[:nls])
        js = jax.jit(lambda p, x, s: solve(prob.ocp, c, p, x, s))
        st = oracle.state
        rng = np.random.default_rng(7)
        x0 = np.asarray(prob.x0)
        xs = []
        for _ in range(steps):
            sol = js(params, jnp.asarray(x0), st)
            st = sol.state
            x0 = np.asarray(st.X[1]) + 1e-4 * rng.standard_normal(prob.ocp.nx)
            xs.append(np.asarray(st.X))
        return np.stack(xs)

    X8 = run(8)
    X2 = run(2)
    assert float(np.abs(X2 - X8).max()) < 1e-12


@pytest.mark.slow
def test_golden_gate_thing():
    """Same gate on the full mobile-manipulator flagship (thing_demo)."""
    prob = build_problem(_load("demos/thing_demo.yaml"))
    params, oracle = _converged_oracle(prob)
    assert float(oracle.eq_viol) < 1e-3
    mpc_cfg = ALConfig(iterations=1)
    jsolve = jax.jit(lambda p, x, s: solve(prob.ocp, mpc_cfg, p, x, s))
    st = oracle.state
    for _ in range(5):
        sol = jsolve(params, prob.x0, st)
        assert float(jnp.abs(sol.state.X - oracle.state.X).max()) < 1e-3
        assert float(jnp.abs(sol.state.U - oracle.state.U).max()) < 1e-3
        st = sol.state
