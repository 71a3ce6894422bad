"""Parallel-scan Riccati pass must match the sequential scan exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from upright_tpu.solver.al import ALConfig, _backward_pass
from upright_tpu.solver.ocp import OCP
from upright_tpu.solver.pscan import parallel_backward_pass


def random_lqr(N, nx, nu, seed=0):
    rng = np.random.default_rng(seed)
    A = jnp.asarray(rng.standard_normal((N, nx, nx)) * 0.3 + np.eye(nx))
    B = jnp.asarray(rng.standard_normal((N, nx, nu)))
    d = jnp.asarray(rng.standard_normal((N, nx)) * 0.1)
    grads = jnp.asarray(rng.standard_normal((N, nx + nu)))
    # SPD-ish Hessians with cross terms
    hs = []
    for k in range(N):
        M = rng.standard_normal((nx + nu, nx + nu))
        hs.append(M @ M.T * 0.1 + np.eye(nx + nu))
    hess = jnp.asarray(np.stack(hs))
    gf = jnp.asarray(rng.standard_normal(nx))
    Mf = rng.standard_normal((nx, nx))
    Hf = jnp.asarray(Mf @ Mf.T * 0.1 + np.eye(nx))
    return A, B, d, grads, hess, gf, Hf


def test_parallel_matches_sequential():
    N, nx, nu = 24, 6, 3
    A, B, d, grads, hess, gf, Hf = random_lqr(N, nx, nu)
    reg = 1e-8
    cfg = ALConfig(reg=reg)
    ocp = OCP(
        N=N, nx=nx, nu=nu, n_eq=0, n_ineq=0, n_feq=0,
        dynamics=None, stage_cost=None, eq=None, ineq=None,
        final_cost=None, final_eq=None,
    )
    K_seq, k_seq = _backward_pass(ocp, cfg, A, B, d, grads, hess, gf, Hf)
    K_par, k_par = parallel_backward_pass(A, B, d, grads, hess, gf, Hf, reg=reg)
    assert np.allclose(K_par, K_seq, atol=1e-7), np.abs(K_par - K_seq).max()
    assert np.allclose(k_par, k_seq, atol=1e-7), np.abs(k_par - k_seq).max()


def test_parallel_long_horizon():
    N, nx, nu = 200, 4, 2
    A, B, d, grads, hess, gf, Hf = random_lqr(N, nx, nu, seed=1)
    reg = 1e-8
    cfg = ALConfig(reg=reg)
    ocp = OCP(
        N=N, nx=nx, nu=nu, n_eq=0, n_ineq=0, n_feq=0,
        dynamics=None, stage_cost=None, eq=None, ineq=None,
        final_cost=None, final_eq=None,
    )
    K_seq, k_seq = _backward_pass(ocp, cfg, A, B, d, grads, hess, gf, Hf)
    K_par, k_par = parallel_backward_pass(A, B, d, grads, hess, gf, Hf, reg=reg)
    assert np.allclose(K_par, K_seq, atol=1e-6)
    assert np.allclose(k_par, k_seq, atol=1e-6)


def test_jit_and_grad_safe():
    N, nx, nu = 12, 4, 2
    A, B, d, grads, hess, gf, Hf = random_lqr(N, nx, nu, seed=2)
    f = jax.jit(lambda *args: parallel_backward_pass(*args, reg=1e-8))
    K, kff = f(A, B, d, grads, hess, gf, Hf)
    assert np.isfinite(np.asarray(K)).all()
