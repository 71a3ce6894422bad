"""Pallas Riccati kernel vs the sequential backward pass (interpret mode on
CPU; the compiled path runs on real TPU via bench/solver integration)."""

import jax
import jax.numpy as jnp
import numpy as np

from upright_tpu.solver.al import ALConfig, _backward_pass
from upright_tpu.solver.ocp import OCP
from upright_tpu.solver.pallas_riccati import pallas_backward_pass


def random_batch(Bt, N, nx, nu, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((Bt, N, nx, nx)) * 0.2 + np.eye(nx)
    B = rng.standard_normal((Bt, N, nx, nu))
    d = rng.standard_normal((Bt, N, nx)) * 0.05
    grads = rng.standard_normal((Bt, N, nx + nu))
    M = rng.standard_normal((Bt, N, nx + nu, nx + nu))
    hess = 0.1 * np.einsum("bkij,bklj->bkil", M, M) + np.eye(nx + nu)
    gf = rng.standard_normal((Bt, nx))
    Mf = rng.standard_normal((Bt, nx, nx))
    Hf = 0.1 * np.einsum("bij,blj->bil", Mf, Mf) + np.eye(nx)
    return tuple(jnp.asarray(x) for x in (A, B, d, grads, hess, gf, Hf))


def test_pallas_matches_sequential():
    Bt, N, nx, nu = 8, 6, 5, 3
    A, B, d, grads, hess, gf, Hf = random_batch(Bt, N, nx, nu)
    reg = 1e-6

    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    K_p, k_p = pallas_backward_pass(
        f32(A), f32(B), f32(d), f32(grads), f32(hess), f32(gf), f32(Hf),
        reg=reg, block=4, interpret=True
    )

    cfg = ALConfig(reg=reg)
    ocp = OCP(N=N, nx=nx, nu=nu, n_eq=0, n_ineq=0, n_feq=0,
              dynamics=None, stage_cost=None, eq=None, ineq=None,
              final_cost=None, final_eq=None)
    Ks, ks = [], []
    for i in range(Bt):
        K_i, k_i = _backward_pass(ocp, cfg, A[i], B[i], d[i], grads[i], hess[i], gf[i], Hf[i])
        Ks.append(K_i)
        ks.append(k_i)
    K_s, k_s = jnp.stack(Ks), jnp.stack(ks)

    assert np.allclose(K_p, K_s, atol=5e-3), np.abs(np.asarray(K_p) - np.asarray(K_s)).max()
    assert np.allclose(k_p, k_s, atol=5e-3), np.abs(np.asarray(k_p) - np.asarray(k_s)).max()


def test_pallas_mpc_shapes():
    """Kernel handles the real MPC dimensions (N=20, nx=27, nu=13)."""
    Bt, N, nx, nu = 8, 20, 27, 13
    args = tuple(jnp.asarray(x, dtype=jnp.float32) for x in random_batch(Bt, N, nx, nu, seed=1))
    K, kff = pallas_backward_pass(*args, reg=1e-6, block=8, interpret=True)
    assert K.shape == (Bt, N, nu, nx)
    assert np.isfinite(np.asarray(K)).all()
