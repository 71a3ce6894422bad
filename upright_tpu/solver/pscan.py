"""Parallel (associative-scan) Riccati backward pass.

The horizon axis is this engine's "sequence" axis (SURVEY.md §5.7): HPIPM
processes it with a sequential Riccati recursion; here the same recursion is
reformulated as an *associative* combination of conditional value functions,
so `jax.lax.associative_scan` evaluates it in O(log N) depth (Särkkä &
García-Fernández-style temporal parallelization of LQT, re-derived for the
general multiple-shooting SQP subproblem with cross terms, linear terms and
defects).

Element e = (A, b, C, J, eta) over a stage span [i, j) represents the
partially-minimized (conditional) value function

  V_{i,j}(x_i, x_j) = min_{u_i..u_{j-1}}  sum of stage costs
    = 1/2 (x_j - A x_i - b)^T C^{-1} (x_j - A x_i - b)
      + 1/2 x_i^T J x_i - eta^T x_i  (+ const)

with C possibly singular (handled by never inverting C alone).  For a single
stage with dynamics  dx' = A dx + B du + d  and AL-quadratic cost
1/2 dx'Q dx + q'dx + 1/2 du'R du + r'du + du'L dx, eliminating du under the
transition constraint gives

  A_e = A - B R^{-1} L,  b_e = d - B R^{-1} r,  C_e = B R^{-1} B^T,
  J_e = Q - L^T R^{-1} L,  eta_e = -(q - L^T R^{-1} r).

The terminal element is (0, 0, 0, P_f, -p_f).  After a reverse associative
scan of suffix combinations, element k yields the cost-to-go
V_k(x) = 1/2 x^T J x - eta^T x, i.e. P_k = J_k, p_k = -eta_k; the feedback
gains then come from the standard one-step minimization against V_{k+1}.

Used for long-horizon offline (robust) planning where N is in the hundreds;
for N = 20 online MPC the sequential lax.scan is typically faster per
instance, and batch is the throughput axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _combine(e_earlier, e_later):
    """Associative combination of conditional value functions.

    e_earlier spans [i, m), e_later spans [m, j); returns the element for
    [i, j).  Both arguments may be batched (leading dims broadcast).
    """
    A1, b1, C1, J1, n1 = e_earlier
    A2, b2, C2, J2, n2 = e_later

    nx = A1.shape[-1]
    I = jnp.eye(nx, dtype=A1.dtype)

    # (I + C1 J2)^{-1} shared factor
    M = I + C1 @ J2
    # solve instead of inverse for stability
    M_inv = jnp.linalg.solve(M, I)
    N_inv = jnp.linalg.solve((I + J2 @ C1), I)

    def mv(M_, v_):
        return jnp.einsum("...ij,...j->...i", M_, v_)

    A = A2 @ M_inv @ A1
    b = mv(A2 @ M_inv, b1 + mv(C1, n2)) + b2
    C = A2 @ M_inv @ C1 @ A2.mT + C2
    n = mv(A1.mT @ N_inv, n2 - mv(J2, b1)) + n1
    J = A1.mT @ N_inv @ J2 @ A1 + J1
    return (A, b, C, J, n)


def _stage_elements(A, B, d, grads, hess, reg):
    """Vectorized element construction for all N stages."""
    nx = A.shape[-1]
    nu = B.shape[-1]

    lx = grads[:, :nx]
    lu = grads[:, nx:]
    Q = hess[:, :nx, :nx]
    L = hess[:, nx:, :nx]
    R = hess[:, nx:, nx:] + reg * jnp.eye(nu)

    Ri_L = jnp.linalg.solve(R, L)  # R^{-1} L
    Ri_r = jnp.linalg.solve(R, lu[..., None])[..., 0]  # R^{-1} r
    Ri_Bt = jnp.linalg.solve(R, jnp.swapaxes(B, -1, -2))  # R^{-1} B^T

    A_e = A - B @ Ri_L
    b_e = d - jnp.einsum("kij,kj->ki", B, Ri_r)
    C_e = B @ Ri_Bt
    J_e = Q - jnp.swapaxes(L, -1, -2) @ Ri_L
    n_e = -(lx - jnp.einsum("kji,kj->ki", L, Ri_r))
    return (A_e, b_e, C_e, J_e, n_e)


def parallel_backward_pass(A, B, d, grads, hess, gf, Hf, reg=1e-6):
    """Drop-in replacement for the sequential Riccati scan
    (al._backward_pass): returns (K, kff) with identical semantics.

    A: (N, nx, nx), B: (N, nx, nu), d: (N, nx) defects,
    grads/hess: (N, nx+nu[, nx+nu]) AL derivatives, gf/Hf terminal.
    """
    N, nx = A.shape[0], A.shape[1]
    nu = B.shape[-1]

    elems = _stage_elements(A, B, d, grads, hess, reg)
    # append the terminal element
    zero = jnp.zeros((1, nx, nx))
    term = (
        zero,
        jnp.zeros((1, nx)),
        zero,
        Hf[None],
        -gf[None],
    )
    elems = jax.tree.map(lambda s, t: jnp.concatenate([s, t], axis=0), elems, term)

    # reverse associative scan: element k becomes the combination over [k, N].
    # NOTE: with reverse=True the operands arrive as (later, earlier), so the
    # combination arguments are swapped.
    suffix = jax.lax.associative_scan(
        lambda a, b: _combine(b, a), elems, reverse=True, axis=0
    )
    _, _, _, J_all, n_all = suffix
    P = J_all  # (N+1, nx, nx) cost-to-go Hessians
    p = -n_all  # (N+1, nx) cost-to-go gradients

    # gains from the one-step minimization against V_{k+1}
    lx = grads[:, :nx]
    lu = grads[:, nx:]
    Q = hess[:, :nx, :nx]
    L = hess[:, nx:, :nx]
    R = hess[:, nx:, nx:] + reg * jnp.eye(nu)

    P1 = P[1:]
    p1 = p[1:]

    Pd_p = p1 + jnp.einsum("kij,kj->ki", P1, d)
    Qu = lu + jnp.einsum("kji,kj->ki", B, Pd_p)
    Quu = R + jnp.swapaxes(B, -1, -2) @ P1 @ B
    Qux = L + jnp.swapaxes(B, -1, -2) @ P1 @ A

    K = -jnp.linalg.solve(Quu, Qux)
    kff = -jnp.linalg.solve(Quu, Qu[..., None])[..., 0]
    return K, kff
