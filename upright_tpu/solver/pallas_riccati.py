"""Pallas TPU kernel: fused batched Riccati backward pass.

The hot op of the batched MPC solver is the backward LQR recursion: for each
of B problem instances, scan N stages of (27x27 / 13x13) matrix algebra.
XLA's lowering keeps the per-stage tensors in HBM between the scan steps; the
Pallas version holds the whole cost-to-go state (P, p) of a block of
instances in VMEM across the entire horizon loop and lane-parallelizes every
scalar operation over the batch block:

  - grid over batch blocks (BLOCK instances per program)
  - within the kernel, a reverse fori_loop over the N stages
  - all matrix products via dot_general with the batch block as the leading
    (lane) dimension
  - the Quu solve is an unrolled Cholesky factor/solve where each scalar
    operation is a (BLOCK,)-wide VPU vector op — no per-instance loops

Numerics match al._backward_pass (same recursion, same regularization).
Selected via ``ALConfig(backward="pallas")`` (al.solve routes its backward
pass through this kernel; under vmap the batch axis becomes a grid axis);
the interpret-mode path makes the kernel testable on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_factor_batched(Quu):
    """Cholesky factor of a batch block, unrolled: Quu (B, n, n) SPD ->
    lower-triangular factors as a list-of-lists of (B,) lane vectors.  Every
    scalar operation is a (B,)-wide VPU vector op; n is small (nu ~ 10-13)."""
    _, n, _ = Quu.shape
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = Quu[:, i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]
    return L


def _chol_apply_batched(L, rhs):
    """Solve (L L^T) X = rhs with a prebuilt factor; rhs (B, n, m)."""
    n = len(L)
    y = [None] * n
    for i in range(n):
        s = rhs[:, i, :]
        for k in range(i):
            s = s - L[i][k][:, None] * y[k]
        y[i] = s / L[i][i][:, None]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i][:, None] * x[k]
        x[i] = s / L[i][i][:, None]
    return jnp.stack(x, axis=1)  # (B, n, m)


def _bmm(a, b):
    """Batched matmul (B, i, k) @ (B, k, j) -> (B, i, j) via dot_general."""
    return jax.lax.dot_general(
        a, b, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )


def _bmtm(a, b):
    """(B, k, i)^T-batched: a^T b -> (B, i, j)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )


def _riccati_kernel(A_ref, B_ref, d_ref, grads_ref, hess_ref, gf_ref, Hf_ref,
                    K_ref, kff_ref, *, N, nx, nu, reg):
    """One batch block: full reverse recursion held in VMEM."""
    P = Hf_ref[:]  # (B, nx, nx)
    p = gf_ref[:]  # (B, nx)

    def stage(idx, carry):
        P, p = carry
        k = N - 1 - idx
        A = A_ref[:, k]  # (B, nx, nx)
        Bm = B_ref[:, k]  # (B, nx, nu)
        d = d_ref[:, k]  # (B, nx)
        g = grads_ref[:, k]  # (B, nx+nu)
        H = hess_ref[:, k]  # (B, nx+nu, nx+nu)

        lx = g[:, :nx]
        lu = g[:, nx:]
        lxx = H[:, :nx, :nx]
        lux = H[:, nx:, :nx]
        luu = H[:, nx:, nx:]

        Pd_p = p + _bmm(P, d[..., None])[..., 0]
        Qx = lx + _bmtm(A, Pd_p[..., None])[..., 0]
        Qu = lu + _bmtm(Bm, Pd_p[..., None])[..., 0]
        PA = _bmm(P, A)
        PB = _bmm(P, Bm)
        Qxx = lxx + _bmtm(A, PA)
        Quu = luu + _bmtm(Bm, PB) + reg * jnp.eye(nu, dtype=P.dtype)
        Qux = lux + _bmtm(Bm, PA)

        # factor once, solve for the gain and the feedforward separately
        # (avoids a lane-unaligned concatenate the TPU lowering rejects)
        L = _chol_factor_batched(Quu)
        K = -_chol_apply_batched(L, Qux)
        kff = -_chol_apply_batched(L, Qu[..., None])[..., 0]

        K_ref[:, k] = K
        kff_ref[:, k] = kff

        # P = Qxx + Qux^T K  (K already carries the minus sign)
        P_new = Qxx + _bmtm(Qux, K)
        P_new = 0.5 * (P_new + jnp.swapaxes(P_new, -1, -2))
        p_new = Qx + _bmtm(Qux, kff[..., None])[..., 0]
        return P_new, p_new

    jax.lax.fori_loop(0, N, stage, (P, p))


def pallas_backward_pass(A, B, d, grads, hess, gf, Hf, reg=1e-6,
                         block=8, interpret=False):
    """Batched Riccati backward pass as a Pallas kernel.

    A: (Bt, N, nx, nx), B: (Bt, N, nx, nu), d: (Bt, N, nx),
    grads: (Bt, N, nz), hess: (Bt, N, nz, nz), gf: (Bt, nx), Hf: (Bt, nx, nx).
    Returns (K (Bt, N, nu, nx), kff (Bt, N, nu)).
    """
    Bt, N, nx, _ = A.shape
    nu = B.shape[-1]
    if Bt % block:
        raise ValueError(f"batch {Bt} not divisible by block {block}")

    kernel = functools.partial(_riccati_kernel, N=N, nx=nx, nu=nu, reg=reg)

    grid = (Bt // block,)

    def bspec(shape_tail):
        return pl.BlockSpec(
            (block,) + shape_tail,
            lambda i: (i,) + (0,) * len(shape_tail),
            memory_space=pltpu.VMEM,
        )

    K, kff = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            bspec((N, nx, nx)),
            bspec((N, nx, nu)),
            bspec((N, nx)),
            bspec((N, nx + nu)),
            bspec((N, nx + nu, nx + nu)),
            bspec((nx,)),
            bspec((nx, nx)),
        ],
        out_specs=[
            bspec((N, nu, nx)),
            bspec((N, nu)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bt, N, nu, nx), A.dtype),
            jax.ShapeDtypeStruct((Bt, N, nu), A.dtype),
        ],
        interpret=interpret,
    )(A, B, d, grads, hess, gf, Hf)
    return K, kff
