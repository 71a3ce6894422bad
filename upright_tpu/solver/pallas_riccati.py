"""Pallas TPU kernel: batched Riccati backward pass, streamed over stages.

The batched MPC backward recursion (for each of B problem instances, N
stages of 27x27 / 13x13 matrix algebra) is the solver's dominant phase when
lowered naively.  This kernel holds the cost-to-go state (P, p) of a block
of instances in VMEM **scratch** across a grid sweep over the stages:

  - grid = (batch blocks, N stages); the stage axis is the sequential
    ("arbitrary") inner dimension, so stage-k inputs stream HBM->VMEM one
    stage at a time while (P, p) never leave VMEM
  - inputs are laid out stage-major (N, B, ...) so each grid step's block is
    a contiguous (1, block, ...) slice
  - all matrix products via dot_general with the batch block as the leading
    (batch) dimension
  - the Quu solve is an unrolled Cholesky factor/solve where each scalar
    operation is a (BLOCK,)-wide VPU vector op — no per-instance loops

An earlier revision loaded the *whole horizon* per batch block, which
exceeds the 16 MB VMEM scope for any block size the (8, 128) tiling rules
accept — streaming the stage axis is what makes the kernel fit on real
hardware.  Numerics match al._backward_pass (same recursion, same
regularization); correctness is pinned by interpret-mode tests.

Status (round-3 hardware A/B — docs/pallas_ab_v5e_r3.log, regenerate with
scripts/pallas_ab.py): the kernel compiles and runs CORRECT on the real
v5e at block=8 (matches interpret mode to fp32 tolerance) but measures
79.0 ms/call vs the XLA scan's 42.1 ms at batch 512 on identical inputs;
block sizes 32/64/128 exceed Mosaic's program-size limits (compile
failures).  block=8 fills only 8 of the 128 VPU lanes in the unrolled
Cholesky, and the fused Q-update matmuls are MXU-bound work XLA already
pipelines optimally, so the production backward is al._backward_pass
(``ALConfig(backward="scan")``).  This kernel is retained as a documented
experiment for the long-horizon (N in the hundreds) offline regime;
select it explicitly with ``ALConfig(backward="pallas")``.
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
                    K_ref, kff_ref, P_scr, p_scr, *, nx, nu, reg):
    """One (batch block, stage) grid step; (P, p) persist in VMEM scratch
    across the sequential stage sweep."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        P_scr[:] = Hf_ref[:]
        p_scr[:] = gf_ref[:]

    P = P_scr[:]  # (B, nx, nx)
    p = p_scr[:]  # (B, nx)
    A = A_ref[0]  # (B, nx, nx) — stage block dim is 1
    Bm = B_ref[0]  # (B, nx, nu)
    d = d_ref[0]  # (B, nx)
    g = grads_ref[0]  # (B, nx+nu)
    H = hess_ref[0]  # (B, nx+nu, nx+nu)

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

    K_ref[0] = K
    kff_ref[0] = kff

    # P = Qxx + Qux^T K  (K already carries the minus sign)
    P_new = Qxx + _bmtm(Qux, K)
    P_scr[:] = 0.5 * (P_new + jnp.swapaxes(P_new, -1, -2))
    p_scr[:] = Qx + _bmtm(Qux, kff[..., None])[..., 0]


def pallas_backward_pass(A, B, d, grads, hess, gf, Hf, reg=1e-6,
                         block=8, interpret=False):
    """Batched Riccati backward pass as a Pallas kernel.

    A: (Bt, N, nx, nx), B: (Bt, N, nx, nu), d: (Bt, N, nx),
    grads: (Bt, N, nz), hess: (Bt, N, nz, nz), gf: (Bt, nx), Hf: (Bt, nx, nx).
    Returns (K (Bt, N, nu, nx), kff (Bt, N, nu)).
    """
    Bt, N, nx, _ = A.shape
    nu = B.shape[-1]
    nz = nx + nu
    block = min(block, Bt)
    if Bt % block:
        raise ValueError(f"batch {Bt} not divisible by block {block}")

    # stage-major layout so the stage axis streams through the grid
    As = jnp.swapaxes(A, 0, 1)
    Bs = jnp.swapaxes(B, 0, 1)
    ds = jnp.swapaxes(d, 0, 1)
    gs = jnp.swapaxes(grads, 0, 1)
    Hs = jnp.swapaxes(hess, 0, 1)

    kernel = functools.partial(_riccati_kernel, nx=nx, nu=nu, reg=reg)
    grid = (Bt // block, N)

    def stage_spec(tail):
        # reverse stage order: grid step j touches stage N-1-j
        return pl.BlockSpec(
            (1, block) + tail,
            lambda i, j: (N - 1 - j, i) + (0,) * len(tail),
            memory_space=pltpu.VMEM,
        )

    def const_spec(tail):
        return pl.BlockSpec(
            (block,) + tail,
            lambda i, j: (i,) + (0,) * len(tail),
            memory_space=pltpu.VMEM,
        )

    K, kff = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            stage_spec((nx, nx)),
            stage_spec((nx, nu)),
            stage_spec((nx,)),
            stage_spec((nz,)),
            stage_spec((nz, nz)),
            const_spec((nx,)),
            const_spec((nx, nx)),
        ],
        out_specs=[
            stage_spec((nu, nx)),
            stage_spec((nu,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, Bt, nu, nx), A.dtype),
            jax.ShapeDtypeStruct((N, Bt, nu), A.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block, nx, nx), A.dtype),
            pltpu.VMEM((block, nx), A.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(As, Bs, ds, gs, Hs, gf, Hf)
    return jnp.swapaxes(K, 0, 1), jnp.swapaxes(kff, 0, 1)
