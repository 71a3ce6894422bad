"""Augmented-Lagrangian SQP trajectory optimizer with Riccati backward pass.

TPU-native replacement for OCS2's MultipleShootingMpc + HPIPM
(reference controller_interface.cpp:395-398; settings wrappers.py:104-143).
Design rationale:

  - HPIPM's interior-point QP does data-dependent pivoting and branching —
    hostile to XLA.  The augmented-Lagrangian method (ALTRO-style) needs only
    matmuls, Cholesky factorizations of tiny (nu x nu) blocks, and elementwise
    max — everything batches over thousands of problem instances with vmap.
  - The backward pass is a `lax.scan` over the horizon (N ~ 20).  Within one
    instance it is sequential (like HPIPM's Riccati), but the throughput axis
    on TPU is the *batch*: vmapped instances fill the MXU.
  - Soft/hard constraint semantics: equalities and inequalities both enter
    the AL merit; warm-started multipliers across MPC re-solves reproduce the
    reference's 1-iteration warm-started SQP behavior
    (config/controller.yaml:55-67).

All functions are pure; `solve` jits and vmaps cleanly.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Tuple

import jax
import jax.numpy as jnp

from upright_tpu.solver.ocp import OCP, Solution, SolverState


def _floor_precision(minimum: str = "high") -> str:
    """Resolve the precision pin as a FLOOR over the ambient setting.

    ``jax.default_matmul_precision("high")`` sets exactly "high", which
    would silently DOWNGRADE a user-requested ambient "highest" (the
    UPRIGHT_TPU_MATMUL_PRECISION override path).  Returns "highest" when
    the ambient already asks for it, else ``minimum``.
    """
    ambient = jax.config.jax_default_matmul_precision
    if ambient is not None and str(ambient).lower() in (
        "highest", "float32", "f32",
    ):
        return "highest"
    return minimum


# Optional A/B override for the stage-derivative (constraint-Jacobian)
# precision floor; unset (the default) follows ocp.precision_floor like the
# backward/merit phases.  See the pin at the _stage_derivatives call site.
_JAC_PRECISION_OVERRIDE = os.environ.get("UPRIGHT_TPU_JAC_PRECISION")


@dataclasses.dataclass(frozen=True)
class ALConfig:
    """Static solver configuration (compiled into the jitted solve)."""

    iterations: int = 1  # SQP (inner) iterations per solve
    rho_eq: float = 10.0  # equality penalty
    rho_ineq: float = 10.0  # inequality penalty
    reg: float = 1e-6  # Levenberg regularization on Quu
    line_search_steps: Tuple[float, ...] = (
        1.0, 0.5, 0.25, 0.1, 0.03, 0.01, 0.003, 0.001,
    )
    mu_max: float = 1e6  # inequality-multiplier safeguard
    # equality-multiplier safeguard (Algencan-style bounded multipliers):
    # under persistent infeasibility (unreachable target, transient CWC
    # violation) unbounded lam ratchets across warm-started MPC replans and
    # destabilizes the closed loop; healthy converged multipliers on the
    # shipped problems stay < ~150, so 1e3 never binds in nominal operation
    lam_max: float = 1e3
    # divergence watchdog: if the warm-start trajectory's constraint
    # violation exceeds this, the incoming multipliers are stale (the world
    # moved away from the plan) and are zeroed before solving — reproducing
    # HPIPM's fresh-duals-per-QP behavior exactly when it matters.  None
    # disables (offline/cold solves, where the warm start is all-zero
    # anyway).  Units: mass-normalized constraint residual.
    dual_reset_violation: float | None = None
    update_multipliers: bool = True  # AL dual update at end of solve
    # dual safeguarding for heavily-constrained problems (frictional cones):
    # take several primal (Riccati) steps per multiplier update, and damp the
    # update.  1/1.0 reproduces the classic one-step PHR iteration used by
    # the warm-started MPC path.
    dual_update_every: int = 1  # primal iterations per dual update
    dual_step: float = 1.0  # damping factor on the multiplier step
    scan_unroll: int = 1  # lax.scan unroll factor (horizon loops)
    defect_penalty: float = 100.0  # multiple-shooting merit weight on |f(x_k,u_k) - x_{k+1}|
    # Riccati backward-pass implementation (SURVEY §5.7 horizon parallelism):
    #   "scan"   sequential lax.scan — fastest at the online N=20 horizon
    #   "pscan"  O(log N) associative scan — long-horizon offline plans
    #   "pallas" fused VMEM kernel — large-batch solves
    backward: str = "scan"
    pallas_interpret: bool = False  # run the Pallas kernel in interpret mode (CPU tests)
    pallas_block: int = 1  # instances per Pallas program (batched via vmap grid axis)


# ---------------------------------------------------------------------------
# augmented-Lagrangian stage objective
# ---------------------------------------------------------------------------


def _al_stage_terms(ocp: OCP, cfg: ALConfig, x, u, p, lam, mu):
    """AL stage cost plus the intermediates the solver reuses downstream.

    Returns (al, l, g, h): the PHR merit term
    l + lam'g + rho/2|g|^2 + rho/2|max(0, mu/rho - h)|^2, the plain stage
    cost l, and the eq/ineq constraint values at the same point (None when
    the problem has none).  The solve threads g/h from the accepted
    line-search candidate into the dual update and diagnostics instead of
    re-evaluating the constraint stack (a full kinematic-chain sweep) at
    X_new after the candidate select — XLA cannot CSE across the gather.
    """
    l = ocp.stage_cost(x, u, p)
    al = l
    g = h = None
    if ocp.n_eq > 0:
        g = ocp.eq(x, u, p)
        al = al + lam @ g + 0.5 * cfg.rho_eq * g @ g
    if ocp.n_ineq > 0:
        h = ocp.ineq(x, u, p)
        psi = jnp.maximum(0.0, mu / cfg.rho_ineq - h)
        al = al + 0.5 * cfg.rho_ineq * psi @ psi
    return al, l, g, h


def _al_stage_cost(ocp: OCP, cfg: ALConfig, x, u, p, lam, mu):
    """l + lam'g + rho/2|g|^2 + rho/2|max(0, mu/rho - h)|^2 (PHR form)."""
    return _al_stage_terms(ocp, cfg, x, u, p, lam, mu)[0]


def _al_final_terms(ocp: OCP, cfg: ALConfig, x, p_f, lam_f):
    """(al, l, gf): AL final cost, plain final cost, final-eq values."""
    l = ocp.final_cost(x, p_f)
    al = l
    gf = None
    if ocp.n_feq > 0:
        gf = ocp.final_eq(x, p_f)
        al = al + lam_f @ gf + 0.5 * cfg.rho_eq * gf @ gf
    return al, l, gf


def _al_final_cost(ocp: OCP, cfg: ALConfig, x, p_f, lam_f):
    return _al_final_terms(ocp, cfg, x, p_f, lam_f)[0]


# ---------------------------------------------------------------------------
# stage linearization (gradients + Gauss-Newton Hessians)
# ---------------------------------------------------------------------------


def _stage_derivatives(ocp: OCP, cfg: ALConfig, x, u, p, lam, mu):
    """Gradient and GN Hessian of the AL stage cost w.r.t. z = (x, u).

    Fast path (when the GN decomposition is available): ONE jacfwd of the
    stacked [residuals; eq; ineq] vector — the three constraint families
    share the kinematic-chain JVPs — and the gradient is assembled
    analytically from the same Jacobian (no separate jax.grad pass).
    """
    nx, nu = ocp.nx, ocp.nu
    z = jnp.concatenate([x, u])

    if ocp.stage_residuals is not None and ocp.stage_quad is not None:
        if ocp.stage_quad_derivs is not None:
            grad, H = ocp.stage_quad_derivs(x, u, p)
        else:
            def quad(z_):
                return ocp.stage_quad(z_[:nx], z_[nx:], p)

            H = jax.hessian(quad)(z)
            grad = jax.grad(quad)(z)

        n_r = None

        # Analytic box-row split: state/input limit rows have constant
        # +/-identity Jacobians — keep them out of the traced Jacobian and
        # the GN J^T J products (they contribute masked diagonal updates).
        box = ocp.ineq_box if ocp.ineq_smooth is not None else None
        ineq_fn = ocp.ineq_smooth if box is not None else ocp.ineq

        def stacked(x_, u_):
            parts = [ocp.stage_residuals(x_, u_, p)[0]]
            if ocp.n_eq > 0:
                parts.append(ocp.eq(x_, u_, p))
            if ocp.n_ineq > 0:
                s_ = ineq_fn(x_, u_, p)
                if s_.shape[0] > 0:
                    parts.append(s_)
            return jnp.concatenate(parts)

        vals = stacked(x, u)
        # Split the Jacobian into column blocks, each with every other block
        # captured as a trace-time constant, so forward-mode tangents only
        # flow through computations that depend on that block:
        #   - u-columns skip the kinematic chain entirely (FK is x-only);
        #   - with x_jac_blocks = (nq, nq, nq, ...), the v- and a-columns
        #     skip the rotation-chain JVPs (pose depends only on q), and
        #     a-columns additionally skip the velocity propagation.
        if ocp.x_jac_blocks is not None:
            parts = []
            off_b = 0
            for b in ocp.x_jac_blocks:
                lo, hi = off_b, off_b + b

                def f_block(xb, lo=lo, hi=hi):
                    x_full = jnp.concatenate([x[:lo], xb, x[hi:]])
                    return stacked(x_full, u)

                parts.append(jax.jacfwd(f_block)(x[lo:hi]))
                off_b = hi
            J_x = jnp.concatenate(parts, axis=1)
            J_u = jax.jacfwd(lambda u_: stacked(x, u_))(u)
            J = jnp.concatenate([J_x, J_u], axis=1)
        elif ocp.jac_mode == "rev":
            # short-and-wide stacked Jacobian: one VJP per row beats one JVP
            # per column (rows << nx + nu once box rows leave the stack)
            J = jax.jacrev(lambda z_: stacked(z_[:nx], z_[nx:]))(z)
        else:
            J_x = jax.jacfwd(lambda x_: stacked(x_, u))(x)
            J_u = jax.jacfwd(lambda u_: stacked(x, u_))(u)
            J = jnp.concatenate([J_x, J_u], axis=1)

        r, W = ocp.stage_residuals(x, u, p)
        n_r = r.shape[0]
        J_r = J[:n_r]
        grad = grad + J_r.T @ (W @ r)
        H = H + J_r.T @ (W @ J_r)

        off = n_r
        if ocp.n_eq > 0:
            g = vals[off : off + ocp.n_eq]
            J_g = J[off : off + ocp.n_eq]
            grad = grad + J_g.T @ (lam + cfg.rho_eq * g)
            H = H + cfg.rho_eq * J_g.T @ J_g
            off += ocp.n_eq
        if ocp.n_ineq > 0:
            psi_full = jnp.maximum(0.0, mu / cfg.rho_ineq - ocp.ineq(x, u, p))
            if box is None:
                psi = psi_full
                J_h = J[off:]
            else:
                # smooth rows = [pre | post] around the box block
                b0 = box.n_pre
                b1 = b0 + box.n_box
                psi = jnp.concatenate([psi_full[:b0], psi_full[b1:]])
                J_h = J[off:]
            if J_h.shape[0] > 0:
                grad = grad - cfg.rho_ineq * J_h.T @ psi
                active = psi > 0.0
                J_h_active = J_h * active[:, None]
                H = H + cfg.rho_ineq * J_h_active.T @ J_h_active
            if box is not None and box.n_box > 0:
                b0 = box.n_pre
                nxb, nub = box.nx_box, box.nu_box
                p_xlo = psi_full[b0 : b0 + nxb]
                p_xhi = psi_full[b0 + nxb : b0 + 2 * nxb]
                p_ulo = psi_full[b0 + 2 * nxb : b0 + 2 * nxb + nub]
                p_uhi = psi_full[b0 + 2 * nxb + nub : b0 + 2 * nxb + 2 * nub]
                if nxb > 0:
                    grad = grad.at[:nxb].add(-cfg.rho_ineq * (p_xlo - p_xhi))
                    dH = (p_xlo > 0.0).astype(H.dtype) + (p_xhi > 0.0).astype(H.dtype)
                    idx = jnp.arange(nxb)
                    H = H.at[idx, idx].add(cfg.rho_ineq * dH)
                if nub > 0:
                    grad = grad.at[nx : nx + nub].add(
                        -cfg.rho_ineq * (p_ulo - p_uhi)
                    )
                    dH = (p_ulo > 0.0).astype(H.dtype) + (p_uhi > 0.0).astype(H.dtype)
                    idx = nx + jnp.arange(nub)
                    H = H.at[idx, idx].add(cfg.rho_ineq * dH)
        return grad, H

    # generic fallback
    def L(z_):
        return _al_stage_cost(ocp, cfg, z_[:nx], z_[nx:], p, lam, mu)

    grad = jax.grad(L)(z)

    if ocp.stage_quad is not None:
        H = jax.hessian(lambda z_: ocp.stage_quad(z_[:nx], z_[nx:], p))(z)
    else:
        H = jax.hessian(lambda z_: ocp.stage_cost(z_[:nx], z_[nx:], p))(z)

    if ocp.stage_residuals is not None:
        r, W = ocp.stage_residuals(x, u, p)
        J = jax.jacfwd(lambda z_: ocp.stage_residuals(z_[:nx], z_[nx:], p)[0])(z)
        H = H + J.T @ (W @ J)
    if ocp.n_eq > 0:
        Jg = jax.jacfwd(lambda z_: ocp.eq(z_[:nx], z_[nx:], p))(z)
        H = H + cfg.rho_eq * Jg.T @ Jg
    if ocp.n_ineq > 0:
        h = ocp.ineq(x, u, p)
        active = (mu / cfg.rho_ineq - h) > 0.0
        Jh = jax.jacfwd(lambda z_: ocp.ineq(z_[:nx], z_[nx:], p))(z)
        Jh_active = Jh * active[:, None]
        H = H + cfg.rho_ineq * Jh_active.T @ Jh_active

    return grad, H


def _final_derivatives(ocp: OCP, cfg: ALConfig, x, p_f, lam_f):
    def Lf(x_):
        return _al_final_cost(ocp, cfg, x_, p_f, lam_f)

    grad = jax.grad(Lf)(x)

    if ocp.final_quad is not None:
        H = jax.hessian(lambda x_: ocp.final_quad(x_, p_f))(x)
    else:
        H = jax.hessian(lambda x_: ocp.final_cost(x_, p_f))(x)

    if ocp.final_residuals is not None:
        r, W = ocp.final_residuals(x, p_f)
        J = jax.jacfwd(lambda x_: ocp.final_residuals(x_, p_f)[0])(x)
        H = H + J.T @ (W @ J)

    if ocp.n_feq > 0:
        Jg = jax.jacfwd(lambda x_: ocp.final_eq(x_, p_f))(x)
        H = H + cfg.rho_eq * Jg.T @ Jg

    return grad, H


# ---------------------------------------------------------------------------
# Riccati backward pass (sequential lax.scan over the horizon)
# ---------------------------------------------------------------------------


# Input-dimension cutoff for the unrolled elementwise Cholesky: the unroll
# wins on TPU for the small production blocks (4.6x at nu = 13, measured),
# but its op count grows as nu^3/6 INSIDE the scan body, so XLA compile
# time explodes for the wide multi-object frictional problems (nu = 45 for
# the 3-object arch: ~20 min compiles).  Above this, the blocked XLA
# Cholesky is used instead.
_UNROLLED_CHOL_MAX_NU = 24


def _chol_factor_unrolled(M, eps=1e-12):
    """Unrolled Cholesky of a tiny (..., n, n) SPD matrix (n = nu ~ 10-13).

    Returns the lower factor as a list-of-lists of (...,)-shaped entries.
    Every operation is elementwise over the batch dimensions, so under vmap
    the whole factorization fuses into a handful of wide VPU kernels —
    measured 4.6x faster than XLA's blocked `Cholesky` op for the batched
    MPC backward pass on TPU (512 x 20 stages of 13x13 factorizations are
    launch-bound, not FLOP-bound, through the generic lowering).
    """
    n = M.shape[-1]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = M[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, eps))
            else:
                L[i][j] = s / L[j][j]
    return L


def _chol_solve_unrolled(L, R):
    """Solve (L L^T) X = R for a factor from `_chol_factor_unrolled`;
    R (..., n, m) -> X (..., n, m), same elementwise-only property."""
    n = len(L)
    y = [None] * n
    for i in range(n):
        s = R[..., i, :]
        for k in range(i):
            s = s - L[i][k][..., None] * y[k]
        y[i] = s / L[i][i][..., None]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i][..., None] * x[k]
        x[i] = s / L[i][i][..., None]
    return jnp.stack(x, axis=-2)


def _backward_pass(ocp: OCP, cfg: ALConfig, A, B, d, grads, hess, gf, Hf):
    """Multiple-shooting Riccati recursion with defects.

    A, B: (N, nx, nx), (N, nx, nu); d: (N, nx) defects f(x_k,u_k) - x_{k+1};
    grads/hess: stage AL derivatives stacked over stages.
    Returns (K, kff): feedback gains (N, nu, nx) and feedforward (N, nu).

    Two TPU-oriented formulations (together 4.6x on the batched backward,
    19.3 ms -> 4.2 ms at batch 512):
      - the Q-matrix update is computed as one fused product
        Q = H + Z^T P [Z | d+...] with Z = [A | B], halving the number of
        batched matmul launches vs forming Qxx/Qux/Quu/Qx/Qu separately;
      - the Quu solve uses the unrolled elementwise Cholesky above instead
        of XLA's blocked Cholesky + triangular-solve ops.
    """
    nx, nu = ocp.nx, ocp.nu
    Z = jnp.concatenate([A, B], axis=-1)  # (N, nx, nx+nu) or (nx, nx+nu)
    # Stage-invariant dynamics (linear_dynamics): Z is 2-D and rides the
    # scan as a closure constant instead of a scanned input — no (N, nx, nz)
    # broadcast materialized in HBM, no per-stage Z stream through the loop.
    Z_const = Z if Z.ndim == 2 else None

    def step(carry, inp):
        P, p = carry
        if Z_const is None:
            Z_k, d_k, g_k, H_k = inp
        else:
            d_k, g_k, H_k = inp
            Z_k = Z_const

        Pd_p = p + P @ d_k
        PZ = P @ Z_k
        Q = H_k + Z_k.T @ PZ  # full (nz, nz) Gauss-Newton Q
        q = g_k + Z_k.T @ Pd_p
        Quu = Q[nx:, nx:] + cfg.reg * jnp.eye(nu, dtype=P.dtype)
        Qux = Q[nx:, :nx]
        Qu = q[nx:]

        rhs = jnp.concatenate([Qux, Qu[..., None]], axis=-1)
        if nu <= _UNROLLED_CHOL_MAX_NU:
            L = _chol_factor_unrolled(Quu)
            # one fused solve for [K | kff] (shared substitutions)
            sol_kk = -_chol_solve_unrolled(L, rhs)
        else:
            # blocked XLA Cholesky for wide input blocks: the unrolled
            # factorization emits ~nu^3/6 scalar HLO ops in the scan body,
            # which blows up COMPILE time cubically (a 45-wide frictional
            # 3-object problem took 20 min to compile; blocked compiles in
            # seconds and the unrolled VPU win only holds for small nu).
            # Safeguard parity with the unrolled path (which clamps pivots
            # via sqrt(max(s, eps))): a relative diagonal jitter keeps a
            # numerically-semidefinite Quu factorizable, and a NaN fallback
            # re-factorizes with a large jitter so sol.K is never NaN (the
            # feedback policy consumes K unconditionally, device_loop).
            import jax.scipy.linalg as jsp

            diag_scale = jnp.maximum(jnp.trace(Quu) / nu, 1e-9)
            jit1 = 1e-7 * diag_scale * jnp.eye(nu, dtype=Quu.dtype)
            L_b = jnp.linalg.cholesky(Quu + jit1)
            bad = ~jnp.isfinite(L_b).all()
            jit2 = 1e-3 * diag_scale * jnp.eye(nu, dtype=Quu.dtype)
            L_safe = jnp.linalg.cholesky(Quu + jit2)
            L_b = jnp.where(bad, L_safe, L_b)
            sol_kk = -jsp.cho_solve((L_b, True), rhs)
        K, kff = sol_kk[..., :nx], sol_kk[..., nx]

        P_new = Q[:nx, :nx] + Qux.T @ K
        P_new = 0.5 * (P_new + P_new.T)
        p_new = q[:nx] + Qux.T @ kff

        return (P_new, p_new), (K, kff)

    xs = (d, grads, hess) if Z_const is not None else (Z, d, grads, hess)
    (P0, p0), (K, kff) = jax.lax.scan(
        step, (Hf, gf), xs, reverse=True,
        unroll=cfg.scan_unroll,
    )
    return K, kff


# ---------------------------------------------------------------------------
# forward pass: nonlinear rollout with feedback, batched line search
# ---------------------------------------------------------------------------


def _rollout(ocp: OCP, X_ref, U_ref, K, kff, alpha, x0, p_stage, unroll=1):
    def step(x, inp):
        x_r, u_r, K_k, k_k, p_k = inp
        u = u_r + alpha * k_k + K_k @ (x - x_r)
        if ocp.u_lb is not None:
            # input-bound clamping (box-DDP style forward pass)
            u = jnp.clip(u, ocp.u_lb, ocp.u_ub)
        x_next = ocp.dynamics(x, u, p_k)
        return x_next, (x, u)

    x_last, (Xs, Us) = jax.lax.scan(
        step, x0, (X_ref[:-1], U_ref, K, kff, p_stage), unroll=unroll
    )
    X = jnp.concatenate([Xs, x_last[None]], axis=0)
    return X, Us


def _rollout_merit(ocp: OCP, cfg: ALConfig, X_ref, U_ref, K, kff, alpha, x0,
                   p_stage, p_final, lam, mu, lam_f, unroll=1):
    """Forward pass + AL merit for one line-search candidate.

    The rollout stays a minimal sequential scan (dynamics only — the
    latency-critical path), and the stage costs are evaluated afterwards as
    one parallel vmap over stages (fills the vector units instead of
    serializing 20 tiny cost evaluations into the scan).  The
    multiple-shooting defect term is skipped entirely: scan-generated
    trajectories satisfy x_{k+1} = f(x_k, u_k) exactly, so their defect
    penalty is identically zero (only the incoming reference trajectory,
    scored by _merit, can carry defects — recomputing dynamics per
    candidate just to measure a structural zero was pure waste).
    """
    X, U = _rollout(ocp, X_ref, U_ref, K, kff, alpha, x0, p_stage,
                    unroll=unroll)
    al, l, g, h = jax.vmap(
        lambda x, u, p, lm, m: _al_stage_terms(ocp, cfg, x, u, p, lm, m)
    )(X[:-1], U, p_stage, lam, mu)
    al_f, l_f, gf = _al_final_terms(ocp, cfg, X[-1], p_final, lam_f)
    merit = jnp.sum(al) + al_f
    terms = (jnp.sum(l) + l_f, g, h, gf)
    return merit, X, U, terms


def _merit_terms(ocp: OCP, cfg: ALConfig, X, U, p_stage, p_final, lam, mu,
                 lam_f):
    """AL merit of a given (X, U) plus the reused terms (see
    `_al_stage_terms`): (total, (plain_cost, g, h, gf))."""
    al, l, g, h = jax.vmap(
        lambda x, u, p, lm, m: _al_stage_terms(ocp, cfg, x, u, p, lm, m)
    )(X[:-1], U, p_stage, lam, mu)
    al_f, l_f, gf = _al_final_terms(ocp, cfg, X[-1], p_final, lam_f)
    total = jnp.sum(al) + al_f
    if cfg.defect_penalty > 0:
        # multiple-shooting merit: penalize dynamics defects so a stale
        # (defect-carrying) reference trajectory cannot out-score consistent
        # rollouts (which are defect-free by construction)
        f_next = jax.vmap(lambda x, u, p: ocp.dynamics(x, u, p))(X[:-1], U, p_stage)
        total = total + cfg.defect_penalty * jnp.sum(jnp.abs(f_next - X[1:]))
    return total, (jnp.sum(l) + l_f, g, h, gf)


def _merit(ocp: OCP, cfg: ALConfig, X, U, p_stage, p_final, lam, mu, lam_f):
    return _merit_terms(ocp, cfg, X, U, p_stage, p_final, lam, mu, lam_f)[0]


# ---------------------------------------------------------------------------
# main solve
# ---------------------------------------------------------------------------


def solve(ocp: OCP, cfg: ALConfig, params, x0, state: SolverState) -> Solution:
    """Run cfg.iterations AL-SQP iterations from the warm start ``state``.

    params: {"stage": pytree with leading axis N, "final": pytree}.
    Fully jittable; vmap over (params, x0, state) for batch solves.
    """
    p_stage = params["stage"]
    p_final = params["final"]

    if cfg.dual_reset_violation is not None and (ocp.n_eq > 0 or ocp.n_ineq > 0):
        # divergence watchdog (see ALConfig.dual_reset_violation)
        viol0 = jnp.zeros(())
        if ocp.n_eq > 0:
            g0 = jax.vmap(lambda x, u, p: ocp.eq(x, u, p))(
                state.X[:-1], state.U, p_stage
            )
            viol0 = jnp.maximum(viol0, jnp.max(jnp.abs(g0)))
        if ocp.n_ineq > 0:
            h0 = jax.vmap(lambda x, u, p: ocp.ineq(x, u, p))(
                state.X[:-1], state.U, p_stage
            )
            viol0 = jnp.maximum(viol0, jnp.max(jnp.maximum(0.0, -h0)))
        keep = (viol0 <= cfg.dual_reset_violation).astype(state.X.dtype)
        state = SolverState(
            X=state.X, U=state.U, lam=state.lam * keep,
            mu=state.mu * keep, lam_f=state.lam_f * keep,
        )

    def sqp_iter(carry, it):
        X, U, lam, mu, lam_f = carry

        # pin the initial state
        X = X.at[0].set(x0)

        # linearize dynamics + defects
        def lin_dyn(x, u, p):
            A = jax.jacfwd(lambda x_: ocp.dynamics(x_, u, p))(x)
            B = jax.jacfwd(lambda u_: ocp.dynamics(x, u_, p))(u)
            return A, B

        if ocp.linear_dynamics:
            # A, B are state-independent: linearize once at a reference
            # point.  The scan backend takes them unbatched (loop-invariant
            # closure constants); pscan/pallas need the per-stage axis.
            A0, B0 = lin_dyn(X[0], U[0], jax.tree.map(lambda v: v[0], p_stage))
            if cfg.backward == "scan":
                A, B = A0, B0
            else:
                A = jnp.broadcast_to(A0, (ocp.N,) + A0.shape)
                B = jnp.broadcast_to(B0, (ocp.N,) + B0.shape)
        else:
            A, B = jax.vmap(lin_dyn)(X[:-1], U, p_stage)
        f_next = jax.vmap(lambda x, u, p: ocp.dynamics(x, u, p))(X[:-1], U, p_stage)
        d = f_next - X[1:]

        # AL stage derivatives.  Floored at ocp.precision_floor like the
        # backward/merit phases: the constraint Jacobians are where
        # 3-pass-bf16 noise is AMPLIFIED before it reaches the backward
        # pass — mass-normalized Newton-Euler rows scale as 1/m, and the
        # closed loop integrates the resulting dual noise into a ratchet.
        # Measured on the v5e (round 5): at "high" the light-mass leaves
        # (0.02 kg dice; 0.18 kg frictionless arch + obstacles, eq_viol
        # 24.5) fall/blow up, at "highest" all hold, and flooring them by
        # the mass-conditioned rule keeps the >= 0.2 kg workloads (bench
        # bottle 0.83 kg) at full MXU throughput (docs/performance.md
        # "Matmul precision").  UPRIGHT_TPU_JAC_PRECISION overrides for
        # A/B.
        with jax.default_matmul_precision(
            _floor_precision(_JAC_PRECISION_OVERRIDE or ocp.precision_floor)
        ):
            grads, hess = jax.vmap(
                lambda x, u, p, l, m: _stage_derivatives(ocp, cfg, x, u, p, l, m)
            )(X[:-1], U, p_stage, lam, mu)
            gf, Hf = _final_derivatives(ocp, cfg, X[-1], p_final, lam_f)

        # Riccati (backward pass implementation selected by cfg.backward).
        # Pinned to >= "high" matmul precision AS A FLOOR over the ambient
        # setting (an ambient "highest" is honored): the recursion is the
        # precision-critical phase — bf16 inputs to the Q-update products
        # degrade weakly-conditioned Quu (e.g. the ral23 ablations' ~1e-3 I)
        # until the line search rejects every step (docs/performance.md
        # "Matmul precision").
        with jax.default_matmul_precision(
            _floor_precision(ocp.precision_floor)
        ):
            if cfg.backward == "pscan":
                from upright_tpu.solver.pscan import parallel_backward_pass

                K, kff = parallel_backward_pass(
                    A, B, d, grads, hess, gf, Hf, reg=cfg.reg
                )
            elif cfg.backward == "pallas":
                from upright_tpu.solver.pallas_riccati import (
                    pallas_backward_pass,
                )

                # Mosaic supports DEFAULT/HIGHEST but not HIGH
                with jax.default_matmul_precision("highest"):
                    K, kff = pallas_backward_pass(
                        A[None], B[None], d[None], grads[None], hess[None],
                        gf[None], Hf[None], reg=cfg.reg,
                        block=cfg.pallas_block,
                        interpret=cfg.pallas_interpret,
                    )
                K, kff = K[0], kff[0]
            else:
                K, kff = _backward_pass(
                    ocp, cfg, A, B, d, grads, hess, gf, Hf
                )

        # line search over fixed candidates (vmapped rollouts)
        alphas = jnp.asarray(cfg.line_search_steps)

        def try_alpha(alpha):
            return _rollout_merit(
                ocp, cfg, X, U, K, kff, alpha, x0, p_stage, p_final,
                lam, mu, lam_f, unroll=cfg.scan_unroll,
            )

        # Pinned >= "high" (floor, like the backward pass): these
        # evaluations are what the dual update integrates and what
        # eq/ineq_viol report — bf16 here leaves ~1e-1 noise on O(10)
        # constraint rows (measured on aligned_bottle: ineq_viol 0.107 vs
        # 4e-4), while the stage Jacobian tolerates bf16 (GN direction
        # noise the line search absorbs).  See docs/performance.md
        # "Matmul precision".
        with jax.default_matmul_precision(
            _floor_precision(ocp.precision_floor)
        ):
            merits, Xs, Us, terms_a = jax.vmap(try_alpha)(alphas)
            merit0, terms0 = _merit_terms(
                ocp, cfg, X, U, p_stage, p_final, lam, mu, lam_f
            )
        merits = jnp.where(jnp.isnan(merits), jnp.inf, merits)
        best = jnp.argmin(merits)

        accept = merits[best] < merit0
        X_new = jnp.where(accept, Xs[best], X)
        U_new = jnp.where(accept, Us[best], U)

        # Plain cost + constraint values at the accepted iterate, threaded
        # through the candidate select.  Every candidate's merit already
        # evaluated the full constraint stack at (Xa, Ua); gathering those
        # values here means the dual update and the end-of-solve diagnostics
        # below cost no further kinematic-chain sweep (XLA cannot CSE an
        # evaluation at Xs[best] with the per-candidate ones — the gather is
        # opaque to it).
        cost_it, g, h, gf_val = jax.tree.map(
            lambda a, b: jnp.where(accept, a[best], b), terms_a, terms0
        )

        # dual (multiplier) update: makes warm-started 1-iteration MPC solves
        # track the constrained optimum.  With dual_update_every > 1, the
        # duals move only every k-th iteration (several primal steps per dual
        # step) and dual_step damps them — this suppresses the primal/dual
        # limit cycle that heavily-coupled inequality sets (frictional cones
        # sharing force variables with the dynamics equalities) otherwise
        # fall into.
        if cfg.update_multipliers:
            plain = cfg.dual_update_every == 1 and cfg.dual_step == 1.0
            if plain:
                beta = 1.0
            else:
                do_update = ((it + 1) % cfg.dual_update_every) == 0
                beta = jnp.where(do_update, cfg.dual_step, 0.0)
            # multipliers move only after an accepted primal step: a rejected
            # line search means the AL subproblem was not (approximately)
            # minimized, and integrating rho*g against a stuck primal is pure
            # windup (the closed-loop runaway mode at e.g. workspace limits)
            beta = beta * accept
            if ocp.n_eq > 0:
                lam = jnp.clip(lam + beta * cfg.rho_eq * g, -cfg.lam_max, cfg.lam_max)
            if ocp.n_ineq > 0:
                mu_new = jnp.clip(jnp.maximum(0.0, mu - cfg.rho_ineq * h), 0.0, cfg.mu_max)
                if plain:
                    mu = jnp.where(accept, mu_new, mu)
                else:
                    mu = mu + beta * (mu_new - mu)
            if ocp.n_feq > 0:
                lam_f = jnp.clip(
                    lam_f + beta * cfg.rho_eq * gf_val,
                    -cfg.lam_max, cfg.lam_max,
                )

        # per-iteration diagnostics (the last iteration's are returned),
        # all assembled from the threaded candidate terms above — no extra
        # constraint/cost/dynamics evaluations.  The defect is exact: an
        # accepted candidate came out of the rollout scan, whose recursion
        # stores x_{k+1} = f(x_k, u_k) bit-for-bit, so its defect is a
        # structural zero; a rejected step keeps (X, U) whose defect is d.
        eq_viol_it = jnp.max(jnp.abs(g)) if ocp.n_eq > 0 else jnp.zeros(())
        if ocp.n_feq > 0:
            eq_viol_it = jnp.maximum(eq_viol_it, jnp.max(jnp.abs(gf_val)))
        ineq_viol_it = (
            jnp.max(jnp.maximum(0.0, -h)) if ocp.n_ineq > 0 else jnp.zeros(())
        )
        defect_it = jnp.where(accept, 0.0, jnp.max(jnp.abs(d)))

        return (X_new, U_new, lam, mu, lam_f), (
            merits[best], K, cost_it, eq_viol_it, ineq_viol_it, defect_it,
        )

    carry0 = (state.X, state.U, state.lam, state.mu, state.lam_f)
    (X, U, lam, mu, lam_f), (_, Ks, costs, eq_viols, ineq_viols, defects) = (
        jax.lax.scan(sqp_iter, carry0, jnp.arange(cfg.iterations))
    )
    K = Ks[-1]
    cost, eq_viol, ineq_viol, defect = (
        costs[-1], eq_viols[-1], ineq_viols[-1], defects[-1],
    )

    new_state = SolverState(X=X, U=U, lam=lam, mu=mu, lam_f=lam_f)
    return Solution(
        state=new_state, K=K, cost=cost, eq_viol=eq_viol,
        ineq_viol=ineq_viol, defect=defect,
    )
