"""Optimal-control-problem definition consumed by the AL-SQP solver.

This is the TPU-native replacement for OCS2's OptimalControlProblem object
graph (reference controller_interface.cpp:103-393): instead of cost/constraint
class hierarchies with CppAD codegen, a problem is five pure functions plus
static dimensions.  All derivative work is jax.jacfwd/Gauss-Newton at trace
time — the entire CppAD .so pipeline (balancing_constraints.cpp:54-56,105-107)
disappears.

Cost structure: each stage cost is
    l(x, u) = quadratic(x, u) + 1/2 * r(x, u)^T W r(x, u)
where r stacks the nonlinear residuals (EE pose error, inertial alignment).
The solver uses exact gradients and Gauss-Newton Hessians J^T W J, matching
the reference's GN treatment (end_effector_cost.h:69-99,
inertial_alignment.cpp:146-150).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class OCP:
    """Static problem description.

    All callables are pure and traced once under jit.  ``params`` passed to
    the solver is a pytree with:
      - ``stage``: stage-indexed pytree (leading axis N) fed to stage functions
      - ``final``: pytree for the terminal functions
    Stage functions receive (x, u, p_k); terminal functions receive (x, p_f).
    """

    N: int  # number of stages (shooting intervals)
    nx: int
    nu: int
    n_eq: int  # equality rows per stage
    n_ineq: int  # inequality rows per stage (h(x,u) >= 0)
    n_feq: int  # terminal equality rows

    dynamics: Callable  # (x, u, p_k) -> x_next  (exact discrete step)
    stage_cost: Callable  # (x, u, p_k) -> scalar
    eq: Callable  # (x, u, p_k) -> (n_eq,)
    ineq: Callable  # (x, u, p_k) -> (n_ineq,)
    final_cost: Callable  # (x, p_f) -> scalar
    final_eq: Callable  # (x, p_f) -> (n_feq,)

    # optional Gauss-Newton residual decomposition of the stage cost:
    # stage_cost == quad + 1/2 r^T W r.  If provided, the solver builds GN
    # Hessians from residual Jacobians instead of full Hessians.
    stage_residuals: Optional[Callable] = None  # (x, u, p_k) -> (r, W)
    stage_quad: Optional[Callable] = None  # (x, u, p_k) -> scalar (pure quadratic part)
    final_residuals: Optional[Callable] = None  # (x, p_f) -> (r, W)
    final_quad: Optional[Callable] = None

    # optional input box bounds, enforced by clamping in the forward rollout
    # (box-DDP style); AL multipliers on the same rows recover optimality at
    # the bound.  Arrays of shape (nu,) or None.
    u_lb: Optional[Any] = None
    u_ub: Optional[Any] = None

    # dynamics are linear in (x, u): A, B are computed once at trace time
    # instead of re-linearized per stage/instance/iteration (true for the
    # triple-integrator + constant-acceleration-obstacle system)
    linear_dynamics: bool = False

    # Matmul-precision floor for the solver's precision-critical phases
    # (stage Jacobians + Riccati recursion + line-search merits).  "high"
    # (3-pass bf16) suffices for the nominal mass range; build_problem
    # raises it to "highest" (f32) automatically when the arrangement
    # contains light objects (min mass < 0.2 kg) — a uniform conditioning
    # rule, not per-leaf tuning: the mass-normalized constraint stack
    # scales as 1/m, and the closed loop integrates the extra bf16
    # rounding noise into a dual/anchor ratchet (drops the 0.02 kg dice,
    # winds up the 0.18 kg frictionless arch; measured on v5e,
    # docs/performance.md "Matmul precision").
    precision_floor: str = "high"

    # Optional analytic split of the inequality stack.  Many rows of ``ineq``
    # are simple box constraints (state/input limits) whose Jacobians are
    # constant +/-identity selections; tracing them through the stacked
    # jacfwd and the Gauss-Newton J^T J products wastes most of the stage-
    # linearization work.  When set, ``ineq_smooth`` returns only the
    # genuinely nonlinear rows (cones, EE box, alignment, collisions,
    # projectile) and ``ineq_box`` describes the box block so the solver can
    # add its gradient/Hessian contributions as masked scatter/diagonal
    # updates.  Row order of ``ineq`` must be
    #   [smooth_pre (n_pre rows) | x_lo | x_hi | u_lo | u_hi | smooth_post]
    # with ``ineq_smooth`` = [smooth_pre | smooth_post].
    ineq_smooth: Optional[Callable] = None  # (x, u, p_k) -> (n_ineq - n_box,)
    ineq_box: Optional["IneqBoxRows"] = None

    # Optional column blocking for the stage-constraint Jacobian w.r.t. x.
    # Forward-mode columns are computed per block with the other blocks
    # captured as constants, so tangents only flow through computations that
    # actually depend on that block (symbolic-zero pruning at trace time).
    # For the upright state x = [q, v, a, obstacles], pose kinematics depend
    # only on q — so the 2/3 of columns for v and a skip the rotation-chain
    # JVPs entirely.  Block sizes must sum to nx.
    x_jac_blocks: Optional[Tuple[int, ...]] = None

    # Analytic derivatives of stage_quad: (x, u, p_k) -> (grad (nx+nu,),
    # H (nx+nu, nx+nu)).  The quadratic's Hessian is a constant
    # weight-matrix block diagonal; supplying it directly keeps
    # jax.hessian's jacfwd-of-jacrev ladder out of the traced stage program.
    stage_quad_derivs: Optional[Callable] = None

    # Differentiation mode for the stacked stage-constraint Jacobian:
    # "fwd" = one jacfwd over z (nx+nu tangent columns), "rev" = one jacrev
    # (one VJP per stacked row).  With the analytic box-row split the stacked
    # Jacobian is short and wide (e.g. 12 rows x 40 columns on the flagship
    # problem), so reverse mode does 3x fewer derivative passes.  Ignored
    # when x_jac_blocks is set (column blocking is a forward-mode concept).
    jac_mode: str = "fwd"


@dataclasses.dataclass(frozen=True)
class IneqBoxRows:
    """Box-row block description for OCP.ineq (see OCP.ineq_smooth)."""

    n_pre: int  # smooth rows before the box block
    nx_box: int  # boxed leading state entries (0 if no state box)
    nu_box: int  # boxed input entries (0 if no input box)

    @property
    def n_box(self):
        return 2 * (self.nx_box + self.nu_box)


def zeros_warm_start(ocp: OCP, x0):
    """Cold-start trajectories: hold x0, zero inputs and multipliers."""
    X = jnp.tile(x0[None, :], (ocp.N + 1, 1))
    U = jnp.zeros((ocp.N, ocp.nu))
    lam = jnp.zeros((ocp.N, ocp.n_eq))
    mu = jnp.zeros((ocp.N, ocp.n_ineq))
    lam_f = jnp.zeros((ocp.n_feq,))
    return SolverState(X=X, U=U, lam=lam, mu=mu, lam_f=lam_f)


import flax.struct


@flax.struct.dataclass
class SolverState:
    """Warm-startable solver state: trajectories + AL multipliers."""

    X: jnp.ndarray  # (N+1, nx)
    U: jnp.ndarray  # (N, nu)
    lam: jnp.ndarray  # (N, n_eq) equality multipliers
    mu: jnp.ndarray  # (N, n_ineq) inequality multipliers (>= 0)
    lam_f: jnp.ndarray  # (n_feq,) terminal equality multipliers


@flax.struct.dataclass
class Solution:
    """Solver output: optimal trajectories + time-varying feedback policy."""

    state: SolverState
    K: jnp.ndarray  # (N, nu, nx) feedback gains about the optimal trajectory
    cost: jnp.ndarray  # scalar objective (without AL terms)
    eq_viol: jnp.ndarray  # max |g|
    ineq_viol: jnp.ndarray  # max(0, -h) max
    defect: jnp.ndarray  # max dynamics defect after the solve
