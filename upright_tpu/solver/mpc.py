"""MPC manager: warm-started re-solving + policy evaluation.

Replaces the reference ControllerManager + OCS2 MPC/MRT machinery
(upright_control/src/upright_control/manager.py:100-209,
controller_python_interface.h:13-93).  The solver state (trajectories + AL
multipliers) persists across re-solves, reproducing the reference's
warm-started 1-iteration SQP at the replan rate; policy evaluation
interpolates the plan and applies the time-varying LQR feedback gains
(sqp.use_feedback_policy, config/controller.yaml:60).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from upright_tpu.ocp.problem import UprightProblem, build_problem
from upright_tpu.ocp.reference import TargetTrajectory
from upright_tpu.solver.al import ALConfig, solve
from upright_tpu.solver.ocp import SolverState, zeros_warm_start
from upright_tpu.solver.trajectory import StateInputTrajectory, TrajectoryInterpolator


@dataclasses.dataclass
class MPCSettings:
    """Runtime MPC settings (reference mpc/sqp config blocks)."""

    replan_interval: float = 0.01  # min time between re-solves (100 Hz cap)
    iterations: int = 1  # SQP iterations per replan
    warmstart_iterations: int = 12  # iterations for the initial solve
    rho_eq: float = 10.0
    rho_ineq: float = 10.0
    # dual safeguarding (frictional problems; see ALConfig)
    dual_update_every: int = 1
    dual_step: float = 1.0
    lam_max: float = 1e3  # equality-multiplier bound (windup safeguard)
    # zero stale duals when the warm start's violation exceeds this
    # (divergence watchdog; see ALConfig.dual_reset_violation)
    dual_reset_violation: float = 10.0
    use_feedback_policy: bool = True
    # full candidate ladder: sudden constraint activations (thrown obstacles)
    # need the fine steps; trimming to 4 froze the dodge response
    line_search_steps: tuple = (1.0, 0.5, 0.25, 0.1, 0.03, 0.01, 0.003, 0.001)

    @staticmethod
    def from_config(ctrl_conf):
        sqp = ctrl_conf.get("sqp", {})
        tracking = ctrl_conf.get("tracking", {})
        solver = ctrl_conf.get("solver", {})
        return MPCSettings(
            replan_interval=float(tracking.get("min_policy_update_time", 0.01)),
            iterations=int(sqp.get("sqp_iteration", 1)),
            warmstart_iterations=int(solver.get("warmstart_iterations", 12)),
            rho_eq=float(solver.get("rho_eq", 10.0)),
            rho_ineq=float(solver.get("rho_ineq", 10.0)),
            dual_update_every=int(solver.get("dual_update_every", 1)),
            dual_step=float(solver.get("dual_step", 1.0)),
            lam_max=float(solver.get("lam_max", 1e3)),
            dual_reset_violation=float(solver.get("dual_reset_violation", 10.0)),
            use_feedback_policy=bool(sqp.get("use_feedback_policy", True)),
        )

    def al_config(self) -> ALConfig:
        """The replan-path ALConfig these settings denote — the SINGLE source
        of truth for every closed-loop driver (ControllerManager, the ral23
        sweep's fused device loop).  In particular dual_reset_violation,
        which bounds multiplier windup on infeasible runs, is set here and
        only here for the MPC path (the bare ALConfig default of None is for
        offline/cold solves whose warm start carries no stale duals)."""
        return ALConfig(
            iterations=self.iterations,
            rho_eq=self.rho_eq,
            rho_ineq=self.rho_ineq,
            lam_max=self.lam_max,
            dual_reset_violation=self.dual_reset_violation,
            line_search_steps=tuple(self.line_search_steps),
        )


class ControllerManager:
    """Owns the problem + jitted solver; mirrors the reference manager API:
    ``warmstart()``, ``step(t, x) -> (xd, u)``, ``plan(...)``."""

    def __init__(self, problem: UprightProblem, settings: Optional[MPCSettings] = None):
        self.problem = problem
        self.settings = settings or MPCSettings.from_config(problem.config["controller"])

        self._cfg = self.settings.al_config()
        # the initial (cold) solve additionally applies the configured dual
        # safeguarding; the warm-started replan path keeps the plain
        # one-step PHR update (the reference's 1-iteration SQP semantics)
        self._warm_cfg = dataclasses.replace(
            self._cfg,
            iterations=self.settings.warmstart_iterations,
            dual_update_every=self.settings.dual_update_every,
            dual_step=self.settings.dual_step,
        )

        ocp = problem.ocp

        # warm-start time-shift + healing are fused into the jitted replan
        # (pure jax ops; running them eagerly would dispatch scans per
        # replan).  ``shift`` is traced, so varying replan cadence does not
        # recompile.
        self._solve = jax.jit(
            lambda params, x0, state, shift: solve(
                ocp,
                self._cfg,
                params,
                x0,
                problem.heal_warm_start(
                    problem.shift_warm_start(state, shift), x0
                ),
            )
        )
        self._solve_warm = jax.jit(
            lambda params, x0, state: solve(ocp, self._warm_cfg, params, x0, state)
        )

        self.state: Optional[SolverState] = None
        self.solution = None
        self.last_plan_time = -np.inf
        self.target = problem.target
        self.replanning_durations = []  # wall-clock per replan (profiling
        # parity with manager.py:163-168)

        # operating points: a saved plan used as the initial solver guess
        # (reference wrappers.py:289-296, controller_interface.cpp:380-387)
        self._operating_traj: Optional[StateInputTrajectory] = None
        op_conf = problem.config["controller"].get("operating_points", {})
        if op_conf.get("enabled", False):
            self._operating_traj = StateInputTrajectory.load(op_conf["path"])

    @classmethod
    def from_config(cls, config, settings: Optional[MPCSettings] = None):
        return cls(build_problem(config), settings)

    # -- lifecycle -------------------------------------------------------

    def reset(self, target: Optional[TargetTrajectory] = None):
        if target is not None:
            self.target = target
        self.state = None
        self.solution = None
        self.last_plan_time = -np.inf

    def set_operating_points(self, traj: StateInputTrajectory):
        """Use a saved plan as the initial solver guess (the reference's
        operating-points mechanism, wrappers.py:289-296)."""
        self._operating_traj = traj

    def _initial_guess(self, t, x):
        """Cold-start state, seeded from the operating-point trajectory when
        one is configured (controller_interface.cpp:380-387: OCS2 falls back
        to OperatingPoints interpolation for uninitialized time intervals)."""
        state = zeros_warm_start(self.problem.ocp, x)
        traj = self._operating_traj
        if traj is None:
            return state
        N, dt = self.problem.ocp.N, self.problem.dt
        interp = TrajectoryInterpolator(traj, self.problem.dims.robot_q)
        samples = [interp.interpolate(t + k * dt) for k in range(N + 1)]
        X = np.stack([s[0] for s in samples])
        U = np.stack([s[1] for s in samples[:-1]])
        nx, nu = self.problem.ocp.nx, self.problem.ocp.nu
        if X.shape[1] != nx or U.shape[1] != nu:
            raise ValueError(
                f"operating-point trajectory dims {X.shape[1]}/{U.shape[1]} "
                f"do not match problem dims {nx}/{nu}"
            )
        X = jnp.asarray(X).at[0].set(x)
        return state.replace(X=X, U=jnp.asarray(U))

    def warmstart(self, t=0.0, x=None):
        """Initial high-iteration solve (reference manager.py:147-154)."""
        x = self.problem.x0 if x is None else jnp.asarray(x)
        params = self.problem.stage_params(t, self.target)
        state = self._initial_guess(t, x)
        t_start = time.perf_counter()
        sol = self._solve_warm(params, x, state)
        jax.block_until_ready(sol.state.X)
        self.replanning_durations.append(time.perf_counter() - t_start)
        self.state = sol.state
        self.solution = sol
        self.last_plan_time = t
        return sol

    # -- control loop ----------------------------------------------------

    def step(self, t, x):
        """Advance the MPC (replan if due) and evaluate the policy at (t, x).

        Returns (xd, u): desired state and input, with the LQR feedback
        applied if enabled (reference manager.py:156-176 +
        mrt evaluatePolicy semantics)."""
        x = jnp.asarray(x)
        if self.state is None:
            self.warmstart(t, x)
        elif t >= self.last_plan_time + self.settings.replan_interval:
            params = self.problem.stage_params(t, self.target)
            # round to whole nodes: inputs are piecewise-constant per
            # shooting interval, so a converged warm start stays exactly
            # feasible under sub-interval replanning (shift 0), while a
            # full-node advance (e.g. plan() at the shooting cadence) rolls
            # the trajectory so the 1-iteration SQP starts aligned
            shift = round((t - self.last_plan_time) / self.problem.dt)
            t_start = time.perf_counter()
            sol = self._solve(params, x, self.state, shift)  # shift+heal in jit
            jax.block_until_ready(sol.state.X)
            self.replanning_durations.append(time.perf_counter() - t_start)
            self.state = sol.state
            self.solution = sol
            self.last_plan_time = t

        return self.evaluate_policy(t, x)

    def evaluate_policy(self, t, x):
        """Interpolate the plan at time t; optionally add LQR feedback."""
        sol = self.solution
        dt = self.problem.dt
        tau = (t - self.last_plan_time) / dt
        k = int(np.clip(np.floor(float(tau)), 0, self.problem.ocp.N - 1))
        alpha = float(np.clip(float(tau) - k, 0.0, 1.0))

        X, U = sol.state.X, sol.state.U
        xd = (1 - alpha) * X[k] + alpha * X[k + 1]
        u = U[k]
        if self.settings.use_feedback_policy:
            u = u + sol.K[k] @ (jnp.asarray(x) - X[k])
        return np.asarray(xd), np.asarray(u)

    def plan(self, timestep, duration, t0=0.0, x0=None) -> StateInputTrajectory:
        """Construct a plan by rolling the MPC forward, feeding the planned
        state back as the observation (reference manager.py:186-209: each
        step observes the previous x_opt, so the policy is pure feedforward
        — the feedback term vanishes at x == X[k])."""
        x = np.asarray(self.problem.x0 if x0 is None else x0)
        if self.state is None:
            self.warmstart(t0, x)
        nq = self.problem.dims.robot_q
        rx = self.problem.dims.robot_x
        ts, xs, us = [], [], []
        t = float(t0)
        h = float(timestep)
        while t <= t0 + duration + 1e-9:
            # replan from the current (planned) observation; at x == X[0]
            # the feedback term vanishes, so u is the pure feedforward
            _xd, u = self.step(t, x)
            ts.append(t)
            xs.append(x)
            us.append(np.asarray(u))
            # advance the observation by EXACT integration of the triple
            # integrator under the returned jerk (interpolating the plan
            # instead would feed back dynamically-inconsistent states and
            # wind up the AL multipliers)
            q, v, a = x[:nq], x[nq : 2 * nq], x[2 * nq : 3 * nq]
            j = np.asarray(u)[:nq]
            parts = [
                q + h * v + 0.5 * h**2 * a + h**3 / 6.0 * j,
                v + h * a + 0.5 * h**2 * j,
                a + h * j,
            ]
            for i in range(self.problem.dims.num_obstacles):
                s = x[rx + 9 * i : rx + 9 * (i + 1)]
                ro, vo, ao = s[:3], s[3:6], s[6:9]
                parts.append(
                    np.concatenate([ro + h * vo + 0.5 * h**2 * ao, vo + h * ao, ao])
                )
            x = np.concatenate(parts)
            t += h
        return StateInputTrajectory(
            ts=np.asarray(ts), xs=np.asarray(xs), us=np.asarray(us)
        )
