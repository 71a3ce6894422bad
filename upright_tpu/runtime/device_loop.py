"""Fully on-device steady-state MPC loop: replan + policy + plant in one scan.

The reference decouples the MPC solve rate from the tracking rate across two
processes (mrt_node.cpp:350-363); the host-side analogue here is
runtime/tracker.py.  On TPU, per-replan host dispatch costs more than the
solve itself in tunneled environments, so the steady-state loop is ALSO
offered as a single device computation: a ``lax.scan`` whose body performs

  observe (device plant state) -> shift/heal warm start -> 1-iteration SQP
  replan -> LQR policy evaluation -> jerk double-integration -> plant step

Observations never leave the device; the host reads back only the carry
(and whatever per-replan diagnostics the scan stacks).  One dispatch runs
``n_replans`` control cycles, so the measured per-replan cost is the true
device cost with dispatch amortized to nothing — the unconditional form of
the real-time budget claim (bench.py reports it as the headline latency).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp

from upright_tpu.ocp.problem import UprightProblem
from upright_tpu.sim.simulation import SimState, UprightSimulation
from upright_tpu.solver.al import ALConfig, solve
from upright_tpu.solver.ocp import SolverState


@flax.struct.dataclass
class LoopCarry:
    """Device-resident closed-loop state."""

    t: jnp.ndarray  # scalar time
    sim: SimState
    solver: SolverState
    a_state: jnp.ndarray  # controller's triple-integrator acceleration belief


@flax.struct.dataclass
class LoopMetrics:
    """Per-replan diagnostics stacked by the scan."""

    eq_viol: jnp.ndarray
    cost: jnp.ndarray
    r_ew_w: jnp.ndarray  # EE position after the plant step


def build_device_loop(
    problem: UprightProblem,
    sim: UprightSimulation,
    al_cfg: Optional[ALConfig] = None,
    ctrl_rate: float = 100.0,
    use_feedback_policy: bool = True,
):
    """Build (init_carry, run) for the fused on-device loop.

    ``run(carry, n_replans)`` executes n_replans control cycles at
    ``ctrl_rate`` in one jitted scan and returns (carry, LoopMetrics).
    The replan cadence equals the control rate (the reference's 100 Hz
    min_policy_update_time with every tick replanning).

    Restriction: dynamic-obstacle problems need host-fed Vicon estimates and
    stay on the host tracker path; this loop covers the num_obstacles == 0
    workloads (the throughput/latency benchmark shape).
    """
    if problem.dims.num_obstacles:
        raise ValueError(
            "device loop supports obstacle-free problems; dynamic obstacles "
            "need host-fed estimates (runtime/tracker.py)"
        )
    cfg = al_cfg or ALConfig(iterations=1)
    dt_ctrl = 1.0 / ctrl_rate
    n_sub = max(1, int(round(dt_ctrl / sim.timestep)))
    nq = problem.dims.robot_q
    ocp = problem.ocp
    # same whole-node rounding as ControllerManager.step: inputs are
    # piecewise-constant per shooting interval, so sub-node replans keep
    # shift 0 and stay exactly feasible
    shift = float(round(dt_ctrl / problem.dt))

    def tick(carry: LoopCarry, _, target=None):
        q, v = carry.sim.q, carry.sim.v
        x = jnp.concatenate([q, v, carry.a_state])

        params = problem.stage_params(
            carry.t, problem.target if target is None else target
        )
        warm = problem.heal_warm_start(
            problem.shift_warm_start(carry.solver, shift), x
        )
        sol = solve(ocp, cfg, params, x, warm)

        # policy at tau = 0 (immediately after the replan): k = 0, alpha = 0
        u = sol.state.U[0]
        if use_feedback_policy:
            u = u + sol.K[0] @ (x - sol.state.X[0])
        j = u[:nq]

        v_cmd = v + dt_ctrl * carry.a_state + 0.5 * dt_ctrl**2 * j
        a_next = carry.a_state + dt_ctrl * j

        sim_next = sim.step(carry.sim, v_cmd, n_steps=n_sub)

        # trace-safe EE pose (sim.ee_pose materializes numpy for host callers)
        _, r_ew = sim.robot.ee_pose(sim_next.q)
        metrics = LoopMetrics(
            eq_viol=sol.eq_viol, cost=sol.cost, r_ew_w=jnp.asarray(r_ew)
        )
        return (
            LoopCarry(
                t=carry.t + dt_ctrl, sim=sim_next, solver=sol.state,
                a_state=a_next,
            ),
            metrics,
        )

    def run(carry: LoopCarry, n_replans: int, target=None):
        """target: optional TargetTrajectory override (a vmappable pytree —
        batch it to run e.g. the three ral23 waypoints of one experiment
        group as a single vmapped closed loop, scripts/ral23_sweep.py)."""
        body = tick if target is None else (
            lambda c, x: tick(c, x, target=target)
        )
        return jax.lax.scan(body, carry, None, length=n_replans)

    def init_carry(t0=0.0, sim_state: Optional[SimState] = None,
                   solver_state: Optional[SolverState] = None,
                   target=None) -> LoopCarry:
        """Carry from a warm-started solver state (run an initial
        ControllerManager.warmstart() or al.solve first)."""
        if sim_state is None:
            sim_state = sim.initial_state()
        if solver_state is None:
            from upright_tpu.solver.ocp import zeros_warm_start

            x0 = jnp.concatenate(
                [sim_state.q, sim_state.v, jnp.zeros(nq)]
            )
            warm_cfg = dataclasses.replace(cfg, iterations=12)
            tgt = problem.target if target is None else target
            solver_state = solve(
                ocp, warm_cfg, problem.stage_params(t0, tgt), x0,
                zeros_warm_start(ocp, x0),
            ).state
        return LoopCarry(
            t=jnp.asarray(float(t0)),
            sim=sim_state,
            solver=solver_state,
            a_state=jnp.zeros(nq),
        )

    return init_carry, run
