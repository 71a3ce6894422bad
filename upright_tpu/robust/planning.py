"""Offline robust planning + batched tracking sweeps.

Re-design of the reference robust experiment pipeline
(upright_robust/scripts/planning_sim_loop.py):

  1. PLAN once, offline, with a long horizon covering the whole motion, with
     the balance model replicated over CoM-box vertex scenarios — one OCP
     that must balance every scenario (reference :513-534, :132-134).
  2. TRACK the fixed plan with P-control on position
     (v_cmd = Kp (qd - q) + vd, reference :157-176).
  3. SWEEP true inertial parameters: the reference loops 135 PyBullet runs
     serially (:613-655); here the whole sweep is ONE vmapped rollout of the
     JAX plant over a batch of parameter sets.
  4. VERIFY post-hoc with the closed-form worst-case analysis
     (robust/verification.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from upright_tpu.ocp.problem import build_problem
from upright_tpu.robust.scenarios import stack_vertex_scenarios_in_model
from upright_tpu.solver.al import ALConfig, solve
from upright_tpu.solver.ocp import zeros_warm_start


@dataclasses.dataclass
class OfflinePlan:
    dt: float
    ts: np.ndarray  # (N+1,)
    X: np.ndarray  # (N+1, nx)
    U: np.ndarray  # (N, nu)

    def interpolate(self, t):
        """(qd, vd) at time t (clamped past the horizon end, reference
        track_plan_node.cpp zero command after horizon)."""
        tau = np.clip(t / self.dt, 0.0, len(self.U) - 1e-9)
        k = int(np.floor(tau))
        a = tau - k
        xd = (1 - a) * self.X[k] + a * self.X[k + 1]
        return xd

    def dense(self, rate):
        """Per-tick desired states at the given control rate."""
        T = self.ts[-1]
        n = int(np.floor(T * rate))
        return np.stack([self.interpolate(i / rate) for i in range(n)])


def plan_robust(config, com_half_extents=None, duration=None, iterations=60,
                rho=10.0, use_parallel_scan=False):
    """Solve the offline robust plan.

    com_half_extents: per-object CoM uncertainty boxes; when given, the
    balance model is expanded 8x (vertex scenarios, reference :513-534).
    duration: plan horizon in seconds (defaults to mpc.time_horizon).
    """
    ctrl = config["controller"]
    dt = float(ctrl.get("sqp", {}).get("dt", 0.1))
    if duration is None:
        duration = float(ctrl.get("mpc", {}).get("time_horizon", 2.0))
    N = int(round(duration / dt))

    prob = build_problem(config, N=N)
    balance_params = None
    if com_half_extents is not None and prob.balance_model.num_objects:
        robust_model = stack_vertex_scenarios_in_model(
            prob.balance_model, com_half_extents
        )
        # rebuild the problem with the expanded model: simplest is to patch
        # the model and re-assemble (dims change: 8x objects, same contacts)
        prob = _with_balance_model(config, N, robust_model)
        balance_params = robust_model.params

    # long-horizon offline plans use the O(log N) associative-scan Riccati
    # (SURVEY §5.7: the horizon is this engine's sequence-parallel axis)
    al_cfg = ALConfig(
        iterations=iterations, rho_eq=rho, rho_ineq=rho,
        backward="pscan" if use_parallel_scan else "scan",
    )
    params = prob.stage_params(0.0, balance_params=balance_params)
    sol = jax.jit(
        lambda p, x0, s: solve(prob.ocp, al_cfg, p, x0, s)
    )(params, prob.x0, zeros_warm_start(prob.ocp, prob.x0))

    ts = np.arange(N + 1) * dt
    return prob, sol, OfflinePlan(
        dt=dt, ts=ts, X=np.asarray(sol.state.X), U=np.asarray(sol.state.U)
    )


def _with_balance_model(config, N, model):
    """Build the problem, then swap in an expanded balance model.

    The OCP closures capture the model via its stacked arrays; rebuilding
    with a patched parse is the cleanest path."""
    import upright_tpu.ocp.problem as problem_mod

    prob = build_problem(config, N=N)
    if model.params.shape == prob.balance_model.params.shape:
        return prob

    # monkey-level swap: rebuild with the expanded model by overriding the
    # parser output
    orig = problem_mod.cfg_mod.parse_control_objects

    def patched(conf):
        m, names, objects, contacts = orig(conf)
        return model, names, objects, contacts

    problem_mod.cfg_mod.parse_control_objects = patched
    try:
        prob = build_problem(config, N=N)
    finally:
        problem_mod.cfg_mod.parse_control_objects = orig
    return prob


def tracking_sweep(sim, plan: OfflinePlan, param_batch, kp=10.0,
                   ctrl_rate=125.0, duration=None):
    """Track the plan under a batch of true inertial parameters — the whole
    sweep is one jitted, vmapped rollout.

    param_batch: pytree with leading batch axis matching
    ``sim.default_params()`` leaves.
    Returns final object displacements (B, n_obj) in the tray frame.
    """
    nq = sim.robot.nq
    duration = duration or float(plan.ts[-1])
    n_ticks = int(np.floor(duration * ctrl_rate))
    n_sub = max(1, int(round(1.0 / ctrl_rate / sim.timestep)))
    xd_ticks = jnp.asarray(plan.dense(ctrl_rate)[:n_ticks])

    def rollout(params):
        state = sim.initial_state()

        def tick(state, xd):
            qd = xd[:nq]
            vd = xd[nq : 2 * nq]
            v_cmd = kp * (qd - state.q) + vd
            new_state = sim._step_impl(state, v_cmd, n_sub, params)
            return new_state, None

        final, _ = jax.lax.scan(tick, state, xd_ticks)
        return final

    finals = jax.jit(jax.vmap(rollout))(param_batch)

    # displacements in the EE frame vs nominal
    def displacement(state):
        R_we, r_ew = sim.robot.ee_pose(state.q)
        out = []
        for i, spec in enumerate(sim.specs):
            r_oe = R_we.T @ (state.objects.r[i] - r_ew)
            out.append(jnp.linalg.norm(r_oe - jnp.asarray(spec.com_world_ee)))
        disp = jnp.stack(out)
        if state.objects.diverged is not None:
            # integrator blow-up latched by the plant's divergence freeze:
            # count as inf so n_diverged statistics still fire
            disp = jnp.where(state.objects.diverged, jnp.inf, disp)
        return disp

    return np.asarray(jax.vmap(displacement)(finals))


def make_param_sweep(sim, com_offsets=None, mass_scales=None, inertia_scales=None,
                     inertias=None):
    """Cartesian parameter sweep matching the reference's 15 CoM x 3 inertia
    grid (:548-655), as a batched pytree for tracking_sweep.

    inertias: optional per-CoM-offset (3,3) inertia overrides (e.g. the
    worst-case synthesis output); scaled by inertia_scales like the nominal.
    """
    base = sim.default_params()
    com_offsets = np.asarray(com_offsets if com_offsets is not None else [[0.0, 0, 0]])
    mass_scales = np.asarray(mass_scales if mass_scales is not None else [1.0])
    inertia_scales = np.asarray(inertia_scales if inertia_scales is not None else [1.0])

    entries = []
    for ci, co in enumerate(com_offsets):
        if inertias is not None:
            I_base = jnp.broadcast_to(
                jnp.asarray(inertias[ci]), base["inertia"].shape
            )
        else:
            I_base = base["inertia"]
        for ms in mass_scales:
            for is_ in inertia_scales:
                entries.append(
                    {
                        "mass": base["mass"] * ms,
                        "inertia": I_base * is_,
                        "mu": base["mu"],
                        "com_offset": jnp.broadcast_to(
                            jnp.asarray(co), base["com_offset"].shape
                        ),
                    }
                )
    return jax.tree.map(lambda *xs: jnp.stack(xs), *entries)


def verify_offline_plan(prob, plan, com_half_extents,
                        inertia_scales=(1.0,), realizable=False,
                        max_states=50):
    """Post-hoc worst-case CWC verification of one offline plan — the
    reference's process_sim_runs.py:87-270 step: for each planned state,
    maximize each contact-wrench-cone face violation over the inertial
    ambiguity set (CoM box x inertia scales; exact vertex form), optionally
    also over the density-REALIZABLE set (moment relaxation,
    robust/realizable.py).

    Returns {"worst_case_cwc_violation", "violation_steps", "n_states",
    ["worst_case_cwc_violation_realizable"]}.  Positive violation = some
    feasible parameters break balance at that planned state.

    SINGLE-OBJECT only (the ral25 protocol's regime, matching the
    reference's one-box experiments): the ambiguity set is built from
    ``objects[names[0]]``/``com_half_extents[0]``, so a multi-object
    arrangement would silently certify with the first object's parameter
    set — we raise instead.
    """
    import upright_tpu.config as cfg_mod
    from upright_tpu.robust import modelling as rm
    from upright_tpu.robust import verification as rv

    conf_parse = dict(prob.config["controller"])
    model, names, objects, contacts = cfg_mod.parse_control_objects(conf_parse)
    if len(names) > 1:
        raise ValueError(
            "verify_offline_plan certifies a SINGLE uncertain object "
            f"(got {len(names)}: {names}); per-object ambiguity sets for "
            "multi-object arrangements are not implemented"
        )
    rcps = [rm.RobustContactPoint(c) for c in contacts]
    A = rm.compute_cwc_face_form(rm.compute_object_name_index(names), rcps)
    obj = objects[names[0]]
    pset = rv.ParameterSet.from_com_box(
        obj.mass, obj.com, obj.inertia, np.asarray(com_half_extents[0]),
        inertia_scales=tuple(inertia_scales),
    )
    stride = max(1, len(plan.X) // max_states)
    states = []
    for x in plan.X[::stride]:
        ee = prob.robot.ee_state(jnp.asarray(x[: prob.dims.robot_x]))
        states.append(
            (np.asarray(ee.C_we), np.asarray(ee.w_ew_w),
             np.asarray(ee.alpha_ew_w), np.asarray(ee.a_ew_w))
        )
    g = np.asarray(prob.gravity)
    viol = rv.verify_plan(A, states, g, pset)
    out = {
        "worst_case_cwc_violation": float(viol.max()),
        "violation_steps": int((viol > 0.0).sum()),
        "n_states": int(len(states)),
    }
    if realizable:
        from upright_tpu.robust.realizable import (
            RealizableSet,
            verify_plan_realizable,
        )

        com_half = np.asarray(com_half_extents[0], dtype=float)
        box = obj.box
        half = np.abs(box.vertices - box.position).max(axis=0)
        rset = RealizableSet(
            lower=box.position - half,
            upper=box.position + half,
            com_lower=np.asarray(obj.com) - com_half - 1e-4,
            com_upper=np.asarray(obj.com) + com_half + 1e-4,
            mass=obj.mass,
        )
        Ys = [rv.inertial_regressor(*s, g) for s in states]
        viol_r = verify_plan_realizable(A, Ys, rset)
        out["worst_case_cwc_violation_realizable"] = float(viol_r.max())
    return out


def ral25_protocol(config, com_half_extents=None, waypoints=None,
                   inertia_scales=(1.0, 0.5, 0.1), iterations=60,
                   duration=None, kp=10.0, approx_bounds=False,
                   use_parallel_scan=False, failure_threshold=0.5,
                   com_variant="robust", verify=False,
                   verify_realizable=False):
    """The reference robust experiment, end-to-end (planning_sim_loop.py
    :548-655 + process_sim_runs.py): for each waypoint, solve ONE offline
    plan, then track it under the full 15-CoM x len(inertia_scales) grid of
    true inertial parameters with per-CoM **worst-case inertias**
    (synthesis.max_min_eig_inertia) — the whole 45-run sweep per waypoint is
    one vmapped rollout.

    com_variant selects the planner's CoM model (reference --com flag,
    planning_sim_loop.py:426-431):
      "robust"  — 8 CoM-vertex scenarios in one OCP,
      "center" / "top" / "bottom" — nominal single-CoM planning with the
      CoM pinned at the centroid / +z / -z extreme of the uncertainty box.

    com_half_extents: CoM-box half extents per object; defaults to the
    config's ``bounds`` schema (robust/parsing.py:10-101 equivalent).
    Returns a dict with per-waypoint failure counts and displacements.
    """
    import copy as _copy

    from upright_tpu.robust.synthesis import (
        com_offset_grid,
        max_min_eig_inertia,
        parse_robust_bounds,
    )
    from upright_tpu.sim.simulation import UprightSimulation

    ctrl_conf = config["controller"]
    if com_half_extents is None:
        com_half_extents = parse_robust_bounds(ctrl_conf, approx=approx_bounds)
        if com_half_extents is None:
            raise ValueError(
                "no CoM bounds: pass com_half_extents or add a bounds block "
                "to the object config"
            )
    if waypoints is None:
        waypoints = [
            np.asarray(wp.get("position", [0, 0, 0]), dtype=float)
            for wp in ctrl_conf.get("waypoints", [{}])
        ]

    sim = UprightSimulation(config["simulation"])
    assert sim.n_obj >= 1, "protocol needs at least one balanced object"
    spec0 = sim.specs[0]
    # the object's bounding-box half extents for the vertex-mass synthesis
    obj_half = np.abs(np.asarray(spec0.vertices_local)).max(axis=0)

    com_offsets = com_offset_grid(np.asarray(com_half_extents[0]))
    worst_inertias = [
        np.diag(max_min_eig_inertia(obj_half, co, mass=spec0.mass))
        for co in com_offsets
    ]

    # explicit-integration stability across the SWEEP: the auto substep
    # count is sized for the nominal inertia, but the 0.1-scaled worst-case
    # inertias have a much stiffer rotational contact mode (omega ~
    # 1/sqrt(I)); without this the light-inertia runs integrate unstably
    # and return NaN displacements
    I_min_nom = min(
        float(np.diag(np.asarray(sp.inertia_local)).min()) for sp in sim.specs
    )
    I_min_sweep = min(
        float(s * np.diag(I).min())
        for I in worst_inertias
        for s in inertia_scales
    )
    if I_min_sweep < I_min_nom:
        factor = float(np.sqrt(I_min_nom / max(I_min_sweep, 1e-12)))
        config = _copy.deepcopy(config)
        config["simulation"]["object_substeps"] = int(
            np.ceil(sim.object_substeps * factor)
        )
        sim = UprightSimulation(config["simulation"])

    if com_variant not in ("robust", "center", "top", "bottom"):
        raise ValueError(f"unknown com_variant {com_variant!r}")
    plan_extents = com_half_extents if com_variant == "robust" else None

    results = []
    for wp in waypoints:
        wp_config = _copy.deepcopy(config)
        wp_config["controller"]["waypoints"] = [
            {"time": 0, "position": list(np.asarray(wp)), "orientation": [0, 0, 0, 1]}
        ]
        # pristine copy for verification: the ambiguity set is centered at
        # the NOMINAL CoM even when the planner pins it to a box extreme
        verify_config = _copy.deepcopy(wp_config)
        if com_variant in ("top", "bottom"):
            # nominal planning with the CoM pinned at a box extreme
            # (reference planning_sim_loop.py:495-501)
            sign = 1.0 if com_variant == "top" else -1.0
            arr = wp_config["controller"]["arrangements"][
                wp_config["controller"]["balancing"]["arrangement"]
            ]
            for i, obj in enumerate(arr["objects"]):
                dz = sign * float(np.asarray(com_half_extents[i])[2])
                wp_config["controller"]["objects"][obj["type"]][
                    "com_offset"
                ] = [0.0, 0.0, dz]
        prob, sol, plan = plan_robust(
            wp_config, com_half_extents=plan_extents,
            duration=duration, iterations=iterations,
            use_parallel_scan=use_parallel_scan,
        )
        sweep = make_param_sweep(
            sim, com_offsets=com_offsets,
            inertia_scales=list(inertia_scales),
            inertias=worst_inertias,
        )
        disp = tracking_sweep(sim, plan, sweep, kp=kp)
        from upright_tpu.robust.verification import count_failures

        worst = disp.max(axis=1)
        finite = worst[np.isfinite(worst)]
        entry = {
            "waypoint": [float(v) for v in np.asarray(wp, dtype=float)],
            "runs": int(disp.shape[0]),
            "failures": count_failures(disp, failure_threshold),
            "n_diverged": int((~np.isfinite(worst)).sum()),
            "max_displacement_m": (
                float(finite.max()) if finite.size else float("nan")
            ),
            "plan_eq_violation": float(sol.eq_viol),
        }
        if verify:
            # post-hoc worst-case certification of the PLAN over the full
            # ambiguity set (the nominal problem's CWC, independent of the
            # planner's own CoM model — a nominal plan is judged against
            # the same uncertainty the robust plan covers)
            nominal_prob = build_problem(
                verify_config, N=int(round(plan.ts[-1] / plan.dt))
            )
            entry["verification"] = verify_offline_plan(
                nominal_prob, plan, com_half_extents,
                inertia_scales=inertia_scales,
                realizable=verify_realizable,
            )
        results.append(entry)
    total = {
        "protocol": "ral25",
        "com_variant": com_variant,
        "runs": sum(r["runs"] for r in results),
        "failures": sum(r["failures"] for r in results),
        "waypoints": results,
    }
    return total
