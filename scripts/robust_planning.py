#!/usr/bin/env python
"""Robust planning experiment driver.

Equivalent of the reference's upright_robust/scripts/planning_sim_loop.py +
process_sim_runs.py, collapsed into one batched program:

  1. solve the offline robust plan (CoM-box vertex scenarios in one OCP)
  2. track it under a grid of true inertial parameters — the whole sweep is
     one vmapped rollout of the JAX plant
  3. report failures (object displacement > 0.5 m) and the closed-form
     worst-case constraint analysis

Usage:
  python scripts/robust_planning.py --config configs/demos/ur10_demo.yaml \
      --com-box 0.02 0.02 0.04 --duration 3.0
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import json

import numpy as np

import upright_tpu.config as cfg
from upright_tpu.robust import modelling as rm
from upright_tpu.robust import verification as rv
from upright_tpu.robust.planning import make_param_sweep, plan_robust, tracking_sweep
from upright_tpu.sim.simulation import UprightSimulation


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--com-box", nargs=3, type=float, default=None,
                        help="CoM uncertainty half extents (x y z)")
    parser.add_argument("--duration", type=float, default=None)
    parser.add_argument("--iterations", type=int, default=60)
    parser.add_argument("--com-grid", type=int, default=5,
                        help="CoM offsets per axis in the sweep")
    parser.add_argument("--inertia-scales", nargs="*", type=float,
                        default=[0.5, 1.0, 2.0])
    parser.add_argument("--kp", type=float, default=10.0)
    parser.add_argument("--realizable", action="store_true",
                        help="also verify over the density-realizable "
                             "(moment-SDP) parameter set")
    parser.add_argument("--parallel-scan", action="store_true",
                        help="use the O(log N) associative-scan Riccati "
                             "backward pass (long horizons)")
    parser.add_argument("--protocol", choices=["ral25"], default=None,
                        help="run a canned experiment protocol: ral25 = "
                             "15 CoM x 3 inertia x waypoints with worst-case "
                             "inertia synthesis (planning_sim_loop.py)")
    args = parser.parse_args()

    config = cfg.load_config(args.config)

    if args.protocol == "ral25":
        from upright_tpu.robust.planning import ral25_protocol

        com_boxes = [args.com_box] if args.com_box else None
        # leaf configs may pin the planner's CoM model (the ral25 real
        # box{1,2,3} matrix: controller.robust.com_variant)
        com_variant = (
            config["controller"].get("robust", {}).get("com_variant", "robust")
        )
        out = ral25_protocol(
            config, com_half_extents=com_boxes,
            duration=args.duration, iterations=args.iterations,
            kp=args.kp, use_parallel_scan=args.parallel_scan,
            com_variant=com_variant,
        )
        print(json.dumps(out, indent=2))
        return

    n_obj = 1  # single-object robust experiments, like the reference
    com_boxes = [args.com_box] * n_obj if args.com_box else None

    print("solving offline plan...")
    prob, sol, plan = plan_robust(
        config, com_half_extents=com_boxes,
        duration=args.duration, iterations=args.iterations,
        use_parallel_scan=args.parallel_scan,
    )
    print(f"  eq violation {float(sol.eq_viol):.2e}, "
          f"ineq violation {float(sol.ineq_viol):.2e}")

    # parameter sweep grid (reference: 15 CoM x 3 inertia scales)
    sim = UprightSimulation(config["simulation"])
    if args.com_box:
        hx, hy, _ = args.com_box
        grid = np.linspace(-1, 1, args.com_grid)
        com_offsets = [[gx * hx, gy * hy, 0.0] for gx in grid for gy in grid]
    else:
        com_offsets = [[0.0, 0, 0]]
    sweep = make_param_sweep(
        sim, com_offsets=com_offsets, inertia_scales=args.inertia_scales,
    )

    n_runs = len(com_offsets) * len(args.inertia_scales)
    print(f"tracking sweep: {n_runs} parameter sets (one vmapped rollout)...")
    disp = tracking_sweep(sim, plan, sweep, kp=args.kp)
    failures = rv.count_failures(disp)

    # worst-case CWC verification of the plan
    conf_parse = dict(config["controller"])
    model, names, objects, contacts = cfg.parse_control_objects(conf_parse)
    rcps = [rm.RobustContactPoint(c) for c in contacts]
    A = rm.compute_cwc_face_form(rm.compute_object_name_index(names), rcps)
    obj = objects[names[0]]
    pset = (
        rv.ParameterSet.from_com_box(obj.mass, obj.com, obj.inertia, args.com_box)
        if args.com_box
        else rv.ParameterSet(center=rv.theta_from_body(obj.mass, obj.com, obj.inertia))
    )
    states = []
    for x in plan.X[:: max(1, len(plan.X) // 50)]:
        ee = prob.robot.ee_state(x[: prob.dims.robot_x])
        states.append(
            (np.asarray(ee.C_we), np.asarray(ee.w_ew_w),
             np.asarray(ee.alpha_ew_w), np.asarray(ee.a_ew_w))
        )
    viol = rv.verify_plan(A, states, np.asarray(prob.gravity), pset)

    out = {
        "runs": n_runs,
        "failures": failures,
        "max_displacement_m": float(disp.max()),
        "worst_case_cwc_violation": float(viol.max()),
        "plan_eq_violation": float(sol.eq_viol),
    }

    if args.realizable:
        # density-realizable (moment-SDP) worst case: tighter than the
        # vertex set, maximized over all mass densities on the object's
        # bounding box with CoM in the com-box
        # (process_sim_runs.py:134-250 equivalent, batched on device)
        from upright_tpu.robust.realizable import (
            RealizableSet,
            verify_plan_realizable,
        )

        com_half = np.asarray(args.com_box if args.com_box else [0.0, 0.0, 0.0])
        box = obj.box
        rsetw = RealizableSet(
            lower=box.position - np.abs(box.vertices - box.position).max(axis=0),
            upper=box.position + np.abs(box.vertices - box.position).max(axis=0),
            com_lower=np.asarray(obj.com) - com_half - 1e-4,
            com_upper=np.asarray(obj.com) + com_half + 1e-4,
            mass=obj.mass,
        )
        Ys = [
            rv.inertial_regressor(*s, np.asarray(prob.gravity)) for s in states
        ]
        viol_r = verify_plan_realizable(A, Ys, rsetw)
        out["worst_case_cwc_violation_realizable"] = float(viol_r.max())

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
