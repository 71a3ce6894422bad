#!/usr/bin/env python
"""Throughput-vs-devices scaling curve on a virtual device mesh.

BASELINE.md asks for scaling reported at 1 chip / 1 host / >= 2 hosts; this
environment has ONE physical TPU chip, so the scaling *shape* is measured on
a virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=N) and
the single-chip absolute numbers come from bench.py.  Both parallel axes
(problem batch dp, robust scenarios sp) are embarrassingly parallel in the
solve, so the expected curve is linear; this script *measures* it rather
than asserting it.

Usage:  python scripts/scaling_curve.py [--devices 8] [--batch-per-dev 16]
Prints one JSON line per mesh size.
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--devices", type=int, default=8)
    parser.add_argument("--batch-per-dev", type=int, default=16)
    parser.add_argument("--reps", type=int, default=5)
    args = parser.parse_args()

    # force a virtual CPU mesh before jax initializes
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices}"
    ).strip()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import upright_tpu.config as cfg
    from upright_tpu.ocp.problem import build_problem
    from upright_tpu.parallel.batch import (
        batch_warm_starts,
        broadcast_params,
        make_mesh,
        sharded_solve_fn,
    )
    from upright_tpu.solver.al import ALConfig

    path = cfg.resolve_package_path(
        {"package": "configs", "path": "demos/thing_demo.yaml"}
    )
    config = cfg.load_config(path)
    prob = build_problem(config)
    al_cfg = ALConfig(iterations=1, line_search_steps=(1.0, 0.5, 0.25, 0.1))

    rng = np.random.default_rng(0)
    results = []
    n = 1
    while n <= args.devices:
        batch = n * args.batch_per_dev
        mesh = make_mesh({"dp": n})
        solve = sharded_solve_fn(prob.ocp, al_cfg, mesh, axis="dp")
        x0s = jnp.asarray(
            np.asarray(prob.x0)[None, :]
            + 0.01 * rng.standard_normal((batch, prob.ocp.nx))
        )
        params = broadcast_params(prob.stage_params(0.0), batch)
        states = batch_warm_starts(prob.ocp, x0s)
        sol = solve(params, x0s, states)
        jax.block_until_ready(sol.state.X)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            sol = solve(params, x0s, sol.state)
        jax.block_until_ready(sol.state.X)
        dt = time.perf_counter() - t0
        sps = batch * args.reps / dt
        results.append((n, sps))
        base = results[0][1]
        print(
            json.dumps(
                {
                    "devices": n,
                    "batch": batch,
                    "solves_per_s": round(sps, 1),
                    "speedup_vs_1dev": round(sps / base, 3),
                    "parallel_efficiency": round(sps / base / n, 3),
                }
            )
        )
        n *= 2


if __name__ == "__main__":
    main()
