#!/usr/bin/env python
"""Benchmark: batched MPC solves/s at the reference operating point.

Problem: full mobile manipulator (Ridgeback + UR10, 27-state) balancing a
pink bottle, N = 20 shooting nodes over a 2.0 s horizon, one warm-started
SQP iteration per solve — the reference's real-time configuration
(upright_cmd/config/controller.yaml:13,33,55-56; ≤10 ms/solve budget).

The benchmark uses the 2-candidate line search (BENCH_LS=2): on this
warm-started nominal workload alpha = 1 always wins, so the result tracks
the full 8-candidate ladder to float-reassociation noise (~1e-14) —
asserted over a replanned MPC sequence by
tests/test_solve_quality.py::test_line_search_2_matches_8_replanned_ur10
(4 vs 8 is exactly bit-identical: test_line_search_4_equals_8_ur10).
Scenarios with sudden constraint activation (thrown obstacles) use the
full ladder in production configs.

Optional: BENCH_PROFILE=<dir> captures a jax.profiler trace of the timed
region (SURVEY build item 10).

Prints ONE JSON line:
  {"metric": "mpc_solves_per_s", "value": N, "unit": "solves/s", "vs_baseline": N/10000}
vs_baseline is relative to the driver target of 10k solves/s (BASELINE.md).
"""

import json
import time

import numpy as np


def main():
    import os

    import jax
    import jax.numpy as jnp

    # Persistent compiled-executable cache: reruns of the same bench (or a
    # bench after an unrelated edit) skip the multi-minute TPU compiles.
    cache_dir = os.environ.get("BENCH_CACHE_DIR", ".jax_cache")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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
    lindyn = os.environ.get("BENCH_LINDYN")
    if lindyn is not None:
        # override the config's sqp.linear_dynamics (on by default there;
        # bit-identical results either way, tests/test_backward_options.py)
        config["controller"].setdefault("sqp", {})["linear_dynamics"] = (
            lindyn == "1"
        )
    jacmode = os.environ.get("BENCH_JACMODE")
    if jacmode is not None:
        # A/B knob: stacked-Jacobian differentiation mode (auto|fwd|rev)
        config["controller"].setdefault("sqp", {})["jac_mode"] = jacmode
    xblocks = os.environ.get("BENCH_XBLOCKS")
    if xblocks is not None:
        # A/B knob for the q/v/a Jacobian column blocking (default: "auto" =
        # on for CPU, off for TPU — measured 29.4k vs 24.9k solves/s on v5e)
        config["controller"].setdefault("sqp", {})["jac_col_blocks"] = (
            xblocks == "1"
        )
    prob = build_problem(config)

    ls_n = int(os.environ.get("BENCH_LS", 2))
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
    import contextlib

    profile_dir = os.environ.get("BENCH_PROFILE")
    prof_ctx = (
        jax.profiler.trace(profile_dir) if profile_dir else contextlib.nullcontext()
    )
    REPS = 10
    with prof_ctx:
        t0 = time.perf_counter()
        for _ in range(REPS):
            sol = solve(params, x0s, sol.state)
        jax.block_until_ready(sol.state.X)
        elapsed = time.perf_counter() - t0

    solves_per_s = BATCH * REPS / elapsed

    if os.environ.get("BENCH_THROUGHPUT_ONLY") == "1":
        # A/B-matrix mode (docs/performance.md): skip the latency + Pallas
        # sections, print just the throughput record
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
                        "matmul_precision": str(
                            jax.config.jax_default_matmul_precision
                        ),
                    },
                }
            )
        )
        return

    # p99 latency of a single-instance solve (real-time budget check).
    # Two numbers (VERDICT r1: separate dispatch from compute):
    #  - single_solve_p99_ms: end-to-end per-dispatch latency, including the
    #    host->device dispatch overhead (the axon relay adds ~40 ms/dispatch
    #    in this environment; on a local chip this collapses to ~the device
    #    time).
    #  - single_replan_device_ms: per-replan *device* time measured by
    #    running M sequential warm-started replans inside ONE device
    #    computation (lax.scan over solves, the steady-state MPC loop) and
    #    differencing two loop lengths to cancel the constant dispatch cost.
    from upright_tpu.solver.al import solve as al_solve

    single = jax.jit(lambda p, x, s: al_solve(prob.ocp, al_cfg, p, x, s))
    p1 = prob.stage_params(0.0)
    s1 = jax.tree.map(lambda x: x[0], sol.state)
    one = single(p1, x0s[0], s1)
    jax.block_until_ready(one.state.X)
    N_SINGLE = int(os.environ.get("BENCH_SINGLE_N", 500))
    lat = []
    for _ in range(N_SINGLE):
        t1 = time.perf_counter()
        one = single(p1, x0s[0], one.state)
        jax.block_until_ready(one.state.X)
        lat.append(time.perf_counter() - t1)
    p99_ms = float(np.percentile(np.asarray(lat), 99) * 1e3)

    # streaming variant: what a real robot pays per replan — a fresh host
    # observation transferred host->device each solve (mrt_node.cpp 125 Hz
    # loop semantics), then the policy result read back
    x_base = np.asarray(one.state.X[0])
    stream_lat = []
    rng_s = np.random.default_rng(1)
    for _ in range(N_SINGLE):
        x_host = x_base + 1e-3 * rng_s.standard_normal(prob.ocp.nx)
        t1 = time.perf_counter()
        xd = jnp.asarray(x_host)  # host -> device
        one = single(p1, xd, one.state)
        u0 = np.asarray(one.state.U[0])  # device -> host (the command)
        stream_lat.append(time.perf_counter() - t1)
    stream_p99_ms = float(np.percentile(np.asarray(stream_lat), 99) * 1e3)
    stream_med_ms = float(np.median(np.asarray(stream_lat)) * 1e3)

    def replan_loop(M):
        def f(p, x, s):
            def body(st, _):
                return al_solve(prob.ocp, al_cfg, p, x, st).state, ()

            final, _ = jax.lax.scan(body, s, None, length=M)
            return final

        return jax.jit(f)

    def timed(fn, reps=20):
        out = fn(p1, x0s[0], one.state)
        jax.block_until_ready(out.X)
        ts = []
        for _ in range(reps):
            t1 = time.perf_counter()
            out = fn(p1, x0s[0], one.state)
            jax.block_until_ready(out.X)
            ts.append(time.perf_counter() - t1)
        return np.asarray(ts)

    # modest loop length keeps the scanned-solve compile fast; the
    # difference still cancels the constant dispatch cost exactly
    M_LONG = int(os.environ.get("BENCH_REPLAN_M", 64))
    t_short = timed(replan_loop(1))
    t_long = timed(replan_loop(M_LONG))
    # medians cancel scheduling noise; the difference removes dispatch cost
    device_ms = float(
        (np.median(t_long) - np.median(t_short)) / (M_LONG - 1) * 1e3
    )
    # p99 across repetitions of the long loop, per replan (upper bound on
    # steady-state per-replan device time)
    device_p99_ms = float(np.percentile(t_long, 99) / M_LONG * 1e3)

    # HEADLINE real-time metric: the steady-state MPC loop as ONE device
    # computation (VERDICT r2 item 3) — each scan step is the full runtime
    # replan path (warm-start shift + heal + 1-iteration SQP + LQR policy
    # evaluation), observations stream from a device buffer.  Each timed
    # window dispatches once and runs M_WIN replans, so the per-replan
    # number INCLUDES its amortized share of dispatch — no differencing, no
    # caveats.  p99 is over windows.
    M_WIN = int(os.environ.get("BENCH_WIN_M", 50))
    N_WIN = int(os.environ.get("BENCH_WIN_N", 100))

    def replan_step(p, x, st):
        warm = prob.heal_warm_start(prob.shift_warm_start(st, 0.0), x)
        s = al_solve(prob.ocp, al_cfg, p, x, warm)
        u = s.state.U[0] + s.K[0] @ (x - s.state.X[0])
        return s.state, u

    def window_fn(p, xs, s0):
        def body(st, x):
            return replan_step(p, x, st)

        return jax.lax.scan(body, s0, xs)

    window = jax.jit(window_fn)
    # observation stream: measured states drifting around the plan head
    # (the steady-state tracking regime)
    obs = jnp.asarray(
        np.asarray(one.state.X[0])[None, :]
        + 1e-3 * rng.standard_normal((M_WIN, prob.ocp.nx))
    )
    st_w, us = window(p1, obs, one.state)
    jax.block_until_ready(us)
    win_ts = []
    for _ in range(N_WIN):
        t1 = time.perf_counter()
        st_w, us = window(p1, obs, st_w)
        jax.block_until_ready(us)
        win_ts.append((time.perf_counter() - t1) / M_WIN)
    steady_ms = float(np.median(win_ts) * 1e3)
    steady_p99_ms = float(np.percentile(np.asarray(win_ts), 99) * 1e3)

    # Pallas-vs-XLA Riccati backward on hardware (VERDICT r2 item 2): the
    # hand kernel is a documented experiment (docs/performance.md, "Pallas
    # kernel status"); this records its real-hardware number each round.
    # BENCH_PALLAS=0 skips (the Mosaic compile adds ~15 s when uncached).
    pallas_ms, xla_backward_ms = None, None
    if os.environ.get("BENCH_PALLAS", "1") == "1":
        try:
            import sys

            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from scripts.pallas_ab import make_inputs, measure, _Dims
            from upright_tpu.solver.al import _backward_pass

            ab_in = make_inputs(512)
            xla_bwd = jax.jit(
                jax.vmap(
                    lambda a, b, dd, gg, hh, gff, hff: _backward_pass(
                        _Dims(), al_cfg, a, b, dd, gg, hh, gff, hff
                    )
                )
            )
            xla_backward_ms = measure(
                xla_bwd, ab_in, "xla_backward", reps=10, quiet=True
            )
            from upright_tpu.solver.pallas_riccati import pallas_backward_pass

            # Mosaic supports DEFAULT/HIGHEST but not HIGH; pin the kernel
            # to full-f32 (its elementwise Cholesky dominates anyway)
            with jax.default_matmul_precision("highest"):
                pal = jax.jit(lambda *a: pallas_backward_pass(*a, block=8))
                pallas_ms = measure(
                    pal, ab_in, "pallas_backward", reps=10, quiet=True
                )
        except Exception as e:  # a compile failure is a result, not a crash
            pallas_ms = f"failed: {type(e).__name__}: {str(e)[:120]}"

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
                    # full-f32 MXU passes by default (see upright_tpu/__init__);
                    # bf16 silently breaks weakly-conditioned backward passes
                    "matmul_precision": str(
                        jax.config.jax_default_matmul_precision
                    ),
                    "single_solve_p99_ms": round(p99_ms, 3),
                    "single_solve_samples": N_SINGLE,
                    # per-replan cost with a fresh host observation in and
                    # the command out (what a real robot pays per tick)
                    "stream_replan_ms": round(stream_med_ms, 3),
                    "stream_replan_p99_ms": round(stream_p99_ms, 3),
                    "single_replan_device_ms": round(device_ms, 3),
                    "single_replan_device_p99_ms": round(device_p99_ms, 3),
                    # headline: full runtime replan path (shift+heal+solve+
                    # policy) per replan in the on-device steady-state loop,
                    # dispatch included (amortized over the window)
                    "steady_replan_ms": round(steady_ms, 3),
                    "steady_replan_p99_ms": round(steady_p99_ms, 3),
                    "steady_windows": N_WIN,
                    "steady_window_replans": M_WIN,
                    "realtime_ok": bool(steady_p99_ms < 25.0),
                    "realtime_budget_ms": 25.0,
                    # hand Pallas kernel vs production XLA backward, B=512
                    # dense Riccati (see docs/performance.md, scripts/pallas_ab.py)
                    "pallas_backward_ms": (
                        round(pallas_ms, 3)
                        if isinstance(pallas_ms, float)
                        else pallas_ms
                    ),
                    "xla_backward_ms": (
                        round(xla_backward_ms, 3)
                        if isinstance(xla_backward_ms, float)
                        else xla_backward_ms
                    ),
                    "horizon_nodes": prob.ocp.N,
                    "nx": prob.ocp.nx,
                    "nu": prob.ocp.nu,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
