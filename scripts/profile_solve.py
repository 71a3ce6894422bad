#!/usr/bin/env python
"""Per-phase solve-time breakdown (SURVEY build item 10).

Times the solver's three phases separately — stage linearization (AL
gradients/GN Hessians), Riccati backward pass, and line-search rollouts —
each as its own jitted computation over the same batch, then the fused
full solve.  The deltas show where the time goes and what fusion buys.

Usage: python scripts/profile_solve.py [--batch 512]  (runs on the default
device: real TPU when available, else CPU).  Add --profile <dir> to capture
a jax.profiler trace of the full solve.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def timed(fn, *args, reps=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / reps, out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--profile", default=None, help="jax.profiler trace dir")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    import upright_tpu.config as cfg
    from upright_tpu.ocp.problem import build_problem
    from upright_tpu.parallel.batch import (
        batch_solve_fn,
        batch_warm_starts,
        broadcast_params,
    )
    from upright_tpu.solver import al
    from upright_tpu.solver.al import ALConfig

    config = cfg.load_config(
        cfg.resolve_package_path({"package": "configs", "path": "demos/thing_demo.yaml"})
    )
    prob = build_problem(config)
    ocp = prob.ocp
    al_cfg = ALConfig(iterations=1, line_search_steps=(1.0, 0.5, 0.25, 0.1))

    B = args.batch
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.asarray(prob.x0)[None, :] + 0.01 * rng.standard_normal((B, ocp.nx))
    )
    params = broadcast_params(prob.stage_params(0.0), B)
    states = batch_warm_starts(ocp, x0s)
    solve = batch_solve_fn(ocp, al_cfg)
    sol = solve(params, x0s, states)
    jax.block_until_ready(sol.state.X)
    states = sol.state

    # phase 1: stage linearization (AL derivatives for all stages)
    def linearize(p, states):
        def one(p_i, X, U, lam, mu):
            return jax.vmap(
                lambda x, u, pk, l, m: al._stage_derivatives(ocp, al_cfg, x, u, pk, l, m)
            )(X[:-1], U, p_i, lam, mu)

        return jax.vmap(one)(p["stage"], states.X, states.U, states.lam, states.mu)

    lin = jax.jit(linearize)
    t_lin, (grads, hess) = timed(lin, params, states)

    # phase 2: Riccati backward pass (linear dynamics at the warm start)
    def backward(p, states, grads, hess):
        def one(p_i, X, U, g, H):
            A = jax.vmap(
                lambda x, u, pk: jax.jacfwd(lambda x_: ocp.dynamics(x_, u, pk))(x)
            )(X[:-1], U, p_i)
            Bm = jax.vmap(
                lambda x, u, pk: jax.jacfwd(lambda u_: ocp.dynamics(x, u_, pk))(u)
            )(X[:-1], U, p_i)
            f = jax.vmap(lambda x, u, pk: ocp.dynamics(x, u, pk))(X[:-1], U, p_i)
            d = f - X[1:]
            gf = jnp.zeros(ocp.nx)
            Hf = jnp.eye(ocp.nx)
            return al._backward_pass(ocp, al_cfg, A, Bm, d, g, H, gf, Hf)

        return jax.vmap(one)(p["stage"], states.X, states.U, grads, hess)

    bwd = jax.jit(backward)
    t_bwd, (K, kff) = timed(bwd, params, states, grads, hess)

    # phase 3: line-search rollouts + merit (4 candidates)
    def rollouts_full(p, states, K, kff):
        def one(p_i, p_f, X, U, K_i, k_i, x0, lam, mu, lam_f):
            def try_alpha(alpha):
                Xa, Ua = al._rollout(ocp, X, U, K_i, k_i, alpha, x0, p_i)
                return al._merit(ocp, al_cfg, Xa, Ua, p_i, p_f, lam, mu, lam_f)

            return jax.vmap(try_alpha)(jnp.asarray(al_cfg.line_search_steps))

        return jax.vmap(one)(
            params["stage"], params["final"], states.X, states.U, K, kff,
            x0s, states.lam, states.mu, states.lam_f,
        )

    ro = jax.jit(rollouts_full)
    t_ro, _ = timed(ro, params, states, K, kff)

    # full fused solve
    import contextlib

    ctx = jax.profiler.trace(args.profile) if args.profile else contextlib.nullcontext()
    with ctx:
        t_full, _ = timed(solve, params, x0s, states)

    print(f"batch {B} on {jax.devices()[0].platform}")
    print(f"  stage linearization : {t_lin*1e3:8.2f} ms")
    print(f"  Riccati backward    : {t_bwd*1e3:8.2f} ms")
    print(f"  line-search rollouts: {t_ro*1e3:8.2f} ms")
    print(f"  full fused solve    : {t_full*1e3:8.2f} ms "
          f"({B/t_full:.0f} solves/s)")


if __name__ == "__main__":
    main()
