"""A/B the O(log N) associative-scan Riccati backward vs the sequential
scan at LONG horizons on real hardware (SURVEY §5.7; VERDICT r3 weak #8).

The pscan backend's claimed niche is the single long-horizon offline plan
(the reference's robust protocol solves ONE OCP over the whole 10 s motion,
planning_sim_loop.py:132-134): batch 1, N in the hundreds, where the
sequential scan leaves the chip idle and the O(log N) composition ladder
can win.  This measures the backward pass at the online point (B=512,
N=20) AND the offline points (B=1, N in {64,128,256,512,1024}) and records
the crossover — the regenerable source of the docs/performance.md "pscan
long-horizon" table.

Usage: python scripts/pscan_ab.py [--horizons 64,128,256,512,1024]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np
import jax
import jax.numpy as jnp

from upright_tpu.solver import al as al_mod
from upright_tpu.solver.pscan import parallel_backward_pass

from pallas_ab import _Dims, make_inputs, measure  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--horizons", default="64,128,256,512,1024")
    ap.add_argument("--reps", type=int, default=15)
    args = ap.parse_args()

    cfg = al_mod.ALConfig(iterations=1)
    rows = []

    def run_point(batch, N):
        inputs = make_inputs(batch, N=N)
        scan_f = jax.jit(
            jax.vmap(
                lambda a, b, dd, gg, hh, gff, hff: al_mod._backward_pass(
                    _Dims(), cfg, a, b, dd, gg, hh, gff, hff
                )
            )
        )
        pscan_f = jax.jit(
            jax.vmap(
                lambda a, b, dd, gg, hh, gff, hff: parallel_backward_pass(
                    a, b, dd, gg, hh, gff, hff, reg=cfg.reg
                )
            )
        )
        t_scan = measure(
            scan_f, inputs, f"scan  B={batch} N={N}", reps=args.reps
        )
        t_pscan = measure(
            pscan_f, inputs, f"pscan B={batch} N={N}", reps=args.reps
        )
        rows.append(
            {
                "batch": batch,
                "N": N,
                "scan_ms": round(t_scan, 3),
                "pscan_ms": round(t_pscan, 3),
                "pscan_speedup": round(t_scan / t_pscan, 2),
            }
        )

    # online operating point (context row)
    run_point(512, 20)
    # offline long-horizon points (batch 1: one robust plan)
    for N in (int(n) for n in args.horizons.split(",")):
        run_point(1, N)

    print(json.dumps({"device": str(jax.devices()[0]), "rows": rows}, indent=2))


if __name__ == "__main__":
    main()
