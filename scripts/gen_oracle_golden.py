"""Generate the committed golden artifact for the independent-oracle gate.

Solves the independent torch/SLSQP transcription (tests/independent_oracle.py
— zero upright_tpu imports) and stores its best feasible point in
tests/data/oracle_slsqp_ur10.npz.  The artifact is NOT used as the truth for
X/U values (SLSQP stalls before full optimality on this problem); it is a
*feasible comparison point from an independent optimizer*:
tests/test_independent_oracle.py re-verifies its feasibility with the
independent evaluators and asserts our solver's solution achieves a lower
independent-objective value (dominance), alongside the KKT certificate.

Runtime: ~40 min on CPU (torch jacrev of the FK chain dominates).
Usage: python scripts/gen_oracle_golden.py [--maxiter 500]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np
from scipy.optimize import minimize

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
import independent_oracle as oracle  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--maxiter", type=int, default=500)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(__file__), "..", "tests", "data",
            "oracle_slsqp_ur10.npz",
        ),
    )
    args = ap.parse_args()

    obj_f, obj_j = oracle.np_fun(oracle.objective_t)
    eq_f, eq_j = oracle.np_fun(oracle.eq_vec_t, drop_stage0_constants=True)
    iq_f, iq_j = oracle.np_fun(oracle.ineq_vec_t)

    lo, hi = oracle.z_bounds()
    bounds = list(zip(lo, hi))

    # Perturb the rest point: at exactly-rest the linearized Euler-z rows
    # are a linear combination of the final-stationarity rows (no torque
    # about the frictionless contact normal can act on the die), making the
    # constraint Jacobian rank-deficient at z0 only.
    rng = np.random.default_rng(42)
    rest_forces = oracle.DIE_MASS * 9.81 / oracle.NC * np.ones(oracle.NC)
    z0 = np.tile(np.concatenate([np.zeros(6), rest_forces]), oracle.N)
    z0 += 0.1 * rng.standard_normal(z0.shape) * np.tile(
        np.concatenate([np.ones(6), np.zeros(oracle.NC)]), oracle.N
    )

    t0 = time.time()
    res = minimize(
        obj_f, z0, jac=obj_j, bounds=bounds, method="SLSQP",
        constraints=[
            {"type": "eq", "fun": eq_f, "jac": eq_j},
            {"type": "ineq", "fun": iq_f, "jac": iq_j},
        ],
        options={"maxiter": args.maxiter, "ftol": 1e-12},
    )
    maxeq = float(np.abs(eq_f(res.x)).max())
    min_iq = float(iq_f(res.x).min())
    print(
        f"SLSQP: status={res.status} nit={res.nit} f={res.fun:.8e} "
        f"maxeq={maxeq:.2e} min_ineq={min_iq:.2e} ({time.time()-t0:.0f}s)",
        flush=True,
    )
    assert maxeq < 1e-8, "golden point must be feasible"

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez(
        args.out,
        U=res.x.reshape(oracle.N, oracle.NU),
        f=res.fun,
        maxeq=maxeq,
        nit=res.nit,
        status=res.status,
        maxiter=args.maxiter,
    )
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
