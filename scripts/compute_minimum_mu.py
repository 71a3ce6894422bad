#!/usr/bin/env python
"""Minimum feasible friction coefficients for an arrangement.

Equivalent of reference upright_cmd/scripts/tools/compute_minimum_mu.py:
jointly optimize the (static) EE orientation, one friction coefficient per
object pair, and the contact forces, minimizing the weighted friction norm
subject to static balance:

    min  0.5 * || mu / sqrt(mu0) ||^2
    s.t. object_dynamics_constraints(forces, EE@rpy, g) = 0   (Newton-Euler)
         linearized friction cones(mu, forces)        >= 0
         0 <= mu <= mu0

The result answers "how slippery could the surfaces be before this stack
cannot even be held statically?".  Unlike the reference (which relies on the
pybind11 constraint bindings + finite differences), the constraint Jacobians
here come from jax.jacfwd over the same balance model the OCP uses.

Usage: python scripts/compute_minimum_mu.py --config configs/demos/ur10_demo.yaml
"""

import argparse
import dataclasses
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from scipy.optimize import minimize

import upright_tpu.config as cfg
from upright_tpu.core import balance as bal
from upright_tpu.core import math as core_math
from upright_tpu.core.balance import EEState
from upright_tpu.config.arrangement import parse_control_objects


def contact_pair_index(contacts):
    """Contact index -> pair index; contacts between the same two objects
    share one friction coefficient."""
    pairs = {}
    idx = np.zeros(len(contacts), dtype=int)
    for i, c in enumerate(contacts):
        key = (c.first, c.second)
        if key not in pairs:
            pairs[key] = len(pairs)
        idx[i] = pairs[key]
    return idx, list(pairs)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument(
        "--mu0", type=float, default=1.0,
        help="upper bound (and weighting) for every pair's mu",
    )
    args = parser.parse_args()

    config = cfg.load_config(args.config)
    model, names, objects, contacts = parse_control_objects(config["controller"])
    n_c = len(contacts)
    if n_c == 0:
        print("arrangement has no contacts")
        return

    pair_idx, pairs = contact_pair_index(contacts)
    n_pair = int(pair_idx.max()) + 1
    mu0 = np.full(n_pair, args.mu0)
    gravity = jnp.asarray(config["controller"].get("gravity", [0, 0, -9.81]), dtype=float)
    pair_idx_j = jnp.asarray(pair_idx)

    def ee_state(rpy):
        C = core_math.rpy_to_rot(rpy)
        return dataclasses.replace(EEState.zero(), C_we=C)

    def split(z):
        return z[:3], z[3 : 3 + n_pair], z[3 + n_pair :].reshape(n_c, 3)

    def eq_fn(z):
        rpy, _, forces = split(z)
        return bal.object_dynamics_constraints(model, forces, ee_state(rpy), gravity)

    def ineq_fn(z):
        _, mus, forces = split(z)
        m = dataclasses.replace(model, mu=mus[pair_idx_j])
        return bal.contact_force_constraints_linearized(m, forces)

    def cost_fn(z):
        _, mus, _ = split(z)
        y = mus / jnp.sqrt(jnp.asarray(mu0))
        return 0.5 * y @ y

    eq_jac = jax.jit(jax.jacfwd(eq_fn))
    ineq_jac = jax.jit(jax.jacfwd(ineq_fn))
    cost_grad = jax.jit(jax.grad(cost_fn))
    eq_j = jax.jit(eq_fn)
    ineq_j = jax.jit(ineq_fn)
    cost_j = jax.jit(cost_fn)

    z0 = np.concatenate([np.zeros(3), mu0, np.zeros(3 * n_c)])
    bounds = (
        [(None, None)] * 3
        + [(0.0, float(m)) for m in mu0]
        + [(None, None)] * (3 * n_c)
    )
    res = minimize(
        lambda z: float(cost_j(z)),
        z0,
        jac=lambda z: np.asarray(cost_grad(z), dtype=np.float64),
        method="slsqp",
        bounds=bounds,
        constraints=[
            {"type": "eq", "fun": lambda z: np.asarray(eq_j(z), dtype=np.float64),
             "jac": lambda z: np.asarray(eq_jac(z), dtype=np.float64)},
            {"type": "ineq", "fun": lambda z: np.asarray(ineq_j(z), dtype=np.float64),
             "jac": lambda z: np.asarray(ineq_jac(z), dtype=np.float64)},
        ],
    )

    if not res.success:
        print(f"optimization did not converge: {res.message}")
    rpy, mus, forces = split(res.x)
    print(f"EE rpy = {np.round(rpy, 4)}")
    for (first, second), mu in zip(pairs, mus):
        print(f"mu[{first} - {second}] = {mu:.4f}")
    eq_res = np.asarray(eq_j(res.x))
    print(f"max |balance residual| = {np.abs(eq_res).max():.2e}")


if __name__ == "__main__":
    main()
