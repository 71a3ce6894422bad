#!/usr/bin/env python
"""Find the maximum feasible (velocity, acceleration) at a configuration
subject to the balance constraints.

Equivalent of the reference's upright_cmd/scripts/misc/
balance_at_given_configuration.py:17-99 (scipy SLSQP over (v, a) through the
BalancingConstraintWrapper), using our differentiable constraint functions
directly with jax gradients feeding scipy.

Usage: python scripts/balance_at_configuration.py --config configs/demos/ur10_demo.yaml
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
from scipy.optimize import minimize

import upright_tpu.config as cfg
from upright_tpu.ocp.problem import build_problem


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--direction", nargs=3, type=float, default=[1.0, 0, 0],
                        help="EE acceleration direction to maximize")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    config = cfg.load_config(args.config)
    prob = build_problem(config)
    nq = prob.robot.nq
    q0 = np.asarray(prob.x0[:nq])
    direction = np.asarray(args.direction) / np.linalg.norm(args.direction)

    # decision variables: (v, a, forces); maximize direction . a_ee subject to
    # the balance equalities and friction cones at this configuration
    nf = prob.dims.f

    def unpack(z):
        return z[:nq], z[nq : 2 * nq], z[2 * nq : 2 * nq + nf]

    @jax.jit
    def objective(z):
        v, a, _f = unpack(jnp.asarray(z))
        x = jnp.concatenate([jnp.asarray(q0), v, a])
        ee = prob.robot.ee_state(x)
        return -jnp.dot(jnp.asarray(direction), ee.a_ew_w)

    params = prob.stage_params(0.0)
    p0 = {k: v[0] for k, v in jax.tree.map(lambda x: x, params["stage"]).items()}

    @jax.jit
    def eq_con(z):
        v, a, f = unpack(jnp.asarray(z))
        x = jnp.concatenate([jnp.asarray(q0), v, a])
        u = jnp.concatenate([jnp.zeros(nq), f])
        return prob.ocp.eq(x, u, p0)

    @jax.jit
    def ineq_con(z):
        v, a, f = unpack(jnp.asarray(z))
        x = jnp.concatenate([jnp.asarray(q0), v, a])
        u = jnp.concatenate([jnp.zeros(nq), f])
        return prob.ocp.ineq(x, u, p0)

    g_obj = jax.jit(jax.grad(objective))
    J_eq = jax.jit(jax.jacfwd(eq_con))
    J_in = jax.jit(jax.jacfwd(ineq_con))

    z0 = np.zeros(2 * nq + nf)
    z0[2 * nq :] = 1.0  # small positive normal forces

    res = minimize(
        lambda z: float(objective(z)),
        z0,
        jac=lambda z: np.asarray(g_obj(z), dtype=np.float64),
        constraints=[
            {"type": "eq", "fun": lambda z: np.asarray(eq_con(z), dtype=np.float64),
             "jac": lambda z: np.asarray(J_eq(z), dtype=np.float64)},
            {"type": "ineq", "fun": lambda z: np.asarray(ineq_con(z), dtype=np.float64),
             "jac": lambda z: np.asarray(J_in(z), dtype=np.float64)},
        ],
        method="SLSQP",
        options={"maxiter": 200},
    )
    v, a, f = unpack(res.x)
    import jax.numpy as jnp

    x = np.concatenate([q0, v, a])
    ee = prob.robot.ee_state(jnp.asarray(x))
    print(f"success: {res.success} ({res.message})")
    print(f"max EE acceleration along {direction}: {-res.fun:.3f} m/s^2")
    print(f"joint velocity: {np.round(v, 3)}")
    print(f"joint acceleration: {np.round(a, 3)}")
    print(f"contact forces: {np.round(f, 3)}")
    print(f"EE linear acceleration: {np.round(np.asarray(ee.a_ew_w), 3)}")


if __name__ == "__main__":
    main()
