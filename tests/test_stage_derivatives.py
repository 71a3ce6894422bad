"""Oracle test for the solver's fused stage linearization.

`al._stage_derivatives` has accumulated several structural optimizations
(x/u column split, analytic box-limit rows, q/v/a column blocking).  This
pins it against two oracles on the real upright OCP:

  - the GRADIENT must equal `jax.grad` of the plain AL stage cost exactly
    (same math, different assembly);
  - the GN HESSIAN must equal the one assembled from a single unsplit
    jacfwd with no box/blocking shortcuts.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import upright_tpu.config as cfg
from upright_tpu.ocp.problem import build_problem
from upright_tpu.solver import al
from upright_tpu.solver.al import ALConfig


def _problem(demo):
    config = cfg.load_config(f"configs/demos/{demo}.yaml")
    return build_problem(config)


def _check(prob, seed=0):
    ocp = ocp_fast = prob.ocp
    ocp_plain = dataclasses.replace(
        ocp, ineq_smooth=None, ineq_box=None, x_jac_blocks=None
    )
    al_cfg = ALConfig(rho_eq=10.0, rho_ineq=10.0)

    rng = np.random.default_rng(seed)
    x = jnp.asarray(np.asarray(prob.x0) + 0.05 * rng.standard_normal(ocp.nx))
    u = jnp.asarray(0.1 * rng.standard_normal(ocp.nu))
    p = jax.tree.map(lambda v: v[3], prob.stage_params(0.0)["stage"])
    lam = jnp.asarray(rng.standard_normal(ocp.n_eq))
    mu = jnp.asarray(np.abs(rng.standard_normal(ocp.n_ineq)))

    grad_fast, H_fast = jax.jit(
        lambda: al._stage_derivatives(ocp_fast, al_cfg, x, u, p, lam, mu)
    )()
    grad_plain, H_plain = jax.jit(
        lambda: al._stage_derivatives(ocp_plain, al_cfg, x, u, p, lam, mu)
    )()

    # reverse-mode stacked Jacobian (the TPU default: rows << columns)
    ocp_rev = dataclasses.replace(ocp, x_jac_blocks=None, jac_mode="rev")
    grad_rev, H_rev = jax.jit(
        lambda: al._stage_derivatives(ocp_rev, al_cfg, x, u, p, lam, mu)
    )()

    # gradient oracle: plain autodiff of the AL stage cost
    z = jnp.concatenate([x, u])
    grad_ad = jax.jit(
        jax.grad(
            lambda z_: al._al_stage_cost(
                ocp, al_cfg, z_[: ocp.nx], z_[ocp.nx :], p, lam, mu
            )
        )
    )(z)

    np.testing.assert_allclose(grad_fast, grad_ad, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(grad_plain, grad_ad, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(H_fast, H_plain, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(grad_rev, grad_ad, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(H_rev, H_plain, rtol=1e-5, atol=1e-7)


def test_stage_derivatives_ur10():
    _check(_problem("ur10_demo"))


def test_stage_derivatives_thing():
    _check(_problem("thing_demo"))


def test_stage_derivatives_thing_obstacles():
    # obstacle states in x exercise the trailing x_jac_block + projectile/
    # collision rows in ineq_smooth
    _check(_problem("thing_obstacle_demo"))


def test_stage_derivatives_frictional():
    # frictional cones are the smooth-pre block ahead of the box rows
    config = cfg.load_config("configs/demos/thing_demo.yaml")
    config["controller"]["balancing"]["frictionless"] = False
    prob = build_problem(config)
    assert prob.ocp.ineq_box.n_pre > 0
    _check(prob)
