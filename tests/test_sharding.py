"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Validates the dp/sp sharding layout compiles + executes and matches the
unsharded batch solve bit-for-bit (independent instances: no cross-device
math)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import upright_tpu.config as cfg
from upright_tpu.ocp.problem import build_problem
from upright_tpu.parallel.batch import (
    batch_solve_fn,
    batch_warm_starts,
    broadcast_params,
    make_mesh,
    sharded_solve_fn,
)
from upright_tpu.solver.al import ALConfig


@pytest.fixture(scope="module")
def problem():
    path = cfg.resolve_package_path({"package": "configs", "path": "demos/ur10_demo.yaml"})
    config = cfg.load_config(path)
    return build_problem(config, N=4)  # tiny horizon for CPU


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_make_mesh():
    mesh = make_mesh({"dp": 4, "sp": 2})
    assert mesh.axis_names == ("dp", "sp")
    assert mesh.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh({"dp": 16})


def test_sharded_matches_unsharded(problem):
    al_cfg = ALConfig(iterations=1)
    B = 8
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.asarray(problem.x0)[None] + 0.01 * rng.standard_normal((B, problem.ocp.nx))
    )
    params = broadcast_params(problem.stage_params(0.0), B)
    states = batch_warm_starts(problem.ocp, x0s)

    plain = batch_solve_fn(problem.ocp, al_cfg)
    sol_plain = plain(params, x0s, states)

    mesh = make_mesh({"dp": 8})
    sharded = sharded_solve_fn(problem.ocp, al_cfg, mesh, axis="dp")
    sol_sharded = sharded(params, x0s, states)

    assert np.allclose(
        np.asarray(sol_plain.state.U), np.asarray(sol_sharded.state.U), atol=1e-12
    )
    # output actually sharded over the mesh
    assert len(sol_sharded.state.U.sharding.device_set) == 8


def test_scenario_axis_sharding(problem):
    """Robust scenarios sharded over 'sp' while problems shard over 'dp'."""
    from upright_tpu.robust.scenarios import robust_solve_fn, sample_inertial_params
    from upright_tpu.solver.ocp import zeros_warm_start

    al_cfg = ALConfig(iterations=1)
    mesh = make_mesh({"sp": 8})
    S = 8
    rng = np.random.default_rng(1)
    scen = sample_inertial_params(
        problem.balance_model.params, rng, S,
        com_half_extents=[[0.01, 0.01, 0.02]], mass_range=(0.9, 1.1),
    )
    scen = jax.device_put(scen, NamedSharding(mesh, P("sp")))

    solve = robust_solve_fn(problem.ocp, al_cfg)
    params = problem.stage_params(0.0)
    states = jax.vmap(lambda _: zeros_warm_start(problem.ocp, problem.x0))(jnp.arange(S))
    sols = solve(params, scen, problem.x0, states)
    assert sols.state.X.shape == (S, problem.ocp.N + 1, problem.ocp.nx)
    assert np.isfinite(np.asarray(sols.state.X)).all()
    # different scenarios give different forces
    forces = np.asarray(sols.state.U[:, 0, problem.dims.robot_u :])
    assert np.std(forces.sum(axis=1)) > 1e-6
