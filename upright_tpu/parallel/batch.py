"""Batched + sharded MPC solving over device meshes.

This is the capability the reference cannot have (single CPU process,
§2.8 of SURVEY.md): thousands of MPC instances solved in parallel.  The
solver is a pure function, so batching is `vmap` and scaling is
`jax.sharding` over a Mesh — XLA inserts the collectives.

Axes:
  dp  — independent problem instances (different x0 / targets / obstacle
        layouts).  Embarrassingly parallel: no cross-device traffic in the
        solve itself.
  sp  — robust scenarios of the *same* problem (sampled inertial parameters
        sharing one OCP, reference planning_sim_loop.py:513-534 generalized).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from upright_tpu.solver.al import ALConfig, solve
from upright_tpu.solver.ocp import OCP, SolverState, zeros_warm_start


def make_mesh(axis_sizes: dict, devices=None) -> Mesh:
    """Create a Mesh with named axes, e.g. {"dp": 4, "sp": 2}."""
    devices = devices if devices is not None else jax.devices()
    n = int(np.prod(list(axis_sizes.values())))
    if n > len(devices):
        raise ValueError(f"Mesh of size {n} exceeds {len(devices)} devices")
    dev_array = np.asarray(devices[:n]).reshape(tuple(axis_sizes.values()))
    return Mesh(dev_array, tuple(axis_sizes.keys()))


def batch_solve_fn(ocp: OCP, cfg: ALConfig, donate_state: bool = False):
    """Jitted batched solver: (params_batched, x0s, states) -> Solution batch.

    All leaves of params must carry the leading batch axis; use
    `broadcast_params` to lift shared parameters.  With donate_state=True the
    warm-start buffers are donated (the steady-state MPC loop overwrites them
    anyway), saving HBM traffic.
    """
    vsolve = jax.vmap(lambda p, x, s: solve(ocp, cfg, p, x, s))
    if donate_state:
        return jax.jit(vsolve, donate_argnums=(2,))
    return jax.jit(vsolve)


def sharded_solve_fn(ocp: OCP, cfg: ALConfig, mesh: Mesh, axis: str = "dp"):
    """Batched solver with the batch axis sharded over ``mesh[axis]``.

    Each device solves its shard of the problem batch; XLA keeps the whole
    computation device-local (no collectives needed for independent
    instances — ICI only carries the result gather if the caller requests
    replicated output).
    """
    vsolve = jax.vmap(lambda p, x, s: solve(ocp, cfg, p, x, s))
    batch_sharding = NamedSharding(mesh, P(axis))
    # a single sharding per argument applies to every leaf of that pytree
    return jax.jit(
        vsolve,
        in_shardings=(batch_sharding, batch_sharding, batch_sharding),
        out_shardings=batch_sharding,
    )


def broadcast_params(params, batch: int):
    """Tile a single-problem parameter pytree along a new batch axis."""
    return jax.tree.map(
        lambda x: jnp.broadcast_to(jnp.asarray(x), (batch,) + jnp.shape(x)), params
    )


def batch_warm_starts(ocp: OCP, x0s):
    """Stacked cold-start SolverStates for a batch of initial states."""
    return jax.vmap(lambda x: zeros_warm_start(ocp, x))(x0s)
