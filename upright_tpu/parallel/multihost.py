"""Multi-host scaling utilities.

Scaling recipe: the MPC workload's parallel axes are dp (independent problem
instances) and sp (robust scenarios).  Both are embarrassingly parallel in
the solve itself, so the multi-host layout keeps every solve device-local:
dp shards across hosts over DCN (no solve-time collectives), sp within a
slice over ICI.  Cross-device traffic appears only when results are gathered
(e.g. sweep statistics), which XLA lowers to all-gathers over the mesh.

This module only wires the runtime up; the sharded solvers live in
parallel/batch.py and work unchanged on a global mesh.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Initialize jax.distributed from arguments or the standard environment
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or the
    TPU pod metadata when running on Cloud TPU)."""
    kwargs = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = coordinator_address or os.environ["JAX_COORDINATOR_ADDRESS"]
    if num_processes or os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(num_processes or os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(process_id if process_id is not None else os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def global_mesh(dp=None, sp=1):
    """Global mesh over every device in the job: dp x sp.

    dp defaults to (total devices / sp).  Device order follows
    jax.devices(), which groups by process — dp-major layout keeps each
    host's shard on its own devices (solves never cross DCN)."""
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // sp
    if dp * sp != n:
        raise ValueError(f"dp*sp = {dp*sp} != {n} devices")
    return Mesh(devices.reshape(dp, sp), ("dp", "sp"))


def host_local_batch(global_batch: int):
    """This process's share of a dp-sharded global batch."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} hosts")
    return global_batch // n


def distributed_solve_check(demo="demos/ur10_demo.yaml", global_batch=None,
                            seed=0):
    """Run a dp-sharded batched MPC solve on the global (multi-process) mesh
    and verify this process's addressable shards against per-instance
    single-device reference solves.

    Every process must call this collectively (SPMD).  The input batch is
    generated deterministically from ``seed`` so all processes agree on the
    global problem set without communicating.  Returns
    (n_local_shards, max_abs_err) — the caller asserts on the error.
    """
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import upright_tpu.config as cfg_mod
    from upright_tpu.ocp.problem import build_problem
    from upright_tpu.parallel.batch import broadcast_params
    from upright_tpu.solver.al import ALConfig, solve
    from upright_tpu.solver.ocp import zeros_warm_start

    path = cfg_mod.resolve_package_path({"package": "configs", "path": demo})
    prob = build_problem(cfg_mod.load_config(path))
    al_cfg = ALConfig(iterations=1)

    mesh = global_mesh(sp=1)
    n_dev = len(jax.devices())
    if global_batch is None:
        global_batch = n_dev
    sharding = NamedSharding(mesh, P("dp"))

    rng = np.random.default_rng(seed)
    x0s_np = np.asarray(prob.x0)[None, :] + 0.01 * rng.standard_normal(
        (global_batch, prob.ocp.nx)
    )

    def shard_of(arr_np):
        return jax.make_array_from_callback(
            arr_np.shape, sharding, lambda idx: jnp.asarray(arr_np[idx])
        )

    x0s = shard_of(x0s_np)
    params_np = jax.tree.map(
        lambda v: np.broadcast_to(np.asarray(v), (global_batch,) + np.shape(v)),
        prob.stage_params(0.0),
    )
    params = jax.tree.map(
        lambda v: jax.make_array_from_callback(
            v.shape,
            NamedSharding(mesh, P("dp", *([None] * (v.ndim - 1)))),
            lambda idx, v=v: jnp.asarray(v[idx]),
        ),
        params_np,
    )
    states_np = jax.vmap(lambda x: zeros_warm_start(prob.ocp, x))(
        jnp.asarray(x0s_np)
    )
    states = jax.tree.map(
        lambda v: jax.make_array_from_callback(
            v.shape,
            NamedSharding(mesh, P("dp", *([None] * (v.ndim - 1)))),
            lambda idx, v=v: v[idx],
        ),
        states_np,
    )

    vsolve = jax.jit(jax.vmap(lambda p, x, s: solve(prob.ocp, al_cfg, p, x, s)))
    sol = vsolve(params, x0s, states)
    jax.block_until_ready(sol.state.X)

    # reference: each addressable instance solved single-device, unbatched
    single = jax.jit(lambda p, x, s: solve(prob.ocp, al_cfg, p, x, s))
    p_one = prob.stage_params(0.0)
    max_err = 0.0
    shards = sol.state.X.addressable_shards
    for shard in shards:
        lo = shard.index[0].start or 0
        for j in range(shard.data.shape[0]):
            i = lo + j
            ref = single(
                p_one,
                jnp.asarray(x0s_np[i]),
                jax.tree.map(lambda v, i=i: v[i], states_np),
            )
            err = float(jnp.max(jnp.abs(shard.data[j] - ref.state.X)))
            max_err = max(max_err, err)
    return len(shards), max_err


def _worker_main(argv):
    """CLI worker for the two-process distributed test:
    python -m upright_tpu.parallel.multihost <pid> <nproc> <port>"""
    pid, nproc, port = int(argv[0]), int(argv[1]), argv[2]
    jax.config.update("jax_enable_x64", True)
    initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc,
        process_id=pid,
    )
    n_shards, err = distributed_solve_check()
    assert err < 1e-10, err
    print(
        f"proc {pid}/{jax.process_count()}: OK "
        f"({n_shards} local shards, {len(jax.devices())} global devices, "
        f"max_err {err:.2e})",
        flush=True,
    )


if __name__ == "__main__":
    import sys

    _worker_main(sys.argv[1:])
