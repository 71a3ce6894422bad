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
