"""A/B the Pallas Riccati backward against the XLA scan on real hardware.

Measures median wall time of the batched backward pass (B problem
instances x N stages of 27x27/13x13 Riccati algebra) for the production
XLA formulation (``al._backward_pass`` under vmap) and the Pallas kernel
(``pallas_riccati.pallas_backward_pass``) at several batch-block sizes.

This is the regenerable source of the hardware numbers recorded in
docs/performance.md ("Pallas kernel status") and of the
``pallas_backward_ms`` extra in bench.py.  Reference context: the
reference stack has no analogue (its Riccati lives inside HPIPM); this is
the SURVEY §5.7 "hand kernel vs XLA" decision artifact.

Usage: python scripts/pallas_ab.py [--batch 512] [--blocks 8,32]
"""

from __future__ import annotations

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from upright_tpu.solver import al as al_mod
from upright_tpu.solver.pallas_riccati import pallas_backward_pass


class _Dims:
    nx, nu = 27, 13


def make_inputs(batch, N=20, nx=27, nu=13, seed=0):
    rng = np.random.default_rng(seed)
    nz = nx + nu
    A = jnp.asarray(
        rng.standard_normal((batch, N, nx, nx)) * 0.1 + np.eye(nx), jnp.float32
    )
    B = jnp.asarray(rng.standard_normal((batch, N, nx, nu)) * 0.1, jnp.float32)
    d = jnp.asarray(rng.standard_normal((batch, N, nx)) * 0.01, jnp.float32)
    g = jnp.asarray(rng.standard_normal((batch, N, nz)), jnp.float32)
    Hh = rng.standard_normal((batch, N, nz, nz)) * 0.1
    H = jnp.asarray(Hh @ np.swapaxes(Hh, -1, -2) + 3 * np.eye(nz), jnp.float32)
    gf = jnp.asarray(rng.standard_normal((batch, nx)), jnp.float32)
    Hf_ = rng.standard_normal((batch, nx, nx)) * 0.1
    Hf = jnp.asarray(Hf_ @ np.swapaxes(Hf_, -1, -2) + np.eye(nx), jnp.float32)
    return A, B, d, g, H, gf, Hf


def measure(f, args, label, reps=15, quiet=False):
    t0 = time.perf_counter()
    _, kff = f(*args)
    checksum = float(jnp.sum(kff))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t1 = time.perf_counter()
        _, kff = f(*args)
        jax.block_until_ready(kff)
        ts.append(time.perf_counter() - t1)
    med_ms = float(np.median(ts) * 1e3)
    if not quiet:
        print(
            f"{label}: median {med_ms:.2f} ms (compile {compile_s:.1f}s) "
            f"checksum {checksum:.3f}",
            flush=True,
        )
    return med_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--blocks", default="8,32,64,128")
    args = ap.parse_args()

    inputs = make_inputs(args.batch)
    cfg = al_mod.ALConfig(iterations=1)
    xla = jax.jit(
        jax.vmap(
            lambda a, b, dd, gg, hh, gff, hff: al_mod._backward_pass(
                _Dims(), cfg, a, b, dd, gg, hh, gff, hff
            )
        )
    )
    measure(xla, inputs, "xla_scan")
    for block in (int(b) for b in args.blocks.split(",")):
        f = jax.jit(lambda *a, blk=block: pallas_backward_pass(*a, block=blk))
        try:
            measure(f, inputs, f"pallas_block{block}")
        except Exception as e:  # Mosaic compile failures are a result, not a bug
            print(f"pallas_block{block}: FAILED {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
