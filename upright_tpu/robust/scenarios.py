"""Scenario generation for robust (inertially-uncertain) planning.

The reference's robust mode rewrites the config so one physical box becomes
8 controller objects — one per CoM-box vertex — all sharing the arrangement,
forcing a single OCP to balance every scenario simultaneously
(upright_robust/scripts/planning_sim_loop.py:513-534).

TPU-native generalization: inertial parameters are *runtime parameters* of
the OCP (the 10-vector per object), so scenarios are just a batch axis —
vmap the solve over thousands of sampled parameter sets, or stack vertex
scenarios into one balance model exactly like the reference.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def box_vertices(half_extents, center=None):
    """8 vertices of an axis-aligned box."""
    h = np.asarray(half_extents, dtype=float)
    c = np.zeros(3) if center is None else np.asarray(center, dtype=float)
    signs = np.array(
        [[sx, sy, sz] for sx in (1, -1) for sy in (1, -1) for sz in (1, -1)],
        dtype=float,
    )
    return c + signs * h


def com_vertex_params(base_params, com_half_extents):
    """Vertex-scenario parameter sets: for each object, place the CoM at each
    vertex of its uncertainty box.

    base_params: (n_obj, 10); com_half_extents: (n_obj, 3).
    Returns (8, n_obj, 10): scenario s moves every object's CoM to its s-th
    box vertex (the reference's 8-object trick as a batch axis).
    """
    base = np.asarray(base_params)
    n_obj = base.shape[0]
    out = np.tile(base[None], (8, 1, 1))
    for j in range(n_obj):
        m = base[j, 0]
        com = base[j, 1:4] / m
        verts = box_vertices(com_half_extents[j], com)
        out[:, j, 1:4] = m * verts
    return jnp.asarray(out)


def sample_inertial_params(base_params, rng, n_samples, com_half_extents=None,
                           mass_range=(1.0, 1.0), inertia_scale_range=(1.0, 1.0)):
    """Monte-carlo scenario parameters: CoM uniform in its box, mass and
    inertia scaled uniformly (generalizes the reference's 15 CoM x 3 inertia
    sweep, planning_sim_loop.py:548-655, to arbitrary sample counts).

    Returns (n_samples, n_obj, 10).
    """
    base = np.asarray(base_params)
    n_obj = base.shape[0]
    out = np.tile(base[None], (n_samples, 1, 1))
    for j in range(n_obj):
        m0 = base[j, 0]
        com0 = base[j, 1:4] / m0
        I0 = base[j, 4:10]

        m = m0 * rng.uniform(*mass_range, size=n_samples)
        if com_half_extents is not None:
            com = com0 + rng.uniform(-1, 1, size=(n_samples, 3)) * np.asarray(
                com_half_extents[j]
            )
        else:
            com = np.tile(com0, (n_samples, 1))
        s_I = rng.uniform(*inertia_scale_range, size=n_samples)

        out[:, j, 0] = m
        out[:, j, 1:4] = m[:, None] * com
        out[:, j, 4:10] = s_I[:, None] * I0
    return jnp.asarray(out)


def stack_vertex_scenarios_in_model(model, com_half_extents):
    """The reference's in-OCP robust mode: replicate every object 8x (one per
    CoM-box vertex) inside ONE balance model sharing the contact geometry.

    The equality constraints then force one trajectory to balance all
    scenarios simultaneously (planning_sim_loop.py:513-534).
    """
    params = np.asarray(model.params)
    n_obj, n_c = params.shape[0], model.num_contacts
    scen = np.asarray(com_vertex_params(params, com_half_extents))  # (8, n_obj, 10)
    new_params = scen.reshape(8 * n_obj, 10)

    S1 = np.asarray(model.S1)
    S2 = np.asarray(model.S2)
    # each scenario copy uses the same contacts
    new_S1 = np.tile(S1, (8, 1))
    new_S2 = np.tile(S2, (8, 1))

    return model.replace(
        params=jnp.asarray(new_params),
        S1=jnp.asarray(new_S1),
        S2=jnp.asarray(new_S2),
    )


def robust_solve_fn(ocp, al_cfg):
    """Vmapped scenario solve: same OCP, batch of inertial parameter sets.

    Returns f(params_template, scen_obj_params (S, n_obj, 10), x0, states).
    """
    from upright_tpu.solver.al import solve

    def one(params, obj_p, x0, state):
        N = ocp.N
        stage = dict(params["stage"])
        stage["obj_params"] = jnp.broadcast_to(obj_p, (N,) + obj_p.shape)
        final = dict(params["final"])
        final["obj_params"] = obj_p
        return solve(ocp, al_cfg, {"stage": stage, "final": final}, x0, state)

    return jax.jit(jax.vmap(one, in_axes=(None, 0, None, 0)))
