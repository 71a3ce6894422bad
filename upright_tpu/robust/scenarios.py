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
    CoM-box vertex) inside ONE balance model, each scenario with its OWN
    copy of the contact points.

    The reference builds the robust arrangement as 8 separate objects each
    with their own contact set (planning_sim_loop.py:513-534 +
    make_arrangement_config) — the shared decision variables are the
    MOTION, not the contact forces.  Sharing one force set across all 8
    scenarios (an earlier revision here) over-constrains the problem: 6*8
    equality rows against one set of forces is infeasible for any
    accelerating trajectory, which is exactly what the protocol's waypoint
    plans need.  Force decisions grow 8x (dims.f picks this up when the
    problem is rebuilt from the stacked model).
    """
    params = np.asarray(model.params)
    n_obj, n_c = params.shape[0], model.num_contacts
    scen = np.asarray(com_vertex_params(params, com_half_extents))  # (8, n_obj, 10)
    new_params = scen.reshape(8 * n_obj, 10)

    S1 = np.asarray(model.S1)
    S2 = np.asarray(model.S2)
    # block-diagonal incidence: scenario i's objects see scenario i's
    # contact copies only
    new_S1 = np.kron(np.eye(8), S1)
    new_S2 = np.kron(np.eye(8), S2)

    return model.replace(
        params=jnp.asarray(new_params),
        mu=jnp.tile(np.asarray(model.mu), 8),
        normal=jnp.tile(np.asarray(model.normal), (8, 1)),
        span=jnp.tile(np.asarray(model.span), (8, 1, 1)),
        r1=jnp.tile(np.asarray(model.r1), (8, 1)),
        r2=jnp.tile(np.asarray(model.r2), (8, 1)),
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
