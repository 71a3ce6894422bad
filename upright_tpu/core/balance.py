"""Balance-model physics: friction cones + per-object Newton-Euler residuals.

TPU-native re-design of the reference balance core
(upright_core/include/upright_core/contact_constraints.h).  Instead of
std::maps of named bodies and a Python loop over contacts, the whole model is
a pytree of stacked arrays and every constraint is a pure vmappable function.
Wrench aggregation over contacts becomes two small matmuls (incidence-matrix
form), which XLA fuses straight into the surrounding linearization.

Conventions (matching the reference):
  - all quantities expressed in the end-effector (EE) frame unless suffixed _w
  - contact normals point INTO the first object of the pair
  - the EE itself ("fixture" objects) carries no dynamics constraints
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from upright_tpu.core.rigid_body import body_to_params, params_to_body

# Constraint counts per entity (contact_constraints.h:14-20).
NUM_FRICTION_CONSTRAINTS_PER_CONTACT = 2
NUM_LINEARIZED_FRICTION_CONSTRAINTS_PER_CONTACT = 5
NUM_DYNAMICS_CONSTRAINTS_PER_OBJECT = 6


@flax.struct.dataclass
class EEState:
    """State of the end-effector frame in the world.

    Mirrors RigidBodyState (types.h:76-92): pose, classical velocity and
    classical acceleration of the EE frame.
    """

    C_we: jnp.ndarray  # (3,3) world<-EE rotation
    r_ew_w: jnp.ndarray  # (3,) position
    v_ew_w: jnp.ndarray  # (3,) linear velocity
    w_ew_w: jnp.ndarray  # (3,) angular velocity (world frame)
    a_ew_w: jnp.ndarray  # (3,) linear (classical) acceleration
    alpha_ew_w: jnp.ndarray  # (3,) angular acceleration

    @staticmethod
    def zero():
        return EEState(
            C_we=jnp.eye(3),
            r_ew_w=jnp.zeros(3),
            v_ew_w=jnp.zeros(3),
            w_ew_w=jnp.zeros(3),
            a_ew_w=jnp.zeros(3),
            alpha_ew_w=jnp.zeros(3),
        )


@flax.struct.dataclass
class BalanceModel:
    """Stacked-array balance model: n_obj dynamic objects, n_c contact points.

    Replaces the reference's ``{name: RigidBody}`` map + ``[ContactPoint]``
    list (contact.h, rigid_body.h).  ``S1``/``S2`` are +1 incidence matrices
    selecting, for each object, the contacts whose force acts on it from the
    first/second side of the pair; a contact whose first object is the EE (or
    another fixture) simply has a zero row.
    """

    # objects -------------------------------------------------------------
    params: jnp.ndarray  # (n_obj, 10) [m, m*c, vech(I)] per object

    # contacts ------------------------------------------------------------
    mu: jnp.ndarray  # (n_c,)
    normal: jnp.ndarray  # (n_c, 3) into first object
    span: jnp.ndarray  # (n_c, 2, 3) tangent basis, span @ normal = 0
    r1: jnp.ndarray  # (n_c, 3) contact point in EE frame (object-1 side)
    r2: jnp.ndarray  # (n_c, 3) contact point in EE frame (object-2 side)

    # incidence ------------------------------------------------------------
    S1: jnp.ndarray  # (n_obj, n_c) 1 where contact's object1 == object j
    S2: jnp.ndarray  # (n_obj, n_c) 1 where contact's object2 == object j

    @property
    def num_objects(self):
        return self.params.shape[0]

    @property
    def num_contacts(self):
        return self.mu.shape[0]

    @staticmethod
    def empty():
        return BalanceModel(
            params=jnp.zeros((0, 10)),
            mu=jnp.zeros((0,)),
            normal=jnp.zeros((0, 3)),
            span=jnp.zeros((0, 2, 3)),
            r1=jnp.zeros((0, 3)),
            r2=jnp.zeros((0, 3)),
            S1=jnp.zeros((0, 0)),
            S2=jnp.zeros((0, 0)),
        )

    def with_params(self, masses, coms, inertias):
        """Return a copy with new inertial parameters (for robust scenarios)."""
        params = jax.vmap(body_to_params)(masses, coms, inertias)
        return self.replace(params=params)


# ---------------------------------------------------------------------------
# friction cones (contact_constraints.h:22-77)
# ---------------------------------------------------------------------------


def expand_frictionless_forces(model: BalanceModel, forces):
    """Map scalar normal-force magnitudes to 3-D forces: f_i = s_i * n_i.

    Frictionless mode, nf = 1 (contact_constraints.h:111-117).
    """
    return forces[:, None] * model.normal


def contact_force_constraints_exact(model: BalanceModel, forces):
    """Exact friction cone, 2 rows per contact: ``f_n >= 0`` and
    ``mu^2 f_n^2 - f_t^2 >= 0`` (contact_constraints.h:22-47).

    forces: (n_c, 3) in EE frame.
    """

    def per_contact(n, mu, f):
        f_n = jnp.dot(n, f)
        f_t_sq = jnp.dot(f, f) - f_n * f_n
        return jnp.stack([f_n, mu * mu * f_n * f_n - f_t_sq])

    return jax.vmap(per_contact)(model.normal, model.mu, forces).reshape(-1)


def contact_force_constraints_linearized(model: BalanceModel, forces):
    """Linearized friction cone, 5 rows per contact
    (contact_constraints.h:49-77): ``f_n >= 0`` and
    ``mu f_n +- f_t1 +- f_t2 >= 0``.

    forces: (n_c, 3) in EE frame.
    """

    def per_contact(n, S, mu, f):
        f_n = jnp.dot(n, f)
        f_t = S @ f
        return jnp.stack(
            [
                f_n,
                mu * f_n - f_t[0] - f_t[1],
                mu * f_n - f_t[0] + f_t[1],
                mu * f_n + f_t[0] - f_t[1],
                mu * f_n + f_t[0] + f_t[1],
            ]
        )

    return jax.vmap(per_contact)(model.normal, model.span, model.mu, forces).reshape(-1)


# ---------------------------------------------------------------------------
# object wrenches + Newton-Euler residuals (contact_constraints.h:79-194)
# ---------------------------------------------------------------------------


def compute_object_wrenches(model: BalanceModel, forces):
    """Net contact wrench on each object about its CoM.

    Matmul (incidence) form of contact_constraints.h:106-157: forces act
    positively on object 1 of each pair, negatively on object 2, with lever
    arm (r_contact - com).

    forces: (n_c, 3).  Returns (forces_obj (n_obj,3), torques_obj (n_obj,3)).
    """
    coms = model.params[:, 1:4] / model.params[:, 0:1]  # (n_obj, 3)

    m1 = jnp.cross(model.r1, forces)  # (n_c, 3) moments about EE origin
    m2 = jnp.cross(model.r2, forces)

    F1 = model.S1 @ forces  # (n_obj, 3)
    F2 = model.S2 @ forces
    M1 = model.S1 @ m1
    M2 = model.S2 @ m2

    F = F1 - F2
    # torque about com_j: sum_i s_ij cross(r_i - com_j, f_i)
    #                  = sum_i s_ij cross(r_i, f_i) - cross(com_j, sum_i s_ij f_i)
    M = M1 - M2 - jnp.cross(coms, F)
    return F, M


def object_dynamics_constraints(model: BalanceModel, forces, ee_state: EEState,
                                gravity, normalize=True):
    """Newton-Euler equality residual, 6 rows per object
    (contact_constraints.h:79-102, 161-194; balancing_constraints.cpp:139-151).

    forces: (n_c, 3) contact forces in the EE frame.
    Residuals are mass-normalized, and (by default) scaled by
    1/sqrt(6 n_obj) to match the reference's conditioning trick.
    """
    wrench_F, wrench_M = compute_object_wrenches(model, forces)

    C_ew = ee_state.C_we.T
    ddC_we = _ddC(ee_state)
    w_e = C_ew @ ee_state.w_ew_w
    alpha_e = C_ew @ ee_state.alpha_ew_w

    def per_object(p, wF, wM):
        m, com, I = params_to_body(p)
        gi_force = m * (C_ew @ (ee_state.a_ew_w - gravity) + C_ew @ (ddC_we @ com))
        inertial_torque = jnp.cross(w_e, I @ w_e) + I @ alpha_e
        c_force = (gi_force - wF) / m
        c_torque = (inertial_torque - wM) / m
        return jnp.concatenate([c_force, c_torque])

    residuals = jax.vmap(per_object)(model.params, wrench_F, wrench_M).reshape(-1)
    if normalize:
        n = jnp.sqrt(NUM_DYNAMICS_CONSTRAINTS_PER_OBJECT * model.num_objects * 1.0)
        residuals = residuals / n
    return residuals


def _ddC(ee_state: EEState):
    from upright_tpu.core.math import dC_dtt

    return dC_dtt(ee_state.C_we, ee_state.w_ew_w, ee_state.alpha_ew_w)
