"""JAX-native rigid-body simulation of the waiter's problem.

Replaces the reference's PyBullet environment (upright_sim/src/upright_sim/
simulation.py).  Design: the plant is itself a pure JAX function — robot
kinematics + full 6-DOF rigid-body dynamics of the balanced objects with a
compliant (penalty) contact model — stepped with `lax.scan` substeps inside
one jitted call.  This keeps the whole closed loop (controller + plant) on
device, makes the simulator differentiable, and scales to vmapped robust
sweeps (135-run parameter studies become one batched call,
cf. planning_sim_loop.py:613-655).

Contact model: each object carries support vertices (bottom corners of its
shape); each vertex interacts with the support *surface* of its parent (the
tray plane for objects on the tray, the top face of the object below for
stacks; side faces of fixture blocks).  Forces are spring-damper in the
normal direction and regularized Coulomb friction in the tangent plane —
objects slide, tip, and separate when the controller violates the balance
constraints, which is exactly what the experiments measure
(object displacement > 0.5 m counts as failure, process_sim_runs.py:23).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

import upright_tpu.config as cfg_mod
from upright_tpu.core.math import quat_integrate, quat_to_rot, rot_to_quat
from upright_tpu.kinematics.robot import RobotModel, build_robot_model


def _rot_exp_jnp(w, dt):
    """exp([w dt]x) via Rodrigues, safe as ||w|| -> 0 (the spurious axis is
    multiplied by sin(theta) ~ 0)."""
    nw = jnp.linalg.norm(w)
    th = nw * dt
    ax = w / jnp.maximum(nw, 1e-12)
    K = jnp.array([
        [0.0, -ax[2], ax[1]],
        [ax[2], 0.0, -ax[0]],
        [-ax[1], ax[0], 0.0],
    ])
    s, c = jnp.sin(th), jnp.cos(th)
    return jnp.eye(3) + s * K + (1.0 - c) * (K @ K)


@flax.struct.dataclass
class ObjectsState:
    """Stacked free rigid-body states of the balanced objects.

    ``anchors``/``anchor_valid`` exist only under ``friction_model:
    stiction``: per object, the tangent-frame anchor coordinates of each
    (surface, vertex) contact spring — tuples of (n_surf_i, k_i, 2) /
    (n_surf_i, k_i) arrays (tuple because surface counts differ per
    object).  None under the regularized model."""

    r: jnp.ndarray  # (n_obj, 3) CoM positions, world
    q: jnp.ndarray  # (n_obj, 4) orientations (xyzw), world
    v: jnp.ndarray  # (n_obj, 3) CoM linear velocities
    w: jnp.ndarray  # (n_obj, 3) angular velocities, world
    anchors: object = None
    anchor_valid: object = None
    # (n_obj,) bool latch: set when an object's integrator state went
    # NON-FINITE (as opposed to the displacement-threshold freeze, which is
    # a legitimate "object left the tray" outcome).  object_displacements
    # reports inf for latched objects so protocol statistics (ral25
    # n_diverged, ral23 "diverged" rows) still count integrator blow-ups as
    # failures instead of frozen-in-place successes.
    diverged: object = None


@flax.struct.dataclass
class SimState:
    t: jnp.ndarray  # scalar time
    q: jnp.ndarray  # robot joint positions
    v: jnp.ndarray  # robot joint velocities
    objects: ObjectsState


@dataclasses.dataclass
class ContactSurface:
    """A rectangular contact face in a parent body's local frame.

    ``parent == -1`` means the face is rigidly attached to the EE (the tray
    top, and every face of fixture objects, which the reference attaches
    rigidly to the tray, simulation.py:484-486,635-653); otherwise it is a
    face of the dynamic object with that index.  ``max_depth`` caps the
    penetration at which the face still attracts contact (a vertex deeper
    than the owning box's centroid belongs to the far side)."""

    parent: int  # object index, or -1 for the EE frame (tray / fixtures)
    point: np.ndarray  # a point on the surface (local frame)
    normal: np.ndarray  # unit normal (local frame, pointing away from parent)
    half_extents: np.ndarray  # (2,) rectangular extent in the tangent plane
    tangents: np.ndarray  # (2, 3) tangent basis (local frame)
    max_depth: float = np.inf


@dataclasses.dataclass
class SimObjectSpec:
    name: str
    mass: float
    inertia_local: np.ndarray  # (3,3) about CoM, local frame
    vertices_local: np.ndarray  # (k, 3) contact vertices rel. CoM, local frame
    mu: float  # friction vs parent
    surfaces: list  # ContactSurface list this object can touch
    com_world_ee: np.ndarray  # initial CoM position in the EE frame
    q_init: np.ndarray  # initial orientation in the EE frame
    fixture: bool = False


class UprightSimulation:
    """The JAX plant.  Public API mirrors the reference UprightSimulation
    (simulation.py:546-684): construct from config, `step`, object poses."""

    def __init__(self, sim_config: dict, robot_conf: Optional[dict] = None,
                 timestep: Optional[float] = None):
        self.config = sim_config
        self.timestep = float(timestep or sim_config.get("timestep", 1e-3))
        self.gravity = np.asarray(
            cfg_mod.parse_array(sim_config.get("gravity", [0, 0, -9.81]))
        )

        robot_conf = robot_conf or sim_config["robot"]
        self.robot: RobotModel = build_robot_model(robot_conf)
        home = cfg_mod.parse_array(robot_conf.get("home", [0.0] * self.robot.nq))
        self.q_home = jnp.asarray(home)

        # base velocity-command convention (reference robot.py:12-86): the
        # controller plans world-frame base velocities; with
        # command_frame: body, commands are interpreted in the base frame and
        # mapped world-ward each substep (nonholonomic bases also drop the
        # lateral component)
        from upright_tpu.sim.base import base_mapping

        self.base_type = robot_conf.get("base_type", "fixed").lower()
        self.command_frame = robot_conf.get("command_frame", "world").lower()
        self._base_forward = (
            base_mapping(self.base_type)[0] if self.command_frame == "body" else None
        )

        # actuator velocity limits (clamped in step(); None = unlimited)
        vlim = robot_conf.get("velocity_limits")
        self.v_limit = (
            jnp.abs(jnp.asarray(cfg_mod.parse_array(vlim))) if vlim is not None
            else None
        )

        # measurement / process noise (reference sim/robot.py:123-167)
        noise = robot_conf.get("noise", {})
        meas = noise.get("measurement", {})
        proc = noise.get("process", {})
        self.q_meas_std = float(meas.get("q_std_dev", 0.0))
        self.v_meas_std = float(meas.get("v_std_dev", 0.0))
        self.v_proc_std = float(proc.get("v_std_dev", 0.0))

        # build balanced objects from the arrangement
        self.specs = _build_sim_objects(sim_config)
        self.n_obj = len(self.specs)

        # contact parameters
        self.k_contact = float(sim_config.get("contact_stiffness", 3.0e4))
        self.c_contact = float(sim_config.get("contact_damping", 200.0))
        # friction regularization velocity: near-static creep scales with it
        # (marginal arrangements like a box on a 15deg wedge at mu=0.3 creep
        # at ~v_slip * F_t/(mu f_n - F_t)); the stability caps below keep the
        # stiffer friction well-behaved
        self.v_slip = float(sim_config.get("friction_regularization", 2e-4))
        # friction_model: "regularized" (viscous Coulomb, default) or
        # "stiction" (anchor/bristle springs: true static friction — the
        # regularized model can only transmit force near the cone boundary
        # through sustained slip, so a controller that plans AT the cone
        # boundary drifts; PyBullet's LCP contacts, the reference plant,
        # have real stiction)
        self.friction_model = str(
            sim_config.get("friction_model", "regularized")
        ).lower()
        if self.friction_model not in ("regularized", "stiction"):
            raise ValueError(f"unknown friction_model {self.friction_model!r}")
        self.max_contact_force = float(sim_config.get("max_contact_force", 500.0))
        # divergence containment: once an object's EE-frame displacement
        # exceeds this (meters), its state freezes (held pose, zero
        # velocity) — a dropped object otherwise free-falls for the rest of
        # the run and study tables report non-physical 100+ m rows.  The
        # failure semantics are unchanged (displacement stays beyond the
        # 0.5 m failure threshold, process_sim_runs.py:23); 0 disables.
        self.divergence_freeze = float(sim_config.get("divergence_freeze", 1.0))
        # internal substeps for the object dynamics: explicit integration of
        # the penalty contacts needs dt_obj * omega well below 1 for the
        # stiffest (lightest-object) coupled mode; auto-derive from the
        # lightest object unless overridden
        if "object_substeps" in sim_config:
            self.object_substeps = int(sim_config["object_substeps"])
        elif self.specs:
            # the stiffest coupled mode includes the ROTATIONAL response of a
            # contact at lever arm L (effective mass 1/(1/m + L^2/I_min))
            # AND the number of SIMULTANEOUS contacts: a face resting on
            # n_eff vertices multiplies the total spring/damping rate by
            # n_eff, so the substep budget carries a sqrt(n_eff) factor.
            # Without it the resting stacked-dice damping mode sat at
            # dt*rate ~ 1.0 (marginally unstable) and pumped energy until
            # the top die spun off after ~4.5 s of quiescence.
            m_eff_min = min(_effective_mass(sp) for sp in self.specs)
            n_eff = max(
                max(1, len(np.asarray(sp.vertices_local)) // 2)
                for sp in self.specs
            )
            omega = np.sqrt(self.k_contact / m_eff_min * n_eff)
            self.object_substeps = int(np.clip(np.ceil(self.timestep * omega * 4.0 / 0.3), 1, 128))
        else:
            self.object_substeps = 1

        # The plant is the experiments' ground truth: pin its (tiny 3x3 /
        # chain-FK) matmuls to f32 regardless of the ambient setting.  At
        # the ambient TPU default ("high", 3-pass bf16) the per-step FK
        # rounding noise acts as a micrometre-scale tray jitter that the
        # stiction anchor drag rectifies into secular creep — the 0.02 kg
        # stacked dice walked off the tray over a 4 s closed-loop run on
        # the v5e while holding on (f64) CPU and at "highest".  The plant's
        # matmuls are a negligible share of device time (the solver
        # dominates), so this costs nothing measurable.
        def _step_pinned(state, cmd, n_steps, params):
            with jax.default_matmul_precision("highest"):
                return self._step_impl(state, cmd, n_steps, params)

        self._step = jax.jit(_step_pinned, static_argnums=(2,))

    # -- runtime inertial parameters (the robust-sweep axis) -------------

    def default_params(self):
        """Inertial/friction parameters as a runtime pytree, so parameter
        sweeps (planning_sim_loop.py:613-655) vmap over ONE compiled plant."""
        if self.n_obj == 0:
            return {
                "mass": jnp.zeros((0,)),
                "inertia": jnp.zeros((0, 3, 3)),
                "mu": jnp.zeros((0,)),
                "com_offset": jnp.zeros((0, 3)),
            }
        return {
            "mass": jnp.asarray([sp.mass for sp in self.specs]),
            "inertia": jnp.asarray(np.stack([sp.inertia_local for sp in self.specs])),
            "mu": jnp.asarray([sp.mu for sp in self.specs]),
            # extra CoM shift relative to the nominal CoM (moves the contact
            # vertices the other way), in the object's local frame
            "com_offset": jnp.zeros((self.n_obj, 3)),
        }

    # -- initialization --------------------------------------------------

    def initial_state(self) -> SimState:
        q = self.q_home
        R_we, r_ew = self.robot.ee_pose(q)
        q_we = rot_to_quat(R_we)

        rs, qs = [], []
        for spec in self.specs:
            r_w = r_ew + R_we @ jnp.asarray(spec.com_world_ee)
            from upright_tpu.core.math import quat_multiply

            q_w = quat_multiply(q_we, jnp.asarray(spec.q_init))
            rs.append(r_w)
            qs.append(q_w)
        anchors = anchor_valid = None
        if self.friction_model == "stiction" and self.n_obj:
            anchors = tuple(
                jnp.zeros((len(sp.surfaces), len(sp.vertices_local), 2))
                for sp in self.specs
            )
            anchor_valid = tuple(
                jnp.zeros((len(sp.surfaces), len(sp.vertices_local)), bool)
                for sp in self.specs
            )
        if self.n_obj:
            objects = ObjectsState(
                r=jnp.stack(rs), q=jnp.stack(qs),
                v=jnp.zeros((self.n_obj, 3)), w=jnp.zeros((self.n_obj, 3)),
                anchors=anchors, anchor_valid=anchor_valid,
                diverged=jnp.zeros(self.n_obj, bool),
            )
        else:
            objects = ObjectsState(
                r=jnp.zeros((0, 3)), q=jnp.zeros((0, 4)),
                v=jnp.zeros((0, 3)), w=jnp.zeros((0, 3)),
            )
        return SimState(t=jnp.zeros(()), q=q, v=jnp.zeros_like(q), objects=objects)

    # -- measurement -----------------------------------------------------

    def measure(self, state: SimState, rng_key=None):
        """Noisy joint measurements (reference robot.py:123-126)."""
        q, v = state.q, state.v
        if rng_key is not None and (self.q_meas_std > 0 or self.v_meas_std > 0):
            kq, kv = jax.random.split(rng_key)
            q = q + self.q_meas_std * jax.random.normal(kq, q.shape)
            v = v + self.v_meas_std * jax.random.normal(kv, v.shape)
        return q, v

    # -- dynamics --------------------------------------------------------

    def step(self, state: SimState, cmd_vel, n_steps: int = 1, params=None,
             rng_key=None) -> SimState:
        """Advance the plant by n_steps * timestep under a (held) joint
        velocity command.  ``params`` overrides the inertial parameters
        (see default_params).  ``rng_key`` enables process noise on the
        command for this control cycle (reference robot.py:143-151)."""
        if params is None:
            params = self.default_params()
        cmd = jnp.asarray(cmd_vel)
        if self.v_limit is not None:
            # actuator velocity limits: the reference's PyBullet motors have
            # finite force and URDF velocity bounds, so runaway commands
            # saturate physically rather than teleporting the plant
            cmd = jnp.clip(cmd, -self.v_limit, self.v_limit)
        if rng_key is not None and self.v_proc_std > 0:
            cmd = cmd + self.v_proc_std * jax.random.normal(rng_key, cmd.shape)
        return self._step(state, cmd, int(n_steps), params)

    def _step_impl(self, state: SimState, cmd_vel, n_steps, params):
        dt = self.timestep

        def substep(s: SimState, _):
            # robot: velocity-commanded (Bullet velocity motors,
            # reference robot.py:89-122), with the optional body->world
            # base-command mapping applied at the current yaw
            cmd = cmd_vel
            if self._base_forward is not None:
                cmd = self._base_forward(s.q, cmd_vel)
            q_new = s.q + dt * cmd
            v_new = cmd

            if self.n_obj:
                # inner substeps as a lax.scan so the compiled graph holds
                # ONE substep body regardless of the substep count (a Python
                # loop here made multi-object compiles explode)
                dt_obj = dt / self.object_substeps

                # the tray frame must ADVANCE through the inner substeps:
                # holding it frozen at time t while the objects integrate
                # n_sub steps makes the tray pose a per-control-step
                # STAIRCASE — at 1 m/s EE speed the surface teleports ~1 mm
                # under the payload every outer step, which (a) ratchets the
                # stiction anchors (the drag clamp discards the jump as
                # slip: the dice stack slid 1.5% of every commanded
                # acceleration and fell off after ~3 s), and (b) injects the
                # mm-scale "tray jitter" that made the regularized model
                # creep small stacked objects to their support edge.
                # First-order-in-substep propagation of the frame (exact for
                # the constant-twist robot substep) removes the sawtooth.
                ee0 = self._parent_motion(s)

                def obj_sub(objs, tau):
                    dto = tau * dt_obj
                    dR = _rot_exp_jnp(ee0.w, dto)
                    ee_tau = dataclasses.replace(
                        ee0,
                        R=dR @ ee0.R,
                        p=ee0.p + dto * ee0.v + 0.5 * dto * dto * ee0.a,
                        v=ee0.v + dto * ee0.a,
                        w=ee0.w + dto * ee0.al,
                    )
                    s_obj = s.replace(objects=objs)
                    return (
                        self._object_substep(s_obj, dt_obj, params, ee=ee_tau),
                        None,
                    )

                obj_new, _ = jax.lax.scan(
                    obj_sub, s.objects,
                    jnp.arange(self.object_substeps, dtype=jnp.float32),
                )
            else:
                obj_new = s.objects
            return SimState(t=s.t + dt, q=q_new, v=v_new, objects=obj_new), None

        out, _ = jax.lax.scan(substep, state, None, length=n_steps)
        return out

    def _parent_motion(self, s: SimState):
        """World pose/velocity of every potential parent frame: the EE and
        each object."""
        f = self.robot.chain.ee_motion(s.q, s.v, jnp.zeros_like(s.q))
        return f

    def _object_substep(self, s: SimState, dt, params, ee=None):
        if ee is None:
            ee = self._parent_motion(s)

        r, q, v, w = s.objects.r, s.objects.q, s.objects.v, s.objects.w

        forces = []
        torques = []
        new_anchors = []
        new_valid = []
        # reaction accumulators for object-on-object contacts (Newton's third
        # law: the supporting object feels the opposite contact force)
        reaction_f = [jnp.zeros(3) for _ in range(self.n_obj)]
        reaction_tau = [jnp.zeros(3) for _ in range(self.n_obj)]
        for i, spec in enumerate(self.specs):
            R_i = quat_to_rot(q[i])
            f_tot = params["mass"][i] * jnp.asarray(self.gravity)
            tau_tot = jnp.zeros(3)

            # stability-limited per-object contact gains: explicit integration
            # requires dt*sqrt(k/m_eff) and dt*c/m_eff bounded, where m_eff
            # is the ROTATIONAL effective mass of a contact at the worst-case
            # lever arm (1/m + L^2/I_min)^-1 — a vertex force at lever L
            # drives the angular mode much harder than the linear one, and
            # capping by m alone lets the friction damping destabilize the
            # rotation (a resting box on a wedge would tumble numerically).
            # Simultaneous contacts (a box face rests on ~4 vertices) are
            # handled by the substep count, NOT by weakening these caps:
            # dividing the friction-gain cap by the contact count lets
            # objects creep below the friction angle (the regularized model
            # NEEDS gain ~ mu f_n / v_slip to hold statically).
            m_i = params["mass"][i]
            L2 = float(np.max(np.sum(np.asarray(spec.vertices_local) ** 2, axis=1)))
            I_min = jnp.min(jnp.diagonal(params["inertia"][i]))
            m_eff = 1.0 / (1.0 / m_i + L2 / jnp.maximum(I_min, 1e-12))
            omega_max = 0.3 / dt
            k_i = jnp.minimum(self.k_contact, m_eff * omega_max**2)
            c_i = jnp.minimum(
                jnp.minimum(self.c_contact, 2.0 * jnp.sqrt(k_i * m_i)),
                0.3 * m_eff / dt,
            )

            anch_i = []
            valid_i = []
            for si, surf in enumerate(spec.surfaces):
                if surf.parent == -1:
                    R_p, r_p = ee.R, ee.p
                    v_p, w_p = ee.v, ee.w
                else:
                    j = surf.parent
                    R_p = quat_to_rot(q[j])
                    r_p, v_p, w_p = r[j], v[j], w[j]

                # surface data in world frame
                n_w = R_p @ jnp.asarray(surf.normal)
                p_surf_w = r_p + R_p @ jnp.asarray(surf.point)
                T_w = (R_p @ jnp.asarray(surf.tangents).T).T  # (2,3)

                # all contact vertices of this object at once (k, 3); the
                # runtime CoM shift moves the geometry rel. to the CoM
                V = jnp.asarray(np.asarray(spec.vertices_local))
                p_w = r[i] + (V - params["com_offset"][i]) @ R_i.T
                rel = p_w - p_surf_w
                delta = -rel @ n_w  # (k,) penetration depths
                t_coords = rel @ T_w.T  # (k, 2)
                inside = jnp.all(
                    jnp.abs(t_coords) <= jnp.asarray(surf.half_extents) + 1e-3,
                    axis=1,
                )
                # contact within the face extent and not past the owning
                # box's midplane.  (A smooth edge fade was tried to remove
                # the force discontinuity at the face boundary; fading
                # inward cut the nominal corner support of stacked dice,
                # fading outward created a phantom ledge that arrested
                # objects mid-fall — the binary edge stays, and the
                # regularized model's creep-to-the-edge failure mode for
                # long quasi-static stacked holds is documented in
                # configs/simulation.yaml + the ral23 sweep tables.)
                in_contact = (delta > 0.0) & (delta <= surf.max_depth) & inside

                # relative velocity of each vertex w.r.t. the surface point
                lever = p_w - r[i]
                v_vert = v[i] + jnp.cross(w[i][None, :], lever)
                v_parent = v_p + jnp.cross(w_p[None, :], p_w - r_p)
                v_rel = v_vert - v_parent
                v_n = v_rel @ n_w
                v_t = v_rel - v_n[:, None] * n_w

                # semi-implicit (prefiltered) damping: a raw viscous force
                # -c v applied explicitly can reverse the relative velocity
                # within one substep when dt*c*(1/m + L^2/I) ~ 1 — with
                # several vertices in contact the coupled rotational mode
                # then sits AT the stability boundary and pumps energy (the
                # resting dice stack spontaneously spun apart after ~4.5 s).
                # Dividing each vertex's damping gain by
                # (1 + dt * c * n_eff * w_v), with w_v the vertex's inverse
                # effective mass and n_eff the simultaneous-contact count,
                # is the per-vertex implicit solution: the damping impulse
                # can at most cancel the relative velocity (contraction),
                # while at physically-relevant gains the correction factor
                # is ~1 so statics (friction-angle hold) are unchanged.
                n_eff = max(1, V.shape[0] // 2)
                w_v = 1.0 / m_i + (lever**2).sum(axis=1) / jnp.maximum(
                    I_min, 1e-12
                )  # (k,)
                def prefilter(gain_v):
                    return gain_v / (1.0 + dt * gain_v * n_eff * w_v)

                c_v = prefilter(c_i * jnp.ones_like(w_v))
                f_n_mag = jnp.maximum(0.0, k_i * delta - c_v * v_n)
                # clamp for numerical robustness under violent commands
                # (deep penetration -> bounded force, not exploding)
                f_n_mag = jnp.minimum(f_n_mag, self.max_contact_force)
                f_n_mag = jnp.where(in_contact, f_n_mag, 0.0)

                if self.friction_model == "stiction":
                    # anchor/bristle static friction: a tangential spring
                    # from the anchor point (surface tangent coords frozen
                    # at stick onset) + damping, with the TOTAL clamped to
                    # the cone mu*f_n; on clamp the anchor is dragged so the
                    # spring alone sits on the cone (stick/slip semantics —
                    # sustained force near the boundary without drift,
                    # matching PyBullet's LCP contacts).  Spring/damping
                    # gains share the explicit-integration stability caps.
                    anchor = s.objects.anchors[i][si]  # (k, 2)
                    valid = s.objects.anchor_valid[i][si]  # (k,)
                    anchor_eff = jnp.where(
                        (valid & in_contact)[:, None], anchor, t_coords
                    )
                    d_t = t_coords - anchor_eff  # (k, 2) surface frame
                    F_spring = -(d_t @ T_w) * k_i  # (k, 3) world
                    F_t = F_spring - c_v[:, None] * v_t
                    F_mag = jnp.linalg.norm(F_t, axis=1)
                    F_max = params["mu"][i] * f_n_mag
                    scale = jnp.minimum(1.0, F_max / jnp.maximum(F_mag, 1e-12))
                    F_t = F_t * scale[:, None]
                    f_c = f_n_mag[:, None] * n_w + jnp.where(
                        in_contact[:, None], F_t, 0.0
                    )
                    # anchor drag: keep the spring displacement inside the
                    # cone so released contacts do not fling.  The clamp
                    # radius uses the SPRING-ONLY normal force mu*k*delta —
                    # NOT the instantaneous F_max, whose damping term
                    # (-c v_n) oscillates with the penalty normal dynamics:
                    # every dip used to shrink the radius and drag the
                    # anchor, ratcheting the payload ~1.5% of the tray
                    # acceleration (the stacked dice slid 6 cm over a 2 s
                    # transient and fell; with the smooth radius they track
                    # to < 1 mm).  Root cause of the r4 sweep's
                    # robust_dice/full_dice stiction failures.
                    # The radius also carries an ABSOLUTE floor: the applied
                    # force is cone-clamped by `scale` regardless of stored
                    # stretch, so a loose radius is safe — and a tight one
                    # is not representable in f32 once the world coordinates
                    # grow (at |r| ~ 4 m the ~5e-7 m position quantization
                    # rivals mu*delta ~ 1e-6 and noise-ratchets the anchor;
                    # the 0.1 mm floor absorbs it with 200x margin).
                    d_norm = jnp.linalg.norm(d_t, axis=1)
                    d_max = jnp.maximum(
                        params["mu"][i] * jnp.maximum(delta, 0.0), 1e-4
                    )
                    d_new = d_t * jnp.minimum(
                        1.0, d_max / jnp.maximum(d_norm, 1e-12)
                    )[:, None]
                    anch_i.append(
                        jnp.where(
                            in_contact[:, None], t_coords - d_new, t_coords
                        )
                    )
                    valid_i.append(in_contact)
                else:
                    # regularized Coulomb friction with a stability cap: the
                    # regularization acts as a viscous damper with gain
                    # mu f_n / (|v_t| + eps); for light objects that exceeds
                    # the explicit-integration limit, so clamp the gain
                    v_t_norm = jnp.linalg.norm(v_t, axis=1) + self.v_slip
                    gain = prefilter(params["mu"][i] * f_n_mag / v_t_norm)

                    f_c = f_n_mag[:, None] * n_w - gain[:, None] * v_t  # (k, 3)
                f_tot = f_tot + f_c.sum(axis=0)
                tau_tot = tau_tot + jnp.cross(p_w - r[i], f_c).sum(axis=0)
                if surf.parent >= 0:
                    j = surf.parent
                    reaction_f[j] = reaction_f[j] - f_c.sum(axis=0)
                    reaction_tau[j] = reaction_tau[j] + jnp.cross(
                        p_w - r[j], -f_c
                    ).sum(axis=0)

            forces.append(f_tot)
            torques.append(tau_tot)
            if self.friction_model == "stiction":
                new_anchors.append(jnp.stack(anch_i))
                new_valid.append(jnp.stack(valid_i))

        for j in range(self.n_obj):
            forces[j] = forces[j] + reaction_f[j]
            torques[j] = torques[j] + reaction_tau[j]

        F = jnp.stack(forces)
        T = jnp.stack(torques)

        # semi-implicit Euler
        v_new = v + dt * F / params["mass"][:, None]

        def ang_step(qi, wi, taui, I_local):
            R = quat_to_rot(qi)
            I_w = R @ I_local @ R.T
            w_dot = jnp.linalg.solve(I_w, taui - jnp.cross(wi, I_w @ wi))
            return wi + dt * w_dot

        w_new = jnp.stack(
            [ang_step(q[i], w[i], T[i], params["inertia"][i]) for i in range(self.n_obj)]
        )
        r_new = r + dt * v_new
        q_new = jnp.stack(
            [quat_integrate(q[i], w_new[i], dt) for i in range(self.n_obj)]
        )

        # `diverged` stays None (structurally) when the caller built the
        # state without it — lax.scan carries must keep a fixed pytree
        # structure; initial_state always materializes the latch
        div = s.objects.diverged
        if self.divergence_freeze > 0:
            # dropped-object freeze (see __init__): an object past the
            # containment displacement, or one whose updated state went
            # non-finite, holds its pose with zeroed velocity.  The
            # non-finite case additionally latches `diverged` so the frozen
            # (finite) pose cannot masquerade as a held run downstream.
            com_nom = jnp.asarray(
                np.stack([np.asarray(sp.com_world_ee) for sp in self.specs])
            )
            r_oe = (r - ee.p) @ ee.R  # rows = R_we.T @ (r_i - r_ew)
            disp = jnp.linalg.norm(r_oe - com_nom, axis=1)
            finite = (
                jnp.isfinite(r_new).all(axis=1)
                & jnp.isfinite(v_new).all(axis=1)
                & jnp.isfinite(w_new).all(axis=1)
                & jnp.isfinite(q_new).all(axis=1)
            )
            if div is not None:
                div = div | ~finite
            frozen = (disp > self.divergence_freeze) | ~finite
            hold = frozen[:, None]
            r_new = jnp.where(hold, r, r_new)
            q_new = jnp.where(hold, q, q_new)
            v_new = jnp.where(hold, jnp.zeros_like(v_new), v_new)
            w_new = jnp.where(hold, jnp.zeros_like(w_new), w_new)

        if self.friction_model == "stiction":
            return ObjectsState(
                r=r_new, q=q_new, v=v_new, w=w_new,
                anchors=tuple(new_anchors), anchor_valid=tuple(new_valid),
                diverged=div,
            )
        return ObjectsState(r=r_new, q=q_new, v=v_new, w=w_new, diverged=div)

    # -- observation -----------------------------------------------------

    def object_poses(self, state: SimState):
        """(r, q) per object (reference simulation.py:603-613)."""
        return np.asarray(state.objects.r), np.asarray(state.objects.q)

    def ee_pose(self, state: SimState):
        R, p = self.robot.ee_pose(state.q)
        return np.asarray(R), np.asarray(p)

    def object_displacements(self, state: SimState):
        """Object CoM displacement in the EE frame vs the nominal arrangement
        — the failure metric of the robust experiments
        (process_sim_runs.py:23)."""
        R_we, r_ew = self.robot.ee_pose(state.q)
        out = []
        for i, spec in enumerate(self.specs):
            r_oe = R_we.T @ (state.objects.r[i] - r_ew)
            out.append(np.linalg.norm(np.asarray(r_oe - jnp.asarray(spec.com_world_ee))))
        out = np.asarray(out)
        if state.objects.diverged is not None and len(out):
            # integrator blow-up (latched in _object_substep) reads as inf:
            # the frozen finite pose is containment, not a measurement
            out = np.where(np.asarray(state.objects.diverged), np.inf, out)
        return out


def _effective_mass(spec):
    """Worst-case (rotational) effective mass of a contact vertex: a force at
    lever arm L sees 1/(1/m + L^2/I_min)."""
    L2 = float(np.max(np.sum(np.asarray(spec.vertices_local) ** 2, axis=1)))
    I_min = float(np.min(np.diag(np.asarray(spec.inertia_local))))
    return 1.0 / (1.0 / spec.mass + L2 / max(I_min, 1e-12))


def _box_face_surface(box, direction, origin, parent_idx, min_depth=0.03):
    """ContactSurface for the face of ``box`` whose outward normal best
    aligns with ``direction``, expressed relative to ``origin``.

    The rectangular extent is recovered from the face's vertex polygon, and
    ``max_depth`` (penetration beyond which contact releases) is the
    centroid-to-face distance so far-side vertices are not captured."""
    direction = np.asarray(direction, dtype=float)
    n_idx = int(np.argmax(box.normals @ direction))
    n = box.normals[n_idx]
    b = float((box.vertices @ n).max())
    face_verts = box.vertices[box.vertices @ n >= b - 1e-6]
    from upright_tpu.core.polyhedron import plane_span

    span = plane_span(n)  # (2, 3)
    centroid = face_verts.mean(axis=0)
    t = (face_verts - centroid) @ span.T
    half = np.abs(t).max(axis=0)
    depth = max(b - float(n @ box.position), min_depth)
    return ContactSurface(
        parent=parent_idx, point=centroid - np.asarray(origin, dtype=float),
        normal=n, half_extents=half, tangents=span, max_depth=depth,
    )


def _object_contact_vertices(obj):
    """Contact vertices of an object relative to its CoM, in the EE frame at
    t=0 (== the object's local frame: q_init is identity, the arrangement
    rotation is baked into obj.box).  Boxes/wedges use their true polyhedron
    vertices — which fixes the wedge CoM-offset mismatch (the box is
    positioned at the reference position while obj.com carries the centroid
    shift, arrangement.py _parse_body_and_box) — and cylinders get top and
    bottom contact rings."""
    if obj.shape == "cylinder":
        tc = obj.shape_config
        rr, h = float(tc["radius"]), float(tc["height"])
        ang = np.linspace(0, 2 * np.pi, 8, endpoint=False)
        ring = np.stack([rr * np.cos(ang), rr * np.sin(ang)], axis=1)
        local = np.concatenate(
            [
                np.concatenate([ring, -h / 2 * np.ones((8, 1))], axis=1),
                np.concatenate([ring, h / 2 * np.ones((8, 1))], axis=1),
            ]
        )
        world = (obj.box.rotation @ local.T).T + obj.box.position
        return world - obj.com
    return obj.box.vertices - obj.com


def _build_sim_objects(sim_config):
    """Arrangement config -> sim object specs with contact surfaces.

    Fixture objects (reference simulation.py:484-486: attached rigidly to
    the tray) are not integrated; instead every face of each fixture becomes
    an EE-attached contact surface, so fixtures support neighbours laterally
    through their side faces."""
    arrangement_name = sim_config.get("arrangement", "nothing")
    if arrangement_name == "nothing":
        return []
    arr_conf = sim_config["arrangements"][arrangement_name]
    conf = {
        "balancing": {"arrangement": arrangement_name},
        "arrangements": sim_config["arrangements"],
        "objects": sim_config["objects"],
    }
    _model, names, objects, contacts = cfg_mod.parse_control_objects(conf)

    # friction per (parent, child) pair
    mu_map = {}
    for c in arr_conf.get("contacts", []):
        mu_map[(c["first"], c["second"])] = float(c["mu"])

    # every face of every fixture box, attached to the EE frame
    fixture_faces = {}
    for name, obj in objects.items():
        if name != "ee" and obj.fixture:
            fixture_faces[name] = [
                _box_face_surface(obj.box, n, np.zeros(3), -1)
                for n in obj.box.normals
            ]

    dynamic = [
        (name, obj) for name, obj in objects.items()
        if name != "ee" and not obj.fixture
    ]
    name_index = {name: i for i, (name, _) in enumerate(dynamic)}

    def _support_face(owner_name, direction):
        """Face of ``owner`` pointing along ``direction`` (toward the
        supported object), in the owner's frame convention."""
        owner = objects[owner_name]
        if owner_name == "ee" or owner.fixture:
            return _box_face_surface(owner.box, direction, np.zeros(3), -1)
        return _box_face_surface(
            owner.box, direction, owner.com, name_index[owner_name]
        )

    specs = []
    for name, obj in dynamic:
        # one surface per declared contact pair this object rests on
        # (reference semantics: the config's contacts list defines which
        # pairs interact — an arch bridge touches BOTH pillars, not just
        # its nominal parent)
        surfaces = []
        supported_normals = {}  # owner -> normals already covered
        for c in contacts:
            if c.second != name or c.first not in objects:
                continue
            # c.normal points into `first`; the face toward `second` is -n.
            # One ParsedContact exists per contact POINT, so dedup faces by
            # (owner, normal) to avoid stacking duplicate springs.
            surf = _support_face(c.first, -np.asarray(c.normal))
            if any(
                np.allclose(surf.normal, n)
                for n in supported_normals.get(c.first, [])
            ):
                continue
            surfaces.append(surf)
            supported_normals.setdefault(c.first, []).append(surf.normal)
        if not surfaces:
            surfaces.append(_support_face(obj.parent, np.array([0.0, 0, 1])))

        # remaining fixture faces: lateral catch surfaces beyond the
        # declared pairs (skip faces already covered above)
        for fname, faces in fixture_faces.items():
            covered = supported_normals.get(fname, [])
            for face in faces:
                if any(np.allclose(face.normal, n) for n in covered):
                    continue
                surfaces.append(face)

        mu = mu_map.get((obj.parent, name), mu_map.get((name, obj.parent), 0.5))

        # lateral (side-face) contact patches need their own vertices: a
        # face-face contact against a SMALLER face (e.g. the 6 cm box vs the
        # 5 cm fixture side) has no object corner inside the face extent, so
        # vertex-only contact lets the object penetrate freely until
        # max_depth releases it (then it snaps through and tumbles).  Use
        # the arrangement's parsed contact-patch corners — the same points
        # the controller's balance model uses — shrunk 10% toward the patch
        # centroid so they sit strictly inside the face.
        verts = _object_contact_vertices(obj)
        for key in {(c.first, c.second) for c in contacts}:
            pair = [c for c in contacts if (c.first, c.second) == key]
            if abs(float(np.asarray(pair[0].normal)[2])) >= 0.9:
                continue  # top/bottom support: corners already engage
            if key[1] == name:
                pts = np.asarray([c.r2 for c in pair])
            elif key[0] == name:
                pts = np.asarray([c.r1 for c in pair])
            else:
                continue
            patch = pts - obj.com
            patch = patch + 0.1 * (patch.mean(axis=0) - patch)
            verts = np.concatenate([verts, patch])

        specs.append(
            SimObjectSpec(
                name=name,
                mass=obj.mass,
                inertia_local=np.asarray(obj.inertia),
                vertices_local=verts,
                mu=mu,
                surfaces=surfaces,
                com_world_ee=np.asarray(obj.com),
                q_init=np.array([0.0, 0, 0, 1]),
                fixture=False,
            )
        )
    return specs
