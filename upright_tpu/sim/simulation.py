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


@flax.struct.dataclass
class ObjectsState:
    """Stacked free rigid-body states of the balanced objects."""

    r: jnp.ndarray  # (n_obj, 3) CoM positions, world
    q: jnp.ndarray  # (n_obj, 4) orientations (xyzw), world
    v: jnp.ndarray  # (n_obj, 3) CoM linear velocities
    w: jnp.ndarray  # (n_obj, 3) angular velocities, world


@flax.struct.dataclass
class SimState:
    t: jnp.ndarray  # scalar time
    q: jnp.ndarray  # robot joint positions
    v: jnp.ndarray  # robot joint velocities
    objects: ObjectsState


@dataclasses.dataclass
class ContactSurface:
    """A support surface in a parent body's local frame."""

    parent: int  # object index, or -1 for the EE (tray)
    point: np.ndarray  # a point on the surface (local frame)
    normal: np.ndarray  # unit normal (local frame, pointing away from parent)
    half_extents: np.ndarray  # (2,) rectangular extent in the tangent plane
    tangents: np.ndarray  # (2, 3) tangent basis (local frame)


@dataclasses.dataclass
class SimObjectSpec:
    name: str
    mass: float
    inertia_local: np.ndarray  # (3,3) about CoM, local frame
    vertices_local: np.ndarray  # (k, 3) contact vertices rel. CoM, local frame
    mu: float  # friction vs parent
    surface: ContactSurface  # the surface this object rests on
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
        self.v_slip = float(sim_config.get("friction_regularization", 1e-3))
        self.max_contact_force = float(sim_config.get("max_contact_force", 500.0))
        # internal substeps for the object dynamics: explicit integration of
        # the penalty contacts needs dt_obj * omega well below 1 for the
        # stiffest (lightest-object) coupled mode; auto-derive from the
        # lightest object unless overridden
        if "object_substeps" in sim_config:
            self.object_substeps = int(sim_config["object_substeps"])
        elif self.specs:
            m_min = min(sp.mass for sp in self.specs)
            omega = np.sqrt(self.k_contact / m_min)
            self.object_substeps = int(np.clip(np.ceil(self.timestep * omega * 4.0 / 0.3), 1, 32))
        else:
            self.object_substeps = 1

        self._step = jax.jit(self._step_impl, static_argnums=(2,))

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
        if self.n_obj:
            objects = ObjectsState(
                r=jnp.stack(rs), q=jnp.stack(qs),
                v=jnp.zeros((self.n_obj, 3)), w=jnp.zeros((self.n_obj, 3)),
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

    def step(self, state: SimState, cmd_vel, n_steps: int = 1, params=None) -> SimState:
        """Advance the plant by n_steps * timestep under a (held) joint
        velocity command.  ``params`` overrides the inertial parameters
        (see default_params)."""
        if params is None:
            params = self.default_params()
        return self._step(state, jnp.asarray(cmd_vel), int(n_steps), params)

    def _step_impl(self, state: SimState, cmd_vel, n_steps, params):
        dt = self.timestep

        def substep(s: SimState, _):
            # robot: velocity-commanded (Bullet velocity motors,
            # reference robot.py:89-122)
            q_new = s.q + dt * cmd_vel
            v_new = cmd_vel

            if self.n_obj:
                dt_obj = dt / self.object_substeps
                s_obj = s
                for _ in range(self.object_substeps):
                    obj_new = self._object_substep(s_obj, dt_obj, params)
                    s_obj = s_obj.replace(objects=obj_new)
                obj_new = s_obj.objects
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

    def _object_substep(self, s: SimState, dt, params):
        ee = self._parent_motion(s)

        r, q, v, w = s.objects.r, s.objects.q, s.objects.v, s.objects.w

        forces = []
        torques = []
        # reaction accumulators for object-on-object contacts (Newton's third
        # law: the supporting object feels the opposite contact force)
        reaction_f = [jnp.zeros(3) for _ in range(self.n_obj)]
        reaction_tau = [jnp.zeros(3) for _ in range(self.n_obj)]
        for i, spec in enumerate(self.specs):
            R_i = quat_to_rot(q[i])
            f_tot = params["mass"][i] * jnp.asarray(self.gravity)
            tau_tot = jnp.zeros(3)

            # stability-limited per-object contact gains: explicit integration
            # requires dt*sqrt(k/m) and dt*c/m bounded, so light objects get
            # proportionally softer springs/dampers (same restitution feel)
            m_i = params["mass"][i]
            omega_max = 0.3 / dt
            k_i = jnp.minimum(self.k_contact, m_i * omega_max**2)
            c_i = jnp.minimum(
                jnp.minimum(self.c_contact, 2.0 * jnp.sqrt(k_i * m_i)),
                0.3 * m_i / dt,
            )

            surf = spec.surface
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

            for vert in np.asarray(spec.vertices_local):
                # runtime CoM shift moves the geometry relative to the CoM
                p_w = r[i] + R_i @ (jnp.asarray(vert) - params["com_offset"][i])
                # penetration depth below the surface
                delta = -jnp.dot(n_w, p_w - p_surf_w)
                # only contact within the rectangular extent of the surface
                t_coords = T_w @ (p_w - p_surf_w)
                inside = jnp.all(jnp.abs(t_coords) <= jnp.asarray(surf.half_extents) + 1e-3)
                in_contact = jnp.logical_and(delta > 0.0, inside)

                # relative velocity of the vertex w.r.t. the surface point
                v_vert = v[i] + jnp.cross(w[i], p_w - r[i])
                v_parent = v_p + jnp.cross(w_p, p_w - r_p)
                v_rel = v_vert - v_parent
                v_n = jnp.dot(n_w, v_rel)
                v_t = v_rel - v_n * n_w

                f_n_mag = jnp.maximum(0.0, k_i * delta - c_i * v_n)
                # clamp for numerical robustness under violent commands
                # (deep penetration -> bounded force, not exploding stiffness)
                f_n_mag = jnp.minimum(f_n_mag, self.max_contact_force)
                f_n_mag = jnp.where(in_contact, f_n_mag, 0.0)
                f_n = f_n_mag * n_w

                # regularized Coulomb friction with a stability cap: the
                # regularization acts as a viscous damper with gain
                # mu f_n / (|v_t| + eps); for light objects that exceeds the
                # explicit-integration limit, so clamp the effective gain
                v_t_norm = jnp.linalg.norm(v_t) + self.v_slip
                gain = params["mu"][i] * f_n_mag / v_t_norm
                gain = jnp.minimum(gain, 0.3 * m_i / dt)
                f_t = -gain * v_t

                f_c = f_n + f_t
                f_tot = f_tot + f_c
                tau_tot = tau_tot + jnp.cross(p_w - r[i], f_c)
                if surf.parent >= 0:
                    j = surf.parent
                    reaction_f[j] = reaction_f[j] - f_c
                    reaction_tau[j] = reaction_tau[j] + jnp.cross(p_w - r[j], -f_c)

            forces.append(f_tot)
            torques.append(tau_tot)

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
        return ObjectsState(r=r_new, q=q_new, v=v_new, w=w_new)

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
        return np.asarray(out)


def _build_sim_objects(sim_config):
    """Arrangement config -> sim object specs with contact surfaces."""
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

    ee_conf = sim_config["objects"]["ee"]
    ee_half = 0.5 * np.asarray(ee_conf["side_lengths"], dtype=float)
    ee_pos = np.asarray(ee_conf["position"], dtype=float)

    name_index = {}
    specs = []
    dyn_i = 0
    for name, obj in objects.items():
        if name == "ee":
            continue
        if obj.fixture:
            continue  # fixtures are modeled as part of the parent surface for now
        type_conf = obj.shape_config

        # support vertices: bottom-face corners (local frame, rel. CoM)
        if obj.shape == "cylinder":
            rr = float(type_conf["radius"])
            h = float(type_conf["height"])
            ang = np.linspace(0, 2 * np.pi, 8, endpoint=False)
            verts = np.stack([rr * np.cos(ang), rr * np.sin(ang), -h / 2 * np.ones(8)], axis=1)
            top_half = np.array([rr / np.sqrt(2), rr / np.sqrt(2)])
            top_z = h / 2
        elif obj.shape in ("cuboid", "wedge"):
            hx, hy, hz = 0.5 * np.asarray(type_conf["side_lengths"], dtype=float)
            verts = np.array(
                [[sx * hx, sy * hy, -hz] for sx in (1, -1) for sy in (1, -1)]
            )
            top_half = np.array([hx, hy])
            top_z = hz
        else:
            raise ValueError(f"Unsupported sim shape {obj.shape}")

        # CoM offset: vertices are stored relative to the CoM
        com_off = np.asarray(type_conf.get("com_offset", [0, 0, 0]), dtype=float)
        verts = verts - com_off

        # parent surface
        if obj.parent == "ee" or objects[obj.parent].fixture:
            surface = ContactSurface(
                parent=-1,
                point=ee_pos + np.array([0, 0, ee_half[2]]),
                normal=np.array([0.0, 0, 1]),
                half_extents=ee_half[:2],
                tangents=np.array([[1.0, 0, 0], [0, 1.0, 0]]),
            )
        else:
            p_spec = specs[name_index[obj.parent]]
            p_conf = objects[obj.parent].shape_config
            if objects[obj.parent].shape == "cylinder":
                p_half = np.array([p_conf["radius"], p_conf["radius"]])
                p_top = p_conf["height"] / 2
            else:
                phx, phy, phz = 0.5 * np.asarray(p_conf["side_lengths"], dtype=float)
                p_half = np.array([phx, phy])
                p_top = phz
            p_com_off = np.asarray(p_conf.get("com_offset", [0, 0, 0]), dtype=float)
            surface = ContactSurface(
                parent=name_index[obj.parent],
                point=np.array([0, 0, p_top]) - p_com_off,
                normal=np.array([0.0, 0, 1]),
                half_extents=p_half,
                tangents=np.array([[1.0, 0, 0], [0, 1.0, 0]]),
            )

        mu = mu_map.get((obj.parent, name), mu_map.get((name, obj.parent), 0.5))

        name_index[name] = dyn_i
        dyn_i += 1
        specs.append(
            SimObjectSpec(
                name=name,
                mass=obj.mass,
                inertia_local=np.asarray(obj.inertia),
                vertices_local=verts,
                mu=mu,
                surface=surface,
                com_world_ee=np.asarray(obj.com),
                q_init=np.array([0.0, 0, 0, 1]),
                fixture=False,
            )
        )
    return specs
