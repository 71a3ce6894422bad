"""Assembly of the upright OCP: config -> OCP functions + parameter pytrees.

TPU-native replacement of the reference's ControllerInterface constructor
(upright_control/src/controller_interface.cpp:103-393) and the Python settings
translation (upright_control/src/upright_control/wrappers.py:78-399).  The
whole problem — dynamics, costs, balance constraints, limits, EE box,
obstacles — is assembled into pure stage functions at build time; per-solve
data (stage times, targets, inertial parameters, obstacle states) live in a
parameter pytree so one compiled solver serves every solve and batches over
scenarios.

State / input layout (reference dimensions.h:10-46):
    x = [q (nq), v (nq), a (nq), obs_1 (9), ..., obs_o (9)]
    u = [jerk (nq), forces (nf * nc)]
Dynamic-obstacle states are 9-vectors [r, v, a] with constant-acceleration
dynamics (system_dynamics.h:29-39).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

import upright_tpu.config as cfg_mod
from upright_tpu.core import balance as bal
from upright_tpu.core.balance import BalanceModel, EEState
from upright_tpu.core.math import orientation_error
from upright_tpu.kinematics.robot import RobotModel, build_robot_model
from upright_tpu.ocp.reference import TargetTrajectory
from upright_tpu.solver.ocp import OCP, IneqBoxRows


@dataclasses.dataclass
class UprightDims:
    """Problem dimensions (reference dimensions.h)."""

    robot_q: int
    robot_x: int
    robot_u: int
    num_objects: int = 0
    num_contacts: int = 0
    nf: int = 1  # force dim per contact: 1 frictionless, 3 frictional
    num_obstacles: int = 0  # dynamic obstacles, 9 states each

    @property
    def f(self):
        return self.nf * self.num_contacts

    @property
    def x(self):
        return self.robot_x + 9 * self.num_obstacles

    @property
    def u(self):
        return self.robot_u + self.f


@dataclasses.dataclass
class CollisionSphere:
    """A collision sphere attached to a named chain frame (replaces the
    reference's HPP-FCL geometry pairs, controller_interface.cpp:450-481)."""

    link: str
    offset: np.ndarray
    radius: float


@dataclasses.dataclass
class UprightProblem:
    """Everything needed to run the MPC: the OCP + builders for its params."""

    ocp: OCP
    dims: UprightDims
    robot: RobotModel
    balance_model: BalanceModel
    dt: float
    x0: jnp.ndarray
    xd: jnp.ndarray  # desired joint-space state for the quadratic cost
    target: TargetTrajectory
    gravity: jnp.ndarray
    config: dict
    # (name, row count) of each inequality block, in stacking order —
    # the reference exposes constraint values per named constraint
    # (controller_python_interface.h:31-88)
    ineq_groups: list = dataclasses.field(default_factory=list)
    # position-jump size (rad, joint-space 2-norm) above which the warm
    # start's state trajectory is re-rolled from the measured x0 instead of
    # kept (post-brake re-engage); config key controller.mpc.heal_jump_threshold
    heal_jump_threshold: float = 0.2
    # per-force-variable scale (dims.f,): physical newtons = force_scale *
    # the solver's dimensionless force variables (see build_problem)
    force_scale: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )

    def evaluate_constraints(self, x, u, t=0.0, target=None):
        """Diagnostic evaluation of all constraint groups at one (x, u, t),
        split by named group — parity with the reference's per-named-
        constraint logging (controller_python_interface.h:31-88,
        mpc_sim.py:190-248)."""
        params = self.stage_params(t, target)
        p0 = {k: v[0] for k, v in params["stage"].items()}
        r, W = self.ocp.stage_residuals(jnp.asarray(x), jnp.asarray(u), p0)
        h = self.ocp.ineq(jnp.asarray(x), jnp.asarray(u), p0)
        out = {
            "equality": self.ocp.eq(jnp.asarray(x), jnp.asarray(u), p0),
            "inequality": h,
            "ee_pose_error": r[:6],
        }
        off = 0
        for name, n_rows in self.ineq_groups:
            out[name] = h[off : off + n_rows]
            off += n_rows
        return out

    def diagnostics(self, x, u, t=0.0, target=None):
        """Scalar diagnostics the reference tracks per step
        (manager.py:60-96 ControllerModel.angle_between_acc_and_normal /
        ddC_we_norm; util.py:37-58 support_area_distance; plus the stage
        cost and the contact-force decision variables)."""
        from upright_tpu.core.math import skew3

        params = self.stage_params(t, target)
        p0 = {k: v[0] for k, v in params["stage"].items()}
        x = jnp.asarray(x)
        u = jnp.asarray(u)
        ee = self.robot.ee_state(x[: self.dims.robot_x])

        # angle between the tray normal (EE z) and total acceleration
        total_acc = ee.a_ew_w - self.gravity
        n_w = ee.C_we @ jnp.array([0.0, 0, 1])
        cosang = jnp.dot(n_w, total_acc) / jnp.maximum(
            jnp.linalg.norm(total_acc), 1e-9
        )
        orn_err = jnp.arccos(jnp.clip(cosang, -1.0, 1.0))

        # norm of the rotation-matrix second derivative (manager.py:85-96)
        S_w = skew3(ee.w_ew_w)
        S_a = skew3(ee.alpha_ew_w)
        ddC = (S_a + S_w @ S_w) @ ee.C_we
        return {
            "orn_err": orn_err,
            "ddC_we_norm": jnp.linalg.norm(ddC),
            "cost": self.ocp.stage_cost(x, u, p0),
            "contact_forces": u[self.dims.robot_u :]
            * jnp.asarray(self.force_scale),
        }

    def shift_warm_start(self, state, shift):
        """Time-shift the warm start by ``shift`` nodes (fractional OK).

        OCS2 warm-starts each re-solve by interpolating the PREVIOUS
        solution at the NEW query times (primal solution carry-over in
        SqpSolver); without the shift a replan that advances a full node
        hands the 1-iteration SQP a plan misaligned by one stage and the
        errors compound.  ``shift = (t - t_last)/dt``; jit-safe for traced
        ``shift`` (gather + linear interpolation; multipliers interpolate
        the same way, tail entries clamp to the last stage).
        """
        s = jnp.asarray(shift, dtype=state.X.dtype)
        s = jnp.maximum(s, 0.0)
        n = jnp.floor(s).astype(jnp.int32)
        frac = s - n

        def shift_rows(A, last):
            k = jnp.arange(A.shape[0])
            a = jnp.clip(k + n, 0, last)
            b = jnp.clip(k + n + 1, 0, last)
            return (1.0 - frac) * A[a] + frac * A[b]

        N = state.U.shape[0]
        return state.replace(
            X=shift_rows(state.X, N),
            U=shift_rows(state.U, N - 1),
            lam=shift_rows(state.lam, N - 1),
            mu=shift_rows(state.mu, N - 1),
        )

    def heal_warm_start(self, state, x0):
        """Repair stale components of the warm start for the new x0.

        - Dynamic-obstacle tails evolve autonomously, so they are always
          re-propagated from the measured obstacle state (stale tails create
          defects the line search cannot remove).
        - The robot part keeps the stored (near-optimal) trajectory for
          normal tracking, but after a LARGE state jump (e.g. post-brake
          re-engage) the stored plan is unreachable from x0 and its stage-0
          defect stalls the line search; in that case the state trajectory
          is re-rolled from x0 through the stored inputs.  The switch is a
          smooth jit-safe blend gated on |x0 - X[0]|.
        """
        import jax

        x0 = jnp.asarray(x0)

        def step(x, u):
            # stage params do not affect the robot/obstacle dynamics
            x_next = self.ocp.dynamics(x, u, None)
            return x_next, x_next

        _, X_roll_tail = jax.lax.scan(step, x0, state.U)
        X_roll = jnp.concatenate([x0[None], X_roll_tail], axis=0)

        X_keep = state.X
        if self.dims.num_obstacles:
            rx = self.dims.robot_x
            X_keep = X_keep.at[:, rx:].set(X_roll[:, rx:])

        # jump detector: re-roll only when the plan is far from x0 (a
        # post-brake re-engage, not normal tracking).  Measured on the
        # POSITION states only: a post-brake jump is position-level
        # (|dq| ~ 0.1+), while per-replan drift during fast nominal motion
        # lives in the velocity/acceleration states (jerk moves the
        # acceleration norm by up to u_max*dt ~ 1.6 per replan) — gating on
        # the full robot state made this fire every step in the obstacle
        # demos, and re-rolling stored jerks open-loop over the 2 s horizon
        # amplifies small errors cubically (closed-loop runaway).
        jump = jnp.linalg.norm(x0[: self.dims.robot_q] - state.X[0, : self.dims.robot_q])
        use_roll = jump > self.heal_jump_threshold
        X = jnp.where(use_roll, X_roll, X_keep)
        return state.replace(X=X)

    def stage_params(self, t0, target: Optional[TargetTrajectory] = None,
                     balance_params=None):
        """Per-solve parameter pytree for solver.solve.

        t0: current time (stage k is at t0 + k*dt).
        target: overrides the stored target trajectory.
        balance_params: (n_obj, 10) overrides object inertial parameters
        (the robust-scenario axis).
        """
        target = self.target if target is None else target
        bp = self.balance_model.params if balance_params is None else balance_params
        N = self.ocp.N
        ts = t0 + self.dt * jnp.arange(N)
        n_wp = target.times.shape[0]
        stage = {
            "t": ts,
            "target_times": jnp.broadcast_to(target.times, (N, n_wp)),
            "target_poses": jnp.broadcast_to(target.poses, (N, n_wp, 8)),
            "obj_params": jnp.broadcast_to(bp, (N,) + bp.shape),
        }
        final = {
            "t": t0 + self.dt * N,
            "target_times": target.times,
            "target_poses": target.poses,
            "obj_params": bp,
        }
        return {"stage": stage, "final": final}


def _triple_integrator_step(nq, dt):
    """Exact discretization of the jerk-input triple integrator
    (system_dynamics.h:15-22; exact form as in trajectory.py:7-28)."""

    def step(q, v, a, j):
        q1 = q + dt * v + 0.5 * dt**2 * a + dt**3 / 6.0 * j
        v1 = v + dt * a + 0.5 * dt**2 * j
        a1 = a + dt * j
        return q1, v1, a1

    return step


def _obstacle_step(dt):
    """Constant-acceleration 9-state point (system_dynamics.h:29-39), exact."""

    def step(s):
        r, v, a = s[0:3], s[3:6], s[6:9]
        return jnp.concatenate([r + dt * v + 0.5 * dt**2 * a, v + dt * a, a])

    return step


def _use_jac_col_blocks(sqp_conf: dict) -> bool:
    """Resolve sqp.jac_col_blocks ("auto" | true | false, default "auto").

    The per-block stage-Jacobian columns (OCP.x_jac_blocks) are a CPU win
    (+50% batched throughput: v/a columns skip the rotation-chain JVPs) but
    a TPU loss (-15%: four narrow jacfwd passes starve the MXU batch
    dimension vs one wide pass).  "auto" picks by the default backend at
    problem-build time; an explicit bool in the config overrides.
    """
    choice = sqp_conf.get("jac_col_blocks", "auto")
    if isinstance(choice, bool):
        return choice
    if choice != "auto":
        raise ValueError(f"sqp.jac_col_blocks must be 'auto' or bool, got {choice!r}")
    return jax.default_backend() == "cpu"


def build_problem(config: dict, N: Optional[int] = None) -> UprightProblem:
    """Build the full OCP from a merged config dict (see configs/)."""
    ctrl = config["controller"]
    robot_conf = ctrl["robot"]
    robot = build_robot_model(robot_conf)
    nq = robot.nq

    # -- balancing model ------------------------------------------------
    balancing = ctrl.get("balancing", {"enabled": False})
    if balancing.get("enabled", False):
        parse_conf = dict(ctrl)
        model, names, objects, contacts = cfg_mod.parse_control_objects(parse_conf)
        frictionless = bool(balancing.get("frictionless", True))
        nf = 1 if frictionless else 3
        nc = model.num_contacts
        n_obj = model.num_objects
    else:
        model = BalanceModel.empty()
        names, objects, contacts = [], {}, []
        frictionless, nf, nc, n_obj = True, 1, 0, 0

    obstacles_conf = ctrl.get("obstacles", {"enabled": False})
    dyn_obs = obstacles_conf.get("dynamic", []) if obstacles_conf.get("enabled") else []
    num_obstacles = len(dyn_obs)

    dims = UprightDims(
        robot_q=nq, robot_x=3 * nq, robot_u=nq,
        num_objects=n_obj, num_contacts=nc, nf=nf,
        num_obstacles=num_obstacles,
    )

    # -- horizon / transcription ---------------------------------------
    sqp_conf = ctrl.get("sqp", {})
    dt = float(sqp_conf.get("dt", 0.1))
    horizon = float(ctrl.get("mpc", {}).get("time_horizon", 2.0))
    if N is None:
        N = int(round(horizon / dt))

    robot_step = _triple_integrator_step(nq, dt)
    obs_step = _obstacle_step(dt)
    base_type = robot_conf.get("base_type", "omnidirectional").lower()
    # Nonholonomic (unicycle) bases keep the exact linear triple-integrator
    # dynamics; the rolling constraint (zero lateral base velocity) enters as
    # an equality constraint handled by the AL solver — XLA-friendlier than
    # the reference's nonlinear flowmap (system_dynamics.h:42-63, unused in
    # its demos).
    nonholonomic = base_type == "nonholonomic"

    def dynamics(x, u, p):
        q, v, a = x[:nq], x[nq : 2 * nq], x[2 * nq : 3 * nq]
        j = u[:nq]
        q1, v1, a1 = robot_step(q, v, a, j)
        parts = [q1, v1, a1]
        for i in range(num_obstacles):
            s = x[3 * nq + 9 * i : 3 * nq + 9 * (i + 1)]
            parts.append(obs_step(s))
        return jnp.concatenate(parts)

    # -- weights (reference wrappers.py:199-237) ------------------------
    W_input = jnp.asarray(cfg_mod.parse_diag_matrix_dict(ctrl["weights"]["input"]))
    W_state_robot = jnp.asarray(cfg_mod.parse_diag_matrix_dict(ctrl["weights"]["state"]))
    W_ee = jnp.asarray(cfg_mod.parse_diag_matrix_dict(ctrl["weights"]["end_effector"]))
    force_weight = float(balancing.get("force_weight", 1e-3))

    # desired joint state: the initial state (velocity/acceleration weights
    # pull toward rest; q block is zero-weighted in the reference configs)
    x0_robot = jnp.asarray(cfg_mod.parse_array(robot_conf["x0"]))
    xd_robot = x0_robot

    gravity = jnp.asarray(cfg_mod.parse_array(config.get("gravity", [0, 0, -9.81])))

    # -- contact-force variable scaling (conditioning) --------------------
    # The NE residuals are mass-normalized (balance.py:212-213), so their
    # Jacobian w.r.t. PHYSICAL forces is ~1/m: 50x steeper for a 0.02 kg
    # foam die than a 1 kg bottle.  That skew ill-scales the AL penalty
    # Hessian rho*J'J against the O(1) cost curvature (HPIPM solves each QP
    # exactly and never sees it; the penalty method does — the r3 dice
    # failures).  Solve in MASS-SCALED force variables instead:
    #     f_physical = fscale_c * u_f,   fscale_c = m_ref(c),
    # with m_ref the lightest dynamic object the contact touches.  The
    # mass-normalized eq rows then see force Jacobians of m_ref/m ~ 1 —
    # the same order as their acceleration columns — for EVERY object
    # mass, so one solver configuration covers the whole arrangement tree
    # (no per-leaf rho tuning).  Scaled forces sit at ~|g|/n_contacts at
    # equilibrium.
    if dims.f > 0:
        masses_np = np.asarray(model.params[:, 0])
        incident = (np.asarray(model.S1) + np.asarray(model.S2)) > 0.5
        m_ref = np.where(incident, masses_np[:, None], np.inf).min(axis=0)
        m_fill = float(masses_np.mean()) if masses_np.size else 1.0
        m_ref = np.where(np.isfinite(m_ref), m_ref, m_fill)
        force_scale = np.repeat(m_ref, nf)  # (dims.f,)
    else:
        force_scale = np.zeros(0)
    fscale_j = jnp.asarray(force_scale)

    # input weight over [jerk, forces].  force_weight acts on the
    # DIMENSIONLESS force variables (i.e. physical weight
    # force_weight/(m_ref|g|)^2 per contact), NOT on raw newtons as in the
    # reference (controller_interface.cpp:400-420).  This is deliberate:
    # the regularizer's job is to pick the interior point of the grasp
    # map's null space, and it must sit a bounded factor below the
    # constraint curvature in the SAME variables for the f32 Riccati
    # recursion to stay stable — weighting physical newtons made the
    # force-block conditioning mass-dependent (2.5e7 for 0.02 kg dice),
    # which blew up K through null-space noise amplification.  HPIPM never
    # sees this because it solves each QP exactly in f64.
    W_u = jnp.zeros((dims.u, dims.u))
    W_u = W_u.at[:nq, :nq].set(W_input)
    if dims.f > 0:
        W_u = W_u.at[nq:, nq:].set(force_weight * jnp.eye(dims.f))

    # -- limits (reference wrappers.py; BoundConstraint in
    #    controller_interface.cpp:157-169, 333-357) ----------------------
    limits = ctrl.get("limits", {})
    x_lb_robot = cfg_mod.parse_array(limits["state"]["lower"]) if "state" in limits else None
    x_ub_robot = cfg_mod.parse_array(limits["state"]["upper"]) if "state" in limits else None
    u_lb_robot = cfg_mod.parse_array(limits["input"]["lower"]) if "input" in limits else None
    u_ub_robot = cfg_mod.parse_array(limits["input"]["upper"]) if "input" in limits else None

    FORCE_BOUND = 1e2  # newtons, reference controller_interface.cpp:337-357
    if dims.f > 0:
        # bounds live on the scaled variables: +-FORCE_BOUND physical
        f_bound = FORCE_BOUND / force_scale
        f_lb = np.zeros(dims.f) if frictionless else -f_bound
        f_ub = f_bound.copy()
    else:
        f_lb = np.zeros(0)
        f_ub = np.zeros(0)

    u_lb = jnp.asarray(np.concatenate([u_lb_robot, f_lb])) if u_lb_robot is not None else None
    u_ub = jnp.asarray(np.concatenate([u_ub_robot, f_ub])) if u_ub_robot is not None else None
    x_lb = jnp.asarray(x_lb_robot) if x_lb_robot is not None else None
    x_ub = jnp.asarray(x_ub_robot) if x_ub_robot is not None else None

    # -- EE helpers ------------------------------------------------------
    def ee_state_of(x):
        return robot.ee_state(x[: dims.robot_x])

    def interp_target(p):
        tgt = TargetTrajectory(times=p["target_times"], poses=p["target_poses"])
        return tgt.interpolate(p["t"])

    # -- stage cost ------------------------------------------------------
    def stage_quad(x, u, p):
        dx = x[: dims.robot_x] - xd_robot
        return 0.5 * dx @ W_state_robot @ dx + 0.5 * u @ W_u @ u

    def stage_quad_derivs(x, u, p):
        """Analytic gradient/Hessian of stage_quad (weights are constants;
        obstacle-state columns are zero)."""
        dx = x[: dims.robot_x] - xd_robot
        gx = W_state_robot @ dx
        grad = jnp.concatenate(
            [gx, jnp.zeros(dims.x - dims.robot_x, dtype=x.dtype), W_u @ u]
        )
        H = jax.scipy.linalg.block_diag(
            W_state_robot,
            jnp.zeros((dims.x - dims.robot_x, dims.x - dims.robot_x)),
            W_u,
        )
        return grad, H.astype(x.dtype)

    ia_conf = ctrl.get("inertial_alignment", {})
    ia_cost_enabled = bool(ia_conf.get("cost_enabled", False))
    ia_weight = float(ia_conf.get("cost_weight", 1.0))
    ia_normal = np.asarray(ia_conf.get("contact_plane_normal", [0, 0, 1]), dtype=float)
    # alignment-vector modes (inertial_alignment.cpp:17-35): default is the
    # total EE-frame acceleration; use_angular_acceleration adds the
    # centripetal/tangential term ddC_we @ com of an object CoM offset;
    # align_with_fixed_vector ("upward"/dynamic-insensitivity mode, ral23
    # freespace/upward) tracks the original normal direction instead.
    ia_fixed_vector = bool(ia_conf.get("align_with_fixed_vector", False))
    ia_use_angular = bool(ia_conf.get("use_angular_acceleration", False))
    ia_com = jnp.asarray(
        np.asarray(ia_conf.get("com", [0.0, 0.0, 0.0]), dtype=float)
    )
    ia_span = None
    if ia_cost_enabled or ia_conf.get("constraint_enabled", False):
        from upright_tpu.core.polyhedron import plane_span as np_plane_span

        ia_span = jnp.asarray(np_plane_span(ia_normal))

    def _alignment_vector(ee):
        """EE-frame vector whose tangential components the alignment cost and
        constraint act on (inertial_alignment.cpp:17-35)."""
        if ia_fixed_vector:
            return ee.C_we.T @ ia_normal_j
        a_total = ee.a_ew_w - gravity
        if ia_use_angular:
            from upright_tpu.core.math import dC_dtt

            a_total = a_total + dC_dtt(ee.C_we, ee.w_ew_w, ee.alpha_ew_w) @ ia_com
        return ee.C_we.T @ a_total

    # EE-error clamp (controller.ee_error_clamp, meters; 0 = off): bounds
    # the tracking pull when the target is unreachable.  The AL analogue of
    # the reference's HPIPM slack penalties (its base config enables
    # slacks: state_box + poly_ineq): with an unsatisfiable terminal
    # position equality the PHR multipliers wind up to lam_max and the
    # bounded-only-by-lam_max pull destabilizes the closed loop (observed:
    # a fixed-base UR10 given the ral23 point1 waypoint 2.2 m outside its
    # workspace throws the payload).  Clamping the error magnitude keeps
    # the gradient direction with a bounded norm — identical behavior
    # whenever the error is below the radius.
    ee_clamp = float(ctrl.get("ee_error_clamp", 0.0))

    def _clamped(e_pos):
        if ee_clamp <= 0.0:
            return e_pos
        nrm = jnp.linalg.norm(e_pos)
        return e_pos * jnp.minimum(1.0, ee_clamp / jnp.maximum(nrm, 1e-9))

    def stage_residuals(x, u, p):
        """Nonlinear GN residuals: EE pose error (+ inertial alignment)."""
        rd, qd, _s = interp_target(p)
        ee = ee_state_of(x)
        # orientation error vs desired quaternion, as in OCS2
        from upright_tpu.core.math import rot_to_quat

        q_act = rot_to_quat(ee.C_we)
        e = jnp.concatenate(
            [_clamped(ee.r_ew_w - rd), orientation_error(q_act, qd)]
        )
        W = W_ee
        if ia_cost_enabled:
            # alignment residual S @ <alignment vector>, normalized by |g| in
            # the acceleration modes (inertial_alignment.cpp:80-83 GN form).
            # In fixed-vector mode the reference cost is the linear
            # -w n.(C_we^T n); since |C_we^T n| = 1 that equals
            # -w + (w/2)|S C_we^T n|^2 + O(|e|^4), so the GN residual
            # S C_we^T n has the same minimizer and curvature.
            e_align = ia_span @ _alignment_vector(ee)
            if not ia_fixed_vector:
                e_align = e_align / jnp.linalg.norm(gravity)
            e = jnp.concatenate([e, e_align])
            W = jax.scipy.linalg.block_diag(W_ee, ia_weight * jnp.eye(2))
        return e, W

    def stage_cost(x, u, p):
        r, W = stage_residuals(x, u, p)
        return stage_quad(x, u, p) + 0.5 * r @ W @ r

    # -- equality constraints: object dynamics ---------------------------
    def _rolling_rows(x):
        # zero lateral velocity and acceleration of the unicycle base:
        # [-sin(yaw), cos(yaw)] . (vx, vy) = 0 (and the same for ax, ay)
        yaw = x[2]
        s_, c_ = jnp.sin(yaw), jnp.cos(yaw)
        v_lat = -s_ * x[nq + 0] + c_ * x[nq + 1]
        a_lat = -s_ * x[2 * nq + 0] + c_ * x[2 * nq + 1]
        return jnp.stack([v_lat, a_lat])

    def eq(x, u, p):
        rows = []
        if nonholonomic:
            rows.append(_rolling_rows(x))
        if n_obj == 0:
            if rows:
                return jnp.concatenate(rows)
            return jnp.zeros((0,))
        forces_flat = u[nq:] * fscale_j  # scaled variables -> physical newtons
        scen = model.replace(params=p["obj_params"])
        if frictionless:
            forces = bal.expand_frictionless_forces(scen, forces_flat)
        else:
            forces = forces_flat.reshape(nc, 3)
        ee = ee_state_of(x)
        rows.append(bal.object_dynamics_constraints(scen, forces, ee, gravity))
        return jnp.concatenate(rows)

    n_eq = 6 * n_obj + (2 if nonholonomic else 0)

    # -- inequality constraints -----------------------------------------
    ee_box_conf = ctrl.get("end_effector_box_constraint", {"enabled": False})
    ee_box_enabled = bool(ee_box_conf.get("enabled", False))
    if ee_box_enabled:
        xyz_lower = jnp.asarray(np.asarray(ee_box_conf["xyz_lower"], dtype=float))
        xyz_upper = jnp.asarray(np.asarray(ee_box_conf["xyz_upper"], dtype=float))

    ia_con_enabled = bool(ia_conf.get("constraint_enabled", False))
    ia_alpha = float(ia_conf.get("alpha", 0.0))

    obs_enabled = bool(obstacles_conf.get("enabled", False))
    collision_pairs = []
    if obs_enabled:
        collision_pairs = _build_collision_pairs(ctrl, robot, num_obstacles)
    min_dist = float(obstacles_conf.get("minimum_distance", 0.1))

    # projectile-path avoidance (projectile_path_constraint.h:12-160): keep
    # named links at least distance_i from the predicted ballistic path of
    # the thrown obstacle, gated by the target's s flag
    proj_conf = ctrl.get("projectile_path_constraint", {"enabled": False})
    proj_enabled = bool(proj_conf.get("enabled", False)) and num_obstacles > 0
    proj_links = list(proj_conf.get("collision_links", []))
    proj_distances = np.asarray(proj_conf.get("distances", []), dtype=float)
    proj_scale = float(proj_conf.get("scale", 1.0))

    # projectile PLANE variant (projectile_plane_constraint.h:36-55, the
    # reference's experimental alternative, disabled in its
    # controller_interface.cpp:287-289): keep the EE on the far side of a
    # plane through the projectile, s * (n.(r_ew - r_obs) - w) >= 0.  The
    # reference hard-codes w = 0.3 and reads n from an extended target
    # state; here both are config keys (distance, normal).
    plane_conf = ctrl.get("projectile_plane_constraint", {"enabled": False})
    plane_enabled = bool(plane_conf.get("enabled", False)) and num_obstacles > 0
    plane_w = float(plane_conf.get("distance", 0.3))
    plane_n = np.asarray(plane_conf.get("normal", [0.0, 1.0, 0.0]), dtype=float)
    plane_n = plane_n / np.linalg.norm(plane_n)
    plane_n_j = jnp.asarray(plane_n)

    def _projectile_plane_rows(x, p):
        _rd, _qd, s = interp_target(p)
        r_obs = x[dims.robot_x : dims.robot_x + 3]
        r_ee = ee_state_of(x).r_ew_w
        return jnp.stack([s * (plane_n_j @ (r_ee - r_obs) - plane_w)])

    def _projectile_rows(x, p):
        q = x[:nq]
        _sd, _qd, s = interp_target(p)
        x_obs = x[dims.robot_x : dims.robot_x + 9]
        r_obs, v_obs, a_obs = x_obs[:3], x_obs[3:6], x_obs[6:9]
        link_pos = robot.link_positions(q)
        names_all = robot.chain.joint_names
        rows = []
        for link, dist in zip(proj_links, proj_distances):
            r_link = link_pos[names_all.index(link)]
            dt_c = _projectile_closest_time(r_link, r_obs, v_obs, a_obs)
            dt_c = jnp.where(s > 0.5, jnp.maximum(0.0, dt_c), 0.0)
            r_closest = r_obs + dt_c * v_obs + 0.5 * dt_c**2 * a_obs
            delta = r_link - r_closest
            w = proj_scale / dist
            rows.append(w * s * (jnp.linalg.norm(delta) - dist))
        return jnp.stack(rows)

    # Inequality stack, split so the solver can treat the box-limit block
    # analytically (solver/ocp.py IneqBoxRows): row order is
    # [cones | x_lo | x_hi | u_lo | u_hi | ee_box | alignment | collisions
    #  | projectile].  The box rows have constant +/-identity Jacobians.
    def _ineq_pre(x, u, p):
        # friction cones (frictional mode; frictionless cones are the
        # f >= 0 input bounds)
        if nc > 0 and not frictionless:
            scen = model.replace(params=p["obj_params"])
            # evaluated on the SCALED force variables: the cone rows are
            # positively homogeneous, so this is the physical cone divided
            # by fscale_c — same feasible set, O(1) rows for every object
            # mass (uniform AL penalty weighting)
            forces = u[nq:].reshape(nc, 3)
            return bal.contact_force_constraints_linearized(scen, forces)
        return jnp.zeros((0,))

    def _ineq_box(x, u):
        rows = []
        if x_lb is not None:
            xr = x[: dims.robot_x]
            rows.append(xr - x_lb)
            rows.append(x_ub - xr)
        if u_lb is not None:
            rows.append(u - u_lb)
            rows.append(u_ub - u)
        if not rows:
            return jnp.zeros((0,))
        return jnp.concatenate(rows)

    def _ineq_post(x, u, p):
        rows = []
        # EE position box around the desired position
        # (end_effector_box_constraint.h:12-88)
        if ee_box_enabled:
            rd, _qd, _s = interp_target(p)
            r_ee = ee_state_of(x).r_ew_w
            rows.append(r_ee - (rd + xyz_lower))
            rows.append((rd + xyz_upper) - r_ee)
        # inertial alignment cone (inertial_alignment.cpp:7-51)
        if ia_con_enabled:
            ee = ee_state_of(x)
            a = _alignment_vector(ee)
            a_n = ia_normal_j @ a
            a_t = ia_span @ a
            rows.append(
                jnp.stack(
                    [
                        a_n,
                        ia_alpha * a_n - a_t[0] - a_t[1],
                        ia_alpha * a_n - a_t[0] + a_t[1],
                        ia_alpha * a_n + a_t[0] - a_t[1],
                        ia_alpha * a_n + a_t[0] + a_t[1],
                    ]
                )
            )
        # collision avoidance: sphere-sphere distances
        if collision_pairs:
            rows.append(_collision_rows(x))
        # projectile path avoidance
        if proj_enabled and proj_links:
            rows.append(_projectile_rows(x, p))
        if plane_enabled:
            rows.append(_projectile_plane_rows(x, p))
        if not rows:
            return jnp.zeros((0,))
        return jnp.concatenate(rows)

    def ineq(x, u, p):
        return jnp.concatenate(
            [_ineq_pre(x, u, p), _ineq_box(x, u), _ineq_post(x, u, p)]
        )

    def ineq_smooth(x, u, p):
        return jnp.concatenate([_ineq_pre(x, u, p), _ineq_post(x, u, p)])

    ia_normal_j = jnp.asarray(ia_normal)

    def _collision_rows(x):
        q = x[:nq]
        names_all = robot.chain.joint_names
        frames = robot.chain._propagate(q, jnp.zeros_like(q), jnp.zeros_like(q))
        out = []
        for pair in collision_pairs:
            (link_a, off_a, rad_a), b = pair
            ia_idx = names_all.index(link_a)
            # offset expressed in the link frame
            pa = frames[ia_idx].p + frames[ia_idx].R @ off_a
            if isinstance(b, str) and b == "ground":
                # halfspace z >= 0 (controller_interface.cpp:93-101)
                out.append(pa[2] - rad_a - min_dist)
                continue
            if isinstance(b, tuple) and isinstance(b[0], str) and b[0] == "dynamic":
                idx, rad_b = b[1], b[2]
                pb = x[3 * nq + 9 * idx : 3 * nq + 9 * idx + 3]
            else:
                (pb, rad_b) = b
                pb = jnp.asarray(pb)
            dist = jnp.linalg.norm(pa - pb)
            out.append(dist - (rad_a + rad_b + min_dist))
        return jnp.stack(out)

    n_ineq_probe = None  # computed below by tracing shapes

    # -- terminal constraints -------------------------------------------
    def final_eq(x, p):
        # EE at the desired position, zero velocity/acceleration
        # (stationary_desired_position_constraint.h:11-84).  The position
        # rows share the ee_error_clamp: an unreachable target otherwise
        # makes these rows unsatisfiable and their AL multipliers wind up
        # to lam_max (see _clamped above).
        rd, _qd, _s = interp_target(p)
        r_ee = ee_state_of(x).r_ew_w
        v = x[nq : 2 * nq]
        a = x[2 * nq : 3 * nq]
        return jnp.concatenate([_clamped(r_ee - rd), v, a])

    n_feq = 3 + 2 * nq

    def final_cost(x, p):
        return 0.0

    def final_quad(x, p):
        return 0.0

    # probe the inequality row count with dummy inputs
    dummy_x = jnp.zeros(dims.x)
    dummy_u = jnp.zeros(dims.u)
    dummy_p = {
        "t": jnp.zeros(()),
        "target_times": jnp.zeros((1,)),
        "target_poses": jnp.concatenate([jnp.zeros((1, 3)), jnp.array([[0, 0, 0, 1.0, 0]])], axis=1),
        "obj_params": model.params,
    }
    n_ineq = int(jax.eval_shape(ineq, dummy_x, dummy_u, dummy_p).shape[0])

    # named inequality blocks, in stacking order (for diagnostics/logging)
    ineq_groups = []
    if nc > 0 and not frictionless:
        ineq_groups.append(("contact_force_constraints", 5 * nc))
    if x_lb is not None:
        ineq_groups.append(("state_limits", 2 * dims.robot_x))
    if u_lb is not None:
        ineq_groups.append(("input_limits", 2 * dims.u))
    if ee_box_enabled:
        ineq_groups.append(("ee_box_constraints", 6))
    if ia_con_enabled:
        ineq_groups.append(("alignment_constraints", 5))
    if collision_pairs:
        ineq_groups.append(("collision_pair_distances", len(collision_pairs)))
    if proj_enabled and proj_links:
        ineq_groups.append(("projectile_distances", len(proj_links)))
    if plane_enabled:
        ineq_groups.append(("projectile_plane", 1))
    assert sum(n for _, n in ineq_groups) == n_ineq, (ineq_groups, n_ineq)

    n_pre_rows = 5 * nc if (nc > 0 and not frictionless) else 0
    box_rows = IneqBoxRows(
        n_pre=n_pre_rows,
        nx_box=dims.robot_x if x_lb is not None else 0,
        nu_box=dims.u if u_lb is not None else 0,
    )

    # Stacked-Jacobian differentiation mode (sqp.jac_mode: auto|fwd|rev).
    # After the analytic box-row split the traced stack is short and wide
    # (12 rows x 40 cols on thing_demo), which suggests reverse mode (one
    # VJP per row vs one JVP per column) — but measured on TPU v5e the
    # 3x-fewer reverse passes LOSE to forward mode (25.3k vs 28.5k solves/s
    # at batch 512): the transposed rotation-chain accumulations lower to
    # less MXU-friendly code than the wide batched JVP sweep.  "auto" is
    # therefore fwd; "rev" stays selectable for problems with much taller
    # stacks (many scenario objects/cones per stage).
    jac_mode = sqp_conf.get("jac_mode", "auto")
    if jac_mode == "auto":
        jac_mode = "fwd"
    if jac_mode not in ("fwd", "rev"):
        raise ValueError(f"sqp.jac_mode must be auto|fwd|rev, got {jac_mode!r}")

    # Solver precision floor, conditioned on the problem data (see
    # OCP.precision_floor): arrangements with light objects get the f32
    # floor on the solver's stage-Jacobian / Riccati / merit phases — at
    # "high" (3-pass bf16) the rounding noise on the 1/m-scaled constraint
    # stack ratchets the 0.02 kg stacked dice off the tray and winds up
    # the 0.18 kg frictionless arch + obstacle-course duals (eq_viol 24.5)
    # over a closed-loop run (measured on v5e, round 5), while every
    # >= 0.2 kg arrangement (cups 0.2, bottle 0.83, ral25 box 1.0) holds
    # at "high" with full MXU throughput.  A uniform automatic rule, not
    # per-leaf tuning (tests/test_default_solver_config.py).
    precision_floor = "high"
    if model.params.shape[0] and float(np.asarray(model.params[:, 0]).min()) < 0.2:
        precision_floor = "highest"

    ocp = OCP(
        N=N, nx=dims.x, nu=dims.u, n_eq=n_eq, n_ineq=n_ineq, n_feq=n_feq,
        precision_floor=precision_floor,
        dynamics=dynamics, stage_cost=stage_cost, eq=eq, ineq=ineq,
        final_cost=final_cost, final_eq=final_eq,
        stage_residuals=stage_residuals, stage_quad=stage_quad,
        stage_quad_derivs=stage_quad_derivs,
        final_quad=final_quad,
        ineq_smooth=ineq_smooth, ineq_box=box_rows,
        # x = [q, v, a, obstacle states]: per-block Jacobian columns so the
        # v/a/obstacle columns skip the rotation-chain JVPs (see OCP).
        # Measured A/B (bench.py BENCH_XBLOCKS): +50% batched throughput on
        # CPU, but -15% on TPU, where one wide jacfwd keeps the MXU batch
        # dimension full — so "auto" picks by platform at build time.
        x_jac_blocks=(
            (nq, nq, nq) + ((9 * num_obstacles,) if num_obstacles else ())
            if _use_jac_col_blocks(sqp_conf)
            else None
        ),
        jac_mode=jac_mode,
        u_lb=u_lb, u_ub=u_ub,
        # The discrete dynamics are exactly linear (triple integrator +
        # constant-acceleration obstacles), so the solver may linearize once
        # and reuse A, B as loop-invariant constants (sqp.linear_dynamics).
        linear_dynamics=bool(sqp_conf.get("linear_dynamics", False)),
    )

    # -- initial state + target -----------------------------------------
    obs_states = []
    for d in dyn_obs:
        modes = d.get("modes", [])
        if modes:
            m0 = modes[0]
            obs_states.append(
                jnp.asarray(
                    np.concatenate(
                        [
                            np.asarray(m0.get("position", [0, 0, 0]), dtype=float),
                            np.asarray(m0.get("velocity", [0, 0, 0]), dtype=float),
                            np.asarray(m0.get("acceleration", [0, 0, 0]), dtype=float),
                        ]
                    )
                )
            )
        else:
            obs_states.append(jnp.zeros(9))
    x0 = jnp.concatenate([x0_robot] + obs_states) if obs_states else x0_robot
    # target waypoints relative to the initial EE pose (wrappers.py:13-75)
    from upright_tpu.core.math import rot_to_quat

    R0, r0 = robot.ee_pose(x0_robot[:nq])
    q0 = rot_to_quat(R0)
    waypoints = ctrl.get("waypoints", [{"time": 0.0}])
    target = TargetTrajectory.from_waypoints(waypoints, np.asarray(r0), np.asarray(q0))

    return UprightProblem(
        ocp=ocp, dims=dims, robot=robot, balance_model=model, dt=dt,
        x0=x0, xd=xd_robot, target=target, gravity=gravity, config=config,
        ineq_groups=ineq_groups,
        heal_jump_threshold=float(
            ctrl.get("mpc", {}).get("heal_jump_threshold", 0.2)
        ),
        force_scale=force_scale,
    )


def _build_collision_pairs(ctrl, robot, num_obstacles):
    """Robot collision spheres x (static spheres | dynamic obstacles | ground).

    The reference uses HPP-FCL distance pairs over URDF collision links
    (controller_interface.cpp:450-481, collision_links.urdf.xacro); our
    configs declare the spheres directly: each robot sphere is attached to a
    named chain frame with a local offset.
    """
    pairs = []
    obs_conf = ctrl.get("obstacles", {})
    robot_spheres = [
        (s["link"], jnp.asarray(np.asarray(s.get("offset", [0, 0, 0]), dtype=float)), float(s["radius"]))
        for s in obs_conf.get("collision_spheres", [])
    ]
    dyn = obs_conf.get("dynamic", [])
    ground = bool(obs_conf.get("ground", {}).get("enabled", False))
    ground_links = set(obs_conf.get("ground", {}).get("links", []))
    for sphere in robot_spheres:
        for obs in obs_conf.get("static_obstacles", []):
            pairs.append((sphere, (np.asarray(obs["position"], dtype=float), float(obs["radius"]))))
        for i, d in enumerate(dyn):
            pairs.append((sphere, ("dynamic", i, float(d.get("radius", 0.1)))))
        if ground and (not ground_links or sphere[0] in ground_links):
            pairs.append((sphere, "ground"))
    return pairs


def _projectile_closest_time(r, r0, v0, g, t_guess=0.0, iters=10):
    """Time at which a ballistic trajectory r0 + v0 t + g t^2/2 is closest to
    point r: Newton iterations on the cubic stationarity condition
    (projectile_path_constraint.h:12-44), jit-safe fixed iteration count."""
    dr = r - r0
    a = jnp.dot(g, g)
    b = 3.0 * jnp.dot(v0, g)
    c = 2.0 * (jnp.dot(v0, v0) - jnp.dot(dr, g))
    d = -2.0 * jnp.dot(dr, v0)

    def body(_, t):
        f = a * t**3 + b * t**2 + c * t + d
        df = 3 * a * t**2 + 2 * b * t + c
        return t - f / jnp.where(jnp.abs(df) > 1e-9, df, 1e-9)

    return jax.lax.fori_loop(0, iters, body, t_guess * jnp.ones(()))
