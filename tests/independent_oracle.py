"""Independent full-OCP transcription: UR10 + die balancing, in torch.

This module is the INDEPENDENT side of the correctness gate demanded by
VERDICT r2 item 1: it re-derives the whole optimal-control transcription
from the written spec with ZERO imports from upright_tpu —

  - UR10 forward kinematics from the official standard-DH table (the same
    independent source as tests/test_fk_oracle.py), with the thing tool /
    mount transforms taken from the URDF numbers,
  - EE frame velocity/acceleration via nested forward-mode autodiff on the
    curve q(t) = q + t v + t^2/2 a (torch.func.jvp — a different AD engine
    than JAX),
  - Newton-Euler balance of the die re-derived from first principles in
    the WORLD frame (the upright_tpu implementation works in the EE frame;
    the two agree through a frame rotation, which the tests exploit),
  - the exact triple-integrator discretization, quadratic + EE tracking
    costs, OCS2's quaternionDistance orientation error (re-implemented
    from its published formula), and the box limits.

Problem spec (mirrors a patched configs/demos/ur10_demo.yaml: custom
0.08 m / 0.5 kg die, frictionless, dt = 0.2, N = 10):
reference semantics per upright_control/src/controller_interface.cpp
(costs/constraints) and upright_core contact_constraints.h (balance rows).

Everything is float64.  scripts/gen_oracle_golden.py uses this module to
produce the committed golden artifact (SLSQP from scipy — an optimizer
upright_tpu never touches); tests/test_independent_oracle.py uses it for
pointwise physics equivalence and the KKT certificate of our solution.
"""

from __future__ import annotations

import numpy as np
import torch

torch.set_default_dtype(torch.float64)

# ---------------------------------------------------------------- spec
N = 10
DT = 0.2
NQ = 6
NC = 4
NU = NQ + NC
GRAVITY = np.array([0.0, 0.0, -9.81])

# UR10 standard DH rows (a, alpha, d) — official UR kinematics tables
DH = [
    (0.0, np.pi / 2, 0.1273),
    (-0.612, 0.0, 0.0),
    (-0.5723, 0.0, 0.0),
    (0.0, np.pi / 2, 0.163941),
    (0.0, -np.pi / 2, 0.1157),
    (0.0, 0.0, 0.0922),
]
BASE_XYZ = np.array([-1.0, 1.0, 0.0])
MOUNT_XYZ = np.array([0.27, 0.01, 0.653])
MOUNT_RPY = np.array([0.0, 0.0, np.pi])
TOOL_XYZ = np.array(
    [0.036712437868118286, -0.0004053786105941981, 0.308562308549881]
)
TOOL_RPY = np.array([1.083 * np.pi, -np.pi / 2, 0.0])

HOME = np.array([0.5, -0.25, 0.5, -0.25, 0.5, 0.417]) * np.pi

# die on the tray: mass, com (EE frame), inertia about the CoM (EE frame)
DIE_MASS = 0.5
DIE_SIDE = 0.08
DIE_COM = np.array([0.0, 0.0, DIE_SIDE / 2])
DIE_I = DIE_MASS / 12.0 * (2 * DIE_SIDE**2) * np.eye(3)
# contact corners on the tray top face (EE frame, z = 0), in the order the
# upright_tpu arrangement parser emits them (ordering is naming, not
# semantics — the tests assert the parsed geometry matches these values)
CONTACTS = np.array(
    [
        [+DIE_SIDE / 2, -DIE_SIDE / 2, 0.0],
        [+DIE_SIDE / 2, +DIE_SIDE / 2, 0.0],
        [-DIE_SIDE / 2, +DIE_SIDE / 2, 0.0],
        [-DIE_SIDE / 2, -DIE_SIDE / 2, 0.0],
    ]
)
NORMAL = np.array([0.0, 0.0, -1.0])  # into the first body of the pair (tray)

# weights (configs/robots/ur10.yaml / configs/controller.yaml).  The force
# regularizer acts on the MASS-SCALED forces f / m — the problem spec's
# force_weight semantics (upright_tpu/ocp/problem.py force_scale) — so per
# physical newton^2 the weight is force_weight / m^2.
F_SCALE = DIE_MASS
W_STATE = 0.01 * np.diag([0.0] * 6 + [10.0] * 6 + [1.0] * 6)
W_INPUT = np.diag([0.001] * 6 + [0.001 / F_SCALE**2] * NC)  # jerk + force_weight
W_EE_POS = np.eye(3)

JERK_LIM = 80.0
V_LIM = np.array([2.0, 2.0, 3.0, 3.0, 3.0, 3.0])
A_LIM = 10.0 * np.ones(6)
Q_LIM = 2 * np.pi * np.ones(6)
F_MAX = 100.0  # reference controller_interface.cpp force decision bound

WAYPOINT_OFFSET = np.array([-0.05, -0.05, 0.03])


def rpy_to_R(rpy):
    r, p, y = rpy
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def _fixed_transforms():
    T_pre = np.eye(4)
    T_pre[:3, 3] = BASE_XYZ
    T_mount = np.eye(4)
    T_mount[:3, :3] = rpy_to_R(MOUNT_RPY)
    T_mount[:3, 3] = MOUNT_XYZ
    T_tool = np.eye(4)
    T_tool[:3, :3] = rpy_to_R(TOOL_RPY)
    T_tool[:3, 3] = TOOL_XYZ
    return torch.tensor(T_pre @ T_mount), torch.tensor(T_tool)


T_PRE_T, T_TOOL_T = _fixed_transforms()
G_T = torch.tensor(GRAVITY)
DIE_COM_T = torch.tensor(DIE_COM)
DIE_I_T = torch.tensor(DIE_I)
CONTACTS_T = torch.tensor(CONTACTS)
NORMAL_T = torch.tensor(NORMAL)
W_STATE_T = torch.tensor(W_STATE)
W_INPUT_T = torch.tensor(W_INPUT)


def fk_flat(q):
    """Torch FK: q (6,) -> flat [R (9,), r (3,)] of the tray (EE) frame."""
    T = T_PRE_T
    for i, (a, alpha, d) in enumerate(DH):
        ct, st = torch.cos(q[i]), torch.sin(q[i])
        ca = torch.tensor(np.cos(alpha))
        sa = torch.tensor(np.sin(alpha))
        one = torch.ones(())
        zero = torch.zeros(())
        A = torch.stack(
            [
                torch.stack([ct, -st * ca, st * sa, a * ct]),
                torch.stack([st, ct * ca, -ct * sa, a * st]),
                torch.stack([zero, sa * one, ca * one, d * one]),
                torch.stack([zero, zero, zero, one]),
            ]
        )
        T = T @ A
    T = T @ T_TOOL_T
    return torch.cat([T[:3, :3].reshape(-1), T[:3, 3]])


def ee_motion(q, v, a):
    """EE pose + classical derivatives via nested forward-mode AD on the
    curve q(t) = q + t v + t^2/2 a: returns C, r, rdot, Cdot, rddot, Cddot."""
    t0 = torch.zeros(())

    def curve(t):
        return fk_flat(q + t * v + 0.5 * t * t * a)

    def first(t):
        return torch.func.jvp(curve, (t,), (torch.ones(()),))

    (val, dval), (_, ddval) = torch.func.jvp(first, (t0,), (torch.ones(()),))
    C = val[:9].reshape(3, 3)
    r = val[9:]
    Cd = dval[:9].reshape(3, 3)
    rd = dval[9:]
    Cdd = ddval[:9].reshape(3, 3)
    rdd = ddval[9:]
    return C, r, rd, Cd, rdd, Cdd


def vee(S):
    return torch.stack([S[2, 1], S[0, 2], S[1, 0]])


def rot_to_quat(C):
    """Rotation matrix -> quaternion [x, y, z, w], w >= 0 branch (torch)."""
    w = 0.5 * torch.sqrt(torch.clamp(1.0 + C[0, 0] + C[1, 1] + C[2, 2], min=1e-12))
    x = (C[2, 1] - C[1, 2]) / (4 * w)
    y = (C[0, 2] - C[2, 0]) / (4 * w)
    z = (C[1, 0] - C[0, 1]) / (4 * w)
    return torch.stack([x, y, z, w])


def quat_distance(q, qd):
    """OCS2's quaternionDistance: w_d*xyz - w*xyz_d - xyz_d x xyz, the
    imaginary part of the relative quaternion (published OCS2 formula,
    re-implemented here in torch)."""
    xyz, w = q[:3], q[3]
    xyz_d, w_d = qd[:3], qd[3]
    return w_d * xyz - w * xyz_d - torch.linalg.cross(xyz_d, xyz)


def newton_euler_residual(x, u):
    """6 balance rows at one stage, WORLD frame, mass-normalized.

    Newton about the die CoM and Euler about the CoM with the world-frame
    inertia I_w = C I C^T — an independent derivation; upright_tpu's rows
    (core/balance.py object_dynamics_constraints) are the same equations
    rotated into the EE frame and scaled by 1/sqrt(6).
    """
    q, v, a = x[:6], x[6:12], x[12:18]
    s = u[6:]
    C, r, rd, Cd, rdd, Cdd = ee_motion(q, v, a)

    # force on the die from contact i: -s_i * normal (the pair's force acts
    # positively on the first body = the tray)
    f_die_e = -(s[:, None] * NORMAL_T[None, :]).sum(dim=0)

    newton = DIE_MASS * (rdd + Cdd @ DIE_COM_T - G_T) - C @ f_die_e

    Sw = Cd @ C.T
    w = vee(Sw)
    Sal = Cdd @ C.T + Cd @ Cd.T
    al = vee(Sal)
    I_w = C @ DIE_I_T @ C.T
    tau = torch.zeros(3)
    for i in range(NC):
        arm = C @ (CONTACTS_T[i] - DIE_COM_T)
        tau = tau + torch.linalg.cross(arm, C @ (-s[i] * NORMAL_T))
    euler = I_w @ al + torch.linalg.cross(w, I_w @ w) - tau

    return torch.cat([newton, euler]) / DIE_MASS


def dyn_step(x, u):
    """Exact discrete triple-integrator step (jerk input)."""
    q, v, a = x[:6], x[6:12], x[12:18]
    j = u[:6]
    q1 = q + DT * v + 0.5 * DT**2 * a + DT**3 / 6.0 * j
    v1 = v + DT * a + 0.5 * DT**2 * j
    a1 = a + DT * j
    return torch.cat([q1, v1, a1])


X0 = torch.tensor(np.concatenate([HOME, np.zeros(12)]))
XD = X0.clone()

with torch.no_grad():
    _f0 = fk_flat(torch.tensor(HOME))
    R0_HOME = _f0[:9].reshape(3, 3).numpy()
    R_EE0 = _f0[9:].numpy()
RD = torch.tensor(R_EE0 + WAYPOINT_OFFSET)
QD_IDENTITY = torch.tensor([0.0, 0.0, 0.0, 1.0])


def rollout(Uflat):
    U = Uflat.reshape(N, NU)
    xs = [X0]
    for k in range(N):
        xs.append(dyn_step(xs[-1], U[k]))
    return torch.stack(xs), U


def stage_cost(x, u, w_orn=0.0, qd=QD_IDENTITY):
    """One stage of the objective: quadratic state/input + EE tracking."""
    dx = x - XD
    c = 0.5 * dx @ W_STATE_T @ dx + 0.5 * u @ W_INPUT_T @ u
    C, r, *_ = ee_motion(x[:6], x[6:12], x[12:18])
    e = r - RD
    c = c + 0.5 * e @ e
    if w_orn:
        eo = quat_distance(rot_to_quat(C), qd)
        c = c + 0.5 * w_orn * eo @ eo
    return c


def objective_t(Uflat, w_orn=0.0):
    X, U = rollout(Uflat)
    cost = torch.zeros(())
    for k in range(N):
        cost = cost + stage_cost(X[k], U[k], w_orn=w_orn)
    return cost


def eq_vec_t(Uflat, drop_stage0_constants=False):
    """All equality rows: per-stage Newton-Euler + terminal stationarity.

    drop_stage0_constants: at the fixed x0 only the normal-direction Newton
    row and the tangential Euler rows depend on the decision variables; the
    other three are constants (== 0 at rest).  SLSQP's LSQ subproblem
    rejects constant rows, so the golden generator drops them (the feasible
    set is unchanged); the KKT test keeps all rows.
    """
    X, U = rollout(Uflat)
    rows = []
    for k in range(N):
        r = newton_euler_residual(X[k], U[k])
        if k == 0 and drop_stage0_constants:
            assert float(torch.abs(r[torch.tensor([0, 1, 5])]).max()) < 1e-12
            r = r[torch.tensor([2, 3, 4])]
        rows.append(r)
    _, r, *_ = ee_motion(X[N][:6], X[N][6:12], X[N][12:18])
    rows.append(r - RD)
    rows.append(X[N][6:18])
    return torch.cat(rows)


def ineq_vec_t(Uflat):
    """State box rows, >= 0 feasible (input boxes are bounds on z)."""
    X, _ = rollout(Uflat)
    rows = []
    qlim = torch.tensor(Q_LIM)
    vlim = torch.tensor(V_LIM)
    alim = torch.tensor(A_LIM)
    for k in range(N):
        xr = X[k]
        rows += [
            xr[:6] + qlim, qlim - xr[:6],
            xr[6:12] + vlim, vlim - xr[6:12],
            xr[12:18] + alim, alim - xr[12:18],
        ]
    return torch.cat(rows)


def z_bounds():
    u_lo = np.concatenate([-JERK_LIM * np.ones(6), np.zeros(NC)])
    u_hi = np.concatenate([JERK_LIM * np.ones(6), F_MAX * np.ones(NC)])
    return np.tile(u_lo, N), np.tile(u_hi, N)


# ---------------------------------------------------------------------------
# frictional variant: 3-D contact forces + linearized Coulomb cones
# (reference contact_constraints.h:49-77; the ral23 "full" controller runs
# with frictionless: false).  u = [jerk(6), f_1..f_4 (3 each)], forces are
# the contact force ON THE TRAY (first body of the pair) in the EE frame.
# ---------------------------------------------------------------------------

NU_F = NQ + 3 * NC  # 18
MU_CONTACT = 0.5


def newton_euler_residual_frictional(x, u):
    q, v, a = x[:6], x[6:12], x[12:18]
    forces = u[6:].reshape(NC, 3)
    C, r, rd, Cd, rdd, Cdd = ee_motion(q, v, a)

    f_die_e = -forces.sum(dim=0)  # reaction on the die, EE frame
    newton = DIE_MASS * (rdd + Cdd @ DIE_COM_T - G_T) - C @ f_die_e

    Sw = Cd @ C.T
    w = vee(Sw)
    Sal = Cdd @ C.T + Cd @ Cd.T
    al = vee(Sal)
    I_w = C @ DIE_I_T @ C.T
    tau = torch.zeros(3)
    for i in range(NC):
        arm = C @ (CONTACTS_T[i] - DIE_COM_T)
        tau = tau + torch.linalg.cross(arm, C @ (-forces[i]))
    euler = I_w @ al + torch.linalg.cross(w, I_w @ w) - tau
    return torch.cat([newton, euler]) / DIE_MASS


def cone_rows_frictional(u, mu=MU_CONTACT):
    """Linearized friction cone, 5 rows per contact: f_n >= 0 and
    mu f_n +- f_x +- f_y >= 0 with f_n = n . f, n = [0, 0, -1].  Any
    orthonormal tangent basis yields the same row SET (the four sign
    combinations); the rows here use the (x, y) axes."""
    forces = u[6:].reshape(NC, 3)
    rows = []
    for i in range(NC):
        f = forces[i]
        f_n = NORMAL_T @ f
        rows.append(
            torch.stack(
                [
                    f_n,
                    mu * f_n - f[0] - f[1],
                    mu * f_n - f[0] + f[1],
                    mu * f_n + f[0] - f[1],
                    mu * f_n + f[0] + f[1],
                ]
            )
        )
    return torch.cat(rows)


def rollout_frictional(Uflat):
    U = Uflat.reshape(N, NU_F)
    xs = [X0]
    for k in range(N):
        xs.append(dyn_step(xs[-1], U[k]))
    return torch.stack(xs), U


def stage_cost_frictional(x, u):
    dx = x - XD
    W_u = torch.tensor(
        np.diag([0.001] * 6 + [0.001 / F_SCALE**2] * (3 * NC))
    )
    c = 0.5 * dx @ W_STATE_T @ dx + 0.5 * u @ W_u @ u
    _, r, *_ = ee_motion(x[:6], x[6:12], x[12:18])
    e = r - RD
    return c + 0.5 * e @ e


def objective_frictional_t(Uflat):
    X, U = rollout_frictional(Uflat)
    cost = torch.zeros(())
    for k in range(N):
        cost = cost + stage_cost_frictional(X[k], U[k])
    return cost


def eq_vec_frictional_t(Uflat):
    X, U = rollout_frictional(Uflat)
    rows = []
    for k in range(N):
        rows.append(newton_euler_residual_frictional(X[k], U[k]))
    _, r, *_ = ee_motion(X[N][:6], X[N][6:12], X[N][12:18])
    rows.append(r - RD)
    rows.append(X[N][6:18])
    return torch.cat(rows)


def ineq_vec_frictional_t(Uflat):
    """State boxes + the per-stage friction-cone rows."""
    X, U = rollout_frictional(Uflat)
    rows = []
    qlim = torch.tensor(Q_LIM)
    vlim = torch.tensor(V_LIM)
    alim = torch.tensor(A_LIM)
    for k in range(N):
        xr = X[k]
        rows += [
            cone_rows_frictional(U[k]),
            xr[:6] + qlim, qlim - xr[:6],
            xr[6:12] + vlim, vlim - xr[6:12],
            xr[12:18] + alim, alim - xr[12:18],
        ]
    return torch.cat(rows)


def z_bounds_frictional():
    u_lo = np.concatenate([-JERK_LIM * np.ones(6), -F_MAX * np.ones(3 * NC)])
    u_hi = np.concatenate([JERK_LIM * np.ones(6), F_MAX * np.ones(3 * NC)])
    return np.tile(u_lo, N), np.tile(u_hi, N)


def np_fun(f, **kw):
    def fun(z):
        return f(torch.tensor(z), **kw).detach().numpy()

    def jac(z):
        return torch.func.jacrev(lambda t: f(t, **kw))(torch.tensor(z)).numpy()

    return fun, jac


def ocp_config_patch(config):
    """Patch a loaded ur10_demo config dict to this module's problem spec
    (custom die arrangement, dt = 0.2, N = 10, offset waypoint).  The test
    asserts the parsed geometry matches the module constants."""
    config["controller"]["objects"]["oracle_die"] = {
        "shape": "cuboid",
        "side_lengths": [DIE_SIDE] * 3,
        "mass": DIE_MASS,
    }
    config["controller"]["arrangements"]["oracle_die_arr"] = {
        "objects": [{"name": "die", "type": "oracle_die", "parent": "ee"}],
        "contacts": [{"first": "ee", "second": "die", "mu": 0.5}],
    }
    config["controller"]["balancing"]["arrangement"] = "oracle_die_arr"
    config["controller"]["sqp"] = dict(
        config["controller"].get("sqp", {}), dt=DT
    )
    config["controller"]["mpc"]["time_horizon"] = N * DT
    config["controller"]["waypoints"] = [
        {
            "time": 0.0,
            "position": WAYPOINT_OFFSET.tolist(),
            "orientation": [0, 0, 0, 1],
        }
    ]
    return config


# ---------------------------------------------------------------------------
# flagship variant (VERDICT r3 weak #5): the benchmark operating point —
# omnidirectional Thing base (PX/PY/RZ planar composite + the UR10 arm,
# reference util.h:16-66 base joints), pink-bottle arrangement with
# frictional 3-D contact forces, static sphere-course obstacle rows
# (controller_interface.cpp:450-481 semantics), N = 20 @ dt = 0.1 s —
# the operating point of configs/demos/thing_demo.yaml + the ral23
# static_obstacles course (upright_cmd/config/controller.yaml:13,55).
# u = [jerk(9), f_1..f_4 (3 each)], forces ON THE TRAY in the EE frame.
# ---------------------------------------------------------------------------

FN = 20
FDT = 0.1
FNQ = 9
FNC = 4
FNU = FNQ + 3 * FNC  # 21

# pink bottle (configs/objects.yaml; cylinder inertia from first principles)
BOTTLE_MASS = 0.827
BOTTLE_R = 0.035
BOTTLE_H = 0.255
BOTTLE_COM = np.array([0.035, -0.035, BOTTLE_H / 2])
_ixx = BOTTLE_MASS * (3 * BOTTLE_R**2 + BOTTLE_H**2) / 12.0
BOTTLE_I = np.diag([_ixx, _ixx, BOTTLE_MASS * BOTTLE_R**2 / 2.0])
MU_B = 0.26 - 0.026  # contact mu minus mu_margin (arrangement pink_bottle)
# cylinder-on-tray contact patch: the inscribed rotated square at radius r,
# inset 0.005 toward the centroid on the object side (parsing.py:223-251 +
# :196-212 inset semantics); order +x, +y, -x, -y about the bottle center
_inset_r = BOTTLE_R - 0.005
CONTACTS_B = np.array(
    [
        [BOTTLE_COM[0] + _inset_r, BOTTLE_COM[1], 0.0],
        [BOTTLE_COM[0], BOTTLE_COM[1] + _inset_r, 0.0],
        [BOTTLE_COM[0] - _inset_r, BOTTLE_COM[1], 0.0],
        [BOTTLE_COM[0], BOTTLE_COM[1] - _inset_r, 0.0],
    ]
)

FLAG_HOME = np.concatenate(
    [[-1.0, 1.0, 0.0], np.array([0.5, -0.25, 0.5, -0.25, 0.5, 0.417]) * np.pi]
)
# thing.yaml limits
FQ_LIM = np.concatenate([[10.0, 10.0, 10.0], 2 * np.pi * np.ones(6)])
FV_LIM = np.array([1.1, 1.1, 2.0, 2.0, 2.0, 3.0, 3.0, 3.0, 3.0])
FA_LIM = np.concatenate([[2.5, 2.5, 1.0], 10.0 * np.ones(6)])
FJERK_LIM = np.concatenate([[20.0, 20.0, 20.0], 80.0 * np.ones(6)])
FW_STATE = 0.01 * np.diag([0.0] * 9 + [10.0] * 9 + [1.0] * 9)
F_SCALE_B = BOTTLE_MASS  # mass-scaled force variables (problem.py)
FW_INPUT = np.diag([0.001] * 9 + [0.001 / F_SCALE_B**2] * (3 * FNC))
# Relative EE waypoint: reachable WITH the terminal stop inside the 2 s
# horizon (the ral23 point1 target is 2.24 m away — infeasible against the
# 1.1 m/s base velocity bound + stationarity, so no KKT point exists
# there; obstacle-grazing targets also fail to converge a cold solve).
# The sphere course still contributes 18 verified rows per stage.
FLAG_WAYPOINT = np.array([-0.8, 0.4, 0.1])

# static sphere course (configs/obstacles/static_course.yaml controller side)
OBS_SPHERES = np.array(
    [
        [0.0, 0.25, 0.25], [0.0, 0.25, 0.50], [0.0, 0.25, 0.75],
        [1.5, 1.00, 0.25], [1.5, 1.00, 0.50], [1.5, 1.00, 0.75],
        [-0.4, 2.9, 0.25], [-0.4, 2.9, 0.50], [-0.4, 2.9, 0.75],
    ]
)
OBS_R = 0.25
EE_SPHERE_OFF = np.array([0.0, 0.0, 0.07])
EE_SPHERE_R = 0.25
BASE_SPHERE_OFF = np.array([0.0, 0.0, 0.25])  # along base z: yaw-invariant
BASE_SPHERE_R = 0.5
MIN_DIST = 0.1

_T_MOUNT = np.eye(4)
_T_MOUNT[:3, :3] = rpy_to_R(MOUNT_RPY)
_T_MOUNT[:3, 3] = MOUNT_XYZ
T_MOUNT_T = torch.tensor(_T_MOUNT)
BOTTLE_COM_T = torch.tensor(BOTTLE_COM)
BOTTLE_I_T = torch.tensor(BOTTLE_I)
CONTACTS_B_T = torch.tensor(CONTACTS_B)
FW_STATE_T = torch.tensor(FW_STATE)
FW_INPUT_T = torch.tensor(FW_INPUT)
OBS_SPHERES_T = torch.tensor(OBS_SPHERES)


def fk_flag(q):
    """Torch FK of the Thing: planar composite base (PX, PY, RZ) -> arm
    mount -> UR10 DH chain -> tool.  q (9,) -> flat [R (9,), r (3,)]."""
    cy, sy = torch.cos(q[2]), torch.sin(q[2])
    one = torch.ones(())
    zero = torch.zeros(())
    T = torch.stack(
        [
            torch.stack([cy, -sy, zero, q[0]]),
            torch.stack([sy, cy, zero, q[1]]),
            torch.stack([zero, zero, one, zero]),
            torch.stack([zero, zero, zero, one]),
        ]
    )
    T = T @ T_MOUNT_T
    for i, (a, alpha, d) in enumerate(DH):
        ct, st = torch.cos(q[3 + i]), torch.sin(q[3 + i])
        ca = torch.tensor(np.cos(alpha))
        sa = torch.tensor(np.sin(alpha))
        A = torch.stack(
            [
                torch.stack([ct, -st * ca, st * sa, a * ct]),
                torch.stack([st, ct * ca, -ct * sa, a * st]),
                torch.stack([zero, sa * one, ca * one, d * one]),
                torch.stack([zero, zero, zero, one]),
            ]
        )
        T = T @ A
    T = T @ T_TOOL_T
    return torch.cat([T[:3, :3].reshape(-1), T[:3, 3]])


def ee_motion_flag(q, v, a):
    """EE pose + classical derivatives for the Thing (nested JVP)."""
    t0 = torch.zeros(())

    def curve(t):
        return fk_flag(q + t * v + 0.5 * t * t * a)

    def first(t):
        return torch.func.jvp(curve, (t,), (torch.ones(()),))

    (val, dval), (_, ddval) = torch.func.jvp(first, (t0,), (torch.ones(()),))
    C = val[:9].reshape(3, 3)
    r = val[9:]
    Cd = dval[:9].reshape(3, 3)
    rd = dval[9:]
    Cdd = ddval[:9].reshape(3, 3)
    rdd = ddval[9:]
    return C, r, rd, Cd, rdd, Cdd


def dyn_step_flag(x, u):
    q, v, a = x[:9], x[9:18], x[18:27]
    j = u[:9]
    q1 = q + FDT * v + 0.5 * FDT**2 * a + FDT**3 / 6.0 * j
    v1 = v + FDT * a + 0.5 * FDT**2 * j
    a1 = a + FDT * j
    return torch.cat([q1, v1, a1])


def newton_euler_flagship(x, u):
    """6 balance rows, world frame, mass-normalized (as the UR10 variants:
    upright_tpu's rows are the EE-frame rotation scaled by 1/sqrt(6))."""
    q, v, a = x[:9], x[9:18], x[18:27]
    forces = u[9:].reshape(FNC, 3)
    C, r, rd, Cd, rdd, Cdd = ee_motion_flag(q, v, a)

    f_obj_e = -forces.sum(dim=0)
    newton = BOTTLE_MASS * (rdd + Cdd @ BOTTLE_COM_T - G_T) - C @ f_obj_e

    Sw = Cd @ C.T
    w = vee(Sw)
    Sal = Cdd @ C.T + Cd @ Cd.T
    al = vee(Sal)
    I_w = C @ BOTTLE_I_T @ C.T
    tau = torch.zeros(3)
    for i in range(FNC):
        arm = C @ (CONTACTS_B_T[i] - BOTTLE_COM_T)
        tau = tau + torch.linalg.cross(arm, C @ (-forces[i]))
    euler = I_w @ al + torch.linalg.cross(w, I_w @ w) - tau
    return torch.cat([newton, euler]) / BOTTLE_MASS


def cone_rows_flagship(u, mu=MU_B):
    forces = u[9:].reshape(FNC, 3)
    rows = []
    for i in range(FNC):
        f = forces[i]
        f_n = NORMAL_T @ f
        rows.append(
            torch.stack(
                [
                    f_n,
                    mu * f_n - f[0] - f[1],
                    mu * f_n - f[0] + f[1],
                    mu * f_n + f[0] - f[1],
                    mu * f_n + f[0] + f[1],
                ]
            )
        )
    return torch.cat(rows)


def obstacle_rows_flagship(x):
    """Sphere-sphere distance rows vs the static course: the EE-attached
    balanced-object sphere and the base sphere against all 9 pillars
    (|c_robot - c_obs| - (r_a + r_b + min_dist) >= 0)."""
    q = x[:9]
    C, r, *_ = ee_motion_flag(q, torch.zeros(9), torch.zeros(9))
    c_ee = r + C @ torch.tensor(EE_SPHERE_OFF)
    c_base = torch.stack([q[0], q[1], torch.tensor(BASE_SPHERE_OFF[2])])
    rows = []
    for c_rob, r_rob in ((c_ee, EE_SPHERE_R), (c_base, BASE_SPHERE_R)):
        d = torch.linalg.norm(OBS_SPHERES_T - c_rob[None, :], dim=1)
        rows.append(d - (r_rob + OBS_R + MIN_DIST))
    return torch.cat(rows)


def rollout_flagship(Uflat):
    U = Uflat.reshape(FN, FNU)
    xs = [X0_FLAG]
    for k in range(FN):
        xs.append(dyn_step_flag(xs[-1], U[k]))
    return torch.stack(xs), U


def stage_cost_flagship(x, u):
    dx = x - X0_FLAG
    c = 0.5 * dx @ FW_STATE_T @ dx + 0.5 * u @ FW_INPUT_T @ u
    _, r, *_ = ee_motion_flag(x[:9], x[9:18], x[18:27])
    e = r - RD_FLAG
    return c + 0.5 * e @ e


def objective_flagship_t(Uflat):
    X, U = rollout_flagship(Uflat)
    cost = torch.zeros(())
    for k in range(FN):
        cost = cost + stage_cost_flagship(X[k], U[k])
    return cost


def eq_vec_flagship_t(Uflat):
    X, U = rollout_flagship(Uflat)
    rows = []
    for k in range(FN):
        rows.append(newton_euler_flagship(X[k], U[k]))
    _, r, *_ = ee_motion_flag(X[FN][:9], X[FN][9:18], X[FN][18:27])
    rows.append(r - RD_FLAG)
    rows.append(X[FN][9:27])
    return torch.cat(rows)


def ineq_vec_flagship_t(Uflat):
    """Cone rows + state boxes + obstacle-distance rows per stage."""
    X, U = rollout_flagship(Uflat)
    rows = []
    qlim = torch.tensor(FQ_LIM)
    vlim = torch.tensor(FV_LIM)
    alim = torch.tensor(FA_LIM)
    for k in range(FN):
        xr = X[k]
        rows += [
            cone_rows_flagship(U[k]),
            xr[:9] + qlim, qlim - xr[:9],
            xr[9:18] + vlim, vlim - xr[9:18],
            xr[18:27] + alim, alim - xr[18:27],
            obstacle_rows_flagship(xr),
        ]
    return torch.cat(rows)


def z_bounds_flagship():
    u_lo = np.concatenate([-FJERK_LIM, -F_MAX * np.ones(3 * FNC)])
    u_hi = np.concatenate([FJERK_LIM, F_MAX * np.ones(3 * FNC)])
    return np.tile(u_lo, FN), np.tile(u_hi, FN)


X0_FLAG = torch.tensor(np.concatenate([FLAG_HOME, np.zeros(18)]))

with torch.no_grad():
    _ff = fk_flag(torch.tensor(FLAG_HOME))
    R0_FLAG = _ff[:9].reshape(3, 3).numpy()
    R_EE0_FLAG = _ff[9:].numpy()
RD_FLAG = torch.tensor(R_EE0_FLAG + FLAG_WAYPOINT)


def flagship_config_patch(config):
    """Patch a loaded thing_demo config dict to the flagship oracle spec:
    frictional pink bottle, static sphere course with the two
    oracle-modeled robot spheres (EE + base), point1 waypoint, N = 20."""
    config["controller"]["balancing"]["frictionless"] = False
    config["controller"]["sqp"] = dict(
        config["controller"].get("sqp", {}), dt=FDT
    )
    config["controller"]["mpc"]["time_horizon"] = FN * FDT
    config["controller"]["waypoints"] = [
        {
            "time": 0.0,
            "position": FLAG_WAYPOINT.tolist(),
            "orientation": [0, 0, 0, 1],
        }
    ]
    config["controller"]["obstacles"] = {
        "enabled": True,
        "minimum_distance": MIN_DIST,
        "collision_spheres": [
            {
                "name": "balanced_object",
                "link": "gripped_object_joint",
                "offset": EE_SPHERE_OFF.tolist(),
                "radius": EE_SPHERE_R,
            },
            {
                "name": "base",
                "link": "base_to_y_joint",
                "offset": BASE_SPHERE_OFF.tolist(),
                "radius": BASE_SPHERE_R,
            },
        ],
        "static_obstacles": [
            {"name": f"s{i}", "position": p.tolist(), "radius": OBS_R}
            for i, p in enumerate(OBS_SPHERES)
        ],
    }
    return config
