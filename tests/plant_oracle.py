"""Independent contact-dynamics oracle for the JAX plant (VERDICT r4 item 4).

The reference validates its closed-loop claims against PyBullet's LCP
contact solver (reference upright_sim/src/upright_sim/simulation.py:546-684
— an independently-maintained ground truth).  upright_tpu's plant is a
penalty/anchor-spring model (`upright_tpu/sim/simulation.py`), so every
closed-loop claim would otherwise be judged by the code under test.  This
module is the equalizer: a *sequential-impulse* (projected Gauss-Seidel
velocity LCP with Baumgarte stabilization — the same algorithm family as
PyBullet/Bullet) rigid-body integrator written from scratch in numpy, with
deliberately different:

  - contact force model   (impulse LCP vs penalty springs),
  - friction model        (cone-projected impulses vs regularized/anchor),
  - integration scheme    (velocity solve + position integrate vs
                           semi-implicit force accumulation),
  - code idiom            (python loops over a contact list vs vmapped jax).

It consumes only the *data* of an arrangement (masses, inertias, contact
vertices, face geometry, friction coefficients — numbers out of
``UprightSimulation.specs``) and none of its code.  Agreement is gated at
the held / slid / tipped outcome level, not on mm trajectories — exactly
the classification the experiments measure.
"""

import numpy as np


def _skew(a):
    return np.array([
        [0.0, -a[2], a[1]],
        [a[2], 0.0, -a[0]],
        [-a[1], a[0], 0.0],
    ])


def _rot_exp(w, dt):
    """Rodrigues rotation for the incremental rotation exp([w dt]x)."""
    th = np.linalg.norm(w) * dt
    if th < 1e-12:
        return np.eye(3) + _skew(w) * dt
    axis = w / np.linalg.norm(w)
    K = _skew(axis)
    return np.eye(3) + np.sin(th) * K + (1.0 - np.cos(th)) * (K @ K)


def _quat_to_rot_xyzw(q):
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


class OracleBody:
    def __init__(self, mass, inertia_local, vertices_local, mu, surfaces,
                 r0, R0, fixture=False):
        self.m = float(mass)
        self.I_local = np.asarray(inertia_local, dtype=float)
        self.verts = np.asarray(vertices_local, dtype=float)  # rel CoM
        self.mu = float(mu)
        self.surfaces = surfaces  # list of (parent, point, normal, tangents,
        #                            half_extents, max_depth), parent frames
        self.fixture = bool(fixture)
        self.r = np.asarray(r0, dtype=float).copy()
        self.R = np.asarray(R0, dtype=float).copy()
        self.v = np.zeros(3)
        self.w = np.zeros(3)


class OracleWorld:
    """Sequential-impulse rigid-body world with a kinematic tray frame.

    ``tray_motion(t) -> (R_t, p_t, v_t, w_t)`` prescribes the tray; bodies
    interact with the tray surfaces (parent == -1) and with each other's
    faces (parent == j) through vertex-vs-face contacts.
    """

    def __init__(self, bodies, gravity=(0, 0, -9.81), beta=0.2,
                 slop=2e-4, pgs_iters=30, mu_map=None):
        self.bodies = bodies
        self.g = np.asarray(gravity, dtype=float)
        self.beta = float(beta)
        self.slop = float(slop)
        self.iters = int(pgs_iters)

    @classmethod
    def from_specs(cls, specs, ee_R, ee_p, gravity=(0, 0, -9.81), **kw):
        """Build from UprightSimulation.specs data (numbers only): initial
        poses are the nominal arrangement placed in the tray frame at
        (ee_R, ee_p)."""
        bodies = []
        for sp in specs:
            R0 = ee_R @ _quat_to_rot_xyzw(np.asarray(sp.q_init, float))
            r0 = np.asarray(ee_p) + ee_R @ np.asarray(sp.com_world_ee, float)
            surfaces = [
                (
                    int(s.parent),
                    np.asarray(s.point, float),
                    np.asarray(s.normal, float),
                    np.asarray(s.tangents, float),
                    np.asarray(s.half_extents, float),
                    float(s.max_depth),
                )
                for s in sp.surfaces
            ]
            bodies.append(
                OracleBody(sp.mass, sp.inertia_local, sp.vertices_local,
                           sp.mu, surfaces, r0, R0, fixture=sp.fixture)
            )
        return cls(bodies, gravity=gravity, **kw)

    # -- one step ---------------------------------------------------------

    def _detect(self, tray):
        """Vertex-vs-face contact list: (i, j, p_w, n_w, t1, t2, depth, mu).
        j == -1 means the kinematic tray."""
        R_t, p_t, v_t, w_t = tray
        contacts = []
        for i, b in enumerate(self.bodies):
            if b.fixture:
                continue
            verts_w = b.r + b.verts @ b.R.T  # (k, 3)
            for (parent, s_pt, s_n, s_T, s_he, s_md) in b.surfaces:
                if parent == -1:
                    R_p, p_p = R_t, p_t
                else:
                    pb = self.bodies[parent]
                    R_p, p_p = pb.R, pb.r
                n_w = R_p @ s_n
                o_w = p_p + R_p @ s_pt
                T_w = s_T @ R_p.T  # (2, 3) world tangents
                rel = verts_w - o_w
                depth = -rel @ n_w
                tc = rel @ T_w.T
                ok = (
                    (depth > -5e-4)
                    & (depth <= s_md)
                    & (np.abs(tc) <= s_he + 1e-3).all(axis=1)
                )
                for k in np.nonzero(ok)[0]:
                    contacts.append(
                        (i, parent, verts_w[k], n_w, T_w[0], T_w[1],
                         depth[k], b.mu)
                    )
        return contacts

    def _point_vel(self, j, p, tray):
        if j == -1:
            R_t, p_t, v_t, w_t = tray
            return v_t + np.cross(w_t, p - p_t)
        b = self.bodies[j]
        return b.v + np.cross(b.w, p - b.r)

    def step(self, dt, tray):
        # free velocities
        for b in self.bodies:
            if not b.fixture:
                b.v = b.v + dt * self.g

        # world-frame inverse inertias, fixed over the velocity solve
        I_inv = [
            None if b.fixture else
            np.linalg.inv(b.R @ b.I_local @ b.R.T)
            for b in self.bodies
        ]

        def apply_impulse(j, P, p):
            if j == -1:
                return
            b = self.bodies[j]
            if b.fixture:
                return
            b.v = b.v + P / b.m
            b.w = b.w + I_inv[j] @ np.cross(p - b.r, P)

        def eff_mass(i, j, p, d):
            out = 0.0
            for idx in (i, j):
                if idx == -1:
                    continue
                b = self.bodies[idx]
                if b.fixture:
                    continue
                rho = np.cross(p - b.r, d)
                out += 1.0 / b.m + rho @ I_inv[idx] @ rho
            return 1.0 / max(out, 1e-12)

        contacts = self._detect(tray)
        # cache per-contact effective masses (geometry-only, constant over
        # the PGS iterations) and accumulated impulses (normal, t1, t2)
        cache = [
            (
                eff_mass(i, j, p, n),
                eff_mass(i, j, p, t1),
                eff_mass(i, j, p, t2),
                (self.beta / dt) * max(depth - self.slop, 0.0),
            )
            for (i, j, p, n, t1, t2, depth, mu) in contacts
        ]
        lam = np.zeros((len(contacts), 3))
        for _ in range(self.iters):
            for c, (i, j, p, n, t1, t2, depth, mu) in enumerate(contacts):
                m_n, m_t1, m_t2, bias = cache[c]
                u = self._point_vel(i, p, tray) - self._point_vel(j, p, tray)
                # normal: drive separation velocity to the Baumgarte bias
                d_ln = m_n * (bias - u @ n)
                new_ln = max(lam[c, 0] + d_ln, 0.0)
                d_ln = new_ln - lam[c, 0]
                lam[c, 0] = new_ln
                P = d_ln * n
                apply_impulse(i, P, p)
                apply_impulse(j, -P, p)

                # friction: solve both tangents, then project onto the cone
                u = self._point_vel(i, p, tray) - self._point_vel(j, p, tray)
                lt = np.array([lam[c, 1], lam[c, 2]])
                d_lt = np.array([
                    -m_t1 * (u @ t1),
                    -m_t2 * (u @ t2),
                ])
                new_lt = lt + d_lt
                cap = mu * lam[c, 0]
                norm = np.linalg.norm(new_lt)
                if norm > cap:
                    new_lt = new_lt * (cap / max(norm, 1e-12))
                d_lt = new_lt - lt
                lam[c, 1:] = new_lt
                P = d_lt[0] * t1 + d_lt[1] * t2
                apply_impulse(i, P, p)
                apply_impulse(j, -P, p)

        # integrate poses
        for b in self.bodies:
            if b.fixture:
                continue
            b.r = b.r + dt * b.v
            b.R = _rot_exp(b.w, dt) @ b.R
            # re-orthonormalize (SVD projection)
            U, _, Vt = np.linalg.svd(b.R)
            b.R = U @ Vt

    def run(self, duration, dt, tray_motion):
        n = int(round(duration / dt))
        t = 0.0
        for _ in range(n):
            self.step(dt, tray_motion(t))
            t += dt
        return t


# -- outcome classification (shared protocol: tiny and purely geometric) ---


def classify(disp, tilt, hold_disp=0.02, slide_disp=0.04, tip_tilt=0.6):
    """held / slid / tipped / marginal from tray-frame displacement (m) and
    tilt (rad).  Scenarios in the tests are chosen far from the margins."""
    if tilt >= tip_tilt:
        return "tipped"
    if disp >= slide_disp:
        return "slid"
    if disp < hold_disp and tilt < 0.3:
        return "held"
    return "marginal"


def oracle_outcomes(world, tray, com_nom_ee, R_init):
    """Per-body (displacement, tilt, outcome) in the tray frame."""
    R_t, p_t, _, _ = tray
    out = []
    for b, nom, R0 in zip(world.bodies, com_nom_ee, R_init):
        if b.fixture:
            continue
        r_e = R_t.T @ (b.r - p_t)
        disp = float(np.linalg.norm(r_e - nom))
        z0 = R0 @ np.array([0.0, 0, 1])
        z1 = b.R @ np.array([0.0, 0, 1])
        tilt = float(np.arccos(np.clip(z0 @ z1, -1.0, 1.0)))
        out.append((disp, tilt, classify(disp, tilt)))
    return out
