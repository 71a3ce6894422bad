"""Density-realizable inertial-parameter sets (moment-SDP verification).

The reference's post-hoc verification (upright_robust process_sim_runs.py:
134-250) maximizes each CWC-face violation h@Y@theta over *density
realizable* parameter sets: theta = [m, h=mc, vech(I)] must be the moments
of SOME nonnegative mass density supported on the object's bounding box —
a tighter (more physical) uncertainty set than a plain CoM box.  The
reference builds this SDP in cvxpy/rigeo and solves with MOSEK; neither is
available here, and a per-face external solve would not batch anyway.

TPU-native re-design: the feasible set is encoded with the standard moment
conditions

  * pseudo-inertia PSD:  J(theta) = [[S, h], [h', m]] >= 0 with
    S = 0.5 tr(I) I3 - I  (the second-moment matrix  ∫ x x' dm),
  * box support (per axis i):      E[(x_i-l_i)(u_i-x_i)] >= 0,
  * box support (axis pairs i<j):  E[(x_i-l_i)^{+/-}(x_j-l_j)^{+/-}] >= 0
    for all four lower/upper combinations,
  * CoM box:  m l_c <= h <= m u_c,   mass fixed at m0,

and each linear objective is maximized by a ~60-line log-det barrier
interior-point method written directly in jax: damped Newton on
f_t(y) = -t mu.y - logdet J(y) - sum log(slacks), with a geometric t ramp.
The whole solve is jit-compiled and vmaps over faces x timesteps, so an
entire trajectory verifies in one batched device computation instead of
thousands of MOSEK calls.

Inertia about the EE origin; vech order (xx, xy, xz, yy, yz, zz) matching
verification.theta_from_body.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


# vech index pairs for the symmetric inertia matrix
_VECH = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]


def _inertia_from_vech(v):
    I = jnp.zeros((3, 3), dtype=v.dtype)
    for k, (i, j) in enumerate(_VECH):
        I = I.at[i, j].set(v[k])
        I = I.at[j, i].set(v[k])
    return I


def pseudo_inertia(theta):
    """J(theta) = [[0.5 tr(I) I3 - I, h], [h', m]] (4x4)."""
    m, h, v = theta[0], theta[1:4], theta[4:]
    I = _inertia_from_vech(v)
    S = 0.5 * jnp.trace(I) * jnp.eye(3, dtype=theta.dtype) - I
    top = jnp.concatenate([S, h[:, None]], axis=1)
    bot = jnp.concatenate([h, m[None]])[None, :]
    return jnp.concatenate([top, bot], axis=0)


@dataclasses.dataclass(frozen=True)
class RealizableSet:
    """Mass densities supported on an axis-aligned box with CoM in a box.

    lower/upper: support box corners in the EE frame (about the EE origin);
    com_lower/com_upper: CoM bounds; mass: fixed total mass.
    """

    lower: np.ndarray
    upper: np.ndarray
    com_lower: np.ndarray
    com_upper: np.ndarray
    mass: float

    def linear_rows(self):
        """(G, g) with G theta <= g encoding all linear moment/CoM rows.

        theta layout [m, h(3), vech(I)(6)].  S entries as functions of
        vech(I): S_ij = 0.5 tr(I) d_ij - I_ij.
        """
        l, u = np.asarray(self.lower, float), np.asarray(self.upper, float)

        def S_row(i, j):
            """Coefficients of S_ij w.r.t. vech(I)."""
            c = np.zeros(6)
            for k, (a, b) in enumerate(_VECH):
                tr = 1.0 if a == b else 0.0
                c[k] += 0.5 * tr * (1.0 if i == j else 0.0)
                if (a, b) == (min(i, j), max(i, j)):
                    c[k] -= 1.0
            return c

        rows, rhs = [], []

        def add(coef_m, coef_h, coef_S, bound):
            rows.append(np.concatenate([[coef_m], coef_h, coef_S]))
            rhs.append(bound)

        # per-axis: E[(x_i - l_i)(u_i - x_i)] >= 0
        #   => S_ii - (l_i + u_i) h_i + l_i u_i m <= 0
        for i in range(3):
            h_c = np.zeros(3)
            h_c[i] = -(l[i] + u[i])
            add(l[i] * u[i], h_c, S_row(i, i), 0.0)

        # axis pairs, all four lower/upper sign combinations:
        #   E[(x_i - a_i)(x_j - a_j)] >= 0  with a in {l, u} per axis,
        # sign +1 when both factors share orientation ((x-l)(x-l), (u-x)(u-x)),
        # -1 for mixed ((x-l)(u-x)).  Expanding E[(s_i x_i - s_i a_i)
        # (s_j x_j - s_j a_j)] >= 0 with s = +1 for (x-a), -1 for (a-x):
        #   s_i s_j S_ij - s_i s_j a_j h_i - s_i s_j a_i h_j
        #     + s_i s_j a_i a_j m >= 0
        for i in range(3):
            for j in range(i + 1, 3):
                for a_i, s_i in ((l[i], 1.0), (u[i], -1.0)):
                    for a_j, s_j in ((l[j], 1.0), (u[j], -1.0)):
                        s = s_i * s_j
                        h_c = np.zeros(3)
                        h_c[i] = s * a_j
                        h_c[j] = s * a_i
                        add(-s * a_i * a_j, h_c, [-s * c for c in S_row(i, j)], 0.0)

        # CoM box: m cl <= h <= m cu
        cl = np.asarray(self.com_lower, float)
        cu = np.asarray(self.com_upper, float)
        for i in range(3):
            h_c = np.zeros(3)
            h_c[i] = 1.0
            add(-cu[i], h_c, np.zeros(6), 0.0)  # h_i - m cu_i <= 0
            h_c = np.zeros(3)
            h_c[i] = -1.0
            add(cl[i], h_c, np.zeros(6), 0.0)  # m cl_i - h_i <= 0

        return np.asarray(rows), np.asarray(rhs)

    def feasible_start(self):
        """Strictly feasible theta: uniform density over a slightly shrunk
        support box, recentered on the CoM-box center."""
        l, u = np.asarray(self.lower, float), np.asarray(self.upper, float)
        c = 0.5 * (np.asarray(self.com_lower) + np.asarray(self.com_upper))
        half = 0.5 * (u - l)
        # shrink and center on c while staying inside the support box
        half_s = 0.45 * half
        center = np.clip(c, l + half_s + 1e-9, u - half_s - 1e-9)
        m = self.mass
        # uniform box: S = m (cc' + diag(half^2)/3)
        S = m * (np.outer(center, center) + np.diag(half_s**2) / 3.0)
        I = np.trace(S) * np.eye(3) - S  # inertia about origin
        vech = np.array([I[0, 0], I[0, 1], I[0, 2], I[1, 1], I[1, 2], I[2, 2]])
        return np.concatenate([[m], m * center, vech])


def _barrier_max(mu_y, G, g, y0, m0, t0=1.0, t_mult=8.0, outer=10, newton=12):
    """max mu_y . y  s.t.  G [m0; y] <= g,  J([m0; y]) >= 0, via a log-det
    barrier path.  y = theta[1:] (mass fixed).  Pure jax; jit/vmap-safe."""
    Gm = G[:, 0]  # mass column
    Gy = G[:, 1:]
    g_eff = g - Gm * m0

    def theta_of(y):
        return jnp.concatenate([jnp.array([m0], dtype=y.dtype), y])

    def phi(y):
        J = pseudo_inertia(theta_of(y))
        slack = g_eff - Gy @ y
        # logdet via cholesky; invalid (non-PSD) points produce nan which the
        # backtracking line search rejects
        L = jnp.linalg.cholesky(J)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
        return -logdet - jnp.sum(jnp.log(slack))

    def f(y, t):
        return -t * (mu_y @ y) + phi(y)

    grad_f = jax.grad(f)
    hess_f = jax.hessian(f)

    def newton_step(y, t):
        gr = grad_f(y, t)
        H = hess_f(y, t)
        H = H + 1e-9 * jnp.trace(H) * jnp.eye(y.shape[0], dtype=y.dtype)
        dy = -jnp.linalg.solve(H, gr)

        f0 = f(y, t)

        def body(carry, alpha):
            y_best, f_best = carry
            y_try = y + alpha * dy
            f_try = f(y_try, t)
            better = jnp.isfinite(f_try) & (f_try < f_best)
            return (
                jnp.where(better, y_try, y_best),
                jnp.where(better, f_try, f_best),
            ), ()

        alphas = jnp.asarray([1.0, 0.5, 0.25, 0.1, 0.03, 0.01])
        (y_new, _), _ = jax.lax.scan(body, (y, f0), alphas)
        return y_new

    def outer_body(carry, _):
        y, t = carry
        y = jax.lax.fori_loop(0, newton, lambda _, yy: newton_step(yy, t), y)
        return (y, t * t_mult), ()

    (y, _), _ = jax.lax.scan(outer_body, (y0, jnp.asarray(t0, dtype=y0.dtype)), None, length=outer)
    return mu_y @ y, y


def realizable_max_linear(mus, rset: RealizableSet):
    """Exact-mass worst case max_{theta in rset} mu . theta for a batch of
    objectives ``mus`` (k, 10).  Returns (values (k,), thetas (k, 10)).

    One jitted, vmapped barrier solve — the batched replacement for the
    reference's per-face MOSEK calls.
    """
    mus = jnp.atleast_2d(jnp.asarray(mus, dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32))
    G, g = rset.linear_rows()
    G = jnp.asarray(G, dtype=mus.dtype)
    g = jnp.asarray(g, dtype=mus.dtype)
    y0 = jnp.asarray(rset.feasible_start()[1:], dtype=mus.dtype)
    m0 = float(rset.mass)

    def solve_one(mu):
        val_y, y = _barrier_max(mu[1:], G, g, y0, m0)
        theta = jnp.concatenate([jnp.array([m0], dtype=mu.dtype), y])
        return mu[0] * m0 + val_y, theta

    vals, thetas = jax.jit(jax.vmap(solve_one))(mus)
    return np.asarray(vals), np.asarray(thetas)


def verify_plan_realizable(face_form_A, Y_list, rset: RealizableSet):
    """Worst-case face violation per planned state over the realizable set.

    face_form_A: (n_faces, 6) CWC face form; Y_list: (T, 6, 10) inertial
    regressors per state.  Returns (T,) max violations — the drop-in
    realizable-set counterpart of verification.verify_plan.
    """
    Y = np.asarray(Y_list)
    A = np.asarray(face_form_A)
    M = np.einsum("fw,twp->tfp", A, Y)  # (T, n_faces, 10)
    T, F, P = M.shape
    vals, _ = realizable_max_linear(M.reshape(T * F, P), rset)
    return vals.reshape(T, F).max(axis=1)
