#!/usr/bin/env python
"""Object inertial calibration tools (reference upright_cmd/scripts/tools/
compute_wedge_inertia.py + the Vicon-era calibration workflow, re-based on
logged data instead of hardware).

Two modes:

  --wedge HX HY HZ [--mass M]
      The reference's wedge-inertia computation: print the closed-form
      inertia tensor (core.math.wedge_inertia_matrix) AND an independent
      Monte-Carlo volume integration of the same tensor, with their
      agreement — the numeric check replaces the reference's sympy
      derivation (compute_wedge_inertia.py).

  <log_dir> [--config cfg.yaml]
      Fit the balanced object's inertial parameters from a logged run: the
      Newton-Euler equations are LINEAR in theta = (m, m*c, vech(I_O))
      (the classical single-body regressor, moments about the EE-frame
      origin O), so the logged EE motion + contact-force trajectory give a
      least-squares estimate of mass / CoM / inertia, reported against the
      config's nominal values.  On hardware the forces would come from
      sensors; from a sim log the controller's force decision variables
      (which satisfy the balance equalities at the solution) play that role.

Usage:
  python scripts/calibrate_inertia.py --wedge 0.18 0.206 0.076
  python scripts/calibrate_inertia.py logs/<run_dir>
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def wedge_mode(hx, hy, hz, mass):
    from upright_tpu.core.math import wedge_inertia_matrix

    D, C = wedge_inertia_matrix(mass, [hx, hy, hz])
    J_closed = C @ D @ C.T

    # independent Monte-Carlo integration over the wedge volume: the wedge
    # spans the triangle x in [-a, a*(1 - z'/az)] with the same centroid
    # convention as the closed form (centroid at the origin)
    rng = np.random.default_rng(0)
    n = 400_000
    # sample the bounding box of the right triangle in (x, z), reject
    hx2, hy2, hz2 = hx / 2, hy / 2, hz / 2
    pts = rng.uniform(
        [-hx2, -hy2, -hz2], [hx2, hy2, hz2], size=(n, 3)
    )
    # wedge: below the hypotenuse plane from (-hx2, +hz2) to (+hx2, -hz2)
    keep = pts[:, 2] <= -pts[:, 0] * hz / hx
    P = pts[keep]
    P = P - P.mean(axis=0)  # about the centroid
    r2 = np.sum(P * P, axis=1)
    J_mc = mass * (
        np.mean(r2)[None, None] * np.eye(3)
        - (P.T @ P) / P.shape[0]
    )
    err = np.abs(J_mc - J_closed).max() / np.abs(J_closed).max()
    print("closed form (about CoM, object frame):")
    print(np.array2string(J_closed, precision=6))
    print("Monte-Carlo volume integral:")
    print(np.array2string(J_mc, precision=6))
    print(f"relative agreement: {err:.1%} (MC, ~{P.shape[0]} samples)")
    return J_closed, J_mc


def _vech_to_mat(v):
    return np.array(
        [[v[0], v[1], v[2]], [v[1], v[3], v[4]], [v[2], v[4], v[5]]]
    )


def _mat_rows_for_sample(a_o, w, al, g_e, tau_o, f_sum):
    """One sample's regressor rows: [f; tau_O] = Y(motion) @ theta,
    theta = [m, m*cx, m*cy, m*cz, Ixx, Ixy, Ixz, Iyy, Iyz, Izz] with I
    about the EE origin O, all quantities in the EE frame."""

    def skew(v):
        return np.array(
            [[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]]
        )

    S_w, S_al = skew(w), skew(al)
    # Newton: m*(a_o - g) + (al x + w x (w x)) (m c) = f_sum
    Y_f = np.concatenate(
        [(a_o - g_e)[:, None], S_al + S_w @ S_w], axis=1
    )
    Y_f = np.concatenate([Y_f, np.zeros((3, 6))], axis=1)
    # Euler about O: (m c) x (a_o - g) + I_O al + w x (I_O w) = tau_O
    E = np.zeros((3, 6))
    for k in range(6):
        v = np.zeros(6)
        v[k] = 1.0
        I = _vech_to_mat(v)
        E[:, k] = I @ al + np.cross(w, I @ w)
    Y_tau = np.concatenate(
        [np.zeros((3, 1)), -skew(a_o - g_e), E], axis=1
    )
    Y = np.concatenate([Y_f, Y_tau], axis=0)
    b = np.concatenate([f_sum, tau_o])
    return Y, b


def fit_mode(log_dir, config_path=None):
    import upright_tpu.config as cfg
    from upright_tpu.core.logging import DataLogger
    from upright_tpu.ocp.problem import build_problem

    data = DataLogger.load(log_dir)
    if config_path is None:
        config_path = Path(log_dir) / "config.yaml"
    import yaml

    with open(config_path) as f:
        config = yaml.safe_load(f)
    prob = build_problem(config)
    model = prob.balance_model
    assert model.num_objects == 1, "single-object calibration only"

    contacts = np.asarray(model.r1)  # EE frame contact points
    normal = np.asarray(model.normal)
    g_w = np.asarray(prob.gravity)

    x = np.asarray(data["x"], dtype=float)
    forces = np.asarray(data["contact_forces"], dtype=float)
    rows, rhs = [], []
    for k in range(x.shape[0]):
        ee = prob.robot.ee_state(x[k, : prob.dims.robot_x])
        C_ew = np.asarray(ee.C_we).T
        from upright_tpu.core.math import dC_dtt

        ddC = np.asarray(
            dC_dtt(ee.C_we, ee.w_ew_w, ee.alpha_ew_w)
        )
        w_e = C_ew @ np.asarray(ee.w_ew_w)
        al_e = C_ew @ np.asarray(ee.alpha_ew_w)
        a_o = C_ew @ np.asarray(ee.a_ew_w)  # EE origin acceleration, EE frame
        g_e = C_ew @ g_w
        # contact forces on the object (frictionless: -s_i * n_i), EE frame
        f_i = -forces[k][:, None] * normal
        f_sum = f_i.sum(axis=0)
        tau_o = np.cross(contacts, f_i).sum(axis=0)
        Y, b = _mat_rows_for_sample(a_o, w_e, al_e, g_e, tau_o, f_sum)
        rows.append(Y)
        rhs.append(b)
    Y = np.concatenate(rows)
    b = np.concatenate(rhs)
    theta, *_ = np.linalg.lstsq(Y, b, rcond=None)

    m = theta[0]
    c = theta[1:4] / m
    I_o = _vech_to_mat(theta[4:])
    I_com = I_o - m * ((c @ c) * np.eye(3) - np.outer(c, c))

    m_nom = float(model.params[0, 0])
    c_nom = np.asarray(model.params[0, 1:4]) / m_nom
    print(f"fitted mass: {m:.4f} kg (nominal {m_nom:.4f})")
    print(f"fitted CoM (EE frame): {np.round(c, 4)} (nominal {np.round(c_nom, 4)})")
    print("fitted inertia about CoM (EE frame):")
    print(np.array2string(I_com, precision=6))
    cond = np.linalg.cond(Y)
    print(f"regressor condition number: {cond:.1e} "
          f"({'well' if cond < 1e8 else 'poorly'} excited trajectory)")
    return m, c, I_com


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log_dir", nargs="?", default=None)
    ap.add_argument("--config", default=None)
    ap.add_argument("--wedge", nargs=3, type=float, default=None,
                    metavar=("HX", "HY", "HZ"))
    ap.add_argument("--mass", type=float, default=1.0)
    args = ap.parse_args()

    if args.wedge:
        wedge_mode(*args.wedge, mass=args.mass)
    elif args.log_dir:
        fit_mode(args.log_dir, args.config)
    else:
        ap.error("pass a log_dir or --wedge")


if __name__ == "__main__":
    main()
