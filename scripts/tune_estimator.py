#!/usr/bin/env python
"""Tune the robot-state Kalman filter by replaying a logged run
(reference upright_cmd/scripts/tools/tune_robot_estimator.py, with the
rosbag source replaced by a DataLogger npz directory and the single
hand-tuned (Q, R) replaced by a grid sweep).

For each (process_variance, measurement_variance) pair the logged joint
positions are corrupted with measurement noise and replayed through
runtime.estimator.robot_kf (the same filter the tracker runs); the score is
velocity-estimate RMSE against the logged true state.  Prints the grid and
the best setting, and (optionally) renders the reference tool's
measured/estimated/integrated comparison plots for the winner.

Usage:
  python scripts/tune_estimator.py <log_dir> [--meas-std 0.001]
      [--proc-grid 0.1 1 10 100 1000] [--meas-grid 1e-4 1e-3 1e-2]
      [--plot out.png]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from upright_tpu.core.logging import DataLogger
from upright_tpu.runtime.estimator import robot_kf


def replay(ts, q_meas, us, nq, proc_var, meas_var, x0):
    kf = robot_kf(
        nq, dt=float(ts[1] - ts[0]), process_variance=proc_var,
        measurement_variance=meas_var, x0=x0, measure_velocity=False,
    )
    xs = [kf.x.copy()]
    for i in range(1, len(ts)):
        kf.A, kf.B = _abc(nq, float(ts[i] - ts[i - 1]))
        kf.predict(us[i, :nq])
        kf.correct(q_meas[i])
        xs.append(kf.x.copy())
    return np.asarray(xs)


def _abc(nq, dt):
    I = np.eye(nq)
    Z = np.zeros((nq, nq))
    A = np.block([[I, dt * I, 0.5 * dt**2 * I], [Z, I, dt * I], [Z, Z, I]])
    B = np.vstack([dt**3 / 6.0 * I, 0.5 * dt**2 * I, dt * I])
    return A, B


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log_dir")
    ap.add_argument("--meas-std", type=float, default=1e-3,
                    help="synthetic encoder noise added to logged positions")
    ap.add_argument("--proc-grid", nargs="*", type=float,
                    default=[0.1, 1.0, 10.0, 100.0, 1000.0])
    ap.add_argument("--meas-grid", nargs="*", type=float,
                    default=[1e-4, 1e-3, 1e-2])
    ap.add_argument("--plot", default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    data = DataLogger.load(args.log_dir)
    ts = np.asarray(data["t"], dtype=float)
    x = np.asarray(data["x"], dtype=float)
    u = np.asarray(data["u"], dtype=float)
    nq = u.shape[1] if "cmd_vel" not in data else data["cmd_vel"].shape[1]
    q_true, v_true = x[:, :nq], x[:, nq : 2 * nq]

    rng = np.random.default_rng(args.seed)
    q_meas = q_true + args.meas_std * rng.standard_normal(q_true.shape)
    x0 = np.concatenate([q_meas[0], np.zeros(2 * nq)])

    print(f"{'proc_var':>10} {'meas_var':>10} {'v RMSE':>12} {'q RMSE':>12}")
    best = None
    for pv in args.proc_grid:
        for mv in args.meas_grid:
            xs = replay(ts, q_meas, u, nq, pv, mv, x0)
            v_rmse = float(
                np.sqrt(np.mean((xs[:, nq : 2 * nq] - v_true) ** 2))
            )
            q_rmse = float(np.sqrt(np.mean((xs[:, :nq] - q_true) ** 2)))
            print(f"{pv:>10g} {mv:>10g} {v_rmse:>12.3e} {q_rmse:>12.3e}")
            if best is None or v_rmse < best[0]:
                best = (v_rmse, pv, mv, xs)
    v_rmse, pv, mv, xs = best
    print(
        f"best: process_variance={pv:g} measurement_variance={mv:g} "
        f"(velocity RMSE {v_rmse:.3e}) -> config keys "
        f"estimation.robot_process_variance / robot_measurement_variance"
    )

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(3, 1, figsize=(9, 9), sharex=True)
        for i in range(nq):
            axes[0].plot(ts, v_true[:, i], lw=1.0)
            axes[0].plot(ts, xs[:, nq + i], "--", lw=0.9)
            axes[1].plot(ts, v_true[:, i] - xs[:, nq + i], lw=0.9)
            axes[2].plot(ts, q_meas[:, i] - xs[:, i], lw=0.9)
        axes[0].set_title("true (solid) vs estimated (dashed) velocity")
        axes[1].set_title("velocity estimation error")
        axes[2].set_title("measured - estimated position")
        for ax in axes:
            ax.grid(alpha=0.3)
        fig.tight_layout()
        fig.savefig(args.plot, dpi=120)
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()
