#!/usr/bin/env python
"""Projectile Kalman-filter tuning / playback tool.

Equivalent of the reference's projectile tooling
(upright_cmd/scripts/projectile/play_with_kalman_filter.py + playback_sim.py):
run the runtime ProjectileTracker over a position track — either a synthetic
throw or one loaded from an npz log — with CLI-tunable noise parameters, and
report estimation quality and flight-phase timing.  Use it to tune
process/measurement variances and the NIS gate before a live run.

A synthetic session simulates the full lifecycle the tracker must handle:
hold (stationary pre-throw) -> throw (ballistic flight) -> landed, with
Gaussian measurement noise and optional dropouts.

Usage:
  python scripts/projectile_playback.py                       # synthetic throw
  python scripts/projectile_playback.py --npz track.npz       # recorded track
  python scripts/projectile_playback.py --process-var 10 --plot out.png
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from upright_tpu.runtime.projectile import FlightPhase, ProjectileTracker


def synthetic_track(dt, hold=0.5, flight=1.2, r0=(2.0, 0.0, 0.8), v_throw=(-3.0, 0.0, 4.5)):
    """Hold-then-throw ballistic truth track: (times, positions, velocities)."""
    g = np.array([0.0, 0.0, -9.81])
    r0 = np.asarray(r0, dtype=float)
    v0 = np.asarray(v_throw, dtype=float)
    times = np.arange(0.0, hold + flight, dt)
    R, V = [], []
    for t in times:
        if t < hold:
            R.append(r0)
            V.append(np.zeros(3))
        else:
            tf = t - hold
            R.append(r0 + v0 * tf + 0.5 * g * tf**2)
            V.append(v0 + g * tf)
    return times, np.array(R), np.array(V)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--npz", default=None, help="npz with times + positions arrays")
    parser.add_argument("--dt", type=float, default=0.01)
    parser.add_argument("--noise", type=float, default=0.003, help="measurement noise std [m]")
    parser.add_argument("--dropout", type=float, default=0.0, help="measurement dropout prob")
    parser.add_argument("--process-var", type=float, default=100.0)
    parser.add_argument("--measurement-var", type=float, default=1e-6)
    parser.add_argument("--nis-gate", type=float, default=9.0)
    parser.add_argument("--activation-height", type=float, default=1.0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--plot", default=None, help="write a diagnostic png")
    args = parser.parse_args()

    rng = np.random.default_rng(args.seed)

    if args.npz:
        with np.load(args.npz) as f:
            times, R_true = np.asarray(f["times"]), np.asarray(f["positions"])
        V_true = np.gradient(R_true, times, axis=0)
        dt = float(np.median(np.diff(times)))
    else:
        dt = args.dt
        times, R_true, V_true = synthetic_track(dt)

    tracker = ProjectileTracker(
        dt=dt,
        activation_height=args.activation_height,
        process_variance=args.process_var,
        measurement_variance=args.measurement_var,
        nis_gate=args.nis_gate,
    )

    R_est, V_est, phases = [], [], []
    for r in R_true:
        if args.dropout > 0 and rng.random() < args.dropout:
            meas = None
        else:
            meas = r + rng.normal(scale=args.noise, size=3)
        state, _s = tracker.update(meas)
        R_est.append(state[:3])
        V_est.append(state[3:6])
        phases.append(tracker.phase)
    R_est, V_est = np.array(R_est), np.array(V_est)

    in_flight = np.array([p == FlightPhase.FLIGHT for p in phases])
    if in_flight.any():
        k0 = int(np.argmax(in_flight))
        # truth flight start: first sample where the true track moves
        moving = np.linalg.norm(V_true, axis=1) > 0.5
        k_true = int(np.argmax(moving)) if moving.any() else k0
        print(f"flight detected at t = {times[k0]:.3f} s "
              f"(latency {times[k0] - times[k_true]:+.3f} s)")
        pos_err = np.linalg.norm(R_est[in_flight] - R_true[in_flight], axis=1)
        vel_err = np.linalg.norm(V_est[in_flight] - V_true[in_flight], axis=1)
        print(f"in-flight position RMSE = {np.sqrt((pos_err**2).mean()) * 1e3:.2f} mm "
              f"(max {pos_err.max() * 1e3:.2f} mm)")
        print(f"in-flight velocity RMSE = {np.sqrt((vel_err**2).mean()):.3f} m/s "
              f"(max {vel_err.max():.3f} m/s)")
    else:
        print("tracker never entered FLIGHT phase")

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(3, 1, figsize=(8, 9), sharex=True)
        for i, lbl in enumerate("xyz"):
            axes[0].plot(times, R_true[:, i], "--", label=f"{lbl} true")
            axes[0].plot(times, R_est[:, i], label=f"{lbl} est")
        axes[0].set_ylabel("position [m]")
        axes[0].legend(ncol=3, fontsize=8)
        for i, lbl in enumerate("xyz"):
            axes[1].plot(times, V_true[:, i], "--")
            axes[1].plot(times, V_est[:, i])
        axes[1].set_ylabel("velocity [m/s]")
        axes[2].step(times, [p.value for p in phases])
        axes[2].set_ylabel("phase")
        axes[2].set_xlabel("t [s]")
        fig.savefig(args.plot, dpi=120, bbox_inches="tight")
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()
