#!/usr/bin/env python
"""Post-hoc analysis of a saved run: solve times + object error statistics.

Equivalent of the reference's bag-analysis tooling
(upright_cmd/scripts/tools/compute_bag_obj_err_comp_time.py and
upright_ros_interface parse_mpc_solve_times / parse_object_error): instead of
a rosbag, the source is a DataLogger run directory (data npz + config.yaml
snapshot written by upright_tpu.core.logging.DataLogger.save).

Prints max/min/mean/std/p99 of the controller solve times and of the
per-object displacement error (object drift relative to its initial pose on
the tray), plus constraint-violation summaries when the run logged them.

Usage: python scripts/analyze_run.py <log_dir> [--max-time T] [--warmup K]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from upright_tpu.core.logging import DataLogger


def stats(label, values, unit):
    values = np.asarray(values, dtype=float).ravel()
    values = values[np.isfinite(values)]
    if values.size == 0:
        print(f"{label}: (no data)")
        return
    print(f"{label} [{unit}]")
    print(f"  max  = {values.max():.3f}")
    print(f"  min  = {values.min():.3f}")
    print(f"  mean = {values.mean():.3f}")
    print(f"  std  = {values.std():.3f}")
    print(f"  p99  = {np.percentile(values, 99):.3f}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("log_dir", help="DataLogger run directory")
    parser.add_argument(
        "--max-time", type=float, default=None,
        help="only consider samples with t <= max-time (seconds)",
    )
    parser.add_argument(
        "--warmup", type=int, default=1,
        help="drop the first K solve-time samples (jit compilation)",
    )
    args = parser.parse_args()

    data = DataLogger.load(args.log_dir)
    t = np.asarray(data.get("t", []), dtype=float).ravel()

    def windowed(arr):
        arr = np.asarray(arr, dtype=float)
        if args.max_time is not None and t.size == arr.shape[0]:
            return arr[t <= args.max_time]
        return arr

    if "solve_time" in data:
        st = windowed(data["solve_time"]).ravel() * 1e3
        stats("solve time", st[args.warmup :], "ms")
    else:
        print("solve time: (not logged)")

    print()
    if "object_displacement" in data:
        d = windowed(data["object_displacement"])
        if d.ndim == 1:
            d = d[:, None]
        for i in range(d.shape[1]):
            stats(f"object {i} displacement", d[:, i] * 1e3, "mm")
            print(f"  final = {d[-1, i] * 1e3:.3f}")
    else:
        print("object displacement: (not logged)")

    # constraint families the richer per-step logging records
    for key in sorted(data.keys()):
        if key.startswith("constraint_"):
            v = windowed(data[key])
            viol = np.maximum(0.0, -v) if "ineq" in key or "force" in key else np.abs(v)
            print(f"\n{key}: max violation = {viol.max():.3e}")


if __name__ == "__main__":
    main()
