#!/usr/bin/env python
"""Join object tracking error with solve times across a directory of logged
runs (reference upright_cmd/scripts/tools/compute_bag_obj_err_comp_time.py,
re-based from rosbags onto DataLogger npz directories).

For every run directory under <root> containing data.npz, reports solve-time
statistics (max/mean/p99, ms) alongside the balanced-object displacement
(max/final, mm), as one table — the reference prints these per-bag; this
joins a whole experiment directory.

Usage: python scripts/obj_err_comp_time.py <root> [--plot out.png] [--csv out.csv]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from upright_tpu.core.logging import DataLogger


def analyze_run(run_dir):
    data = DataLogger.load(run_dir)
    out = {"run": Path(run_dir).name}
    if "solve_time" in data:
        st = np.asarray(data["solve_time"], dtype=float) * 1e3
        st = st[1:] if st.shape[0] > 1 else st  # drop the compile-heavy first
        out.update(
            solve_max_ms=float(st.max()),
            solve_mean_ms=float(st.mean()),
            solve_p99_ms=float(np.percentile(st, 99)),
        )
    if "object_displacement" in data:
        d = np.asarray(data["object_displacement"], dtype=float) * 1e3
        out.update(
            obj_err_max_mm=float(d.max()),
            obj_err_final_mm=float(np.atleast_1d(d[-1]).max()),
        )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--plot", default=None)
    ap.add_argument("--csv", default=None)
    args = ap.parse_args()

    runs = sorted(
        p.parent for p in Path(args.root).rglob("data.npz")
    )
    if not runs:
        sys.exit(f"no data.npz under {args.root}")
    rows = [analyze_run(r) for r in runs]

    cols = [
        "run", "solve_max_ms", "solve_mean_ms", "solve_p99_ms",
        "obj_err_max_mm", "obj_err_final_mm",
    ]
    widths = [max(len(c), 24 if c == "run" else 14) for c in cols]
    print("  ".join(c.ljust(w) for c, w in zip(cols, widths)))
    for r in rows:
        print(
            "  ".join(
                (
                    f"{r.get(c, float('nan')):.3f}"
                    if c != "run"
                    else str(r["run"])
                ).ljust(w)
                for c, w in zip(cols, widths)
            )
        )

    if args.csv:
        import csv

        with open(args.csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=cols)
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {args.csv}")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 5))
        xs = [r.get("solve_p99_ms", np.nan) for r in rows]
        ys = [r.get("obj_err_max_mm", np.nan) for r in rows]
        ax.scatter(xs, ys)
        for r, x, y in zip(rows, xs, ys):
            ax.annotate(r["run"], (x, y), fontsize=6)
        ax.set_xlabel("solve time p99 (ms)")
        ax.set_ylabel("max object error (mm)")
        ax.grid(alpha=0.3)
        fig.tight_layout()
        fig.savefig(args.plot, dpi=120)
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()
