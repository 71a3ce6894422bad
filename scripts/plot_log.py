#!/usr/bin/env python
"""Plot a saved simulation log (reference DataPlotter CLI usage).

Usage: python scripts/plot_log.py <log_dir> [--out plots.png]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from upright_tpu.core.logging import DataPlotter


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("log_dir")
    parser.add_argument("--out", default=None)
    parser.add_argument("--show", action="store_true")
    args = parser.parse_args()

    plotter = DataPlotter.from_log_dir(args.log_dir)
    plotter.plot_all(path=args.out or "plots.png", show=args.show)
    if not args.show:
        print(f"wrote {args.out or 'plots.png'}")


if __name__ == "__main__":
    main()
