#!/usr/bin/env python
"""Arrangement/model geometry helpers (reference upright_cmd/scripts/tools/
compute_box_arch_offsets.py, compute_wedge_dimensions.py,
load_pinocchio_model.py — folded into one CLI).

Subcommands:
  arch-offsets [--side-lengths LX LY LZ]
      x-offsets of the two standing pillars and the bridge block of the
      box-arch arrangement (blocks rotated 90deg about y stand on end).
  wedge-dims [--angle DEG] [--base X Y]
      wedge side_lengths for a desired slope angle.
  model-info --config CFG
      the loaded kinematic model: joints, dims, home EE pose (the
      load_pinocchio_model analogue for the JAX chain).

Usage: python scripts/arrangement_geometry.py arch-offsets
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def arch_offsets(side_lengths):
    """Pillar/bridge x-offsets (compute_box_arch_offsets.py:9-24): pillars
    are the block rotated 90deg about y (so dims permute x<->z), the bridge
    lies flat across both."""
    lx, ly, lz = side_lengths
    pillar_dims = np.array([lz, ly, lx])  # |Ry(90deg) @ l|
    bridge_dims = np.asarray(side_lengths)
    x1 = 0.5 * pillar_dims[0]
    x2 = bridge_dims[0] - 0.5 * pillar_dims[0]
    x3 = -0.5 * (bridge_dims[0] - pillar_dims[0])  # bridge rel. pillar 2
    return x1, x2, x3


def wedge_dims(angle_deg, base_x, base_y):
    return [base_x, base_y, base_x * np.tan(np.deg2rad(angle_deg))]


def model_info(config_path):
    import upright_tpu.config as cfg
    from upright_tpu.ocp.problem import build_problem

    config = cfg.load_config(config_path)
    prob = build_problem(config)
    chain = prob.robot.chain
    print(f"actuated joints ({prob.robot.nq}):")
    for name in chain.joint_names:
        print(f"  {name}")
    d = prob.dims
    print(f"dims: x={d.x} u={d.u} (robot x={d.robot_x}, u={d.robot_u}, "
          f"forces={d.f}), objects={d.num_objects}, contacts={d.num_contacts}")
    R, r = prob.robot.ee_pose(prob.x0[: prob.dims.robot_q])
    print(f"home EE position: {np.round(np.asarray(r), 4)}")
    print(f"home EE rotation:\n{np.round(np.asarray(R), 4)}")
    return prob


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    a = sub.add_parser("arch-offsets")
    a.add_argument("--side-lengths", nargs=3, type=float,
                   default=[0.103, 0.09, 0.038])
    w = sub.add_parser("wedge-dims")
    w.add_argument("--angle", type=float, default=15.0)
    w.add_argument("--base", nargs=2, type=float, default=[0.15, 0.15])
    m = sub.add_parser("model-info")
    m.add_argument("--config", required=True)
    args = ap.parse_args()

    if args.cmd == "arch-offsets":
        x1, x2, x3 = arch_offsets(args.side_lengths)
        print(f"x offset pillar 1 = {x1}")
        print(f"x offset pillar 2 = {x2}")
        print(f"x offset bridge (rel. pillar 2) = {x3}")
    elif args.cmd == "wedge-dims":
        print(f"side lengths = {wedge_dims(args.angle, *args.base)}")
    else:
        model_info(args.config)


if __name__ == "__main__":
    main()
