"""One solver configuration for every arrangement (VERDICT r3 item 2).

The reference solves its whole config tree with a single HPIPM
configuration (upright_cmd/config/controller.yaml:55-67).  The mass-scaled
force variables (ocp/problem.py force_scale) give the AL solver the same
property: these tests pin that (a) no leaf carries per-arrangement solver
tuning, and (b) the mass extremes of the tree — the 0.02 kg foam dice
(historically the pathological case) and the 1 kg ral25 box — solve at the
DEFAULT ALConfig without divergence.
"""

import glob

import numpy as np
import pytest

import jax

import upright_tpu.config as cfg
from upright_tpu.ocp.problem import build_problem
from upright_tpu.solver.al import ALConfig, solve
from upright_tpu.solver.ocp import zeros_warm_start


def test_no_per_leaf_solver_tuning():
    """No ral23 leaf may override the AL penalties or SQP iteration count —
    the knobs that were hand-tuned per arrangement before the force
    scaling.  (The frictional family's shared dual-safeguarding block
    [warmstart_iterations/dual_update_every/dual_step] is a per-MODE
    setting, applied uniformly, and allowed.)"""
    for path in glob.glob("configs/ral23/**/*.yaml", recursive=True):
        text = open(path).read()
        assert "rho_eq" not in text, f"per-leaf rho tuning in {path}"
        assert "rho_ineq" not in text, f"per-leaf rho tuning in {path}"
        if "/simulations/" not in path:
            assert "sqp_iteration" not in text, (
                f"per-leaf iteration tuning in {path}"
            )


@pytest.mark.parametrize(
    "path",
    [
        # mass extremes x friction mode, incl. the historically-pathological
        # stacked 0.02 kg dice (frictional AND frictionless)
        "configs/ral23/freespace/full_dice_point1.yaml",
        "configs/ral23/freespace/robust_dice_point1.yaml",
        "configs/ral23/freespace/full_arch_point2.yaml",
        "configs/ral25/real/box2/box2_center_point1.yaml",
    ],
)
def test_default_config_solves_mass_extremes(path):
    """Cold 12-iteration solve at the DEFAULT ALConfig: finite everything,
    bounded gains, violations in the converging regime."""
    config = cfg.load_config(path)
    # ral25 leaves carry a 10 s horizon; solve the MPC-scale problem here
    prob = build_problem(config, N=20)
    al = ALConfig(iterations=12)  # all defaults
    sol = jax.jit(lambda p, x, s: solve(prob.ocp, al, p, x, s))(
        prob.stage_params(0.0), prob.x0, zeros_warm_start(prob.ocp, prob.x0)
    )
    for name in ("X", "U", "lam", "mu"):
        v = np.asarray(getattr(sol.state, name))
        assert np.isfinite(v).all(), f"{name} not finite for {path}"
    K = np.asarray(sol.K)
    assert np.isfinite(K).all(), f"K not finite for {path}"
    assert np.abs(K).max() < 1e4, f"Riccati gain blowup for {path}"
    assert float(sol.eq_viol) < 1.0, (path, float(sol.eq_viol))
