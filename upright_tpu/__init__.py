"""upright_tpu: a TPU-native MPC engine for nonprehensile object transport.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
utiasDSL/upright (the "waiter's problem"): balance-aware model-predictive
control of a mobile manipulator carrying objects on a tray, with obstacle
avoidance and robust planning under inertial-parameter uncertainty.

Layer map (vs reference):
  core/        balance physics + geometry        (upright_core)
  config/      YAML config + arrangement parser  (upright_core.parsing)
  kinematics/  differentiable robot chain        (Pinocchio + CppAD codegen)
  ocp/         optimal-control problem assembly  (upright_control C++)
  solver/      AL-SQP + Riccati scan solver      (OCS2 SQP + HPIPM)
  sim/         JAX-native rigid-body simulation  (upright_sim / PyBullet)
  parallel/    batched + sharded MPC             (n/a: new capability)
  robust/      scenario-robust planning          (upright_robust)
  runtime/     planner/tracker runtime           (upright_ros_interface)
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Numerical-correctness default for TPU: XLA's default matmul precision
# feeds the MXU bfloat16 inputs (~3 significant digits), which silently
# breaks the Riccati backward for weakly-conditioned problems — e.g. the
# ral23 ablation configs (balancing off -> Quu ~ 1e-3*I) produce steps the
# line search rejects forever, so the solver no-ops with zero inputs while
# reporting finite costs.  Measured on v5e (aligned_bottle, the worst
# found): default bf16 = solver no-op; "high" (3-pass bf16) and "highest"
# (full f32) both reproduce the CPU/f64 solution to ~6 digits (eq_viol
# 0.6470557 vs 0.6470590 f64).  Throughput (bench.py, batch 512):
# default 35.8k, high 29.0k, highest 22.0k solves/s — "high" is the
# correctness/speed default; override per-call with
# jax.default_matmul_precision or globally via this env var.
_jax.config.update(
    "jax_default_matmul_precision",
    _os.environ.get("UPRIGHT_TPU_MATMUL_PRECISION", "high"),
)
