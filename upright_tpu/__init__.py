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
