"""mpc_local_planner_tpu — a TPU-native batched MPC engine.

A brand-new JAX/XLA/Pallas framework with the capabilities of
``rst-tu-dortmund/mpc_local_planner`` (and its numeric engine
``control_box_rst``): SE(2) kinematic local planning with unicycle /
car-like (Ackermann) / kinematic-bicycle models, time-optimal and
quadratic-form objectives, finite-difference collocation and multiple
shooting transcription, and obstacle footprint-distance inequality
constraints — redesigned TPU-first: batched scenario ensembles, AD
Jacobians, an augmented-Lagrangian SQP with a block-tridiagonal /
Riccati KKT solve, and scenario sharding over device meshes.

Reference parity map (see SURVEY.md §2/§3):
  core/      <-> cbr:core        (time series, references, SO(2) math)
  systems/   <-> mpc_local_planner/systems + cbr:systems
  geometry/  <-> teb_local_planner obstacles + robot_footprint_model
  ocp/       <-> mpc_local_planner/optimal_control + cbr:optimal_control
  solvers/   <-> cbr:optimization (solvers) — SQP replaces IPOPT
  numerics/  <-> cbr:numerics
  ops/       <-> (new) Pallas TPU kernels for the KKT hot loop
  parallel/  <-> (new) mesh/sharding; reference has no distributed path
  controllers/ plants/ tasks/ <-> cbr:controllers/plants/tasks
  planner/   <-> mpc_local_planner_ros glue (ROS-free planner shell)
"""

__version__ = "0.1.0"

from mpc_local_planner_tpu.core import so2  # noqa: F401
