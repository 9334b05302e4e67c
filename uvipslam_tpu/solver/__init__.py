"""Optimization backend: factors + Gauss-Newton/LM solvers.

From-scratch replacement for the reference's g2o usage
(reference: src/Optimizer.cc, src/IMU/g2otypes.{h,cpp},
Thirdparty/g2o). All graphs in the reference map to fixed-shape,
masked batched least-squares problems:

  - pose-only optimization (visual / visual-inertial with prior)
  - local window BA (Schur complement over landmarks)
  - gyro-bias init, pressure-scale init
  - Sim3 relative pose, essential-graph pose graph

Robustness is Huber IRLS; damping is Levenberg-Marquardt with
accept/reject via `jnp.where` (fixed iteration counts, no host syncs).
"""
