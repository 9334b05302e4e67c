"""uvipslam_tpu — TPU-native visual-inertial-pressure SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of U-VIP-SLAM
(reference: chintha/U-VIP-SLAM, C++/ROS). Not a port: state is fixed-shape
structure-of-arrays living in device memory, the per-frame loop is a jitted
functional step with XLA-fused pixel kernels, and batched multi-sequence
replay shards over a `jax.sharding.Mesh`.

Subpackages
-----------
core      : Lie groups (SO3/SE3/Sim3), NavState, IMU preintegration.
models    : sensor models (camera projection/distortion, IMU, pressure depth).
ops       : device compute kernels (pyramid, FAST, ORB/BRIEF, KLT, Hamming
            matching, RANSAC, triangulation, PnP, Horn/Sim3, CLAHE).
mapstate  : fixed-capacity keyframe / landmark tables, covisibility graph.
solver    : Gauss-Newton / LM engine with Schur complement; all factor graphs.
frontend  : tracking state machine, monocular initializer.
loop      : place recognition (BoW vocabulary tensor, haloc hash, DBSCAN
            clustering), Sim3 loop closure, essential-graph optimization.
parallel  : mesh construction, batched multi-stream replay via shard_map.
io        : dataset decoding (rosbag via native C++ helper), synthetic data,
            trajectory export, YAML config.
"""

__version__ = "0.1.0"
