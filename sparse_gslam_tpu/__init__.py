"""sparse_gslam_tpu — a TPU-native 2D graph-SLAM engine for sparse sensing.

Built from scratch in JAX/XLA/Pallas, replicating the capabilities of the
sparse-gslam reference system (shiftlab-nanodrone/sparse-gslam, IROS 2022):

- line-segment feature extraction with full covariance propagation from
  sparse (4-60 beam) lidar multiscans          (ops.lines, ops.multicloud)
- landmark graph with chi^2-gated data association and incremental
  Levenberg-Marquardt solves                   (models.frontend, ops.solvers)
- submap construction + correlative scan-to-map loop-closure detection
  via batched multi-resolution matching        (ops.grid, ops.matching)
- pose-graph backend with DCS-robustified Gauss-Newton (ops.solvers,
  models.backend)
- keyframe-partitioned distributed solves over a jax.sharding.Mesh
  (parallel.dist_solver)

The reference is C++/ROS/g2o/Cartographer/Ceres; this is a ground-up
fixed-shape, functional, batched re-design for TPU. No reference code is
used; file:line citations in docstrings point at the behavior being
replicated for parity checking.
"""

__version__ = "0.1.0"
