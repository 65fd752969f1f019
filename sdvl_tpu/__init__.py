"""sdvl_tpu — a TPU-native semi-direct visual SLAM framework.

Brand-new JAX/XLA/Pallas re-design with the capabilities of SDVL
(JdeRobot/slam-SDVL, mounted read-only at /root/reference): monocular tracking
by sparse direct image alignment + per-patch feature alignment, FAST+ORB
features, homography bootstrap, Bayesian inverse-depth filters, covisibility
keyframe mapping, relocalization, and Schur-complement bundle adjustment —
as batched fixed-shape tensor programs over a `jax.sharding.Mesh`.

Layer map (mirrors SURVEY.md §7):
  core/      SE3 Lie ops, pinhole camera, multi-view geometry
  ops/       image pyramid, FAST/Shi-Tomasi, ORB, patch warp/score kernels
  solvers/   batched GN/LM/IRLS, inverse-compositional LK, RANSAC, Schur BA
  state/     fixed-capacity masked SoA stores (frames, keyframes, points)
  pipeline/  tracker FSM, depth-filter mapper, keyframe policy, relocalizer
  io/        dataset readers, synthetic fixtures, trajectory + ATE/RPE eval
  dist/      device mesh, sharded/distributed bundle adjustment
"""

__version__ = "0.1.0"
