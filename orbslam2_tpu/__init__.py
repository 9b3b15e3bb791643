"""orbslam2_tpu — a TPU-native visual SLAM engine (ORB-SLAM2-class capabilities).

A from-scratch JAX/XLA/Pallas re-design of the feature-based SLAM system
described by the reference (SFXiang/ORB-SLAM2-Annotation, an annotated fork of
raulmur/ORB-SLAM2). The compute path is batched, statically-shaped, and
jit-compiled; the map is a pytree of fixed-capacity arrays instead of a
mutex-guarded pointer graph; RANSAC and bundle adjustment are batched kernels
instead of per-hypothesis loops; multi-chip scaling is expressed with
`jax.sharding` meshes and collectives instead of threads.

Layer map (mirrors SURVEY.md §1 of the reference):
  L5  examples/              CLI dataset runners (TUM / KITTI / EuRoC)
  L4  system.py              SlamSystem facade (track_monocular/stereo/rgbd, ...)
  L3  tracking.py, local_mapping.py, loop_closing.py   pipelined workloads
  L2  ops/                   batched algorithm kernels (extract, match, solve)
  L1  map/                   fixed-capacity array map state + covisibility
  L0  jax / XLA / pallas     (replaces OpenCV+Eigen+g2o+DBoW2)
"""

__version__ = "0.1.0"
