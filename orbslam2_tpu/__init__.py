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

# --- Matmul precision policy -----------------------------------------------
# bf16 (DEFAULT) matmuls for the tracking/extraction hot path, true float32
# for the solver stack (BA / pose graph / Sim3 / EPnP), where bf16 rounding
# stalls LM convergence at a ~1e-3 noise floor. The solver entry points trace
# under ops.precision.f32_matmuls; everything else keeps the fast single-pass
# MXU default. See ops/precision.py for the measured rationale. A global
# override remains available for experiments via ORBSLAM2_TPU_MATMUL_PRECISION.
import os as _os

import jax as _jax

_prec = _os.environ.get("ORBSLAM2_TPU_MATMUL_PRECISION", "")
if _prec:
    try:
        _jax.config.update("jax_default_matmul_precision", _prec)
    except Exception:  # future jax: config knob renamed — fail open
        pass

# --- Persistent compilation cache ------------------------------------------
# The system runs ~a dozen distinct jit programs whose shapes grow through
# capacity buckets (local-BA windows, GBA sizes, pose-graph buckets); each
# bucket transition is a fresh XLA compile (tens of seconds for the big BA
# programs). A persistent on-disk cache makes every bucket a one-time cost
# per machine instead of per process. Opt out with ORBSLAM2_TPU_COMPILE_CACHE=0.
#
# Skipped when the process forces the CPU backend (tests, CPU-only drives):
# XLA:CPU AOT cache entries embed compile-machine feature flags and reloading
# them warns about (and risks) SIGILL on feature drift, while CPU compiles of
# these programs are cheap anyway. TPU/accelerator runs keep the cache.
_force_cpu = _os.environ.get("JAX_PLATFORMS", "").strip() == "cpu"
if _os.environ.get("ORBSLAM2_TPU_COMPILE_CACHE", "1") != "0" and not _force_cpu:
    try:
        if _jax.config.jax_compilation_cache_dir is None:
            _jax.config.update(
                "jax_compilation_cache_dir",
                _os.environ.get(
                    "JAX_COMPILATION_CACHE_DIR",
                    _os.path.expanduser("~/.cache/orbslam2_tpu/xla"),
                ),
            )
            # cache EVERYTHING: on relay-attached hosts even a trivial eager
            # op costs ~0.4 s to compile (per-compile link round trips), and
            # dozens of such one-off ops run at startup — with the threshold
            # at 0 they become ~2-60 ms cache loads on every later process
            _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # cache is an optimization — never block import
        pass
