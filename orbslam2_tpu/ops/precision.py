"""Matmul-precision policy: f32 solvers, bf16 hot path.

On TPU (and on jax>=0.9 CPU, which mirrors TPU semantics), DEFAULT matmul
precision rounds f32 operands to bfloat16 — one fast MXU pass, ~1e-3
relative noise per contraction. Two regimes in this codebase:

- **Tracking/extraction hot path**: bf16 noise is far below the pixel noise
  the pipeline is built to absorb (round-1 E2E accuracy was validated
  entirely at DEFAULT precision), and the pyramid-resize / moment / Hamming
  matmuls dominate the per-frame budget — 3x'ing them for precision nobody
  needs costs ~40% of end-to-end frame rate (measured: 2306 -> 1488 fps
  when a global float32 default was tried).
- **Solver stack** (bundle adjustment, pose graph, Sim3, EPnP): LM proposals
  accumulate through deep chains of small contractions; bf16 rounding there
  stalls the optimizer at a noise floor far above the true minimum
  (measured: stereo local BA converges to 0.11 pose error instead of 0.008).
  These trace under `f32_matmuls`, paying the 3-pass f32 emulation only
  where it changes answers.

The bit-exact exception: Hamming-distance dot products over {0,1} vectors
(ops/matching.py, ops/bow.py) pass an explicit `precision=DEFAULT` so they
stay single-pass even if a caller broadens the policy.
"""

from __future__ import annotations

import functools

import jax


def f32_matmuls(fn):
    """Trace `fn` under float32 matmul precision.

    Apply UNDER `jax.jit` (i.e. to the function jit wraps): the context
    manager only affects operations traced while it is active, and jit
    traces the wrapped callable on first call.
    """

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped
