"""Headline benchmark: tracking-step throughput per chip.

Runs the per-frame hot path exactly as the production tracker does — one
jitted ORB extraction (1000 features, 8 levels, 640x480) + one jitted
projection-gated match + motion-only LM program against 2048 map points
(SURVEY §3.2's hot loops 1-4) — streaming uint8 frames host->device,
pipelined dispatch, one sync at the end.

Baseline: the reference tracks at ~30 Hz (mean 22-35 ms/frame @1000
features) on an i7-4790 (BASELINE.md). vs_baseline = fps / 30.

Prints ONE JSON line.
"""

import json
import time

import numpy as np


def main():
    import os

    import jax
    import jax.numpy as jnp

    profile_dir = os.environ.get("SLAM_BENCH_PROFILE", "")

    from orbslam2_tpu.config import ExtractorConfig
    from orbslam2_tpu.models.camera import Camera
    from orbslam2_tpu.ops import orb
    from orbslam2_tpu.tracking import track_against_points

    H, W = 480, 640
    cfg = ExtractorConfig(n_features=1000, n_levels=8)
    extractor = orb.OrbExtractor(cfg, H, W)
    cam = Camera.create(fx=520.0, fy=520.0, cx=W / 2, cy=H / 2, width=W, height=H)
    P = 2048

    rng = np.random.default_rng(0)
    frames = [
        rng.integers(0, 256, size=(H, W)).astype(np.uint8) for _ in range(4)
    ]
    dev = jax.device_put
    mp_pos = np.concatenate(
        [rng.uniform(-2, 2, (P, 2)), rng.uniform(4, 9, (P, 1))], 1
    ).astype(np.float32)
    args = dict(
        mp_pos=dev(mp_pos),
        mp_desc=dev(rng.integers(0, 256, (P, 32)).astype(np.uint8)),
        mp_valid=dev(np.ones(P, bool)),
        mp_normal=dev(np.tile(np.float32([0, 0, -1]), (P, 1))),
        mp_dmin=dev(np.full(P, 0.5, np.float32)),
        mp_dmax=dev(np.full(P, 50.0, np.float32)),
    )
    Tcw = dev(np.eye(4, dtype=np.float32))
    kp_ur = dev(np.full(cfg.max_keypoints, -1.0, np.float32))

    cast = jax.jit(lambda x: x.astype(jnp.float32))

    def step(img_u8):
        feats = extractor._extract(cast(img_u8))
        opt, idx, valid, packed = track_against_points(
            cam, Tcw, args["mp_pos"], args["mp_desc"], args["mp_valid"],
            args["mp_normal"], args["mp_dmin"], args["mp_dmax"],
            feats.xy, feats.desc, feats.octave, feats.valid, kp_ur,
            jnp.float32(15.0), jnp.float32(cfg.scale_factor), cfg.n_levels,
        )
        return opt.Tcw, opt.n_inliers

    # Warmup / compile both programs.
    out = step(frames[0])
    jax.block_until_ready(out)

    n = 100
    if profile_dir:
        # SLAM_BENCH_PROFILE=<dir> captures an XLA trace of the measured loop
        # (SURVEY §5.1: the jax.profiler replaces the reference's chrono
        # timing prints)
        jax.profiler.start_trace(profile_dir)
    t0 = time.perf_counter()
    for i in range(n):
        out = step(frames[i % 4])
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    if profile_dir:
        jax.profiler.stop_trace()
    fps = n / dt

    print(
        json.dumps(
            {
                "metric": "tracking_fps_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 30.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
