"""Headline benchmark: tracking hot path + full-system fps + BA SOL account.

Measurements (SLAM_BENCH_MODE=hot|system|system_dispatch|ba|all, default all):

1. tracking_fps_per_chip — the per-frame hot path exactly as the production
   tracker dispatches it: one jitted ORB extraction (1000 features, 8
   levels, 640x480) + the fused track_frame_fused program (motion pass,
   conditional wide retry, local-map pass, tight pass — ONE dispatch, one
   packed D2H) against 4096 map points, streamed uint8 frames, pipelined.
   Reported as median/min/max over repeats (link weather is visible, not
   cherry-picked).
2. system_fps_per_chip — full SlamSystem (mapping + loop closing ON) over a
   rendered 640x480 RGB-D sequence, steady-state after warmup; median over
   N passes with the min/max spread reported. On relay-attached rigs this
   is bounded by the ~30 ms/RTT host<->device tax; on direct-attached
   hosts the per-frame cost is 2 kernel launches + one packed D2H.
   system_dispatch_fps_per_chip additionally runs the same loop with all
   frames pre-staged on device — no per-frame H2D — isolating the
   pipeline's code cost from link weather.
3. ba_iters_per_s (+ sol_pct, membw_pct) — LM iterations/s on the reference
   local-BA window (K=64, M=4096, O=8) AND at GBA scale (K=256, M=32768),
   with the XLA cost analysis supplying both the FLOPs and bytes-accessed
   numerators: sol_pct = achieved FLOP rate / chip peak
   (SLAM_TPU_PEAK_FLOPS, default 4.9e13 f32 for v5e); membw_pct = achieved
   HBM traffic / peak bandwidth (SLAM_TPU_PEAK_BW, default 8.1e11 B/s).
   Whichever is higher names the binding roofline.

Baseline: the reference tracks at ~30 Hz on an i7-4790 (BASELINE.md);
vs_baseline = hot-path fps / 30. Prints ONE JSON line.
"""

import json
import os
import statistics
import time

import numpy as np


def _spread(samples):
    s = sorted(samples)
    return {
        "median": round(statistics.median(s), 2),
        "min": round(s[0], 2),
        "max": round(s[-1], 2),
    }


def bench_hot_path(repeats=3):
    import jax
    import jax.numpy as jnp

    from orbslam2_tpu.config import ExtractorConfig
    from orbslam2_tpu.models.camera import Camera
    from orbslam2_tpu.ops import orb
    from orbslam2_tpu.tracking import track_frame_fused

    H, W = 480, 640
    cfg = ExtractorConfig(n_features=1000, n_levels=8)
    extractor = orb.OrbExtractor(cfg, H, W)
    cam = Camera.create(fx=520.0, fy=520.0, cx=W / 2, cy=H / 2, width=W, height=H)
    P = 4096

    rng = np.random.default_rng(0)
    # 32 DISTINCT frames, every result kept live: repeating a handful of
    # identical inputs lets a relay-attached backend elide work (results of
    # all but the last iteration are dead and can be cancelled), which
    # inflated earlier hot-path numbers
    frames = [
        rng.integers(0, 256, size=(H, W)).astype(np.uint8) for _ in range(32)
    ]
    dev = jax.device_put
    mp_pos = np.concatenate(
        [rng.uniform(-2, 2, (P, 2)), rng.uniform(4, 9, (P, 1))], 1
    ).astype(np.float32)
    a = dict(
        mp_pos=dev(mp_pos),
        mp_desc=dev(rng.integers(0, 256, (P, 32)).astype(np.uint8)),
        mp_valid=dev(np.ones(P, bool)),
        mp_normal=dev(np.tile(np.float32([0, 0, -1]), (P, 1))),
        mp_dmin=dev(np.full(P, 0.5, np.float32)),
        mp_dmax=dev(np.full(P, 50.0, np.float32)),
    )
    Tcw = dev(np.eye(4, dtype=np.float32))
    kp_ur = dev(np.full(cfg.max_keypoints, -1.0, np.float32))
    kp_depth = dev(np.full(cfg.max_keypoints, -1.0, np.float32))
    cast = jax.jit(lambda x: x.astype(jnp.float32))

    def step(img_u8):
        feats = extractor._extract(cast(img_u8))
        return track_frame_fused(
            cam, Tcw, a["mp_pos"], a["mp_desc"], a["mp_valid"],
            a["mp_normal"], a["mp_dmin"], a["mp_dmax"],
            feats.xy, feats.desc, feats.octave, feats.valid, kp_ur, kp_depth,
            jnp.float32(35.0), jnp.float32(15.0),
            jnp.float32(cfg.scale_factor), cfg.n_levels, 30,
        )

    out = step(frames[0])
    jax.block_until_ready(out)
    n = 100
    profile_dir = os.environ.get("SLAM_BENCH_PROFILE", "")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    fps = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = []
        for i in range(n):
            outs.append(step(frames[i % len(frames)]))
        jax.block_until_ready(outs)  # every frame's result stays live
        fps.append(n / (time.perf_counter() - t0))
    if profile_dir:
        jax.profiler.stop_trace()
    return _spread(fps)


def bench_system_fps(n_frames=150, warmup=30, passes=3, device_staged=False):
    import jax

    from orbslam2_tpu.config import CameraConfig, ExtractorConfig, SlamConfig
    from orbslam2_tpu.pipeline import AsyncSlamSystem
    from orbslam2_tpu.utils.synthetic import render_sequence

    H, W = 480, 640
    K = np.array([[520.0, 0, W / 2], [0, 520.0, H / 2], [0, 0, 1]], np.float32)
    cfg = SlamConfig(
        sensor="rgbd",
        camera=CameraConfig(fx=520, fy=520, cx=W / 2, cy=H / 2, width=W,
                            height=H, bf=52.0, fps=30),
        extractor=ExtractorConfig(n_features=1000, n_levels=8),
    )
    frames, poses = render_sequence(
        n_frames, K, width=W, height=H, with_depth=True
    )
    slam = AsyncSlamSystem(cfg)
    slam.warmup()  # pre-trace/load every hot program (production startup path)
    if device_staged:
        # pure-dispatch variant: every frame pre-staged on device, so the
        # measured loop carries zero per-frame H2D — code cost vs link
        # weather becomes directly visible next to the default variant
        frames = [
            (jax.device_put(img), jax.device_put(depth))
            for img, depth in frames
        ]
    for i in range(warmup):
        img, depth = frames[i % len(frames)]
        slam.track_rgbd(img, depth, i / 30.0)
    fps = []
    for _ in range(passes):
        t0 = time.perf_counter()
        n = 0
        for i in range(warmup, n_frames):
            img, depth = frames[i]
            slam.track_rgbd(img, depth, i / 30.0)
            n += 1
        fps.append(n / (time.perf_counter() - t0))
    slam.shutdown()
    return _spread(fps)


def _ba_problem(K, M, O, rng):
    import jax.numpy as jnp

    from orbslam2_tpu.ops import ba

    poses = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    poses[:, 0, 3] = np.linspace(0, 2, K)
    points = np.stack([
        rng.uniform(-3, 3, M), rng.uniform(-2, 2, M), rng.uniform(5, 10, M),
    ], 1).astype(np.float32)
    obs_kf = rng.integers(0, K, (M, O)).astype(np.int32)
    pc = np.einsum("moij,mj->moi", poses[obs_kf][..., :3, :3], points) + \
        poses[obs_kf][..., :3, 3]
    u = 520 * pc[..., 0] / pc[..., 2] + 320 + rng.normal(0, 0.5, (M, O))
    v = 520 * pc[..., 1] / pc[..., 2] + 240 + rng.normal(0, 0.5, (M, O))
    obs_uvr = np.stack([u, v, -np.ones_like(u)], -1).astype(np.float32)
    return ba.BAProblem(
        poses=jnp.asarray(poses),
        opt_mask=jnp.asarray(np.arange(K) > 0),
        points=jnp.asarray(points + rng.normal(0, 0.02, points.shape)
                           .astype(np.float32)),
        point_valid=jnp.asarray(np.ones(M, bool)),
        obs_kf=jnp.asarray(obs_kf),
        obs_uvr=jnp.asarray(obs_uvr),
        obs_sigma2=jnp.asarray(np.ones((M, O), np.float32)),
        obs_valid=jnp.asarray(np.ones((M, O), bool)),
    )


def bench_ba(K=64, M=4096, O=8, reps=5):
    """LM throughput + both rooflines (FLOPs and HBM bytes) at one size.

    Every rep solves a DISTINCT problem and every result is held live —
    repeating one input lets the relay-attached backend dedup identical
    dispatches (measured: a repeated 1536-Cholesky 'ran' in 33 us vs
    186 us with distinct inputs), which silently inflates iters/s."""
    import jax

    from orbslam2_tpu.models.camera import Camera
    from orbslam2_tpu.ops import ba

    cam = Camera.create(fx=520.0, fy=520.0, cx=320.0, cy=240.0,
                        width=640, height=480)
    probs = [_ba_problem(K, M, O, np.random.default_rng(1 + i))
             for i in range(reps)]
    ITERS = 10
    fn = jax.jit(lambda p: ba.optimize_ba(cam=cam, prob=p, iters=ITERS,
                                          outlier_rounds=0))
    compiled = fn.lower(probs[0]).compile()
    try:
        ca = compiled.cost_analysis()
        flops_per_call = float(ca["flops"])
        bytes_per_call = float(ca.get("bytes accessed", float("nan")))
    except Exception:
        flops_per_call = bytes_per_call = float("nan")
    outs = [fn(p) for p in probs]
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = [fn(p) for p in probs]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    iters_per_s = reps * ITERS / dt
    peak = float(os.environ.get("SLAM_TPU_PEAK_FLOPS", 4.9e13))
    peak_bw = float(os.environ.get("SLAM_TPU_PEAK_BW", 8.1e11))
    out = {"iters_per_s": round(iters_per_s, 1)}
    if np.isfinite(flops_per_call):
        out["sol_pct"] = round(100.0 * flops_per_call * reps / dt / peak, 2)
        out["flops_per_iter_gf"] = round(flops_per_call / ITERS / 1e9, 3)
    if np.isfinite(bytes_per_call):
        out["membw_pct"] = round(
            100.0 * bytes_per_call * reps / dt / peak_bw, 2)
        out["bytes_per_iter_mb"] = round(bytes_per_call / ITERS / 1e6, 2)
    return out


def main():
    mode = os.environ.get("SLAM_BENCH_MODE", "all")
    out = {}
    if mode in ("hot", "all"):
        hot = bench_hot_path()
        out["tracking_fps_per_chip"] = hot["median"]
        out["tracking_fps_spread"] = [hot["min"], hot["max"]]
    if mode in ("ba", "all"):
        local = bench_ba(K=64, M=4096, O=8)
        out["ba_iters_per_s"] = local["iters_per_s"]
        for k in ("sol_pct", "membw_pct", "flops_per_iter_gf",
                  "bytes_per_iter_mb"):
            if k in local:
                out[f"ba_{k}"] = local[k]
        gba = bench_ba(K=256, M=32768, O=8, reps=3)
        out["gba_iters_per_s"] = gba["iters_per_s"]
        for k in ("sol_pct", "membw_pct"):
            if k in gba:
                out[f"gba_{k}"] = gba[k]
    if mode in ("system", "all"):
        sysf = bench_system_fps()
        out["system_fps_per_chip"] = sysf["median"]
        out["system_fps_spread"] = [sysf["min"], sysf["max"]]
    if mode == "system_dispatch":
        # explicit-only: pre-staging frames on device removes the H2D but
        # forces the host-side preprocessing to PULL them back per frame —
        # measured slower than the default path, so it mismeasures "code
        # cost" and is excluded from mode=all
        d = bench_system_fps(device_staged=True)
        out["system_dispatch_fps_per_chip"] = d["median"]
        out["system_dispatch_fps_spread"] = [d["min"], d["max"]]

    primary = out.get("tracking_fps_per_chip") or next(iter(out.values()))
    rec = {
        "metric": "tracking_fps_per_chip" if "tracking_fps_per_chip" in out
        else mode,
        "value": primary,
        "unit": "frames/s",
        "vs_baseline": round(primary / 30.0, 3),
    }
    rec.update({k: v for k, v in out.items()
                if k != "tracking_fps_per_chip"})
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
