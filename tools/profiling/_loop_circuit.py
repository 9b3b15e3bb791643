"""Prototype: rendered 360-degree circuit -> does the loop closer fire?

Tunes the geometry/length for tests/test_loop_e2e.py. Run CPU-only:
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/profiling/_loop_circuit.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from orbslam2_tpu.config import CameraConfig, ExtractorConfig, SlamConfig
from orbslam2_tpu.system import SlamSystem
from orbslam2_tpu.utils.evaluation import ate_rmse
from orbslam2_tpu.utils.synthetic import make_box_room, render

W, H = 320, 240
K = np.array([[260.0, 0, W / 2], [0, 260.0, H / 2], [0, 0, 1]], np.float32)
N = int(os.environ.get("N_FRAMES", "230"))
LAPS = 1.15  # go 15% past 360 deg so several keyframes revisit the start


def circuit_poses(n):
    """Camera on a radius-3 circle inside a 10 m room, facing outward
    (radially): view distance to the walls is 2-4 m, and the final 15%
    of frames re-see exactly what the first frames saw."""
    poses = []
    for i in range(n):
        th = 2 * np.pi * LAPS * i / n
        d = np.array([np.sin(th), 0.0, np.cos(th)], np.float32)  # outward
        C = 3.0 * d
        C[1] = 0.08 * np.sin(0.11 * i)  # slight bob for parallax richness
        Rwc = np.array([
            [np.cos(th), 0, np.sin(th)],
            [0, 1, 0],
            [-np.sin(th), 0, np.cos(th)],
        ], np.float32)
        Tcw = np.eye(4, dtype=np.float32)
        Tcw[:3, :3] = Rwc.T
        Tcw[:3, 3] = -Rwc.T @ C
        poses.append(Tcw)
    return poses


def main():
    planes = make_box_room(seed=3, size=10.0, height=3.0)
    poses = circuit_poses(N)
    print(f"rendering {N} frames ...")
    t0 = time.perf_counter()
    frames = [render(planes, K, T, W, H, return_depth=True) for T in poses]
    print(f"  rendered in {time.perf_counter() - t0:.1f}s")

    cfg = SlamConfig(
        sensor="rgbd",
        camera=CameraConfig(fx=260, fy=260, cx=W / 2, cy=H / 2, width=W,
                            height=H, bf=26.0, fps=30),
        extractor=ExtractorConfig(n_features=600, n_levels=4),
    )
    slam = SlamSystem(cfg)
    pre_ate = None
    t0 = time.perf_counter()
    for i, (img, depth) in enumerate(frames):
        slam.track_rgbd(img, depth, i / 30.0)
        if slam.loop_closer.loops_closed == 0:
            # keyframe-pose ATE while still drifting = the pre-loop error
            kts, kps = [], []
            for ts, T in slam.keyframe_trajectory():
                kts.append(ts)
                kps.append(np.linalg.inv(T)[:3, 3])
            if len(kps) >= 3:
                gt = np.stack([
                    np.linalg.inv(poses[int(round(t * 30))])[:3, 3]
                    for t in kts
                ])
                pre_ate = ate_rmse(np.stack(kps), gt, with_scale=False)
        if i % 40 == 0:
            print(f"  frame {i}: state={slam.tracking_state.name} "
                  f"kfs={len(slam.map.valid_keyframes())} "
                  f"loops={slam.loop_closer.loops_closed} "
                  f"inl={slam.tracker.n_inliers_last}")
    print(f"tracked {N} frames in {time.perf_counter() - t0:.1f}s")
    print(f"loops_closed = {slam.loop_closer.loops_closed}")
    print(f"pre-loop KF ATE  = {pre_ate}")

    kts, kps = [], []
    for ts, T in slam.keyframe_trajectory():
        kts.append(ts)
        kps.append(np.linalg.inv(T)[:3, 3])
    gt = np.stack([
        np.linalg.inv(poses[int(round(t * 30))])[:3, 3] for t in kts
    ])
    post_ate = ate_rmse(np.stack(kps), gt, with_scale=False)
    print(f"post-loop KF ATE = {post_ate}")
    # loop-gap diagnostic: estimated vs gt distance between first and last KF
    slam.shutdown()


if __name__ == "__main__":
    main()
