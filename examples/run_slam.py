#!/usr/bin/env python
"""Dataset CLI runner — the reference's Examples/ binaries in one entry point.

Usage (mirrors †Examples/*/ mono_tum / rgbd_tum / stereo_kitti etc.):

  python examples/run_slam.py tum-mono    <settings.yaml> <sequence_dir>
  python examples/run_slam.py tum-rgbd    <settings.yaml> <sequence_dir>
  python examples/run_slam.py kitti-mono  <settings.yaml> <sequence_dir>
  python examples/run_slam.py kitti-stereo <settings.yaml> <sequence_dir>
  python examples/run_slam.py euroc-mono  <settings.yaml> <sequence_dir>
  python examples/run_slam.py euroc-stereo <settings.yaml> <sequence_dir>

Accepts the reference's YAML settings files unchanged. Writes
CameraTrajectory.txt / KeyFrameTrajectory.txt (TUM format; KITTI format for
kitti-*) and prints per-frame timing statistics like the reference mains.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from orbslam2_tpu.config import load_config
from orbslam2_tpu.system import SlamSystem
from orbslam2_tpu.utils import datasets


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=[
        "tum-mono", "tum-rgbd", "kitti-mono", "kitti-stereo",
        "euroc-mono", "euroc-stereo",
    ])
    ap.add_argument("settings")
    ap.add_argument("sequence")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--traj-out", default="CameraTrajectory.txt")
    ap.add_argument("--kf-traj-out", default="KeyFrameTrajectory.txt")
    ap.add_argument("--save-map", default="")
    ap.add_argument("--viewer-port", type=int, default=-1,
                    help="serve the interactive live map at this port "
                         "(0 = ephemeral; default off)")
    ap.add_argument("--async-mapping", action="store_true",
                    help="run mapping + loop closing on background workers "
                         "with pipelined tracking (the reference's 3-thread "
                         "topology; tracking returns poses one frame late)")
    ap.add_argument("--warmup", action="store_true",
                    help="pre-trace/load every hot device program before "
                         "the frame loop (recommended on TPU: avoids "
                         "mid-sequence compile stalls; the reference "
                         "similarly front-loads its 10-20 s vocabulary "
                         "parse)")
    args = ap.parse_args()

    sensor = {"mono": "monocular", "rgbd": "rgbd", "stereo": "stereo"}[
        args.mode.split("-")[1]
    ]
    cfg = load_config(args.settings, sensor=sensor)
    if args.async_mapping:
        from orbslam2_tpu.pipeline import AsyncSlamSystem

        slam = AsyncSlamSystem(cfg)
    else:
        slam = SlamSystem(cfg)
    if args.warmup:
        dt = slam.warmup()
        print(f"warmup: {dt:.1f}s")
    viewer = None
    if args.viewer_port >= 0:
        from orbslam2_tpu.utils.http_viewer import HttpViewer

        viewer = HttpViewer(slam, port=args.viewer_port)
        print(f"live viewer: http://127.0.0.1:{viewer.port}/")

    times = []
    n = 0
    try:
        _run_frames(args, cfg, slam, times)
        n = len(times)
    finally:
        if viewer is not None:
            viewer.stop()
        slam.shutdown()
    # †Examples mains print median/mean tracking time at exit
    ts_sorted = sorted(times)
    print(f"frames: {n}")
    if n:
        print(f"median tracking time: {ts_sorted[n // 2]*1000:.2f} ms")
        print(f"mean tracking time:   {np.mean(times)*1000:.2f} ms")
    if args.mode.startswith("kitti"):
        slam.save_trajectory_kitti(args.traj_out)
    else:
        slam.save_trajectory_tum(args.traj_out)
    slam.save_keyframe_trajectory_tum(args.kf_traj_out)
    if args.save_map:
        slam.save_map(args.save_map)
        print(f"map saved to {args.save_map}")


def _run_frames(args, cfg, slam, times):
    n = 0
    if args.mode == "tum-rgbd":
        it = datasets.tum_rgbd_sequence(args.sequence, cfg.camera.depth_map_factor or 5000.0)
        for ts, img, depth in it:
            t0 = time.perf_counter()
            slam.track_rgbd(img, depth, ts)
            times.append(time.perf_counter() - t0)
            n += 1
            if args.max_frames and n >= args.max_frames:
                break
    elif args.mode == "tum-mono":
        for ts, img in datasets.tum_mono_sequence(args.sequence):
            t0 = time.perf_counter()
            slam.track_monocular(img, ts)
            times.append(time.perf_counter() - t0)
            n += 1
            if args.max_frames and n >= args.max_frames:
                break
    elif args.mode.startswith("kitti"):
        stereo = args.mode.endswith("stereo")
        for ts, left, right in datasets.kitti_sequence(args.sequence, stereo):
            t0 = time.perf_counter()
            if stereo:
                slam.track_stereo(left, right, ts)
            else:
                slam.track_monocular(left, ts)
            times.append(time.perf_counter() - t0)
            n += 1
            if args.max_frames and n >= args.max_frames:
                break
    else:  # euroc
        stereo = args.mode.endswith("stereo")
        # Reference-format EuRoC settings carry LEFT./RIGHT. raw-camera
        # calibration; remap raw cam0/cam1 frames exactly as the reference
        # example does (†stereo_euroc.cc initUndistortRectifyMap + remap)
        rectifier = None
        if stereo and cfg.stereo_rectify is not None:
            from orbslam2_tpu.utils.rectify import YamlRectifier

            rectifier = YamlRectifier(cfg.stereo_rectify)
        for ts, left, right in datasets.euroc_sequence(args.sequence, stereo):
            t0 = time.perf_counter()
            if stereo and right is not None:
                if rectifier is not None:
                    left, right = rectifier(left, right)
                slam.track_stereo(left, right, ts)
            else:
                slam.track_monocular(left, ts)
            times.append(time.perf_counter() - t0)
            n += 1
            if args.max_frames and n >= args.max_frames:
                break


if __name__ == "__main__":
    main()
