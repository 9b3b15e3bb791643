#!/usr/bin/env python
"""Live-camera SLAM node — the reference's ROS wrappers as a TCP service.

The reference's †Examples/ROS/ORB_SLAM2/src/{ros_mono,ros_stereo,ros_rgbd}.cc
subscribe to live image topics and feed System::TrackX from the callback;
this node serves the same role without ROS: a sensor process streams frames
over TCP (see orbslam2_tpu.utils.stream_node for the wire format and the
client helper) and receives the tracked pose per frame.

  python examples/stream_node.py <sensor> <settings.yaml> [--port 5590]
      [--load-map map.npz --localization] [--viewer-port 8080]

Runs until Ctrl-C; saves trajectories on shutdown like the dataset runner.
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from orbslam2_tpu.config import load_config
from orbslam2_tpu.pipeline import AsyncSlamSystem
from orbslam2_tpu.utils.stream_node import SlamStreamServer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sensor", choices=["monocular", "rgbd", "stereo"])
    ap.add_argument("settings")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=5590)
    ap.add_argument("--load-map", default="")
    ap.add_argument("--localization", action="store_true",
                    help="localization-only against the loaded map "
                         "(†ActivateLocalizationMode)")
    ap.add_argument("--traj-out", default="CameraTrajectory.txt")
    ap.add_argument("--kf-traj-out", default="KeyFrameTrajectory.txt")
    ap.add_argument("--viewer-port", type=int, default=-1)
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    cfg = load_config(args.settings, sensor=args.sensor)
    slam = AsyncSlamSystem(cfg)
    if args.load_map:
        slam.load_map(args.load_map, localization_only=args.localization)
    if not args.no_warmup:
        print("warming device programs...", flush=True)
        slam.warmup()
    viewer = None
    if args.viewer_port >= 0:
        from orbslam2_tpu.utils.http_viewer import HttpViewer

        viewer = HttpViewer(slam, port=args.viewer_port)
        print(f"live map at http://127.0.0.1:{viewer.port}/", flush=True)

    node = SlamStreamServer(slam, host=args.host, port=args.port)
    node.start()
    print(f"listening on {node.address[0]}:{node.address[1]}", flush=True)
    try:
        while True:
            time.sleep(0.5)
    except KeyboardInterrupt:
        pass
    finally:
        node.stop()
        if viewer is not None:
            viewer.stop()
        slam.shutdown()
        slam.save_trajectory_tum(args.traj_out)
        slam.save_keyframe_trajectory_tum(args.kf_traj_out)
        print(f"trajectories saved: {args.traj_out} / {args.kf_traj_out}")


if __name__ == "__main__":
    main()
