#!/usr/bin/env python
"""AR cube demo — the reference's ros_mono_ar/ViewerAR, headless.

Tracks a sequence, fits a plane to the current local map points once
tracking is stable, anchors a virtual cube on it, and writes frames with
the cube wireframe projected through the live pose:

  python examples/ar_demo.py <sensor> <settings.yaml> <sequence_dir>
      [--out ar_frames/] [--max-frames N]

Works with the same dataset layouts as run_slam.py (tum-rgbd directories
for rgbd, rgb.txt-only for monocular).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from orbslam2_tpu.config import load_config
from orbslam2_tpu.system import SlamSystem
from orbslam2_tpu.utils import datasets
from orbslam2_tpu.utils.ar import (cube_vertices, draw_cube_overlay,
                                   fit_plane_ransac)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sensor", choices=["monocular", "rgbd"])
    ap.add_argument("settings")
    ap.add_argument("sequence")
    ap.add_argument("--out", default="ar_frames")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--cube-size", type=float, default=0.15)
    args = ap.parse_args()

    cfg = load_config(args.settings, sensor=args.sensor)
    slam = SlamSystem(cfg)
    os.makedirs(args.out, exist_ok=True)
    K = np.array([[cfg.camera.fx, 0, cfg.camera.cx],
                  [0, cfg.camera.fy, cfg.camera.cy], [0, 0, 1]], np.float32)

    if args.sensor == "rgbd":
        seq = datasets.tum_rgbd_sequence(
            args.sequence, depth_factor=cfg.camera.depth_map_factor or 5000.0
        )
    else:
        seq = ((ts, img, None) for ts, img in
               datasets.tum_mono_sequence(args.sequence))

    cube = None
    n_drawn = 0
    for i, (ts, img, depth) in enumerate(seq):
        if args.max_frames and i >= args.max_frames:
            break
        pose = (slam.track_rgbd(img, depth, ts) if depth is not None
                else slam.track_monocular(img, ts))
        if pose is None:
            continue
        if cube is None and len(slam.map.valid_map_points()) > 100:
            mp = slam.map.mp_pos[slam.map.valid_map_points()]
            plane = fit_plane_ransac(mp)
            if plane is not None:
                cube = cube_vertices(plane[1], plane[0], args.cube_size)
                print(f"plane anchored at {plane[1].round(3)} "
                      f"normal {plane[0].round(3)}")
        if cube is not None:
            from orbslam2_tpu.utils.ar import write_png_gray

            frame = draw_cube_overlay(img, pose, K, cube)
            write_png_gray(os.path.join(args.out, f"{i:06d}.png"), frame)
            n_drawn += 1
    slam.shutdown()
    print(f"{n_drawn} AR frames written to {args.out}/")


if __name__ == "__main__":
    main()
