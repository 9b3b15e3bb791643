"""Async mapping pipeline test: same accuracy, tracking thread never blocks."""

import numpy as np
import pytest

from orbslam2_tpu.config import CameraConfig, ExtractorConfig, SlamConfig
from orbslam2_tpu.pipeline import AsyncSlamSystem
from orbslam2_tpu.utils.evaluation import ate_rmse
from orbslam2_tpu.utils.synthetic import render_sequence

K = np.array([[260.0, 0, 160], [0, 260, 120], [0, 0, 1]], np.float32)


def test_async_rgbd_tracks():
    frames, poses = render_sequence(30, K, width=320, height=240, with_depth=True)
    cfg = SlamConfig(
        sensor="rgbd",
        camera=CameraConfig(fx=260, fy=260, cx=160, cy=120, width=320,
                            height=240, bf=26.0, fps=30),
        extractor=ExtractorConfig(n_features=500, n_levels=4),
    )
    slam = AsyncSlamSystem(cfg)
    for i, (img, depth) in enumerate(frames):
        slam.track_rgbd(img, depth, i / 30.0)
    slam.shutdown()  # flushes the tracking pipeline + drains the queue
    # pipelined tracking returns poses one frame late; the trajectory log
    # carries the exact (frame_id, pose) association
    est, gt = [], []
    for fid, _, Tcw in slam.tracker.trajectory:
        est.append(np.linalg.inv(Tcw)[:3, 3])
        gt.append(np.linalg.inv(poses[fid])[:3, 3])
    assert len(est) >= 28
    err = ate_rmse(np.array(est), np.array(gt), with_scale=False)
    assert err < 0.08, err
    assert len(slam.map.valid_keyframes()) >= 3


def test_live_viewer_snapshots(tmp_path):
    """LiveViewer writes snapshot PNGs on its own thread."""
    import time

    from orbslam2_tpu.utils.telemetry import LiveViewer

    frames, poses = render_sequence(6, K, width=320, height=240, with_depth=True)
    cfg = SlamConfig(
        sensor="rgbd",
        camera=CameraConfig(fx=260, fy=260, cx=160, cy=120, width=320,
                            height=240, bf=26.0, fps=30),
        extractor=ExtractorConfig(n_features=500, n_levels=4),
    )
    from orbslam2_tpu.system import SlamSystem

    slam = SlamSystem(cfg)
    viewer = LiveViewer(slam, str(tmp_path), interval=0.3)
    for i, (img, depth) in enumerate(frames):
        slam.track_rgbd(img, depth, i / 30.0)
    time.sleep(0.8)
    viewer.stop()
    pngs = list(tmp_path.glob("map_*.png"))
    assert len(pngs) >= 1
    assert pngs[0].stat().st_size > 1000
