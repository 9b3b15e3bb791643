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


def test_elastic_pipeline_depth_bounds_queue_and_keeps_order():
    """Elastic commits: the pending queue never exceeds pipeline_depth_max,
    frames retire in FIFO order, and a slow-to-arrive result defers commits
    instead of blocking the dispatch path (simulated by a puller whose
    futures claim the transfer never lands below depth_max)."""
    frames, poses = render_sequence(40, K, width=320, height=240,
                                    with_depth=True)
    cfg = SlamConfig(
        sensor="rgbd",
        camera=CameraConfig(fx=260, fy=260, cx=160, cy=120, width=320,
                            height=240, bf=26.0, fps=30),
        extractor=ExtractorConfig(n_features=500, n_levels=4),
    )
    cfg.runtime.pipeline_depth = 1
    cfg.runtime.pipeline_depth_max = 4
    slam = AsyncSlamSystem(cfg)
    tr = slam.tracker

    class _NeverLands:
        """Fake puller future: transfer 'in flight' forever, but a forced
        (depth_max) commit's blocking result() still works."""

        def __init__(self, packed):
            self._packed = packed

        def done(self):
            return False

        def result(self):
            return np.asarray(self._packed)

    class _FakePuller:
        def submit(self, fn, packed):
            return _NeverLands(packed)

    orig_puller = tr._puller
    depths_seen = []

    committed = []
    orig_commit = tr._commit_pending_one

    def commit():
        if tr._pending:
            committed.append(tr._pending[0][0].frame_id)
        return orig_commit()

    tr._puller = _FakePuller()
    tr._commit_pending_one = commit
    try:
        for i, (img, depth) in enumerate(frames):
            slam.track_rgbd(img, depth, i / 30.0)
            depths_seen.append(len(tr._pending))
    finally:
        tr._puller = orig_puller
        tr._commit_pending_one = orig_commit
    # np.asarray on the real inner array still works, so forced commits at
    # depth_max succeed; the queue must saturate at exactly depth_max
    assert max(depths_seen) == cfg.runtime.pipeline_depth_max
    assert depths_seen.count(cfg.runtime.pipeline_depth_max) > 10
    # FIFO retirement with no skips (modulo synchronous fallback re-tracks,
    # which clear the queue; none should occur on this easy sequence)
    assert committed == sorted(committed)
    slam.shutdown()
    # after shutdown the pipeline is fully flushed and every frame that got
    # a pose is in the trajectory in frame order
    fids = [f for f, _, _ in tr.trajectory]
    assert fids == sorted(fids)
    assert len(fids) >= 36
