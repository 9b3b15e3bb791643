"""Monocular long-sequence robustness: bounded scale drift over 120 frames."""

import numpy as np
import pytest

from orbslam2_tpu.config import CameraConfig, ExtractorConfig, SlamConfig
from orbslam2_tpu.system import SlamSystem
from orbslam2_tpu.utils.evaluation import ate_rmse
from orbslam2_tpu.utils.synthetic import make_box_room, render

K = np.array([[260.0, 0, 160], [0, 260, 120], [0, 0, 1]], np.float32)


def test_mono_long_sequence_drift_bounded():
    planes = make_box_room(seed=1)
    N = 120
    poses = []
    for i in range(N):
        # gentle sweep: lateral sway + slow advance + mild yaw, stays in-room
        yaw = 0.3 * np.sin(0.02 * i)
        C = np.array(
            [0.8 * np.sin(0.05 * i), 0.1 * np.sin(0.03 * i), -1.8 + 0.015 * i],
            np.float32,
        )
        Ry = np.array(
            [[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
             [-np.sin(yaw), 0, np.cos(yaw)]], np.float32,
        )
        # slight downward pitch: floor + wall in view => non-planar scene,
        # so monocular init does not stall on the H-decomposition ambiguity
        pitch = 0.25
        Rx = np.array(
            [[1, 0, 0], [0, np.cos(pitch), -np.sin(pitch)],
             [0, np.sin(pitch), np.cos(pitch)]], np.float32,
        )
        Rwc = Ry @ Rx
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = Rwc.T
        T[:3, 3] = -Rwc.T @ C
        poses.append(T)
    frames = [render(planes, K, T, 320, 240) for T in poses]

    cfg = SlamConfig(
        sensor="monocular",
        camera=CameraConfig(fx=260, fy=260, cx=160, cy=120, width=320,
                            height=240, fps=30),
        extractor=ExtractorConfig(n_features=500, n_levels=4),
    )
    slam = SlamSystem(cfg)
    est, gt = [], []
    for i, (img, T_true) in enumerate(zip(frames, poses)):
        pose = slam.track_monocular(img, i / 30.0)
        if pose is not None:
            est.append(np.linalg.inv(pose)[:3, 3])
            gt.append(np.linalg.inv(T_true)[:3, 3])
    # initialized within the first ~30 frames and never lost after
    assert len(est) >= N - 45, len(est)
    err = ate_rmse(np.array(est), np.array(gt), with_scale=True)
    # Sim3-aligned ATE bounds global scale drift too: if scale drifted the
    # single global alignment could not fit both ends of the trajectory.
    assert err < 0.08, err
