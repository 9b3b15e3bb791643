"""Long-run lifecycle stress: multi-orbit RGB-D with live loop closure.

Protects the full-system behaviors that only appear over time: map-point
slot recycling, keyframe accumulation, implicit covisibility reconnection,
and an EXPLICIT loop detection+correction inside the live pipeline.
"""

import numpy as np

from orbslam2_tpu.config import CameraConfig, ExtractorConfig, SlamConfig
from orbslam2_tpu.system import SlamSystem
from orbslam2_tpu.utils.evaluation import ate_rmse
from orbslam2_tpu.utils.synthetic import make_box_room, render

K = np.array([[260.0, 0, 160], [0, 260, 120], [0, 0, 1]], np.float32)


def test_double_orbit_with_live_loop_closure():
    planes = make_box_room(seed=0)
    N = 170  # ~2.1 orbits: the revisit happens after real drift accumulates
    poses = []
    for i in range(N):
        a = 2 * np.pi * i / 80
        C = np.array([1.2 * np.sin(a), 0.0, 1.2 * (1 - np.cos(a)) - 1.0],
                     np.float32)
        Rwc = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                        [-np.sin(a), 0, np.cos(a)]], np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = Rwc.T
        T[:3, 3] = -Rwc.T @ C
        poses.append(T)
    cfg = SlamConfig(
        sensor="rgbd",
        camera=CameraConfig(fx=260, fy=260, cx=160, cy=120, width=320,
                            height=240, bf=26.0, fps=30),
        extractor=ExtractorConfig(n_features=500, n_levels=4),
    )
    slam = SlamSystem(cfg)
    est, gt = [], []
    for i in range(N):
        img, depth = render(planes, K, poses[i], 320, 240, return_depth=True)
        pose = slam.track_rgbd(img, depth, i / 30.0)
        if pose is not None:
            est.append(np.linalg.inv(pose)[:3, 3])
            gt.append(np.linalg.inv(poses[i])[:3, 3])

    assert len(est) == N, f"lost tracking: {len(est)}/{N}"
    err = ate_rmse(np.array(est), np.array(gt), with_scale=False)
    assert err < 0.08, err
    m = slam.map
    # lifecycle invariants after sustained churn
    assert m.n_mp < m.mp_valid.shape[0] * 0.5  # recycling keeps headroom
    assert len(m.free_mp) + len(m.free_mp_pending) > 0
    for kf in m.valid_keyframes():
        mps = m.kf_mp[kf][m.kf_mp[kf] >= 0]
        assert m.mp_valid[mps].all()  # no dangling observations
