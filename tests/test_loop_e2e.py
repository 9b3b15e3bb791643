"""End-to-end rendered loop closure (VERDICT r4 #3): a full 360-degree
circuit rendered with real textures, tracked with the real extractor /
BoW vocabulary through AsyncSlamSystem, must accumulate drift, fire
DetectLoop -> Sim3 -> correction -> GBA, and measurably improve the
keyframe-trajectory ATE.

This is the integration seam no unit test covers: loop DETECTION here runs
on real descriptor noise (revisit views re-extracted from pixels, not
copied descriptors), and the correction has to survive the live pipeline
(†LoopClosing::Run, SURVEY §3.4)."""

import numpy as np

from orbslam2_tpu.config import CameraConfig, ExtractorConfig, SlamConfig
from orbslam2_tpu.pipeline import AsyncSlamSystem
from orbslam2_tpu.utils.evaluation import ate_rmse
from orbslam2_tpu.utils.synthetic import make_box_room, render

W, H = 320, 240
K = np.array([[260.0, 0, W / 2], [0, 260.0, H / 2], [0, 0, 1]], np.float32)
N_FRAMES = 240
LAPS = 1.25  # 25% past 360 deg: several keyframes re-see the start views


def _circuit_poses(n):
    """Camera on a radius-3 circle inside a 10 m box room, facing outward
    (radially): view distance to the walls is 2-4 m and the final quarter
    of the frames look at exactly what the first frames saw."""
    poses = []
    for i in range(n):
        th = 2 * np.pi * LAPS * i / n
        C = 3.0 * np.array([np.sin(th), 0.0, np.cos(th)], np.float32)
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


def _render_circuit():
    planes = make_box_room(seed=3, size=10.0, height=3.0)
    poses = _circuit_poses(N_FRAMES)
    frames = [render(planes, K, T, W, H, return_depth=True) for T in poses]
    return frames, poses


def _cfg():
    return SlamConfig(
        sensor="rgbd",
        camera=CameraConfig(fx=260, fy=260, cx=W / 2, cy=H / 2, width=W,
                            height=H, bf=26.0, fps=30),
        extractor=ExtractorConfig(n_features=600, n_levels=4),
    )


def _kf_ate(slam, poses):
    kts, kps = [], []
    for ts, T in slam.keyframe_trajectory():
        kts.append(ts)
        kps.append(np.linalg.inv(T)[:3, 3])
    if len(kps) < 3:
        return None
    gt = np.stack([
        np.linalg.inv(poses[int(round(t * 30))])[:3, 3] for t in kts
    ])
    return ate_rmse(np.stack(kps), gt, with_scale=False)


def test_rendered_circuit_closes_loop_and_improves_ate():
    """Deterministic (synchronous) pipeline: the loop must fire on real
    re-extracted descriptors and beat the peak accumulated drift."""
    from orbslam2_tpu.system import SlamSystem

    frames, poses = _render_circuit()
    slam = SlamSystem(_cfg())
    peak_ate = 0.0
    for i, (img, depth) in enumerate(frames):
        slam.track_rgbd(img, depth, i / 30.0)
        if slam.loop_closer.loops_closed == 0:
            a = _kf_ate(slam, poses)
            if a is not None:
                # peak (not last) drift: an early benign loop detection
                # between overlapping views must not poison the baseline
                peak_ate = max(peak_ate, a)
    slam.shutdown()

    assert slam.loop_closer.loops_closed >= 1, (
        f"no loop closed over a {LAPS:.2f}-lap rendered circuit "
        f"({len(slam.map.valid_keyframes())} KFs)"
    )
    post_ate = _kf_ate(slam, poses)
    assert post_ate is not None
    # drift must have been real, and the correction must beat its peak
    assert peak_ate > 0.015, f"circuit accumulated no drift ({peak_ate:.4f})"
    assert post_ate < 0.7 * peak_ate, (peak_ate, post_ate)
    assert post_ate < 0.05, post_ate


def test_rendered_circuit_async_pipeline_stays_consistent():
    """Same circuit through AsyncSlamSystem (pipelined tracking, background
    mapper/loop workers, background GBA with staged write-back): the loop
    must still fire and the final map must stay globally consistent even
    when worker timing starves mapping (the regime where keyframes pile up
    during the background GBA and corrections propagate through the
    spanning tree)."""
    import time

    frames, poses = _render_circuit()
    slam = AsyncSlamSystem(_cfg())
    for i, (img, depth) in enumerate(frames):
        slam.track_rgbd(img, depth, i / 30.0)
        # bounded backpressure, like a real-time sensor feed: on a
        # CPU-starved CI box an unpaced loop can outrun the mapper by
        # dozens of keyframes, and "host 10x too slow for the feed" is a
        # deployment condition, not the concurrency property under test
        waited = 0.0
        while slam._kf_queue.qsize() >= 3 and waited < 5.0:
            time.sleep(0.01)
            waited += 0.01
    slam.shutdown()  # flush pipeline, drain queues, join GBA

    assert slam.loop_closer.loops_closed >= 1, (
        f"no loop closed ({len(slam.map.valid_keyframes())} KFs)"
    )
    post_ate = _kf_ate(slam, poses)
    assert post_ate is not None
    kfs = slam.map.valid_keyframes()
    assert np.isfinite(slam.map.kf_pose[kfs]).all()
    # consistency tripwire, deliberately tolerant of CPU starvation: when
    # the suite saturates the box the mapper skips fuse/BA rounds and the
    # map gets sloppier (~0.13 observed), which is fine — the bug this
    # guards against (stale mapper write-backs clobbering the loop
    # correction, pre-correction_epoch) produced 0.47.
    assert post_ate < 0.2, post_ate
