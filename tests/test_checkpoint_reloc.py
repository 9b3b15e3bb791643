"""Map persistence, localization-only mode, and relocalization tests."""

import numpy as np
import pytest

from orbslam2_tpu.config import CameraConfig, ExtractorConfig, SlamConfig
from orbslam2_tpu.system import SlamSystem
from orbslam2_tpu.tracking import TrackingState
from orbslam2_tpu.utils.synthetic import render_sequence

K = np.array([[260.0, 0, 160], [0, 260, 120], [0, 0, 1]], np.float32)


def _cfg():
    return SlamConfig(
        sensor="rgbd",
        camera=CameraConfig(fx=260, fy=260, cx=160, cy=120, width=320,
                            height=240, bf=26.0, fps=30),
        extractor=ExtractorConfig(n_features=500, n_levels=4),
    )


@pytest.fixture(scope="module")
def mapped_run(tmp_path_factory):
    """Build a map over 25 frames, save it, return (map_path, frames, poses)."""
    frames, poses = render_sequence(25, K, width=320, height=240, with_depth=True)
    slam = SlamSystem(_cfg())
    for i, (img, depth) in enumerate(frames):
        slam.track_rgbd(img, depth, i / 30.0)
    path = str(tmp_path_factory.mktemp("maps") / "map.npz")
    slam.save_map(path)
    return path, frames, poses, slam


class TestCheckpoint:
    def test_save_load_roundtrip(self, mapped_run):
        path, frames, poses, slam = mapped_run
        fresh = SlamSystem(_cfg())
        fresh.load_map(path, localization_only=True)
        m1, m2 = slam.map, fresh.map
        assert m2.n_kf == m1.n_kf and m2.n_mp == m1.n_mp
        np.testing.assert_array_equal(m2.kf_valid, m1.kf_valid)
        np.testing.assert_allclose(m2.mp_pos[: m2.n_mp], m1.mp_pos[: m1.n_mp])
        np.testing.assert_array_equal(m2.kf_mp, m1.kf_mp)
        assert fresh.localization_only

    def test_localization_from_saved_map(self, mapped_run):
        """Relocalize against a loaded map and track without mapping."""
        path, frames, poses, _ = mapped_run
        fresh = SlamSystem(_cfg())
        fresh.load_map(path, localization_only=True)
        n_kf_before = len(fresh.map.valid_keyframes())
        tracked = 0
        errs = []
        T0 = poses[0]  # map frame is anchored at the first mapped camera
        for i, ((img, depth), T_true) in enumerate(zip(frames[5:20], poses[5:20])):
            pose = fresh.track_rgbd(img, depth, i / 30.0)
            if pose is not None:
                tracked += 1
                C_est = np.linalg.inv(pose)[:3, 3]
                C_gt_map = (T0 @ np.linalg.inv(T_true))[:3, 3]
                errs.append(np.linalg.norm(C_est - C_gt_map))
        assert tracked >= 10, tracked
        assert np.median(errs) < 0.1
        # localization-only: the map must not have grown
        assert len(fresh.map.valid_keyframes()) == n_kf_before


class TestRelocalization:
    def test_recovers_after_blackout(self):
        """Feed blank frames to force LOST, then real frames to recover."""
        frames, poses = render_sequence(40, K, width=320, height=240,
                                        with_depth=True)
        slam = SlamSystem(_cfg())
        for i in range(20):
            img, depth = frames[i]
            slam.track_rgbd(img, depth, i / 30.0)
        assert slam.tracking_state == TrackingState.OK
        blank = np.zeros((240, 320), np.float32)
        bdepth = np.zeros((240, 320), np.float32)
        for i in range(3):
            slam.track_rgbd(blank, bdepth, (20 + i) / 30.0)
        assert slam.tracking_state == TrackingState.LOST
        # revisit an already-mapped view
        recovered = False
        for i in range(10, 20):
            img, depth = frames[i]
            pose = slam.track_rgbd(img, depth, (25 + i) / 30.0)
            if pose is not None:
                recovered = True
                C_est = np.linalg.inv(pose)[:3, 3]
                C_gt_map = (poses[0] @ np.linalg.inv(poses[i]))[:3, 3]
                err = np.linalg.norm(C_est - C_gt_map)
                assert err < 0.15, err
                break
        assert recovered, "relocalization failed after blackout"


class TestSlotRecycling:
    def test_map_point_slots_reused(self):
        from orbslam2_tpu.map.state import MapState

        cfg = _cfg()
        m = MapState.allocate(cfg)
        k = m.add_keyframe(
            np.eye(4, dtype=np.float32),
            np.zeros((cfg.extractor.max_keypoints, 2), np.float32),
            np.zeros((cfg.extractor.max_keypoints, 32), np.uint8),
            np.zeros(cfg.extractor.max_keypoints, np.int32),
            np.zeros(cfg.extractor.max_keypoints, np.float32),
            np.ones(cfg.extractor.max_keypoints, bool), 0, 0.0,
        )
        ids = [m.add_map_point(np.zeros(3, np.float32), k) for _ in range(10)]
        for mp in ids[:5]:
            m.remove_map_point(mp)
        # grace period: not reusable yet
        nm_before = m.n_mp
        fresh = m.add_map_point(np.zeros(3, np.float32), k)
        assert fresh == nm_before
        m.recycle_free_slots()
        reused = m.add_map_point(np.ones(3, np.float32), k)
        assert reused in ids[:5]
        assert m.mp_valid[reused]
        np.testing.assert_array_equal(m.mp_obs_kf[reused], -1)
