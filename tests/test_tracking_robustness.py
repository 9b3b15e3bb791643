"""Tracking robustness set (VERDICT r1 item 7): jerky motion surviving via
the TrackReferenceKeyFrame fallback, reference NeedNewKeyFrame close-point
gates, localization-mode VO points, and reset-on-early-loss."""

import numpy as np
import pytest

from orbslam2_tpu.config import CameraConfig, ExtractorConfig, SlamConfig
from orbslam2_tpu.system import SlamSystem
from orbslam2_tpu.tracking import TrackingState
from orbslam2_tpu.utils.synthetic import orbit_trajectory, render_sequence

K = np.array([[260.0, 0, 160], [0, 260, 120], [0, 0, 1]], np.float32)


def _cfg():
    return SlamConfig(
        sensor="rgbd",
        camera=CameraConfig(fx=260, fy=260, cx=160, cy=120, width=320,
                            height=240, bf=26.0, fps=30),
        extractor=ExtractorConfig(n_features=500, n_levels=4),
    )


def _jerky_trajectory(n_frames: int, period: int = 20):
    """Orbit poses with the velocity model broken every `period` frames:
    the camera teleports sideways (a dropped-frames / jerk discontinuity),
    so constant-velocity prediction points at the wrong place."""
    poses = orbit_trajectory(n_frames)
    out = []
    offset = np.zeros(3, np.float32)
    for i, Tcw in enumerate(poses):
        if i > 0 and i % period == 0:
            offset = offset + np.array(
                [0.12 * (-1) ** (i // period), 0.0, -0.06], np.float32)
        T = Tcw.copy()
        Twc = np.linalg.inv(T)
        Twc[:3, 3] += offset
        out.append(np.linalg.inv(Twc).astype(np.float32))
    return out


class TestJerkyMotion:
    def test_tracks_through_velocity_breaks(self):
        """The BoW-free reference-KF fallback must hold tracking where the
        motion model is broken every 20 frames (†TrackReferenceKeyFrame)."""
        traj = _jerky_trajectory(80, period=20)
        frames, poses = render_sequence(80, K, width=320, height=240,
                                        with_depth=True, trajectory=traj)
        slam = SlamSystem(_cfg())
        tracked = 0
        errs = []
        for i, ((img, depth), T_true) in enumerate(zip(frames, poses)):
            pose = slam.track_rgbd(img, depth, i / 30.0)
            if pose is not None:
                tracked += 1
                C_est = np.linalg.inv(pose)[:3, 3]
                C_gt = (poses[0] @ np.linalg.inv(T_true))[:3, 3]
                errs.append(np.linalg.norm(C_est - C_gt))
        assert tracked >= 76, tracked  # at most one-per-jerk hiccup
        assert np.median(errs) < 0.08, np.median(errs)


class TestNeedNewKeyFrameGates:
    def test_close_point_urgency(self):
        """<100 tracked close + >70 untracked close forces insertion even
        with a healthy inlier count (†bNeedToInsertClose)."""
        frames, _ = render_sequence(6, K, width=320, height=240,
                                    with_depth=True)
        slam = SlamSystem(_cfg())
        for i, (img, depth) in enumerate(frames):
            slam.track_rgbd(img, depth, i / 30.0)
        tr = slam.tracker
        assert tr.ref_kf >= 0

        class FakeFrame:
            frame_id = tr.last_kf_frame_id + 5
            valid = np.ones(500, bool)
            depth = np.full(500, 0.5, np.float32)  # all close
            mp = np.full(500, -1, np.int64)

        f = FakeFrame()
        f.mp[:50] = 1  # 50 tracked close, 450 untracked close
        tr.n_inliers_last = 200  # healthy by the decay gates alone
        ref_tracked = int((slam.map.kf_mp[tr.ref_kf] >= 0).sum())
        assert tr.n_inliers_last > 0.25 * ref_tracked
        assert tr._need_new_keyframe(f) is True

        # same frame with plenty of tracked close points: no urgency, and
        # a healthy ratio vs the reference KF -> no insertion
        f2 = FakeFrame()
        f2.mp[:] = 1
        tr.n_inliers_last = max(200, int(0.95 * ref_tracked))
        assert tr._need_new_keyframe(f2) is False


class TestResetOnEarlyLoss:
    def test_resets_when_lost_right_after_init(self):
        """Loss with <=5 keyframes discards the bootstrap map entirely
        (†Tracking 'Track lost soon after initialisation, reseting...')."""
        frames, _ = render_sequence(3, K, width=320, height=240,
                                    with_depth=True)
        slam = SlamSystem(_cfg())
        img, depth = frames[0]
        slam.track_rgbd(img, depth, 0.0)
        assert slam.tracking_state == TrackingState.OK
        assert int(slam.map.kf_valid.sum()) >= 1
        blank = np.zeros((240, 320), np.float32)
        slam.track_rgbd(blank, np.zeros((240, 320), np.float32), 1 / 30.0)
        # system was rebuilt: empty map, tracker back to uninitialized
        assert int(slam.map.kf_valid.sum()) == 0
        assert slam.tracking_state in (
            TrackingState.NO_IMAGES_YET, TrackingState.NOT_INITIALIZED)
        # and it can bootstrap again
        for i, (img, depth) in enumerate(frames):
            slam.track_rgbd(img, depth, (2 + i) / 30.0)
        assert slam.tracking_state == TrackingState.OK


class TestHardRelocalization:
    def test_relocalizes_from_novel_views(self):
        """Relocalize from views the map has never seen (offset + rotated
        from every mapped pose) — exercises the multi-candidate P4P loop and
        the two-stage projection top-up, not just exact-revisit recall."""
        from orbslam2_tpu.utils.synthetic import make_box_room, orbit_trajectory, render

        planes = make_box_room(seed=0)
        poses = orbit_trajectory(30)
        slam = SlamSystem(_cfg())
        for i, Tcw in enumerate(poses):
            img, depth = render(planes, K, Tcw, 320, 240, return_depth=True)
            slam.track_rgbd(img, depth, i / 30.0)
        assert slam.tracking_state == TrackingState.OK
        assert int(slam.map.kf_valid.sum()) > 5  # enough KFs to search

        blank = np.zeros((240, 320), np.float32)
        for i in range(3):
            slam.track_rgbd(blank, blank, (30 + i) / 30.0)
        assert slam.tracking_state == TrackingState.LOST

        # novel views: mapped pose perturbed by 12 cm lateral + 4 deg yaw
        yaw = np.deg2rad(4.0)
        Rp = np.array([[np.cos(yaw), 0, np.sin(yaw)],
                       [0, 1, 0], [-np.sin(yaw), 0, np.cos(yaw)]], np.float32)
        recovered = False
        for j, base in enumerate(poses[8:24:4]):
            Twc = np.linalg.inv(base)
            Twc[:3, :3] = Twc[:3, :3] @ Rp
            Twc[:3, 3] += np.array([0.12, 0.03, 0.0], np.float32)
            T_new = np.linalg.inv(Twc).astype(np.float32)
            img, depth = render(planes, K, T_new, 320, 240, return_depth=True)
            pose = slam.track_rgbd(img, depth, (40 + j) / 30.0)
            if pose is not None:
                C_est = np.linalg.inv(pose)[:3, 3]
                C_gt = (poses[0] @ np.linalg.inv(T_new))[:3, 3]
                err = np.linalg.norm(C_est - C_gt)
                assert err < 0.15, err
                recovered = True
                break
        assert recovered, "no novel-view relocalization in 4 attempts"


class TestLocalizationVOPoints:
    def test_vo_points_augment_and_map_frozen(self, tmp_path):
        """Localization mode spawns temporary VO points from last-frame
        depth (†UpdateLastFrame): they appear in the local buffer with
        sel = -1 and the map never grows."""
        frames, poses = render_sequence(25, K, width=320, height=240,
                                        with_depth=True)
        slam = SlamSystem(_cfg())
        for i, (img, depth) in enumerate(frames):
            slam.track_rgbd(img, depth, i / 30.0)
        path = str(tmp_path / "m.npz")
        slam.save_map(path)

        fresh = SlamSystem(_cfg())
        fresh.load_map(path, localization_only=True)
        n_mp_before = int(fresh.map.mp_valid.sum())
        n_kf_before = int(fresh.map.kf_valid.sum())
        tracked = 0
        saw_temp = False
        tr = fresh.tracker
        orig = tr._augment_vo_points

        def spy(sel, buf):
            nonlocal saw_temp
            sel2, buf2 = orig(sel, buf)
            if (sel2 < 0).any():
                saw_temp = True
            return sel2, buf2

        tr._augment_vo_points = spy
        for i, (img, depth) in enumerate(frames[3:20]):
            if fresh.track_rgbd(img, depth, i / 30.0) is not None:
                tracked += 1
        assert tracked >= 12, tracked
        assert saw_temp, "VO augmentation never produced temporary points"
        assert int(fresh.map.mp_valid.sum()) == n_mp_before
        assert int(fresh.map.kf_valid.sum()) == n_kf_before
