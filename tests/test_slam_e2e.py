"""End-to-end SLAM integration tests on the synthetic box-room world.

The reference's integration "tests" are dataset runs checked offline with
the TUM scripts (SURVEY §4); here the renderer gives exact ground truth, so
ATE is asserted in-process. These are the slowest tests in the suite (full
pipeline incl. jit compiles) but the only ones that exercise the whole stack.
"""

import numpy as np
import pytest

from orbslam2_tpu.config import CameraConfig, ExtractorConfig, SlamConfig
from orbslam2_tpu.system import SlamSystem
from orbslam2_tpu.tracking import TrackingState
from orbslam2_tpu.utils.evaluation import ate_rmse, rpe
from orbslam2_tpu.utils.synthetic import render_sequence

K = np.array([[260.0, 0, 160], [0, 260, 120], [0, 0, 1]], np.float32)
W, H = 320, 240


def _cfg(sensor):
    return SlamConfig(
        sensor=sensor,
        camera=CameraConfig(
            fx=260, fy=260, cx=160, cy=120, width=W, height=H,
            bf=(52.0 if sensor == "stereo" else 26.0) if sensor != "monocular" else 0.0,
            fps=30,
        ),
        extractor=ExtractorConfig(n_features=500, n_levels=4),
    )


@pytest.fixture(scope="module")
def rgbd_sequence():
    return render_sequence(36, K, width=W, height=H, with_depth=True)


@pytest.fixture(scope="module")
def mono_sequence():
    return render_sequence(50, K, width=W, height=H, with_depth=False)


@pytest.fixture(scope="module")
def stereo_sequence():
    """True left/right pairs: the right camera is the left pose shifted by
    the rig baseline along camera +x (bf=52, fx=260 -> b=0.2 m)."""
    from orbslam2_tpu.utils.synthetic import make_box_room, orbit_trajectory, render

    b = 52.0 / 260.0
    planes = make_box_room(seed=0)
    poses = orbit_trajectory(30)
    pairs = []
    Trl = np.eye(4, dtype=np.float32)
    Trl[0, 3] = -b  # right cam: x_r = x_l - b
    for Tcw in poses:
        left = render(planes, K, Tcw, W, H)
        right = render(planes, K, Trl @ Tcw, W, H)
        pairs.append((left, right))
    return pairs, poses


class TestStereoPipeline:
    def test_tracks_and_ate(self, stereo_sequence):
        """Full stereo path: dual extraction, epipolar match + subpixel SAD,
        close-point KF gates, stereo triangulation arbitration."""
        pairs, poses = stereo_sequence
        slam = SlamSystem(_cfg("stereo"))
        est, gt = [], []
        for i, ((left, right), Tcw_true) in enumerate(zip(pairs, poses)):
            pose = slam.track_stereo(left, right, i / 30.0)
            if pose is not None:
                est.append(np.linalg.inv(pose)[:3, 3])
                gt.append(np.linalg.inv(Tcw_true)[:3, 3])
        assert len(est) >= len(pairs) - 1, len(est)
        err = ate_rmse(np.array(est), np.array(gt), with_scale=False)
        # measured 2.6 cm (round 2); round-1 recall fixes brought rotation-
        # heavy ATE to reference class — bound with ~1.7x margin
        assert err < 0.045, err
        m = slam.map
        # stereo depth must actually be measured (ur >= 0 on real features)
        kfs = m.valid_keyframes()
        ur = m.kf_ur[kfs]
        valid_feats = m.kf_feat_valid[kfs]
        frac_stereo = (ur[valid_feats] >= 0).mean()
        assert frac_stereo > 0.3, frac_stereo


class TestRgbdPipeline:
    def test_tracks_and_ate(self, rgbd_sequence):
        frames, poses = rgbd_sequence
        slam = SlamSystem(_cfg("rgbd"))
        est, gt = [], []
        for i, ((img, depth), Tcw_true) in enumerate(zip(frames, poses)):
            pose = slam.track_rgbd(img, depth, i / 30.0)
            if pose is not None:
                est.append(np.linalg.inv(pose)[:3, 3])
                gt.append(np.linalg.inv(Tcw_true)[:3, 3])
        assert len(est) == len(frames)  # never lost
        err = ate_rmse(np.array(est), np.array(gt), with_scale=False)
        assert err < 0.035, err  # measured 2.0 cm (round 2), ~1.7x margin
        assert slam.tracking_state == TrackingState.OK
        m = slam.map
        assert len(m.valid_keyframes()) >= 3
        assert len(m.valid_map_points()) > 300
        # observation invariants: every kf_mp entry points to a live point
        for kf in m.valid_keyframes():
            mps = m.kf_mp[kf][m.kf_mp[kf] >= 0]
            assert m.mp_valid[mps].all()

    def test_trajectory_export(self, rgbd_sequence, tmp_path):
        frames, poses = rgbd_sequence
        slam = SlamSystem(_cfg("rgbd"))
        for i, (img, depth) in enumerate(frames[:10]):
            slam.track_rgbd(img, depth, i / 30.0)
        tum = tmp_path / "traj.txt"
        kitti = tmp_path / "traj_kitti.txt"
        slam.save_trajectory_tum(str(tum))
        slam.save_trajectory_kitti(str(kitti))
        lines = tum.read_text().strip().splitlines()
        assert len(lines) == 10
        assert len(lines[0].split()) == 8
        klines = kitti.read_text().strip().splitlines()
        assert len(klines[0].split()) == 12


class TestMonoPipeline:
    def test_initializes_and_tracks(self, mono_sequence):
        frames, poses = mono_sequence
        slam = SlamSystem(_cfg("monocular"))
        est, gt = [], []
        for i, (img, Tcw_true) in enumerate(zip(frames, poses)):
            pose = slam.track_monocular(img, i / 30.0)
            if pose is not None:
                est.append(np.linalg.inv(pose)[:3, 3])
                gt.append(np.linalg.inv(Tcw_true)[:3, 3])
        assert len(est) >= 25  # initialized within the parallax budget
        err = ate_rmse(np.array(est), np.array(gt), with_scale=True)
        assert err < 0.035, err  # measured 1.7 cm (round 2), ~2x margin
        assert slam.tracking_state == TrackingState.OK

    def test_reset(self, mono_sequence):
        frames, _ = mono_sequence
        slam = SlamSystem(_cfg("monocular"))
        for i, img in enumerate(frames[:12]):
            slam.track_monocular(img, i / 30.0)
        slam.reset()
        assert slam.tracking_state == TrackingState.NO_IMAGES_YET
        assert len(slam.map.valid_keyframes()) == 0
        # can re-run after reset
        for i, img in enumerate(frames[:5]):
            slam.track_monocular(img, i / 30.0)


