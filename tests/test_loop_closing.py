"""Loop-closing pipeline test on a synthetically drifted keyframe circle.

Builds a MapState describing a camera loop where accumulated drift separates
the revisit from the start (so covisibility does NOT connect them), with
identical descriptors for re-observed world points. Verifies detection
(BoW candidates + 3-consistency), Sim3 computation, and that the correction
shrinks the drift.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from orbslam2_tpu.config import SlamConfig, CameraConfig, ExtractorConfig, MapCapacityConfig
from orbslam2_tpu.map.state import MapState
from orbslam2_tpu.map.keyframe_database import KeyFrameDatabase
from orbslam2_tpu.loop_closing import LoopCloser
from orbslam2_tpu.models.camera import Camera
from orbslam2_tpu.ops import geometry as geo


def build_drifted_loop(rng, n_kf=16, n_pts_per_kf=120):
    cfg = SlamConfig(
        sensor="rgbd",
        camera=CameraConfig(fx=300, fy=300, cx=160, cy=120, width=320,
                            height=240, bf=30.0, fps=30),
        extractor=ExtractorConfig(n_features=256, n_levels=4),
        capacity=MapCapacityConfig(max_keyframes=64, max_map_points=8192),
    )
    m = MapState.allocate(cfg)
    cam = Camera.create(300, 300, 160, 120, bf=30.0, width=320, height=240)

    # world points on a cylinder wall around the circular path
    radius = 5.0
    npts = 800
    angles = rng.uniform(0, 2 * np.pi, npts)
    pts_w = np.stack([
        8.0 * np.sin(angles), rng.uniform(-2, 2, npts), 8.0 * np.cos(angles)
    ], axis=1).astype(np.float32)
    descs = rng.integers(0, 256, size=(npts, 32)).astype(np.uint8)

    # ground-truth poses around the circle (look outward)
    def pose_at(a):
        Rwc = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                        [-np.sin(a), 0, np.cos(a)]], np.float32)
        C = np.array([radius * np.sin(a) * 0.3, 0, radius * np.cos(a) * 0.3],
                     np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = Rwc.T
        T[:3, 3] = -Rwc.T @ C
        return T

    # drift: grows linearly, peaks at the revisit
    def drifted(T, k):
        d = np.eye(4, dtype=np.float32)
        d[:3, 3] = np.float32([0.04, 0.015, -0.03]) * k  # up to ~0.7m
        return T @ d

    # full circle + a 3-keyframe revisit of the start arc (so three
    # consecutive keyframes see loop candidates — the consistency gate
    # requires it, †mnCovisibilityConsistencyTh=3)
    gt_poses = []
    for k in range(n_kf):
        a = 2 * np.pi * k / n_kf
        gt_poses.append(pose_at(a))
    for j in range(4):
        gt_poses.append(pose_at(2 * np.pi * j / n_kf))
    n_kf = len(gt_poses)

    world_to_mp = {}
    revisit_mp = {}  # the revisit re-creates duplicate points (as real SLAM
    # would under drift: old points don't project close enough to fuse)
    for k in range(n_kf):
        T_true = gt_poses[k]
        T_map = drifted(T_true, k) if k > 0 else T_true
        # project true world points with the TRUE pose to decide visibility
        pc = pts_w @ T_true[:3, :3].T + T_true[:3, 3]
        z = pc[:, 2]
        u = 300 * pc[:, 0] / np.maximum(z, 1e-6) + 160
        v = 300 * pc[:, 1] / np.maximum(z, 1e-6) + 120
        vis = (z > 1.0) & (u >= 20) & (u < 300) & (v >= 20) & (v < 220)
        vis_idx = np.where(vis)[0][:n_pts_per_kf]

        N = cfg.extractor.max_keypoints
        xy = np.zeros((N, 2), np.float32)
        dsc = np.zeros((N, 32), np.uint8)
        octv = np.zeros(N, np.int32)
        ang = np.zeros(N, np.float32)
        fv = np.zeros(N, bool)
        xy[: len(vis_idx), 0] = u[vis_idx]
        xy[: len(vis_idx), 1] = v[vis_idx]
        dsc[: len(vis_idx)] = descs[vis_idx]
        fv[: len(vis_idx)] = True
        kf = m.add_keyframe(T_map, xy, dsc, octv, ang, fv, frame_id=k,
                            timestamp=k / 30.0)
        # map points live at DRIFTED positions consistent with the map pose:
        # p_map = T_map^-1 (T_true p_true)
        Tm_inv = np.linalg.inv(T_map)
        for j, w in enumerate(vis_idx):
            pc_true = pts_w[w] @ T_true[:3, :3].T + T_true[:3, 3]
            p_map = Tm_inv[:3, :3] @ pc_true + Tm_inv[:3, 3]
            if w not in world_to_mp:
                mp = m.add_map_point(p_map.astype(np.float32), kf)
                world_to_mp[w] = mp
            mp = world_to_mp[w]
            if k >= n_kf - 4 and int(m.mp_ref_kf[mp]) <= 3:
                if w not in revisit_mp:
                    revisit_mp[w] = m.add_map_point(p_map.astype(np.float32), kf)
                mp = revisit_mp[w]
            m.add_observation(mp, kf, j)
        m.update_connections(kf)
    mp_all = m.valid_map_points()
    m.update_point_attributes(mp_all)
    return cfg, m, cam, gt_poses


class TestLoopClosing:
    def test_detect_and_correct(self, rng):
        cfg, m, cam, gt_poses = build_drifted_loop(rng)
        kfdb = KeyFrameDatabase(m)
        lc = LoopCloser(cfg, m, cam, kfdb)
        n_kf = len(m.valid_keyframes())

        closed = False
        for kf in range(n_kf):
            closed = lc.process_keyframe(kf, run_global_ba=False) or closed
        assert closed, "loop was not detected/corrected"

        # drift at the last keyframe is reduced vs the injected ~0.7m
        last = n_kf - 1
        T_opt = m.kf_pose[last]
        T_true = gt_poses[last]
        err = np.linalg.norm(
            np.asarray(geo.se3_log(
                jnp.asarray(T_opt) @ geo.se3_inverse(jnp.asarray(T_true))
            ))
        )
        inj = np.linalg.norm(np.float32([0.04, 0.015, -0.03]) * last)
        assert err < 0.5 * inj, (err, inj)

        # map consistency after correction: points must still reproject onto
        # their observed features (guards against double-applying the
        # correction during the essential-graph write-back)
        errs = []
        for kf in (0, last // 2, last):
            T = m.kf_pose[kf]
            feats = np.where(m.kf_mp[kf] >= 0)[0]
            mps = m.kf_mp[kf, feats]
            live = m.mp_valid[mps]
            feats, mps = feats[live], mps[live]
            pc = m.mp_pos[mps] @ T[:3, :3].T + T[:3, 3]
            z = np.maximum(pc[:, 2], 1e-6)
            u = 300 * pc[:, 0] / z + 160
            v = 300 * pc[:, 1] / z + 120
            e = np.hypot(u - m.kf_xy[kf, feats, 0], v - m.kf_xy[kf, feats, 1])
            errs.append(np.median(e))
        # with SearchBySim3 + OptimizeSim3 the corrected map reprojects at
        # sub-pixel medians (round-1 bound was 5 px pre-refinement)
        assert max(errs) < 1.0, errs

        # SearchAndFuse replaced revisit duplicates with the original
        # loop-side landmarks: the last keyframe now observes early points
        last_mps = m.kf_mp[last][m.kf_mp[last] >= 0]
        last_mps = last_mps[m.mp_valid[last_mps]]
        n_orig = (m.mp_first_kf[last_mps] <= 3).sum()
        assert n_orig >= 10, n_orig

    def test_no_loop_without_revisit(self, rng):
        cfg, m, cam, _ = build_drifted_loop(rng, n_kf=8)
        kfdb = KeyFrameDatabase(m)
        lc = LoopCloser(cfg, m, cam, kfdb)
        # only first half processed: no revisit => no closure
        closed = False
        for kf in range(4):
            closed = lc.process_keyframe(kf, run_global_ba=False) or closed
        assert not closed
