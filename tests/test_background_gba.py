"""Background, interruptible global BA with staged write-back (VERDICT 5).

Inserts keyframes WHILE global BA runs and asserts (a) the map stays
consistent — the new keyframes are corrected through the spanning-tree
propagation at write-back, (b) the map lock is never held for long by the
solver (bounded tracker stall), (c) a newer GBA supersedes a running one
without corruption (†mbStopGBA).
"""

import sys
import time

import numpy as np
import pytest

sys.path.insert(0, "tests")

from test_loop_closing import build_drifted_loop

from orbslam2_tpu.loop_closing import LoopCloser
from orbslam2_tpu.map.keyframe_database import KeyFrameDatabase


def _reproj_med(m, kf, fx=300, fy=300, cx=160, cy=120):
    T = m.kf_pose[kf]
    feats = np.where(m.kf_mp[kf] >= 0)[0]
    mps = m.kf_mp[kf, feats]
    live = m.mp_valid[mps]
    feats, mps = feats[live], mps[live]
    pc = m.mp_pos[mps] @ T[:3, :3].T + T[:3, 3]
    z = np.maximum(pc[:, 2], 1e-6)
    u = fx * pc[:, 0] / z + cx
    v = fy * pc[:, 1] / z + cy
    return float(np.median(
        np.hypot(u - m.kf_xy[kf, feats, 0], v - m.kf_xy[kf, feats, 1])
    ))


class TestBackgroundGBA:
    def test_keyframes_inserted_during_gba(self, rng):
        cfg, m, cam, gt_poses = build_drifted_loop(rng)
        kfdb = KeyFrameDatabase(m)
        lc = LoopCloser(cfg, m, cam, kfdb)
        lc.background_gba = True
        n_kf = len(m.valid_keyframes())
        closed = False
        for kf in range(n_kf):
            with m.lock:
                closed = lc.process_keyframe(kf, run_global_ba=True) or closed
        assert closed
        assert lc.gba_thread is not None

        # while GBA runs: create keyframes the solver has never seen, each
        # re-observing the last keyframe's points from a nudged pose
        src = n_kf - 1
        new_kfs = []
        max_stall = 0.0
        for i in range(3):
            t0 = time.perf_counter()
            with m.lock:
                max_stall = max(max_stall, time.perf_counter() - t0)
                T = m.kf_pose[src].copy()
                T[0, 3] += 0.01 * (i + 1)
                kf = m.add_keyframe(
                    T, m.kf_xy[src], m.kf_desc[src], m.kf_octave[src],
                    m.kf_angle[src], m.kf_feat_valid[src],
                    frame_id=1000 + i, timestamp=40.0 + i,
                )
                for feat in np.where(m.kf_mp[src] >= 0)[0]:
                    mp = int(m.kf_mp[src, feat])
                    if m.mp_valid[mp]:
                        m.add_observation(mp, kf, int(feat))
                m.update_connections(kf)
            new_kfs.append(kf)
            time.sleep(0.02)

        lc.wait_global_ba(timeout=300.0)
        assert not lc.gba_thread.is_alive()
        # the solve must not have monopolized the map lock
        assert max_stall < 0.5, max_stall

        # consistency: finite poses everywhere; old KFs reproject tightly;
        # the mid-GBA keyframes were propagated with their parents
        for kf in m.valid_keyframes():
            assert np.isfinite(m.kf_pose[kf]).all()
        assert _reproj_med(m, 0) < 2.0
        assert _reproj_med(m, n_kf - 1) < 3.0
        for kf in new_kfs:
            e = _reproj_med(m, kf)
            assert e < 15.0, (kf, e)  # nudged pose: small but nonzero error

    def test_newer_gba_supersedes(self, rng):
        cfg, m, cam, gt_poses = build_drifted_loop(rng)
        kfdb = KeyFrameDatabase(m)
        lc = LoopCloser(cfg, m, cam, kfdb)
        n_kf = len(m.valid_keyframes())
        for kf in range(n_kf):
            with m.lock:
                lc.process_keyframe(kf, run_global_ba=False)
        pre = {int(k): m.kf_pose[k].copy() for k in m.valid_keyframes()}
        lc.background_gba = True
        lc.launch_global_ba_background()
        lc.launch_global_ba_background()  # supersede immediately
        lc.wait_global_ba(timeout=300.0)
        for kf in m.valid_keyframes():
            assert np.isfinite(m.kf_pose[kf]).all()
        # the second run completed and wrote back an actual optimization
        moved = any(
            not np.allclose(pre[int(k)], m.kf_pose[k], atol=1e-7)
            for k in m.valid_keyframes()
        )
        assert moved
