"""KITTI-scale capacity: the map must grow past its initial allocation and
keep every structural invariant through growth, culling, slot recycling, and
a 2000-vertex essential-graph optimization (VERDICT r1 item 4 'done' gate).

No rendering/tracking here — keyframes are driven in at keyframe rate with
synthetic features, which is what makes a 1300-KF run affordable on the CPU
suite while still exercising the real MapState/pose-graph code paths.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import pg_fixtures

from orbslam2_tpu.config import CameraConfig, ExtractorConfig, SlamConfig
from orbslam2_tpu.map.state import MapState
from orbslam2_tpu.ops import geometry as geo, pose_graph


def _cfg():
    return SlamConfig(
        sensor="rgbd",
        camera=CameraConfig(fx=260, fy=260, cx=160, cy=120, width=320,
                            height=240, bf=26.0, fps=30),
        extractor=ExtractorConfig(n_features=200, n_levels=4),
    )


def _corridor_pose(i: int) -> np.ndarray:
    """Long forward corridor with gentle yaw — KITTI-like odometry."""
    yaw = 0.0006 * i
    R = np.array([[np.cos(yaw), 0, np.sin(yaw)],
                  [0, 1, 0], [-np.sin(yaw), 0, np.cos(yaw)]], np.float32)
    C = np.array([0.3 * np.sin(0.01 * i), 0.0, 0.8 * i], np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R.T
    T[:3, 3] = -R.T @ C
    return T


class TestMapGrowth:
    def test_1300_keyframes_grow_cull_recycle(self):
        rng = np.random.default_rng(0)
        cfg = _cfg()
        m = MapState.allocate(cfg)
        cap0 = m.kf_valid.shape[0]
        N = m.kf_xy.shape[1]
        n_target = 1300
        assert n_target > cap0, "test must exceed the initial allocation"

        prev_kf = -1
        prev_feats = None
        for i in range(n_target):
            xy = rng.uniform(0, 300, (N, 2)).astype(np.float32)
            desc = rng.integers(0, 256, (N, 32), dtype=np.uint8)
            octv = rng.integers(0, 4, N).astype(np.int32)
            ang = rng.uniform(0, 360, N).astype(np.float32)
            valid = np.ones(N, bool)
            kf = m.add_keyframe(_corridor_pose(i), xy, desc, octv, ang,
                                valid, i, i / 30.0)
            # shared landmarks with the previous keyframe -> covisibility
            if prev_kf >= 0:
                for f in range(0, 60):
                    mp = m.add_map_point(
                        rng.normal(0, 2, 3).astype(np.float32)
                        + np.array([0, 0, 0.8 * i], np.float32), kf)
                    m.add_observation(mp, kf, f)
                    m.add_observation(mp, prev_kf, f + 60)
            m.update_connections(kf)
            # cull every 7th keyframe after a warmup -> slot recycling
            if i % 7 == 3 and prev_kf >= 0 and i > 20:
                victim = prev_kf
                m.remove_keyframe(victim)
                m.recycle_free_slots()
            prev_kf = kf

        live = m.valid_keyframes()
        assert len(live) > 1000
        assert m.kf_valid.shape[0] > cap0, "arrays never grew"

        # invariants: spanning parents and covis targets are live or -1,
        # every observation binds a live pair, ref KFs never dangle
        for k in live:
            p = m.span_parent[k]
            assert p == -1 or m.kf_valid[p], (k, p)
            cv = m.covis_idx[k]
            assert all(m.kf_valid[c] for c in cv[cv >= 0])
        mps = m.valid_map_points()
        ref = m.mp_ref_kf[mps]
        assert m.kf_valid[ref].all(), "dangling reference keyframes"
        obs = m.mp_obs_kf[mps]
        assert m.kf_valid[obs[obs >= 0]].all(), "observations of dead KFs"
        # kf_seq stays strictly monotone in creation order even with
        # recycled slot ids
        seqs = np.sort(m.kf_seq[live])
        assert (np.diff(seqs) > 0).all()


class TestGbaSweep:
    def test_1300_kf_sweep_optimizes_every_pose(self, capsys):
        """VERDICT r4 #6: past the largest single-solve bucket, GBA must
        optimize EVERY keyframe pose (overlapping-window sweep), not just
        the newest window. Build a 1300-KF corridor whose poses carry
        independent local noise (the post-loop-correction regime GBA runs
        in: the essential graph has already removed smooth drift — SURVEY
        §3.4 ordering) while the stored measurements are exactly consistent
        with ground truth; the sweep must shrink the error EVERYWHERE,
        including the oldest keyframes the pre-r5 newest-window truncation
        never touched."""
        from orbslam2_tpu.loop_closing import LoopCloser
        from orbslam2_tpu.map.keyframe_database import KeyFrameDatabase
        from orbslam2_tpu.models.camera import Camera
        from orbslam2_tpu.ops import geometry as geo
        import jax.numpy as jnp

        rng = np.random.default_rng(7)
        cfg = _cfg()
        m = MapState.allocate(cfg)
        NF = m.kf_xy.shape[1]  # feature slots per keyframe
        cam = Camera.create(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                            width=320, height=240)
        n_kf = 1300
        P_NEW, SPAN = 12, 4  # 12 new points per KF, each seen by 4 KFs

        def true_pose(i):
            return _corridor_pose(i)

        def jitter(C):  # local world-side warp CENTERED AT THE CAMERA
            # (a rotation about the world origin would move a camera 1 km
            # down the corridor by meters per mrad — not local noise)
            xi = np.concatenate([
                np.zeros(3),
                rng.normal(0, 0.002, 3),   # 2 mrad rotation noise
            ]).astype(np.float32)
            Wr = np.array(geo.se3_exp(jnp.asarray(xi)))  # writable copy
            Wr[:3, 3] = (C - Wr[:3, :3] @ C
                         + rng.normal(0, 0.02, 3))  # 2 cm translation noise
            return Wr.astype(np.float32)

        # points pending future observations: (mp_id, true_pw, obs_left)
        pending = []
        kf_ids = []
        for i in range(n_kf):
            Tt = true_pose(i)
            C_i = np.linalg.inv(Tt)[:3, 3]
            W = jitter(C_i) if i > 0 else np.eye(4, dtype=np.float32)
            # world-side warp: stored pose / points consistent per KF,
            # exact measurements; see the drift model in _gba_write_back
            Td = (Tt @ np.linalg.inv(W)).astype(np.float32)
            # new world points a few meters ahead of camera i (true frame)
            Twc = np.linalg.inv(Tt)
            pc = np.stack([rng.uniform(-2, 2, P_NEW),
                           rng.uniform(-1.5, 1.5, P_NEW),
                           rng.uniform(3, 8, P_NEW)], 1).astype(np.float32)
            pw_true = pc @ Twc[:3, :3].T + Twc[:3, 3]

            # this KF's measurement slots: project TRUE points through the
            # TRUE pose (exact measurements; noise lives only in the state)
            obs = [(None, p) for p in pw_true] + \
                  [(mp, p) for mp, p, _ in pending]
            xy = np.zeros((NF, 2), np.float32)
            valid = np.zeros(NF, bool)
            feats = []
            for slot, (mp, pw) in enumerate(obs[:NF]):
                pci = Tt[:3, :3] @ pw + Tt[:3, 3]
                u = 260.0 * pci[0] / pci[2] + 160.0
                v = 260.0 * pci[1] / pci[2] + 120.0
                xy[slot] = (u, v)
                valid[slot] = True
                feats.append((slot, mp, pw))
            kf = m.add_keyframe(
                Td, xy, rng.integers(0, 256, (NF, 32), dtype=np.uint8),
                np.zeros(NF, np.int32), np.zeros(NF, np.float32),
                valid, i, i / 30.0,
            )
            kf_ids.append(kf)
            new_pending = []
            for slot, mp, pw in feats:
                if mp is None:
                    # stored point = true point under this KF's local warp
                    pw_stored = W[:3, :3] @ pw + W[:3, 3]
                    mp = m.add_map_point(pw_stored.astype(np.float32), kf)
                    new_pending.append((mp, pw, SPAN - 1))
                m.add_observation(mp, kf, slot)
            m.update_connections(kf)
            pending = new_pending + [
                (mp, p, left - 1) for mp, p, left in pending if left > 1
            ]

        lc = LoopCloser(cfg, m, cam, KeyFrameDatabase(m))
        gt_c = np.stack([np.linalg.inv(true_pose(i))[:3, 3]
                         for i in range(n_kf)])

        def rms_err(sl):
            est = np.stack([np.linalg.inv(m.kf_pose[k])[:3, 3]
                            for k in kf_ids[sl]])
            return float(np.sqrt(((est - gt_c[sl]) ** 2).sum(1).mean()))

        whole, oldest = slice(None), slice(0, n_kf - 256)
        e_pre, e_pre_old = rms_err(whole), rms_err(oldest)
        assert e_pre > 0.015, "noise construction must produce real error"
        lc.global_bundle_adjustment(
            iters=8, obs_cap=SPAN, sweep_window=64, sweep_points=4096,
            sweep_overlap=16,
        )
        out = capsys.readouterr().out
        assert "sweep:" in out, out
        assert "newest window" not in out  # no truncation print
        assert np.isfinite(m.kf_pose[kf_ids]).all()
        e_post, e_post_old = rms_err(whole), rms_err(oldest)
        assert e_post < 0.3 * e_pre, (e_pre, e_post)
        # the pre-r5 truncation left every KF older than the newest 256
        # untouched; the sweep must improve them too
        assert e_post_old < 0.3 * e_pre_old, (e_pre_old, e_post_old)


class TestEssentialGraphScale:
    @pytest.mark.parametrize("K", [2000])
    def test_odometry_chain_with_loop(self, K):
        """2000-vertex drifted odometry chain + loop closure edge converges
        through the CG solver and write-back division stays finite."""
        S_true = pg_fixtures.corridor_sim3(K)
        ei = list(range(1, K)) + [0]
        ej = list(range(0, K - 1)) + [K - 1]
        for k in range(0, K - 10, 15):  # covisibility edges
            ei.append(k + 7)
            ej.append(k)
        Sij = pg_fixtures.relative_edges(S_true, ei, ej)
        # integrate with translation+scale drift (rotation-free residuals —
        # exactly the regime that needs the so3_log autodiff guard)
        drift = np.zeros(7, np.float32)
        drift[2] = 0.004
        drift[6] = 0.0004
        S_init = pg_fixtures.integrate_drift(Sij[: K - 1], S_true[0], drift)
        fixed = np.zeros(K, bool)
        fixed[0] = True
        res = pose_graph.optimize_pose_graph(
            jnp.asarray(S_init), jnp.asarray(fixed), jnp.ones(K, bool),
            jnp.asarray(np.asarray(ei, np.int32)),
            jnp.asarray(np.asarray(ej, np.int32)),
            jnp.asarray(Sij), jnp.ones(len(Sij), bool),
            iters=20,
        )
        S_opt = np.asarray(res.poses)
        assert np.isfinite(S_opt).all()
        scales = np.asarray(geo.sim3_s(jnp.asarray(S_opt)))
        assert np.abs(np.log(scales)).max() < 0.05  # drift scale removed

        def center(S8):
            Sj = jnp.asarray(S8)
            R = np.asarray(geo.sim3_R(Sj))
            t = np.asarray(geo.sim3_t(Sj))
            return -R.T @ t / float(geo.sim3_s(Sj))

        e_init = np.linalg.norm(center(S_init[K - 1]) - center(S_true[K - 1]))
        e_opt = np.linalg.norm(center(S_opt[K - 1]) - center(S_true[K - 1]))
        assert e_opt < 0.2 * e_init, (e_init, e_opt)
