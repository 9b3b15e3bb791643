"""Debug the async rendered-circuit loop closure: where does ATE degrade?

PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/profiling/_loop_circuit2.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from orbslam2_tpu.config import CameraConfig, ExtractorConfig, SlamConfig
from orbslam2_tpu.pipeline import AsyncSlamSystem
from orbslam2_tpu.utils.evaluation import ate_rmse
from orbslam2_tpu.utils.synthetic import make_box_room, render

W, H = 320, 240
K = np.array([[260.0, 0, W / 2], [0, 260.0, H / 2], [0, 0, 1]], np.float32)
N_FRAMES = 240
LAPS = 1.25


def circuit_poses(n):
    poses = []
    for i in range(n):
        th = 2 * np.pi * LAPS * i / n
        C = 3.0 * np.array([np.sin(th), 0.0, np.cos(th)], np.float32)
        C[1] = 0.08 * np.sin(0.11 * i)
        Rwc = np.array([
            [np.cos(th), 0, np.sin(th)], [0, 1, 0],
            [-np.sin(th), 0, np.cos(th)]], np.float32)
        Tcw = np.eye(4, dtype=np.float32)
        Tcw[:3, :3] = Rwc.T
        Tcw[:3, 3] = -Rwc.T @ C
        poses.append(Tcw)
    return poses


def main():
    planes = make_box_room(seed=3, size=10.0, height=3.0)
    poses = circuit_poses(N_FRAMES)
    frames = [render(planes, K, T, W, H, return_depth=True) for T in poses]
    print("rendered")

    cfg = SlamConfig(
        sensor="rgbd",
        camera=CameraConfig(fx=260, fy=260, cx=W / 2, cy=H / 2, width=W,
                            height=H, bf=26.0, fps=30),
        extractor=ExtractorConfig(n_features=600, n_levels=4),
    )
    cfg.runtime.pipeline_depth_max = int(__import__('os').environ.get('DEPTH_MAX', 10))
    slam = AsyncSlamSystem(cfg)

    def kf_ate():
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

    lc = slam.loop_closer

    orig_detect = lc._detect_loop
    def detect(kf):
        c = orig_detect(kf)
        if c is not None:
            print(f"[dbg] DetectLoop: kf={kf} seq={slam.map.kf_seq[kf]} "
                  f"cand={c} seq={slam.map.kf_seq[c]} ate={kf_ate():.4f}",
                  flush=True)
        return c
    lc._detect_loop = detect

    orig_correct = lc._correct_loop
    def correct(kf, loop_kf, S12, run_global_ba):
        print(f"[dbg] pre-correct  ate={kf_ate():.4f} S12={np.round(S12, 3).tolist()}",
              flush=True)
        out = orig_correct(kf, loop_kf, S12, run_global_ba)
        print(f"[dbg] post-correct ate={kf_ate():.4f}", flush=True)
        return out
    lc._correct_loop = correct

    orig_eg = lc._optimize_essential_graph
    def eg(kf, loop_kf, pre_poses, corrected):
        print(f"[dbg] pre-essential  ate={kf_ate():.4f}", flush=True)
        out = orig_eg(kf, loop_kf, pre_poses, corrected)
        print(f"[dbg] post-essential ate={kf_ate():.4f}", flush=True)
        return out
    lc._optimize_essential_graph = eg

    orig_gba = lc.global_bundle_adjustment
    def gba(*a, **kw):
        print(f"[dbg] pre-GBA  ate={kf_ate():.4f}", flush=True)
        out = orig_gba(*a, **kw)
        print(f"[dbg] post-GBA ate={kf_ate():.4f}", flush=True)
        return out
    lc.global_bundle_adjustment = gba

    m = slam.map

    def kf_err(k):
        fid = int(m.kf_frame_id[k])
        gt = np.linalg.inv(poses[fid])[:3, 3]
        return float(np.linalg.norm(np.linalg.inv(m.kf_pose[k])[:3, 3] - gt))

    orig_wb = lc._gba_write_back
    def wb(kfs, opt_mask, new_poses, mp_ids, new_points):
        snap = [k for k in kfs if m.kf_valid[k]]
        other = [int(k) for k in m.valid_keyframes() if k not in set(snap)]
        def stats(ks):
            if not ks:
                return "none"
            e = [kf_err(k) for k in ks]
            return f"n={len(ks)} mean={np.mean(e):.3f} max={np.max(e):.3f}"
        print(f"[dbg] WB before: snap[{stats(snap)}] new[{stats(other)}]",
              flush=True)
        out = orig_wb(kfs, opt_mask, new_poses, mp_ids, new_points)
        print(f"[dbg] WB after:  snap[{stats(snap)}] new[{stats(other)}]",
              flush=True)
        return out
    lc._gba_write_back = wb

    for i, (img, depth) in enumerate(frames):
        slam.track_rgbd(img, depth, i / 30.0)
        if i % 40 == 0:
            a = kf_ate()
            print(f"frame {i}: kfs={len(slam.map.valid_keyframes())} "
                  f"loops={lc.loops_closed} ate={a if a is None else round(a,4)}",
                  flush=True)
    slam.shutdown()
    print(f"final: loops={lc.loops_closed} ate={kf_ate():.4f}")
    # per-frame committed trajectory error (raw, unaligned: SLAM world =
    # room world here because frame 0 is identity in circuit_poses? no —
    # frame 0 pose is the first camera; compare RELATIVE to gt directly
    # since both share the first frame's frame)
    T0_slam = slam.tracker.trajectory[0][2]
    T0_gt = poses[slam.tracker.trajectory[0][0]]
    inl = {d["frame"]: d["inliers"] for d in slam.tracker.metrics}
    for fid, ts, Tcw in slam.tracker.trajectory:
        if fid % 5:
            continue
        est = np.linalg.inv(T0_slam @ np.linalg.inv(Tcw))[:3, 3] * 0
        # error via relative-to-first-frame centers
        c_est = np.linalg.inv(Tcw @ np.linalg.inv(T0_slam))[:3, 3]
        c_gt = np.linalg.inv(poses[fid] @ np.linalg.inv(T0_gt))[:3, 3]
        print(f"traj f{fid}: err={np.linalg.norm(c_est - c_gt):.3f} "
              f"inl={inl.get(fid, -1)}")


if __name__ == "__main__":
    main()
