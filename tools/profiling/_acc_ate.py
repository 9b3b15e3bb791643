"""ATE on synthetic forward + orbit trajectories (rgbd + mono), any backend.

Usage: python tools/profiling/_acc_ate.py [forward|orbit|both] [rgbd|mono|both]
"""
import sys
import numpy as np

sys.path.insert(0, "/root/repo")
from orbslam2_tpu.config import CameraConfig, ExtractorConfig, SlamConfig
from orbslam2_tpu.system import SlamSystem
from orbslam2_tpu.utils.synthetic import render_sequence, orbit_trajectory

H, W = 480, 640
K = np.array([[520.0, 0, W / 2], [0, 520.0, H / 2], [0, 0, 1]], np.float32)


def forward_trajectory(n):
    poses = []
    for i in range(n):
        T = np.eye(4, dtype=np.float32)
        t = i / max(n - 1, 1)
        T[2, 3] = -1.6 * t          # forward 1.6 m
        T[0, 3] = 0.25 * np.sin(2.2 * np.pi * t)
        th = 0.12 * np.sin(2 * np.pi * t)
        c, s = np.cos(th), np.sin(th)
        T[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        poses.append(T)
    return poses


def ate_rmse(traj, gt):
    # align with Horn (similarity without scale for rgbd; with for mono)
    est = np.array([np.linalg.inv(T)[:3, 3] for _, _, T in traj])
    ids = np.array([f for f, _, _ in traj])
    ref = np.array([np.linalg.inv(gt[f])[:3, 3] for f in ids])
    mu_e, mu_r = est.mean(0), ref.mean(0)
    E, R_ = est - mu_e, ref - mu_r
    U, S, Vt = np.linalg.svd(E.T @ R_)
    D = np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))])
    Rot = (U @ D @ Vt).T
    s = np.trace(np.diag(S) @ D) / (E ** 2).sum() if (E**2).sum() > 0 else 1.0
    err = R_ - s * (E @ Rot.T)
    return float(np.sqrt((err ** 2).sum(1).mean()))


def run(kind, sensor, n=150):
    traj_fn = forward_trajectory(n) if kind == "forward" else orbit_trajectory(n)
    frames, gt = render_sequence(n, K, width=W, height=H,
                                 with_depth=(sensor == "rgbd"),
                                 trajectory=traj_fn)
    cfg = SlamConfig(sensor=sensor,
        camera=CameraConfig(fx=520, fy=520, cx=W/2, cy=H/2, width=W, height=H,
                            bf=52.0, fps=30),
        extractor=ExtractorConfig(n_features=1000, n_levels=8))
    slam = SlamSystem(cfg)
    for i in range(n):
        if sensor == "rgbd":
            img, dep = frames[i]
            slam.track_rgbd(img, dep, i / 30.0)
        else:
            img = frames[i] if not isinstance(frames[i], tuple) else frames[i][0]
            slam.track_mono(img, i / 30.0)
    traj = slam.tracker.trajectory
    if len(traj) < n // 2:
        print(f"{kind}/{sensor}: TRACK FAILED ({len(traj)}/{n} frames)")
        return
    rmse = ate_rmse(traj, gt)
    print(f"{kind:8s}/{sensor:5s}: ATE {rmse*100:6.2f} cm over {len(traj)}/{n} frames, "
          f"kfs={len(slam.map.valid_keyframes())} pts={int(slam.map.mp_valid.sum())}")


kinds = sys.argv[1] if len(sys.argv) > 1 else "both"
sensors = sys.argv[2] if len(sys.argv) > 2 else "rgbd"
for k in (["forward", "orbit"] if kinds == "both" else [kinds]):
    for sn in (["rgbd", "monocular"] if sensors == "both" else
               ["monocular" if sensors == "mono" else sensors]):
        run(k, sn)
