"""Per-frame matching-recall diagnostic on the synthetic box room.

Measures the quantity VERDICT round-1 asked for directly: per-frame
matched / frustum-candidates for the local-map tracker, plus ATE, so recall
fixes can be A/B'd without guessing from ATE alone.

Usage:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/diag_recall.py [mono|rgbd|orbit]
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from orbslam2_tpu.config import CameraConfig, ExtractorConfig, SlamConfig
from orbslam2_tpu.system import SlamSystem
from orbslam2_tpu.utils.evaluation import ate_rmse
from orbslam2_tpu.utils.synthetic import render_sequence, orbit_trajectory

K = np.array([[260.0, 0, 160], [0, 260, 120], [0, 0, 1]], np.float32)
W, H = 320, 240


def cfg(sensor):
    return SlamConfig(
        sensor=sensor,
        camera=CameraConfig(
            fx=260, fy=260, cx=160, cy=120, width=W, height=H,
            bf=26.0 if sensor == "rgbd" else 0.0, fps=30,
        ),
        extractor=ExtractorConfig(n_features=500, n_levels=4),
    )


def main(mode="mono"):
    if mode == "orbit":
        # rotation-heavy: 2.5 orbits (the lifecycle-stress trajectory class)
        traj = orbit_trajectory(120, radius=0.4, advance=0.01, yaw_rate=0.013)
        frames, poses = render_sequence(
            120, K, width=W, height=H, with_depth=True, trajectory=traj
        )
        sensor = "rgbd"
    elif mode == "rgbd":
        frames, poses = render_sequence(36, K, width=W, height=H, with_depth=True)
        sensor = "rgbd"
    else:
        frames, poses = render_sequence(50, K, width=W, height=H)
        sensor = "monocular"

    slam = SlamSystem(cfg(sensor))
    tracker = slam.tracker
    recalls, est, gt = [], [], []
    stats = []

    orig_unpack = tracker._unpack_fused

    def unpack_spy(packed):
        out = orig_unpack(packed)
        _, n_motion, n_final, inl, _, frustum = out
        stats.append((int(frustum.sum()), int(inl.sum()), n_final))
        return out

    tracker._unpack_fused = unpack_spy

    for i, item in enumerate(frames):
        if sensor == "rgbd":
            img, depth = item
            pose = slam.track_rgbd(img, depth, i / 30.0)
        else:
            pose = slam.track_monocular(item, i / 30.0)
        if pose is not None:
            est.append(np.linalg.inv(pose)[:3, 3])
            gt.append(np.linalg.inv(poses[i])[:3, 3])
        if stats:
            fr, mv, ni = stats[-1]  # last pass of this frame
            if fr > 0:
                recalls.append(mv / fr)

    err = ate_rmse(
        np.array(est), np.array(gt), with_scale=(sensor == "monocular")
    )
    r = np.array(recalls)
    print(f"mode={mode} tracked={len(est)}/{len(frames)}")
    print(
        f"recall matched/frustum: mean={r.mean():.3f} p10={np.percentile(r,10):.3f} "
        f"p50={np.percentile(r,50):.3f} p90={np.percentile(r,90):.3f}"
    )
    fr_arr = np.array([s[0] for s in stats])
    ni_arr = np.array([s[2] for s in stats])
    print(f"frustum candidates: mean={fr_arr.mean():.0f}  inliers: mean={ni_arr.mean():.0f}")
    print(f"ATE rmse = {err*100:.2f} cm")
    mstats = slam.map
    print(
        f"KFs={len(mstats.valid_keyframes())} MPs={len(mstats.valid_map_points())}"
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "mono")
