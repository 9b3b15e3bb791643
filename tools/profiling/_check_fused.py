"""CPU check: pipelined tracking with the fused frame program tracks the
synthetic sequence and matches the split path's trajectory closely."""
import numpy as np
from orbslam2_tpu.config import CameraConfig, ExtractorConfig, SlamConfig
from orbslam2_tpu.pipeline import AsyncSlamSystem
from orbslam2_tpu.utils.synthetic import render_sequence

H, W = 240, 320
K = np.array([[260.0, 0, W / 2], [0, 260.0, H / 2], [0, 0, 1]], np.float32)


def run(use_fused):
    import orbslam2_tpu.tracking as T
    cfg = SlamConfig(sensor="rgbd",
        camera=CameraConfig(fx=260, fy=260, cx=W/2, cy=H/2, width=W, height=H,
                            bf=26.0, fps=30),
        extractor=ExtractorConfig(n_features=600, n_levels=8))
    frames, gt = render_sequence(60, K, width=W, height=H, with_depth=True)
    slam = AsyncSlamSystem(cfg)
    if not use_fused:
        # force the split path by pretending frames are stereo? simpler:
        # monkeypatch _dispatch_frame_full to the old sequence
        orig = T.Tracker.track_pipelined
        def patched(self, img, ts, depth_map=None, right_img=None):
            import time
            t_start = time.perf_counter()
            frame = self._make_frame(img, ts, depth_map, right_img)
            if self.state in (T.TrackingState.NO_IMAGES_YET,
                              T.TrackingState.NOT_INITIALIZED,
                              T.TrackingState.LOST):
                self.flush_pipeline()
                return self._track_core(frame, t_start)
            sel, packed = self._dispatch_track_chained(frame)
            self._pending.append((frame, sel, packed, t_start))
            prev = None
            d = max(int(self.cfg.runtime.pipeline_depth), 1)
            while len(self._pending) > d:
                prev = self._commit_pending_one()
            return prev
        slam.tracker.track_pipelined = patched.__get__(slam.tracker)
    for i, (img, dep) in enumerate(frames):
        slam.track_rgbd(img, dep, i / 30.0)
    slam.tracker.flush_pipeline()
    traj = {f: T_ for f, ts, T_ in slam.tracker.trajectory}
    n_pts = int(slam.map.mp_valid.sum())
    slam.shutdown()
    errs = []
    for f, T_ in traj.items():
        if f < len(gt):
            errs.append(np.linalg.norm(np.linalg.inv(T_)[:3, 3]
                                       - np.linalg.inv(gt[f])[:3, 3]))
    return np.array(errs), n_pts


e_f, np_f = run(True)
print(f"fused: frames={len(e_f)} ate_rmse={np.sqrt((e_f**2).mean()):.4f} max={e_f.max():.4f} pts={np_f}")
e_s, np_s = run(False)
print(f"split: frames={len(e_s)} ate_rmse={np.sqrt((e_s**2).mean()):.4f} max={e_s.max():.4f} pts={np_s}")
