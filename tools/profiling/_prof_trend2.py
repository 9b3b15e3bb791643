import time
import numpy as np
from orbslam2_tpu.config import CameraConfig, ExtractorConfig, SlamConfig
from orbslam2_tpu.pipeline import AsyncSlamSystem
from orbslam2_tpu.utils.synthetic import render_sequence
import orbslam2_tpu.tracking as T

H, W = 480, 640
K = np.array([[520.0, 0, W / 2], [0, 520.0, H / 2], [0, 0, 1]], np.float32)
cfg = SlamConfig(sensor="rgbd",
    camera=CameraConfig(fx=520, fy=520, cx=W/2, cy=H/2, width=W, height=H, bf=52.0, fps=30),
    extractor=ExtractorConfig(n_features=1000, n_levels=8))
frames, poses = render_sequence(150, K, width=W, height=H, with_depth=True)

cur = {}
def wrap(name):
    orig = getattr(T.Tracker, name)
    def f(*a, **kw):
        t0 = time.perf_counter()
        r = orig(*a, **kw)
        cur[name] = cur.get(name, 0.0) + time.perf_counter() - t0
        return r
    setattr(T.Tracker, name, f)
for n in ("_make_frame", "_unpack_fused", "_create_keyframe", "_gather_local_points", "_dispatch_track"):
    wrap(n)

slam = AsyncSlamSystem(cfg)
slam.warmup()
rows = []
for i, (img, depth) in enumerate(frames):
    cur.clear()
    t0 = time.perf_counter()
    slam.track_rgbd(img, depth, i / 30.0)
    dt = (time.perf_counter() - t0) * 1000
    rows.append((i, dt, {k: v*1000 for k, v in cur.items()}))
slow = sorted(rows[30:], key=lambda r: -r[1])[:15]
for i, dt, c in sorted(slow):
    parts = " ".join(f"{k[1:9]}={v:.0f}" for k, v in sorted(c.items(), key=lambda kv:-kv[1]) if v > 5)
    print(f"f{i:3d} {dt:7.1f}ms  {parts}")
a = np.array([r[1] for r in rows[30:]])
print(f"measured mean={a.mean():.1f} med={np.median(a):.1f} p90={np.percentile(a,90):.1f} fps={1000/a.mean():.2f}")
print("KFs:", len(slam.map.valid_keyframes()), "pts:", int(slam.map.mp_valid.sum()))
slam.shutdown()

# rerun with loop closing disabled to isolate its contribution
import importlib
