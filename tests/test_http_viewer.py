"""Interactive HTTP live viewer: state endpoint + page served correctly.

The reference's Pangolin Viewer thread (†src/Viewer.cc) is replaced by a
browser page on headless TPU rigs; these tests exercise the server against
a small real MapState (snapshot contents, downsampling, lifecycle).
"""

import json
import types
import urllib.error
import urllib.request

import numpy as np

from orbslam2_tpu.config import (
    CameraConfig, ExtractorConfig, MapCapacityConfig, SlamConfig,
)
from orbslam2_tpu.map.state import MapState
from orbslam2_tpu.utils.http_viewer import HttpViewer, build_state


def _fake_slam(n_kf=3, n_mp=50):
    cfg = SlamConfig(
        sensor="monocular",
        camera=CameraConfig(fx=300, fy=300, cx=160, cy=120, width=320,
                            height=240, bf=30.0, fps=30),
        extractor=ExtractorConfig(n_features=64, n_levels=2),
        capacity=MapCapacityConfig(max_keyframes=16, max_map_points=256),
    )
    m = MapState.allocate(cfg)
    rng = np.random.default_rng(0)
    N = cfg.extractor.max_keypoints
    traj = []
    for k in range(n_kf):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.1 * k
        kf = m.add_keyframe(
            T, np.zeros((N, 2), np.float32),
            np.zeros((N, 32), np.uint8), np.zeros(N, np.int32),
            np.zeros(N, np.float32), np.zeros(N, bool),
            frame_id=k, timestamp=k / 30.0,
        )
        traj.append((k / 30.0, k, T.copy()))
    for _ in range(n_mp):
        p = rng.uniform(-2, 2, 3).astype(np.float32)
        p[2] += 5.0
        m.add_map_point(p, 0)
    slam = types.SimpleNamespace(
        map=m,
        tracker=types.SimpleNamespace(trajectory=traj),
        tracking_state="OK",
    )
    return slam


class TestBuildState:
    def test_contents(self):
        slam = _fake_slam()
        st = build_state(slam)
        assert st["n_keyframes"] == 3
        assert st["n_map_points"] == 50
        assert len(st["points"]) == 50
        assert len(st["keyframes"]) == 3
        assert len(st["trajectory"]) == 3
        # camera = last trajectory position; KF 2 sits at x=0.2 so the
        # camera center is -R^T t = (-0.2, 0, 0) ... trajectory stores Tcw,
        # build_state inverts to world centers
        assert abs(st["camera"][0] + 0.2) < 1e-6
        json.dumps(st)  # fully JSON-serializable

    def test_downsampling_cap(self):
        slam = _fake_slam(n_mp=100)
        st = build_state(slam, max_points=30)
        assert st["n_map_points"] == 100  # true count survives
        assert len(st["points"]) <= 50  # stride-downsampled payload


class TestHttpViewer:
    def test_serves_page_and_state(self):
        slam = _fake_slam()
        viewer = HttpViewer(slam, port=0, interval=0.0)
        try:
            base = f"http://127.0.0.1:{viewer.port}"
            page = urllib.request.urlopen(f"{base}/", timeout=10).read()
            assert b"orbslam2_tpu" in page and b"state.json" in page
            st = json.loads(
                urllib.request.urlopen(f"{base}/state.json", timeout=10).read()
            )
            assert st["n_keyframes"] == 3
            assert st["tracking_state"] == "OK"
            # 404 for anything else
            try:
                urllib.request.urlopen(f"{base}/etc/passwd", timeout=10)
                assert False, "expected 404"
            except urllib.error.HTTPError as e:
                assert e.code == 404
        finally:
            viewer.stop()

    def test_state_cache_refreshes(self):
        slam = _fake_slam()
        viewer = HttpViewer(slam, port=0, interval=0.0)
        try:
            base = f"http://127.0.0.1:{viewer.port}"
            st0 = json.loads(
                urllib.request.urlopen(f"{base}/state.json", timeout=10).read()
            )
            p = np.float32([1, 1, 6])
            slam.map.add_map_point(p, 0)
            st1 = json.loads(
                urllib.request.urlopen(f"{base}/state.json", timeout=10).read()
            )
            assert st1["n_map_points"] == st0["n_map_points"] + 1
        finally:
            viewer.stop()
