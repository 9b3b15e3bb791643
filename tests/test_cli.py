"""CLI + dataset-loader integration: synthetic TUM-format RGB-D sequence."""

import os
import subprocess
import sys

import numpy as np
import pytest

from orbslam2_tpu.utils.synthetic import render_sequence

K = np.array([[260.0, 0, 160], [0, 260, 120], [0, 0, 1]], np.float32)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    """Fake TUM fr1-style directory with PNG rgb + 16-bit depth."""
    from PIL import Image

    d = tmp_path_factory.mktemp("tum_seq")
    (d / "rgb").mkdir()
    (d / "depth").mkdir()
    frames, poses = render_sequence(12, K, width=320, height=240, with_depth=True)
    rgb_lines, depth_lines = [], []
    for i, (img, depth) in enumerate(frames):
        ts = 1000.0 + i / 30.0
        rp = f"rgb/{ts:.6f}.png"
        dp = f"depth/{ts:.6f}.png"
        Image.fromarray(img.astype(np.uint8), "L").save(d / rp)
        d16 = (depth * 5000.0).astype(np.uint16)
        Image.fromarray(d16, "I;16").save(d / dp)
        rgb_lines.append(f"{ts:.6f} {rp}")
        depth_lines.append(f"{ts:.6f} {dp}")
    (d / "rgb.txt").write_text("# ts file\n" + "\n".join(rgb_lines) + "\n")
    (d / "depth.txt").write_text("# ts file\n" + "\n".join(depth_lines) + "\n")
    # reference-format settings YAML (OpenCV FileStorage flavor)
    settings = d / "settings.yaml"
    settings.write_text(
        "%YAML:1.0\n"
        "Camera.fx: 260.0\nCamera.fy: 260.0\nCamera.cx: 160.0\nCamera.cy: 120.0\n"
        "Camera.k1: 0.0\nCamera.k2: 0.0\nCamera.p1: 0.0\nCamera.p2: 0.0\n"
        "Camera.width: 320\nCamera.height: 240\nCamera.fps: 30.0\n"
        "Camera.bf: 26.0\nCamera.RGB: 1\nThDepth: 35.0\nDepthMapFactor: 5000.0\n"
        "ORBextractor.nFeatures: 500\nORBextractor.scaleFactor: 1.2\n"
        "ORBextractor.nLevels: 4\nORBextractor.iniThFAST: 20\n"
        "ORBextractor.minThFAST: 7\n"
    )
    return d


def test_dataset_loader_roundtrip(tum_dir):
    from orbslam2_tpu.utils.datasets import tum_rgbd_sequence

    items = list(tum_rgbd_sequence(str(tum_dir), 5000.0))
    assert len(items) == 12
    ts, img, depth = items[0]
    assert img.shape == (240, 320)
    assert depth.shape == (240, 320)
    assert 0 < depth[depth > 0].min() < 10  # meters


def test_run_slam_cli(tum_dir, tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    out = tmp_path / "traj.txt"
    kf_out = tmp_path / "kf.txt"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "run_slam.py"),
         "tum-rgbd", str(tum_dir / "settings.yaml"), str(tum_dir),
         "--max-frames", "8", "--traj-out", str(out),
         "--kf-traj-out", str(kf_out)],
        capture_output=True, text=True, env=env, timeout=600, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "median tracking time" in proc.stdout
    lines = out.read_text().strip().splitlines()
    assert len(lines) >= 6
    assert len(lines[0].split()) == 8
