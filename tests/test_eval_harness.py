"""Dataset-readiness harness dry-run (VERDICT r1 item 10).

Proves the full eval path — dataset IO, SlamSystem run, groundtruth
association, Horn-aligned ATE, bounds report — on a rendered synthetic
TUM-format directory, so the first session with real TUM/KITTI/EuRoC assets
produces the BASELINE.md table with zero new code.
"""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_eval_harness_dry_run(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    out = tmp_path / "eval.json"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "eval_datasets.py"),
         "--dry-run", "--out", str(out)],
        capture_output=True, text=True, env=env, timeout=900, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    report = json.loads(out.read_text())
    assert report["dry_run"]
    res = report["results"][0]
    assert res["ok"], res
    assert res["ate_rmse"] < 0.10
    assert res["n_assoc"] >= 20


def test_euroc_rectify_identity():
    """A distortion-free, already-aligned stereo rig must rectify to (near)
    identity maps: the Fusiello construction reduces to a pure x-baseline."""
    from orbslam2_tpu.utils.rectify import (
        build_rectify_map, rectify_rotations, remap_bilinear)

    R = np.eye(3)
    T = np.array([-0.1, 0.0, 0.0])  # x_c1 = x_c0 - 0.1 (pure x baseline)
    R0, R1 = rectify_rotations(R, T)
    np.testing.assert_allclose(R0, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(R1, np.eye(3), atol=1e-12)

    K = np.array([[100.0, 0, 60], [0, 100.0, 40], [0, 0, 1]])
    D = np.zeros(4)
    mx, my = build_rectify_map(K, D, R0, K, 120, 80)
    u, v = np.meshgrid(np.arange(120, dtype=np.float32),
                       np.arange(80, dtype=np.float32))
    np.testing.assert_allclose(mx, u, atol=1e-4)
    np.testing.assert_allclose(my, v, atol=1e-4)

    rng = np.random.default_rng(0)
    img = rng.random((80, 120)).astype(np.float32)
    out = remap_bilinear(img, mx, my)
    np.testing.assert_allclose(out[:-1, :-1], img[:-1, :-1], atol=1e-3)


def test_euroc_rectify_rows_aligned():
    """With a real-ish converged rig (small rotation + mostly-x baseline), a
    3D point must land on the same rectified row in both cameras."""
    from orbslam2_tpu.utils.rectify import rectify_rotations

    rng = np.random.default_rng(1)
    # cam1 slightly rotated; baseline mostly x with small y/z components
    from orbslam2_tpu.ops import geometry as geo
    import jax.numpy as jnp
    Rj = np.asarray(geo.so3_exp(jnp.asarray([0.02, -0.015, 0.01])))
    R = np.array(Rj, np.float64)
    T = np.array([-0.11, 0.002, -0.001])
    R0, R1 = rectify_rotations(R, T)
    # rectified frames: y2 = R1 (R x + T) and y1 = R0 x differ by x-only shift
    for _ in range(20):
        x = rng.normal(0, 1.0, 3) + np.array([0, 0, 4.0])
        y1 = R0 @ x
        y2 = R1 @ (R @ x + T)
        # same row => equal y/z after projection
        # R comes from f32 so3_exp, so agreement is f32-limited
        np.testing.assert_allclose(y1[1] / y1[2], y2[1] / y2[2], atol=1e-6)
        assert y1[2] > 0 and y2[2] > 0


def test_yaml_rectifier_reference_format(tmp_path):
    """Reference EuRoC.yaml LEFT./RIGHT. blocks parse and drive the remap:
    a 3D point's raw (distorted) projection must map to the same pixel the
    rectified model P predicts."""
    from orbslam2_tpu.config import load_config
    from orbslam2_tpu.utils.rectify import YamlRectifier, remap_bilinear

    W, H = 160, 120
    K = np.array([[150.0, 0, 80], [0, 150.0, 60], [0, 0, 1.0]])
    D = np.array([-0.28, 0.07, 1e-4, 2e-5])
    R = np.eye(3)
    P = np.array([[140.0, 0, 80, 0], [0, 140.0, 60, 0], [0, 0, 1.0, 0]])

    def block(name, M):
        rows, cols = M.shape
        data = ", ".join(f"{x:.12g}" for x in M.ravel())
        return (f"{name}: !!opencv-matrix\n   rows: {rows}\n   cols: {cols}\n"
                f"   dt: d\n   data: [{data}]\n")

    y = tmp_path / "euroc_raw.yaml"
    y.write_text(
        "%YAML:1.0\n"
        "Camera.fx: 140.0\nCamera.fy: 140.0\nCamera.cx: 80.0\nCamera.cy: 60.0\n"
        "Camera.k1: 0.0\nCamera.k2: 0.0\nCamera.p1: 0.0\nCamera.p2: 0.0\n"
        f"Camera.width: {W}\nCamera.height: {H}\nCamera.fps: 20.0\n"
        "Camera.bf: 14.0\nCamera.RGB: 1\nThDepth: 35.0\n"
        "ORBextractor.nFeatures: 500\nORBextractor.scaleFactor: 1.2\n"
        "ORBextractor.nLevels: 4\nORBextractor.iniThFAST: 20\n"
        "ORBextractor.minThFAST: 7\n"
        f"LEFT.width: {W}\nLEFT.height: {H}\n"
        f"RIGHT.width: {W}\nRIGHT.height: {H}\n"
        + block("LEFT.K", K) + block("LEFT.D", D.reshape(1, 4))
        + block("LEFT.R", R) + block("LEFT.P", P)
        + block("RIGHT.K", K) + block("RIGHT.D", D.reshape(1, 4))
        + block("RIGHT.R", R) + block("RIGHT.P", P)
    )
    cfg = load_config(str(y), sensor="stereo")
    assert cfg.stereo_rectify is not None
    np.testing.assert_allclose(cfg.stereo_rectify["left"]["K"], K)
    assert cfg.stereo_rectify["right"]["D"].shape == (4,)

    rect = YamlRectifier(cfg.stereo_rectify)
    mx, my = rect.map0

    # geometric consistency: rectified pixel (u,v) <- ray through P, then
    # distorted by D and projected by K must equal the map entry
    pts = np.array([[40.5, 30.25], [100.0, 80.0], [80.0, 60.0]])
    for u, v in pts:
        x = (u - P[0, 2]) / P[0, 0]
        yn = (v - P[1, 2]) / P[1, 1]
        r2 = x * x + yn * yn
        rad = 1 + D[0] * r2 + D[1] * r2 * r2
        xd = x * rad + 2 * D[2] * x * yn + D[3] * (r2 + 2 * x * x)
        yd = yn * rad + D[2] * (r2 + 2 * yn * yn) + 2 * D[3] * x * yn
        ui, vi = int(round(v)), int(round(u))
        assert abs(mx[ui, vi] - (K[0, 0] * xd + K[0, 2])) < 0.51
        assert abs(my[ui, vi] - (K[1, 1] * yd + K[1, 2])) < 0.51

    # a distortion-free yaml (D=0, P[:3,:3]=K) must rectify to identity
    left = np.random.default_rng(0).random((H, W)).astype(np.float32)
    cfg.stereo_rectify["left"]["D"][:] = 0
    cfg.stereo_rectify["left"]["P"][:3, :3] = K
    cfg.stereo_rectify["right"]["D"][:] = 0
    cfg.stereo_rectify["right"]["P"][:3, :3] = K
    ident = YamlRectifier(cfg.stereo_rectify)
    out, _ = ident(left, left)
    np.testing.assert_allclose(out[:-1, :-1], left[:-1, :-1], atol=1e-3)
