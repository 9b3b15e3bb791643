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
