"""AR anchor utilities (the ViewerAR analog): RANSAC plane fit, cube
anchoring, wireframe projection."""

import numpy as np

from orbslam2_tpu.utils.ar import (cube_vertices, draw_cube_overlay,
                                   fit_plane_ransac, write_png_gray)


def test_plane_fit_recovers_synthetic_plane():
    rng = np.random.default_rng(0)
    n_plane, n_out = 300, 60
    # plane: y = 0.5 (normal [0, -1, 0] after the up-convention flip)
    pts = np.concatenate([
        np.stack([rng.uniform(-2, 2, n_plane),
                  np.full(n_plane, 0.5) + rng.normal(0, 0.004, n_plane),
                  rng.uniform(2, 6, n_plane)], 1),
        rng.uniform(-2, 6, (n_out, 3)),
    ])
    res = fit_plane_ransac(pts, inlier_th=0.02)
    assert res is not None
    normal, center = res
    assert abs(abs(normal[1]) - 1.0) < 0.02, normal
    assert abs(center[1] - 0.5) < 0.05


def test_plane_fit_rejects_degenerate_cloud():
    rng = np.random.default_rng(1)
    assert fit_plane_ransac(rng.uniform(0, 1, (10, 3))) is None  # too few
    # pure volume noise: inlier count never reaches min_inliers
    assert fit_plane_ransac(
        rng.uniform(-5, 5, (200, 3)), inlier_th=0.001, min_inliers=60
    ) is None


def test_cube_overlay_draws_in_front_only(tmp_path):
    K = np.array([[260.0, 0, 160], [0, 260, 120], [0, 0, 1]], np.float32)
    img = np.zeros((240, 320), np.uint8)
    verts = cube_vertices(np.float32([0, 0.5, 4.0]), np.float32([0, -1, 0]),
                          size=0.5)
    assert verts.shape == (8, 3)
    out = draw_cube_overlay(img, np.eye(4, dtype=np.float32), K, verts)
    assert out.sum() > 0 and img.sum() == 0  # drew, without mutating input
    # behind the camera: no edges drawn
    Tcw = np.eye(4, dtype=np.float32)
    Tcw[2, 3] = -10.0
    out2 = draw_cube_overlay(img, Tcw, K, verts)
    assert out2.sum() == 0
    # the PNG writer round-trips through the repo's own native-equivalent
    # loader path (stdlib zlib both ways)
    p = str(tmp_path / "ar.png")
    write_png_gray(p, out)
    from orbslam2_tpu.utils.datasets import _load_gray

    back = _load_gray(p)
    assert (back == out).all()
