"""Tests for the two-view monocular initializer."""

import numpy as np
import jax.numpy as jnp
import pytest

from orbslam2_tpu.ops import initializer as init, geometry as geo


K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32)


def make_scene(rng, n=200, planar=False, depth=(4.0, 8.0)):
    X = np.zeros((n, 3), np.float32)
    X[:, 0] = rng.uniform(-2, 2, n)
    X[:, 1] = rng.uniform(-1.5, 1.5, n)
    if planar:
        X[:, 2] = 5.0 + 0.2 * X[:, 0]  # (slightly tilted) plane
    else:
        X[:, 2] = rng.uniform(*depth, size=n)
    return X


def project(X, R=np.eye(3), t=np.zeros(3)):
    pc = X @ R.T + t
    uv = (pc[:, :2] / pc[:, 2:3]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
    return uv.astype(np.float32), pc[:, 2]


def run_init(rng, X, R, t, noise=0.3, outlier_frac=0.0):
    x1, z1 = project(X)
    x2, z2 = project(X, R, t)
    valid = (z1 > 0.1) & (z2 > 0.1)
    x1 = x1 + rng.normal(0, noise, x1.shape).astype(np.float32)
    x2 = x2 + rng.normal(0, noise, x2.shape).astype(np.float32)
    n_out = int(outlier_frac * len(X))
    if n_out:
        x2[:n_out] += rng.uniform(20, 100, size=(n_out, 2)).astype(np.float32)
    vidx = np.where(valid)[0]
    samples = rng.choice(vidx, size=(init.N_ITERS, 8), replace=True)
    res = init.initialize_two_view(
        jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(valid),
        jnp.asarray(K), jnp.asarray(samples.astype(np.int32)),
    )
    return res


def rot_y(deg):
    a = np.radians(deg)
    return np.array(
        [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]], np.float32
    )


class TestInitializer:
    def test_general_scene_uses_fundamental(self, rng):
        X = make_scene(rng)
        R = rot_y(3.0)
        t_true = np.array([-0.5, 0.05, 0.02], np.float32)
        res = run_init(rng, X, R, t_true)
        assert bool(res.success)
        assert not bool(res.used_homography)
        T = np.asarray(res.T21)
        # translation is up to scale: compare directions
        tdir = T[:3, 3] / np.linalg.norm(T[:3, 3])
        tref = t_true / np.linalg.norm(t_true)
        assert abs(float(tdir @ tref)) > 0.99
        Rerr = np.asarray(geo.so3_log(jnp.asarray(T[:3, :3] @ R.T)))
        assert np.linalg.norm(Rerr) < 0.02

    def test_planar_scene_uses_homography(self, rng):
        X = make_scene(rng, planar=True)
        R = rot_y(4.0)
        t_true = np.array([-0.6, 0.0, 0.05], np.float32)
        res = run_init(rng, X, R, t_true)
        assert bool(res.success)
        assert bool(res.used_homography)
        T = np.asarray(res.T21)
        tdir = T[:3, 3] / np.linalg.norm(T[:3, 3])
        tref = t_true / np.linalg.norm(t_true)
        assert abs(float(tdir @ tref)) > 0.98
        Rerr = np.asarray(geo.so3_log(jnp.asarray(T[:3, :3] @ R.T)))
        assert np.linalg.norm(Rerr) < 0.03

    def test_robust_to_outliers(self, rng):
        X = make_scene(rng)
        R = rot_y(3.0)
        t_true = np.array([-0.5, 0.0, 0.0], np.float32)
        res = run_init(rng, X, R, t_true, outlier_frac=0.2)
        assert bool(res.success)
        T = np.asarray(res.T21)
        tdir = T[:3, 3] / np.linalg.norm(T[:3, 3])
        tref = t_true / np.linalg.norm(t_true)
        assert abs(float(tdir @ tref)) > 0.99
        good = np.asarray(res.good)
        assert not good[: int(0.2 * len(X))].any()  # outliers not triangulated

    def test_pure_rotation_fails(self, rng):
        """No parallax => initialization must refuse (parallax gate)."""
        X = make_scene(rng)
        R = rot_y(5.0)
        res = run_init(rng, X, R, np.zeros(3, np.float32), noise=0.2)
        assert not bool(res.success)

    def test_triangulated_points_scale_consistent(self, rng):
        X = make_scene(rng)
        R = rot_y(2.0)
        t_true = np.array([-0.4, 0.0, 0.0], np.float32)
        res = run_init(rng, X, R, t_true, noise=0.1)
        assert bool(res.success)
        good = np.asarray(res.good)
        P = np.asarray(res.points3d)[good]
        Xg = X[good]
        # recovered scale = |t_est| / |t_true| (t_est is unit-norm)
        scale = 1.0 / np.linalg.norm(t_true)
        rel = np.linalg.norm(P, axis=1) / np.linalg.norm(Xg, axis=1)
        assert np.median(np.abs(rel - scale)) < 0.05 * scale
