"""Tests for the Schur-complement bundle adjuster."""

import numpy as np
import jax.numpy as jnp
import pytest

from orbslam2_tpu.ops import ba, geometry as geo
from orbslam2_tpu.models.camera import Camera


def make_ba_problem(rng, K=6, M=128, O=None, noise=0.3, pose_pert=0.05,
                    point_pert=0.05, stereo=False, n_fixed=1, outlier_frac=0.0):
    """Synthetic BA problem: cameras on an arc observing a point cloud."""
    O = O or K
    cam = Camera.create(fx=500, fy=500, cx=320, cy=240, bf=40.0 if stereo else 0.0)
    pts = np.stack(
        [rng.uniform(-3, 3, M), rng.uniform(-2, 2, M), rng.uniform(6, 12, M)], axis=1
    ).astype(np.float32)
    poses_true = []
    for k in range(K):
        xi = np.zeros(6, np.float32)
        xi[0] = 0.4 * k  # translate along x
        xi[4] = 0.02 * k  # slight rotation
        poses_true.append(np.asarray(geo.se3_exp(jnp.asarray(xi))))
    poses_true = np.stack(poses_true)

    obs_kf = np.full((M, O), -1, np.int32)
    obs_uvr = np.full((M, O, 3), -1.0, np.float32)
    obs_sigma2 = np.ones((M, O), np.float32)
    obs_valid = np.zeros((M, O), bool)
    for m in range(M):
        ks = rng.permutation(K)[: rng.integers(3, min(K, O) + 1)]
        for j, k in enumerate(sorted(ks)):
            T = poses_true[k]
            pc = pts[m] @ T[:3, :3].T + T[:3, 3]
            if pc[2] < 0.5:
                continue
            u = 500 * pc[0] / pc[2] + 320 + rng.normal(0, noise)
            v = 500 * pc[1] / pc[2] + 240 + rng.normal(0, noise)
            ur = (u - 40.0 / pc[2]) if stereo else -1.0
            obs_kf[m, j] = k
            obs_uvr[m, j] = (u, v, ur)
            obs_valid[m, j] = True

    n_out = int(outlier_frac * M)
    for m in range(n_out):
        j = np.argmax(obs_valid[m])
        obs_uvr[m, j, :2] += rng.uniform(30, 60, 2)

    # perturb initial guesses (except fixed cameras)
    poses_init = poses_true.copy()
    for k in range(n_fixed, K):
        xi = rng.normal(0, pose_pert, 6).astype(np.float32)
        poses_init[k] = np.asarray(geo.se3_exp(jnp.asarray(xi))) @ poses_true[k]
    pts_init = pts + rng.normal(0, point_pert, pts.shape).astype(np.float32)

    opt_mask = np.ones(K, bool)
    opt_mask[:n_fixed] = False
    prob = ba.BAProblem(
        poses=jnp.asarray(poses_init),
        opt_mask=jnp.asarray(opt_mask),
        points=jnp.asarray(pts_init),
        point_valid=jnp.ones(M, bool),
        obs_kf=jnp.asarray(obs_kf),
        obs_uvr=jnp.asarray(obs_uvr),
        obs_sigma2=jnp.asarray(obs_sigma2),
        obs_valid=jnp.asarray(obs_valid),
    )
    return cam, prob, poses_true, pts, n_out


def pose_errors(poses, poses_true):
    T = jnp.asarray(poses) @ geo.se3_inverse(jnp.asarray(poses_true))
    return np.linalg.norm(np.asarray(jax.vmap(geo.se3_log)(T)), axis=-1)


import jax  # noqa: E402  (after helpers using jax.vmap)


class TestBA:
    def test_converges_mono(self, rng):
        # 2 fixed cameras pin the scale gauge (mono BA with 1 fixed camera
        # has a free scale direction, so absolute pose error is not a fair
        # convergence metric there).
        cam, prob, poses_true, pts_true, _ = make_ba_problem(rng, n_fixed=2)
        res = ba.optimize_ba(cam, prob, iters=10)
        errs = pose_errors(res.poses, poses_true)
        assert errs[2:].max() < 2e-2, errs  # statistical (noise-induced) error
        # fixed cameras untouched
        np.testing.assert_allclose(np.asarray(res.poses[0]), poses_true[0], atol=1e-7)
        pt_err = np.linalg.norm(np.asarray(res.points) - pts_true, axis=1)
        assert np.median(pt_err) < 0.05  # triangulation noise floor at depth ~9m
        # final cost at the measurement-noise floor:
        # E[chi2 per obs] = 2 * noise^2 (sigma=1 information)
        n_obs = int(np.asarray(prob.obs_valid).sum())
        assert float(res.cost) < 3.0 * (2 * 0.3 ** 2) * n_obs

    def test_converges_stereo(self, rng):
        cam, prob, poses_true, pts_true, _ = make_ba_problem(rng, stereo=True)
        res = ba.optimize_ba(cam, prob, iters=10)
        errs = pose_errors(res.poses, poses_true)
        assert errs[1:].max() < 2e-2, errs

    def test_outlier_classification(self, rng):
        # 2 fixed cameras pin the mono scale gauge (same rationale as
        # test_converges_mono: with 1 fixed camera the absolute pose error
        # includes a weakly-constrained scale mode).
        cam, prob, poses_true, pts_true, n_out = make_ba_problem(
            rng, outlier_frac=0.1, n_fixed=2
        )
        res = ba.optimize_ba(cam, prob, iters=10)
        errs = pose_errors(res.poses, poses_true)
        # same statistical (noise-induced) bound as test_converges_mono: with
        # the outliers classified out, accuracy must match the clean problem
        assert errs[2:].max() < 2e-2, errs
        inl = np.asarray(res.obs_inlier)
        # the corrupted first-observation of each outlier point is flagged out
        flagged = 0
        for m in range(n_out):
            j = int(np.argmax(np.asarray(prob.obs_valid)[m]))
            flagged += not inl[m, j]
        assert flagged >= 0.9 * n_out

    def test_cost_decreases(self, rng):
        cam, prob, poses_true, _, _ = make_ba_problem(rng, pose_pert=0.1)
        res1 = ba.optimize_ba(cam, prob, iters=2)
        res2 = ba.optimize_ba(cam, prob, iters=12)
        assert float(res2.cost) <= float(res1.cost) * 1.01

    def test_motion_only_mode(self, rng):
        """fix_points=True leaves the landmarks untouched."""
        cam, prob, poses_true, pts_true, _ = make_ba_problem(rng, point_pert=0.0)
        res = ba.optimize_ba(cam, prob, iters=8, fix_points=True)
        np.testing.assert_allclose(
            np.asarray(res.points), np.asarray(prob.points), atol=1e-7
        )
        errs = pose_errors(res.poses, poses_true)
        assert errs[1:].max() < 1e-2
