"""Tests for the EPnP RANSAC and Sim3 RANSAC solvers."""

import numpy as np
import jax.numpy as jnp
import pytest

from orbslam2_tpu.ops import pnp, sim3_solver, geometry as geo, pose_opt
from orbslam2_tpu.models.camera import Camera


def random_rotation(rng):
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    Q[:, 0] *= np.sign(np.linalg.det(Q))
    return Q.astype(np.float32)


class TestPnP:
    def _problem(self, rng, n=80, noise=0.5, outlier_frac=0.0):
        cam = Camera.create(fx=500, fy=500, cx=320, cy=240)
        pts = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 9, n)],
            axis=1,
        ).astype(np.float32)
        R = random_rotation(rng) @ np.asarray(geo.so3_exp(jnp.asarray([0.0, 0, 0])))
        # mild pose so points stay in front
        R = np.asarray(geo.so3_exp(jnp.asarray([0.05, -0.1, 0.03]))).astype(np.float32)
        t = np.array([0.3, -0.2, 0.5], np.float32)
        Tcw = np.asarray(geo.se3_from_rt(jnp.asarray(R), jnp.asarray(t)))
        pw = (pts - t @ np.linalg.inv(R).T)  # ensure depth: place pts in world
        # simpler: world points = R^T (pc - t) for chosen camera-frame pts
        pw = (pts - t) @ R
        uv = 500 * pts[:, :2] / pts[:, 2:3] + [320, 240]
        uv = (uv + rng.normal(0, noise, (n, 2))).astype(np.float32)
        n_out = int(outlier_frac * n)
        uv[:n_out] += rng.uniform(40, 120, (n_out, 2)).astype(np.float32)
        return cam, pw.astype(np.float32), uv, Tcw, n_out

    def test_recovers_pose(self, rng):
        cam, pw, uv, Tcw_true, _ = self._problem(rng)
        samples = rng.integers(0, len(pw), size=(128, pnp.SAMPLE_SIZE)).astype(np.int32)
        res = pnp.pnp_ransac(
            cam, jnp.asarray(pw), jnp.asarray(uv), jnp.ones(len(pw), np.float32),
            jnp.ones(len(pw), bool), jnp.asarray(samples),
        )
        assert bool(res.ok)
        assert int(res.n_inliers) > 60
        # refine like the relocalization flow does and compare
        obs3 = np.concatenate([uv, -np.ones((len(pw), 1), np.float32)], axis=1)
        ref = pose_opt.optimize_pose(
            res.Tcw, cam, jnp.asarray(pw), jnp.asarray(obs3),
            jnp.ones(len(pw), np.float32), res.inliers,
        )
        err = np.asarray(geo.se3_log(ref.Tcw @ geo.se3_inverse(jnp.asarray(Tcw_true))))
        assert np.linalg.norm(err) < 1e-2, err

    def test_with_outliers(self, rng):
        cam, pw, uv, Tcw_true, n_out = self._problem(rng, outlier_frac=0.3)
        samples = rng.integers(0, len(pw), size=(256, pnp.SAMPLE_SIZE)).astype(np.int32)
        res = pnp.pnp_ransac(
            cam, jnp.asarray(pw), jnp.asarray(uv), jnp.ones(len(pw), np.float32),
            jnp.ones(len(pw), bool), jnp.asarray(samples),
        )
        assert bool(res.ok)
        inl = np.asarray(res.inliers)
        assert inl[:n_out].sum() == 0  # outliers excluded
        assert inl[n_out:].mean() > 0.8

    def test_heavy_outliers(self, rng):
        """50% gross outliers: the 4-point beta-case pipeline must still find
        the consensus (†SetRansacParameters epsilon floor is 0.4)."""
        cam, pw, uv, Tcw_true, n_out = self._problem(rng, outlier_frac=0.5)
        samples = rng.integers(0, len(pw), size=(300, pnp.SAMPLE_SIZE)).astype(np.int32)
        res = pnp.pnp_ransac(
            cam, jnp.asarray(pw), jnp.asarray(uv), jnp.ones(len(pw), np.float32),
            jnp.ones(len(pw), bool), jnp.asarray(samples),
        )
        assert bool(res.ok)
        inl = np.asarray(res.inliers)
        assert inl[:n_out].sum() == 0
        assert inl[n_out:].mean() > 0.75

    def test_near_planar_scene(self, rng):
        """Near-planar world points squash the third PCA control axis; the
        beta-case enumeration (N=2/3 seeds) must keep the solve usable where
        a single-beta alignment degenerates (†find_betas_approx_2/3)."""
        cam = Camera.create(fx=500, fy=500, cx=320, cy=240)
        n = 80
        pts = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
             6.0 + rng.normal(0, 0.02, n)],  # depth spread ~2 cm: near-planar
            axis=1,
        ).astype(np.float32)
        R = np.asarray(geo.so3_exp(jnp.asarray([0.05, -0.1, 0.03]))).astype(np.float32)
        t = np.array([0.3, -0.2, 0.5], np.float32)
        Tcw_true = np.asarray(geo.se3_from_rt(jnp.asarray(R), jnp.asarray(t)))
        pw = ((pts - t) @ R).astype(np.float32)
        uv = (500 * pts[:, :2] / pts[:, 2:3] + [320, 240]).astype(np.float32)
        uv = (uv + rng.normal(0, 0.5, (n, 2))).astype(np.float32)
        samples = rng.integers(0, n, size=(256, pnp.SAMPLE_SIZE)).astype(np.int32)
        res = pnp.pnp_ransac(
            cam, jnp.asarray(pw), jnp.asarray(uv), jnp.ones(n, np.float32),
            jnp.ones(n, bool), jnp.asarray(samples),
        )
        assert bool(res.ok)
        assert int(res.n_inliers) > 50
        obs3 = np.concatenate([uv, -np.ones((n, 1), np.float32)], axis=1)
        ref = pose_opt.optimize_pose(
            res.Tcw, cam, jnp.asarray(pw), jnp.asarray(obs3),
            jnp.ones(n, np.float32), res.inliers,
        )
        err = np.asarray(geo.se3_log(ref.Tcw @ geo.se3_inverse(jnp.asarray(Tcw_true))))
        assert np.linalg.norm(err) < 5e-2, err

    def test_refine_tightens_pose(self, rng):
        """The all-inlier Refine stage must not lose inliers vs the raw
        4-point winner, and alone (no LM) should land within ~1% pose error
        (†PnPsolver::Refine)."""
        cam, pw, uv, Tcw_true, _ = self._problem(rng, noise=0.3)
        samples = rng.integers(0, len(pw), size=(64, pnp.SAMPLE_SIZE)).astype(np.int32)
        res = pnp.pnp_ransac(
            cam, jnp.asarray(pw), jnp.asarray(uv), jnp.ones(len(pw), np.float32),
            jnp.ones(len(pw), bool), jnp.asarray(samples),
        )
        assert bool(res.ok)
        err = np.asarray(geo.se3_log(res.Tcw @ geo.se3_inverse(jnp.asarray(Tcw_true))))
        assert np.linalg.norm(err) < 2e-2, err


class TestSim3:
    def _problem(self, rng, n=60, fix_scale=False, noise=0.002, outlier_frac=0.0):
        cam = Camera.create(fx=500, fy=500, cx=320, cy=240)
        pts1 = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 9, n)],
            axis=1,
        ).astype(np.float32)
        R = np.asarray(geo.so3_exp(jnp.asarray([0.1, 0.2, -0.05]))).astype(np.float32)
        t = np.array([0.4, -0.3, 0.2], np.float32)
        s = 1.0 if fix_scale else 1.4
        # S12 maps frame2 -> frame1:  p1 = s R p2 + t
        pts2 = ((pts1 - t) / s) @ R  # inverse mapping
        pts2 = (pts2 + rng.normal(0, noise, pts2.shape)).astype(np.float32)
        n_out = int(outlier_frac * n)
        pts2[:n_out] += rng.uniform(0.5, 1.5, (n_out, 3)).astype(np.float32)
        return cam, pts1, pts2, (s, R, t), n_out

    def test_recovers_sim3(self, rng):
        cam, p1, p2, (s, R, t), _ = self._problem(rng)
        samples = rng.integers(0, len(p1), size=(128, 3)).astype(np.int32)
        res = sim3_solver.sim3_ransac(
            cam, jnp.asarray(p1), jnp.asarray(p2),
            jnp.ones(len(p1), np.float32), jnp.ones(len(p1), np.float32),
            jnp.ones(len(p1), bool), jnp.asarray(samples),
        )
        assert bool(res.ok)
        np.testing.assert_allclose(float(geo.sim3_s(res.S12)), s, rtol=0.02)
        np.testing.assert_allclose(np.asarray(geo.sim3_R(res.S12)), R, atol=0.01)
        np.testing.assert_allclose(np.asarray(geo.sim3_t(res.S12)), t, atol=0.03)

    def test_fix_scale(self, rng):
        cam, p1, p2, (s, R, t), _ = self._problem(rng, fix_scale=True)
        samples = rng.integers(0, len(p1), size=(128, 3)).astype(np.int32)
        res = sim3_solver.sim3_ransac(
            cam, jnp.asarray(p1), jnp.asarray(p2),
            jnp.ones(len(p1), np.float32), jnp.ones(len(p1), np.float32),
            jnp.ones(len(p1), bool), jnp.asarray(samples), fix_scale=True,
        )
        assert bool(res.ok)
        assert float(geo.sim3_s(res.S12)) == 1.0

    def test_outliers(self, rng):
        cam, p1, p2, (s, R, t), n_out = self._problem(rng, outlier_frac=0.25)
        samples = rng.integers(0, len(p1), size=(256, 3)).astype(np.int32)
        res = sim3_solver.sim3_ransac(
            cam, jnp.asarray(p1), jnp.asarray(p2),
            jnp.ones(len(p1), np.float32), jnp.ones(len(p1), np.float32),
            jnp.ones(len(p1), bool), jnp.asarray(samples),
        )
        assert bool(res.ok)
        inl = np.asarray(res.inliers)
        assert inl[:n_out].sum() <= 1
        np.testing.assert_allclose(float(geo.sim3_s(res.S12)), s, rtol=0.05)
