"""Tests for the matcher kernels and motion-only pose optimization."""

import numpy as np
import jax.numpy as jnp
import pytest

from orbslam2_tpu.ops import matching, pose_opt, geometry as geo
from orbslam2_tpu.models.camera import Camera


def pack_bits(bits: np.ndarray) -> np.ndarray:
    """(N, 256) {0,1} -> (N, 32) uint8 LSB-first (matches orb.unpack_bits)."""
    w = (2 ** np.arange(8)).astype(np.uint32)
    return (bits.reshape(-1, 32, 8) * w).sum(-1).astype(np.uint8)


class TestHamming:
    def test_matches_numpy_popcount(self, rng):
        a_bits = rng.integers(0, 2, size=(40, 256))
        b_bits = rng.integers(0, 2, size=(50, 256))
        D = np.asarray(
            matching.hamming_matrix(
                jnp.asarray(pack_bits(a_bits)), jnp.asarray(pack_bits(b_bits))
            )
        )
        want = (a_bits[:, None, :] != b_bits[None, :, :]).sum(-1)
        np.testing.assert_array_equal(D, want)

    def test_zero_distance_self(self, rng):
        bits = rng.integers(0, 2, size=(10, 256))
        d = pack_bits(bits)
        D = np.asarray(matching.hamming_matrix(jnp.asarray(d), jnp.asarray(d)))
        np.testing.assert_array_equal(np.diag(D), 0)


class TestMatchDescriptors:
    def _corresponding_sets(self, rng, n=64, flip=5):
        bits_a = rng.integers(0, 2, size=(n, 256))
        bits_b = bits_a.copy()
        # corrupt a few bits: still well under TH_LOW
        for i in range(n):
            idx = rng.choice(256, size=flip, replace=False)
            bits_b[i, idx] ^= 1
        perm = rng.permutation(n)
        return pack_bits(bits_a), pack_bits(bits_b[perm]), perm

    def test_exact_recovery_under_permutation(self, rng):
        da, db, perm = self._corresponding_sets(rng)
        inv = np.argsort(perm)  # a[i] lives at b[inv[i]]
        res = matching.match_descriptors(
            jnp.asarray(da), jnp.asarray(db),
            jnp.ones(64, bool), jnp.ones(64, bool),
            max_dist=matching.TH_LOW, nn_ratio=0.9,
        )
        got = np.asarray(res.idx)
        valid = np.asarray(res.valid)
        assert valid.sum() >= 60
        np.testing.assert_array_equal(got[valid], inv[valid])

    def test_ratio_test_rejects_ambiguous(self, rng):
        bits = rng.integers(0, 2, size=(1, 256))
        da = pack_bits(bits)
        # two nearly identical candidates in B -> ambiguous
        b0 = bits.copy(); b0[0, :3] ^= 1
        b1 = bits.copy(); b1[0, 3:6] ^= 1
        db = pack_bits(np.concatenate([b0, b1]))
        res = matching.match_descriptors(
            jnp.asarray(da), jnp.asarray(db),
            jnp.ones(1, bool), jnp.ones(2, bool),
            max_dist=matching.TH_LOW, nn_ratio=0.6,
        )
        assert not bool(res.valid[0])

    def test_pair_mask_respected(self, rng):
        da, db, perm = self._corresponding_sets(rng, n=16)
        inv = np.argsort(perm)
        mask = np.zeros((16, 16), bool)
        mask[0, inv[0]] = True  # only one admissible pair
        res = matching.match_descriptors(
            jnp.asarray(da), jnp.asarray(db),
            jnp.ones(16, bool), jnp.ones(16, bool),
            pair_mask=jnp.asarray(mask), max_dist=matching.TH_LOW,
        )
        valid = np.asarray(res.valid)
        assert valid[0] and valid.sum() == 1
        assert int(res.idx[0]) == inv[0]

    def test_rotation_consistency(self, rng):
        da, db, perm = self._corresponding_sets(rng, n=64)
        inv = np.argsort(perm)
        ang_a = np.zeros(64, np.float32)
        ang_b = np.zeros(64, np.float32)
        # consistent rotation of 0.5 rad for most, garbage for 6
        ang_b[inv] = -0.5
        bad = rng.choice(64, size=6, replace=False)
        ang_b[inv[bad]] = rng.uniform(1.0, 3.0, size=6)
        res = matching.match_descriptors(
            jnp.asarray(da), jnp.asarray(db),
            jnp.ones(64, bool), jnp.ones(64, bool),
            max_dist=matching.TH_LOW,
            angles_a=jnp.asarray(ang_a), angles_b=jnp.asarray(ang_b),
            check_rotation=True,
        )
        valid = np.asarray(res.valid)
        assert not valid[bad].any()
        assert valid.sum() >= 50


class TestGates:
    def test_radius_gate(self):
        proj = jnp.asarray([[10.0, 10.0]])
        kps = jnp.asarray([[10.0, 12.0], [30.0, 30.0]])
        m = np.asarray(matching.radius_gate(proj, kps, jnp.asarray([3.0])))
        assert m[0, 0] and not m[0, 1]

    def test_epipolar_gate_exact_geometry(self, rng):
        cam = Camera.create(fx=400, fy=400, cx=160, cy=120)
        K = np.asarray(cam.K)
        T1w = np.eye(4, dtype=np.float32)
        T2w = np.asarray(geo.se3_from_rt(jnp.eye(3), jnp.asarray([-0.3, 0.0, 0.0])))
        X = rng.uniform(-1, 1, size=(20, 3)).astype(np.float32)
        X[:, 2] = rng.uniform(2, 5, size=20)
        def proj(Tw, X):
            pc = X @ Tw[:3, :3].T + Tw[:3, 3]
            return (pc[:, :2] / pc[:, 2:3]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
        x1 = proj(T1w, X)
        x2 = proj(np.asarray(T2w), X)
        F = matching.fundamental_from_poses(
            jnp.asarray(K), jnp.asarray(K), jnp.asarray(T1w), jnp.asarray(T2w)
        )
        m = np.asarray(
            matching.epipolar_gate(
                jnp.asarray(x1), jnp.asarray(x2), F, jnp.ones(20, np.float32)
            )
        )
        # true correspondences lie on their epipolar lines
        assert np.all(np.diag(m))


class TestPoseOpt:
    def _setup(self, rng, n=128, noise=0.5, outlier_frac=0.0, stereo=False):
        cam = Camera.create(fx=500, fy=500, cx=320, cy=240, bf=40.0 if stereo else 0.0)
        pts = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(3, 8, size=n)
        xi_true = np.array([0.1, -0.05, 0.08, 0.02, -0.03, 0.01], np.float32)
        T_true = np.asarray(geo.se3_exp(jnp.asarray(xi_true)))
        pc = pts @ T_true[:3, :3].T + T_true[:3, 3]
        u = 500 * pc[:, 0] / pc[:, 2] + 320
        v = 500 * pc[:, 1] / pc[:, 2] + 240
        obs = np.stack([u, v, np.full(n, -1.0)], axis=1).astype(np.float32)
        if stereo:
            obs[:, 2] = u - 40.0 / pc[:, 2]
        obs[:, :2] += rng.normal(0, noise, size=(n, 2))
        n_out = int(outlier_frac * n)
        if n_out:
            obs[:n_out, :2] += rng.uniform(30, 80, size=(n_out, 2))
        return cam, pts, obs, T_true, n_out

    def test_converges_from_identity(self, rng):
        cam, pts, obs, T_true, _ = self._setup(rng, noise=0.3)
        res = pose_opt.optimize_pose(
            jnp.eye(4), cam, jnp.asarray(pts), jnp.asarray(obs),
            jnp.ones(len(pts), np.float32), jnp.ones(len(pts), bool),
        )
        err = np.asarray(geo.se3_log(res.Tcw @ geo.se3_inverse(jnp.asarray(T_true))))
        assert np.linalg.norm(err) < 5e-3, err
        assert int(res.n_inliers) >= 120

    def test_rejects_outliers(self, rng):
        cam, pts, obs, T_true, n_out = self._setup(rng, noise=0.3, outlier_frac=0.25)
        res = pose_opt.optimize_pose(
            jnp.eye(4), cam, jnp.asarray(pts), jnp.asarray(obs),
            jnp.ones(len(pts), np.float32), jnp.ones(len(pts), bool),
        )
        err = np.asarray(geo.se3_log(res.Tcw @ geo.se3_inverse(jnp.asarray(T_true))))
        assert np.linalg.norm(err) < 1e-2, err
        inl = np.asarray(res.inliers)
        assert not inl[:n_out].any()          # outliers classified out
        assert inl[n_out:].sum() >= 0.9 * (len(pts) - n_out)

    def test_stereo_edges(self, rng):
        cam, pts, obs, T_true, _ = self._setup(rng, noise=0.3, stereo=True)
        res = pose_opt.optimize_pose(
            jnp.eye(4), cam, jnp.asarray(pts), jnp.asarray(obs),
            jnp.ones(len(pts), np.float32), jnp.ones(len(pts), bool),
        )
        err = np.asarray(geo.se3_log(res.Tcw @ geo.se3_inverse(jnp.asarray(T_true))))
        assert np.linalg.norm(err) < 5e-3, err

    def test_respects_valid_mask(self, rng):
        cam, pts, obs, T_true, _ = self._setup(rng, noise=0.3)
        # poison half the observations but mark them invalid
        obs2 = obs.copy()
        obs2[64:, :2] = -1000.0
        valid = np.zeros(len(pts), bool)
        valid[:64] = True
        res = pose_opt.optimize_pose(
            jnp.eye(4), cam, jnp.asarray(pts), jnp.asarray(obs2),
            jnp.ones(len(pts), np.float32), jnp.asarray(valid),
        )
        err = np.asarray(geo.se3_log(res.Tcw @ geo.se3_inverse(jnp.asarray(T_true))))
        assert np.linalg.norm(err) < 1e-2, err
