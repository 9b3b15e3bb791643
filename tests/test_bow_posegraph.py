"""Tests: BoW place recognition and Sim3 pose-graph optimization."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pg_fixtures

from orbslam2_tpu.ops import bow, geometry as geo, pose_graph


class TestBow:
    def test_bow_vector_normalized(self, rng):
        desc = rng.integers(0, 256, size=(100, 32)).astype(np.uint8)
        valid = np.ones(100, bool)
        v = np.asarray(bow.bow_vector(jnp.asarray(desc), jnp.asarray(valid),
                                      jnp.asarray(bow.random_vocabulary(512))))
        assert abs(v.sum() - 1.0) < 1e-5
        assert (v >= 0).all()

    def test_same_image_max_score(self, rng):
        vocab = bow.random_vocabulary(512)
        d1 = rng.integers(0, 256, size=(100, 32)).astype(np.uint8)
        d2 = rng.integers(0, 256, size=(100, 32)).astype(np.uint8)
        valid = jnp.ones(100, bool)
        v1 = bow.bow_vector(jnp.asarray(d1), valid, jnp.asarray(vocab))
        v2 = bow.bow_vector(jnp.asarray(d2), valid, jnp.asarray(vocab))
        s_self = float(bow.l1_score(v1, v1))
        s_cross = float(bow.l1_score(v1, v2))
        assert abs(s_self - 1.0) < 1e-5
        assert s_cross < s_self

    def test_similar_images_score_higher(self, rng):
        """Perturbed descriptor sets score above unrelated ones."""
        vocab = bow.random_vocabulary(1024)
        base = rng.integers(0, 256, size=(200, 32)).astype(np.uint8)
        bits = np.unpackbits(base, axis=1)
        flip = rng.random(bits.shape) < 0.02  # 2% bit noise
        near = np.packbits(bits ^ flip, axis=1)
        other = rng.integers(0, 256, size=(200, 32)).astype(np.uint8)
        valid = jnp.ones(200, bool)
        vb = bow.bow_vector(jnp.asarray(base), valid, jnp.asarray(vocab))
        vn = bow.bow_vector(jnp.asarray(near), valid, jnp.asarray(vocab))
        vo = bow.bow_vector(jnp.asarray(other), valid, jnp.asarray(vocab))
        assert float(bow.l1_score(vb, vn)) > float(bow.l1_score(vb, vo))

    def test_trained_vocab_beats_random_quantization(self, rng):
        descs = rng.integers(0, 256, size=(2000, 32)).astype(np.uint8)
        vocab = bow.train_vocabulary(descs, n_words=256, iters=2)
        assert vocab.shape == (256, 256)
        assert set(np.unique(vocab)) <= {0, 1}


class TestSim3Log:
    def test_log_exp_roundtrip(self, rng):
        xi = (rng.normal(size=(32, 7)) * 0.5).astype(np.float32)
        S = geo.sim3_exp(jnp.asarray(xi))
        xi2 = np.asarray(geo.sim3_log(S))
        np.testing.assert_allclose(xi2, xi, atol=2e-3)

    def test_log_identity(self):
        xi = np.asarray(geo.sim3_log(geo.sim3_identity()))
        np.testing.assert_allclose(xi, 0.0, atol=1e-5)


def _circle_poses(K, radius=5.0):
    """Ground-truth Sim3 keyframe poses around a loop (batched helper)."""
    return pg_fixtures.circle_poses(K, radius)


class TestPoseGraph:
    def test_corrects_drift(self, rng):
        """Odometry chain with accumulated drift + one loop edge: the
        optimization distributes the error (the CorrectLoop scenario)."""
        K = 24
        S_true = _circle_poses(K)
        # relative measurements from ground truth (odometry edges, exact)
        edges_i, edges_j, Sij = [], [], []
        for k in range(K - 1):
            edges_i.append(k + 1)
            edges_j.append(k)
            Sij.append(np.asarray(geo.sim3_compose(
                jnp.asarray(S_true[k + 1]), geo.sim3_inverse(jnp.asarray(S_true[k]))
            )))
        # loop edge K-1 -> 0 (exact)
        edges_i.append(0)
        edges_j.append(K - 1)
        Sij.append(np.asarray(geo.sim3_compose(
            jnp.asarray(S_true[0]), geo.sim3_inverse(jnp.asarray(S_true[K - 1]))
        )))

        # drifted initial guess: integrate odometry with noise + scale drift
        S_init = [S_true[0]]
        for k in range(K - 1):
            noise = np.zeros(7, np.float32)
            noise[:3] = rng.normal(0, 0.02, 3)
            noise[3:6] = rng.normal(0, 0.01, 3)
            noise[6] = 0.01  # systematic scale drift (monocular failure mode)
            Sd = geo.sim3_compose(jnp.asarray(Sij[k]),
                                  jnp.asarray(S_init[-1]))
            Sd = geo.sim3_compose(geo.sim3_exp(jnp.asarray(noise)), Sd)
            S_init.append(np.asarray(Sd))
        S_init = np.stack(S_init)

        fixed = np.zeros(K, bool)
        fixed[0] = True
        res = pose_graph.optimize_pose_graph(
            jnp.asarray(S_init), jnp.asarray(fixed), jnp.ones(K, bool),
            jnp.asarray(np.asarray(edges_i, np.int32)),
            jnp.asarray(np.asarray(edges_j, np.int32)),
            jnp.asarray(np.stack(Sij)), jnp.ones(len(Sij), bool),
            iters=25,
        )
        S_opt = np.asarray(res.poses)
        # drift mostly removed: compare camera centers
        def centers(S):
            out = []
            for k in range(K):
                Sk = jnp.asarray(S[k])
                R = np.asarray(geo.sim3_R(Sk)); t = np.asarray(geo.sim3_t(Sk))
                s = float(geo.sim3_s(Sk))
                out.append(-R.T @ t / s)
            return np.stack(out)
        err_init = np.linalg.norm(centers(S_init) - centers(S_true), axis=1)
        err_opt = np.linalg.norm(centers(S_opt) - centers(S_true), axis=1)
        assert err_opt.max() < 0.15 * max(err_init.max(), 1e-9), (
            err_init.max(), err_opt.max()
        )
        # scales return to ~1
        scales = np.asarray([float(geo.sim3_s(jnp.asarray(S_opt[k]))) for k in range(K)])
        np.testing.assert_allclose(scales, 1.0, atol=0.05)

    def test_fix_scale_mode(self, rng):
        K = 8
        S_true = _circle_poses(K)
        edges_i = np.arange(1, K, dtype=np.int32)
        edges_j = np.arange(0, K - 1, dtype=np.int32)
        Sij = np.stack([
            np.asarray(geo.sim3_compose(jnp.asarray(S_true[k + 1]),
                                        geo.sim3_inverse(jnp.asarray(S_true[k]))))
            for k in range(K - 1)
        ])
        S_init = S_true.copy()
        S_init[1:, 5:8] += rng.normal(0, 0.05, (K - 1, 3)).astype(np.float32)
        fixed = np.zeros(K, bool); fixed[0] = True
        res = pose_graph.optimize_pose_graph(
            jnp.asarray(S_init), jnp.asarray(fixed), jnp.ones(K, bool),
            jnp.asarray(edges_i), jnp.asarray(edges_j), jnp.asarray(Sij),
            jnp.ones(K - 1, bool), iters=15, fix_scale=True,
        )
        scales = np.asarray(geo.sim3_s(res.poses))
        np.testing.assert_allclose(scales, 1.0, atol=1e-5)

    def test_cg_matches_dense(self, rng):
        """The matrix-free PCG path must agree with the dense Cholesky."""
        K = 24
        S_true = _circle_poses(K)
        edges_i = list(range(1, K)) + [0]
        edges_j = list(range(0, K - 1)) + [K - 1]
        Sij = [np.asarray(geo.sim3_compose(
            jnp.asarray(S_true[i]), geo.sim3_inverse(jnp.asarray(S_true[j]))
        )) for i, j in zip(edges_i, edges_j)]
        S_init = S_true.copy()
        S_init[1:, 5:8] += rng.normal(0, 0.05, (K - 1, 3)).astype(np.float32)
        fixed = np.zeros(K, bool); fixed[0] = True
        args = (
            jnp.asarray(S_init), jnp.asarray(fixed), jnp.ones(K, bool),
            jnp.asarray(np.asarray(edges_i, np.int32)),
            jnp.asarray(np.asarray(edges_j, np.int32)),
            jnp.asarray(np.stack(Sij)), jnp.ones(K, bool),
        )
        r_dense = pose_graph.optimize_pose_graph(*args, iters=15,
                                                 solver="dense")
        r_cg = pose_graph.optimize_pose_graph(*args, iters=15, solver="cg")
        np.testing.assert_allclose(
            np.asarray(r_cg.poses), np.asarray(r_dense.poses), atol=2e-3
        )

    def test_large_graph_cg(self, rng):
        """KITTI-scale essential graph (2000 vertices) via the CG path:
        the drifted chain + loop edge converges without materializing H."""
        K = 2000
        S_true = _circle_poses(K)
        edges_i = list(range(1, K)) + [0]
        edges_j = list(range(0, K - 1)) + [K - 1]
        # covisibility-ish extra edges every 10 frames (span 5)
        for k in range(0, K - 5, 10):
            edges_i.append(k + 5); edges_j.append(k)
        Sij = pg_fixtures.relative_edges(S_true, edges_i, edges_j)
        # integrate odometry with systematic drift
        drift = np.zeros(7, np.float32); drift[0] = 0.002; drift[6] = 0.0005
        S_init = pg_fixtures.integrate_drift(Sij[: K - 1], S_true[0], drift)
        fixed = np.zeros(K, bool); fixed[0] = True
        res = pose_graph.optimize_pose_graph(
            jnp.asarray(S_init), jnp.asarray(fixed), jnp.ones(K, bool),
            jnp.asarray(np.asarray(edges_i, np.int32)),
            jnp.asarray(np.asarray(edges_j, np.int32)),
            jnp.asarray(Sij), jnp.ones(len(Sij), bool),
            iters=20,
        )
        S_opt = np.asarray(res.poses)
        assert np.isfinite(S_opt).all()

        def center(Sk):
            Skj = jnp.asarray(Sk)
            R = np.asarray(geo.sim3_R(Skj)); t = np.asarray(geo.sim3_t(Skj))
            return -R.T @ t / float(geo.sim3_s(Skj))

        # drift at the far end of the loop largely removed
        e_init = np.linalg.norm(center(S_init[K - 1]) - center(S_true[K - 1]))
        e_opt = np.linalg.norm(center(S_opt[K - 1]) - center(S_true[K - 1]))
        assert e_opt < 0.2 * e_init, (e_init, e_opt)
