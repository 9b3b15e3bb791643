"""Golden/property tests for the Lie-group geometry module."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orbslam2_tpu.ops import geometry as geo


def random_rotations(rng, n):
    """Uniform-ish random rotations via QR of Gaussians."""
    A = rng.normal(size=(n, 3, 3)).astype(np.float32)
    Q, R = np.linalg.qr(A)
    det = np.linalg.det(Q)
    Q[:, :, 0] *= np.sign(det)[:, None]
    return Q.astype(np.float32)


class TestSO3:
    def test_exp_log_roundtrip(self, rng):
        phi = rng.normal(size=(64, 3)).astype(np.float32)
        # keep |phi| < pi for unique log
        norms = np.linalg.norm(phi, axis=-1, keepdims=True)
        phi = phi / norms * (rng.uniform(0.01, 3.0, size=(64, 1)).astype(np.float32))
        R = geo.so3_exp(jnp.asarray(phi))
        phi2 = geo.so3_log(R)
        np.testing.assert_allclose(np.asarray(phi2), phi, atol=2e-4)

    def test_exp_is_rotation(self, rng):
        phi = rng.normal(size=(32, 3)).astype(np.float32)
        R = np.asarray(geo.so3_exp(jnp.asarray(phi)))
        np.testing.assert_allclose(
            R @ R.transpose(0, 2, 1), np.eye(3)[None].repeat(32, 0), atol=1e-5
        )
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_small_angle(self):
        phi = jnp.array([[1e-9, 0, 0], [0.0, 0.0, 0.0]])
        R = geo.so3_exp(phi)
        np.testing.assert_allclose(np.asarray(R), np.eye(3)[None].repeat(2, 0), atol=1e-6)
        back = geo.so3_log(R)
        assert np.all(np.isfinite(np.asarray(back)))

    def test_log_near_pi(self, rng):
        axis = rng.normal(size=(16, 3)).astype(np.float32)
        axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
        phi = axis * (np.pi - 1e-3)
        R = geo.so3_exp(jnp.asarray(phi.astype(np.float32)))
        phi2 = np.asarray(geo.so3_log(R))
        # log may return the antipodal axis; compare rotations instead
        R2 = np.asarray(geo.so3_exp(jnp.asarray(phi2)))
        # float32 limit: axis from (R+I) columns is O(1e-3) accurate at pi
        np.testing.assert_allclose(R2, np.asarray(R), atol=3e-3)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(32, 6)).astype(np.float32) * 0.8
        T = geo.se3_exp(jnp.asarray(xi))
        xi2 = np.asarray(geo.se3_log(T))
        np.testing.assert_allclose(xi2, xi, atol=3e-4)

    def test_inverse(self, rng):
        xi = rng.normal(size=(8, 6)).astype(np.float32)
        T = geo.se3_exp(jnp.asarray(xi))
        I = np.asarray(T @ geo.se3_inverse(T))
        np.testing.assert_allclose(I, np.eye(4)[None].repeat(8, 0), atol=1e-5)

    def test_transform_points(self, rng):
        R = random_rotations(rng, 1)[0]
        t = rng.normal(size=3).astype(np.float32)
        T = geo.se3_from_rt(jnp.asarray(R), jnp.asarray(t))
        pts = rng.normal(size=(10, 3)).astype(np.float32)
        out = np.asarray(geo.transform_points(T, jnp.asarray(pts)))
        np.testing.assert_allclose(out, pts @ R.T + t, atol=1e-5)


class TestQuat:
    def test_roundtrip(self, rng):
        R = random_rotations(rng, 64)
        q = geo.rotmat_to_quat(jnp.asarray(R))
        R2 = np.asarray(geo.quat_to_rotmat(q))
        np.testing.assert_allclose(R2, R, atol=1e-5)

    def test_identity(self):
        q = geo.rotmat_to_quat(jnp.eye(3))
        np.testing.assert_allclose(np.asarray(q), [1, 0, 0, 0], atol=1e-6)


class TestSim3:
    def test_compose_inverse(self, rng):
        R = random_rotations(rng, 8)
        t = rng.normal(size=(8, 3)).astype(np.float32)
        s = rng.uniform(0.5, 2.0, size=8).astype(np.float32)
        S = geo.sim3_make(jnp.asarray(s), jnp.asarray(R), jnp.asarray(t))
        SI = geo.sim3_compose(S, geo.sim3_inverse(S))
        np.testing.assert_allclose(np.asarray(geo.sim3_s(SI)), 1.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(geo.sim3_t(SI)), 0.0, atol=1e-4)

    def test_apply(self, rng):
        R = random_rotations(rng, 1)[0]
        t = rng.normal(size=3).astype(np.float32)
        s = np.float32(1.7)
        S = geo.sim3_make(jnp.asarray(s), jnp.asarray(R), jnp.asarray(t))
        p = rng.normal(size=(5, 3)).astype(np.float32)
        Sb = jnp.broadcast_to(S, (5, 8))
        out = np.asarray(geo.sim3_apply(Sb, jnp.asarray(p)))
        np.testing.assert_allclose(out, s * (p @ R.T) + t, atol=1e-4)

    def test_exp_zero(self):
        S = geo.sim3_exp(jnp.zeros(7))
        np.testing.assert_allclose(np.asarray(S), np.asarray(geo.sim3_identity()), atol=1e-5)

    def test_exp_pure_scale(self):
        xi = jnp.array([0.0, 0, 0, 0, 0, 0, 0.5])
        S = geo.sim3_exp(xi)
        np.testing.assert_allclose(float(geo.sim3_s(S)), np.exp(0.5), atol=1e-4)

    def test_exp_translation_with_scale(self):
        # For pure (rho, 0, sigma): t = (e^sigma - 1)/sigma * rho
        rho = np.array([1.0, -2.0, 0.5], np.float32)
        sigma = 0.7
        xi = jnp.concatenate([jnp.asarray(rho), jnp.zeros(3), jnp.array([sigma])])
        S = geo.sim3_exp(xi)
        expected = (np.exp(sigma) - 1.0) / sigma * rho
        np.testing.assert_allclose(np.asarray(geo.sim3_t(S)), expected, atol=1e-4)


class TestHorn:
    def test_exact_alignment_with_scale(self, rng):
        R = random_rotations(rng, 1)[0]
        t = rng.normal(size=3).astype(np.float32)
        s = np.float32(2.3)
        src = rng.normal(size=(50, 3)).astype(np.float32)
        dst = s * src @ R.T + t
        s2, R2, t2 = geo.horn_align(jnp.asarray(src), jnp.asarray(dst))
        np.testing.assert_allclose(float(s2), s, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t2), t, atol=1e-3)

    def test_fixed_scale(self, rng):
        R = random_rotations(rng, 1)[0]
        t = rng.normal(size=3).astype(np.float32)
        src = rng.normal(size=(30, 3)).astype(np.float32)
        dst = src @ R.T + t
        s2, R2, t2 = geo.horn_align(jnp.asarray(src), jnp.asarray(dst), with_scale=False)
        assert float(s2) == 1.0
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-4)

    def test_weighted_ignores_outliers(self, rng):
        R = random_rotations(rng, 1)[0]
        t = rng.normal(size=3).astype(np.float32)
        src = rng.normal(size=(40, 3)).astype(np.float32)
        dst = src @ R.T + t
        dst_noisy = dst.copy()
        dst_noisy[:10] += 100.0  # gross outliers
        w = np.ones(40, np.float32)
        w[:10] = 0.0
        s2, R2, t2 = geo.horn_align(
            jnp.asarray(src), jnp.asarray(dst_noisy), weights=jnp.asarray(w),
            with_scale=False,
        )
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t2), t, atol=1e-3)

    def test_batched(self, rng):
        Rb = random_rotations(rng, 4)
        src = rng.normal(size=(4, 20, 3)).astype(np.float32)
        dst = np.einsum("bij,bnj->bni", Rb, src)
        s2, R2, t2 = geo.horn_align(jnp.asarray(src), jnp.asarray(dst))
        np.testing.assert_allclose(np.asarray(R2), Rb, atol=1e-4)


class TestTriangulate:
    def test_exact(self, rng):
        K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32)
        R = random_rotations(rng, 1)[0] * 0  # identity second cam + offset
        R = np.eye(3, dtype=np.float32)
        t = np.array([-0.5, 0.0, 0.0], np.float32)
        P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32)
        P2 = K @ np.hstack([R, t[:, None]]).astype(np.float32)
        X = rng.uniform(-1, 1, size=(20, 3)).astype(np.float32)
        X[:, 2] = rng.uniform(2, 6, size=20)

        def proj(P, X):
            Xh = np.hstack([X, np.ones((len(X), 1), np.float32)])
            x = Xh @ P.T
            return x[:, :2] / x[:, 2:3]

        x1 = proj(P1, X)
        x2 = proj(P2, X)
        Xr = np.asarray(
            geo.triangulate_dlt(
                jnp.asarray(P1), jnp.asarray(P2), jnp.asarray(x1), jnp.asarray(x2)
            )
        )
        np.testing.assert_allclose(Xr, X, atol=1e-2)
