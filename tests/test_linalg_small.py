"""Tests for unrolled small-matrix solvers."""

import numpy as np
import jax.numpy as jnp

from orbslam2_tpu.ops import linalg_small as ls


def test_inv3x3(rng):
    A = rng.normal(size=(50, 3, 3)).astype(np.float32)
    A = A @ A.transpose(0, 2, 1) + 0.5 * np.eye(3)
    inv = np.asarray(ls.inv3x3(jnp.asarray(A)))
    np.testing.assert_allclose(inv @ A, np.eye(3)[None].repeat(50, 0), atol=1e-3)


def test_solve_spd_6(rng):
    A = rng.normal(size=(6, 6)).astype(np.float32)
    A = A @ A.T + 0.5 * np.eye(6, dtype=np.float32)
    b = rng.normal(size=6).astype(np.float32)
    x = np.asarray(ls.solve_spd_small(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(A @ x, b, atol=1e-3)


def test_solve_spd_batched(rng):
    A = rng.normal(size=(16, 7, 7)).astype(np.float32)
    A = A @ A.transpose(0, 2, 1) + 0.5 * np.eye(7, dtype=np.float32)
    b = rng.normal(size=(16, 7)).astype(np.float32)
    x = np.asarray(ls.solve_spd_small(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(
        np.einsum("bij,bj->bi", A, x), b, atol=2e-3
    )
