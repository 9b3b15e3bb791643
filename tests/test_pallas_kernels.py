"""Pallas fused Hamming top-2 vs numpy oracle (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from orbslam2_tpu.ops.pallas_kernels import hamming_top2_pallas, TILE_A, TILE_B


def test_matches_oracle(rng):
    A, B = TILE_A, 2 * TILE_B
    a_bits = rng.integers(0, 2, (A, 256)).astype(np.float32)
    b_bits = rng.integers(0, 2, (B, 256)).astype(np.float32)
    b_valid = np.ones(B, np.float32)
    b_valid[-64:] = 0.0
    idx, best, second = hamming_top2_pallas(
        jnp.asarray(a_bits), jnp.asarray(b_bits), jnp.asarray(b_valid),
        interpret=True,
    )
    d = (a_bits[:, None, :] != b_bits[None, :, :]).sum(-1).astype(np.float32)
    d[:, -64:] = np.float32(2 ** 30)
    oi = d.argmin(1)
    ob = d.min(1)
    d2 = d.copy()
    d2[np.arange(A), oi] = 2 ** 30
    os_ = d2.min(1)
    np.testing.assert_array_equal(np.asarray(best), ob)
    np.testing.assert_array_equal(np.asarray(second), os_)
    # index may differ on exact-tie rows; values must agree
    ties = ob == os_
    np.testing.assert_array_equal(np.asarray(idx)[~ties], oi[~ties])
