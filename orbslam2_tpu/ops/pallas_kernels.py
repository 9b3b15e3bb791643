"""Pallas TPU kernels for the matcher hot path.

The XLA formulation of descriptor matching materializes the full (A, B)
Hamming-distance matrix in HBM before the top-2 reduction. This Pallas
kernel fuses distance computation and the running top-2 per A-row inside
VMEM: the MXU computes one (TA, 256) x (256, TB) tile at a time and the
reduction happens before anything leaves the chip — an HBM-bandwidth win
that grows with B (map-point databases, vocabulary assignment).

Used opportunistically (matching.masked_top2 remains the reference path);
correctness is tested against the XLA implementation in interpret mode and
on device. 1-D quantities travel as (1, N) rows (Mosaic layout requirement).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INVALID = jnp.iinfo(jnp.int32).max // 2

TILE_A = 256
TILE_B = 512


def _hamming_top2_kernel(a_bits_ref, b_bits_ref, b_valid_ref,
                         best_ref, second_ref, idx_ref):
    """Grid: (A_tiles, B_tiles). Running top-2 across the B dimension."""
    jb = pl.program_id(1)

    @pl.when(jb == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, jnp.float32(INVALID))
        second_ref[:] = jnp.full_like(second_ref, jnp.float32(INVALID))
        idx_ref[:] = jnp.full_like(idx_ref, -1)

    a = a_bits_ref[:]                      # (TA, 256)
    b = b_bits_ref[:]                      # (TB, 256)
    dot = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                       # (TA, TB)
    na = jnp.sum(a, axis=1, keepdims=True)
    nb = jnp.sum(b, axis=1, keepdims=True)
    d = na + nb.T - 2.0 * dot
    d = jnp.where(b_valid_ref[0, :][None, :] > 0, d, jnp.float32(INVALID))

    # tile-local top-2
    t_best = jnp.min(d, axis=1)
    t_arg = jnp.argmin(d, axis=1).astype(jnp.int32)
    masked = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) == t_arg[:, None],
        jnp.float32(INVALID), d,
    )
    t_second = jnp.min(masked, axis=1)
    t_idx = t_arg + jb * TILE_B

    # merge with running state (row vectors of shape (1, TA))
    best = best_ref[0, :]
    second = second_ref[0, :]
    idx = idx_ref[0, :]
    new_best = jnp.minimum(best, t_best)
    new_idx = jnp.where(t_best < best, t_idx, idx)
    # second = min of (old second, tile second, max(old best, tile best))
    new_second = jnp.minimum(
        jnp.minimum(second, t_second), jnp.maximum(best, t_best)
    )
    best_ref[0, :] = new_best
    second_ref[0, :] = new_second
    idx_ref[0, :] = new_idx


@functools.partial(jax.jit, static_argnames=("interpret",))
def hamming_top2_pallas(
    a_bits: jnp.ndarray,   # (A, 256) float32 {0,1}
    b_bits: jnp.ndarray,   # (B, 256) float32 {0,1}
    b_valid: jnp.ndarray,  # (B,) float32 {0,1}
    interpret: bool = False,
):
    """Fused masked Hamming top-2: returns (best_idx i32, best f32, second f32).

    A and B must be multiples of the tile sizes (pad with zeros/invalid).
    """
    A = a_bits.shape[0]
    B = b_bits.shape[0]
    assert A % TILE_A == 0 and B % TILE_B == 0, (A, B)
    grid = (A // TILE_A, B // TILE_B)
    best, second, idx = pl.pallas_call(
        _hamming_top2_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_A, 256), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 256), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_B), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TILE_A), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_A), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_A), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, A), jnp.float32),
            jax.ShapeDtypeStruct((1, A), jnp.float32),
            jax.ShapeDtypeStruct((1, A), jnp.int32),
        ),
        interpret=interpret,
    )(a_bits, b_bits, b_valid.reshape(1, -1))
    return idx[0], best[0], second[0]
