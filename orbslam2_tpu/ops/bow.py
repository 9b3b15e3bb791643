"""Bag-of-binary-words place recognition as matmuls (the DBoW2 replacement).

The reference vendors DBoW2 (SURVEY §2.8): a k=10, L=6 vocabulary TREE
(10^6 leaves) so that per-descriptor lookup is 60 Hamming distances, plus an
inverted file over keyframes. On TPU the tree is pointless: assigning 1000
descriptors to W=4096 words is ONE (1000, 256) x (256, 4096) matmul on the
MXU, and candidate retrieval over all keyframes is a (W,) x (K, W) matvec.
Same semantics (TF-IDF weights, L1 scoring, common-word gating), no tree,
no inverted file — documented structural deviation.

The vocabulary itself is trained with one round of binary k-means (majority-
vote centroids) on descriptors sampled from the running map, or falls back
to a deterministic random vocabulary — both options avoid the reference's
145 MB ORBvoc.txt asset (unavailable offline; loading it took the reference
10-20 s at startup anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .orb import unpack_bits

VOCAB_SIZE = 4096


@functools.lru_cache()
def random_vocabulary(n_words: int = VOCAB_SIZE, seed: int = 7) -> np.ndarray:
    """Deterministic random binary vocabulary, bits (W, 256) in {0,1}."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2, size=(n_words, 256)).astype(np.uint8)


def train_vocabulary(
    descs: np.ndarray, n_words: int = VOCAB_SIZE, iters: int = 4, seed: int = 7
) -> np.ndarray:
    """One-level binary k-means (majority vote) on packed (N, 32) descriptors.

    Replaces DBoW2's hierarchical k-means++ trainer (unused at runtime in the
    reference; here it is cheap enough to run on collected descriptors).
    """
    rng = np.random.default_rng(seed)
    bits = np.unpackbits(descs, axis=1).astype(np.float32)  # (N, 256)
    n = len(bits)
    if n < n_words:
        vocab = random_vocabulary(n_words, seed).astype(np.float32).copy()
        vocab[:n] = bits
        centers = vocab
    else:
        centers = bits[rng.choice(n, n_words, replace=False)].copy()
    for _ in range(iters):
        d = _hamming_f32(bits, centers)
        assign = d.argmin(1)
        for w in range(n_words):
            sel = assign == w
            if sel.any():
                centers[w] = (bits[sel].mean(0) > 0.5).astype(np.float32)
    return centers.astype(np.uint8)


def _hamming_f32(a_bits: np.ndarray, b_bits: np.ndarray) -> np.ndarray:
    dot = a_bits @ b_bits.T
    return a_bits.sum(1, keepdims=True) + b_bits.sum(1) - 2 * dot


@functools.partial(jax.jit, static_argnames=())
def bow_vector(
    desc: jnp.ndarray, valid: jnp.ndarray, vocab_bits: jnp.ndarray
) -> jnp.ndarray:
    """Packed (N, 32) descriptors -> L1-normalized TF vector (W,).

    One Hamming matmul + one scatter-add; the DBoW2 `transform()` path.
    """
    bits = unpack_bits(desc).astype(jnp.float32)           # (N, 256)
    vb = vocab_bits.astype(jnp.float32)                    # (W, 256)
    dot = jax.lax.dot_general(
        bits, vb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    d = bits.sum(1, keepdims=True) + vb.sum(1)[None, :] - 2.0 * dot
    d = jnp.where(valid[:, None], d, jnp.inf)
    words = jnp.argmin(d, axis=1)                          # (N,)
    W = vocab_bits.shape[0]
    tf = jnp.zeros((W,), jnp.float32).at[words].add(
        valid.astype(jnp.float32)
    )
    return tf / jnp.maximum(jnp.sum(tf), 1.0)


def l1_score(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 similarity: 1 - 0.5 * |a - b|_1 for L1-normalized vectors
    (†ScoringObject.cpp:L1Scoring); broadcasts (W,) vs (..., W)."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(a - b), axis=-1)


@functools.partial(jax.jit, static_argnames=())
def score_against(query: jnp.ndarray, db: jnp.ndarray) -> jnp.ndarray:
    """(W,) query vs (K, W) database -> (K,) L1 scores (the inverted file
    becomes a dense matvec)."""
    return l1_score(query[None, :], db)


@functools.partial(jax.jit, static_argnames=())
def common_words(query: jnp.ndarray, db: jnp.ndarray) -> jnp.ndarray:
    """(K,) count of shared nonzero words (the minCommonWords gate)."""
    q = (query > 0).astype(jnp.float32)
    return jnp.round((db > 0).astype(jnp.float32) @ q).astype(jnp.int32)
