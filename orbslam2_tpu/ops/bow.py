"""Bag-of-binary-words place recognition as matmuls (the DBoW2 replacement).

The reference vendors DBoW2 (SURVEY §2.8): a k=10, L=6 vocabulary TREE
(10^6 leaves) so that per-descriptor lookup is 60 Hamming distances, plus an
inverted file over keyframes. On TPU the tree is pointless: assigning 1000
descriptors to W=4096 words is ONE (1000, 256) x (256, 4096) matmul on the
MXU, and candidate retrieval over all keyframes is a (W,) x (K, W) matvec.
Same semantics (TF-IDF weights, L1 scoring, common-word gating), no tree,
no inverted file — documented structural deviation.

The vocabulary itself is trained with binary k-means (majority-vote
centroids) on ORB descriptors — the shipped default asset
(assets/vocabulary.npz, built by tools/train_default_vocab.py) carries both
the word centroids and their IDF weights; a deterministic random vocabulary
remains as the last-resort fallback. Both options avoid the reference's
145 MB ORBvoc.txt asset (unavailable offline; loading it took the reference
10-20 s at startup anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .orb import unpack_bits

# 65536 words: measured on a 1536-KF database spanning 3 street-like
# corridors (self-similar segmented facades) + 6 rooms, with 300 revisit
# queries (tools/bench_place_recognition.py, tools/PLACE_RECOGNITION.md):
#   4096 words:  top-1 90.0%, 77.2 false candidates/query, novel-world 100%
#   16384 words: top-1 95.7%,  5.9 false candidates/query, novel-world  10%
#   65536 words: top-1 98.3%,  0.6 false candidates/query, novel-world   0%
# The flat MXU assignment matmul at (2000, 256) x (256, 65536) is still
# sub-ms on TPU; database retrieval stays cheap because scoring uses only
# the query's nonzero columns (keyframe_database._candidate_scores).
VOCAB_SIZE = 65536


@functools.lru_cache()
def random_vocabulary(n_words: int = VOCAB_SIZE, seed: int = 7) -> np.ndarray:
    """Deterministic random binary vocabulary, bits (W, 256) in {0,1}."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2, size=(n_words, 256)).astype(np.uint8)


@functools.lru_cache()
def default_vocabulary(n_words: int = VOCAB_SIZE):
    """(bits (W, 256) uint8, idf (W,) float32 or None).

    Loads the trained asset (the ORBvoc.txt replacement); deterministic
    random vocabulary with no IDF if the asset is missing or sized
    differently."""
    import os

    asset = os.path.join(
        os.path.dirname(__file__), "..", "assets", "vocabulary.npz"
    )
    if os.path.exists(asset):
        data = np.load(asset)
        bits = data["bits"].astype(np.uint8)
        if bits.shape[0] == n_words:
            idf = data["idf"].astype(np.float32) if "idf" in data else None
            return bits, idf
    return random_vocabulary(n_words), None


def train_vocabulary(
    descs: np.ndarray, n_words: int = VOCAB_SIZE, iters: int = 4, seed: int = 7
) -> np.ndarray:
    """One-level binary k-means (majority vote) on packed (N, 32) descriptors.

    Replaces DBoW2's hierarchical k-means++ trainer (unused at runtime in the
    reference; here it is cheap enough to run on collected descriptors).
    Fully vectorized: chunked Hamming assignment + scatter-add centroid
    update (no per-word python loop).
    """
    rng = np.random.default_rng(seed)
    # bitorder MUST match orb.unpack_bits (LSB-first) — the runtime
    # quantizer (bow_vector) reads centroids in that bit order, so training
    # in numpy's default MSB order would scramble the learned vocabulary
    bits = np.unpackbits(descs, axis=1, bitorder="little").astype(np.float32)
    n = len(bits)
    if n < n_words:
        vocab = random_vocabulary(n_words, seed).astype(np.float32).copy()
        vocab[:n] = bits
        centers = vocab
    else:
        centers = bits[rng.choice(n, n_words, replace=False)].copy()
    for _ in range(iters):
        assign = assign_words(bits, centers)
        sums = np.zeros((n_words, 256), np.float64)
        np.add.at(sums, assign, bits)
        counts = np.bincount(assign, minlength=n_words).astype(np.float64)
        nonempty = counts > 0
        centers[nonempty] = (
            sums[nonempty] / counts[nonempty, None] > 0.5
        ).astype(np.float32)
    return centers.astype(np.uint8)


def train_vocabulary_jax(
    descs: np.ndarray, n_words: int = VOCAB_SIZE, iters: int = 4,
    seed: int = 7, chunk: int = 4096,
) -> np.ndarray:
    """Device-accelerated binary k-means (same semantics as
    train_vocabulary, which is numpy): the (chunk, 256) x (256, W)
    assignment matmuls run on the accelerator with the descriptor bits
    resident across iterations, and the majority-vote centroid update is
    one scatter-add — a 64k-word vocabulary over ~500k descriptors trains
    in seconds on a TPU vs tens of minutes in numpy. (The reference ships
    a pre-trained 145 MB ORBvoc.txt instead; DBoW2's k-means++ trainer is
    CPU-only and unused at runtime — SURVEY §2.1 row 18.)"""
    rng = np.random.default_rng(seed)
    bits_np = np.unpackbits(descs, axis=1, bitorder="little").astype(
        np.float32
    )  # LSB-first to match orb.unpack_bits (see train_vocabulary)
    n = len(bits_np)
    if n < n_words:
        vocab = random_vocabulary(n_words, seed).astype(np.float32).copy()
        vocab[:n] = bits_np
        return vocab.astype(np.uint8)
    pad = (-n) % chunk
    bits_pad = np.pad(bits_np, ((0, pad), (0, 0)))
    # device-resident across iterations; everything is passed as jit
    # ARGUMENTS (a closure would embed these MBs as program constants,
    # which overflows the relay compile service's request limit)
    blocks = jnp.asarray(bits_pad).reshape(-1, chunk, 256)
    valid = jnp.asarray(np.arange(len(bits_pad)) < n)
    centers = jnp.asarray(bits_np[rng.choice(n, n_words, replace=False)])

    @jax.jit
    def _assign_block(blk, cb):
        d = (
            blk.sum(1, keepdims=True) + cb.sum(1)[None, :]
            - 2.0 * jax.lax.dot_general(
                blk, cb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,  # exact on {0,1} bits
            )
        )
        return jnp.argmin(d, axis=1).astype(jnp.int32)

    @functools.partial(jax.jit, static_argnames=("nw",))
    def _update(assign_flat, cb, blocks, valid, nw):
        a = jnp.where(valid, assign_flat, nw)  # pad rows -> overflow row
        flat = blocks.reshape(-1, 256)
        sums = jnp.zeros((nw + 1, 256), jnp.float32).at[a].add(flat)
        counts = jnp.zeros((nw + 1,), jnp.float32).at[a].add(1.0)
        new = (sums[:nw] / jnp.maximum(counts[:nw, None], 1.0)
               > 0.5).astype(jnp.float32)
        return jnp.where((counts[:nw] > 0)[:, None], new, cb)

    for _ in range(iters):
        assign = jnp.concatenate(
            [_assign_block(blocks[i], centers) for i in range(len(blocks))]
        )
        centers = _update(assign, centers, blocks, valid, n_words)
    return np.asarray(centers).astype(np.uint8)


def assign_words(
    bits: np.ndarray, centers: np.ndarray, chunk: int = 16384
) -> np.ndarray:
    """Nearest-word assignment for (N, 256) bit rows, chunked so the (N, W)
    distance matrix never materializes whole."""
    out = np.empty(len(bits), np.int64)
    for i in range(0, len(bits), chunk):
        out[i : i + chunk] = _hamming_f32(bits[i : i + chunk], centers).argmin(1)
    return out


def assign_words_jax(
    bits: np.ndarray, centers: np.ndarray, chunk: int = 4096
) -> np.ndarray:
    """Device-accelerated assign_words (training/IDF-scale corpora)."""
    cb = jnp.asarray(np.asarray(centers, np.float32))

    @jax.jit
    def _blk(b, cb):  # cb as ARGUMENT: a closure would embed 67 MB of
        d = (         # centers as a program constant (relay 413 limit)
            b.sum(1, keepdims=True) + cb.sum(1)[None, :]
            - 2.0 * jax.lax.dot_general(
                b, cb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
        )
        return jnp.argmin(d, axis=1)

    pad = (-len(bits)) % chunk
    bp = np.pad(np.asarray(bits, np.float32), ((0, pad), (0, 0)))
    out = np.concatenate([
        np.asarray(_blk(jnp.asarray(bp[i: i + chunk]), cb))
        for i in range(0, len(bp), chunk)
    ])
    return out[: len(bits)].astype(np.int64)


def compute_idf(
    descs: np.ndarray, valid: np.ndarray, doc_ids: np.ndarray,
    vocab_bits: np.ndarray, use_jax: bool = False,
) -> np.ndarray:
    """IDF weights from a training corpus (†TemplatedVocabulary TF-IDF).

    doc_ids assigns each descriptor to a document (image/keyframe);
    idf[w] = log(n_docs / df[w]) with df = #docs whose BoW contains w
    (words seen in no document get the maximum weight).
    """
    bits = np.unpackbits(descs[valid], axis=1, bitorder="little").astype(
        np.float32
    )  # LSB-first: see train_vocabulary
    docs = np.asarray(doc_ids)[valid]
    assigner = assign_words_jax if use_jax else assign_words
    assign = assigner(bits, vocab_bits.astype(np.float32))
    n_docs = max(int(docs.max()) + 1 if len(docs) else 1, 1)
    pair = np.unique(np.stack([assign, docs], axis=1), axis=0)
    df = np.bincount(pair[:, 0], minlength=vocab_bits.shape[0]).astype(
        np.float64
    )
    idf = np.log(n_docs / np.maximum(df, 1.0))
    idf[df == 0] = np.log(n_docs)
    return idf.astype(np.float32)


def _hamming_f32(a_bits: np.ndarray, b_bits: np.ndarray) -> np.ndarray:
    dot = a_bits @ b_bits.T
    return a_bits.sum(1, keepdims=True) + b_bits.sum(1) - 2 * dot


@functools.partial(jax.jit, static_argnames=())
def bow_vector(
    desc: jnp.ndarray, valid: jnp.ndarray, vocab_bits: jnp.ndarray,
    idf: jnp.ndarray = None,
) -> jnp.ndarray:
    """Packed (N, 32) descriptors -> L1-normalized TF-IDF vector (W,).

    One Hamming matmul + one scatter-add; the DBoW2 `transform()` path.
    With idf=None the vector is plain TF (the weights degrade gracefully
    when no trained corpus statistics exist).

    A hand-written Pallas kernel that fused the top-2 reduction into the
    MXU tiles (avoiding the (N, W) distance matrix in HBM) was measured on
    v5e and LOST to this XLA formulation at every production size
    (N=1024/W=16k: 0.86 vs 1.15 ms; N=4096/W=64k: 5.2 vs 8.7 ms amortized
    throughput) — XLA's own fusion of the reduction epilogue is already
    better scheduled, so the kernel was removed rather than shipped unwired.
    """
    bits = unpack_bits(desc).astype(jnp.float32)           # (N, 256)
    vb = vocab_bits.astype(jnp.float32)                    # (W, 256)
    W = vocab_bits.shape[0]
    # Explicit DEFAULT precision: bf16 MXU path is exact on {0,1} bits (see
    # the package-wide float32 matmul policy in orbslam2_tpu.__init__).
    dot = jax.lax.dot_general(
        bits, vb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    d = bits.sum(1, keepdims=True) + vb.sum(1)[None, :] - 2.0 * dot
    d = jnp.where(valid[:, None], d, jnp.inf)
    words = jnp.argmin(d, axis=1)                          # (N,)
    tf = jnp.zeros((W,), jnp.float32).at[words].add(
        valid.astype(jnp.float32)
    )
    if idf is not None:
        tf = tf * idf
    return tf / jnp.maximum(jnp.sum(tf), 1e-9)


def l1_score(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 similarity: 1 - 0.5 * |a - b|_1 for L1-normalized vectors
    (†ScoringObject.cpp:L1Scoring); broadcasts (W,) vs (..., W)."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(a - b), axis=-1)


# Database retrieval (L1 scores + common-word counts over the (K, W)
# matrix) runs host-side in map/keyframe_database.py: the matrix lives in
# host memory between queries, so a device matvec would pay a full re-upload
# per query on top of the dispatch RTT.
