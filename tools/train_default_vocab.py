"""Build the default vocabulary asset (the ORBvoc.txt replacement).

Renders a varied corpus — box rooms across all four texture styles plus
street-like segmented-facade corridors (the self-similar confuser regime) —
extracts ORB descriptors with the shipped BRIEF pattern, trains the flat
binary-k-means vocabulary ON DEVICE (bow.train_vocabulary_jax), computes
per-word IDF over the training images, and writes
orbslam2_tpu/assets/vocabulary.npz — loaded by KeyFrameDatabase by default.

64k words replaces the round-2 16k box-room asset: on the 1536-KF scale
benchmark (tools/PLACE_RECOGNITION.md) 64k words took top-1 same-place
recall 95.7% -> 98.3%, false candidates 5.9 -> 0.6 per query, and
novel-world false hits 10% -> 0%.

Usage (TPU-accelerated; CPU fallback works but k-means is minutes slower):
  python tools/train_default_vocab.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from orbslam2_tpu.config import ExtractorConfig
from orbslam2_tpu.ops import bow, orb
from orbslam2_tpu.utils.synthetic import (
    make_box_room, make_corridor, orbit_trajectory, render,
)


def corridor_pose(z, sway=0.0):
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = -np.array([sway, 0.0, z], np.float32)
    return T


def main():
    t0 = time.perf_counter()
    K = np.array([[520.0, 0, 320], [0, 520, 240], [0, 0, 1]], np.float32)
    W, H = 640, 480
    cfg = ExtractorConfig(n_features=1500, n_levels=8)
    extractor = orb.OrbExtractor(cfg, H, W)

    descs, valids, doc_ids = [], [], []
    doc = 0

    def grab(img):
        nonlocal doc
        feats = extractor(img)
        descs.append(np.asarray(feats.desc))
        valids.append(np.asarray(feats.valid))
        doc_ids.append(np.full(len(descs[-1]), doc, np.int64))
        doc += 1

    # 12 rooms x 14 views (styles drawn per plane inside _make_texture)
    for seed in range(12):
        planes = make_box_room(seed=seed, styles=None)  # style variety
        traj = orbit_trajectory(28, radius=0.9, advance=0.06,
                                yaw_rate=0.09 + 0.02 * seed)
        for Tcw in traj[::2]:
            grab(render(planes, K, Tcw, W, H))
    # 8 corridors x 16 views (brick/stripe facades)
    for seed in range(8):
        planes = make_corridor(seed=300 + seed, length=40.0)
        for i in range(16):
            grab(render(planes, K,
                        corridor_pose(2.0 * i, 0.3 * np.sin(0.5 * i)), W, H))

    desc = np.concatenate(descs)
    valid = np.concatenate(valids)
    docs = np.concatenate(doc_ids)
    print(f"{valid.sum()} descriptors from {doc} images "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)

    train = desc[valid]
    vocab = bow.train_vocabulary_jax(train, n_words=bow.VOCAB_SIZE, iters=4)
    print(f"k-means done ({time.perf_counter()-t0:.0f}s)", flush=True)
    idf = bow.compute_idf(desc, valid, docs, vocab, use_jax=True)
    out = os.path.join("orbslam2_tpu", "assets", "vocabulary.npz")
    np.savez_compressed(out, bits=vocab, idf=idf)
    used = (idf < np.log(doc)).sum()
    print(f"saved {out}: {bow.VOCAB_SIZE} words, {used} seen in training, "
          f"idf range {idf.min():.2f}..{idf.max():.2f} "
          f"({time.perf_counter()-t0:.0f}s)")


if __name__ == "__main__":
    main()
