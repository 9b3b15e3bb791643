"""Build the default vocabulary asset (the ORBvoc.txt replacement).

Renders several synthetic worlds from varied viewpoints, extracts ORB
descriptors (with the shipped BRIEF pattern), trains the flat binary-k-means
vocabulary, computes per-word IDF over the training images, and writes
orbslam2_tpu/assets/vocabulary.npz — loaded by KeyFrameDatabase by default.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/train_default_vocab.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, ".")

from orbslam2_tpu.config import ExtractorConfig
from orbslam2_tpu.ops import bow, orb
from orbslam2_tpu.utils.synthetic import (
    make_box_room, orbit_trajectory, render,
)


def main():
    K = np.array([[520.0, 0, 320], [0, 520, 240], [0, 0, 1]], np.float32)
    W, H = 640, 480
    cfg = ExtractorConfig(n_features=1500, n_levels=8)
    extractor = orb.OrbExtractor(cfg, H, W)

    descs, valids, doc_ids = [], [], []
    doc = 0
    for seed in range(10):
        planes = make_box_room(seed=seed)
        traj = orbit_trajectory(24, radius=0.9, advance=0.06,
                                yaw_rate=0.09 + 0.02 * seed)
        for Tcw in traj[::2]:
            img = render(planes, K, Tcw, W, H)
            feats = extractor(img)
            descs.append(np.asarray(feats.desc))
            valids.append(np.asarray(feats.valid))
            doc_ids.append(np.full(len(descs[-1]), doc, np.int64))
            doc += 1
    desc = np.concatenate(descs)
    valid = np.concatenate(valids)
    docs = np.concatenate(doc_ids)
    print(f"{valid.sum()} descriptors from {doc} images", flush=True)

    train = desc[valid]
    cap = 160_000
    if len(train) > cap:
        train = train[np.random.default_rng(0).permutation(len(train))[:cap]]
    vocab = bow.train_vocabulary(train, n_words=bow.VOCAB_SIZE, iters=4)
    idf = bow.compute_idf(desc, valid, docs, vocab)
    out = os.path.join("orbslam2_tpu", "assets", "vocabulary.npz")
    np.savez_compressed(out, bits=vocab, idf=idf)
    used = (idf < np.log(doc)).sum()
    print(f"saved {out}: {bow.VOCAB_SIZE} words, {used} seen in training, "
          f"idf range {idf.min():.2f}..{idf.max():.2f}")


if __name__ == "__main__":
    main()
