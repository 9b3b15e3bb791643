#!/usr/bin/env python
"""Train a binary-words vocabulary from a saved map's descriptors.

Replaces the reference's pre-trained 145 MB ORBvoc.txt asset (SURVEY §2.1
row 23): the flat vocabulary (ops/bow.py) can be trained on descriptors from
any saved map and plugged into KeyFrameDatabase.

Usage: python examples/train_vocab.py map.npz vocab.npy [--words 4096]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from orbslam2_tpu.ops import bow


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("map_npz")
    ap.add_argument("out_npy")
    ap.add_argument("--words", type=int, default=bow.VOCAB_SIZE)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--max-desc", type=int, default=200000)
    args = ap.parse_args()

    data = np.load(args.map_npz)
    desc = data["kf_desc"]            # (K, N, 32)
    valid = data["kf_feat_valid"]
    flat = desc[valid]
    if len(flat) > args.max_desc:
        rng = np.random.default_rng(0)
        flat = flat[rng.choice(len(flat), args.max_desc, replace=False)]
    print(f"training on {len(flat)} descriptors -> {args.words} words")
    vocab = bow.train_vocabulary(flat, n_words=args.words, iters=args.iters)
    np.save(args.out_npy, vocab)
    print(f"saved {args.out_npy} ({vocab.shape})")


if __name__ == "__main__":
    main()
