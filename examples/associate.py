#!/usr/bin/env python
"""Timestamp association tool — parity with †Examples/RGB-D/associate.py.

Usage: python examples/associate.py rgb.txt depth.txt [--max-dt 0.02]
Prints "ts_a file_a ts_b file_b" lines like the reference script.
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from orbslam2_tpu.utils.datasets import _read_tum_list, associate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("first")
    ap.add_argument("second")
    ap.add_argument("--max-dt", type=float, default=0.02)
    args = ap.parse_args()
    a = _read_tum_list(args.first)
    b = _read_tum_list(args.second)
    b_by_path = {p: t for t, p in b}
    for ta, pa, pb in associate(a, b, args.max_dt):
        print(f"{ta:.6f} {pa} {b_by_path[pb]:.6f} {pb}")


if __name__ == "__main__":
    main()
