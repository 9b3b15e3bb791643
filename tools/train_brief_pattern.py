"""Learn a decorrelated steered-BRIEF test pattern (the rBRIEF procedure).

The reference ships the learned `bit_pattern_31_` table; we deliberately do
not copy it (†src/ORBextractor.cc pattern table). Instead this tool re-runs
the published learning algorithm (Rublee et al., ORB, ICCV 2011 §4.3) on
patches harvested from our synthetic worlds:

  1. render several box-room worlds, extract oriented FAST keypoints;
  2. candidate tests = pairs of points in the 27x27 patch grid; each test's
     bit is evaluated on every *steered* (rotated by keypoint angle) patch;
  3. greedily pick 256 tests with per-bit mean closest to 0.5 subject to
     |corr| < threshold against all previously picked tests, relaxing the
     threshold until 256 are found.

Writes orbslam2_tpu/assets/brief_pattern.npz, which ops.orb loads at import
time (falls back to the seeded-Gaussian pattern if absent).

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/train_brief_pattern.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, ".")

RADIUS = 13          # test points live in [-13, 13]^2 (fits the 41x41 patch)
GRID_STEP = 1
N_PATCHES = 12000
N_CANDIDATES = 80000
TARGET = 256


def harvest_patches():
    """Oriented, blurred patches from several synthetic worlds."""
    import jax.numpy as jnp

    from orbslam2_tpu.config import ExtractorConfig
    from orbslam2_tpu.ops import image as img_ops
    from orbslam2_tpu.ops import orb
    from orbslam2_tpu.utils.synthetic import (
        make_box_room, orbit_trajectory, render,
    )

    K = np.array([[520.0, 0, 320], [0, 520, 240], [0, 0, 1]], np.float32)
    W, H = 640, 480
    cfg = ExtractorConfig(n_features=1200, n_levels=4)
    extractor = orb.OrbExtractor(cfg, H, W)

    samples = []  # (angle, blurred_level_image, xy_int, level)
    for seed in range(4):
        planes = make_box_room(seed=seed)
        # varied viewpoints incl. rotation (stresses steering stability)
        traj = orbit_trajectory(8, radius=0.8, advance=0.15, yaw_rate=0.12)
        for Tcw in traj[::2]:
            img = render(planes, K, Tcw, W, H)
            feats = extractor(img)
            valid = np.asarray(feats.valid)
            ang = np.asarray(feats.angle)[valid]
            oct_ = np.asarray(feats.octave)[valid]
            xy0 = np.asarray(feats.xy)[valid]
            levels = img_ops.build_pyramid(
                jnp.asarray(img, jnp.float32), cfg.n_levels, cfg.scale_factor
            )
            blurred = [np.asarray(img_ops.gaussian_blur(l)) for l in levels]
            for lvl in range(cfg.n_levels):
                m = oct_ == lvl
                if not m.any():
                    continue
                sc = cfg.scale_factor ** lvl
                xy_l = np.round(xy0[m] / sc).astype(np.int64)
                samples.append((ang[m], blurred[lvl], xy_l, lvl))
    return samples


def main():
    rng = np.random.default_rng(7)

    # --- candidate point grid and tests
    coords = np.arange(-RADIUS, RADIUS + 1, GRID_STEP)
    gx, gy = np.meshgrid(coords, coords)
    pts = np.stack([gx.ravel(), gy.ravel()], axis=1).astype(np.int32)  # (G,2)
    G = len(pts)
    cand = rng.integers(0, G, size=(N_CANDIDATES, 2))
    cand = cand[cand[:, 0] != cand[:, 1]]
    cand = np.unique(np.sort(cand, axis=1), axis=0)
    rng.shuffle(cand)
    print(f"{len(cand)} candidate tests over {G} grid points")

    # --- steered point samples per patch
    print("harvesting patches...")
    samples = harvest_patches()
    vals_list = []
    for ang, blurred, xy_l, _ in samples:
        Hh, Ww = blurred.shape
        c = np.cos(ang)[:, None]
        s = np.sin(ang)[:, None]
        px = pts[None, :, 0].astype(np.float32)
        py = pts[None, :, 1].astype(np.float32)
        rc = np.round(px * c - py * s).astype(np.int64)
        rr = np.round(px * s + py * c).astype(np.int64)
        yy = np.clip(xy_l[:, 1:2] + rr, 0, Hh - 1)
        xx = np.clip(xy_l[:, 0:1] + rc, 0, Ww - 1)
        vals_list.append(blurred.reshape(-1)[yy * Ww + xx])  # (n, G)
    vals = np.concatenate(vals_list, axis=0)
    if len(vals) > N_PATCHES:
        vals = vals[rng.permutation(len(vals))[:N_PATCHES]]
    n = len(vals)
    print(f"{n} steered patches")

    # --- bit matrix for all candidates (float32 for matmul corr updates)
    bits = (vals[:, cand[:, 0]] < vals[:, cand[:, 1]]).astype(np.float32).T
    mean = bits.mean(axis=1)                      # (C,)
    std = np.sqrt(np.maximum(mean * (1 - mean), 1e-9))
    order = np.argsort(np.abs(mean - 0.5))

    # --- greedy decorrelated selection with threshold relaxation
    selected = []
    max_corr = np.zeros(len(cand), np.float32)
    taken = np.zeros(len(cand), bool)

    def try_fill(th):
        for ci in order:
            if len(selected) >= TARGET:
                break
            if taken[ci] or max_corr[ci] >= th:
                continue
            if abs(mean[ci] - 0.5) > 0.45:
                continue  # near-constant bit carries no information
            taken[ci] = True
            selected.append(ci)
            # one matvec updates every candidate's max |corr| vs the new test
            b = bits[ci]
            dot = bits @ b / n
            corr = (dot - mean * mean[ci]) / (std * std[ci])
            np.maximum(max_corr, np.abs(corr), out=max_corr)

    for th in (0.2, 0.25, 0.3, 0.4, 0.5, 0.7, 1.01):
        try_fill(th)
        print(f"th={th}: {len(selected)} selected")
        if len(selected) >= TARGET:
            break

    sel = np.array(selected[:TARGET])
    pa = pts[cand[sel, 0]]
    pb = pts[cand[sel, 1]]
    out_dir = os.path.join("orbslam2_tpu", "assets")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "brief_pattern.npz")
    np.savez_compressed(out, pa=pa.astype(np.int32), pb=pb.astype(np.int32))
    sel_bits = bits[sel]
    sel_mean = sel_bits.mean(axis=1)
    cc = np.corrcoef(sel_bits)
    off = np.abs(cc - np.eye(TARGET))
    print(f"saved {out}")
    print(
        f"bit means: {sel_mean.min():.3f}..{sel_mean.max():.3f} "
        f"(mean |m-0.5| = {np.abs(sel_mean-0.5).mean():.3f}); "
        f"pairwise |corr|: mean {off.mean():.3f}, max {off.max():.3f}"
    )


if __name__ == "__main__":
    main()
