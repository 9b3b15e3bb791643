"""Golden/property tests for the ORB frontend (FAST + orientation + rBRIEF)."""

import numpy as np
import jax.numpy as jnp
import pytest

from orbslam2_tpu.config import ExtractorConfig
from orbslam2_tpu.ops import orb
from orbslam2_tpu.ops import image as img_ops


# ---------------------------------------------------------------------------
# Oracles
# ---------------------------------------------------------------------------

def fast_oracle(img: np.ndarray, th: float) -> np.ndarray:
    """Brute-force FAST-9/16 segment test (bool corner map)."""
    H, W = img.shape
    out = np.zeros((H, W), bool)
    ring = orb.FAST_RING
    for y in range(3, H - 3):
        for x in range(3, W - 3):
            p = img[y, x]
            d = np.array([img[y + dy, x + dx] for dy, dx in ring]) - p
            bright = d > th
            dark = d < -th
            for m in (bright, dark):
                mm = np.concatenate([m, m])
                run = 0
                best = 0
                for v in mm:
                    run = run + 1 if v else 0
                    best = max(best, run)
                if best >= 9:
                    out[y, x] = True
                    break
    return out


def render_squares(rng, H=120, W=160, n=12, size=9):
    """Black image with bright axis-aligned squares: 4 FAST corners each."""
    img = np.zeros((H, W), np.float32)
    corners = []
    for _ in range(n):
        y = rng.integers(25, H - 25 - size)
        x = rng.integers(25, W - 25 - size)
        img[y : y + size, x : x + size] = 200.0
        corners += [(x, y), (x + size - 1, y), (x, y + size - 1), (x + size - 1, y + size - 1)]
    return img, np.array(corners)


class TestFastScore:
    def test_matches_oracle_corners(self, rng):
        img, _ = render_squares(rng)
        S = np.asarray(orb.fast_score_map(jnp.asarray(img)))
        got = S > 20.0
        want = fast_oracle(img, 20.0)
        inner = np.zeros_like(want)
        inner[4:-4, 4:-4] = True
        np.testing.assert_array_equal(got & inner, want & inner)

    def test_flat_image_no_corners(self):
        img = np.full((64, 64), 100.0, np.float32)
        S = np.asarray(orb.fast_score_map(jnp.asarray(img)))
        assert not np.any(S > 7.0)

    def test_score_is_max_threshold(self, rng):
        """Score semantics: corner at th iff score > th."""
        img, _ = render_squares(rng, n=6)
        img += rng.normal(0, 2.0, img.shape).astype(np.float32)
        S = np.asarray(orb.fast_score_map(jnp.asarray(img)))
        for th in (10.0, 40.0):
            want = fast_oracle(img, th)
            got = S > th
            inner = np.zeros_like(want)
            inner[4:-4, 4:-4] = True
            np.testing.assert_array_equal(got & inner, want & inner)


class TestDetectLevel:
    def test_finds_square_corners(self, rng):
        img, corners = render_squares(rng, H=160, W=200, n=10)
        xy, _xys, resp, valid = orb.detect_level(jnp.asarray(img), 64, 20.0, 7.0)
        xy = np.asarray(xy)[np.asarray(valid)]
        assert len(xy) >= 20
        # every detection is within 2 px of a true corner
        d = np.linalg.norm(xy[:, None] - corners[None], axis=-1).min(axis=1)
        assert np.all(d <= 2.0), d.max()

    def test_spatial_balance(self, rng):
        """Round-robin selection: no cell hoards the budget."""
        img, _ = render_squares(rng, H=160, W=200, n=20)
        xy, _xys, resp, valid = orb.detect_level(jnp.asarray(img), 40, 20.0, 7.0)
        xy = np.asarray(xy)[np.asarray(valid)]
        cells = set(map(tuple, (xy // orb.CELL).tolist()))
        assert len(cells) >= 10  # spread across many cells

    def test_respects_border(self, rng):
        img, _ = render_squares(rng)
        img[:25] = 0  # no features near top anyway
        xy, _xys, resp, valid = orb.detect_level(jnp.asarray(img), 32, 20.0, 7.0)
        xy = np.asarray(xy)[np.asarray(valid)]
        if len(xy):
            assert xy[:, 0].min() >= orb.PATCH_R
            assert xy[:, 1].min() >= orb.PATCH_R


class TestOrientation:
    def test_gradient_patch_angle(self):
        """A patch whose centroid is offset along +x gives angle ~ 0, along +y ~ pi/2."""
        base = np.zeros((64, 64), np.float32)
        base[32, 40] = 255.0  # mass to the right of (32, 32) center
        patches = orb.extract_patches(jnp.asarray(base), jnp.asarray([[32, 32]], np.int32))
        ang = float(orb.ic_angles(patches)[0])
        assert abs(ang) < 0.1
        base2 = np.zeros((64, 64), np.float32)
        base2[40, 32] = 255.0  # mass below center => +y
        patches2 = orb.extract_patches(jnp.asarray(base2), jnp.asarray([[32, 32]], np.int32))
        ang2 = float(orb.ic_angles(patches2)[0])
        assert abs(ang2 - np.pi / 2) < 0.1

    def test_rotation_equivariance(self, rng):
        """Rotating the patch content rotates the IC angle accordingly."""
        img = np.zeros((81, 81), np.float32)
        yy, xx = np.mgrid[:81, :81]
        img += np.exp(-((yy - 40) ** 2 + (xx - 52) ** 2) / 30.0) * 200.0
        p = orb.extract_patches(jnp.asarray(img), jnp.asarray([[40, 40]], np.int32))
        a0 = float(orb.ic_angles(p)[0])
        img90 = np.rot90(img, k=-1).copy()  # rotates +x into +y (image coords)
        p90 = orb.extract_patches(jnp.asarray(img90), jnp.asarray([[40, 40]], np.int32))
        a90 = float(orb.ic_angles(p90)[0])
        diff = (a90 - a0 - np.pi / 2 + np.pi) % (2 * np.pi) - np.pi
        assert abs(diff) < 0.15


class TestDescriptors:
    def _random_texture(self, rng, H=200, W=200):
        img = rng.uniform(0, 255, size=(H, W)).astype(np.float32)
        return np.asarray(img_ops.gaussian_blur(jnp.asarray(img), 5, 1.0))

    def test_deterministic(self, rng):
        img = self._random_texture(rng)
        xy = jnp.asarray([[60, 60], [100, 120]], np.int32)
        blur = img_ops.gaussian_blur(jnp.asarray(img))
        p = orb.extract_patches(blur, xy)
        a = orb.ic_angles(orb.extract_patches(jnp.asarray(img), xy))
        d1 = np.asarray(orb.brief_descriptors(p, a))
        d2 = np.asarray(orb.brief_descriptors(p, a))
        np.testing.assert_array_equal(d1, d2)
        assert d1.shape == (2, 32) and d1.dtype == np.uint8

    def test_distinct_points_distinct_descriptors(self, rng):
        img = self._random_texture(rng)
        xy = jnp.asarray([[60, 60], [130, 130]], np.int32)
        blur = img_ops.gaussian_blur(jnp.asarray(img))
        p = orb.extract_patches(blur, xy)
        a = orb.ic_angles(orb.extract_patches(jnp.asarray(img), xy))
        d = np.asarray(orb.brief_descriptors(p, a))
        bits = np.unpackbits(d, axis=1)
        ham = (bits[0] != bits[1]).sum()
        assert ham > 60  # random descriptors differ in ~128 bits

    def test_same_point_same_descriptor_across_shift(self, rng):
        """Descriptor of the same texture is stable when the image shifts."""
        img = self._random_texture(rng)
        shifted = np.roll(img, (5, -3), axis=(0, 1))
        blur = img_ops.gaussian_blur(jnp.asarray(img))
        blur_s = img_ops.gaussian_blur(jnp.asarray(shifted))
        xy = jnp.asarray([[100, 100]], np.int32)
        xy_s = jnp.asarray([[97, 105]], np.int32)  # same content location
        a = orb.ic_angles(orb.extract_patches(jnp.asarray(img), xy))
        a_s = orb.ic_angles(orb.extract_patches(jnp.asarray(shifted), xy_s))
        d = np.asarray(orb.brief_descriptors(orb.extract_patches(blur, xy), a))
        d_s = np.asarray(orb.brief_descriptors(orb.extract_patches(blur_s, xy_s), a_s))
        ham = (np.unpackbits(d) != np.unpackbits(d_s)).sum()
        assert ham < 40, ham

    def test_unpack_roundtrip(self, rng):
        d = rng.integers(0, 256, size=(5, 32)).astype(np.uint8)
        bits = np.asarray(orb.unpack_bits(jnp.asarray(d)))
        # repack
        w = 2 ** np.arange(8)
        repacked = (bits.reshape(5, 32, 8) * w).sum(-1).astype(np.uint8)
        np.testing.assert_array_equal(repacked, d)


class TestExtractor:
    def test_end_to_end(self, rng):
        cfg = ExtractorConfig(n_features=256, n_levels=4)
        img, corners = render_squares(rng, H=240, W=320, n=30, size=11)
        img += rng.normal(0, 1.0, img.shape).astype(np.float32)
        ext = orb.OrbExtractor(cfg, 240, 320)
        feats = ext(img)
        assert feats.xy.shape == (cfg.max_keypoints, 2)
        v = np.asarray(feats.valid)
        assert v.sum() >= 60
        xy = np.asarray(feats.xy)[v]
        # level-0 detections should be near true corners
        lvl0 = np.asarray(feats.octave)[v] == 0
        d = np.linalg.norm(xy[lvl0][:, None] - corners[None], axis=-1).min(axis=1)
        assert np.median(d) <= 2.0

    def test_budgets(self):
        b = orb.level_budgets(1000, 8, 1.2)
        assert sum(b) == 1000
        assert b[0] > b[1] > b[7]


class TestFastPathsMatchReferencePaths:
    """The TPU-fast conv/flat-gather implementations must agree with the
    patch-based oracle implementations."""

    def test_ic_angles_conv_matches_patches(self, rng):
        img = rng.uniform(0, 255, size=(120, 160)).astype(np.float32)
        xy = np.stack(
            [rng.integers(25, 135, 20), rng.integers(25, 95, 20)], axis=1
        ).astype(np.int32)
        a_patch = np.asarray(orb.ic_angles(orb.extract_patches(jnp.asarray(img), jnp.asarray(xy))))
        a_conv = np.asarray(orb.ic_angles_conv(jnp.asarray(img), jnp.asarray(xy)))
        np.testing.assert_allclose(a_conv, a_patch, atol=5e-3)  # prefix-sum f32 cancellation; 0.3 deg worst-case

    def test_brief_flat_matches_patches(self, rng):
        img = rng.uniform(0, 255, size=(120, 160)).astype(np.float32)
        blur = img_ops.gaussian_blur(jnp.asarray(img))
        xy = np.stack(
            [rng.integers(25, 135, 20), rng.integers(25, 95, 20)], axis=1
        ).astype(np.int32)
        ang = rng.uniform(-np.pi, np.pi, 20).astype(np.float32)
        d_patch = np.asarray(
            orb.brief_descriptors(orb.extract_patches(blur, jnp.asarray(xy)), jnp.asarray(ang))
        )
        d_flat = np.asarray(
            orb.brief_descriptors_flat(blur, jnp.asarray(xy), jnp.asarray(ang))
        )
        np.testing.assert_array_equal(d_flat, d_patch)
