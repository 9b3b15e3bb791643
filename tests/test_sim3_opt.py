"""Tests for OptimizeSim3 LM refinement and SearchBySim3 match growing.

VERDICT round-1 item 3's acceptance: a loop transform with known drift must
recover scale to <1% after refinement.
"""

import numpy as np
import jax.numpy as jnp

from orbslam2_tpu.models.camera import Camera
from orbslam2_tpu.ops import geometry as geo, sim3_opt


def _problem(rng, n=80, s=1.3, noise_px=0.3, outlier_frac=0.0):
    """Two cameras seeing the same points; S12 maps cam2 coords -> cam1."""
    cam = Camera.create(fx=500, fy=500, cx=320, cy=240, width=640, height=480)
    p1c = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 9, n)],
        axis=1,
    ).astype(np.float32)
    R = np.asarray(geo.so3_exp(jnp.asarray([0.08, 0.15, -0.04]))).astype(np.float32)
    t = np.array([0.4, -0.3, 0.2], np.float32)
    p2c = (((p1c - t) / s) @ R).astype(np.float32)  # p1 = s R p2 + t

    def proj(p):
        return (500 * p[:, :2] / p[:, 2:3] + [320, 240]).astype(np.float32)

    u1 = proj(p1c) + rng.normal(0, noise_px, (n, 2)).astype(np.float32)
    u2 = proj(p2c) + rng.normal(0, noise_px, (n, 2)).astype(np.float32)
    n_out = int(outlier_frac * n)
    u1[:n_out] += rng.uniform(30, 80, (n_out, 2)).astype(np.float32)
    S_true = np.asarray(
        geo.sim3_make(jnp.float32(s), jnp.asarray(R), jnp.asarray(t))
    )
    return cam, p1c, p2c, u1, u2, S_true, n_out


class TestOptimizeSim3:
    def test_refines_perturbed_transform(self, rng):
        cam, p1c, p2c, u1, u2, S_true, _ = _problem(rng)
        # perturb: 2 deg rotation, 10 cm translation, 5% scale drift
        xi = np.zeros(7, np.float32)
        xi[:3] = [0.05, -0.08, 0.03]
        xi[3:6] = [0.02, -0.015, 0.025]
        xi[6] = 0.05
        S0 = np.asarray(geo.sim3_compose(geo.sim3_exp(jnp.asarray(xi)),
                                         jnp.asarray(S_true)))
        n = len(p1c)
        res = sim3_opt.optimize_sim3(
            cam, jnp.asarray(S0), jnp.asarray(p1c), jnp.asarray(p2c),
            jnp.asarray(u1), jnp.asarray(u2),
            jnp.ones(n, np.float32), jnp.ones(n, np.float32),
            jnp.ones(n, bool),
        )
        assert int(res.n_inliers) > 0.9 * n
        s_err = abs(float(geo.sim3_s(res.S12)) / float(S_true[0]) - 1.0)
        assert s_err < 0.01, s_err  # scale recovered to <1%
        t_err = np.linalg.norm(np.asarray(geo.sim3_t(res.S12)) - S_true[5:8])
        assert t_err < 0.02, t_err

    def test_outlier_rejection(self, rng):
        cam, p1c, p2c, u1, u2, S_true, n_out = _problem(
            rng, outlier_frac=0.25
        )
        n = len(p1c)
        res = sim3_opt.optimize_sim3(
            cam, jnp.asarray(S_true), jnp.asarray(p1c), jnp.asarray(p2c),
            jnp.asarray(u1), jnp.asarray(u2),
            jnp.ones(n, np.float32), jnp.ones(n, np.float32),
            jnp.ones(n, bool),
        )
        inl = np.asarray(res.inliers)
        assert inl[:n_out].sum() == 0  # corrupted edges rejected
        assert inl[n_out:].mean() > 0.9
        s_err = abs(float(geo.sim3_s(res.S12)) / float(S_true[0]) - 1.0)
        assert s_err < 0.01

    def test_fix_scale_pins_scale(self, rng):
        cam, p1c, p2c, u1, u2, S_true, _ = _problem(rng, s=1.0)
        xi = np.zeros(7, np.float32)
        xi[3:6] = [0.01, -0.02, 0.01]
        S0 = np.asarray(geo.sim3_compose(geo.sim3_exp(jnp.asarray(xi)),
                                         jnp.asarray(S_true)))
        n = len(p1c)
        res = sim3_opt.optimize_sim3(
            cam, jnp.asarray(S0), jnp.asarray(p1c), jnp.asarray(p2c),
            jnp.asarray(u1), jnp.asarray(u2),
            jnp.ones(n, np.float32), jnp.ones(n, np.float32),
            jnp.ones(n, bool), fix_scale=True,
        )
        np.testing.assert_allclose(float(geo.sim3_s(res.S12)), 1.0, atol=1e-5)
        assert int(res.n_inliers) > 0.9 * n


class TestSearchBySim3:
    def test_grows_mutual_matches(self, rng):
        # realistic few-percent scale drift (the gate bands assume the two
        # sides' scales are within a pyramid step of each other, like the ref)
        cam, p1c, p2c, _, _, S_true, _ = _problem(rng, s=1.05, noise_px=0.0)
        n = len(p1c)
        # shared descriptors with a couple of corrupted rows
        desc = rng.integers(0, 256, (n, 32)).astype(np.uint8)
        desc2 = desc.copy()
        desc2[:3] = rng.integers(0, 256, (3, 32)).astype(np.uint8)

        def proj(p):
            return (500 * p[:, :2] / p[:, 2:3] + [320, 240]).astype(np.float32)

        dmax1 = (np.linalg.norm(p1c, axis=1) * 1.1).astype(np.float32)
        dmax2 = (np.linalg.norm(p2c, axis=1) * 1.1).astype(np.float32)
        idx2, mutual = sim3_opt.search_by_sim3(
            cam, jnp.asarray(S_true),
            jnp.asarray(p1c), jnp.asarray(desc), jnp.ones(n, bool),
            jnp.asarray(dmax1), jnp.asarray(proj(p1c)),
            jnp.zeros(n, jnp.int32),
            jnp.asarray(p2c), jnp.asarray(desc2), jnp.ones(n, bool),
            jnp.asarray(dmax2),
            jnp.asarray(proj(p2c)), jnp.zeros(n, jnp.int32),
            jnp.float32(1.2), 8,
        )
        mutual = np.asarray(mutual)
        idx2 = np.asarray(idx2)
        good = np.where(mutual)[0]
        # ~25% of identity pairs fall outside the octave band in this flat
        # octave-0 setup (predicted level 2 vs observed 0) — by design
        assert len(good) > 0.6 * n, len(good)
        assert (idx2[good] == good).all()  # identity correspondence
