"""Device point-attribute refresh (ops/point_attrs.py) vs the host-numpy
golden path in MapState.update_point_attributes."""

import numpy as np
import pytest

from orbslam2_tpu.config import (CameraConfig, ExtractorConfig,
                                 MapCapacityConfig, SlamConfig)
from orbslam2_tpu.map.state import MapState


def _random_map(seed=0, n_kf=6, n_pts=200):
    rng = np.random.default_rng(seed)
    cfg = SlamConfig(
        sensor="rgbd",
        camera=CameraConfig(fx=260, fy=260, cx=160, cy=120, width=320,
                            height=240, bf=26.0),
        extractor=ExtractorConfig(n_features=256, n_levels=4),
        capacity=MapCapacityConfig(max_keyframes=32, max_map_points=2048,
                                   max_obs_per_point=8),
    )
    m = MapState.allocate(cfg)
    N = cfg.extractor.max_keypoints
    kfs = []
    for k in range(n_kf):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = rng.normal(0, 0.5, 3)
        kfs.append(m.add_keyframe(
            T, rng.uniform(0, 320, (N, 2)).astype(np.float32),
            rng.integers(0, 256, (N, 32)).astype(np.uint8),
            rng.integers(0, 4, N).astype(np.int32),
            rng.uniform(-3, 3, N).astype(np.float32),
            np.ones(N, bool), k, k / 30.0,
        ))
    pts = np.concatenate(
        [rng.uniform(-2, 2, (n_pts, 2)), rng.uniform(3, 8, (n_pts, 1))], 1
    ).astype(np.float32)
    ids = m.add_map_points_batch(pts, kfs[0])
    for k in kfs:
        feats = rng.choice(N, size=n_pts, replace=False)
        mask = rng.random(n_pts) < 0.7
        m.add_observations_batch(ids[mask], k, feats[mask])
    return m, ids


def test_device_matches_host():
    m, ids = _random_map()
    ids = ids[m.mp_n_obs[ids] > 0]
    # host golden
    m.update_point_attributes(ids)  # mirror not built yet -> host path
    host = (m.mp_desc[ids].copy(), m.mp_normal[ids].copy(),
            m.mp_dmin[ids].copy(), m.mp_dmax[ids].copy(),
            m.mp_ref_kf[ids].copy())
    # scramble, then device path
    m.mp_desc[ids] = 0
    m.mp_normal[ids] = 0
    m.mp_dmin[ids] = -1
    m.mp_dmax[ids] = -1
    m.dev_kf.ensure(m)
    assert len(ids) >= 128, "need the device-path threshold"
    m.update_point_attributes(ids)
    np.testing.assert_array_equal(m.mp_desc[ids], host[0])
    np.testing.assert_allclose(m.mp_normal[ids], host[1], atol=2e-3)
    np.testing.assert_allclose(m.mp_dmin[ids], host[2], rtol=2e-3)
    np.testing.assert_allclose(m.mp_dmax[ids], host[3], rtol=2e-3)
    np.testing.assert_array_equal(m.mp_ref_kf[ids], host[4])


def test_small_batch_stays_host():
    m, ids = _random_map(seed=1, n_pts=150)
    m.dev_kf.ensure(m)
    small = ids[:16]
    m.update_point_attributes(small)  # must not crash; host path
    assert m.mp_dmax[small[0]] > 0
