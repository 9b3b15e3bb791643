"""Place-recognition recall/precision at database scale (VERDICT item 6).

The reference's loop/reloc recall rests on the 10^6-word DBoW2 vocabulary;
our flat 4096-word TF-IDF vocabulary must hold up at a 512-keyframe
database. This test builds a REAL database: 512 rendered views across 4
distinct synthetic worlds (the other worlds act as confusers), then queries
100 novel views taken half a trajectory step away from database poses —
the loop-closure situation. Measured (trained vocab + IDF): matched-view
bit-flip rate ~13%, word stability ~0.57 — retrieval has to survive that.
"""

import numpy as np
import pytest

from orbslam2_tpu.config import (
    CameraConfig, ExtractorConfig, MapCapacityConfig, SlamConfig,
)
from orbslam2_tpu.map.keyframe_database import KeyFrameDatabase
from orbslam2_tpu.map.state import MapState
from orbslam2_tpu.ops import orb
from orbslam2_tpu.utils.synthetic import make_box_room, render

K = np.array([[260.0, 0, 160], [0, 260, 120], [0, 0, 1]], np.float32)
W, H = 320, 240
N_WORLDS = 4
PER_WORLD = 128
N_FEAT = 300


def _pose(a, radius=1.2):
    """Inward-looking pose on a circle of viewpoints inside the room."""
    Rwc = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                    [-np.sin(a), 0, np.cos(a)]], np.float32)
    C = np.array([radius * np.sin(a), 0.1 * np.sin(3 * a), -radius * np.cos(a) * 0.5],
                 np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = Rwc.T
    T[:3, 3] = -Rwc.T @ C
    return T


@pytest.fixture(scope="module")
def database():
    cfg = SlamConfig(
        sensor="rgbd",
        camera=CameraConfig(fx=260, fy=260, cx=160, cy=120, width=W,
                            height=H, bf=26.0, fps=30),
        extractor=ExtractorConfig(n_features=N_FEAT, n_levels=4),
        capacity=MapCapacityConfig(max_keyframes=N_WORLDS * PER_WORLD + 4,
                                   max_map_points=1024),
    )
    m = MapState.allocate(cfg)
    kfdb = KeyFrameDatabase(m)
    ex = orb.OrbExtractor(cfg.extractor, H, W)
    worlds = [make_box_room(seed=s) for s in range(N_WORLDS)]
    Nk = cfg.extractor.max_keypoints
    kf_of = {}
    for w in range(N_WORLDS):
        for p in range(PER_WORLD):
            a = 2 * np.pi * p / PER_WORLD
            img = render(worlds[w], K, _pose(a), W, H)
            f = ex(img)
            kf = m.add_keyframe(
                np.eye(4, dtype=np.float32), np.asarray(f.xy)[:Nk],
                np.asarray(f.desc), np.asarray(f.octave),
                np.asarray(f.angle), np.asarray(f.valid),
                frame_id=w * PER_WORLD + p, timestamp=0.0,
            )
            kfdb.add(kf)
            kf_of[(w, p)] = kf
    return cfg, m, kfdb, worlds, kf_of, ex


class TestPlaceRecognitionScale:
    def test_recall_and_false_candidates(self, database):
        cfg, m, kfdb, worlds, kf_of, ex = database
        rng = np.random.default_rng(11)
        n_queries = 100
        top1 = 0
        false_cands = 0
        for _ in range(n_queries):
            w = int(rng.integers(N_WORLDS))
            p = int(rng.integers(PER_WORLD))
            a = 2 * np.pi * (p + 0.5) / PER_WORLD  # between DB poses
            img = render(worlds[w], K, _pose(a), W, H)
            f = ex(img)
            qbow = kfdb.compute_bow(np.asarray(f.desc), np.asarray(f.valid))
            cands = kfdb.detect_relocalization_candidates(qbow)
            truth = {kf_of[(w, (p + d) % PER_WORLD)] for d in (-2, -1, 0, 1, 2, 3)}
            if cands and cands[0] in truth:
                top1 += 1
            near = {kf_of[(w, (p + d) % PER_WORLD)] for d in range(-6, 8)}
            false_cands += sum(1 for c in cands if c not in near)
        assert top1 >= 90, f"top-1 recall {top1}/100"
        assert false_cands <= 1, f"{false_cands} false candidates/100 queries"

    def test_loop_gate_rejects_unknown_place(self, database):
        cfg, m, kfdb, worlds, kf_of, ex = database
        novel = make_box_room(seed=99)
        hits = 0
        for p in range(0, 20):
            a = 2 * np.pi * p / 20
            img = render(novel, K, _pose(a), W, H)
            f = ex(img)
            qbow = kfdb.compute_bow(np.asarray(f.desc), np.asarray(f.valid))
            cands = kfdb.detect_loop_candidates_from_bow(qbow, min_score=0.10)
            hits += bool(cands)
        assert hits <= 1, f"{hits}/20 novel-world queries produced loop candidates"
