"""Place recognition at KITTI scale (VERDICT r4 #4).

Builds a 1500+ keyframe database spanning street-like corridors (segmented
brick/stripe facades = self-similar confusers, the KITTI 00 regime) and box
rooms, then measures top-1 same-place recall and false-candidate rate for
revisit queries taken between database poses, for several vocabulary sizes.
A held-out novel world checks the loop gate's false-positive behavior.

Writes tools/PLACE_RECOGNITION.md with the recall table.

Usage (CPU, ~20-40 min):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/bench_place_recognition.py
Environment: PR_QUICK=1 shrinks everything ~8x for a smoke run.
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from orbslam2_tpu.config import (
    CameraConfig, ExtractorConfig, MapCapacityConfig, SlamConfig,
)
from orbslam2_tpu.map.keyframe_database import KeyFrameDatabase
from orbslam2_tpu.map.state import MapState
from orbslam2_tpu.ops import bow, orb
from orbslam2_tpu.utils.synthetic import make_box_room, make_corridor, render

K = np.array([[260.0, 0, 160], [0, 260, 120], [0, 0, 1]], np.float32)
W, H = 320, 240
QUICK = bool(int(os.environ.get("PR_QUICK", "0")))
N_CORRIDORS = 3
CORRIDOR_KFS = 40 if QUICK else 320   # 1-m spacing down a long street
N_ROOMS = 6
ROOM_KFS = 16 if QUICK else 96
N_QUERIES = 40 if QUICK else 300
N_FEAT = 500


def corridor_pose(z, sway=0.0):
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = -np.array([sway, 0.0, z], np.float32)  # identity R: look +z
    return T


def room_pose(a, radius=1.2):
    Rwc = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                    [-np.sin(a), 0, np.cos(a)]], np.float32)
    C = np.array([radius * np.sin(a), 0.1 * np.sin(3 * a),
                  -radius * np.cos(a) * 0.5], np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = Rwc.T
    T[:3, 3] = -Rwc.T @ C
    return T


def build_views():
    """(world_id, view_id, render_fn) for database and query poses."""
    corridors = [
        make_corridor(seed=100 + s, length=CORRIDOR_KFS + 12.0)
        for s in range(N_CORRIDORS)
    ]
    rooms = [make_box_room(seed=s, styles=None) for s in range(N_ROOMS)]
    views = []  # (wid, vid, planes, pose)
    for s, planes in enumerate(corridors):
        for i in range(CORRIDOR_KFS):
            views.append((s, i, planes,
                          corridor_pose(float(i), 0.2 * np.sin(0.2 * i))))
    for s, planes in enumerate(rooms):
        for i in range(ROOM_KFS):
            a = 2 * np.pi * i / ROOM_KFS
            views.append((N_CORRIDORS + s, i, planes, room_pose(a)))
    return views, corridors, rooms


def query_pose(wid, vid, corridors):
    """A revisit view between database poses (the loop-closure situation)."""
    if wid < N_CORRIDORS:
        return corridor_pose(vid + 0.5, 0.2 * np.sin(0.2 * (vid + 0.5)))
    a = 2 * np.pi * (vid + 0.5) / ROOM_KFS
    return room_pose(a)


def evaluate(vocab_bits, idf, feats, views, rng):
    """Recall/precision for one vocabulary over pre-extracted features."""
    cfg = SlamConfig(
        sensor="rgbd",
        camera=CameraConfig(fx=260, fy=260, cx=160, cy=120, width=W,
                            height=H, bf=26.0, fps=30),
        extractor=ExtractorConfig(n_features=N_FEAT, n_levels=4),
        capacity=MapCapacityConfig(max_keyframes=len(views) + 4,
                                   max_map_points=1024),
    )
    m = MapState.allocate(cfg)
    kfdb = KeyFrameDatabase(m, vocab_bits=vocab_bits, idf=idf)
    Nk = cfg.extractor.max_keypoints
    kf_of = {}
    for (wid, vid, _, _), f in zip(views, feats["db"]):
        kf = m.add_keyframe(
            np.eye(4, dtype=np.float32), f["xy"][:Nk], f["desc"],
            f["octave"], f["angle"], f["valid"],
            frame_id=len(kf_of), timestamp=0.0,
        )
        kfdb.add(kf)
        kf_of[(wid, vid)] = kf

    top1 = false_cands = 0
    for (wid, vid), f in zip(feats["q_keys"], feats["q"]):
        qbow = kfdb.compute_bow(f["desc"], f["valid"])
        cands = kfdb.detect_relocalization_candidates(qbow)
        n_in_world = CORRIDOR_KFS if wid < N_CORRIDORS else ROOM_KFS
        truth = {kf_of.get((wid, vid + d)) for d in (-2, -1, 0, 1, 2, 3)}
        near = {kf_of.get((wid, vid + d)) for d in range(-6, 8)}
        truth.discard(None)
        near.discard(None)
        if cands and cands[0] in truth:
            top1 += 1
        false_cands += sum(1 for c in cands if c not in near)

    novel_hits = 0
    for f in feats["novel"]:
        qbow = kfdb.compute_bow(f["desc"], f["valid"])
        cands = kfdb.detect_loop_candidates_from_bow(qbow, min_score=0.10)
        novel_hits += bool(cands)
    return dict(
        top1_pct=100.0 * top1 / len(feats["q"]),
        false_per_query=false_cands / len(feats["q"]),
        novel_hit_pct=100.0 * novel_hits / max(len(feats["novel"]), 1),
        n_db=len(views),
    )


def main():
    t0 = time.perf_counter()
    rng = np.random.default_rng(0)
    views, corridors, rooms = build_views()
    print(f"database: {len(views)} views "
          f"({N_CORRIDORS}x{CORRIDOR_KFS} corridor + {N_ROOMS}x{ROOM_KFS} room)")

    ex = orb.OrbExtractor(
        ExtractorConfig(n_features=N_FEAT, n_levels=4), H, W
    )

    def extract(planes, pose):
        f = ex(render(planes, K, pose, W, H))
        return dict(xy=np.asarray(f.xy), desc=np.asarray(f.desc),
                    octave=np.asarray(f.octave), angle=np.asarray(f.angle),
                    valid=np.asarray(f.valid))

    feats = {"db": [], "q": [], "q_keys": [], "novel": []}
    for n, (wid, vid, planes, pose) in enumerate(views):
        feats["db"].append(extract(planes, pose))
        if n % 200 == 0:
            print(f"  db {n}/{len(views)} ({time.perf_counter()-t0:.0f}s)",
                  flush=True)
    picks = rng.choice(len(views), N_QUERIES, replace=False)
    for n in picks:
        wid, vid, planes, _ = views[n]
        feats["q"].append(extract(planes, query_pose(wid, vid, corridors)))
        feats["q_keys"].append((wid, vid))
    novel = make_corridor(seed=999, length=40.0)
    for i in range(20):
        feats["novel"].append(extract(novel, corridor_pose(float(i))))
    print(f"extraction done ({time.perf_counter()-t0:.0f}s)", flush=True)

    # training corpus: database descriptors themselves would overfit the
    # benchmark; train on SEPARATE worlds (same generator family)
    tr_descs, tr_valid, tr_docs = [], [], []
    doc = 0
    for s in range(8):
        planes = (make_corridor(seed=500 + s, length=30.0) if s % 2
                  else make_box_room(seed=200 + s, styles=None))
        for i in range(8 if QUICK else 16):
            pose = (corridor_pose(2.0 * i % 28) if s % 2
                    else room_pose(2 * np.pi * i / 16))
            f = extract(planes, pose)
            tr_descs.append(f["desc"])
            tr_valid.append(f["valid"])
            tr_docs.append(np.full(len(f["desc"]), doc, np.int64))
            doc += 1
    tr_desc = np.concatenate(tr_descs)
    tr_val = np.concatenate(tr_valid)
    tr_doc = np.concatenate(tr_docs)
    print(f"training corpus: {int(tr_val.sum())} descriptors / {doc} images",
          flush=True)

    results = {}
    for n_words in ([4096] if QUICK else [4096, 16384, 65536]):
        tw0 = time.perf_counter()
        vocab = bow.train_vocabulary(tr_desc[tr_val], n_words=n_words, iters=4)
        idf = bow.compute_idf(tr_desc, tr_val, tr_doc, vocab)
        r = evaluate(vocab, idf, feats, views, rng)
        r["train_s"] = round(time.perf_counter() - tw0, 1)
        results[n_words] = r
        print(f"W={n_words}: {r}", flush=True)

    lines = [
        "# Place recognition at scale (rendered benchmark)",
        "",
        f"Database: **{len(views)} keyframes** — {N_CORRIDORS} street-like",
        f"corridors x {CORRIDOR_KFS} views (segmented brick/stripe facades as",
        f"self-similar confusers) + {N_ROOMS} box rooms x {ROOM_KFS} views.",
        f"{N_QUERIES} revisit queries taken between database poses; 20",
        "novel-world queries probe the loop gate's false-positive rate.",
        "Vocabulary trained on DISJOINT worlds from the same generator",
        "family (tools/bench_place_recognition.py).",
        "",
        "| words | top-1 same-place | false cands / query | novel-world hits |",
        "|---|---|---|---|",
    ]
    for w, r in results.items():
        lines.append(
            f"| {w} | {r['top1_pct']:.1f}% | {r['false_per_query']:.3f} "
            f"| {r['novel_hit_pct']:.0f}% |"
        )
    lines += [
        "",
        f"Total runtime {time.perf_counter()-t0:.0f}s"
        f" ({'quick' if QUICK else 'full'} mode).",
    ]
    out = os.path.join(os.path.dirname(__file__), "PLACE_RECOGNITION.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
