"""Map checkpoint / resume.

The reference keeps its map only in RAM (SURVEY §5.4 — "None"); because our
map is a pytree of fixed-capacity arrays, serialization is trivial. This
enables save-map / load-map / localization-only-from-saved-map workflows the
reference never had.

Format: one compressed .npz with every MapState array + scalar metadata +
the keyframe database's BoW matrix and vocabulary.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..config import SlamConfig
from ..map.state import MapState

_SCALARS = ("n_kf", "n_mp", "next_kf_id")


def save_map(path: str, m: MapState, kfdb=None) -> None:
    arrays = {}
    for f in dataclasses.fields(m):
        if f.name in ("cfg", "loop_edges"):
            continue
        v = getattr(m, f.name)
        if isinstance(v, np.ndarray):
            arrays[f.name] = v
    for s in _SCALARS:
        arrays[s] = np.asarray(getattr(m, s))
    arrays["loop_edges"] = np.asarray(m.loop_edges or np.zeros((0, 2)), np.int64)
    if kfdb is not None:
        arrays["kfdb_bow"] = kfdb.bow_mat
        arrays["kfdb_in_db"] = kfdb.in_db
        arrays["kfdb_vocab"] = kfdb.vocab
        if kfdb.idf is not None:
            arrays["kfdb_idf"] = kfdb.idf
    np.savez_compressed(path, **arrays)


def load_map(path: str, cfg: SlamConfig, kfdb=None) -> MapState:
    data = np.load(path)
    m = MapState.allocate(cfg)
    for f in dataclasses.fields(m):
        if f.name in ("cfg", "loop_edges", "free_mp", "free_mp_pending") \
                or f.name in _SCALARS:
            continue
        if f.name in data:
            tgt = getattr(m, f.name)
            src = data[f.name]
            if tgt.shape != src.shape:
                # capacities grow at runtime (KF slot growth, obs-table
                # growth), so a saved map's shapes are authoritative; the
                # config's capacities are only the *initial* allocation.
                # All arrays are saved atomically, so adopting the saved
                # shapes keeps them mutually consistent.
                print(f"[checkpoint] adopting saved capacity for {f.name}: "
                      f"{src.shape} (config allocates {tgt.shape})")
            setattr(m, f.name, src.copy())
    for s in _SCALARS:
        setattr(m, s, int(data[s]))
    m.loop_edges = [tuple(int(x) for x in row) for row in data["loop_edges"]]
    # reconstruct the recycled-slot free list from validity
    m.free_mp = [int(i) for i in range(m.n_mp) if not m.mp_valid[i]]
    m.free_mp_pending = []
    if kfdb is not None and "kfdb_bow" in data:
        kfdb.bow_mat = data["kfdb_bow"].copy()
        kfdb.in_db = data["kfdb_in_db"].copy()
        # the checkpoint's vocabulary (and its IDF) is authoritative — the
        # saved BoW rows were quantized with it, and a map saved under a
        # different/older vocabulary must keep using it after load
        kfdb.vocab = data["kfdb_vocab"].copy()
        kfdb.idf = (data["kfdb_idf"].copy() if "kfdb_idf" in data else None)
        kfdb._vocab_dev = None  # device cache rebuilt from the loaded vocab
        kfdb._idf_dev = None
        kfdb._pending = {}
        kfdb.map = m
    return m
