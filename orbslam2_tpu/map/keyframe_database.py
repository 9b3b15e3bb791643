"""Keyframe database: loop / relocalization candidate retrieval.

Re-design of †src/KeyFrameDatabase.cc (SURVEY §2.8): the DBoW2 inverted file
becomes a dense (K, W) BoW matrix; retrieval is one matvec. The gating logic
is kept: minCommonWords = 0.8 * max common words, candidate score >= minScore,
score accumulation over each candidate's top-10 covisibility group, groups
>= 0.75 * best accumulated score, best keyframe per group, excluding the
query's own covisible set.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from ..ops import bow
from .state import MapState


class KeyFrameDatabase:
    def __init__(self, map_state: MapState, vocab_bits: Optional[np.ndarray] = None,
                 n_words: int = bow.VOCAB_SIZE,
                 idf: Optional[np.ndarray] = None):
        self.map = map_state
        if vocab_bits is not None:
            self.vocab = vocab_bits
            self.idf = idf
        else:
            # trained vocabulary + IDF asset is the default path
            # (†System ctor loads ORBvoc.txt; random fallback if absent)
            self.vocab, self.idf = bow.default_vocabulary(n_words)
        K = map_state.kf_valid.shape[0]
        # float16 rows: at 65536 words a f32 database is 256 KB/keyframe;
        # the L1-normalized TF-IDF entries are ~1e-4..1e-2 where f16's
        # absolute rounding (~1e-7 at that magnitude) is far below the
        # 0.01+ score separations the gates run on
        self.bow_mat = np.zeros((K, self.vocab.shape[0]), np.float16)
        self.in_db = np.zeros(K, bool)
        # device-resident vocabulary: uploading the (W, 256) bit matrix per
        # compute_bow call cost ~0.5 MB of H2D per keyframe on relay rigs
        self._vocab_dev = None
        self._idf_dev = None
        # in-flight BoW vectors by keyframe slot (see precompute_async)
        self._pending: dict = {}

    # ------------------------------------------------------------------
    def _bow_dispatch(self, desc, valid):
        if self._vocab_dev is None:
            self._vocab_dev = jnp.asarray(self.vocab)
            self._idf_dev = (
                jnp.asarray(self.idf) if self.idf is not None else None
            )
        return bow.bow_vector(jnp.asarray(desc), jnp.asarray(valid),
                              self._vocab_dev, self._idf_dev)

    def compute_bow(self, desc, valid) -> np.ndarray:
        return np.asarray(self._bow_dispatch(desc, valid))

    def precompute_async(self, kf: int):
        """Dispatch the BoW kernel for keyframe `kf` and keep the in-flight
        device result; row(kf)/add(kf) consume it later. By then the async
        D2H has long completed, so the consume is ~free — a synchronous pull
        of a fresh result costs a full link RTT (~25 ms) on relay rigs.
        Keyframe descriptors never change after insertion, so the vector
        cannot go stale; erase() drops any pending future for a recycled
        slot before the slot is reused."""
        m = self.map
        fut = self._bow_dispatch(m.kf_desc[kf], m.kf_feat_valid[kf])
        if hasattr(fut, "copy_to_host_async"):
            fut.copy_to_host_async()
        self._pending[kf] = fut

    def row(self, kf: int) -> np.ndarray:
        """The BoW vector for keyframe `kf`: cached row, pending async
        result, or a fresh (blocking) compute — in that order."""
        if kf < self.bow_mat.shape[0] and self.bow_mat[kf].any():
            return self.bow_mat[kf]
        fut = self._pending.pop(kf, None)
        m = self.map
        vec = (np.asarray(fut) if fut is not None
               else self.compute_bow(m.kf_desc[kf], m.kf_feat_valid[kf]))
        if kf < self.bow_mat.shape[0]:
            self.bow_mat[kf] = vec
        return vec

    def add(self, kf: int):
        m = self.map
        if kf >= self.bow_mat.shape[0]:  # map arrays grew — follow
            extra = m.kf_valid.shape[0] - self.bow_mat.shape[0]
            self.bow_mat = np.pad(self.bow_mat, ((0, extra), (0, 0)))
            self.in_db = np.pad(self.in_db, (0, extra))
        self.row(kf)  # cached / pending-async / fresh, in that order
        self.in_db[kf] = True

    def erase(self, kf: int):
        self.in_db[kf] = False
        self.bow_mat[kf] = 0.0
        self._pending.pop(kf, None)

    # ------------------------------------------------------------------
    def _candidate_scores(self, query_bow: np.ndarray, exclude: np.ndarray):
        live = self.in_db & self.map.kf_valid
        live[exclude[exclude >= 0]] = False
        if not live.any():
            return None
        # Host-side retrieval: the BoW matrix lives in host memory between
        # queries, so a device matvec here would re-upload the whole (K, W)
        # database per query. Scoring touches ONLY the query's nonzero
        # columns (a frame quantizes to <= n_features of the W words):
        # L1(a, q) = sum_nz|a - q| + sum_{q=0} a, and rows are
        # L1-normalized so sum_{q=0} a = 1 - sum_nz a — a (live, nnz)
        # slice instead of (live, W), ~30-60x less work at W=65536.
        rows = np.where(live)[0]
        nz = np.where(query_bow > 0)[0]
        q = query_bow[nz].astype(np.float32)
        db = self.bow_mat[np.ix_(rows, nz)].astype(np.float32)
        scores = np.full(live.shape[0], -1.0, np.float32)
        ncommon = np.zeros(live.shape[0], np.int32)
        # L1 similarity 1 - 0.5|a-b|_1 (†ScoringObject.cpp:L1Scoring)
        l1 = np.abs(db - q[None, :]).sum(-1) + 1.0 - db.sum(-1)
        scores[rows] = 1.0 - 0.5 * l1
        ncommon[rows] = (db > 0).sum(-1)
        return scores, ncommon, live

    def detect_loop_candidates(self, kf: int, min_score: float) -> List[int]:
        """†DetectLoopCandidates: exclude covisibles of the query."""
        m = self.map
        covis = m.covisible_keyframes(kf)
        exclude = np.concatenate([covis, [kf]]).astype(np.int64)
        return self.detect_loop_candidates_from_bow(
            self.bow_mat[kf], min_score, exclude
        )

    def detect_loop_candidates_from_bow(
        self, query_bow: np.ndarray, min_score: float,
        exclude: Optional[np.ndarray] = None,
    ) -> List[int]:
        """Loop-candidate gating for an arbitrary query vector (used by the
        loop detector above and by recall benchmarks)."""
        if exclude is None:
            exclude = np.zeros(0, np.int64)
        out = self._candidate_scores(query_bow, exclude)
        if out is None:
            return []
        scores, ncommon, live = out
        return self._group_accumulate(scores, ncommon, live, min_score)

    def detect_relocalization_candidates(self, query_bow: np.ndarray) -> List[int]:
        """†DetectRelocalizationCandidates: no minScore / no exclusion."""
        out = self._candidate_scores(query_bow, np.zeros(0, np.int64))
        if out is None:
            return []
        scores, ncommon, live = out
        return self._group_accumulate(scores, ncommon, live, min_score=-1.0)

    def _group_accumulate(self, scores, ncommon, live, min_score) -> List[int]:
        m = self.map
        max_common = ncommon.max(initial=0)
        if max_common == 0:
            return []
        min_common = int(0.8 * max_common)
        cand = np.where(live & (ncommon > min_common) & (scores >= min_score))[0]
        if len(cand) == 0:
            return []
        # accumulate scores over each candidate's top-10 covisibility group
        acc_scores = []
        best_in_group = []
        for c in cand:
            group = np.concatenate([[c], m.covisible_keyframes(int(c), 10)])
            gs = scores[group]
            gs = np.where(live[group], gs, 0.0)
            acc = float(np.clip(gs, 0, None).sum())
            acc_scores.append(acc)
            best_in_group.append(int(group[int(np.argmax(gs))]))
        acc_scores = np.asarray(acc_scores)
        th = 0.75 * acc_scores.max()
        keep = acc_scores >= th
        # unique best keyframes, order by accumulated score
        order = np.argsort(-acc_scores)
        seen = set()
        result = []
        for i in order:
            if not keep[i]:
                continue
            b = best_in_group[i]
            if b not in seen:
                seen.add(b)
                result.append(b)
        return result
