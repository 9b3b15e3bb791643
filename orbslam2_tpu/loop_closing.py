"""Loop closing: detection, Sim3 alignment, correction, essential-graph opt.

Re-design of †src/LoopClosing.cc (SURVEY §2.1 row 4, §3.4): BoW candidate
retrieval with the 3-consecutive covisibility-consistency gate, Sim3
RANSAC + refinement between the current and loop keyframes, correction
propagation through the current covisible group, loop-point fusion, 7-DoF
essential-graph optimization, and (synchronous here) full-map BA.

Host code orchestrates; the heavy steps (matching, Sim3 RANSAC, pose graph,
global BA) are the jitted kernels from ops/.
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional, Set, Tuple

import jax.numpy as jnp
import numpy as np

from .config import SlamConfig
from .map.keyframe_database import KeyFrameDatabase
from .map.state import MapState
from .models.camera import Camera
from .ops import (
    ba, matching, pose_graph, sim3_np, sim3_opt, sim3_solver,
)


class LoopCloser:
    def __init__(self, cfg: SlamConfig, slam_map: MapState, cam: Camera,
                 kfdb: KeyFrameDatabase):
        self.cfg = cfg
        self.map = slam_map
        self.cam = cam
        self.kfdb = kfdb
        # cached host scalars (device pulls block a full RTT on relay rigs)
        _K = np.asarray(cam.K, np.float32)
        self._fx, self._fy = float(_K[0, 0]), float(_K[1, 1])
        self._cx, self._cy = float(_K[0, 2]), float(_K[1, 2])
        self.consistent_groups: List[Tuple[Set[int], int]] = []
        self.last_loop_kf = -10**9
        self._rng = np.random.default_rng(cfg.runtime.seed + 1)
        self.loops_closed = 0
        # background-GBA state (†RunGlobalBundleAdjustment / mbStopGBA)
        self.gba_thread: Optional[threading.Thread] = None
        self.gba_abort = threading.Event()
        self.background_gba = False  # AsyncSlamSystem turns this on

    @staticmethod
    def _point_bucket(n: int, lo: int = 2048, hi: int = 65536) -> int:
        """Power-of-two padded capacity for a point set of size n: bounds
        the jit-signature count to log2 buckets while sizing the kernels
        from the map instead of a fixed cap. Logs when the ceiling drops
        points (no-silent-caps rule)."""
        cap = lo
        while cap < n and cap < hi:
            cap *= 2
        if n > cap:
            print(f"[loop] point bucket ceiling: {n - cap} of {n} points "
                  f"dropped (cap {cap})")
        return cap

    # ------------------------------------------------------------------
    def process_keyframe(self, kf: int, run_global_ba: bool = True) -> bool:
        """Returns True if a loop was detected and corrected."""
        closed = False
        cand = self._detect_loop(kf)
        if cand is not None:
            # Sim3 compute + correction mutate poses/points: hold the map
            # lock here (detection above is stale-tolerant read-only)
            with self.map.lock:
                ok = self._compute_and_correct(kf, cand, run_global_ba)
            if ok:
                self.last_loop_kf = int(self.map.kf_seq[kf])
                self.loops_closed += 1
                closed = True
        self.kfdb.add(kf)
        return closed

    # ------------------------------------------------------------------
    # DetectLoop (†LoopClosing::DetectLoop)
    # ------------------------------------------------------------------
    def _detect_loop(self, kf: int) -> Optional[int]:
        m = self.map
        # temporal distance via the monotone creation sequence — keyframe
        # slot ids are recycled, so id arithmetic is not time
        if m.kf_seq[kf] - self.last_loop_kf < self.cfg.loop.kfs_between_loops:
            return None
        if len(m.valid_keyframes()) < self.cfg.loop.kfs_between_loops:
            return None
        covis = m.covisible_keyframes(kf)
        if len(covis) == 0:
            return None
        # minScore: lowest similarity to own covisibles
        own_bow = self.kfdb.row(kf)
        # L1 similarity vs each covisible, vectorized on host: these are
        # host-resident (W,) vectors — a device round trip per covisible
        # would cost ~30 ms RTT each on relay-attached rigs
        cin = np.asarray([int(c) for c in covis if self.kfdb.in_db[int(c)]])
        if len(cin):
            s = 1.0 - 0.5 * np.abs(
                self.kfdb.bow_mat[cin] - own_bow[None, :]
            ).sum(-1)
            min_score = float(s.min())
        else:
            min_score = 0.0

        candidates = self.kfdb.detect_loop_candidates(kf, min_score)
        # Temporal separation: a loop is a RE-visit — the reference relies
        # on covisibility exclusion alone, which silently assumes mapping
        # has already connected temporally-near keyframes. When the async
        # mapper lags, a keyframe a few seconds old is not yet covisible,
        # passes the exclusion, and overlapping same-wall views then admit
        # a coplanar-degenerate Sim3 whose wrong fusion poisons local BA
        # (measured: circuit ATE 0.04 -> 1.3). Creation-sequence distance
        # encodes the invariant independently of mapping latency.
        gap = self.cfg.loop.kfs_between_loops
        candidates = [
            c for c in candidates
            if abs(int(m.kf_seq[kf]) - int(m.kf_seq[c])) >= gap
        ]
        if not candidates:
            self.consistent_groups = []
            return None

        # 3-consecutive-keyframes covisibility consistency
        # (†mnCovisibilityConsistencyTh = 3)
        th = self.cfg.loop.covisibility_consistency_th
        new_groups: List[Tuple[Set[int], int]] = []
        enough: List[int] = []
        for c in candidates:
            group = set(int(x) for x in m.covisible_keyframes(c))
            group.add(c)
            best_consistency = 0
            for prev_group, count in self.consistent_groups:
                if group & prev_group:
                    best_consistency = max(best_consistency, count + 1)
            new_groups.append((group, best_consistency))
            if best_consistency >= th:
                enough.append(c)
        self.consistent_groups = new_groups
        return enough[0] if enough else None

    # ------------------------------------------------------------------
    # ComputeSim3 (†LoopClosing::ComputeSim3)
    # ------------------------------------------------------------------
    def _match_map_points(self, kf1: int, kf2: int):
        """Correspondences between map points of two keyframes via their
        feature descriptors (the SearchByBoW(KF,KF) replacement)."""
        m = self.map
        has1 = m.kf_feat_valid[kf1] & (m.kf_mp[kf1] >= 0)
        has2 = m.kf_feat_valid[kf2] & (m.kf_mp[kf2] >= 0)
        res = matching.match_descriptors(
            jnp.asarray(m.kf_desc[kf1]), jnp.asarray(m.kf_desc[kf2]),
            jnp.asarray(has1), jnp.asarray(has2),
            max_dist=matching.TH_LOW, nn_ratio=0.75, mutual=True,
            angles_a=jnp.asarray(m.kf_angle[kf1]),
            angles_b=jnp.asarray(m.kf_angle[kf2]),
            check_rotation=True,
        )
        rv = np.asarray(res.valid)
        f1 = np.where(rv)[0]
        f2 = np.asarray(res.idx)[f1]
        mp1 = m.kf_mp[kf1, f1]
        mp2 = m.kf_mp[kf2, f2]
        live = m.mp_valid[mp1] & m.mp_valid[mp2]
        return f1[live], f2[live], mp1[live], mp2[live]

    def _compute_and_correct(self, kf: int, loop_kf: int,
                             run_global_ba: bool) -> bool:
        m = self.map
        cfg = self.cfg
        f1, f2, mp1, mp2 = self._match_map_points(kf, loop_kf)
        if len(mp1) < cfg.loop.min_bow_matches:
            return False

        # Express matched points in each camera frame
        T1 = m.kf_pose[kf]
        T2 = m.kf_pose[loop_kf]
        p1c = m.mp_pos[mp1] @ T1[:3, :3].T + T1[:3, 3]
        p2c = m.mp_pos[mp2] @ T2[:3, :3].T + T2[:3, 3]
        sf = cfg.extractor.scale_factor
        s2_1 = sf ** (2 * m.kf_octave[kf, f1].astype(np.float32))
        s2_2 = sf ** (2 * m.kf_octave[loop_kf, f2].astype(np.float32))

        N = len(p1c)
        pad = max(64 - N % 64, 0) if N % 64 else 0
        def padv(x, fill=0.0):
            w = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return np.pad(x, w, constant_values=fill)
        valid = np.ones(N, bool)
        samples = self._rng.integers(0, N, size=(256, 3)).astype(np.int32)
        fix_scale = cfg.sensor != "monocular"
        res = sim3_solver.sim3_ransac(
            self.cam, jnp.asarray(padv(p1c.astype(np.float32))),
            jnp.asarray(padv(p2c.astype(np.float32))),
            jnp.asarray(padv(s2_1, 1.0)), jnp.asarray(padv(s2_2, 1.0)),
            jnp.asarray(padv(valid, False)), jnp.asarray(samples),
            fix_scale=fix_scale, min_inliers=cfg.loop.min_sim3_inliers,
        )
        if not bool(res.ok):
            return False
        S12 = np.asarray(res.S12)  # maps loop-KF camera coords -> current

        # --- grow the correspondence set under the RANSAC estimate
        # (†SearchBySim3), then LM-refine S12 over paired reprojection
        # edges (†OptimizeSim3) — loop precision drives the whole
        # correction propagation
        inl = np.asarray(res.inliers)[:N]
        pairs = self._grow_sim3_matches(kf, loop_kf, S12)
        pairs[f1[inl]] = f2[inl]  # RANSAC inliers always kept
        S12_ref, n_inl = self._refine_sim3(kf, loop_kf, S12, pairs, fix_scale)
        if n_inl < cfg.loop.min_sim3_inliers:
            return False
        S12 = S12_ref

        # total-match gate: project loop neighborhood points into current KF
        n_total = self._count_projected_matches(kf, loop_kf, S12)
        if n_total < cfg.loop.min_total_matches:
            return False

        self._correct_loop(kf, loop_kf, S12, run_global_ba)
        return True

    def _grow_sim3_matches(self, kf: int, loop_kf: int,
                           S12: np.ndarray) -> np.ndarray:
        """SearchBySim3: mutual guided projection matches between the two
        keyframes' map points under S12, in feature-index space.

        Returns (N,) int32: feature index in loop_kf per feature of kf."""
        m = self.map

        def side(k):
            mp = m.kf_mp[k]
            safe = np.maximum(mp, 0)
            valid = (mp >= 0) & m.kf_feat_valid[k] & m.mp_valid[safe]
            T = m.kf_pose[k]
            pos_c = m.mp_pos[safe] @ T[:3, :3].T + T[:3, 3]
            return pos_c.astype(np.float32), valid, m.mp_dmax[safe]

        pos1, v1, dmax1 = side(kf)
        pos2, v2, dmax2 = side(loop_kf)
        ecfg = self.cfg.extractor
        idx2, mutual = sim3_opt.search_by_sim3(
            self.cam, jnp.asarray(S12.astype(np.float32)),
            jnp.asarray(pos1), jnp.asarray(m.kf_desc[kf]), jnp.asarray(v1),
            jnp.asarray(dmax1), jnp.asarray(m.kf_xy[kf]),
            jnp.asarray(m.kf_octave[kf]),
            jnp.asarray(pos2), jnp.asarray(m.kf_desc[loop_kf]),
            jnp.asarray(v2), jnp.asarray(dmax2),
            jnp.asarray(m.kf_xy[loop_kf]), jnp.asarray(m.kf_octave[loop_kf]),
            jnp.float32(ecfg.scale_factor), ecfg.n_levels,
        )
        out = np.asarray(idx2).copy()
        out[~np.asarray(mutual)] = -1
        return out

    def _refine_sim3(self, kf: int, loop_kf: int, S12: np.ndarray,
                     pairs: np.ndarray, fix_scale: bool):
        """OptimizeSim3 over the grown correspondence set; returns the
        refined transform and its inlier count."""
        m = self.map
        valid = pairs >= 0
        j = np.maximum(pairs, 0)
        mp1 = m.kf_mp[kf]
        mp2 = m.kf_mp[loop_kf, j]
        valid = valid & (mp1 >= 0) & (mp2 >= 0)
        s1 = np.maximum(mp1, 0)
        s2 = np.maximum(mp2, 0)
        valid = valid & m.mp_valid[s1] & m.mp_valid[s2]
        T1 = m.kf_pose[kf]
        T2 = m.kf_pose[loop_kf]
        p1c = (m.mp_pos[s1] @ T1[:3, :3].T + T1[:3, 3]).astype(np.float32)
        p2c = (m.mp_pos[s2] @ T2[:3, :3].T + T2[:3, 3]).astype(np.float32)
        sf = self.cfg.extractor.scale_factor
        s2_1 = sf ** (2 * m.kf_octave[kf].astype(np.float32))
        s2_2 = sf ** (2 * m.kf_octave[loop_kf, j].astype(np.float32))
        res = sim3_opt.optimize_sim3(
            self.cam, jnp.asarray(S12.astype(np.float32)),
            jnp.asarray(p1c), jnp.asarray(p2c),
            jnp.asarray(m.kf_xy[kf]), jnp.asarray(m.kf_xy[loop_kf, j]),
            jnp.asarray(s2_1), jnp.asarray(s2_2), jnp.asarray(valid),
            fix_scale=fix_scale,
        )
        return np.asarray(res.S12), int(res.n_inliers)

    def _count_projected_matches(self, kf: int, loop_kf: int, S12) -> int:
        """SearchByProjection(Scw): loop-side neighborhood points vs current
        KF features under the corrected pose."""
        m = self.map
        group = [loop_kf] + [int(x) for x in m.covisible_keyframes(loop_kf)]
        mps = np.unique(m.kf_mp[group])
        mps = mps[mps >= 0]
        mps = mps[m.mp_valid[mps]]
        if len(mps) == 0:
            return 0
        # power-of-two buckets sized from the neighborhood (not a fixed cap:
        # on big maps a silent 2048 cap shrank the loop acceptance count)
        cap = self._point_bucket(len(mps))
        mps = mps[:cap]
        # corrected current pose: Scw = S12 * S(T_loop)
        S_loop = sim3_np.from_se3(m.kf_pose[loop_kf])
        Scw = sim3_np.compose(S12, S_loop)
        pc = sim3_np.apply(Scw[None], m.mp_pos[mps])
        z = pc[:, 2]
        fx = self._fx; fy = self._fy
        cx = self._cx; cy = self._cy
        u = fx * pc[:, 0] / np.maximum(z, 1e-6) + cx
        v = fy * pc[:, 1] / np.maximum(z, 1e-6) + cy
        ok = (z > 0.1) & (u >= 0) & (u < self.cam.width) & (v >= 0) & (v < self.cam.height)
        if ok.sum() == 0:
            return 0
        P = cap
        sel = np.zeros(P, np.int64)
        n = min(int(ok.sum()), P)
        sel[:n] = mps[ok][:n]
        pv = np.zeros(P, bool); pv[:n] = True
        proj = np.zeros((P, 2), np.float32)
        proj[:n] = np.stack([u[ok][:n], v[ok][:n]], 1)
        pair = matching.radius_gate(
            jnp.asarray(proj), jnp.asarray(m.kf_xy[kf]),
            jnp.full((P,), 10.0, jnp.float32),
        )
        res = matching.match_descriptors(
            jnp.asarray(m.mp_desc[sel]), jnp.asarray(m.kf_desc[kf]),
            jnp.asarray(pv), jnp.asarray(m.kf_feat_valid[kf]),
            pair_mask=pair, max_dist=matching.TH_LOW, nn_ratio=1.0,
        )
        return int(np.asarray(res.valid).sum())

    # ------------------------------------------------------------------
    # CorrectLoop (†LoopClosing::CorrectLoop)
    # ------------------------------------------------------------------
    def _correct_loop(self, kf: int, loop_kf: int, S12: np.ndarray,
                      run_global_ba: bool):
        m = self.map
        cfg = self.cfg
        kfs = m.valid_keyframes()
        pre_poses = {int(k): m.kf_pose[k].copy() for k in kfs}

        # corrected Sim3 of the current KF and its covisible group —
        # batched host algebra (8-float bookkeeping, no device round trips)
        S_loop = sim3_np.from_se3(m.kf_pose[loop_kf])
        Scw_cur = sim3_np.compose(S12.astype(np.float32), S_loop)
        group = [kf] + [int(x) for x in m.covisible_keyframes(kf)]
        T_cur = m.kf_pose[kf]
        T_grp = m.kf_pose[np.asarray(group)]                    # (G, 4, 4)
        S_k_c = sim3_np.from_se3(
            (T_grp @ np.linalg.inv(T_cur)[None]).astype(np.float32))
        corr_arr = sim3_np.compose(S_k_c, Scw_cur[None])         # (G, 8)
        corrected: Dict[int, np.ndarray] = {
            k: corr_arr[i] for i, k in enumerate(group)
        }

        # move the group's map points and poses (†CorrectLoop map update).
        # The epoch bump makes any mapper work gathered before this moment
        # discard its commit (the †LocalMapping::RequestStop analog).
        m.correction_epoch += 1
        moved = np.zeros(m.n_mp, bool)
        for i, k in enumerate(group):
            mps = np.unique(m.kf_mp[k])
            mps = mps[mps >= 0]
            mps = mps[m.mp_valid[mps] & ~moved[mps]]
            if len(mps):
                moved[mps] = True
                # p' = S_new^-1 ( S_old p ), one composed transform
                M = sim3_np.compose(sim3_np.inverse(corr_arr[i]),
                                    sim3_np.from_se3(pre_poses[k]))
                m.mp_pos[mps] = sim3_np.apply(M[None], m.mp_pos[mps])
            m.kf_pose[k] = sim3_np.to_se3(corr_arr[i])

        m.loop_edges.append((kf, loop_kf))
        m.version += 1

        # --- fuse loop-side landmarks into the corrected group
        # (†LoopClosing::SearchAndFuse, radius 4): duplicates created during
        # drift are replaced by the older loop-side points
        self._search_and_fuse(kf, loop_kf, group)

        # --- essential-graph optimization over all keyframes
        self._optimize_essential_graph(kf, loop_kf, pre_poses, corrected)

        # --- full-map BA (†RunGlobalBundleAdjustment): either inline or as
        # a detached, interruptible task with staged write-back
        if run_global_ba:
            if self.background_gba:
                self.launch_global_ba_background()
            else:
                self.global_bundle_adjustment()

    # ------------------------------------------------------------------
    # Background GBA task (†LoopClosing::RunGlobalBundleAdjustment,
    # mbStopGBA / mnFullBAIdx semantics)
    # ------------------------------------------------------------------
    def launch_global_ba_background(self):
        """Start GBA as its own task; a newer loop supersedes a running one
        (the reference sets mbStopGBA and relaunches)."""
        if self.gba_thread is not None and self.gba_thread.is_alive():
            self.gba_abort.set()
            self.gba_thread.join()
        self.gba_abort.clear()
        self.gba_thread = threading.Thread(
            target=self._gba_task, name="global-ba", daemon=True
        )
        self.gba_thread.start()

    def wait_global_ba(self, timeout: Optional[float] = None):
        if self.gba_thread is not None and self.gba_thread.is_alive():
            self.gba_thread.join(timeout)

    def _gba_task(self):
        try:
            self.global_bundle_adjustment(
                abort_check=self.gba_abort.is_set
            )
        except Exception as e:  # surface, don't die silently
            import traceback

            print(f"[global BA] task failed: {e}")
            traceback.print_exc()

    def _search_and_fuse(self, kf: int, loop_kf: int, group):
        """Project loop-neighborhood landmarks into each corrected-group
        keyframe and replace matched duplicates (loop point wins — it is the
        older, drift-free geometry; †SearchAndFuse keeps pLoopMP)."""
        from .local_mapping import _fuse_match

        m = self.map
        sf = self.cfg.extractor.scale_factor
        loop_group = [loop_kf] + [int(x) for x in m.covisible_keyframes(loop_kf)]
        mps = np.unique(m.kf_mp[loop_group])
        mps = mps[mps >= 0]
        mps = mps[m.mp_valid[mps]]
        if len(mps) == 0:
            return
        # sized from the loop neighborhood in power-of-two buckets (a fixed
        # 2048 cap silently shrank fusion recall on big maps)
        P = self._point_bucket(len(mps))
        sel = np.zeros(P, np.int64)
        n = min(len(mps), P)
        sel[:n] = mps[:n]
        pv = np.zeros(P, bool)
        pv[:n] = True
        touched = set()
        for dst in group:
            if not m.kf_valid[dst]:
                continue
            res = _fuse_match(
                jnp.asarray(m.mp_pos[sel]), jnp.asarray(m.mp_desc[sel]),
                jnp.asarray(pv), jnp.asarray(m.kf_pose[dst]),
                jnp.asarray(m.kf_xy[dst]), jnp.asarray(m.kf_desc[dst]),
                jnp.asarray(m.kf_octave[dst]), jnp.asarray(m.kf_feat_valid[dst]),
                self.cam, jnp.float32(sf), jnp.float32(4.0),
            )
            rv = np.asarray(res.valid)
            ridx = np.asarray(res.idx)
            for row in np.where(rv)[0]:
                loop_mp = int(sel[row])
                if not m.mp_valid[loop_mp]:
                    continue
                feat = int(ridx[row])
                existing = int(m.kf_mp[dst, feat])
                if existing >= 0 and m.mp_valid[existing]:
                    if existing != loop_mp:
                        m.replace_map_point(existing, loop_mp)
                        touched.add(loop_mp)
                else:
                    m.add_observation(loop_mp, dst, feat)
                    touched.add(loop_mp)
        if touched:
            m.update_point_attributes(np.fromiter(touched, dtype=np.int64))
            for g in group:
                if m.kf_valid[g]:
                    m.update_connections(g)

    def _essential_edges(self, pre_poses):
        """Spanning tree + strong covisibility + loop edges (†OptimizeEssentialGraph)."""
        m = self.map
        cfg = self.cfg
        edges = set()
        for k in m.valid_keyframes():
            k = int(k)
            p = int(m.span_parent[k])
            if p >= 0 and m.kf_valid[p]:
                edges.add((min(k, p), max(k, p)))
            w = m.covis_w[k]
            idx = m.covis_idx[k]
            for nb, wt in zip(idx, w):
                if nb >= 0 and wt >= cfg.mapping.essential_graph_weight and m.kf_valid[nb]:
                    edges.add((min(k, int(nb)), max(k, int(nb))))
        for a, b in m.loop_edges:
            if m.kf_valid[a] and m.kf_valid[b]:
                edges.add((min(a, b), max(a, b)))
        return sorted(edges)

    def _optimize_essential_graph(self, kf, loop_kf, pre_poses, corrected):
        m = self.map
        cfg = self.cfg
        K = m.n_kf
        S_init = np.zeros((K, 8), np.float32)
        S_init[:, 0] = 1.0
        S_init[:, 1] = 1.0
        valid = m.kf_valid[:K].copy()
        vk = np.where(valid)[0]
        S_init[vk] = sim3_np.from_se3(m.kf_pose[vk].astype(np.float32))

        edges = self._essential_edges(pre_poses)
        if len(edges) < 2:
            return
        # measurement from PRE-correction poses (odometry-consistent),
        # except edges inside the corrected set use corrected relatives and
        # the loop edge uses the corrected current pose — assembled as one
        # batched host Sim3 pass over the edge list
        loop_edge = (min(kf, loop_kf), max(kf, loop_kf))

        def end_sim3(a, b, use_corr):
            if use_corr and a in corrected:
                return corrected[a]
            T = pre_poses.get(a, m.kf_pose[a])
            return sim3_np.from_se3(T.astype(np.float32))

        Sa_l, Sb_l, ei, ej = [], [], [], []
        for a, b in edges:
            both = a in corrected and b in corrected
            use_corr = both or (min(a, b), max(a, b)) == loop_edge
            ei.append(a)
            ej.append(b)
            Sa_l.append(end_sim3(a, b, use_corr))
            Sb_l.append(end_sim3(b, a, use_corr))
        Sij = sim3_np.compose(np.stack(Sa_l), sim3_np.inverse(np.stack(Sb_l)))
        fixed = np.zeros(K, bool)
        fixed[loop_kf] = True  # †loop KF fixed

        # temporal order for the CG chain preconditioner: creation-seq
        # sorted, dead slots pushed to the end so they never split the
        # backbone into anchored segments
        order = jnp.asarray(np.argsort(
            np.where(valid, m.kf_seq[:K], np.iinfo(np.int64).max)
        ).astype(np.int32))
        ei_a = np.asarray(ei, np.int32)
        ej_a = np.asarray(ej, np.int32)
        Sij_a = Sij.astype(np.float32)
        ev_a = np.ones(len(ei), bool)
        fix_scale = cfg.sensor != "monocular"
        import jax as _jax

        if cfg.runtime.mesh_essential_graph and len(_jax.devices()) > 1:
            from .parallel import sharded_pose_graph as spg

            mesh = spg.make_edge_mesh(_jax.devices())
            fn = spg.make_sharded_pose_graph(
                mesh, iters=cfg.runtime.essential_graph_iters,
                fix_scale=fix_scale,
            )
            eis, ejs, Sijs, evs = spg.shard_edges(
                mesh, ei_a, ej_a, Sij_a, ev_a)
            res = fn(jnp.asarray(S_init), jnp.asarray(fixed),
                     jnp.asarray(valid), eis, ejs, Sijs, evs, order)
        else:
            res = pose_graph.optimize_pose_graph(
                jnp.asarray(S_init), jnp.asarray(fixed), jnp.asarray(valid),
                jnp.asarray(ei_a), jnp.asarray(ej_a), jnp.asarray(Sij_a),
                jnp.asarray(ev_a),
                iters=cfg.runtime.essential_graph_iters,
                fix_scale=fix_scale,
                order=order,
            )
        S_opt = np.asarray(res.poses)

        # write back poses ([R t/s]) and transform points via reference KF.
        # S_old must be the pose set the points are CURRENTLY consistent with
        # — i.e. S_init (entry state, which already includes the loop-group
        # correction). Using pre-correction poses here would apply the
        # correction to the loop group twice.
        # per-KF correction transforms, batched: M_k = S_opt[k]^-1 ∘ S_old[k]
        M = sim3_np.compose(sim3_np.inverse(S_opt[vk]), S_init[vk])
        mp_done = np.zeros(m.n_mp, bool)
        for i, k in enumerate(vk):
            # p' = S_new^-1 ( S_old p )  (both applied in world coords)
            mps = np.where((m.mp_ref_kf[: m.n_mp] == k) & m.mp_valid[: m.n_mp]
                           & ~mp_done[: m.n_mp])[0]
            if len(mps):
                m.mp_pos[mps] = sim3_np.apply(M[i][None], m.mp_pos[mps])
                mp_done[mps] = True
        m.kf_pose[vk] = sim3_np.to_se3(S_opt[vk])
        m.update_point_attributes(np.where(mp_done)[0])

    # ------------------------------------------------------------------
    # Global BA (†GlobalBundleAdjustemnt [sic])
    # ------------------------------------------------------------------
    # size buckets bound the number of distinct compiled BA programs while
    # avoiding silent truncation as the map grows (SURVEY §7.3.1)
    _GBA_BUCKETS = ((32, 4096), (64, 8192), (128, 16384), (256, 32768))

    def global_bundle_adjustment(self, iters: Optional[int] = None,
                                 max_kfs: Optional[int] = None,
                                 max_points: Optional[int] = None,
                                 obs_cap: int = 8,
                                 use_mesh: bool = False,
                                 abort_check=None,
                                 chunk: int = 5,
                                 sweep_window: Optional[int] = None,
                                 sweep_points: Optional[int] = None,
                                 sweep_overlap: int = 64):
        """Full-map BA with snapshot semantics.

        The problem is gathered under the map lock, solved WITHOUT the lock
        (in `chunk`-iteration pieces so `abort_check` — the InterruptBA /
        mbStopGBA analog — is honored between chunks), and written back
        under the lock with spanning-tree propagation to keyframes/points
        created while the solve ran (†RunGlobalBundleAdjustment's
        mTcwGBA/mTcwBefGBA staged update). Maps bigger than the largest
        single-solve bucket are optimized whole via the overlapping-window
        sweep (_gba_sweep); sweep_window/sweep_points/sweep_overlap override
        its geometry (tests use small windows)."""
        m = self.map
        cfg = self.cfg
        iters = iters or cfg.runtime.global_ba_iters
        if max_kfs is None and not use_mesh:
            # past the largest single-solve bucket the whole map is still
            # optimized — as an overlapping-window sweep (KITTI-scale maps;
            # the pre-sweep essential graph has already made poses roughly
            # consistent, each window polishes against its anchored overlap)
            n_live_kf = len(m.valid_keyframes())
            win = sweep_window or self._GBA_BUCKETS[-1][0]
            if n_live_kf > win:
                return self._gba_sweep(
                    iters, obs_cap, abort_check, chunk,
                    window=win,
                    max_points=sweep_points or self._GBA_BUCKETS[-1][1],
                    overlap=sweep_overlap,
                )
        if not self._lock_abortable(abort_check):
            return  # superseded while waiting for the map lock
        try:
            snap = self._gba_gather(max_kfs, max_points, obs_cap)
        finally:
            m.lock.release()
        if snap is None:
            return
        prob, kfs, mp_ids, opt_mask, n_ids = snap

        if abort_check is None:
            res = self._gba_solve(prob, iters, use_mesh)
        else:
            res = self._solve_chunked(prob, iters, abort_check, chunk)
            if res is None:
                return  # superseded: discard (†mbStopGBA -> return)
        if not self._lock_abortable(abort_check):
            return  # superseded while waiting for the map lock
        try:
            self._gba_write_back(
                kfs, opt_mask, np.asarray(res.poses),
                mp_ids, np.asarray(res.points)[:n_ids],
            )
            m.version += 1
        finally:
            m.lock.release()

    def _lock_abortable(self, abort_check) -> bool:
        """Acquire the map lock, polling the abort flag while blocked.

        A superseding loop closure holds the map lock while it joins the
        running GBA task (launch_global_ba_background); a plain blocking
        acquire there would deadlock — the abort flag must win."""
        if abort_check is None:
            self.map.lock.acquire()
            return True
        while not self.map.lock.acquire(timeout=0.05):
            if abort_check():
                return False
        return True

    def _gba_gather(self, max_kfs, max_points, obs_cap,
                    kfs=None, fixed_prefix=1):
        """Build the statically-shaped GBA problem from the live map.

        `kfs` (temporal order) overrides window selection — the sweep path
        passes explicit overlapping windows; `fixed_prefix` keyframes at the
        head are held fixed as the gauge anchor (1 = reference behavior of
        fixing KF id 0; a sweep window anchors on its already-optimized
        overlap)."""
        m = self.map
        cfg = self.cfg
        if kfs is None:
            n_live_kf = len(m.valid_keyframes())
            n_live_mp = len(m.valid_map_points())
            if max_kfs is None or max_points is None:
                for bk, bp in self._GBA_BUCKETS:
                    if n_live_kf <= bk and n_live_mp <= bp:
                        max_kfs, max_points = bk, bp
                        break
                else:
                    max_kfs, max_points = self._GBA_BUCKETS[-1]
                    print(
                        f"[global BA] map ({n_live_kf} KFs, {n_live_mp} pts) "
                        f"exceeds largest bucket {self._GBA_BUCKETS[-1]}; "
                        f"optimizing the newest window (older poses propagate "
                        f"through the spanning tree at write-back)"
                    )
            kfs = [int(k) for k in m.valid_keyframes()]
            kfs.sort(key=lambda k: int(m.kf_seq[k]))  # temporal (ids recycle)
            if len(kfs) > max_kfs:
                # window the NEWEST keyframes (drift lives there); the oldest
                # kept KF is held fixed as the gauge anchor
                kfs = kfs[-max_kfs:]
        else:
            kfs = [int(k) for k in kfs if m.kf_valid[k]]
        if len(kfs) < 2:
            return None
        kf_to_w = {k: i for i, k in enumerate(kfs)}
        in_window = np.zeros(m.n_kf, bool)
        in_window[np.asarray(kfs)] = True
        mp_all = m.valid_map_points()
        # points observed from inside the window only
        obs_in = in_window[np.maximum(m.mp_obs_kf[mp_all], 0)] & (
            m.mp_obs_kf[mp_all] >= 0
        )
        mp_ids = mp_all[obs_in.any(1)]
        if len(mp_ids) > max_points:
            print(f"[global BA] point budget: {len(mp_ids) - max_points} of "
                  f"{len(mp_ids)} window points beyond cap {max_points} move "
                  f"with their reference KF instead of being optimized")
            mp_ids = mp_ids[:max_points]

        Kw, Mw, Ow = max_kfs, max_points, obs_cap
        poses = np.tile(np.eye(4, dtype=np.float32), (Kw, 1, 1))
        poses[: len(kfs)] = m.kf_pose[kfs]
        opt_mask = np.zeros(Kw, bool)
        # †BundleAdjustment fixes KF id 0; sweep windows fix their overlap
        opt_mask[fixed_prefix: len(kfs)] = True

        w_of_kf = np.full(max(m.n_kf, 1), -1, np.int32)
        w_of_kf[np.asarray(kfs)] = np.arange(len(kfs), dtype=np.int32)
        n_ids = len(mp_ids)
        raw_kf = m.mp_obs_kf[mp_ids]
        raw_ft = m.mp_obs_feat[mp_ids]
        wi = np.where(raw_kf >= 0, w_of_kf[np.maximum(raw_kf, 0)], -1)
        has = wi >= 0
        order = np.argsort(~has, axis=1, kind="stable")[:, :Ow]
        rows = np.arange(n_ids)[:, None]
        wi_c = wi[rows, order]
        has_c = has[rows, order]
        kf_c = np.maximum(raw_kf[rows, order], 0)
        ft_c = np.maximum(raw_ft[rows, order], 0)

        sf = cfg.extractor.scale_factor
        points = np.zeros((Mw, 3), np.float32)
        points[:n_ids] = m.mp_pos[mp_ids]
        point_valid = np.zeros(Mw, bool)
        point_valid[:n_ids] = True
        obs_kf_t = np.full((Mw, Ow), -1, np.int32)
        obs_uvr = np.full((Mw, Ow, 3), -1.0, np.float32)
        obs_s2 = np.ones((Mw, Ow), np.float32)
        obs_val = np.zeros((Mw, Ow), bool)
        obs_kf_t[:n_ids] = np.where(has_c, wi_c, -1)
        xy = m.kf_xy[kf_c, ft_c]
        ur = m.kf_ur[kf_c, ft_c]
        obs_uvr[:n_ids] = np.concatenate([xy, ur[..., None]], axis=2)
        obs_s2[:n_ids] = sf ** (2.0 * m.kf_octave[kf_c, ft_c])
        obs_val[:n_ids] = has_c

        prob = ba.BAProblem(
            poses=jnp.asarray(poses), opt_mask=jnp.asarray(opt_mask),
            points=jnp.asarray(points), point_valid=jnp.asarray(point_valid),
            obs_kf=jnp.asarray(obs_kf_t), obs_uvr=jnp.asarray(obs_uvr),
            obs_sigma2=jnp.asarray(obs_s2), obs_valid=jnp.asarray(obs_val),
        )
        return prob, kfs, mp_ids, opt_mask, n_ids

    def _solve_chunked(self, prob, iters, abort_check, chunk):
        """LM in `chunk`-iteration pieces, honoring the abort flag between
        chunks (†mbStopGBA). Returns None when superseded."""
        res = None
        done = 0
        while done < iters:
            n = min(chunk, iters - done)
            last = done + n >= iters
            res = ba.optimize_ba(
                cam=self.cam, prob=prob, iters=n,
                outlier_rounds=1 if last else 0,
            )
            prob = prob._replace(poses=res.poses, points=res.points)
            done += n
            if abort_check is not None and abort_check() and not last:
                return None
        return res

    def _gba_sweep(self, iters, obs_cap, abort_check, chunk,
                   window, max_points, overlap: int = 64):
        """Whole-map GBA past the largest single-solve bucket: overlapping
        temporal windows swept oldest -> newest.

        Window i is anchored on `overlap` keyframes already optimized by
        window i-1 (held fixed), so corrections chain forward and EVERY
        keyframe pose is optimized — unlike the pre-r5 behavior of
        optimizing only the newest window. Per-window problems share one
        static shape (window, max_points, obs_cap), so the whole sweep runs
        through a single compiled BA program. Points are written back per
        window (last window wins in overlaps); keyframes created while the
        sweep ran and points never selected are corrected afterward via the
        spanning tree / reference-KF transforms (†RunGlobalBundleAdjustment
        staged propagation)."""
        m = self.map
        if not self._lock_abortable(abort_check):
            return
        try:
            all_kfs = sorted((int(k) for k in m.valid_keyframes()),
                             key=lambda k: int(m.kf_seq[k]))
        finally:
            m.lock.release()
        step = max(window - overlap, 1)
        n_win = 1 + max(0, -(-(len(all_kfs) - window) // step))
        print(f"[global BA] sweep: {len(all_kfs)} KFs in {n_win} windows "
              f"of {window} (overlap {overlap})")
        eff_bef: Dict[int, np.ndarray] = {}
        eff_new: Dict[int, np.ndarray] = {}
        mp_opt = np.zeros(m.mp_valid.shape[0], bool)
        start = 0
        while True:
            wk = all_kfs[start: start + window]
            fixed_prefix = 1 if start == 0 else min(overlap, len(wk) - 1)
            if not self._lock_abortable(abort_check):
                return
            try:
                snap = self._gba_gather(window, max_points, obs_cap,
                                        kfs=wk, fixed_prefix=fixed_prefix)
            finally:
                m.lock.release()
            if snap is not None:
                prob, kfs_w, mp_ids, opt_mask, n_ids = snap
                res = self._solve_chunked(prob, iters, abort_check, chunk)
                if res is None:
                    return  # superseded mid-sweep: completed windows stand
                new_poses = np.asarray(res.poses)
                new_points = np.asarray(res.points)[:n_ids]
                if not self._lock_abortable(abort_check):
                    return
                try:
                    m.correction_epoch += 1  # stale mapper commits discard
                    for w, k in enumerate(kfs_w):
                        if not m.kf_valid[k]:
                            continue
                        # "before" = pose at THIS window's write-back
                        # (†mTcwBefGBA semantics, see _gba_write_back);
                        # first appearance wins for the final propagation
                        eff_bef.setdefault(k, m.kf_pose[k].copy())
                        T = (new_poses[w] if opt_mask[w]
                             else m.kf_pose[k].copy())
                        eff_new[k] = T
                        m.kf_pose[k] = T
                    sel = m.mp_valid[mp_ids]
                    live = mp_ids[sel]
                    m.mp_pos[live] = new_points[sel]
                    mp_opt[live] = True
                finally:
                    m.lock.release()
            if start + window >= len(all_kfs):
                break
            start += step
        if not self._lock_abortable(abort_check):
            return
        try:
            m.correction_epoch += 1
            self._propagate_unoptimized(eff_bef, eff_new, mp_opt)
            m.version += 1
        finally:
            m.lock.release()

    def _gba_solve(self, prob, iters, use_mesh):
        if use_mesh:
            # multi-chip: landmark axis sharded over all devices, Schur
            # system psum-reduced (†RunGlobalBundleAdjustment analog at scale)
            import jax

            from .parallel import sharded_ba

            mesh = sharded_ba.make_landmark_mesh(jax.devices())
            fn = sharded_ba.make_sharded_ba(mesh, iters=iters)
            return fn(self.cam, sharded_ba.shard_problem(mesh, prob))
        return ba.optimize_ba(cam=self.cam, prob=prob, iters=iters)

    def _gba_write_back(self, kfs, opt_mask, new_poses, mp_ids, new_points):
        """Apply GBA results to the live map, propagating the correction to
        keyframes and points created during the solve (†the mnBAGlobalForKF /
        mTcwBefGBA spanning-tree walk).

        The "before" poses are captured HERE, at write-back time — exactly
        the reference's mTcwBefGBA = GetPose() right before applying
        mTcwGBA. Capturing them at gather time corrupted the map: local BA
        runs WHILE the background GBA solves, so a keyframe created
        mid-solve relates to its ancestor's CURRENT pose, and propagating
        it against the ancestor's stale gather-time pose wedged every
        descendant by the ancestor's local-BA delta (measured: map ATE
        0.036 -> 0.30 across one background GBA on the circuit test)."""
        m = self.map
        m.correction_epoch += 1  # invalidate in-flight mapper commits
        eff_bef: Dict[int, np.ndarray] = {}
        eff_new: Dict[int, np.ndarray] = {}
        for w, k in enumerate(kfs):
            if not m.kf_valid[k]:
                continue
            eff_bef[k] = m.kf_pose[k].copy()  # †mTcwBefGBA (now, not gather)
            eff_new[k] = new_poses[w] if opt_mask[w] else eff_bef[k]
        # points: optimized ones get their solved positions; the rest move
        # with their reference keyframe's correction (helper)
        live_ids = mp_ids[m.mp_valid[mp_ids]]
        sel = m.mp_valid[mp_ids]
        m.mp_pos[live_ids] = new_points[sel]
        in_ids = np.zeros(m.mp_valid.shape[0], bool)
        in_ids[live_ids] = True
        self._propagate_unoptimized(eff_bef, eff_new, in_ids)

    def _propagate_unoptimized(self, eff_bef, eff_new, mp_moved):
        """Shared GBA write-back tail: propagate corrections to keyframes
        outside the optimized set (created or re-parented during the solve)
        via the nearest optimized spanning-tree ancestor, move points that
        were never optimized with their reference keyframe's correction,
        then commit the keyframe poses."""
        m = self.map
        in_snap = set(eff_new)
        for k in [int(x) for x in m.valid_keyframes()]:
            if k in in_snap:
                continue
            anc = k
            hops = 0
            while anc >= 0 and anc not in in_snap and hops <= m.n_kf:
                anc = int(m.span_parent[anc])
                hops += 1
            if anc < 0 or anc not in in_snap:
                continue  # disconnected from the optimized window: untouched
            bef_cur = m.kf_pose[k].copy()
            T_rel = bef_cur @ np.linalg.inv(eff_bef[anc])
            eff_bef[k] = bef_cur
            eff_new[k] = (T_rel @ eff_new[anc]).astype(np.float32)
        others = np.where(m.mp_valid[: m.n_mp] & ~mp_moved[: m.n_mp])[0]
        for mp in others:
            rk = int(m.mp_ref_kf[mp])
            if rk not in eff_new:
                continue
            pc = eff_bef[rk][:3, :3] @ m.mp_pos[mp] + eff_bef[rk][:3, 3]
            Twc = np.linalg.inv(eff_new[rk])
            m.mp_pos[mp] = Twc[:3, :3] @ pc + Twc[:3, 3]
        for k, T in eff_new.items():
            m.kf_pose[k] = T
