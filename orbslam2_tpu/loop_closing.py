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

from typing import Dict, List, Optional, Set, Tuple

import jax.numpy as jnp
import numpy as np

from .config import SlamConfig
from .map.keyframe_database import KeyFrameDatabase
from .map.state import MapState
from .models.camera import Camera
from .ops import ba, bow, geometry as geo, matching, pose_graph, sim3_solver


class LoopCloser:
    def __init__(self, cfg: SlamConfig, slam_map: MapState, cam: Camera,
                 kfdb: KeyFrameDatabase):
        self.cfg = cfg
        self.map = slam_map
        self.cam = cam
        self.kfdb = kfdb
        self.consistent_groups: List[Tuple[Set[int], int]] = []
        self.last_loop_kf = -10**9
        self._rng = np.random.default_rng(cfg.runtime.seed + 1)
        self.loops_closed = 0

    # ------------------------------------------------------------------
    def process_keyframe(self, kf: int, run_global_ba: bool = True) -> bool:
        """Returns True if a loop was detected and corrected."""
        closed = False
        cand = self._detect_loop(kf)
        if cand is not None:
            ok = self._compute_and_correct(kf, cand, run_global_ba)
            if ok:
                self.last_loop_kf = kf
                self.loops_closed += 1
                closed = True
        self.kfdb.add(kf)
        return closed

    # ------------------------------------------------------------------
    # DetectLoop (†LoopClosing::DetectLoop)
    # ------------------------------------------------------------------
    def _detect_loop(self, kf: int) -> Optional[int]:
        m = self.map
        if kf - self.last_loop_kf < self.cfg.loop.kfs_between_loops:
            return None
        if len(m.valid_keyframes()) < self.cfg.loop.kfs_between_loops:
            return None
        covis = m.covisible_keyframes(kf)
        if len(covis) == 0:
            return None
        # minScore: lowest similarity to own covisibles
        own_bow = self.kfdb.bow_mat[kf]
        if not self.kfdb.in_db[kf]:
            own_bow = self.kfdb.compute_bow(m.kf_desc[kf], m.kf_feat_valid[kf])
            self.kfdb.bow_mat[kf] = own_bow
        scores = [
            float(bow.l1_score(jnp.asarray(own_bow), jnp.asarray(self.kfdb.bow_mat[int(c)])))
            for c in covis if self.kfdb.in_db[int(c)]
        ]
        min_score = min(scores) if scores else 0.0

        candidates = self.kfdb.detect_loop_candidates(kf, min_score)
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

        # total-match gate: project loop neighborhood points into current KF
        n_total = self._count_projected_matches(kf, loop_kf, S12)
        if n_total < cfg.loop.min_total_matches:
            return False

        self._correct_loop(kf, loop_kf, S12, run_global_ba)
        return True

    def _count_projected_matches(self, kf: int, loop_kf: int, S12) -> int:
        """SearchByProjection(Scw): loop-side neighborhood points vs current
        KF features under the corrected pose."""
        m = self.map
        group = [loop_kf] + [int(x) for x in m.covisible_keyframes(loop_kf)]
        mps = np.unique(m.kf_mp[group])
        mps = mps[mps >= 0]
        mps = mps[m.mp_valid[mps]][:2048]
        if len(mps) == 0:
            return 0
        # corrected current pose: Scw = S12 * S(T_loop)
        S_loop = np.asarray(geo.sim3_from_se3(jnp.asarray(m.kf_pose[loop_kf])))
        Scw = np.asarray(geo.sim3_compose(jnp.asarray(S12), jnp.asarray(S_loop)))
        pc = np.asarray(geo.sim3_apply(jnp.asarray(Scw)[None], jnp.asarray(m.mp_pos[mps])))
        z = pc[:, 2]
        fx = float(np.asarray(self.cam.fx)); fy = float(np.asarray(self.cam.fy))
        cx = float(np.asarray(self.cam.cx)); cy = float(np.asarray(self.cam.cy))
        u = fx * pc[:, 0] / np.maximum(z, 1e-6) + cx
        v = fy * pc[:, 1] / np.maximum(z, 1e-6) + cy
        ok = (z > 0.1) & (u >= 0) & (u < self.cam.width) & (v >= 0) & (v < self.cam.height)
        if ok.sum() == 0:
            return 0
        P = 2048
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

        # corrected Sim3 of the current KF and its covisible group
        S_loop = np.asarray(geo.sim3_from_se3(jnp.asarray(m.kf_pose[loop_kf])))
        Scw_cur = np.asarray(geo.sim3_compose(jnp.asarray(S12), jnp.asarray(S_loop)))
        group = [kf] + [int(x) for x in m.covisible_keyframes(kf)]
        T_cur = m.kf_pose[kf]
        corrected: Dict[int, np.ndarray] = {}
        for k in group:
            T_k = m.kf_pose[k]
            S_k_c = np.asarray(geo.sim3_from_se3(
                jnp.asarray((T_k @ np.linalg.inv(T_cur)).astype(np.float32))
            ))
            corrected[k] = np.asarray(
                geo.sim3_compose(jnp.asarray(S_k_c), jnp.asarray(Scw_cur))
            )

        # move the group's map points and poses (†CorrectLoop map update)
        moved: Set[int] = set()
        for k in group:
            mps = np.unique(m.kf_mp[k])
            mps = mps[mps >= 0]
            mps = mps[m.mp_valid[mps]]
            S_old = np.asarray(geo.sim3_from_se3(jnp.asarray(pre_poses[k])))
            S_new_inv = np.asarray(geo.sim3_inverse(jnp.asarray(corrected[k])))
            for mp in mps:
                if mp in moved:
                    continue
                moved.add(int(mp))
                p_cam = np.asarray(geo.sim3_apply(
                    jnp.asarray(S_old)[None], jnp.asarray(m.mp_pos[mp][None])
                ))[0]
                m.mp_pos[mp] = np.asarray(geo.sim3_apply(
                    jnp.asarray(S_new_inv)[None], jnp.asarray(p_cam[None])
                ))[0]
            m.kf_pose[k] = np.asarray(geo.se3_from_sim3(jnp.asarray(corrected[k])))

        m.loop_edges.append((kf, loop_kf))
        m.version += 1

        # --- fuse loop-side landmarks into the corrected group
        # (†LoopClosing::SearchAndFuse, radius 4): duplicates created during
        # drift are replaced by the older loop-side points
        self._search_and_fuse(kf, loop_kf, group)

        # --- essential-graph optimization over all keyframes
        self._optimize_essential_graph(kf, loop_kf, pre_poses, corrected)

        # --- full-map BA (†RunGlobalBundleAdjustment, synchronous here)
        if run_global_ba:
            self.global_bundle_adjustment()

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
        P = 2048
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
        for k in np.where(valid)[0]:
            S_init[k] = np.asarray(geo.sim3_from_se3(jnp.asarray(m.kf_pose[k])))

        edges = self._essential_edges(pre_poses)
        if len(edges) < 2:
            return
        ei, ej, Sij = [], [], []
        for a, b in edges:
            ei.append(a)
            ej.append(b)
            # measurement from PRE-correction poses (odometry-consistent),
            # except edges inside the corrected set use corrected relatives
            Ta = pre_poses.get(a, m.kf_pose[a])
            Tb = pre_poses.get(b, m.kf_pose[b])
            if a in corrected and b in corrected:
                Sa, Sb = corrected[a], corrected[b]
            elif (min(a, b), max(a, b)) == (min(kf, loop_kf), max(kf, loop_kf)):
                # the loop edge uses the corrected current pose
                Sa = corrected.get(a) if a in corrected else np.asarray(
                    geo.sim3_from_se3(jnp.asarray(Ta)))
                Sb = corrected.get(b) if b in corrected else np.asarray(
                    geo.sim3_from_se3(jnp.asarray(Tb)))
            else:
                Sa = np.asarray(geo.sim3_from_se3(jnp.asarray(Ta)))
                Sb = np.asarray(geo.sim3_from_se3(jnp.asarray(Tb)))
            Sij.append(np.asarray(geo.sim3_compose(
                jnp.asarray(Sa), geo.sim3_inverse(jnp.asarray(Sb))
            )))
        fixed = np.zeros(K, bool)
        fixed[loop_kf] = True  # †loop KF fixed

        res = pose_graph.optimize_pose_graph(
            jnp.asarray(S_init), jnp.asarray(fixed), jnp.asarray(valid),
            jnp.asarray(np.asarray(ei, np.int32)),
            jnp.asarray(np.asarray(ej, np.int32)),
            jnp.asarray(np.stack(Sij).astype(np.float32)),
            jnp.ones(len(ei), bool),
            iters=cfg.runtime.essential_graph_iters,
            fix_scale=cfg.sensor != "monocular",
        )
        S_opt = np.asarray(res.poses)

        # write back poses ([R t/s]) and transform points via reference KF.
        # S_old must be the pose set the points are CURRENTLY consistent with
        # — i.e. S_init (entry state, which already includes the loop-group
        # correction). Using pre-correction poses here would apply the
        # correction to the loop group twice.
        mp_done = np.zeros(m.n_mp, bool)
        for k in np.where(valid)[0]:
            k = int(k)
            S_old = S_init[k]
            # p' = S_new^-1 ( S_old p )  (both applied in world coords)
            mps = np.where((m.mp_ref_kf[: m.n_mp] == k) & m.mp_valid[: m.n_mp]
                           & ~mp_done[: m.n_mp])[0]
            if len(mps):
                p = m.mp_pos[mps]
                pc = np.asarray(geo.sim3_apply(
                    jnp.asarray(S_old)[None], jnp.asarray(p)))
                pw = np.asarray(geo.sim3_apply(
                    geo.sim3_inverse(jnp.asarray(S_opt[k]))[None], jnp.asarray(pc)))
                m.mp_pos[mps] = pw
                mp_done[mps] = True
            m.kf_pose[k] = np.asarray(geo.se3_from_sim3(jnp.asarray(S_opt[k])))
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
                                 use_mesh: bool = False):
        m = self.map
        cfg = self.cfg
        iters = iters or cfg.runtime.global_ba_iters
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
                    f"exceeds largest bucket {self._GBA_BUCKETS[-1]}; truncating"
                )
        kfs = [int(k) for k in m.valid_keyframes()][:max_kfs]
        if len(kfs) < 2:
            return
        kf_to_w = {k: i for i, k in enumerate(kfs)}
        mp_ids = m.valid_map_points()[:max_points]

        Kw, Mw, Ow = max_kfs, max_points, obs_cap
        poses = np.tile(np.eye(4, dtype=np.float32), (Kw, 1, 1))
        poses[: len(kfs)] = m.kf_pose[kfs]
        opt_mask = np.zeros(Kw, bool)
        opt_mask[1: len(kfs)] = True  # KF id 0 fixed (†BundleAdjustment)

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
        if use_mesh:
            # multi-chip: landmark axis sharded over all devices, Schur
            # system psum-reduced (†RunGlobalBundleAdjustment analog at scale)
            import jax

            from .parallel import sharded_ba

            mesh = sharded_ba.make_landmark_mesh(jax.devices())
            fn = sharded_ba.make_sharded_ba(mesh, iters=iters)
            res = fn(self.cam, sharded_ba.shard_problem(mesh, prob))
        else:
            res = ba.optimize_ba(cam=self.cam, prob=prob, iters=iters)
        new_poses = np.asarray(res.poses)
        for k, w in kf_to_w.items():
            if opt_mask[w]:
                m.kf_pose[k] = new_poses[w]
        m.mp_pos[mp_ids] = np.asarray(res.points)[:n_ids]
