"""Local mapping: keyframe processing, point creation/fusion, local BA, culling.

Re-design of †src/LocalMapping.cc (SURVEY §2.1 row 3, §3.3). The reference's
polling thread becomes a pipeline stage invoked per keyframe; the heavy steps
(epipolar matching, triangulation, local BA) are jitted kernels over gathered
fixed-capacity windows; the graph bookkeeping stays host-side on the
single-writer MapState.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import SlamConfig
from .map.state import MapState
from .models.camera import Camera
from .ops import ba, geometry as geo, matching


@functools.partial(jax.jit, static_argnames=())
def _triangulation_match(
    desc1, xy1, oct1, avail1, desc2, xy2, oct2, avail2, F21, sigma2_lv2
):
    """SearchForTriangulation: epipolar-gated, ratio-tested, mutual match."""
    pair = matching.epipolar_gate(xy1, xy2, F21, sigma2_lv2)
    return matching.match_descriptors(
        desc1, desc2, avail1, avail2, pair_mask=pair,
        max_dist=matching.TH_LOW, nn_ratio=0.6, mutual=True,
    )


@functools.partial(jax.jit, static_argnames=())
def _fuse_match(mp_pos, mp_desc, mp_valid, Tcw, kp_xy, kp_desc, kp_octave,
                kp_valid, cam: Camera, scale_factor, radius_mult):
    """ORBmatcher::Fuse projection search (no pose opt, tight radius)."""
    from .models.camera import project, in_image

    R = Tcw[:3, :3]
    t = Tcw[:3, 3]
    pc = mp_pos @ R.T + t
    proj = project(cam, pc)
    okz = (pc[:, 2] > 0.05) & in_image(cam, proj)
    r_px = radius_mult * (scale_factor ** kp_octave.astype(jnp.float32))
    # radius per keypoint octave — build pair mask directly
    d2 = jnp.sum((proj[:, None, :] - kp_xy[None, :, :]) ** 2, axis=-1)
    pair = d2 <= (r_px[None, :] ** 2)
    return matching.match_descriptors(
        mp_desc, kp_desc, mp_valid & okz, kp_valid,
        pair_mask=pair, max_dist=matching.TH_LOW, nn_ratio=1.0,
    )


class LocalMapper:
    def __init__(self, cfg: SlamConfig, slam_map: MapState, cam: Camera):
        self.cfg = cfg
        self.map = slam_map
        self.cam = cam
        self.recent_points: List[Tuple[int, int]] = []  # (mp, created_at_kf)
        self.obs_cap = 8  # window observation cap for local BA
        # InterruptBA analog (†LocalMapping::mbAbortBA): the async pipeline
        # points this at "another keyframe is waiting"; local BA checks it
        # between LM chunks and stops early with the partial solution
        self.interrupt = lambda: False

    # ------------------------------------------------------------------
    def process_keyframe(self, kf: int, run_ba: bool = True):
        self.map.recycle_free_slots()
        self._cull_map_points(kf)
        self._create_new_points(kf)
        self._fuse_neighbors(kf)
        if run_ba:
            self.local_bundle_adjustment(kf)
        self._cull_keyframes(kf)
        self.map.version += 1

    # ------------------------------------------------------------------
    # MapPointCulling (†LocalMapping::MapPointCulling, SURVEY §2.9)
    # ------------------------------------------------------------------
    def _cull_map_points(self, current_kf: int):
        m = self.map
        keep: List[Tuple[int, int]] = []
        min_obs = 2 if self.cfg.sensor == "monocular" else 3
        for mp, born in self.recent_points:
            if not m.mp_valid[mp] or m.mp_first_kf[mp] != born:
                continue  # dead, or the slot was recycled for a new point
            age = current_kf - born
            found_ratio = m.mp_found[mp] / max(m.mp_visible[mp], 1)
            if found_ratio < self.cfg.mapping.mp_cull_found_ratio:
                m.remove_map_point(mp)
            elif age >= 2 and m.mp_n_obs[mp] <= min_obs:
                m.remove_map_point(mp)
            elif age >= 3:
                pass  # survived the probation window
            else:
                keep.append((mp, born))
        self.recent_points = keep

    # ------------------------------------------------------------------
    # CreateNewMapPoints (†LocalMapping::CreateNewMapPoints)
    # ------------------------------------------------------------------
    def _create_new_points(self, kf: int):
        m = self.map
        cfg = self.cfg
        n_nb = cfg.mapping.triangulation_neighbors
        if cfg.sensor != "monocular":
            n_nb = max(n_nb // 2, 1)
        neighbors = m.covisible_keyframes(kf, n_nb)
        if len(neighbors) == 0:
            return
        sf = cfg.extractor.scale_factor
        sigma2 = np.float32(sf) ** (2 * m.kf_octave.astype(np.float32))
        K = np.asarray(self.cam.K)
        T1 = m.kf_pose[kf]
        C1 = m.keyframe_center(kf)
        med_depth1 = self._median_depth(kf)

        avail1 = m.kf_feat_valid[kf] & (m.kf_mp[kf] < 0)
        new_mps = []
        for nb in neighbors:
            nb = int(nb)
            T2 = m.kf_pose[nb]
            C2 = m.keyframe_center(nb)
            baseline = float(np.linalg.norm(C2 - C1))
            if cfg.sensor == "monocular":
                if med_depth1 > 0 and baseline / med_depth1 < 0.01:
                    continue  # †baseline/medianDepth gate
            else:
                if baseline < float(np.asarray(self.cam.baseline)):
                    continue
            F21 = matching.fundamental_from_poses(
                jnp.asarray(K), jnp.asarray(K), jnp.asarray(T1), jnp.asarray(T2)
            )
            avail2 = m.kf_feat_valid[nb] & (m.kf_mp[nb] < 0)
            res = _triangulation_match(
                jnp.asarray(m.kf_desc[kf]), jnp.asarray(m.kf_xy[kf]),
                jnp.asarray(m.kf_octave[kf]), jnp.asarray(avail1),
                jnp.asarray(m.kf_desc[nb]), jnp.asarray(m.kf_xy[nb]),
                jnp.asarray(m.kf_octave[nb]), jnp.asarray(avail2),
                F21, jnp.asarray(sigma2[nb]),
            )
            mv = np.asarray(res.valid)
            if not mv.any():
                continue
            idx1 = np.where(mv)[0]
            idx2 = np.asarray(res.idx)[idx1]
            x1 = m.kf_xy[kf][idx1]
            x2 = m.kf_xy[nb][idx2]
            P1 = K @ T1[:3, :]
            P2 = K @ T2[:3, :]
            X = np.asarray(
                geo.triangulate_dlt(
                    jnp.asarray(P1), jnp.asarray(P2),
                    jnp.asarray(x1), jnp.asarray(x2),
                )
            )
            # †CreateNewMapPoints parallax arbitration: when the stereo
            # rig's own parallax (2*atan2(b/2, depth)) beats the two-view
            # ray parallax, measured-depth unprojection is MORE accurate
            # than DLT — prefer it (low-parallax far band included).
            X, from_dlt = self._choose_point_source(
                X, x1, x2, T1, T2, C1, C2,
                m.kf_depth[kf][idx1], m.kf_depth[nb][idx2], K)
            good = self._triangulation_gates(
                X, x1, x2, T1, T2, C1, C2,
                m.kf_octave[kf][idx1], m.kf_octave[nb][idx2], K,
                m.kf_ur[kf][idx1], m.kf_ur[nb][idx2], from_dlt,
            )
            for i in np.where(good)[0]:
                mp = m.add_map_point(X[i].astype(np.float32), kf)
                m.add_observation(mp, kf, int(idx1[i]))
                m.add_observation(mp, nb, int(idx2[i]))
                avail1[idx1[i]] = False
                new_mps.append(mp)
                self.recent_points.append((mp, kf))
        if new_mps:
            m.update_point_attributes(np.asarray(new_mps))
            m.update_connections(kf)

    def _choose_point_source(self, X_dlt, x1, x2, T1, T2, C1, C2,
                             d1m, d2m, K):
        """Pick DLT vs measured-depth unprojection per candidate
        (†CreateNewMapPoints cosParallaxRays vs cosParallaxStereo).

        Returns (X, from_dlt); rows with neither a confident DLT nor a
        stereo depth become NaN (rejected by the finite gate)."""
        b = float(np.asarray(self.cam.baseline))
        has1 = d1m > 0
        has2 = d2m > 0
        # ray parallax from the keypoint bearing vectors
        Rw1 = T1[:3, :3].T
        Rw2 = T2[:3, :3].T
        Kinv = np.linalg.inv(K)
        r1 = (np.concatenate([x1, np.ones((len(x1), 1), np.float32)], 1)
              @ Kinv.T) @ Rw1.T
        r2 = (np.concatenate([x2, np.ones((len(x2), 1), np.float32)], 1)
              @ Kinv.T) @ Rw2.T
        cos_rays = (r1 * r2).sum(1) / np.maximum(
            np.linalg.norm(r1, axis=1) * np.linalg.norm(r2, axis=1), 1e-12)
        cosp1 = np.where(has1, np.cos(2 * np.arctan2(b / 2, d1m)), 2.0)
        cosp2 = np.where(has2, np.cos(2 * np.arctan2(b / 2, d2m)), 2.0)
        cosp_stereo = np.minimum(cosp1, cosp2)
        use_dlt = (cos_rays < cosp_stereo) & (cos_rays > 0) & (
            has1 | has2 | (cos_rays < 0.9998))

        def unproject(T, x, d):
            Twc = np.linalg.inv(T)
            pc = np.stack([
                (x[:, 0] - K[0, 2]) / K[0, 0] * d,
                (x[:, 1] - K[1, 2]) / K[1, 1] * d, d], axis=1)
            return pc @ Twc[:3, :3].T + Twc[:3, 3]

        X = np.where(use_dlt[:, None], X_dlt, np.nan)
        pick1 = ~use_dlt & has1 & (cosp1 <= cosp2)
        pick2 = ~use_dlt & has2 & ~pick1
        if pick1.any():
            X = np.where(pick1[:, None], unproject(T1, x1, d1m), X)
        if pick2.any():
            X = np.where(pick2[:, None], unproject(T2, x2, d2m), X)
        return X.astype(np.float32), use_dlt

    def _triangulation_gates(self, X, x1, x2, T1, T2, C1, C2, oct1, oct2, K,
                             ur1=None, ur2=None, from_dlt=None):
        """Cheirality + reprojection chi2 (mono 5.991 / stereo 7.8 with the
        u_right residual, †CreateNewMapPoints) + parallax + scale."""
        sf = self.cfg.extractor.scale_factor
        bf = float(np.asarray(self.cam.bf))
        finite = np.isfinite(X).all(1)
        X = np.where(finite[:, None], X, 0.0)
        pc1 = X @ T1[:3, :3].T + T1[:3, 3]
        pc2 = X @ T2[:3, :3].T + T2[:3, 3]
        z_ok = (pc1[:, 2] > 0.05) & (pc2[:, 2] > 0.05)

        def reproj(pc, x, octv, ur):
            z = np.maximum(pc[:, 2], 1e-9)
            u = K[0, 0] * pc[:, 0] / z + K[0, 2]
            v = K[1, 1] * pc[:, 1] / z + K[1, 2]
            sig2 = sf ** (2 * octv.astype(np.float32))
            e2 = (u - x[:, 0]) ** 2 + (v - x[:, 1]) ** 2
            mono_ok = e2 <= 5.991 * sig2
            if ur is None:
                return mono_ok
            # stereo observation: include the right-x residual, chi2(3)
            e2s = e2 + (u - bf / z - ur) ** 2
            return np.where(ur >= 0, e2s <= 7.8 * sig2, mono_ok)

        r_ok = reproj(pc1, x1, oct1, ur1) & reproj(pc2, x2, oct2, ur2)
        n1 = X - C1
        n2 = X - C2
        d1 = np.linalg.norm(n1, axis=1)
        d2 = np.linalg.norm(n2, axis=1)
        cos_par = (n1 * n2).sum(1) / np.maximum(d1 * d2, 1e-12)
        # DLT points need real parallax; measured-depth points do not
        par_ok = cos_par < 0.9998
        if from_dlt is not None:
            par_ok = par_ok | ~from_dlt
        # scale consistency: distance ratio within x1.5 of octave scale ratio
        ratio_dist = d2 / np.maximum(d1, 1e-9)
        ratio_oct = sf ** (oct2.astype(np.float32) - oct1.astype(np.float32))
        sc_ok = (ratio_dist < ratio_oct * sf * 1.5) & (
            ratio_dist > ratio_oct / (sf * 1.5)
        )
        return finite & z_ok & r_ok & par_ok & sc_ok

    def _median_depth(self, kf: int) -> float:
        m = self.map
        mps = m.kf_mp[kf]
        mps = mps[mps >= 0]
        if len(mps) == 0:
            return -1.0
        T = m.kf_pose[kf]
        pc = m.mp_pos[mps] @ T[:3, :3].T + T[:3, 3]
        return float(np.median(pc[:, 2]))

    # ------------------------------------------------------------------
    # SearchInNeighbors / Fuse (†LocalMapping::SearchInNeighbors)
    # ------------------------------------------------------------------
    def _fuse_neighbors(self, kf: int):
        m = self.map
        sf = self.cfg.extractor.scale_factor
        neighbors = [int(x) for x in m.covisible_keyframes(kf, 10)]
        if not neighbors:
            return
        # project current KF's points into neighbors (and vice versa)
        directions = [(kf, nb) for nb in neighbors] + [(nb, kf) for nb in neighbors]
        touched = set()
        for src, dst in directions:
            mps = m.kf_mp[src]
            mps = np.unique(mps[mps >= 0])
            mps = mps[m.mp_valid[mps]]
            if len(mps) == 0:
                continue
            P = 1024
            if len(mps) > P:  # no silent caps: fuse recall shrinks here
                print(f"[mapping] fuse {src}->{dst}: {len(mps) - P} points "
                      f"beyond the {P}-slot window skipped")
            sel = np.zeros(P, np.int64)
            sel[: min(len(mps), P)] = mps[:P]
            pv = np.zeros(P, bool)
            pv[: min(len(mps), P)] = True
            res = _fuse_match(
                jnp.asarray(m.mp_pos[sel]), jnp.asarray(m.mp_desc[sel]),
                jnp.asarray(pv), jnp.asarray(m.kf_pose[dst]),
                jnp.asarray(m.kf_xy[dst]), jnp.asarray(m.kf_desc[dst]),
                jnp.asarray(m.kf_octave[dst]), jnp.asarray(m.kf_feat_valid[dst]),
                self.cam, jnp.float32(sf), jnp.float32(3.0),
            )
            rv = np.asarray(res.valid)
            ridx = np.asarray(res.idx)
            for row in np.where(rv)[0]:
                mp = int(sel[row])
                if not m.mp_valid[mp]:
                    continue  # replaced away by an earlier fuse row
                feat = int(ridx[row])
                existing = int(m.kf_mp[dst, feat])
                if existing >= 0 and m.mp_valid[existing]:
                    if existing != mp:
                        # keep the better-observed point (†Fuse replace rule)
                        if m.mp_n_obs[existing] >= m.mp_n_obs[mp]:
                            m.replace_map_point(mp, existing)
                            touched.add(existing)
                        else:
                            m.replace_map_point(existing, mp)
                            touched.add(mp)
                else:
                    m.add_observation(mp, dst, feat)
                    touched.add(mp)
        if touched:
            m.update_point_attributes(np.fromiter(touched, dtype=np.int64))
            m.update_connections(kf)
            for nb in neighbors:
                m.update_connections(nb)

    # ------------------------------------------------------------------
    # Local BA (gather window -> ops.ba -> write back)
    # ------------------------------------------------------------------
    def local_bundle_adjustment(self, kf: int):
        m = self.map
        rt = self.cfg.runtime
        local_kfs = [kf] + [int(x) for x in m.covisible_keyframes(kf)]
        local_kfs = local_kfs[: rt.local_ba_max_kfs]
        local_set = set(local_kfs)

        # points seen by local KFs
        mp_ids = np.unique(m.kf_mp[local_kfs])
        mp_ids = mp_ids[mp_ids >= 0]
        mp_ids = mp_ids[m.mp_valid[mp_ids]]
        if len(mp_ids) == 0 or len(local_kfs) < 2:
            return
        mp_ids = mp_ids[: rt.local_ba_max_points]

        # fixed KFs: other observers of those points
        obs_kfs = m.mp_obs_kf[mp_ids]
        all_obs = np.unique(obs_kfs[obs_kfs >= 0])
        fixed_kfs = [int(x) for x in all_obs if int(x) not in local_set]
        fixed_kfs = fixed_kfs[: rt.local_ba_max_fixed_kfs]

        window = local_kfs + fixed_kfs
        # keyframe 0 is always held fixed (global gauge, †BundleAdjustment)
        opt = np.array(
            [(w in local_set) and (w != 0) for w in window], bool
        )
        if not opt.any():
            return
        kf_to_w = {w: i for i, w in enumerate(window)}

        Kw = rt.local_ba_max_kfs + rt.local_ba_max_fixed_kfs
        Mw = rt.local_ba_max_points
        Ow = self.obs_cap
        poses = np.tile(np.eye(4, dtype=np.float32), (Kw, 1, 1))
        poses[: len(window)] = m.kf_pose[window]
        opt_mask = np.zeros(Kw, bool)
        opt_mask[: len(window)] = opt

        points = np.zeros((Mw, 3), np.float32)
        points[: len(mp_ids)] = m.mp_pos[mp_ids]
        point_valid = np.zeros(Mw, bool)
        point_valid[: len(mp_ids)] = True

        sf = self.cfg.extractor.scale_factor
        n_ids = len(mp_ids)
        # vectorized gather: map-level obs tables -> window-indexed obs tables
        w_of_kf = np.full(max(m.n_kf, 1), -1, np.int32)
        w_of_kf[np.asarray(window)] = np.arange(len(window), dtype=np.int32)
        raw_kf = m.mp_obs_kf[mp_ids]                       # (n, Omap)
        raw_ft = m.mp_obs_feat[mp_ids]
        wi = np.where(raw_kf >= 0, w_of_kf[np.maximum(raw_kf, 0)], -1)
        has = wi >= 0
        # compact valid slots to the front, keep first Ow
        order = np.argsort(~has, axis=1, kind="stable")[:, :Ow]
        rows = np.arange(n_ids)[:, None]
        wi_c = wi[rows, order]
        has_c = has[rows, order]
        kf_c = np.maximum(raw_kf[rows, order], 0)
        ft_c = np.maximum(raw_ft[rows, order], 0)

        obs_kf_t = np.full((Mw, Ow), -1, np.int32)
        obs_uvr = np.full((Mw, Ow, 3), -1.0, np.float32)
        obs_sigma2 = np.ones((Mw, Ow), np.float32)
        obs_valid = np.zeros((Mw, Ow), bool)
        obs_src = np.full((Mw, Ow, 2), -1, np.int64)
        obs_kf_t[:n_ids] = np.where(has_c, wi_c, -1)
        xy = m.kf_xy[kf_c, ft_c]                           # (n, Ow, 2)
        ur = m.kf_ur[kf_c, ft_c]
        obs_uvr[:n_ids] = np.concatenate([xy, ur[..., None]], axis=2)
        obs_sigma2[:n_ids] = sf ** (2.0 * m.kf_octave[kf_c, ft_c])
        obs_valid[:n_ids] = has_c
        obs_src[:n_ids, :, 0] = np.where(has_c, kf_c, -1)
        obs_src[:n_ids, :, 1] = np.where(has_c, ft_c, -1)

        prob = ba.BAProblem(
            poses=jnp.asarray(poses),
            opt_mask=jnp.asarray(opt_mask),
            points=jnp.asarray(points),
            point_valid=jnp.asarray(point_valid),
            obs_kf=jnp.asarray(obs_kf_t),
            obs_uvr=jnp.asarray(obs_uvr),
            obs_sigma2=jnp.asarray(obs_sigma2),
            obs_valid=jnp.asarray(obs_valid),
        )
        # chunked LM so a waiting keyframe can abort between chunks
        # (†Optimizer::LocalBundleAdjustment's pbStopFlag)
        chunk = 5
        done = 0
        res = None
        while done < rt.local_ba_iters:
            n = min(chunk, rt.local_ba_iters - done)
            last = done + n >= rt.local_ba_iters
            res = ba.optimize_ba(
                cam=self.cam, prob=prob, iters=n,
                outlier_rounds=1 if last else 0,
            )
            prob = prob._replace(poses=res.poses, points=res.points)
            done += n
            if not last and self.interrupt():
                # finish with the abbreviated outlier round, like the
                # reference's 5-iteration fallback when aborted
                res = ba.optimize_ba(
                    cam=self.cam, prob=prob, iters=1, outlier_rounds=1
                )
                break

        # --- write back (the reference does this under mMutexMapUpdate; we
        # are the single writer, so plain assignment)
        new_poses = np.asarray(res.poses)
        for w, kfi in enumerate(window):
            if opt_mask[w]:
                m.kf_pose[kfi] = new_poses[w]
        new_points = np.asarray(res.points)
        m.mp_pos[mp_ids] = new_points[: len(mp_ids)]
        # outlier observation removal (only iterate actual violators)
        inl = np.asarray(res.obs_inlier)
        bad_i, bad_o = np.where(obs_valid & ~inl)
        for i, o in zip(bad_i, bad_o):
            mp = int(mp_ids[i])
            if not m.mp_valid[mp]:
                continue
            okf = int(obs_src[i, o, 0])
            m.erase_observation(mp, okf)
            if m.mp_n_obs[mp] <= 1:
                m.remove_map_point(mp)

    # ------------------------------------------------------------------
    # KeyFrameCulling (†LocalMapping::KeyFrameCulling)
    # ------------------------------------------------------------------
    def _cull_keyframes(self, kf: int):
        m = self.map
        for cand in [int(x) for x in m.covisible_keyframes(kf)]:
            if cand == 0 or not m.kf_valid[cand]:
                continue
            feats = np.where(m.kf_mp[cand] >= 0)[0]
            if len(feats) < 20:
                continue
            mps = m.kf_mp[cand, feats]
            live = m.mp_valid[mps]
            mps = mps[live]
            octs = m.kf_octave[cand, feats[live]]
            if len(mps) == 0:
                continue
            # vectorized: count other observers at same-or-finer (+1) scale
            okf = m.mp_obs_kf[mps]                        # (F, O)
            oft = np.maximum(m.mp_obs_feat[mps], 0)
            obs_oct = m.kf_octave[np.maximum(okf, 0), oft]
            counted = (okf >= 0) & (okf != cand) & (
                obs_oct <= (octs[:, None] + 1)
            )
            redundant = (counted.sum(1) >= 3).sum()
            if redundant > self.cfg.mapping.kf_cull_redundancy * len(feats):
                m.remove_keyframe(cand)
