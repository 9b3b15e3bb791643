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


def _triangulate_one_neighbor(
    desc1, xy1, oct1, avail1, depth1, ur1, T1,
    desc2, xy2, oct2, avail2, depth2, ur2, T2, nb_ok,
    K, baseline, bf, sf,
):
    """Match + DLT + source choice + acceptance gates against ONE neighbor.

    The full †CreateNewMapPoints inner loop as a fixed-shape program:
    SearchForTriangulation, DLT vs measured-depth-unprojection arbitration
    (cosParallaxRays vs cosParallaxStereo), and the cheirality / chi2 (with
    u_right residual) / parallax / scale-consistency gates. Everything is
    masked rather than compacted so the shapes never depend on match counts
    — vmapped over neighbors and jitted in `_triangulate_neighbors_kernel`,
    it costs ONE device dispatch per keyframe instead of a python loop of
    eager ops (which, per-op, is a full host<->device round trip on relay
    rigs)."""
    F21 = matching.fundamental_from_poses(K, K, T1, T2)
    sigma2_nb = sf ** (2.0 * oct2.astype(jnp.float32))
    pair = matching.epipolar_gate(xy1, xy2, F21, sigma2_nb)
    res = matching.match_descriptors(
        desc1, desc2, avail1, avail2, pair_mask=pair,
        max_dist=matching.TH_LOW, nn_ratio=0.6, mutual=True,
    )
    idx = jnp.maximum(res.idx, 0)
    x1 = xy1
    x2 = xy2[idx]
    o2 = oct2[idx]
    d2m = depth2[idx]
    u_r2 = ur2[idx]

    P1 = K @ T1[:3, :]
    P2 = K @ T2[:3, :]
    X_dlt = geo.triangulate_dlt(P1, P2, x1, x2)          # (F, 3)

    R1t = T1[:3, :3].T
    R2t = T2[:3, :3].T
    C1 = -(R1t @ T1[:3, 3])
    C2 = -(R2t @ T2[:3, 3])
    Kinv = jnp.linalg.inv(K)

    # --- source arbitration (†cosParallaxRays vs cosParallaxStereo)
    ones = jnp.ones((x1.shape[0], 1), x1.dtype)
    r1 = (jnp.concatenate([x1, ones], 1) @ Kinv.T) @ R1t.T
    r2 = (jnp.concatenate([x2, ones], 1) @ Kinv.T) @ R2t.T
    cos_rays = jnp.sum(r1 * r2, 1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=1) * jnp.linalg.norm(r2, axis=1), 1e-12)
    has1 = depth1 > 0
    has2 = d2m > 0
    cosp1 = jnp.where(has1, jnp.cos(2 * jnp.arctan2(baseline / 2, depth1)), 2.0)
    cosp2 = jnp.where(has2, jnp.cos(2 * jnp.arctan2(baseline / 2, d2m)), 2.0)
    cosp_stereo = jnp.minimum(cosp1, cosp2)
    use_dlt = (cos_rays < cosp_stereo) & (cos_rays > 0) & (
        has1 | has2 | (cos_rays < 0.9998))

    def unproject(T, x, d):
        Rt = T[:3, :3].T
        Cc = -(Rt @ T[:3, 3])
        pc = jnp.stack([
            (x[:, 0] - K[0, 2]) / K[0, 0] * d,
            (x[:, 1] - K[1, 2]) / K[1, 1] * d, d], axis=1)
        return pc @ Rt.T + Cc

    nan3 = jnp.full_like(X_dlt, jnp.nan)
    X = jnp.where(use_dlt[:, None], X_dlt, nan3)
    pick1 = ~use_dlt & has1 & (cosp1 <= cosp2)
    pick2 = ~use_dlt & has2 & ~pick1
    X = jnp.where(pick1[:, None], unproject(T1, x1, depth1), X)
    X = jnp.where(pick2[:, None], unproject(T2, x2, d2m), X)

    # --- acceptance gates (†CreateNewMapPoints tail)
    finite = jnp.all(jnp.isfinite(X), axis=1)
    Xs = jnp.where(finite[:, None], X, 0.0)
    pc1 = Xs @ T1[:3, :3].T + T1[:3, 3]
    pc2 = Xs @ T2[:3, :3].T + T2[:3, 3]
    z_ok = (pc1[:, 2] > 0.05) & (pc2[:, 2] > 0.05)

    def reproj_ok(pc, x, octv, ur):
        z = jnp.maximum(pc[:, 2], 1e-9)
        u = K[0, 0] * pc[:, 0] / z + K[0, 2]
        v = K[1, 1] * pc[:, 1] / z + K[1, 2]
        sig2 = sf ** (2.0 * octv.astype(jnp.float32))
        e2 = (u - x[:, 0]) ** 2 + (v - x[:, 1]) ** 2
        mono_ok = e2 <= 5.991 * sig2
        e2s = e2 + (u - bf / z - ur) ** 2
        return jnp.where(ur >= 0, e2s <= 7.8 * sig2, mono_ok)

    r_ok = reproj_ok(pc1, x1, oct1, ur1) & reproj_ok(pc2, x2, o2, u_r2)
    n1 = Xs - C1
    n2 = Xs - C2
    d1 = jnp.linalg.norm(n1, axis=1)
    d2 = jnp.linalg.norm(n2, axis=1)
    cos_par = jnp.sum(n1 * n2, 1) / jnp.maximum(d1 * d2, 1e-12)
    par_ok = (cos_par < 0.9998) | ~use_dlt
    ratio_dist = d2 / jnp.maximum(d1, 1e-9)
    ratio_oct = sf ** (o2.astype(jnp.float32) - oct1.astype(jnp.float32))
    sc_ok = (ratio_dist < ratio_oct * sf * 1.5) & (
        ratio_dist > ratio_oct / (sf * 1.5))

    good = res.valid & nb_ok & finite & z_ok & r_ok & par_ok & sc_ok
    return jnp.where(good[:, None], Xs, 0.0), good, res.idx


@functools.partial(jax.jit, static_argnames=())
def _triangulate_neighbors_kernel(
    desc1, xy1, oct1, avail1, depth1, ur1, T1,
    desc2, xy2, oct2, avail2, depth2, ur2, T2, nb_ok,
    K, baseline, bf, sf,
):
    """vmap of `_triangulate_one_neighbor` over the neighbor axis: the whole
    CreateNewMapPoints device work for a keyframe in ONE dispatch."""
    return jax.vmap(
        _triangulate_one_neighbor,
        in_axes=(None,) * 7 + (0,) * 8 + (None,) * 4,
    )(desc1, xy1, oct1, avail1, depth1, ur1, T1,
      desc2, xy2, oct2, avail2, depth2, ur2, T2, nb_ok,
      K, baseline, bf, sf)


@functools.partial(jax.jit, static_argnames=())
def _triangulate_neighbors_mirror(
    mir_desc, mir_xy, mir_oct, mir_ur, mir_depth,
    kf, nb_arr, avail1, avail2, T1, T2, nb_ok,
    K, baseline, bf, sf,
):
    """Mirror variant: the per-keyframe feature arrays are already device
    resident (MapState.dev_kf); only indices, availability masks, and poses
    travel host->device per call."""
    return jax.vmap(
        _triangulate_one_neighbor,
        in_axes=(None,) * 7 + (0,) * 8 + (None,) * 4,
    )(mir_desc[kf], mir_xy[kf], mir_oct[kf], avail1, mir_depth[kf],
      mir_ur[kf], T1,
      mir_desc[nb_arr], mir_xy[nb_arr], mir_oct[nb_arr], avail2,
      mir_depth[nb_arr], mir_ur[nb_arr], T2, nb_ok,
      K, baseline, bf, sf)


def _fuse_match_body(mp_pos, mp_desc, mp_valid, Tcw, kp_xy, kp_desc,
                     kp_octave, kp_valid, cam: Camera, scale_factor,
                     radius_mult):
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


_fuse_match = jax.jit(_fuse_match_body)


@functools.partial(jax.jit, static_argnames=())
def _fuse_match_batch(mp_pos, mp_desc, mp_valid, Tcw, kp_xy, kp_desc,
                      kp_octave, kp_valid, cam: Camera, scale_factor,
                      radius_mult):
    """All 2N SearchInNeighbors fuse directions in ONE dispatch (vmap over
    the direction axis — a python loop of per-direction calls costs a full
    host<->device round trip each on relay rigs)."""
    return jax.vmap(
        _fuse_match_body,
        in_axes=(0,) * 8 + (None, None, None),
    )(mp_pos, mp_desc, mp_valid, Tcw, kp_xy, kp_desc, kp_octave, kp_valid,
      cam, scale_factor, radius_mult)


@functools.partial(jax.jit, static_argnames=())
def _fuse_match_mirror(mp_pos_u, mp_desc_u, pv_u, src_of_dir,
                       mir_desc, mir_xy, mir_oct, mir_fv, dst_of_dir, Tcw,
                       cam: Camera, scale_factor, radius_mult):
    """Mirror variant of _fuse_match_batch: the destination keyframes'
    feature arrays come from the device-resident mirror (indexed by
    dst_of_dir) and the source point windows are deduplicated host-side
    (src_of_dir indexes into the unique-source axis — the current keyframe
    appears as the source of half the directions, so uploading its window
    once instead of N times halves the H2D bytes)."""
    return jax.vmap(
        _fuse_match_body,
        in_axes=(0,) * 8 + (None, None, None),
    )(mp_pos_u[src_of_dir], mp_desc_u[src_of_dir], pv_u[src_of_dir], Tcw,
      mir_xy[dst_of_dir], mir_desc[dst_of_dir], mir_oct[dst_of_dir],
      mir_fv[dst_of_dir], cam, scale_factor, radius_mult)


class LocalMapper:
    def __init__(self, cfg: SlamConfig, slam_map: MapState, cam: Camera):
        self.cfg = cfg
        self.map = slam_map
        self.cam = cam
        # cached host scalars (Camera fields are device arrays; pulling
        # them blocks a full RTT on relay rigs)
        self._K_np = np.asarray(cam.K, np.float32)
        self._bf = float(np.asarray(cam.bf))
        self._baseline = self._bf / max(float(self._K_np[0, 0]), 1e-8)
        self.recent_points: List[Tuple[int, int]] = []  # (mp, created_at_kf)
        self.obs_cap = 8  # window observation cap for local BA
        # points whose attributes (distinctive descriptor / normal / depth
        # band) changed this keyframe round; ONE batched refresh runs at the
        # end of the round instead of one per phase (each refresh is a full
        # device round trip — 3 calls/KF at ~30-60 ms each dominated the
        # mapper's wall time). The reference recomputes eagerly after every
        # mutation; within one ProcessNewKeyFrame round the intermediate
        # values are only read by the tracker, which tolerates one-round
        # staleness the same way it tolerates the async refresh itself.
        self._attrs_pending: set = set()
        # set by the system facade to KeyFrameDatabase.precompute_async:
        # dispatches the keyframe's BoW vector at the START of the mapping
        # round so the loop-closing stage consumes a completed async copy
        self.bow_precompute = lambda kf: None
        # InterruptBA analog (†LocalMapping::mbAbortBA): the async pipeline
        # points this at "another keyframe is waiting"; local BA checks it
        # between LM chunks and stops early with the partial solution
        self.interrupt = lambda: False
        # Real backlog (≥2 keyframes waiting): skip fuse + BA for this
        # keyframe (†LocalMapping::Run gates SearchInNeighbors/BA on
        # !CheckNewKeyFrames()). A single waiting keyframe only aborts BA
        # between chunks — skipping on ANY pending keyframe was measured to
        # spiral: less fusion -> more duplicate points -> fewer inliers ->
        # more urgent keyframes -> more backlog. Under PERMANENT backlog
        # (CPU-starved host) even the >=2 gate skips every keyframe and the
        # map decays the same way (rendered-circuit async ATE drifted to
        # 0.3 with zero fuse/BA rounds), so consecutive skips are bounded:
        # every (max_skip_streak+1)-th keyframe runs fuse + BA regardless.
        self.backlog = lambda: False
        self.max_skip_streak = 2
        self._skip_streak = 0
        self._skip_now = False
        # EMA of the wall-clock cost of one keyframe's mapping phases,
        # maintained by whoever drives process_keyframe (the async worker).
        # The tracker paces its idle-mapper keyframe gate against this, so
        # keyframe admission converges to the rate mapping can sustain
        # instead of oscillating with queue-timing luck (the round-3
        # "keyframe-rate bistability": 13-31 KFs on the same sequence).
        self.kf_proc_ema_s = 0.0

    def note_kf_processed(self, seconds: float, alpha: float = 0.3):
        if self.kf_proc_ema_s == 0.0:
            self.kf_proc_ema_s = seconds
        else:
            self.kf_proc_ema_s += alpha * (seconds - self.kf_proc_ema_s)

    # ------------------------------------------------------------------
    def process_keyframe(self, kf: int, run_ba: bool = True):
        for phase in self.keyframe_phases(kf, run_ba):
            phase()

    def keyframe_phases(self, kf: int, run_ba: bool = True):
        """The †ProcessNewKeyFrame pipeline as individually schedulable
        phases. The async worker acquires the map lock PER PHASE (not for
        the whole keyframe) so the tracker's keyframe insertion waits at
        most one phase, not a full mapping round; each phase re-reads map
        state, so interleaved tracker mutations are safe."""

        lock = self.map.lock

        def _locked(fn):
            def run():
                with lock:
                    fn()
            return run

        def _finish():
            self._flush_attrs_pending()
            self._cull_keyframes(kf)
            self.map.version += 1

        # create/fuse/BA manage the lock internally (gather + commit only);
        # the host-only phases are cheap enough to hold it throughout.
        # Fuse + local BA run only when no newer keyframe is waiting —
        # †LocalMapping::Run gates SearchInNeighbors and the BA on
        # !CheckNewKeyFrames(): under backlog the mapper catches up on
        # point creation first and the skipped work is subsumed by the
        # next idle keyframe's neighborhood pass.
        def _fuse_phase():
            # one skip decision per keyframe, bounded streak (see __init__)
            self._skip_now = (self.backlog()
                              and self._skip_streak < self.max_skip_streak)
            if self._skip_now:
                self._skip_streak += 1
                return
            self._skip_streak = 0
            self._fuse_neighbors(kf)

        def _ba_phase():
            if not self._skip_now:
                self.local_bundle_adjustment(kf)

        phases = [
            lambda: self.bow_precompute(kf),
            _locked(self.map.recycle_free_slots),
            _locked(lambda: self._refresh_tracked_points(kf)),
            _locked(lambda: self._cull_map_points(kf)),
            lambda: self._create_new_points(kf),
            _fuse_phase,
        ]
        if run_ba:
            phases.append(_ba_phase)
        phases.append(_locked(_finish))
        return phases

    # ------------------------------------------------------------------
    # ProcessNewKeyFrame (†LocalMapping::ProcessNewKeyFrame): refresh the
    # distinctive descriptor / normal / depth band of every pre-existing
    # point the new keyframe now observes. The tracker only binds the
    # observations (cheap); this full median-Hamming pass runs here, off
    # the tracking thread in async mode.
    # ------------------------------------------------------------------
    def _refresh_tracked_points(self, kf: int):
        m = self.map
        mps = m.kf_mp[kf]
        mps = np.unique(mps[mps >= 0])
        # only points with >1 observation need the refresh: fresh
        # single-observation spawns were closed-form-initialized at creation
        mps = mps[m.mp_n_obs[mps] > 1]
        self._attrs_pending.update(int(x) for x in mps)

    def _flush_attrs_pending(self):
        """ONE batched attribute refresh for every point this keyframe
        round touched (new observations from the tracker, triangulated
        points, fuse merges)."""
        if not self._attrs_pending:
            return
        mps = np.fromiter(self._attrs_pending, dtype=np.int64)
        self._attrs_pending.clear()
        self.map.update_point_attributes(mps)

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
        """Gather under the map lock, run the triangulation kernel WITHOUT
        it (device round trips must not stall the tracker's keyframe
        insertion), commit under the lock with availability re-checked
        against the current map."""
        m = self.map
        cfg = self.cfg
        with m.lock:
            epoch = m.correction_epoch
            gathered = self._create_new_points_gather(kf)
        if gathered is None:
            return
        nb_arr, n_nbs, args = gathered
        out = _triangulate_neighbors_mirror(*args)
        for t in out:
            t.copy_to_host_async()  # overlap the three D2H pulls
        X_all, good_all, idx_all = (np.asarray(t) for t in out)
        with m.lock:
            if m.correction_epoch != epoch:
                # a loop correction / GBA rewrote the geometry while the
                # kernel ran: these triangulations live in the OLD frame
                print("[mapping] discarding stale triangulation "
                      "(correction landed mid-flight)")
                return
            self._create_new_points_commit(
                kf, nb_arr, n_nbs, X_all, good_all, idx_all
            )

    def _create_new_points_gather(self, kf: int):
        m = self.map
        cfg = self.cfg
        n_nb = cfg.mapping.triangulation_neighbors
        if cfg.sensor != "monocular":
            n_nb = max(n_nb // 2, 1)
        neighbors = m.covisible_keyframes(kf, n_nb)
        if len(neighbors) == 0:
            return None
        K = self._K_np
        T1 = m.kf_pose[kf]
        C1 = m.keyframe_center(kf)
        med_depth1 = self._median_depth(kf)

        # host-side neighbor admission (pose-only baseline gates)
        nbs = []
        for nb in neighbors:
            nb = int(nb)
            baseline = float(np.linalg.norm(m.keyframe_center(nb) - C1))
            if cfg.sensor == "monocular":
                if med_depth1 > 0 and baseline / med_depth1 < 0.01:
                    continue  # †baseline/medianDepth gate
            else:
                if baseline < self._baseline:
                    continue
            nbs.append(nb)
        if not nbs:
            return None

        # pad the neighbor axis to the configured cap so the kernel shape is
        # stable across keyframes (padding rows carry nb_ok=False)
        B = n_nb
        pad = [nbs[0]] * (B - len(nbs))
        nb_arr = np.asarray(nbs + pad, np.int64)
        nb_ok = np.zeros(B, bool)
        nb_ok[: len(nbs)] = True

        avail1 = m.kf_feat_valid[kf] & (m.kf_mp[kf] < 0)
        avail2 = m.kf_feat_valid[nb_arr] & (m.kf_mp[nb_arr] < 0)
        mir = m.dev_kf.ensure(m)
        args = (
            mir["kf_desc"], mir["kf_xy"], mir["kf_octave"], mir["kf_ur"],
            mir["kf_depth"],
            jnp.asarray(kf), jnp.asarray(nb_arr),
            jnp.asarray(avail1), jnp.asarray(avail2),
            jnp.asarray(T1), jnp.asarray(m.kf_pose[nb_arr]),
            jnp.asarray(nb_ok),
            jnp.asarray(K.astype(np.float32)),
            jnp.float32(self._baseline),
            jnp.float32(self._bf),
            jnp.float32(cfg.extractor.scale_factor),
        )
        return nb_arr, len(nbs), args

    def _create_new_points_commit(self, kf, nb_arr, n_nbs, X_all, good_all,
                                  idx_all):
        m = self.map
        if not m.kf_valid[kf]:
            return
        # availability re-read at commit time: the tracker may have bound
        # observations while the kernel ran
        avail1 = m.kf_feat_valid[kf] & (m.kf_mp[kf] < 0)
        good = good_all[:n_nbs] & avail1[None, :]           # (B, N)
        if not good.any():
            return
        # first neighbor to claim a feature wins (the sequential loop's
        # avail1-update semantics), vectorized: argmax over the padded
        # neighbor axis picks the lowest claiming b per feature
        feat_ids = np.where(good.any(axis=0))[0]
        claim_b = np.argmax(good[:, feat_ids], axis=0)      # (F,)
        idx2 = idx_all[claim_b, feat_ids]
        # one neighbor feature backs at most one new point (first wins,
        # matching the sequential loop's claim order)
        _, first = np.unique(claim_b.astype(np.int64) * 100000 + idx2,
                             return_index=True)
        keep = np.zeros(len(feat_ids), bool)
        keep[first] = True
        feat_ids, claim_b, idx2 = feat_ids[keep], claim_b[keep], idx2[keep]
        X = X_all[claim_b, feat_ids].astype(np.float32)
        new_mps = m.add_map_points_batch(X, kf)
        m.add_observations_batch(new_mps, kf, feat_ids)
        for b in np.unique(claim_b):
            rows = claim_b == b
            m.add_observations_batch(
                new_mps[rows], int(nb_arr[b]), idx2[rows]
            )
        self.recent_points.extend((int(mp), kf) for mp in new_mps)
        # closed-form init from the current keyframe's observation (the
        # full median-Hamming refresh over both observations runs once at
        # the end of the round via _flush_attrs_pending; with 2 obs the
        # median picks either descriptor, so the init is near-equivalent)
        m.init_point_attributes(new_mps, kf, feat_ids)
        self._attrs_pending.update(int(mp) for mp in new_mps)
        m.update_connections(kf)

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
        """Same lock discipline as _create_new_points: gather under the map
        lock, one batched device dispatch without it, commit under it."""
        m = self.map
        sf = self.cfg.extractor.scale_factor
        with m.lock:
            epoch = m.correction_epoch
            neighbors = [int(x) for x in m.covisible_keyframes(kf, 10)]
            if not neighbors:
                return
            # project current KF's points into neighbors (and vice versa)
            directions = [(kf, nb) for nb in neighbors] + \
                [(nb, kf) for nb in neighbors]
            P = 1024
            D = 20  # fixed direction capacity (2 x 10 covisible neighbors)
            S = 11  # unique sources: current KF + up to 10 neighbors
            # so the batched kernel compiles once; padding rows pv False
            directions = directions[:D]
            srcs = [kf] + neighbors[: S - 1]
            src_index = {s: i for i, s in enumerate(srcs)}
            sel_u = np.zeros((S, P), np.int64)
            pv_u = np.zeros((S, P), bool)
            for si, src in enumerate(srcs):
                mps = m.kf_mp[src]
                mps = np.unique(mps[mps >= 0])
                mps = mps[m.mp_valid[mps]]
                if len(mps) > P:  # no silent caps: fuse recall shrinks here
                    print(f"[mapping] fuse from {src}: {len(mps) - P} "
                          f"points beyond the {P}-slot window skipped")
                sel_u[si, : min(len(mps), P)] = mps[:P]
                pv_u[si, : min(len(mps), P)] = True
            src_of_dir = np.zeros(D, np.int64)
            dst_d = np.zeros(D, np.int64)
            pv_dir_ok = np.zeros(D, bool)
            for di, (src, dst) in enumerate(directions):
                src_of_dir[di] = src_index[src]
                dst_d[di] = dst
                pv_dir_ok[di] = True
            sel_d = sel_u[src_of_dir]
            pv_d = pv_u[src_of_dir] & pv_dir_ok[:, None]
            mir = m.dev_kf.ensure(m)
            args = (
                jnp.asarray(m.mp_pos[sel_u]), jnp.asarray(m.mp_desc[sel_u]),
                jnp.asarray(pv_u), jnp.asarray(src_of_dir),
                mir["kf_desc"], mir["kf_xy"], mir["kf_octave"],
                mir["kf_feat_valid"],
                jnp.asarray(dst_d), jnp.asarray(m.kf_pose[dst_d]),
            )
        # ONE batched dispatch for all 2N projection-fuse directions
        res_d = _fuse_match_mirror(
            *args, self.cam, jnp.float32(sf), jnp.float32(3.0),
        )
        res_d.valid.copy_to_host_async()
        res_d.idx.copy_to_host_async()
        rv_d = np.asarray(res_d.valid)
        ridx_d = np.asarray(res_d.idx)
        with m.lock:
            if m.correction_epoch != epoch:
                print("[mapping] discarding stale fuse matches "
                      "(correction landed mid-flight)")
                return
            self._fuse_commit(kf, neighbors, directions, sel_d, pv_d,
                              rv_d, ridx_d)

    def _fuse_commit(self, kf, neighbors, directions, sel_d, pv_d, rv_d,
                     ridx_d):
        m = self.map
        touched = set()
        for di, (src, dst) in enumerate(directions):
            if not m.kf_valid[dst]:
                continue  # culled while the kernel ran
            rv = rv_d[di]
            ridx = ridx_d[di]
            sel = sel_d[di]
            for row in np.where(rv & pv_d[di])[0]:
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
            self._attrs_pending.update(touched)
            m.update_connections(kf)
            for nb in neighbors:
                m.update_connections(nb)

    # ------------------------------------------------------------------
    # Local BA (gather window -> ops.ba -> write back)
    # ------------------------------------------------------------------
    def local_bundle_adjustment(self, kf: int):
        """Gather the window under the map lock, solve WITHOUT it (the LM
        chunks are the long device round trips), write back under it with
        liveness re-checked."""
        m = self.map
        with m.lock:
            epoch = m.correction_epoch
            gathered = self._local_ba_gather(kf)
        if gathered is None:
            return
        window, opt_mask_w, mp_ids, obs_valid, obs_src, prob = gathered
        res = self._local_ba_solve(prob)
        with m.lock:
            if m.correction_epoch != epoch:
                # the window was gathered pre-correction; writing the solved
                # poses back now would clobber the loop correction with
                # stale geometry (†RequestStop protocol analog)
                print("[mapping] discarding stale local-BA result "
                      "(correction landed mid-flight)")
                return
            self._local_ba_write_back(
                window, opt_mask_w, mp_ids, obs_valid, obs_src, res
            )

    def _local_ba_gather(self, kf: int):
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
            return None
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
            return None

        # power-of-two buckets sized to the ACTUAL window: the solver is a
        # fixed-shape jitted program, and padding every solve to the max
        # capacity (64 KFs x 4096 points) made early/small windows pay the
        # full-capacity device time (~80 ms/solve at 15 LM iters) and an 8x
        # H2D gather. Each bucket compiles once (persistent cache).
        # coarse x4 steps: every (Kw, Mw) signature is a distinct jitted
        # program whose first dispatch costs ~0.5-1 s of trace+cache-load
        # that stalls the whole relay link — fewer buckets beats tighter
        # padding (the padded solve itself is only ~15-40 ms)
        def _bucket(n, lo, hi):
            b = lo
            while b < n and b < hi:
                b *= 4
            return min(b, hi)

        Kw = _bucket(len(window), 16, rt.local_ba_max_kfs
                     + rt.local_ba_max_fixed_kfs)
        Mw = _bucket(len(mp_ids), 1024, rt.local_ba_max_points)
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
        return window, opt_mask, mp_ids, obs_valid, obs_src, prob

    def _local_ba_solve(self, prob):
        rt = self.cfg.runtime
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
                # reference's 5-iteration fallback when aborted (same
                # (iters, rounds) signature as the final chunk so the abort
                # path never triggers a fresh program load)
                res = ba.optimize_ba(
                    cam=self.cam, prob=prob, iters=chunk, outlier_rounds=1
                )
                break
        for t in (res.poses, res.points, res.obs_inlier):
            t.copy_to_host_async()  # overlap the D2H pulls
        return res

    def _local_ba_write_back(self, window, opt_mask, mp_ids, obs_valid,
                             obs_src, res):
        # --- write back (the reference does this under mMutexMapUpdate);
        # liveness is re-checked: keyframes/points may have been culled
        # while the solver ran off-lock
        m = self.map
        new_poses = np.asarray(res.poses)
        for w, kfi in enumerate(window):
            if opt_mask[w] and m.kf_valid[kfi]:
                m.kf_pose[kfi] = new_poses[w]
        new_points = np.asarray(res.points)
        live = m.mp_valid[mp_ids]
        m.mp_pos[mp_ids[live]] = new_points[: len(mp_ids)][live]
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
