"""Pre-trace + pre-load every hot device program before tracking starts.

Each distinct jitted program signature costs ~0.3-1 s at first dispatch even
with a warm persistent compilation cache (tracing + MLIR conversion + cache
deserialization), and on relay-attached TPU hosts that first dispatch stalls
the ENTIRE link — tracker pulls included — for its whole duration. A SLAM
system hitting a fresh bundle-adjustment bucket mid-sequence therefore drops
several frames. The reference has the same concept at a smaller scale: it
front-loads the vocabulary parse (~10-20 s) before tracking
(†src/System.cc ≈L28-45).

warmup_system(slam) dispatches every program of the steady-state frame and
keyframe paths with dummy data at production shapes: extraction, the fused
tracking cascade, depth/stereo association, triangulation, fuse, local-BA
buckets, point-attribute buckets, BoW. Loop-closing solvers (Sim3, pose
graph, GBA) are deliberately NOT warmed: loops are rare events and their
buckets depend on map size.
"""

from __future__ import annotations

import numpy as np


def warmup_system(slam, verbose: bool = False) -> float:
    """Run every hot jit signature once; returns elapsed seconds."""
    import time

    import jax
    import jax.numpy as jnp

    from .ops import matching
    from .ops import point_attrs as pa
    from . import local_mapping as LM
    from . import tracking as T

    t0 = time.perf_counter()
    cfg = slam.cfg
    tracker = slam.tracker
    m = slam.map
    cam = tracker.cam
    H, W = cfg.camera.height, cfg.camera.width
    N = cfg.extractor.max_keypoints
    rt = cfg.runtime

    def log(msg):
        if verbose:
            print(f"[warmup] {msg} (+{time.perf_counter() - t0:.1f}s)")

    # 1. extraction + frame assembly (covers undistort / depth / stereo)
    img = np.zeros((H, W), np.uint8)
    depth = right = None
    if cfg.sensor == "rgbd":
        depth = np.ones((H, W), np.float32)
    elif cfg.sensor == "stereo":
        right = img
    fid = tracker._next_frame_id
    frame = tracker._make_frame(img, 0.0, depth, right)
    tracker._next_frame_id = fid  # warmup frames don't consume ids
    jax.block_until_ready(frame.dev["desc"])
    log("extract+frame")

    # 2. fused tracking cascade at the production local-map shape
    P = tracker.local_point_cap
    buf = dict(
        pos=jnp.zeros((P, 3), jnp.float32) + jnp.float32([0, 0, 5.0]),
        desc=jnp.zeros((P, 32), jnp.uint8),
        valid=jnp.zeros(P, bool),
        normal=jnp.tile(jnp.float32([0, 0, -1.0]), (P, 1)),
        dmin=jnp.full(P, 0.1, jnp.float32),
        dmax=jnp.full(P, 50.0, jnp.float32),
    )
    cfge = cfg.extractor
    packed = T.track_frame_fused(
        cam, jnp.eye(4, dtype=jnp.float32),
        buf["pos"], buf["desc"], buf["valid"], buf["normal"], buf["dmin"],
        buf["dmax"],
        frame.dev["xy"], frame.dev["desc"], frame.dev["octave"],
        frame.dev["valid"], frame.dev["ur"], frame.dev["depth"],
        jnp.float32(1.0), jnp.float32(cfg.tracking.motion_model_radius),
        jnp.float32(cfge.scale_factor), cfge.n_levels,
        cfg.tracking.min_inliers_track,
    )
    jax.block_until_ready(packed)
    log("track_frame_fused")

    # 2b. device-chained variant (the production pipelined path)
    packed2, tcw_out = T.track_frame_fused_chained(
        cam, jnp.eye(4, dtype=jnp.float32), jnp.eye(4, dtype=jnp.float32),
        jnp.asarray(True),
        buf["pos"], buf["desc"], buf["valid"], buf["normal"], buf["dmin"],
        buf["dmax"],
        frame.dev["xy"], frame.dev["desc"], frame.dev["octave"],
        frame.dev["valid"], frame.dev["ur"], frame.dev["depth"],
        jnp.float32(1.0), jnp.float32(cfg.tracking.motion_model_radius),
        jnp.float32(cfge.scale_factor), cfge.n_levels,
        cfg.tracking.min_inliers_track,
    )
    jax.block_until_ready(tcw_out)
    log("track_frame_fused_chained")

    # 3. keyframe mirror + row update
    mir = m.dev_kf.ensure(m)
    m.dev_kf.upload_kf(m, 0)
    jax.block_until_ready(m.dev_kf.arrays["kf_desc"])
    log("kf mirror")

    # 4. triangulation kernel (same construction as _create_new_points_gather)
    n_nb = cfg.mapping.triangulation_neighbors
    if cfg.sensor != "monocular":
        n_nb = max(n_nb // 2, 1)
    B = n_nb
    nb_arr = np.zeros(B, np.int64)
    out = LM._triangulate_neighbors_mirror(
        mir["kf_desc"], mir["kf_xy"], mir["kf_octave"], mir["kf_ur"],
        mir["kf_depth"],
        jnp.asarray(0), jnp.asarray(nb_arr),
        jnp.asarray(np.zeros(N, bool)), jnp.asarray(np.zeros((B, N), bool)),
        jnp.asarray(np.eye(4, dtype=np.float32)),
        jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))),
        jnp.asarray(np.zeros(B, bool)),
        jnp.asarray(np.asarray(cam.K, np.float32)),
        jnp.float32(0.1), jnp.float32(max(cfg.camera.bf, 1.0)),
        jnp.float32(cfge.scale_factor),
    )
    jax.block_until_ready(out)
    log("triangulation")

    # 5. fuse kernel (same shapes as _fuse_neighbors)
    S, D, Pf = 11, 20, 1024
    res = LM._fuse_match_mirror(
        jnp.zeros((S, Pf, 3), jnp.float32), jnp.zeros((S, Pf, 32), jnp.uint8),
        jnp.zeros((S, Pf), bool), jnp.asarray(np.zeros(D, np.int64)),
        mir["kf_desc"], mir["kf_xy"], mir["kf_octave"], mir["kf_feat_valid"],
        jnp.asarray(np.zeros(D, np.int64)),
        jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (D, 1, 1))),
        cam, jnp.float32(cfge.scale_factor), jnp.float32(3.0),
    )
    jax.block_until_ready(res.valid)
    log("fuse")

    # 6. local-BA buckets (both chunk signatures per bucket)
    from .ops import ba

    Ow = slam.local_mapper.obs_cap
    k_hi = rt.local_ba_max_kfs + rt.local_ba_max_fixed_kfs
    kws, mws = [], []
    kw = 16
    while True:
        kws.append(min(kw, k_hi))
        if kw >= k_hi:
            break
        kw *= 4
    mw = 1024
    while True:
        mws.append(min(mw, rt.local_ba_max_points))
        if mw >= rt.local_ba_max_points:
            break
        mw *= 4
    # full cross product: Kw and Mw bucket independently in the gather
    for Kw, Mw in [(k, mm) for k in kws for mm in mws]:
        prob = ba.BAProblem(
            poses=jnp.asarray(np.tile(np.eye(4, dtype=np.float32),
                                      (Kw, 1, 1))),
            opt_mask=jnp.asarray(np.arange(Kw) > 0),
            points=jnp.asarray(
                np.tile(np.float32([0, 0, 5.0]), (Mw, 1))),
            point_valid=jnp.asarray(np.ones(Mw, bool)),
            obs_kf=jnp.asarray(np.zeros((Mw, Ow), np.int32)),
            obs_uvr=jnp.asarray(np.full((Mw, Ow, 3), -1.0, np.float32)),
            obs_sigma2=jnp.asarray(np.ones((Mw, Ow), np.float32)),
            obs_valid=jnp.asarray(np.zeros((Mw, Ow), bool)),
        )
        for rounds in (0, 1):
            r = ba.optimize_ba(cam=cam, prob=prob, iters=5,
                               outlier_rounds=rounds)
            jax.block_until_ready(r.poses)
        log(f"local BA bucket K={Kw} M={Mw}")

    # 7. point-attribute buckets (obs axis compacted + i16 on the wire;
    # Ob=8 covers young maps, 16/32 mature ones)
    for Pb in (128, 512, 2048):
        for Ob in (8, 16, 32):
            r = pa.point_attributes(
                mir["kf_desc"], mir["kf_octave"], jnp.asarray(m.kf_pose),
                jnp.asarray(np.full((Pb, Ob), -1, np.int16)),
                jnp.asarray(np.full((Pb, Ob), -1, np.int16)),
                jnp.asarray(np.zeros((Pb, 3), np.float32)),
                jnp.asarray(np.full(Pb, -1, np.int32)),
                jnp.float32(cfge.scale_factor),
                jnp.float32(cfge.n_levels - 1),
            )
            jax.block_until_ready(r)
    log("point attrs")

    # 8. BoW (database add + loop detection path)
    if slam.kfdb is not None:
        slam.kfdb.compute_bow(np.zeros((N, 32), np.uint8), np.zeros(N, bool))
        log("bow")

    # 9. reference-KF fallback matcher (the TrackReferenceKeyFrame path)
    r = matching.match_descriptors(
        frame.dev["desc"], frame.dev["desc"], frame.dev["valid"],
        frame.dev["valid"], max_dist=matching.TH_LOW, nn_ratio=0.7,
        mutual=True, angles_a=frame.dev["angle"],
        angles_b=frame.dev["angle"], check_rotation=True,
    )
    jax.block_until_ready(r.valid)
    log("ref-kf matcher")

    return time.perf_counter() - t0
