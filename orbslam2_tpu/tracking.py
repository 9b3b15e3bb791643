"""Tracking: per-frame pose estimation state machine (the reference's T1).

Re-design of †src/Tracking.cc (SURVEY §2.1 row 2, §3.2): the same FSM
(NO_IMAGES_YET / NOT_INITIALIZED / OK / LOST), motion-model + local-map
tracking, keyframe decision — but every hot step is a jitted, statically
shaped device program:

  extract (ops.orb) -> project/gate/match (ops.matching) -> motion-only LM
  (ops.pose_opt), with the local map gathered into fixed-capacity buffers.

Host code only sequences these kernels and runs the (cheap, irregular)
bookkeeping; there are no locks because tracking reads immutable map
snapshots (SURVEY §7.1 design stance).
"""

from __future__ import annotations

import collections
import enum
import functools
import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import SlamConfig
from .models.camera import Camera, in_image, project, undistort_points
from .map.state import MapState
from .ops import geometry as geo
from .ops import matching, orb, pose_opt
from .ops.initializer import N_ITERS, initialize_two_view


class TrackingState(enum.Enum):
    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    OK = 2
    LOST = 3


class FrameData:
    """One processed frame: device-resident features + lazy host views.

    The frame-rate path (match + pose LM) consumes the device arrays
    directly; the host numpy views (`frame.xy` etc.) materialize on first
    access — which only happens at keyframe/initialization rate, so the
    per-frame device->host traffic is a handful of scalars.
    """

    _FIELDS = ("xy", "desc", "octave", "angle", "valid", "ur", "depth")

    def __init__(self, frame_id: int, timestamp: float, dev: dict, n: int):
        self.frame_id = frame_id
        self.timestamp = timestamp
        self.dev = dev                       # jnp arrays per _FIELDS
        self.Tcw: Optional[np.ndarray] = None
        self.mp = np.full(n, -1, np.int32)   # matched map point per feature
        self._host: dict = {}

    def _pull(self, key: str) -> np.ndarray:
        if key not in self._host:
            # first host access: overlap ALL fields' D2H transfers (one
            # round-trip of latency instead of one per field — keyframe
            # creation reads every field back-to-back, and on relay-attached
            # rigs each serial blocking pull costs a full RTT)
            for k, arr in self.dev.items():
                if k not in self._host and hasattr(arr, "copy_to_host_async"):
                    arr.copy_to_host_async()
            for k, arr in self.dev.items():
                if k not in self._host:
                    self._host[k] = np.asarray(arr)
        return self._host[key]

    def prefetch_host(self):
        """Schedule non-blocking D2H copies of every field (call as soon as
        it is known the host views will be needed, e.g. at the keyframe
        decision, so the transfers overlap remaining host work)."""
        for arr in self.dev.values():
            if hasattr(arr, "copy_to_host_async"):
                arr.copy_to_host_async()

    xy = property(lambda self: self._pull("xy"))
    desc = property(lambda self: self._pull("desc"))
    octave = property(lambda self: self._pull("octave"))
    angle = property(lambda self: self._pull("angle"))
    valid = property(lambda self: self._pull("valid"))
    ur = property(lambda self: self._pull("ur"))
    depth = property(lambda self: self._pull("depth"))


# ---------------------------------------------------------------------------
# Jitted tracking kernel: project local points -> gated match -> pose LM
# ---------------------------------------------------------------------------

def _project_match_opt(
    cam, Tcw_pred, mp_pos, mp_desc, mp_valid, mp_normal, mp_dmin, mp_dmax,
    kp_xy, kp_desc, kp_octave, kp_valid, kp_ur,
    radius_mult, scale_factor, n_levels, max_dist, nn_ratio, do_pose_opt,
):
    """Core of one SearchByProjection + PoseOptimization pass (traced)."""
    R = Tcw_pred[:3, :3]
    t = Tcw_pred[:3, 3]
    pc = mp_pos @ R.T + t
    z = pc[:, 2]
    proj = project(cam, pc)

    cam_center = -R.T @ t
    vec = mp_pos - cam_center
    dist = jnp.linalg.norm(vec, axis=1)

    # isInFrustum (†Frame::isInFrustum): depth in scale band, in image,
    # viewing angle < 60 deg.
    cos_view = jnp.sum(vec * mp_normal, axis=1) / jnp.maximum(dist, 1e-9)
    in_frustum = (
        (z > 0.1)
        & in_image(cam, proj)
        & (dist >= 0.8 * mp_dmin)
        & (dist <= 1.2 * mp_dmax)
        & (cos_view > 0.5)
    )

    # PredictScale (†MapPoint::PredictScale)
    ratio = jnp.maximum(mp_dmax / jnp.maximum(dist, 1e-9), 1e-6)
    pred_level = jnp.clip(
        jnp.ceil(jnp.log(ratio) / jnp.log(scale_factor)).astype(jnp.int32),
        0,
        n_levels - 1,
    )
    r_px = radius_mult * (scale_factor ** pred_level.astype(jnp.float32))

    # candidate gates (†SearchByProjection(Frame, vector<MapPoint*>, th)):
    # window at the predicted scale, octave in [pred-1, pred], and for stereo
    # keypoints the right-coordinate residual within the same window
    pair = matching.radius_gate(proj, kp_xy, r_px) & matching.octave_gate(
        pred_level, kp_octave, lo=-1, hi=0
    )
    ur_pred = proj[:, 0] - cam.bf / jnp.maximum(z, 1e-6)
    ur_ok = (kp_ur[None, :] <= 0) | (
        jnp.abs(ur_pred[:, None] - kp_ur[None, :]) <= r_px[:, None]
    )
    pair = pair & ur_ok
    res = matching.match_descriptors(
        mp_desc, kp_desc, mp_valid & in_frustum, kp_valid,
        pair_mask=pair, max_dist=max_dist, nn_ratio=nn_ratio,
        octave_b=kp_octave, ratio_same_level_only=True,
    )

    # Resolve several map points claiming one keypoint: keep the best.
    P = mp_pos.shape[0]
    N = kp_xy.shape[0]
    kp_best = jnp.full((N,), matching.INVALID, jnp.int32)
    kp_best = kp_best.at[jnp.where(res.valid, res.idx, N - 1)].min(
        jnp.where(res.valid, res.dist, matching.INVALID)
    )
    keep = res.valid & (res.dist <= kp_best[jnp.maximum(res.idx, 0)])
    # break remaining ties (two points with equal dist) by point index
    first_claim = jnp.full((N,), P, jnp.int32)
    pidx = jnp.arange(P, dtype=jnp.int32)
    first_claim = first_claim.at[jnp.where(keep, res.idx, N - 1)].min(
        jnp.where(keep, pidx, P)
    )
    keep = keep & (first_claim[jnp.maximum(res.idx, 0)] == pidx)

    idx = jnp.where(keep, res.idx, 0)
    obs = jnp.concatenate(
        [kp_xy[idx], jnp.where(keep, kp_ur[idx], -1.0)[:, None]], axis=1
    )
    sigma2 = scale_factor ** (2.0 * kp_octave[idx].astype(jnp.float32))

    if do_pose_opt:
        opt = pose_opt.optimize_pose(
            Tcw_pred, cam, mp_pos, obs, sigma2, keep
        )
    else:
        opt = pose_opt.PoseOptResult(
            Tcw=Tcw_pred, inliers=keep,
            n_inliers=jnp.sum(keep.astype(jnp.int32)),
            chi2=jnp.zeros_like(sigma2),
        )
    return opt, res, keep, in_frustum


@functools.partial(
    jax.jit, static_argnames=("n_levels", "do_pose_opt", "max_dist", "nn_ratio")
)
def track_against_points(
    cam: Camera,
    Tcw_pred: jnp.ndarray,
    mp_pos: jnp.ndarray,      # (P, 3)
    mp_desc: jnp.ndarray,     # (P, 32)
    mp_valid: jnp.ndarray,    # (P,)
    mp_normal: jnp.ndarray,   # (P, 3)
    mp_dmin: jnp.ndarray,     # (P,)
    mp_dmax: jnp.ndarray,     # (P,)
    kp_xy: jnp.ndarray,       # (N, 2)
    kp_desc: jnp.ndarray,
    kp_octave: jnp.ndarray,
    kp_valid: jnp.ndarray,
    kp_ur: jnp.ndarray,       # (N,)
    radius_mult: jnp.ndarray,  # () search radius multiplier (th)
    scale_factor: jnp.ndarray,
    n_levels: int,
    max_dist: int = matching.TH_HIGH,
    nn_ratio: float = 0.9,
    do_pose_opt: bool = True,
):
    """SearchByProjection(+frustum gates) + PoseOptimization in one program.

    Returns (PoseOptResult, mp->kp match idx (P,), match valid (P,)).
    """
    opt, res, keep, in_frustum = _project_match_opt(
        cam, Tcw_pred, mp_pos, mp_desc, mp_valid, mp_normal, mp_dmin,
        mp_dmax, kp_xy, kp_desc, kp_octave, kp_valid, kp_ur,
        radius_mult, scale_factor, n_levels, max_dist, nn_ratio, do_pose_opt,
    )
    # One packed result vector so the host needs a single D2H transfer per
    # frame: [Tcw(16), n_inliers(1), inliers(P), mp->kp idx(P), match(P),
    # in_frustum(P)] — the frustum mask feeds the found/visible statistics
    # (†SearchLocalPoints increments visible for every frustum candidate)
    packed = jnp.concatenate([
        opt.Tcw.reshape(-1),
        opt.n_inliers.astype(jnp.float32)[None],
        opt.inliers.astype(jnp.float32),
        jnp.where(keep, res.idx, -1).astype(jnp.float32),
        keep.astype(jnp.float32),
        (mp_valid & in_frustum).astype(jnp.float32),
    ])
    return opt, jnp.where(keep, res.idx, -1), keep, packed


def _fused_cascade(
    cam: Camera,
    Tcw_pred: jnp.ndarray,
    mp_pos: jnp.ndarray,
    mp_desc: jnp.ndarray,
    mp_valid: jnp.ndarray,
    mp_normal: jnp.ndarray,
    mp_dmin: jnp.ndarray,
    mp_dmax: jnp.ndarray,
    kp_xy: jnp.ndarray,
    kp_desc: jnp.ndarray,
    kp_octave: jnp.ndarray,
    kp_valid: jnp.ndarray,
    kp_ur: jnp.ndarray,
    kp_depth: jnp.ndarray,        # (N,) measured depth (<=0 where none)
    th_depth: jnp.ndarray,        # () close/far split (ThDepth * baseline)
    radius: jnp.ndarray,          # () motion-model search radius
    scale_factor: jnp.ndarray,
    n_levels: int,
    min_inliers_track: int,
):
    """The ENTIRE per-frame tracking cascade as ONE program / ONE D2H.

    Fuses the round-1 host sequence (motion pass -> wide retry -> local-map
    pass -> tight pass, each a separate dispatch + transfer) so a frame costs
    exactly two kernel launches (extractor + this) and one packed D2H —
    the §7.1 design stance carried to its conclusion; on relay-attached
    TPU hosts this removes ~3 RTTs/frame of latency.

    The wide retry (†TrackWithMotionModel doubles th and rematches) runs
    under lax.cond so its cost is only paid when the first pass fails.
    """

    def run(Tcw, r, do_opt=True):
        return _project_match_opt(
            cam, Tcw, mp_pos, mp_desc, mp_valid, mp_normal, mp_dmin,
            mp_dmax, kp_xy, kp_desc, kp_octave, kp_valid, kp_ur,
            r, scale_factor, n_levels, matching.TH_HIGH, 0.9, do_opt,
        )

    opt1, _, _, _ = run(Tcw_pred, radius)

    def retry(_):
        o, _, _, _ = run(Tcw_pred, 2.0 * radius)
        return o.Tcw, o.n_inliers

    def keep1(_):
        return opt1.Tcw, opt1.n_inliers

    Tcw1, n_motion = jax.lax.cond(
        opt1.n_inliers < min_inliers_track, retry, keep1, operand=None
    )

    # local-map pass at the refined pose, then a tight re-match pass; keep
    # whichever admits more inliers (measured win on rotation-heavy paths)
    opt2, res2, keep2, frustum2 = run(Tcw1, jnp.float32(4.0))
    opt3, res3, keep3, frustum3 = run(opt2.Tcw, jnp.float32(2.0))
    use3 = opt3.n_inliers >= opt2.n_inliers
    Tcw = jnp.where(use3, opt3.Tcw, opt2.Tcw)
    n_final = jnp.where(use3, opt3.n_inliers, opt2.n_inliers)
    inl = jnp.where(use3, opt3.inliers, opt2.inliers)
    kp_of_mp = jnp.where(
        use3, jnp.where(keep3, res3.idx, -1), jnp.where(keep2, res2.idx, -1)
    )
    frustum = frustum2  # the canonical per-frame frustum (refined pose)

    # Close-point census for the keyframe decision (†NeedNewKeyFrame
    # nTrackedClose / nNonTrackedClose): computed here so the host never
    # pulls the full depth/valid arrays at frame rate — two scalars ride
    # the packed D2H instead (on relay rigs the two array pulls cost more
    # than the entire tracking dispatch).
    N = kp_xy.shape[0]
    tracked_row = inl & (kp_of_mp >= 0)
    scatter_to = jnp.where(tracked_row, kp_of_mp, N)  # N = spill slot
    kp_tracked = (
        jnp.zeros((N + 1,), bool).at[scatter_to].max(tracked_row)[:N]
    )
    close = kp_valid & (kp_depth > 0) & (kp_depth < th_depth)
    n_tracked_close = jnp.sum((close & kp_tracked).astype(jnp.int32))
    n_untracked_close = jnp.sum((close & ~kp_tracked).astype(jnp.int32))

    # Per-point (inl, kp_of_mp, frustum) packed into ONE small integer each
    # ((idx+1)<<2 | inl<<1 | frustum — exact in f32 for any idx < 2^22), so
    # the per-frame D2H is 20+P floats instead of 20+3P: on relay-attached
    # rigs this transfer is the frame's largest pull and bounds how far the
    # local-map capacity can be raised.
    code = (
        (kp_of_mp + 1) * 4
        + inl.astype(jnp.int32) * 2
        + (mp_valid & frustum).astype(jnp.int32)
    )
    packed = jnp.concatenate([
        Tcw.reshape(-1),
        n_motion.astype(jnp.float32)[None],
        n_final.astype(jnp.float32)[None],
        n_tracked_close.astype(jnp.float32)[None],
        n_untracked_close.astype(jnp.float32)[None],
        code.astype(jnp.float32),
    ])
    return packed, Tcw


@functools.partial(
    jax.jit, static_argnames=("n_levels", "min_inliers_track")
)
def track_frame_fused(
    cam: Camera,
    Tcw_pred: jnp.ndarray,
    mp_pos: jnp.ndarray,
    mp_desc: jnp.ndarray,
    mp_valid: jnp.ndarray,
    mp_normal: jnp.ndarray,
    mp_dmin: jnp.ndarray,
    mp_dmax: jnp.ndarray,
    kp_xy: jnp.ndarray,
    kp_desc: jnp.ndarray,
    kp_octave: jnp.ndarray,
    kp_valid: jnp.ndarray,
    kp_ur: jnp.ndarray,
    kp_depth: jnp.ndarray,
    th_depth: jnp.ndarray,
    radius: jnp.ndarray,
    scale_factor: jnp.ndarray,
    n_levels: int,
    min_inliers_track: int,
):
    """Host-predicted variant: prediction/radius supplied by the caller."""
    packed, _ = _fused_cascade(
        cam, Tcw_pred, mp_pos, mp_desc, mp_valid, mp_normal, mp_dmin,
        mp_dmax, kp_xy, kp_desc, kp_octave, kp_valid, kp_ur, kp_depth,
        th_depth, radius, scale_factor, n_levels, min_inliers_track,
    )
    return packed


@functools.partial(
    jax.jit, static_argnames=("n_levels", "min_inliers_track")
)
def track_frame_fused_chained(
    cam: Camera,
    Tcw_prev: jnp.ndarray,   # (4,4) previous frame pose — may be IN FLIGHT
    Tcw_prev2: jnp.ndarray,  # (4,4) pose before that (velocity reference)
    have_motion: jnp.ndarray,  # () bool: motion model valid
    mp_pos: jnp.ndarray,
    mp_desc: jnp.ndarray,
    mp_valid: jnp.ndarray,
    mp_normal: jnp.ndarray,
    mp_dmin: jnp.ndarray,
    mp_dmax: jnp.ndarray,
    kp_xy: jnp.ndarray,
    kp_desc: jnp.ndarray,
    kp_octave: jnp.ndarray,
    kp_valid: jnp.ndarray,
    kp_ur: jnp.ndarray,
    kp_depth: jnp.ndarray,
    th_depth: jnp.ndarray,
    base_radius: jnp.ndarray,
    scale_factor: jnp.ndarray,
    n_levels: int,
    min_inliers_track: int,
):
    """Device-chained variant: the motion-model prediction is computed ON
    DEVICE from the previous dispatch's (possibly still in-flight) pose
    output, so the host never has to block on frame k-1's D2H before
    dispatching frame k. This removes the last per-frame round-trip
    dependency of the pipelined tracker (†TrackWithMotionModel's
    `mVelocity*mLastFrame.mTcw` prediction, hoisted into the program).

    Returns (packed, Tcw) — Tcw stays on device to seed the next call.
    """
    # Re-project both chain links onto SE(3) before inverting: the chain is
    # a product of hundreds of f32 pose compositions and the closed-form
    # rigid inverse amplifies any off-manifold drift ~2x per frame
    # (measured divergence x2.4/frame without this).
    Tcw_prev = geo.se3_orthonormalize(Tcw_prev)
    Tcw_prev2 = geo.se3_orthonormalize(Tcw_prev2)
    vel = Tcw_prev @ geo.se3_inverse(Tcw_prev2)
    Tcw_pred = jnp.where(have_motion, vel @ Tcw_prev, Tcw_prev)
    radius = jnp.where(have_motion, base_radius, 2.0 * base_radius)
    packed, Tcw = _fused_cascade(
        cam, Tcw_pred, mp_pos, mp_desc, mp_valid, mp_normal, mp_dmin,
        mp_dmax, kp_xy, kp_desc, kp_octave, kp_valid, kp_ur, kp_depth,
        th_depth, radius, scale_factor, n_levels, min_inliers_track,
    )
    return packed, geo.se3_orthonormalize(Tcw)


@jax.jit
def _rgbd_virtual_right(depth_map, kp_xy_raw, kp_xy_undist, valid, bf):
    """Sample the depth map at keypoint locations and derive the virtual
    right coordinate (†Frame::ComputeStereoFromRGBD) — fully on device, so
    the per-frame traffic is one H2D of the depth image and no D2H."""
    H, W = depth_map.shape
    xi = jnp.clip(jnp.round(kp_xy_raw[:, 0]).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(kp_xy_raw[:, 1]).astype(jnp.int32), 0, H - 1)
    d = depth_map.reshape(-1)[yi * W + xi]
    ok = valid & (d > 0)
    dep = jnp.where(ok, d, -1.0)
    ur = jnp.where(ok, kp_xy_undist[:, 0] - bf / jnp.maximum(d, 1e-6), -1.0)
    return ur, dep


@functools.partial(jax.jit, static_argnames=("stride",))
def _rgbd_virtual_right_u16(depth_u16, depth_scale, kp_xy_raw, kp_xy_undist,
                            valid, bf, stride: int = 1):
    """u16-quantized variant: dequantize on device after the (4x smaller)
    H2D transfer. With stride > 1 the uploaded map is host-subsampled
    (depth[::stride, ::stride]) and sampled nearest-neighbor here."""
    H, W = depth_u16.shape
    inv = 1.0 / float(stride)
    xi = jnp.clip(jnp.round(kp_xy_raw[:, 0] * inv).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(kp_xy_raw[:, 1] * inv).astype(jnp.int32), 0, H - 1)
    d = depth_u16.reshape(-1)[yi * W + xi].astype(jnp.float32) * depth_scale
    ok = valid & (d > 0)
    dep = jnp.where(ok, d, -1.0)
    ur = jnp.where(ok, kp_xy_undist[:, 0] - bf / jnp.maximum(d, 1e-6), -1.0)
    return ur, dep


@functools.partial(jax.jit, static_argnames=("nn_ratio",))
def match_frames_windowed(
    desc_a, xy_a, angle_a, valid_a, desc_b, xy_b, angle_b, valid_b, window,
    nn_ratio=0.9,
):
    """SearchForInitialization: windowed + ratio + rotation-checked match."""
    pair = matching.radius_gate(
        xy_a, xy_b, jnp.full((xy_a.shape[0],), window, xy_a.dtype)
    )
    return matching.match_descriptors(
        desc_a, desc_b, valid_a, valid_b, pair_mask=pair,
        max_dist=matching.TH_LOW, nn_ratio=nn_ratio,
        angles_a=angle_a, angles_b=angle_b, check_rotation=True, mutual=True,
    )


# ---------------------------------------------------------------------------
# Tracker
# ---------------------------------------------------------------------------

class Tracker:
    def __init__(self, cfg: SlamConfig, slam_map: MapState, kfdb=None):
        self.cfg = cfg
        self.map = slam_map
        self.kfdb = kfdb  # keyframe database (relocalization); optional
        cc = cfg.camera
        self.cam = Camera.create(
            cc.fx, cc.fy, cc.cx, cc.cy, cc.k1, cc.k2, cc.p1, cc.p2, cc.k3,
            bf=cc.bf, width=cc.width, height=cc.height,
        )
        self.extractor = orb.OrbExtractor(cfg.extractor, cc.height, cc.width)
        # cached host scalars: going through the Camera pytree fields costs
        # a blocking D2H pull per access on relay rigs, and several sat on
        # per-frame paths
        self._has_distortion = self.cam.has_distortion
        self._fx, self._fy = float(cc.fx), float(cc.fy)
        self._cx, self._cy = float(cc.cx), float(cc.cy)
        self._bf = float(cc.bf)
        self._baseline = float(cc.bf) / max(float(cc.fx), 1e-8)
        # Monocular initialization uses 2x features (†Tracking ctor)
        self.state = TrackingState.NO_IMAGES_YET
        self.velocity: Optional[np.ndarray] = None
        self.last_frame: Optional[FrameData] = None
        self.init_ref: Optional[FrameData] = None
        self.ref_kf: int = -1
        self.last_kf_frame_id: int = -1000
        self.frame_id: int = 0       # frames finalized (monotone)
        self._next_frame_id: int = 0  # frames created (≥ frame_id: pipelining)
        self.n_inliers_last: int = 0
        self.n_tracked_close: int = 0     # device-computed close-point census
        self.n_untracked_close: int = 0   # (refreshed by _unpack_fused)
        self.local_point_cap = int(cfg.tracking.local_map_point_cap)
        self._rng = np.random.default_rng(cfg.runtime.seed)
        # trajectory log: (frame_id, timestamp, Tcw) for every tracked frame
        self.trajectory: List[Tuple[int, float, np.ndarray]] = []
        self.metrics: List[dict] = []
        self.metrics_log = None  # optional utils.telemetry.MetricsLog
        self.localization_only = False  # no keyframes / no map growth
        self.mapping_busy = lambda: False  # async back-pressure hook
        # seconds one keyframe costs the mapper (0 = unknown); paces c1b
        self.mapping_kf_cost = lambda: 0.0
        self.reset_requested = False  # set on loss right after init
        self.pending_keyframes: List[int] = []  # drained by the system layer
        # pipelined tracking: FIFO of in-flight dispatched frames (up to
        # runtime.pipeline_depth entries) + the device-resident pose chain
        # (Tcw_prev, Tcw_prev2) feeding track_frame_fused_chained
        self._pending: "collections.deque" = collections.deque()
        # Background D2H puller: on relay-attached rigs np.asarray of the
        # packed result costs a full ~25 ms link RTT even long after the
        # device finished (copy_to_host_async does not pre-populate the
        # host cache there) — measured as the single largest per-frame cost
        # (28 ms median of a 45 ms frame). A one-thread executor performs
        # the blocking pull off the dispatch thread; commits consume the
        # prefetched numpy, and the elastic probe becomes future.done() —
        # true TRANSFER completion, not just device-compute completion.
        import concurrent.futures

        self._puller = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="d2h-pull"
        )
        self._neg_ones: Optional[jnp.ndarray] = None  # shared -1 fill
        self._chain: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
        self._fallback_used = False  # set when _finish_track took the BoW path
        # live-pose contract bookkeeping: frames the pose returned by the
        # last track_pipelined call lagged behind its dispatched frame
        # (0 = same frame, i.e. the synchronous path)
        self.pose_lag = 0
        # device-resident scalar constants for the per-frame dispatch:
        # jnp.float32(x) at call time is a fresh H2D upload per frame; on
        # relay-attached rigs every operation costs link processing, so the
        # constants are uploaded once here
        self._dev_scalars = dict(
            th_depth=jnp.float32(cfg.camera.th_depth * self._baseline),
            radius=jnp.float32(cfg.tracking.motion_model_radius),
            scale_factor=jnp.float32(cfg.extractor.scale_factor),
            true_=jnp.asarray(True),
            false_=jnp.asarray(False),
        )

    # ------------------------------------------------------------------
    def _make_frame(self, img: np.ndarray, timestamp: float,
                    depth_map: Optional[np.ndarray] = None,
                    right_img: Optional[np.ndarray] = None) -> FrameData:
        feats = self.extractor(img)
        xy_dev = feats.xy
        if self._has_distortion:
            xy_dev = undistort_points(self.cam, feats.xy)
        n = feats.xy.shape[0]
        if self._neg_ones is None or self._neg_ones.shape[0] != n:
            # constant fill shared across frames (jax arrays are immutable;
            # two fewer per-frame device allocations)
            self._neg_ones = jnp.full((n,), -1.0, jnp.float32)
        dev = dict(
            xy=xy_dev, desc=feats.desc, octave=feats.octave,
            angle=feats.angle, valid=feats.valid,
            ur=self._neg_ones,
            depth=self._neg_ones,
        )
        if right_img is not None:
            # stereo: extract right features and match along epipolar rows
            from .ops import stereo

            feats_r = self.extractor(right_img)
            sf = jnp.asarray(
                np.asarray(self.cfg.extractor.scale_factors, np.float32)
            )
            ur_j, dep_j = stereo.stereo_match(
                feats, feats_r, self.cam.bf,
                jnp.float32(self._baseline),
                sf,
            )
            dev["ur"], dev["depth"] = stereo.subpixel_refine(
                jnp.asarray(img, jnp.float32),
                jnp.asarray(right_img, jnp.float32),
                feats.xy, ur_j, dep_j > 0, self.cam.bf,
            )
        elif depth_map is not None:
            # quantize to u16 millimeters on host: 4x fewer H2D bytes (the
            # depth image is the largest per-frame transfer on
            # relay-attached rigs); 1 mm resolution out to 65 m is below
            # any RGB-D sensor's noise floor
            d = np.asarray(depth_map, np.float32)
            scale = np.float32(1e3)
            stride = max(int(self.cfg.runtime.depth_upload_stride), 1)
            if stride > 1:  # subsample FIRST: stride^2 x less host math
                d = d[::stride, ::stride]
            d_u16 = np.where(
                (d > 0) & (d * scale < 65535.0), d * scale, 0.0
            ).astype(np.uint16)
            dev["ur"], dev["depth"] = _rgbd_virtual_right_u16(
                jnp.asarray(d_u16), jnp.float32(1.0 / scale), feats.xy,
                xy_dev, feats.valid, self.cam.bf, stride=stride,
            )
        fid = self._next_frame_id
        self._next_frame_id += 1
        return FrameData(fid, timestamp, dev, n)

    # ------------------------------------------------------------------
    def track(self, img: np.ndarray, timestamp: float,
              depth_map: Optional[np.ndarray] = None,
              right_img: Optional[np.ndarray] = None) -> Optional[np.ndarray]:
        """Process one frame; returns Tcw when tracked (else None)."""
        t_start = time.perf_counter()
        frame = self._make_frame(img, timestamp, depth_map, right_img)
        return self._track_core(frame, t_start)

    def _track_core(self, frame: FrameData,
                    t_start: float) -> Optional[np.ndarray]:
        new_kf = None
        # synchronous excursions drive the pose from host state; the device
        # chain is stale the moment one runs
        self._chain = None

        if self.state == TrackingState.NO_IMAGES_YET:
            self.state = TrackingState.NOT_INITIALIZED

        if self.state == TrackingState.NOT_INITIALIZED:
            if self.cfg.sensor != "monocular":
                ok = self._initialize_rgbd(frame)
            else:
                ok = self._initialize_monocular(frame)
            if ok:
                self.state = TrackingState.OK
                # (measured: routing the init keyframe through the mapping
                # stage DEGRADES the fresh two-view map — A/B ATE 0.083 vs
                # 0.048 — the free-scale local BA + culling are too
                # aggressive for a 2-KF map, so unlike the reference we do
                # not run a post-init BA)
        else:
            if self.state == TrackingState.LOST:
                ok = self._relocalize(frame)
            else:
                ok = self._track_frame(frame)
            new_kf = self._handle_result(frame, ok)

        self._finalize_frame(frame, new_kf, t_start)
        return frame.Tcw

    def _handle_result(self, frame: FrameData, ok: bool) -> Optional[int]:
        """State transition + keyframe decision after a tracking attempt."""
        new_kf = None
        if ok:
            self.state = TrackingState.OK
            if not self.localization_only and self._need_new_keyframe(frame):
                new_kf = self._create_keyframe(frame)
        else:
            self.state = TrackingState.LOST
            # †Tracking ≈L430-440: lost right after initialization means
            # the bootstrap map is junk — request a full system reset
            # instead of trying to relocalize against it
            if (not self.localization_only
                    and int(self.map.kf_valid.sum()) <= 5):
                self.reset_requested = True
        return new_kf

    def _finalize_frame(self, frame: FrameData, new_kf: Optional[int],
                        t_start: float):
        """Trajectory/velocity/metrics bookkeeping once a frame's result is
        known (immediately in synchronous mode; one call later in pipelined
        mode)."""
        if frame.Tcw is not None:
            self.trajectory.append(
                (frame.frame_id, frame.timestamp, frame.Tcw.copy())
            )
        if self.last_frame is not None and frame.Tcw is not None and \
                self.last_frame.Tcw is not None:
            self.velocity = frame.Tcw @ np.linalg.inv(self.last_frame.Tcw)
        elif frame.Tcw is None:
            self.velocity = None  # motion model invalid across a loss
        self.last_frame = frame
        self.frame_id = frame.frame_id + 1
        if new_kf is not None:
            # queue, not scalar: in pipelined mode one call can finalize two
            # frames (the committed pending frame + a synchronous fallback),
            # and both may produce keyframes
            self.pending_keyframes.append(new_kf)
        if self.metrics_log is not None:
            self.metrics_log.emit(
                frame=frame.frame_id,
                state=self.state.name,
                inliers=self.n_inliers_last,
                kf=new_kf if new_kf is not None else -1,
                track_ms=round((time.perf_counter() - t_start) * 1000, 2),
            )

    # ------------------------------------------------------------------
    # Pipelined tracking: commit one frame behind the dispatch
    # ------------------------------------------------------------------
    def track_pipelined(self, img: np.ndarray, timestamp: float,
                        depth_map: Optional[np.ndarray] = None,
                        right_img: Optional[np.ndarray] = None,
                        ) -> Optional[np.ndarray]:
        """Software-pipelined variant of track(): dispatch this frame's
        device work, retire the oldest in-flight frame(s), and return the
        FRESHEST COMMITTED POSE. The returned pose lags the dispatched frame
        by between ``runtime.pipeline_depth`` and
        ``runtime.pipeline_depth_max`` frames (``self.pose_lag`` records the
        exact lag of the value just returned); it is ``None`` only before
        initialization or across a tracking loss. Per-frame
        (frame_id, timestamp, pose) association is exact in
        ``self.trajectory`` once frames commit.

        On hosts where the device link has significant round-trip latency
        (relay-attached TPU: ~30 ms/RTT) the synchronous track() pays one
        blocking D2H pull per frame; here the pull was started asynchronously
        at dispatch time one call ago, so by commit time the bytes are
        already on the host and the steady-state cost per frame is just the
        H2D uploads + host bookkeeping. Initialization, relocalization, and
        loss handling drop back to the synchronous path (they need the
        frame's result immediately to decide control flow).
        """
        t_start = time.perf_counter()
        # uploads + extraction first: they do not depend on the previous
        # frame's pose (and in the chained path neither does the tracking
        # dispatch itself)
        frame = self._make_frame(img, timestamp, depth_map, right_img)
        if self.state in (TrackingState.NO_IMAGES_YET,
                          TrackingState.NOT_INITIALIZED,
                          TrackingState.LOST):
            # control-flow states need this frame's result now
            self.flush_pipeline()
            self.pose_lag = 0
            return self._track_core(frame, t_start)
        # dispatch FIRST (device-chained prediction breaks the data
        # dependency on the previous frame's committed pose), THEN retire
        # the oldest in-flight frame: by its commit the device has had the
        # whole make_frame + dispatch span to finish its work, so the
        # blocking D2H pull is a cache read, not a wait
        sel, packed = self._dispatch_track_chained(frame)
        fut = self._puller.submit(np.asarray, packed)
        self._pending.append((frame, sel, fut, t_start))
        depth = max(int(self.cfg.runtime.pipeline_depth), 1)
        depth_max = max(int(self.cfg.runtime.pipeline_depth_max), depth)
        # elastic commit: beyond the minimum depth, retire a frame only if
        # its packed result has LANDED on the host (future.done() — the
        # background puller thread performed the blocking D2H, so this
        # probes actual transfer completion). When the link is slow (shared
        # relay in bad weather) the queue stretches toward depth_max
        # instead of stalling the dispatch thread on a pull; depth_max
        # bounds commit latency and forces a blocking commit so the queue
        # cannot grow without bound. The trade-off while stretched:
        # keyframe insertion and LOST detection lag up to depth_max frames
        # behind dispatch (the fused cascade still tracks each frame
        # against the device-resident local map; only the HOST decisions
        # lag), and the broken-chain fallback in _commit_pending_one
        # re-tracks in-flight frames if a stretched commit turns out
        # rejected.
        while len(self._pending) > depth_max:
            self._commit_pending_one()
        while len(self._pending) > depth:
            if not self._pending[0][2].done():
                break
            self._commit_pending_one()
        # live-pose contract (stream node / AR clients): whether or not a
        # frame retired this call, return the freshest committed estimate
        # rather than None — a live caller gets a pose for every frame
        # after initialization, tagged with its lag.
        if self.last_frame is not None and self.last_frame.Tcw is not None:
            self.pose_lag = frame.frame_id - self.last_frame.frame_id
            return self.last_frame.Tcw
        self.pose_lag = 0
        return None

    def _commit_pending_one(self) -> Optional[np.ndarray]:
        if not self._pending:
            return None
        frame, sel, fut, t_start = self._pending.popleft()
        packed = fut.result()  # prefetched numpy; blocks only if in flight
        self._fallback_used = False
        ok = self._finish_track(frame, sel, packed)
        new_kf = self._handle_result(frame, ok)
        self._finalize_frame(frame, new_kf, t_start)
        if self._fallback_used and self._pending:
            # The committed frame's fused result was rejected: every frame
            # still in flight was predicted off the same broken pose chain.
            # Re-track them synchronously in order with host predictions
            # (their device features are still resident — a re-dispatch, not
            # a re-extraction). Rare path; correctness over throughput here.
            self._chain = None
            stale = list(self._pending)
            self._pending.clear()
            for f2, _, _, t2 in stale:
                self._track_core(f2, t2)
        return frame.Tcw

    def flush_pipeline(self) -> Optional[np.ndarray]:
        """Commit ALL in-flight pipelined frames (call before reading
        trajectory/state at shutdown or on a control-flow transition)."""
        pose = None
        while self._pending:
            pose = self._commit_pending_one()
        return pose

    # ------------------------------------------------------------------
    # Initialization
    # ------------------------------------------------------------------
    def _initialize_monocular(self, frame: FrameData) -> bool:
        if self.init_ref is None or self.init_ref.valid.sum() < 100:
            self.init_ref = frame
            return False
        ref = self.init_ref
        res = match_frames_windowed(
            ref.dev["desc"], ref.dev["xy"], ref.dev["angle"], ref.dev["valid"],
            frame.dev["desc"], frame.dev["xy"], frame.dev["angle"],
            frame.dev["valid"], jnp.float32(100.0), nn_ratio=0.9,
        )
        m_valid = np.asarray(res.valid)
        m_idx = np.asarray(res.idx)
        if m_valid.sum() < 100:
            self.init_ref = frame  # reference too stale, restart
            return False

        x1 = ref.xy
        x2 = np.where(m_valid[:, None], frame.xy[np.maximum(m_idx, 0)], 0.0)
        vidx = np.where(m_valid)[0]
        # distinct correspondences per minimal set (duplicates make the H/F
        # fits degenerate and waste hypotheses); one vectorized argsort draw
        order = np.argsort(
            self._rng.random((N_ITERS, len(vidx))), axis=1
        )[:, :8]
        samples = vidx[order].astype(np.int32)
        init_res = initialize_two_view(
            jnp.asarray(x1.astype(np.float32)), jnp.asarray(x2.astype(np.float32)),
            jnp.asarray(m_valid), self.cam.K, jnp.asarray(samples),
        )
        if not bool(init_res.success):
            return False

        good = np.asarray(init_res.good)
        pts3d = np.array(init_res.points3d)  # writable copies
        T21 = np.array(init_res.T21)

        # Normalize scale: median depth -> 1 (†CreateInitialMapMonocular)
        med_depth = float(np.median(pts3d[good][:, 2]))
        if med_depth <= 0:
            return False
        pts3d = pts3d / med_depth
        T21[:3, 3] /= med_depth

        m = self.map
        kf0 = m.add_keyframe(
            np.eye(4, dtype=np.float32), ref.xy, ref.desc, ref.octave, ref.angle,
            ref.valid, ref.frame_id, ref.timestamp, ur=ref.ur, depth=ref.depth,
        )
        kf1 = m.add_keyframe(
            T21.astype(np.float32), frame.xy, frame.desc, frame.octave,
            frame.angle, frame.valid, frame.frame_id, frame.timestamp,
            ur=frame.ur, depth=frame.depth,
        )
        new_mps = []
        for i in np.where(good)[0]:
            mp = m.add_map_point(pts3d[i], kf0)
            m.add_observation(mp, kf0, int(i))
            m.add_observation(mp, kf1, int(m_idx[i]))
            frame.mp[m_idx[i]] = mp
            new_mps.append(mp)
        m.update_point_attributes(np.asarray(new_mps))
        m.update_connections(kf1)
        m.update_connections(kf0)

        frame.Tcw = T21
        self.ref_kf = kf1
        self.last_kf_frame_id = frame.frame_id
        self.init_ref = None
        self.n_inliers_last = len(new_mps)
        return True

    def _initialize_rgbd(self, frame: FrameData) -> bool:
        """Stereo/RGB-D init: spawn map points for all features with depth
        (†Tracking::StereoInitialization)."""
        ok = frame.valid & (frame.depth > 0)
        if ok.sum() < 100:
            return False
        m = self.map
        frame.Tcw = np.eye(4, dtype=np.float32)
        kf0 = m.add_keyframe(
            frame.Tcw, frame.xy, frame.desc, frame.octave, frame.angle,
            frame.valid, frame.frame_id, frame.timestamp, ur=frame.ur,
            depth=frame.depth,
        )
        fx = self._fx
        fy = self._fy
        cx = self._cx
        cy = self._cy
        new_mps = []
        for i in np.where(ok)[0]:
            d = frame.depth[i]
            x = (frame.xy[i, 0] - cx) / fx * d
            y = (frame.xy[i, 1] - cy) / fy * d
            mp = m.add_map_point(np.array([x, y, d], np.float32), kf0)
            m.add_observation(mp, kf0, int(i))
            frame.mp[i] = mp
            new_mps.append(mp)
        m.update_point_attributes(np.asarray(new_mps))
        m.update_connections(kf0)
        self.ref_kf = kf0
        self.last_kf_frame_id = frame.frame_id
        self.n_inliers_last = len(new_mps)
        return True

    # ------------------------------------------------------------------
    # Frame-to-map tracking
    # ------------------------------------------------------------------
    def _gather_local_points(self) -> Tuple[np.ndarray, dict]:
        """Local map = points observed by the reference KF's covisibility
        neighborhood (†UpdateLocalPoints), padded to a fixed capacity.

        Cached on (ref_kf, map version): the gather + H2D only re-runs when
        mapping actually changed the map (keyframe-rate, not frame-rate).
        """
        m = self.map
        key = (self.ref_kf, m.version)
        if getattr(self, "_local_cache_key", None) == key:
            return self._local_cache
        kfs = [self.ref_kf] + [int(k) for k in m.covisible_keyframes(self.ref_kf)]
        # id-sorted order is deliberate: when two points tie for a keypoint,
        # the matcher's tie-break prefers the lower index = the OLDER point,
        # whose position is better estimated (A/B: ATE 0.065 vs 0.089 with
        # covisibility-ordered ids on the mono benchmark)
        mp_ids = np.unique(m.kf_mp[kfs])
        mp_ids = mp_ids[mp_ids >= 0]
        mp_ids = mp_ids[m.mp_valid[mp_ids]]
        if len(mp_ids) > self.local_point_cap:
            # Overflow: prefer points observed by the reference KF and its
            # STRONGEST covisible neighbors (kfs is covisibility-ordered)
            # over blind id truncation (which dropped the newest points);
            # the kept subset is then id-sorted to preserve the
            # older-point-wins tie-break. Logged per the no-silent-caps rule.
            cat = m.kf_mp[kfs].ravel()  # row-major = priority order
            cat = cat[cat >= 0]
            _, first = np.unique(cat, return_index=True)
            ordered = cat[np.sort(first)]
            ordered = ordered[m.mp_valid[ordered]]
            n_drop = len(ordered) - self.local_point_cap
            mp_ids = np.sort(ordered[: self.local_point_cap])
            print(f"[track] local map overflow: {n_drop} weakest-covis "
                  f"points dropped (cap {self.local_point_cap})")
        P = self.local_point_cap
        sel = np.zeros(P, np.int64)
        sel[: len(mp_ids)] = mp_ids
        valid = np.zeros(P, bool)
        valid[: len(mp_ids)] = True
        buf = dict(
            pos=jnp.asarray(m.mp_pos[sel]),
            desc=jnp.asarray(m.mp_desc[sel]),
            valid=jnp.asarray(valid),
            normal=jnp.asarray(m.mp_normal[sel]),
            dmin=jnp.asarray(m.mp_dmin[sel]),
            dmax=jnp.asarray(m.mp_dmax[sel]),
        )
        self._local_cache_key = key
        self._local_cache = (sel, buf)
        self._local_n_used = len(mp_ids)
        return sel, buf

    def _augment_vo_points(self, sel: np.ndarray, buf: dict):
        """Localization-mode visual-odometry points (†Tracking::UpdateLastFrame
        ≈L760-800): unproject the last frame's close unmatched stereo/RGB-D
        depths into TEMPORARY points occupying the free tail of the local
        buffer (sel id -1 — never committed to the map), so tracking survives
        regions the saved map covers sparsely."""
        lf = self.last_frame
        if (lf is None or lf.Tcw is None or lf.depth is None
                or not (lf.depth > 0).any()):
            return sel, buf
        n_used = getattr(self, "_local_n_used", int(np.count_nonzero(sel)))
        free = self.local_point_cap - n_used
        if free <= 0:
            return sel, buf
        cand = np.where(lf.valid & (lf.depth > 0) & (lf.mp < 0))[0]
        if len(cand) == 0:
            return sel, buf
        th_depth = self.cfg.camera.th_depth * float(
            self._baseline)
        order = cand[np.argsort(lf.depth[cand])]
        close = order[lf.depth[order] < th_depth]
        # close points, or the nearest 100 when the scene is all-far
        # (†UpdateLastFrame nPoints>100 cutoff)
        spawn = (close if len(close) >= 100 else order[:100])[:free]
        if len(spawn) == 0:
            return sel, buf
        Twc = np.linalg.inv(lf.Tcw)
        fx = self._fx; fy = self._fy
        cx = self._cx; cy = self._cy
        d = lf.depth[spawn][:, None]
        pc = np.concatenate(
            [(lf.xy[spawn, :1] - cx) / fx * d,
             (lf.xy[spawn, 1:2] - cy) / fy * d, d], axis=1).astype(np.float32)
        pw = pc @ Twc[:3, :3].T + Twc[:3, 3]
        center = Twc[:3, 3]
        dist = np.linalg.norm(pw - center, axis=1)
        normal = (pw - center) / np.maximum(dist, 1e-9)[:, None]
        # pad the splice to a power-of-two bucket: a raw len(spawn)-shaped
        # scatter retraces SIX fresh programs for every distinct count —
        # localization mode then compiles per FRAME (~0.5-1 s each on relay
        # rigs, observed as a multi-second-per-frame stall). Pad rows write
        # valid=False into the (already invalid) free tail, a semantic no-op.
        S = len(spawn)
        B = 128
        while B < S:
            B *= 2
        B = min(B, free)
        S = min(S, B)
        rows = np.arange(n_used, n_used + S)
        rows_p = np.arange(n_used, n_used + B)
        pw_p = np.zeros((B, 3), np.float32)
        pw_p[:S] = pw[:S]
        desc_p = np.zeros((B, 32), np.uint8)
        desc_p[:S] = lf.desc[spawn[:S]]
        nrm_p = np.zeros((B, 3), np.float32)
        nrm_p[:S] = normal[:S]
        dist_p = np.ones(B, np.float32)
        dist_p[:S] = dist[:S]
        ok_p = np.zeros(B, bool)
        ok_p[:S] = True
        idx = jnp.asarray(rows_p)
        buf = dict(
            pos=buf["pos"].at[idx].set(jnp.asarray(pw_p)),
            desc=buf["desc"].at[idx].set(jnp.asarray(desc_p)),
            valid=buf["valid"].at[idx].set(jnp.asarray(ok_p)),
            normal=buf["normal"].at[idx].set(jnp.asarray(nrm_p)),
            dmin=buf["dmin"].at[idx].set(jnp.asarray(dist_p / 2.0)),
            dmax=buf["dmax"].at[idx].set(jnp.asarray(dist_p * 2.0)),
        )
        sel = sel.copy()
        sel[rows] = -1
        return sel, buf

    def _run_track_kernel(self, frame, Tcw_pred, buf, radius, max_dist, nn_ratio,
                          do_pose_opt=True):
        cfg = self.cfg.extractor
        return track_against_points(
            self.cam, jnp.asarray(Tcw_pred),
            buf["pos"], buf["desc"], buf["valid"], buf["normal"],
            buf["dmin"], buf["dmax"],
            frame.dev["xy"], frame.dev["desc"],
            frame.dev["octave"], frame.dev["valid"], frame.dev["ur"],
            jnp.float32(radius), jnp.float32(cfg.scale_factor), cfg.n_levels,
            max_dist=max_dist, nn_ratio=nn_ratio, do_pose_opt=do_pose_opt,
        )

    def _unpack(self, packed):
        """Split the kernel's packed result (single D2H transfer)."""
        p = np.asarray(packed)
        P = self.local_point_cap
        Tcw = p[:16].reshape(4, 4).astype(np.float32)
        n_inl = int(p[16])
        inl = p[17: 17 + P] > 0.5
        kp_of_mp = p[17 + P: 17 + 2 * P].astype(np.int32)
        mvalid = p[17 + 2 * P: 17 + 3 * P] > 0.5
        frustum = p[17 + 3 * P:] > 0.5
        return Tcw, n_inl, inl, kp_of_mp, mvalid, frustum

    def _unpack_fused(self, packed):
        """Split track_frame_fused's packed result (the frame's single D2H).

        The per-point tail is one code per local-map point:
        (kp_idx+1)<<2 | inlier<<1 | frustum (see _fused_cascade).
        """
        p = np.asarray(packed)
        Tcw = p[:16].reshape(4, 4).astype(np.float32)
        n_motion = int(p[16])
        n_final = int(p[17])
        self.n_tracked_close = int(p[18])
        self.n_untracked_close = int(p[19])
        code = p[20:].astype(np.int32)
        kp_of_mp = (code >> 2) - 1
        inl = (code & 2) > 0
        frustum = (code & 1) > 0
        return Tcw, n_motion, n_final, inl, kp_of_mp, frustum

    def _dispatch_track(self, frame: FrameData):
        """Dispatch the fused tracking cascade for one frame (non-blocking).

        Returns (sel, packed): the local-map id selection and the packed
        device result. The packed D2H copy is started asynchronously, so a
        caller that commits one frame behind (track_pipelined) pays zero
        round-trip latency for the pull.
        """
        m = self.map
        sel, buf = self._gather_local_points()
        if self.localization_only:
            sel, buf = self._augment_vo_points(sel, buf)

        # --- motion model prediction (fall back to last pose)
        if self.velocity is not None and self.last_frame.Tcw is not None:
            Tcw_pred = self.velocity @ self.last_frame.Tcw
            radius = self.cfg.tracking.motion_model_radius
        else:
            Tcw_pred = (
                self.last_frame.Tcw
                if self.last_frame and self.last_frame.Tcw is not None
                else m.kf_pose[self.ref_kf]
            )
            radius = 2.0 * self.cfg.tracking.motion_model_radius

        # the whole cascade (motion pass, conditional wide retry, local-map
        # pass, tight pass) is one program + one packed D2H per frame
        cfge = self.cfg.extractor
        th_depth = self.cfg.camera.th_depth * float(
            self._baseline)
        packed = track_frame_fused(
            self.cam, jnp.asarray(Tcw_pred),
            buf["pos"], buf["desc"], buf["valid"], buf["normal"],
            buf["dmin"], buf["dmax"],
            frame.dev["xy"], frame.dev["desc"], frame.dev["octave"],
            frame.dev["valid"], frame.dev["ur"], frame.dev["depth"],
            jnp.float32(th_depth),
            jnp.float32(radius), jnp.float32(cfge.scale_factor),
            cfge.n_levels, self.cfg.tracking.min_inliers_track,
        )
        if hasattr(packed, "copy_to_host_async"):
            packed.copy_to_host_async()
        frame.prefetch_host()  # overlap feature D2H with the result pull
        return sel, packed

    def _dispatch_track_chained(self, frame: FrameData):
        """Dispatch the fused cascade with the motion-model prediction
        computed ON DEVICE from the previous dispatch's pose output.

        The pose chain (Tcw_prev, Tcw_prev2) lives on device: frame k's
        dispatch consumes frame k-1's (possibly still executing) pose output
        directly, so dispatching never blocks on a D2H. The chain is seeded
        from host state after any synchronous excursion (init, reloc,
        fallback) and reset whenever the host corrects the pose out-of-band.
        """
        sel, buf = self._gather_local_points()
        if self.localization_only:
            sel, buf = self._augment_vo_points(sel, buf)

        ds = self._dev_scalars
        if self._chain is not None:
            Tcw_prev, Tcw_prev2 = self._chain
            have_motion = ds["true_"]
        else:
            last = (
                self.last_frame.Tcw
                if self.last_frame is not None
                and self.last_frame.Tcw is not None
                else self.map.kf_pose[self.ref_kf]
            )
            Tcw_prev = jnp.asarray(np.asarray(last, np.float32))
            if self.velocity is not None:
                Tcw_prev2 = jnp.asarray(
                    (np.linalg.inv(self.velocity) @ last).astype(np.float32)
                )
                have_motion = ds["true_"]
            else:
                Tcw_prev2 = Tcw_prev
                have_motion = ds["false_"]

        cfge = self.cfg.extractor
        packed, Tcw_out = track_frame_fused_chained(
            self.cam, Tcw_prev, Tcw_prev2, have_motion,
            buf["pos"], buf["desc"], buf["valid"], buf["normal"],
            buf["dmin"], buf["dmax"],
            frame.dev["xy"], frame.dev["desc"], frame.dev["octave"],
            frame.dev["valid"], frame.dev["ur"], frame.dev["depth"],
            ds["th_depth"], ds["radius"], ds["scale_factor"],
            cfge.n_levels, self.cfg.tracking.min_inliers_track,
        )
        if hasattr(packed, "copy_to_host_async"):
            packed.copy_to_host_async()
        # start the feature D2H copies now: if this frame becomes a
        # keyframe (or an excursion needs host views) the pulls find a
        # completed copy instead of paying a fresh ~25 ms link RTT; the
        # ~60 KB/frame is noise against the link's ~700 MB/s bandwidth
        frame.prefetch_host()
        self._chain = (Tcw_out, Tcw_prev)
        return sel, packed


    def _track_frame(self, frame: FrameData) -> bool:
        sel, packed = self._dispatch_track(frame)
        return self._finish_track(frame, sel, packed)

    def _finish_track(self, frame: FrameData, sel, packed) -> bool:
        Tcw2, n_inl, n_inl2, inl, kp_of_mp, frustum = self._unpack_fused(packed)
        if (n_inl < self.cfg.tracking.min_inliers_track
                or n_inl2 < self.cfg.tracking.min_inliers_local_map):
            # BoW fallback against the reference keyframe
            # (†Tracking::TrackReferenceKeyFrame, ≈L700-740): survives
            # velocity-model breakage (jerk, dropped frames) that a wider
            # projection window cannot
            self._fallback_used = True  # pose chain no longer trustworthy
            self._chain = None
            return self._track_reference_keyframe(frame)
        self._commit_track(frame, sel, Tcw2, n_inl, n_inl2, inl, kp_of_mp,
                           frustum)
        return True

    def _commit_track(self, frame, sel, Tcw, n_motion, n_final, inl,
                      kp_of_mp, frustum):
        m = self.map
        frame.Tcw = Tcw
        frame.mp[:] = -1
        matched_rows = np.where(inl & (sel >= 0))[0]  # skip temp VO points
        frame.mp[kp_of_mp[matched_rows]] = sel[matched_rows]
        # visibility statistics for found/visible-ratio culling, reference
        # semantics (†SearchLocalPoints increments visible for every frustum
        # candidate; IncreaseFound for pose-opt inliers). Round-1's lowered
        # recall forced a matched-candidates workaround here; with the
        # recall fixes (scale band, matcher gates, subpixel, learned BRIEF)
        # the reference statistic holds without over-culling.
        m.mp_visible[sel[frustum & (sel >= 0)]] += 1
        m.mp_found[sel[matched_rows]] += 1
        self.n_inliers_last = n_final
        self.metrics.append(
            dict(frame=frame.frame_id, inliers=n_final,
                 motion_inliers=n_motion)
        )
        if len(self.metrics) > 100_000:  # bound memory on endless streams
            del self.metrics[:50_000]

    # ------------------------------------------------------------------
    # TrackReferenceKeyFrame (†Tracking::TrackReferenceKeyFrame ≈L700-740)
    # ------------------------------------------------------------------
    def _track_reference_keyframe(self, frame: FrameData) -> bool:
        """Descriptor match (the SearchByBoW analog) against the reference
        KF's map points + pose optimization from the last frame's pose, then
        the local-map cascade at the recovered pose."""
        from .ops import pose_opt as po

        m = self.map
        cand = self.ref_kf
        if cand < 0 or not m.kf_valid[cand]:
            return False
        has = m.kf_feat_valid[cand] & (m.kf_mp[cand] >= 0)
        res = matching.match_descriptors(
            jnp.asarray(frame.desc), jnp.asarray(m.kf_desc[cand]),
            jnp.asarray(frame.valid), jnp.asarray(has),
            max_dist=matching.TH_LOW, nn_ratio=0.7, mutual=True,
            angles_a=jnp.asarray(frame.angle),
            angles_b=jnp.asarray(m.kf_angle[cand]), check_rotation=True,
        )
        rv = np.asarray(res.valid)
        fidx = np.where(rv)[0]
        kidx = np.asarray(res.idx)[fidx]
        mps = m.kf_mp[cand, kidx]
        live = m.mp_valid[mps]
        fidx, mps = fidx[live], mps[live]
        if len(fidx) < 15:  # †nmatches < 15 -> fail
            return False
        Tcw0 = (self.last_frame.Tcw
                if self.last_frame is not None and self.last_frame.Tcw is not None
                else m.kf_pose[cand])
        sf = self.cfg.extractor.scale_factor
        # fixed-capacity padding: optimize_pose at the raw match count would
        # trace a fresh program per distinct N (each first dispatch stalls
        # the relay link ~0.5 s); max_keypoints matches the warmup signature
        Np = self.cfg.extractor.max_keypoints
        N = len(fidx)
        pos_p = np.zeros((Np, 3), np.float32)
        pos_p[:N] = m.mp_pos[mps]
        obs_p = np.zeros((Np, 3), np.float32)
        obs_p[:N, :2] = frame.xy[fidx]
        obs_p[:N, 2] = frame.ur[fidx]
        sig_p = np.ones(Np, np.float32)
        sig_p[:N] = sf ** (2.0 * frame.octave[fidx].astype(np.float32))
        val_p = np.zeros(Np, bool)
        val_p[:N] = True
        opt = po.optimize_pose(
            jnp.asarray(Tcw0), self.cam, jnp.asarray(pos_p),
            jnp.asarray(obs_p), jnp.asarray(sig_p), jnp.asarray(val_p),
        )
        if int(opt.n_inliers) < 10:  # †nmatchesMap < 10 -> fail
            return False
        # local-map cascade from the recovered pose (no motion model)
        sel, buf = self._gather_local_points()
        cfge = self.cfg.extractor
        packed = track_frame_fused(
            self.cam, opt.Tcw,
            buf["pos"], buf["desc"], buf["valid"], buf["normal"],
            buf["dmin"], buf["dmax"],
            frame.dev["xy"], frame.dev["desc"], frame.dev["octave"],
            frame.dev["valid"], frame.dev["ur"], frame.dev["depth"],
            jnp.float32(self.cfg.camera.th_depth
                        * self._baseline),
            jnp.float32(self.cfg.tracking.motion_model_radius),
            jnp.float32(cfge.scale_factor), cfge.n_levels,
            self.cfg.tracking.min_inliers_track,
        )
        Tcw2, n_inl, n_inl2, inl, kp_of_mp, frustum = self._unpack_fused(packed)
        if n_inl2 < self.cfg.tracking.min_inliers_local_map:
            return False
        self._commit_track(frame, sel, Tcw2, n_inl, n_inl2, inl, kp_of_mp,
                           frustum)
        return True

    # ------------------------------------------------------------------
    # Relocalization (†Tracking::Relocalization, SURVEY §3.5)
    # ------------------------------------------------------------------
    def _relocalize(self, frame: FrameData) -> bool:
        if self.kfdb is None:
            return False
        from .ops import pnp  # local import avoids cycle at module load

        m = self.map
        qbow = self.kfdb.compute_bow(frame.desc, frame.valid)
        candidates = self.kfdb.detect_relocalization_candidates(qbow)
        for cand in candidates:  # †all retrieved candidates attempted
            # BoW-style match: frame features vs candidate KF's map points
            has = m.kf_feat_valid[cand] & (m.kf_mp[cand] >= 0)
            res = matching.match_descriptors(
                jnp.asarray(frame.desc), jnp.asarray(m.kf_desc[cand]),
                jnp.asarray(frame.valid), jnp.asarray(has),
                max_dist=matching.TH_LOW, nn_ratio=0.75, mutual=True,
            )
            rv = np.asarray(res.valid)
            if rv.sum() < 15:
                continue
            fidx = np.where(rv)[0]
            kidx = np.asarray(res.idx)[fidx]
            mps = m.kf_mp[cand, kidx]
            live = m.mp_valid[mps]
            fidx, mps = fidx[live], mps[live]
            if len(fidx) < 15:
                continue
            N = len(fidx)
            sf = self.cfg.extractor.scale_factor
            samples = self._rng.integers(0, N, size=(256, pnp.SAMPLE_SIZE)).astype(np.int32)
            pr = pnp.pnp_ransac(
                self.cam, jnp.asarray(m.mp_pos[mps]),
                jnp.asarray(frame.xy[fidx].astype(np.float32)),
                jnp.asarray(sf ** (2.0 * frame.octave[fidx].astype(np.float32))),
                jnp.ones(N, bool), jnp.asarray(samples),
            )
            if not bool(pr.ok):
                continue
            # refine + top-up against the candidate's local map: a wide
            # radius-10 projection search, then — when the count lands in
            # the almost-enough band — a second, radius-3 pass from the
            # improved pose (†Relocalization's two progressively narrower
            # SearchByProjection rounds)
            self.ref_kf = cand
            sel, buf = self._gather_local_points()
            _, _, _, packed = self._run_track_kernel(
                frame, np.asarray(pr.Tcw), buf, 10.0, matching.TH_HIGH, 0.9
            )
            Tcw, n_inl, inl, kp_of_mp, _, _ = self._unpack(packed)
            required = self.cfg.tracking.min_inliers_after_reloc
            if 30 <= n_inl < required:
                _, _, _, packed = self._run_track_kernel(
                    frame, Tcw, buf, 3.0, 64, 0.9
                )
                Tcw, n_inl, inl, kp_of_mp, _, _ = self._unpack(packed)
            if n_inl < required:
                continue
            frame.Tcw = Tcw
            frame.mp[:] = -1
            rows = np.where(inl)[0]
            frame.mp[kp_of_mp[rows]] = sel[rows]
            self.n_inliers_last = n_inl
            return True
        return False

    # ------------------------------------------------------------------
    # Keyframe policy (†Tracking::NeedNewKeyFrame ≈L950-1030, full gates)
    # ------------------------------------------------------------------
    def _need_new_keyframe(self, frame: FrameData) -> bool:
        tcfg = self.cfg.tracking
        m = self.map
        since = frame.frame_id - self.last_kf_frame_id
        n_kfs = int(m.kf_valid.sum())
        ref_tracked = int((m.kf_mp[self.ref_kf] >= 0).sum())

        # Stereo/RGB-D close-point census (†"nTrackedClose"/"nNonTrackedClose"):
        # inserting is URGENT when few close points are tracked but many close
        # candidates exist — translation accuracy depends on close geometry.
        # The counts are computed on device inside track_frame_fused and ride
        # the packed D2H (pulling the full depth/valid arrays here cost 2
        # extra RTTs per frame on relay rigs — as much as tracking itself).
        has_depth = self.cfg.sensor != "monocular"
        need_close = has_depth and (
            self.n_tracked_close < 100 and self.n_untracked_close > 70
        )

        # Per-sensor reference-ratio thresholds (†thRefRatio 0.75/0.9, 0.4
        # while the map is tiny)
        th_ref = 0.75 if has_depth else 0.9
        if n_kfs < 2:
            th_ref = 0.4

        c1a = since >= tcfg.max_frames_between_kf
        # c1b pacing: "mapper idle" alone is a timing race (13-31 KFs
        # run-to-run on one sequence — round-3 bistability). Require the
        # inter-KF gap to also cover the mapper's measured per-keyframe
        # cost, so admission converges to the sustainable mapping rate.
        # Urgency (c1a deadline, c1c close-point starvation) still
        # overrides the pace.
        pace = min(
            self.mapping_kf_cost() * self.cfg.camera.fps,
            0.5 * tcfg.max_frames_between_kf,
        )
        c1b = since >= max(tcfg.min_frames_between_kf, 3, pace) and \
            not self.mapping_busy()
        c1c = has_depth and (
            self.n_inliers_last < ref_tracked * 0.25 or need_close)
        c2 = (self.n_inliers_last < ref_tracked * th_ref or need_close) \
            and self.n_inliers_last > 15
        if not ((c1a or c1b or c1c) and c2):
            return False
        if not self.mapping_busy():
            return True
        # Mapper busy: enqueueing the keyframe itself aborts the running
        # local BA between LM chunks (pipeline wires local_mapper.interrupt
        # to "a keyframe is waiting" — the InterruptBA analog), but only the
        # depth-urgent case is worth the abort (†NeedNewKeyFrame queue<3
        # stereo carve-out; mono waits for an idle mapper).
        return bool(c1c)

    def _create_keyframe(self, frame: FrameData) -> int:
        m = self.map
        with m.lock:
            return self._create_keyframe_locked(frame)

    def _create_keyframe_locked(self, frame: FrameData) -> int:
        m = self.map
        frame.prefetch_host()  # one overlapped D2H for all feature arrays
        kf = m.add_keyframe(
            frame.Tcw.astype(np.float32), frame.xy, frame.desc, frame.octave,
            frame.angle, frame.valid, frame.frame_id, frame.timestamp,
            ur=frame.ur, depth=frame.depth,
        )
        if self.kfdb is not None and kf < len(self.kfdb.in_db):
            # a recycled slot must not surface the culled keyframe's BoW row
            # during the window before the loop closer re-adds it
            self.kfdb.erase(kf)
        feats = np.where(frame.mp >= 0)[0]
        m.add_observations_batch(frame.mp[feats], kf, feats)
        # RGB-D: spawn close points not yet matched (†CreateNewKeyFrame)
        if (frame.depth > 0).any():
            self._spawn_depth_points(frame, kf)
        # the full attribute refresh (median-Hamming distinctive descriptor
        # etc.) for the touched pre-existing points runs in the mapping
        # stage (†LocalMapping::ProcessNewKeyFrame), off this thread in
        # async mode
        m.update_connections(kf)
        m.version += 1
        self.ref_kf = kf
        self.last_kf_frame_id = frame.frame_id
        return kf

    def _spawn_depth_points(self, frame: FrameData, kf: int, max_new: int = 500):
        # (reference caps at 100 close points; with depth available for every
        # feature we spawn up to max_new=500 so purely rotational motion onto
        # newly-seen geometry keeps enough trackable points)
        m = self.map
        th_depth = self.cfg.camera.th_depth * self._baseline
        cand = np.where(
            frame.valid & (frame.depth > 0) & (frame.mp < 0)
        )[0]
        if len(cand) == 0:
            return
        order = cand[np.argsort(frame.depth[cand])]
        close = order[frame.depth[order] < th_depth]
        spawn = order[:max_new] if len(close) < 100 else close[:max_new]
        if len(spawn) == 0:
            return
        Twc = np.linalg.inv(frame.Tcw)
        fx = self._fx; fy = self._fy
        cx = self._cx; cy = self._cy
        d = frame.depth[spawn][:, None]
        pc = np.concatenate(
            [(frame.xy[spawn, :1] - cx) / fx * d,
             (frame.xy[spawn, 1:2] - cy) / fy * d, d], axis=1
        ).astype(np.float32)
        pw = pc @ Twc[:3, :3].T + Twc[:3, 3]
        new_mps = m.add_map_points_batch(pw, kf)
        m.add_observations_batch(new_mps, kf, spawn)
        frame.mp[spawn] = new_mps
        # fresh single-observation points: attributes are closed-form
        m.init_point_attributes(new_mps, kf, spawn)
