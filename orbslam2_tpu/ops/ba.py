"""Bundle adjustment: batched Levenberg-Marquardt with landmark Schur complement.

Replaces g2o's BlockSolver_6_3 + LinearSolverEigen pipeline
(†src/Optimizer.cc:LocalBundleAdjustment / BundleAdjustment, SURVEY §2.6):
instead of a sparse hyper-graph, the problem arrives as fixed-capacity
arrays — a per-point observation table — and one LM iteration is a handful of
vectorized block products + two MXU matmuls + one dense Cholesky of the
reduced camera system:

    D_m   = sum_o  Jl^T W Jl          (3x3 per landmark, closed-form inverse)
    H_cc  = sum_e  Jp^T W Jp          (6x6 per camera, one-hot matmul)
    E_mo  = Jp^T W Jl                 (6x3 per observation)
    S     = H_cc - sum_m E D^-1 E^T   (dense (6K, 6K) reduced system)
    S dc  = -(b_c - E D^-1 b_l)       (Cholesky; S is SPD after damping)
    dl_m  = -D^-1 (b_l + E^T dc)      (back-substitution, batched)

TPU layout note (the part that matters for speed): every per-observation
tensor is stored OBSERVATION-LAST — components lead, the M (and O) axes sit
in the trailing (sublane, lane) tile dims. A (M, O, 3, 6) Jacobian tensor
would be tiled as (.., 8, 128) on TPU — a ~50x HBM blowup for 3x6 blocks —
whereas (3, 6, O, M) keeps O=8 sublanes and M=4096 lanes fully dense. Small
3x3/3x6 block algebra unrolls into Python-level loops over lane-shaped
arrays (VPU), and all camera-indexed reductions contract over the O*M axis
on the MXU via a single 0/1 one-hot matrix that is built once per solve and
closed over by the LM loop (loop-invariant).

Dense S is deliberate: SLAM maps have K in the tens-to-hundreds per window,
so (6K)^2 easily fits VMEM/HBM and the Cholesky runs on the MXU — the
sparse-vs-dense trade SURVEY §7.1 calls out. The multi-chip variant shards
the landmark axis and psum-reduces S (parallel/sharded_ba.py).

Observation layout (static shapes, host-gathered window):
  obs_kf:    (M, O) int32   camera index per observation (-1 = none)
  obs_uvr:   (M, O, 3)      measured (u, v, u_right); u_right < 0 => mono
  obs_sigma2:(M, O)         octave variance
  obs_valid: (M, O) bool
Cameras: poses (K, 4, 4) Tcw with opt_mask (K,) (False = fixed/boundary KF).
Landmarks: points (M, 3) with point_valid (M,).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import geometry as geo
from . import precision
from ..models.camera import Camera

CHI2_MONO = 5.991
CHI2_STEREO = 7.815


class BAProblem(NamedTuple):
    poses: jnp.ndarray       # (K, 4, 4)
    opt_mask: jnp.ndarray    # (K,) bool — optimize this camera
    points: jnp.ndarray      # (M, 3)
    point_valid: jnp.ndarray  # (M,)
    obs_kf: jnp.ndarray      # (M, O) int32
    obs_uvr: jnp.ndarray     # (M, O, 3)
    obs_sigma2: jnp.ndarray  # (M, O)
    obs_valid: jnp.ndarray   # (M, O) bool


class BAResult(NamedTuple):
    poses: jnp.ndarray
    points: jnp.ndarray
    obs_inlier: jnp.ndarray  # (M, O) bool final chi2 classification
    cost: jnp.ndarray        # () final robust cost


class _ObsT(NamedTuple):
    """Loop-invariant observation data in observation-last layout."""
    onehot: jnp.ndarray      # (K, O*M) 0/1 camera incidence (0 for invalid)
    uvr: jnp.ndarray         # (3, O, M)
    sigma2: jnp.ndarray      # (O, M)
    is_stereo: jnp.ndarray   # (O, M) bool
    point_valid: jnp.ndarray  # (M,) bool


def _transpose_obs(prob: BAProblem) -> _ObsT:
    K = prob.poses.shape[0]
    kf_t = prob.obs_kf.T                                    # (O, M)
    n = kf_t.reshape(-1)                                    # (O*M,)
    onehot = (
        (jnp.maximum(n, 0)[None, :] == jnp.arange(K, dtype=n.dtype)[:, None])
        & (n >= 0)[None, :]
    ).astype(prob.poses.dtype)                              # (K, N)
    uvr = jnp.moveaxis(prob.obs_uvr, -1, 0).transpose(0, 2, 1)  # (3, O, M)
    return _ObsT(
        onehot=onehot,
        uvr=uvr,
        sigma2=prob.obs_sigma2.T,
        is_stereo=uvr[2] >= 0,
        point_valid=prob.point_valid,
    )


def _mul(a, b):
    """Sparse small-block multiply: None = structural zero, 1.0 = identity."""
    if a is None or b is None:
        return None
    if isinstance(b, float):
        a, b = b, a
    if isinstance(a, float):
        if a == 0.0:
            return None
        if a == 1.0:
            return b
        if a == -1.0:
            return -b
        return a * b
    return a * b


def _acc(s, t):
    if t is None:
        return s
    return t if s is None else s + t


def _smm(A, B):
    """(n x k) @ (k x m) over lists of lane-shaped arrays / None / floats."""
    n, k, m = len(A), len(B), len(B[0])
    return [
        [
            functools.reduce(_acc, (_mul(A[i][a], B[a][j]) for a in range(k)), None)
            for j in range(m)
        ]
        for i in range(n)
    ]


def _project_t(cam, poses, points, obst: _ObsT):
    """Residuals and Jacobians in observation-last layout.

    Returns r (list of 3 (O,M)), Jp (3x6 lists), Jl (3x3 lists), z (O,M).
    The per-observation camera pose is gathered with one (16,K)@(K,N) matmul
    against the 0/1 one-hot (exact to f32 via HIGHEST precision) — a plain
    gather would materialize an (O,M,4,4) tensor whose trailing (4,4) tile
    pads 128x on TPU.
    """
    K = poses.shape[0]
    O, M = obst.sigma2.shape
    Tg = jnp.einsum(
        "ck,kn->cn", poses.reshape(K, 16).T, obst.onehot,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(4, 4, O, M)
    R = [[Tg[i, j] for j in range(3)] for i in range(3)]
    t = [Tg[i, 3] for i in range(3)]
    pts = [points[:, 0], points[:, 1], points[:, 2]]        # (M,) each
    pc = [
        R[i][0] * pts[0] + R[i][1] * pts[1] + R[i][2] * pts[2] + t[i]
        for i in range(3)
    ]
    x, y = pc[0], pc[1]
    z = jnp.maximum(pc[2], 1e-6)
    inv_z = 1.0 / z
    inv_z2 = inv_z * inv_z

    u = cam.fx * x * inv_z + cam.cx
    v = cam.fy * y * inv_z + cam.cy
    st = obst.is_stereo
    r = [
        u - obst.uvr[0],
        v - obst.uvr[1],
        jnp.where(st, (u - cam.bf * inv_z) - obst.uvr[2], 0.0),
    ]

    jp00 = cam.fx * inv_z
    jp02 = -cam.fx * x * inv_z2
    jp11 = cam.fy * inv_z
    jp12 = -cam.fy * y * inv_z2
    stf = st.astype(z.dtype)
    Jpix = [
        [jp00, None, jp02],
        [None, jp11, jp12],
        [stf * jp00, None, stf * (jp02 + cam.bf * inv_z2)],
    ]
    # d(pc)/d(xi) = [I | -hat(pc)] (left twist on Tcw)
    Jpose = [
        [1.0, None, None, None, z, -y],
        [None, 1.0, None, -z, None, x],
        [None, None, 1.0, y, -x, None],
    ]
    Jp = _smm(Jpix, Jpose)     # 3 x 6 of (O, M)
    Jl = _smm(Jpix, R)         # 3 x 3 of (O, M)
    return r, Jp, Jl, z


def _robust_t(r, sigma2, is_stereo, valid, z, use_huber):
    """Huber weights + chi2 + robust cost, all (O, M)."""
    rr = functools.reduce(_acc, (ri * ri for ri in r), None)
    chi2 = rr / jnp.maximum(sigma2, 1e-12)
    delta2 = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    w_huber = jnp.where(
        chi2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12))
    )
    w = jnp.where(use_huber, w_huber, 1.0) / jnp.maximum(sigma2, 1e-12)
    w = jnp.where(valid & (z > 1e-5), w, 0.0)
    rho = jnp.where(
        chi2 <= delta2,
        chi2,
        2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 1e-12)) - delta2,
    )
    cost = jnp.sum(
        jnp.where(valid, jnp.where(use_huber, rho, jnp.minimum(chi2, 1e6)), 0.0)
    )
    return w, chi2, cost


def _cost_t(cam, poses, points, obst, valid_t, use_huber, axis_name=None):
    r, _, _, z = _project_t(cam, poses, points, obst)
    _, chi2, cost = _robust_t(r, obst.sigma2, obst.is_stereo, valid_t, z,
                              use_huber)
    if axis_name is not None:
        cost = jax.lax.psum(cost, axis_name)
    return cost, chi2


def _schur_solve(S, b_S, opt_mask, lam):
    """Fix non-optimized cameras, damp, and Cholesky-solve S dc = -b_S."""
    K = opt_mask.shape[0]
    fixedv = jnp.repeat(~opt_mask, 6)                        # (6K,)
    keep = (~fixedv[:, None]) & (~fixedv[None, :])
    S = jnp.where(keep, S, 0.0) + jnp.diag(fixedv.astype(S.dtype))
    b_S = jnp.where(fixedv, 0.0, b_S)
    # LM damping scaled by each camera block's mean diagonal.
    d = jnp.diagonal(S)
    tr_k = d.reshape(K, 6).mean(axis=1)
    add = lam * jnp.maximum(tr_k, 1e-6)
    Sd = S + jnp.diag(jnp.repeat(add, 6))
    Sd = 0.5 * (Sd + Sd.T)  # exact symmetry for the Cholesky
    L = jnp.linalg.cholesky(Sd)
    dc = -jax.scipy.linalg.cho_solve((L, True), b_S)
    dc = jnp.where(fixedv, 0.0, dc).reshape(K, 6)
    return jnp.where(opt_mask[:, None], dc, 0.0)


def _build_and_solve(cam, poses, points, prob: BAProblem, obst: _ObsT,
                     valid_t, use_huber, lam, axis_name=None,
                     half_assembly=False):
    """One LM step: build (obs-last layout), Schur-solve, back-substitute.

    half_assembly=True stores the big S-assembly intermediates (the
    one-hot-weighted (K, 18, M) P/Q blocks, the stacked 42xN normal-eq
    rows, and the one-hot itself) in bfloat16 — at GBA scale these
    materializations are the HBM traffic budget (~1.9 GB/iter f32 at
    K=256/M=32768), and bulk LM iterations already run bf16 matmuls, so
    the extra rounding is the same order as the existing mixed-precision
    design (the f32 tail iterations re-linearize exactly)."""
    K = poses.shape[0]
    O, M = obst.sigma2.shape
    N = O * M
    asm = jnp.bfloat16 if half_assembly else poses.dtype
    r, Jp, Jl, z = _project_t(cam, poses, points, obst)
    w, _, _ = _robust_t(r, obst.sigma2, obst.is_stereo, valid_t, z, use_huber)

    Jpw = [[None if Jp[i][c] is None else w * Jp[i][c] for c in range(6)]
           for i in range(3)]
    Jlw = [[None if Jl[i][j] is None else w * Jl[i][j] for j in range(3)]
           for i in range(3)]

    def _red_m(t):
        return jnp.zeros(M, dtype=w.dtype) if t is None else t.sum(axis=0)

    D = [[_red_m(functools.reduce(
        _acc, (_mul(Jlw[a][i], Jl[a][j]) for a in range(3)), None))
        for j in range(3)] for i in range(3)]
    b_l = [_red_m(functools.reduce(
        _acc, (_mul(Jlw[a][i], r[a]) for a in range(3)), None))
        for i in range(3)]

    E = [[functools.reduce(
        _acc, (_mul(Jpw[a][c], Jl[a][j]) for a in range(3)), None)
        for j in range(3)] for c in range(6)]
    zeros_n = jnp.zeros((O, M), dtype=w.dtype)

    def _nz(t):
        return zeros_n if t is None else t

    rows = []
    for i in range(6):
        for j in range(6):
            rows.append(_nz(functools.reduce(
                _acc, (_mul(Jpw[a][i], Jp[a][j]) for a in range(3)), None)))
    for i in range(6):
        rows.append(_nz(functools.reduce(
            _acc, (_mul(Jpw[a][i], r[a]) for a in range(3)), None)))
    oh_asm = obst.onehot.astype(asm)  # {0,1}: exact in bf16
    Hb = jnp.stack(rows, 0).reshape(42, N).astype(asm)
    red = jnp.einsum("kn,cn->kc", oh_asm, Hb,
                     preferred_element_type=poses.dtype)     # (K, 42)
    H_cc = red[:, :36].reshape(K, 6, 6)
    b_c = red[:, 36:]

    lamI = 1e-9 + lam
    trD = D[0][0] + D[1][1] + D[2][2]
    damp = lamI * jnp.maximum(trD / 3.0, 1e-6) + 1e-8
    a_, b_, c_ = D[0][0] + damp, D[0][1], D[0][2]
    d_, e_, f_ = D[1][0], D[1][1] + damp, D[1][2]
    g_, h_, i_ = D[2][0], D[2][1], D[2][2] + damp
    co = [
        [e_ * i_ - f_ * h_, c_ * h_ - b_ * i_, b_ * f_ - c_ * e_],
        [f_ * g_ - d_ * i_, a_ * i_ - c_ * g_, c_ * d_ - a_ * f_],
        [d_ * h_ - e_ * g_, b_ * g_ - a_ * h_, a_ * e_ - b_ * d_],
    ]
    det = a_ * co[0][0] + b_ * co[1][0] + c_ * co[2][0]
    inv_det = jnp.where(obst.point_valid,
                        1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det),
                        0.0)
    Dinv = [[co[i][j] * inv_det for j in range(3)] for i in range(3)]

    ED = [[functools.reduce(
        _acc, (_mul(E[c][a], Dinv[a][j]) for a in range(3)), None)
        for j in range(3)] for c in range(6)]
    EDs = jnp.stack(
        [_nz(ED[c][j]) for c in range(6) for j in range(3)], 0).astype(asm)
    Es = jnp.stack(
        [_nz(E[c][j]) for c in range(6) for j in range(3)], 0).astype(asm)
    oh3 = oh_asm.reshape(K, O, M)
    P = functools.reduce(_acc, (
        oh3[:, None, o, :] * EDs[None, :, o, :] for o in range(O)
    ), None)                                                 # (K, 18, M)
    Qm = functools.reduce(_acc, (
        oh3[:, None, o, :] * Es[None, :, o, :] for o in range(O)
    ), None)
    P2 = P.reshape(K * 6, 3 * M)
    Q2 = Qm.reshape(K * 6, 3 * M)
    S = -jax.lax.dot_general(
        P2, Q2, (((1,), (1,)), ((), ())),
        preferred_element_type=poses.dtype,
    )
    blf = jnp.stack(b_l, 0).reshape(3 * M)
    b_S = b_c.reshape(K * 6) - jnp.einsum(
        "cn,n->c", P2, blf.astype(asm), preferred_element_type=poses.dtype
    )

    eyeK = jnp.eye(K, dtype=S.dtype)
    S = S + jnp.einsum("kij,kl->kilj", H_cc, eyeK).reshape(K * 6, K * 6)

    if axis_name is not None:
        S = jax.lax.psum(S, axis_name)
        b_S = jax.lax.psum(b_S, axis_name)

    dc = _schur_solve(S, b_S, prob.opt_mask, lam)            # (K, 6)

    # Back-substitute landmarks: dl = -D^-1 (b_l + sum_o E^T dc_k).
    dc_obs = jnp.einsum("ck,kn->cn", dc.T, obst.onehot).reshape(6, O, M)
    Et_dc = [
        functools.reduce(_acc, (
            _mul(E[c][j], dc_obs[c]) for c in range(6)
        ), None)
        for j in range(3)
    ]
    Et_dc = [jnp.zeros(M, w.dtype) if t is None else t.sum(axis=0)
             for t in Et_dc]
    rhs = [b_l[j] + Et_dc[j] for j in range(3)]
    dl = jnp.stack(
        [
            -(Dinv[i][0] * rhs[0] + Dinv[i][1] * rhs[1] + Dinv[i][2] * rhs[2])
            for i in range(3)
        ],
        axis=-1,
    )                                                        # (M, 3)
    dl = jnp.where(prob.point_valid[:, None], dl, 0.0)
    return dc, dl


def _apply(poses, points, dc, dl):
    return jax.vmap(lambda T, xi: geo.se3_exp(xi) @ T)(poses, dc), points + dl


@functools.partial(
    jax.jit,
    static_argnames=("iters", "outlier_rounds", "fix_points",
                     "half_assembly"),
)
@precision.f32_matmuls
def optimize_ba(
    cam: Camera,
    prob: BAProblem,
    iters: int = 15,
    outlier_rounds: int = 1,
    fix_points: bool = False,
    half_assembly: bool = False,
) -> BAResult:
    """Run the reference's local/global BA schedule (single device).

    iters LM iterations with Huber; then chi2 outlier classification and
    `outlier_rounds` x (iters//2) more iterations without outliers/robust
    kernel (matches the 5+10 / drop-outliers schedule of
    †LocalBundleAdjustment). half_assembly=True additionally stores the
    bulk iterations' S-assembly intermediates in bfloat16 (~8-9% faster
    per iteration) — measured to cost real e2e accuracy on small windows
    (stereo e2e ATE 0.045 -> 0.10), so it is OFF by default and only a
    deliberate opt-in for large GBA problems.
    """
    return optimize_ba_impl(cam, prob, iters, outlier_rounds, fix_points,
                            None, half_assembly)


def optimize_ba_impl(
    cam: Camera,
    prob: BAProblem,
    iters: int = 15,
    outlier_rounds: int = 1,
    fix_points: bool = False,
    axis_name: str | None = None,
    half_assembly: bool = False,
) -> BAResult:
    """Unjitted BA body; `axis_name` enables the sharded (shard_map) path
    where the landmark axis is split across devices and the reduced camera
    system is psum-reduced (see parallel/sharded_ba.py)."""
    obst = _transpose_obs(prob)  # loop-invariant, built once per solve
    valid0 = prob.obs_valid & (prob.obs_kf >= 0) & prob.point_valid[:, None]

    def lm_phase(poses, points, valid_t, use_huber, n, matmul_precision):
        def body(_, carry):
            poses, points, lam, prev_cost = carry
            with jax.default_matmul_precision(matmul_precision):
                dc, dl = _build_and_solve(
                    cam, poses, points, prob, obst, valid_t, use_huber, lam,
                    axis_name=axis_name,
                    half_assembly=half_assembly
                    and (matmul_precision == "default"),
                )
                if fix_points:
                    dl = jnp.zeros_like(dl)
                poses_n, points_n = _apply(poses, points, dc, dl)
                cost_n, _ = _cost_t(cam, poses_n, points_n, obst, valid_t,
                                    use_huber, axis_name)
            accept = cost_n < prev_cost
            poses = jnp.where(accept, poses_n, poses)
            points = jnp.where(accept, points_n, points)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            cost = jnp.where(accept, cost_n, prev_cost)
            return poses, points, lam, cost

        cost0, _ = _cost_t(cam, poses, points, obst, valid_t, use_huber,
                           axis_name)
        poses, points, _, cost = jax.lax.fori_loop(
            0, n, body, (poses, points, 1e-4, cost0)
        )
        return poses, points, cost

    def lm_mixed(poses, points, valid_t, use_huber, n):
        """Mixed-precision LM: bulk iterations with fast single-pass bf16
        matmuls, then TAIL_F32 polishing iterations at true float32.

        bf16 rounding leaves LM ~3% above the f32 optimum but runs faster
        per iteration; re-linearizing the last few iterations at f32
        recovers the full-precision optimum because LM is self-correcting —
        each step is computed from a fresh f32 residual. (The pose gather
        inside _project_t is pinned to HIGHEST and unaffected.)
        """
        TAIL_F32 = 3
        n_bulk = max(n - TAIL_F32, 0)
        if n_bulk:
            poses, points, _ = lm_phase(
                poses, points, valid_t, use_huber, n_bulk, "default"
            )
        return lm_phase(
            poses, points, valid_t, use_huber, n - n_bulk, "float32"
        )

    poses, points = prob.poses, prob.points
    poses, points, cost = lm_mixed(poses, points, valid0.T, True, iters)

    valid_t = valid0.T
    for _ in range(outlier_rounds):
        _, chi2 = _cost_t(cam, poses, points, obst, valid_t, False)
        th = jnp.where(obst.is_stereo, CHI2_STEREO, CHI2_MONO)
        valid_t = valid0.T & (chi2 <= th)
        poses, points, cost = lm_mixed(
            poses, points, valid_t, False, max(iters // 2, 1)
        )

    _, chi2 = _cost_t(cam, poses, points, obst, valid_t, False)
    th = jnp.where(obst.is_stereo, CHI2_STEREO, CHI2_MONO)
    inlier = valid0 & (chi2 <= th).T
    return BAResult(poses=poses, points=points, obs_inlier=inlier, cost=cost)

