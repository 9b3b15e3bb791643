"""Time each mapper/keyframe kernel standalone on an idle device.

Builds a real map by running the synchronous system for 100 frames, then
re-invokes each device kernel with the same arguments the mapper would use,
measuring pure device time (block_until_ready, no queue contention).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from orbslam2_tpu.config import CameraConfig, ExtractorConfig, SlamConfig
from orbslam2_tpu.system import SlamSystem
from orbslam2_tpu.utils.synthetic import render_sequence
import orbslam2_tpu.local_mapping as LM


def timeit(fn, reps=10):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


H, W = 480, 640
K = np.array([[520.0, 0, W / 2], [0, 520.0, H / 2], [0, 0, 1]], np.float32)
cfg = SlamConfig(
    sensor="rgbd",
    camera=CameraConfig(fx=520, fy=520, cx=W / 2, cy=H / 2, width=W, height=H,
                        bf=52.0, fps=30),
    extractor=ExtractorConfig(n_features=1000, n_levels=8),
)
frames, poses = render_sequence(100, K, width=W, height=H, with_depth=True)
slam = SlamSystem(cfg)  # synchronous: mapping inline
for i in range(100):
    img, depth = frames[i]
    slam.track_rgbd(img, depth, i / 30.0)
m = slam.map
mapper = slam.local_mapper
kf = int(np.where(m.kf_valid[: m.n_kf])[0][-1])
print(f"map: {m.n_kf} KFs, {int(m.mp_valid.sum())} points, probe kf={kf}")

# --- triangulation kernel
g = mapper._create_new_points_gather(kf)
if g is not None:
    nb_arr, n_nbs, args = g
    ms = timeit(lambda: LM._triangulate_neighbors_mirror(*args))
    print(f"triangulate_neighbors (B={len(nb_arr)}): {ms:7.2f} ms")

# --- fuse kernel: reproduce _fuse_neighbors gather
sf = cfg.extractor.scale_factor
neighbors = [int(x) for x in m.covisible_keyframes(kf, 10)]
directions = [(kf, nb) for nb in neighbors] + [(nb, kf) for nb in neighbors]
P, D, S = 1024, 20, 11
directions = directions[:D]
srcs = [kf] + neighbors[: S - 1]
src_index = {s: i for i, s in enumerate(srcs)}
sel_u = np.zeros((S, P), np.int64)
pv_u = np.zeros((S, P), bool)
for si, src in enumerate(srcs):
    mps = m.kf_mp[src]
    mps = np.unique(mps[mps >= 0])
    mps = mps[m.mp_valid[mps]]
    sel_u[si, : min(len(mps), P)] = mps[:P]
    pv_u[si, : min(len(mps), P)] = True
src_of_dir = np.zeros(D, np.int64)
dst_d = np.zeros(D, np.int64)
for di, (src, dst) in enumerate(directions):
    src_of_dir[di] = src_index[src]
    dst_d[di] = dst
mir = m.dev_kf.ensure(m)
fuse_args = (
    jnp.asarray(m.mp_pos[sel_u]), jnp.asarray(m.mp_desc[sel_u]),
    jnp.asarray(pv_u), jnp.asarray(src_of_dir),
    mir["kf_desc"], mir["kf_xy"], mir["kf_octave"], mir["kf_feat_valid"],
    jnp.asarray(dst_d), jnp.asarray(m.kf_pose[dst_d]),
)
ms = timeit(lambda: LM._fuse_match_mirror(
    *fuse_args, slam.tracker.cam, jnp.float32(sf), jnp.float32(3.0)))
print(f"fuse_match_mirror (D={D}, P={P}): {ms:7.2f} ms")

# --- update_point_attributes
mps = m.kf_mp[kf]
mps = np.unique(mps[mps >= 0])
ms = timeit(lambda: m.update_point_attributes(mps), reps=5)
print(f"update_point_attributes ({len(mps)} pts): {ms:7.2f} ms (wall incl D2H)")

# --- BoW transform + database add
kdb = slam.kfdb
if kdb is not None:
    desc = m.kf_desc[kf]
    valid = m.kf_feat_valid[kf]
    ms = timeit(lambda: kdb.compute_bow(desc, valid), reps=5)
    print(f"kfdb.compute_bow: {ms:7.2f} ms")

# --- local BA end to end
g = mapper._local_ba_gather(kf)
if g is not None:
    *_, prob = g
    t0 = time.perf_counter()
    res = mapper._local_ba_solve(prob)
    jax.block_until_ready(res)
    print(f"local_ba_solve (K={prob.poses.shape[0]}, M={prob.points.shape[0]}): "
          f"{(time.perf_counter() - t0) * 1e3:7.2f} ms")

# --- full keyframe-path kernels from the tracker side
print("extractor._extract:", end=" ")
img = jnp.asarray(frames[0][0].astype(np.float32))
ms = timeit(lambda: slam.tracker.extractor._extract(img))
print(f"{ms:7.2f} ms")

# --- split update_point_attributes cost: kernel vs host glue
from orbslam2_tpu.ops import point_attrs
sf2 = cfg.extractor.scale_factor
n_levels = cfg.extractor.n_levels
P0 = len(mps)
Pb = 128
while Pb < P0:
    Pb *= 4
pad = Pb - P0
obs_kf = np.concatenate([m.mp_obs_kf[mps], np.full((pad, m.mp_obs_kf.shape[1]), -1, np.int32)])
obs_ft = np.concatenate([m.mp_obs_feat[mps], np.full((pad, m.mp_obs_feat.shape[1]), -1, np.int32)])
pos = np.concatenate([m.mp_pos[mps], np.zeros((pad, 3), np.float32)])
ref = np.concatenate([m.mp_ref_kf[mps], np.full(pad, -1, np.int32)])
mir2 = m.dev_kf.ensure(m)
args_pa = (mir2["kf_desc"], mir2["kf_octave"], jnp.asarray(m.kf_pose),
           jnp.asarray(obs_kf), jnp.asarray(obs_ft), jnp.asarray(pos),
           jnp.asarray(ref), jnp.float32(sf2), jnp.float32(n_levels - 1))
ms = timeit(lambda: point_attrs.point_attributes(*args_pa), reps=10)
print(f"point_attrs KERNEL only (P={Pb}, O={m.mp_obs_kf.shape[1]}): {ms:7.2f} ms")
