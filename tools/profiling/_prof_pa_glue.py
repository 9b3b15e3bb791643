import time, numpy as np, jax, jax.numpy as jnp
from orbslam2_tpu.config import CameraConfig, ExtractorConfig, SlamConfig
from orbslam2_tpu.system import SlamSystem
from orbslam2_tpu.utils.synthetic import render_sequence
from orbslam2_tpu.ops import point_attrs

H, W = 480, 640
K = np.array([[520.0, 0, W/2], [0, 520.0, H/2], [0, 0, 1]], np.float32)
cfg = SlamConfig(sensor="rgbd",
    camera=CameraConfig(fx=520, fy=520, cx=W/2, cy=H/2, width=W, height=H, bf=52.0, fps=30),
    extractor=ExtractorConfig(n_features=1000, n_levels=8))
frames, _ = render_sequence(100, K, width=W, height=H, with_depth=True)
slam = SlamSystem(cfg)
for i in range(100):
    img, depth = frames[i]
    slam.track_rgbd(img, depth, i/30.0)
m = slam.map
kf = int(np.where(m.kf_valid[:m.n_kf])[0][-1])
mps = m.kf_mp[kf]; mps = np.unique(mps[mps >= 0]); mps = mps[m.mp_valid[mps]]
print(f"{len(mps)} pts, O={m.mp_obs_kf.shape[1]}")

def T(name, fn, reps=10):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps): r = fn()
    jax.block_until_ready(r) if r is not None else None
    print(f"{name:28s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms")

sf = cfg.extractor.scale_factor; nl = cfg.extractor.n_levels
P = len(mps); Pb = 128
while Pb < P: Pb *= 4
pad = Pb - P
def prep():
    obs_kf = np.concatenate([m.mp_obs_kf[mps], np.full((pad, m.mp_obs_kf.shape[1]), -1, np.int32)])
    obs_ft = np.concatenate([m.mp_obs_feat[mps], np.full((pad, m.mp_obs_feat.shape[1]), -1, np.int32)])
    pos = np.concatenate([m.mp_pos[mps], np.zeros((pad,3), np.float32)])
    ref = np.concatenate([m.mp_ref_kf[mps], np.full(pad,-1,np.int32)])
    return obs_kf, obs_ft, pos, ref
T("np gathers+pad", lambda: prep()[0] is not None and None)
obs_kf, obs_ft, pos, ref = prep()
T("dev_kf.ensure", lambda: (m.dev_kf.ensure(m), None)[1])
mir = m.dev_kf.ensure(m)
def upload():
    return (jnp.asarray(m.kf_pose), jnp.asarray(obs_kf), jnp.asarray(obs_ft),
            jnp.asarray(pos), jnp.asarray(ref))
def _up():
    jax.block_until_ready(upload())
T("uploads (jnp.asarray)", _up)
ups = upload()
def _kern():
    jax.block_until_ready(point_attrs.point_attributes(
        mir["kf_desc"], mir["kf_octave"], *ups, jnp.float32(sf), jnp.float32(nl-1)))
T("kernel dispatch+wait", _kern)
pk = point_attrs.point_attributes(mir["kf_desc"], mir["kf_octave"], *ups, jnp.float32(sf), jnp.float32(nl-1))
jax.block_until_ready(pk)
T("D2H np.asarray(packed)", lambda: np.asarray(pk) is not None and None)
T("FULL update_point_attributes", lambda: m.update_point_attributes(mps), reps=10)

# --- new-path breakdown (compacted Ob + i16)
raw_kf = m.mp_obs_kf[mps]; raw_ft = m.mp_obs_feat[mps]
has = raw_kf >= 0
max_obs = int(has.sum(1).max(initial=1))
Ob = 8
while Ob < max_obs and Ob < raw_kf.shape[1]: Ob *= 2
Ob = min(Ob, raw_kf.shape[1])
order = np.argsort(~has, axis=1, kind="stable")[:, :Ob]
rows = np.arange(P)[:, None]
obs_kf2 = np.full((Pb, Ob), -1, np.int16)
obs_ft2 = np.full((Pb, Ob), -1, np.int16)
np.clip(raw_kf[rows, order], -1, 32767, out=obs_kf2[:P], casting="unsafe")
np.clip(raw_ft[rows, order], -1, 32767, out=obs_ft2[:P], casting="unsafe")
print(f"new path: Pb={Pb} Ob={Ob}")
def upload2():
    return (jnp.asarray(m.kf_pose), jnp.asarray(obs_kf2), jnp.asarray(obs_ft2),
            jnp.asarray(pos), jnp.asarray(ref))
def _up2():
    jax.block_until_ready(upload2())
T("uploads NEW", _up2)
ups2 = upload2()
def _kern2():
    jax.block_until_ready(point_attrs.point_attributes(
        mir["kf_desc"], mir["kf_octave"], *ups2, jnp.float32(sf), jnp.float32(nl-1)))
T("kernel NEW dispatch+wait", _kern2)
