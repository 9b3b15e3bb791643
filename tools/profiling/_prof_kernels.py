import time, numpy as np, jax, jax.numpy as jnp
from orbslam2_tpu.config import SlamConfig, CameraConfig, ExtractorConfig
from orbslam2_tpu.models.camera import Camera
import orbslam2_tpu.local_mapping as LM
from orbslam2_tpu.ops import ba

rng = np.random.default_rng(0)
cam = Camera.create(fx=520., fy=520., cx=320., cy=240., width=640, height=480, bf=52.0)

def t(fn, reps=5):
    r = fn(); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/reps*1000

# fuse kernel: S=11 sources x P=1024 points, K=512 kf mirror, N=1024 feats, D=20 dirs
S, P, D, Kc, N = 11, 1024, 20, 512, 1024
mp_pos = jnp.asarray(rng.normal(0, 2, (S, P, 3)).astype(np.float32) + np.float32([0,0,6]))
mp_desc = jnp.asarray(rng.integers(0, 256, (S, P, 32)).astype(np.uint8))
pv = jnp.ones((S, P), bool)
src_of_dir = jnp.asarray(rng.integers(0, S, D))
kf_desc = jnp.asarray(rng.integers(0, 256, (Kc, N, 32)).astype(np.uint8))
kf_xy = jnp.asarray(rng.uniform(0, 640, (Kc, N, 2)).astype(np.float32))
kf_oct = jnp.zeros((Kc, N), jnp.int32)
kf_fv = jnp.ones((Kc, N), bool)
dst = jnp.asarray(rng.integers(0, Kc, D))
poses = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (D, 1, 1)))
print("fuse_mirror:", round(t(lambda: LM._fuse_match_mirror(mp_pos, mp_desc, pv, src_of_dir, kf_desc, kf_xy, kf_oct, kf_fv, dst, poses, cam, jnp.float32(1.2), jnp.float32(3.0))), 1), "ms")

# triangulation kernel: B=5 neighbors
B = 5
avail = jnp.ones((N,), bool)
avail2 = jnp.ones((B, N), bool)
print("tri_mirror:", round(t(lambda: LM._triangulate_neighbors_mirror(
    kf_desc, kf_xy, kf_oct, jnp.full((Kc, N), -1.0), jnp.full((Kc, N), -1.0),
    jnp.asarray(0), jnp.asarray(np.arange(1, B+1)), avail, avail2,
    jnp.asarray(np.eye(4, dtype=np.float32)), poses[:B], jnp.ones(B, bool),
    cam.K, jnp.float32(0.1), jnp.float32(52.0), jnp.float32(1.2))), 1), "ms")

# BA chunks at buckets
for Kw, Mw in ((16, 1024), (32, 2048), (64, 4096)):
    O = 8
    poses_b = np.tile(np.eye(4, dtype=np.float32), (Kw, 1, 1))
    pts = np.concatenate([rng.uniform(-3,3,(Mw,2)), rng.uniform(5,10,(Mw,1))],1).astype(np.float32)
    obs_kf = rng.integers(0, Kw, (Mw, O)).astype(np.int32)
    prob = ba.BAProblem(poses=jnp.asarray(poses_b), opt_mask=jnp.asarray(np.arange(Kw)>0),
        points=jnp.asarray(pts), point_valid=jnp.ones(Mw, bool),
        obs_kf=jnp.asarray(obs_kf),
        obs_uvr=jnp.asarray(rng.uniform(0,640,(Mw,O,3)).astype(np.float32)),
        obs_sigma2=jnp.ones((Mw,O), jnp.float32), obs_valid=jnp.ones((Mw,O), bool))
    fn = jax.jit(lambda p: ba.optimize_ba(cam=cam, prob=p, iters=5, outlier_rounds=0))
    print(f"ba 5it K={Kw} M={Mw}:", round(t(lambda: fn(prob), 3), 1), "ms")
