import time, numpy as np, jax, jax.numpy as jnp
from orbslam2_tpu.ops import geometry as geo
rng = np.random.default_rng(0)
B, F = 10, 1504
X = np.concatenate([rng.uniform(-3,3,(F,2)), rng.uniform(4,9,(F,1))],1).astype(np.float32)
K = np.array([[520,0,320],[0,520,240],[0,0,1]], np.float32)
T1 = np.eye(4, dtype=np.float32)
P1 = (K @ T1[:3]).astype(np.float32)
P2s, x1s, x2s = [], [], []
for b in range(B):
    T2 = np.eye(4, dtype=np.float32); T2[0,3] = 0.3 + 0.1*b
    P2 = K @ T2[:3]
    pc1 = X @ T1[:3,:3].T + T1[:3,3]; pc2 = X @ T2[:3,:3].T + T2[:3,3]
    x1 = (pc1[:, :2]/pc1[:, 2:])*[520,520]+[320,240]
    x2 = (pc2[:, :2]/pc2[:, 2:])*[520,520]+[320,240]
    P2s.append(P2); x1s.append(x1); x2s.append(x2)
P2s = jnp.asarray(np.stack(P2s).astype(np.float32))
x1s = jnp.asarray(np.stack(x1s).astype(np.float32))
x2s = jnp.asarray(np.stack(x2s).astype(np.float32))
g = jax.jit(jax.vmap(lambda p2, a, b: geo.triangulate_dlt(jnp.asarray(P1), p2, a, b)))
out = g(P2s, x1s, x2s); jax.block_until_ready(out)
err = np.abs(np.asarray(out) - X[None]).max()
print("max abs err:", err)
t0=time.perf_counter()
for _ in range(20): out = g(P2s, x1s, x2s)
jax.block_until_ready(out)
print(f"dlt {B}x{F}: {(time.perf_counter()-t0)/20*1e3:.2f} ms")
