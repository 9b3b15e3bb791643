"""Is the relay memoizing (program, inputs) -> result? Stream over 1
repeated input vs 30 distinct inputs."""
import time
import numpy as np, jax, jax.numpy as jnp
from orbslam2_tpu.config import ExtractorConfig
from orbslam2_tpu.ops import orb

H, W = 480, 640
ext = orb.OrbExtractor(ExtractorConfig(n_features=1000, n_levels=8), H, W)
rng = np.random.default_rng(0)
one = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))
many = [jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))
        for _ in range(30)]
jax.block_until_ready(ext._extract(one))
jax.block_until_ready(many)

t0 = time.perf_counter()
for _ in range(30):
    r = ext._extract(one)
jax.block_until_ready(r)
print(f"same input x30:     {(time.perf_counter()-t0)/30*1e3:7.2f} ms/call")

t0 = time.perf_counter()
for m in many:
    r = ext._extract(m)
jax.block_until_ready(r)
print(f"distinct inputs x30: {(time.perf_counter()-t0)/30*1e3:7.2f} ms/call")

# 4 distinct inputs cycled (the bench.py hot-path pattern)
t0 = time.perf_counter()
for i in range(30):
    r = ext._extract(many[i % 4])
jax.block_until_ready(r)
print(f"4 cycled inputs x30: {(time.perf_counter()-t0)/30*1e3:7.2f} ms/call")
