"""How fast does the relay retire operations? Dispatch M chained tiny ops,
measure drain time/op; same for interleaved uploads and async copies."""
import time
import numpy as np, jax, jax.numpy as jnp

g = jax.jit(lambda x: x + 1)
x0 = jnp.zeros(256, jnp.float32)
g(x0).block_until_ready()

for M in (10, 50, 100):
    x = x0
    t0 = time.perf_counter()
    for _ in range(M):
        x = g(x)
    t1 = time.perf_counter()
    x.block_until_ready()
    t2 = time.perf_counter()
    print(f"chain {M:4d} tiny ops: enqueue {1e3*(t1-t0)/M:6.3f} ms/op, drain {1e3*(t2-t1):7.1f} ms total = {1e3*(t2-t1)/M:6.2f} ms/op")

# independent ops (no chain)
for M in (50,):
    t0 = time.perf_counter()
    rs = [g(x0) for _ in range(M)]
    t1 = time.perf_counter()
    jax.block_until_ready(rs)
    t2 = time.perf_counter()
    print(f"indep {M:4d} tiny ops: enqueue {1e3*(t1-t0)/M:6.3f} ms/op, drain {1e3*(t2-t1):7.1f} ms = {1e3*(t2-t1)/M:6.2f} ms/op")

# interleave uploads (H2D) with ops
h = np.zeros(160 * 1024, np.uint8)
t0 = time.perf_counter()
for _ in range(25):
    jax.device_put(h)
    g(x0)
t1 = time.perf_counter()
g(x0).block_until_ready()
t2 = time.perf_counter()
print(f"upload+op x25: enqueue {1e3*(t1-t0)/25:.2f} ms/pair, drain {1e3*(t2-t1):.1f} ms")

# async copies in the mix (prefetch analog)
t0 = time.perf_counter()
outs = []
for _ in range(25):
    r = g(x0)
    r.copy_to_host_async()
    outs.append(r)
t1 = time.perf_counter()
jax.block_until_ready(outs)
np.asarray(outs[-1])
t2 = time.perf_counter()
print(f"op+async-copy x25: enqueue {1e3*(t1-t0)/25:.2f} ms/pair, drain {1e3*(t2-t1):.1f} ms")

# the real extractor program rate
from orbslam2_tpu.config import ExtractorConfig
from orbslam2_tpu.ops import orb
ext = orb.OrbExtractor(ExtractorConfig(n_features=1000, n_levels=8), 480, 640)
img = jnp.zeros((480, 640), jnp.float32)
r = ext._extract(img); jax.block_until_ready(r)
t0 = time.perf_counter()
for _ in range(10):
    r = ext._extract(img)
t1 = time.perf_counter()
jax.block_until_ready(r)
t2 = time.perf_counter()
print(f"extract x10: enqueue {1e3*(t1-t0)/10:.2f} ms, drain {1e3*(t2-t1):.1f} ms = {1e3*(t2-t1)/10:.2f} ms/extract")
