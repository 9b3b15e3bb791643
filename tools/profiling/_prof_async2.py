import time
import numpy as np, jax, jax.numpy as jnp

g = jax.jit(lambda x: x + 1)
x0 = jnp.zeros(256, jnp.float32)
g(x0).block_until_ready()

# 25 async copies, wait, then consume via np.asarray
outs = []
t0 = time.perf_counter()
for _ in range(25):
    r = g(x0)
    r.copy_to_host_async()
    outs.append(r)
t1 = time.perf_counter()
time.sleep(2.0)
t2 = time.perf_counter()
ts = []
for r in outs:
    ta = time.perf_counter()
    np.asarray(r)
    ts.append((time.perf_counter() - ta) * 1e3)
print(f"25 async copies: enqueue {1e3*(t1-t0):.1f} ms; after 2 s sleep, np.asarray each:")
print("  ", [round(t, 1) for t in ts])

# 7-copy prefetch pattern x 3 frames, consume 100 ms later
fields = [jnp.zeros(n, jnp.float32) for n in (2000, 8000, 1000, 1000, 1000, 1000, 1000)]
h = jax.jit(lambda xs: [x + 1 for x in xs])
rs = h(fields); jax.block_until_ready(rs)
for trial in range(3):
    rs = h(fields)
    for r in rs:
        r.copy_to_host_async()
    time.sleep(0.1)
    ta = time.perf_counter()
    for r in rs:
        np.asarray(r)
    print(f"prefetch-7 consume after 100 ms: {(time.perf_counter()-ta)*1e3:.2f} ms")
