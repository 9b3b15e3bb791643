import time, numpy as np, jax, jax.numpy as jnp

f = jax.jit(lambda x: x * 2)
print("== D2H per-rep times by size (bytes) ==")
for nbytes in (64, 256, 1024, 2048, 4096, 8192, 12288, 16384, 24576, 32768, 65536):
    n = nbytes // 4
    x = f(jnp.zeros(n, jnp.float32))
    x.block_until_ready()
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        _ = np.asarray(x)
        ts.append((time.perf_counter() - t0) * 1e3)
    ts = np.array(ts)
    print(f"{nbytes:7d} B: med={np.median(ts):8.2f} ms  min={ts.min():8.2f}  max={ts.max():8.2f}")

print("== block_until_ready on computed tiny result ==")
x0 = jnp.zeros(8, jnp.float32)
g = jax.jit(lambda x: x + 1)
g(x0).block_until_ready()
ts = []
for _ in range(8):
    r = g(x0)
    t0 = time.perf_counter()
    r.block_until_ready()
    ts.append((time.perf_counter() - t0) * 1e3)
print("block_until_ready:", [round(t, 1) for t in ts])

print("== small pull AFTER copy_to_host_async ==")
for nbytes in (1024, 4096):
    n = nbytes // 4
    x = f(jnp.zeros(n, jnp.float32))
    x.block_until_ready()
    ts = []
    for _ in range(6):
        y = f(jnp.zeros(n, jnp.float32))
        y.copy_to_host_async()
        time.sleep(0.05)
        t0 = time.perf_counter()
        _ = np.asarray(y)
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{nbytes:7d} B async+sleep50ms pull:", [round(t, 1) for t in ts])

print("== jax.device_get of tiny ==")
x = f(jnp.zeros(256, jnp.float32))
x.block_until_ready()
ts = []
for _ in range(6):
    t0 = time.perf_counter()
    _ = jax.device_get(x)
    ts.append((time.perf_counter() - t0) * 1e3)
print("device_get 1KB:", [round(t, 1) for t in ts])

print("== pad-to-33KB workaround: pull small data via padded buffer ==")
pad = jax.jit(lambda x: jnp.concatenate([x, jnp.zeros(8192 - x.shape[0], x.dtype)]))
x0 = jnp.zeros(256, jnp.float32)
y = pad(x0); y.block_until_ready()
ts = []
for _ in range(6):
    y = pad(x0)
    t0 = time.perf_counter()
    _ = np.asarray(y)[:256]
    ts.append((time.perf_counter() - t0) * 1e3)
print("padded pull:", [round(t, 1) for t in ts])
