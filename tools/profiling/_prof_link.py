import time, numpy as np, jax, jax.numpy as jnp

dev = jax.devices()[0]
print("device:", dev)

# H2D: various sizes
for kb in (1, 32, 160, 307, 614):
    a = np.zeros(kb * 1024, np.uint8)
    jax.device_put(a).block_until_ready()
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        jax.device_put(a).block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    print(f"H2D {kb:5d} KB: {dt*1e3:7.2f} ms  ({kb/1024/dt:6.1f} MB/s)")

# H2D non-blocking? measure device_put WITHOUT block
a = np.zeros(307 * 1024, np.uint8)
t0 = time.perf_counter()
xs = [jax.device_put(a) for _ in range(20)]
t1 = time.perf_counter()
for x in xs: x.block_until_ready()
t2 = time.perf_counter()
print(f"H2D 307KB enqueue {1e3*(t1-t0)/20:.2f} ms/call, drain {1e3*(t2-t1):.1f} ms total")

# D2H: small and medium results, already computed
f = jax.jit(lambda x: x * 2)
for kb in (1, 33, 64, 256):
    x = f(jnp.zeros(kb * 256, jnp.float32))
    x.block_until_ready()
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        _ = np.asarray(x)
    dt = (time.perf_counter() - t0) / reps
    print(f"D2H {kb:5d} KB (ready): {dt*1e3:7.2f} ms")

# D2H after copy_to_host_async + sleep
x = f(jnp.zeros(33 * 256, jnp.float32))
x.block_until_ready()
print("has copy_to_host_async:", hasattr(x, "copy_to_host_async"))
if hasattr(x, "copy_to_host_async"):
    y = f(jnp.zeros(33 * 256, jnp.float32))
    y.copy_to_host_async()
    time.sleep(0.1)
    t0 = time.perf_counter()
    _ = np.asarray(y)
    print(f"D2H 33KB after async+sleep: {(time.perf_counter()-t0)*1e3:.2f} ms")

# dispatch overhead: tiny jit call enqueue + sync
g = jax.jit(lambda x: x + 1)
x = jnp.zeros(8, jnp.float32); g(x).block_until_ready()
t0 = time.perf_counter()
reps = 50
for _ in range(reps):
    r = g(x)
t1 = time.perf_counter()
r.block_until_ready()
print(f"tiny dispatch enqueue: {(t1-t0)/reps*1e3:.3f} ms; final sync {(time.perf_counter()-t1)*1e3:.1f} ms")

# round trip: dispatch + pull scalar
t0 = time.perf_counter()
for _ in range(20):
    _ = float(g(x)[0])
print(f"dispatch+pull scalar RTT: {(time.perf_counter()-t0)/20*1e3:.2f} ms")
