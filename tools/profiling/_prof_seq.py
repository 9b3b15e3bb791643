"""Which sequences let an async D2H complete cheaply?
A: copy, sleep, pull                 (known good)
B: copy, dispatch more, sleep, pull  (pipeline shape)
C: copy, sleep, dispatch more, pull
D: copy, upload, sleep, pull
E: copy, copy2, sleep, pull both
"""
import time
import numpy as np, jax, jax.numpy as jnp

f = jax.jit(lambda x: x * 2 + 1)
g = jax.jit(lambda x: x @ x)
xs = jnp.zeros(8192, jnp.float32)
M = jnp.zeros((512, 512), jnp.float32)
f(xs).block_until_ready(); g(M).block_until_ready()
h = np.zeros(300 * 1024, np.uint8)

def t(label, seq, n=10):
    ts = []
    for _ in range(n):
        ts.append(seq() * 1e3)
    a = np.array(ts)
    print(f"{label}: med={np.median(a):7.2f} p90={np.percentile(a,90):7.2f}", flush=True)

def A():
    r = f(xs); r.copy_to_host_async(); time.sleep(0.01)
    t0 = time.perf_counter(); np.asarray(r); return time.perf_counter() - t0
t("A copy,sleep10,pull          ", A)

def B():
    r = f(xs); r.copy_to_host_async()
    for _ in range(2): g(M)
    time.sleep(0.01)
    t0 = time.perf_counter(); np.asarray(r); return time.perf_counter() - t0
t("B copy,2 dispatch,sleep10,pull", B)

def C():
    r = f(xs); r.copy_to_host_async(); time.sleep(0.01)
    for _ in range(2): g(M)
    t0 = time.perf_counter(); np.asarray(r); return time.perf_counter() - t0
t("C copy,sleep10,2 dispatch,pull", C)

def D():
    r = f(xs); r.copy_to_host_async()
    jax.device_put(h); time.sleep(0.01)
    t0 = time.perf_counter(); np.asarray(r); return time.perf_counter() - t0
t("D copy,upload,sleep10,pull    ", D)

def E():
    r = f(xs); r2 = f(xs)
    r.copy_to_host_async(); r2.copy_to_host_async(); time.sleep(0.01)
    t0 = time.perf_counter(); np.asarray(r); np.asarray(r2); return time.perf_counter() - t0
t("E 2x(copy),sleep10,pull both  ", E)

def F():
    r = f(xs); r.copy_to_host_async()
    time.sleep(0.002)
    t0 = time.perf_counter(); np.asarray(r); return time.perf_counter() - t0
t("F copy,sleep2,pull            ", F)
