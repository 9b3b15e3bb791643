"""Cross-thread latency inflation probe, throttled + verbose."""
import time, threading
import numpy as np, jax, jax.numpy as jnp

f_small = jax.jit(lambda x: x * 2 + 1)
xs = jnp.zeros(8192, jnp.float32)
f_small(xs).block_until_ready()
A = jnp.zeros((2048, 2048), jnp.bfloat16)
f_big = jax.jit(lambda a: a @ a)
f_big(A).block_until_ready()
t0=time.perf_counter(); r=f_big(A); r.block_until_ready()
print(f"f_big solo: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)

def fg_lat(label, n=15):
    ts = []
    for _ in range(n):
        r = f_small(xs)
        r.copy_to_host_async()
        t0 = time.perf_counter()
        np.asarray(r)
        ts.append((time.perf_counter() - t0) * 1e3)
        time.sleep(0.03)
    a = np.array(ts)
    print(f"{label}: fg pull med={np.median(a):6.2f} ms p90={np.percentile(a,90):6.2f} max={a.max():7.2f}", flush=True)

fg_lat("idle          ")

stop = False
def bg_compute():
    big = None
    while not stop:
        big = f_big(A)
        big.copy_to_host_async()
        _ = np.asarray(big)[0, 0]
        time.sleep(0.005)

th = threading.Thread(target=bg_compute); th.start()
time.sleep(0.3)
fg_lat("bg compute+pull")
stop = True; th.join(); print("bg1 done", flush=True)
