"""Map the small-D2H pathology: fresh array each pull, various sizes,
report the distribution of first-consume times after async+delay."""
import time
import numpy as np, jax, jax.numpy as jnp

for nbytes, dtype in ((256, np.float32), (1024, np.float32), (1000, np.bool_),
                      (2048, np.float32), (4096, np.float32),
                      (8192, np.float32), (16384, np.float32),
                      (32768, np.float32)):
    if dtype is np.bool_:
        n = nbytes
        g = jax.jit(lambda x: x > 0)
        x0 = jnp.zeros(n, jnp.float32)
    else:
        n = nbytes // 4
        g = jax.jit(lambda x: x + 1)
        x0 = jnp.zeros(n, jnp.float32)
    g(x0).block_until_ready()
    ts = []
    for _ in range(12):
        r = g(x0)
        r.copy_to_host_async()
        time.sleep(0.03)
        t0 = time.perf_counter()
        np.asarray(r)
        ts.append((time.perf_counter() - t0) * 1e3)
    a = np.array(ts)
    print(f"{nbytes:7d} B {np.dtype(dtype).name:8s}: med={np.median(a):7.2f} "
          f"p90={np.percentile(a,90):8.2f} max={a.max():9.2f}")
