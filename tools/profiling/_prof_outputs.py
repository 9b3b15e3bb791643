"""Does per-program OUTPUT count drive relay cost? Same compute, 1 vs 4 vs
10 outputs."""
import time
import numpy as np, jax, jax.numpy as jnp

rng = np.random.default_rng(0)
A = jnp.asarray(rng.normal(0, 1, (1000, 256)).astype(np.float32))
B = jnp.asarray(rng.normal(0, 1, (8192, 256)).astype(np.float32))

def stream(fn, n=30):
    r = fn(); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3

f1 = jax.jit(lambda a, b: (a @ b.T).sum(1))
print(f"1 output :  {stream(lambda: f1(A, B)):7.2f} ms")

def g4(a, b):
    m = a @ b.T
    return m.sum(1), m.max(1), m.min(1), m[:, 0]
f4 = jax.jit(g4)
print(f"4 outputs:  {stream(lambda: f4(A, B)):7.2f} ms")

def g10(a, b):
    m = a @ b.T
    return tuple(m[:, i] * (i + 1) for i in range(10))
f10 = jax.jit(g10)
print(f"10 outputs: {stream(lambda: f10(A, B)):7.2f} ms")

def g10big(a, b):
    m = a @ b.T
    outs = [m.sum(1), m.max(1)]
    outs += [a * (i + 1) for i in range(4)]       # (1000,256) outputs
    outs += [b[:1024] * (i + 1) for i in range(4)]
    return tuple(outs)
f10b = jax.jit(g10big)
print(f"10 big outputs: {stream(lambda: f10b(A, B)):7.2f} ms")
