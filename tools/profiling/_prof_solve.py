"""Time 384x384 SPD solve strategies on the chip: LU vs Cholesky vs CG.

The BA Schur system S (K=64 cameras -> 384x384) is SPD after damping; the
reference uses Eigen LDLT. jnp.linalg.solve lowers to LU which serializes on
TPU — measure what the alternatives cost.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    rng = np.random.default_rng(0)
    for n in (192, 384, 768):
        A = rng.normal(size=(n, n)).astype(np.float32)
        S = A @ A.T + n * np.eye(n, dtype=np.float32)
        b = rng.normal(size=(n,)).astype(np.float32)
        Sd, bd = jnp.asarray(S), jnp.asarray(b)

        lu = jax.jit(lambda S, b: jnp.linalg.solve(S, b))
        chol = jax.jit(
            lambda S, b: jax.scipy.linalg.cho_solve(
                (jnp.linalg.cholesky(S), True), b
            )
        )

        def cg(S, b, iters=48):
            dinv = 1.0 / jnp.diag(S)

            def body(_, c):
                x, r, z, p, rz = c
                Sp = S @ p
                alpha = rz / jnp.vdot(p, Sp)
                x = x + alpha * p
                r = r - alpha * Sp
                z = r * dinv
                rz_n = jnp.vdot(r, z)
                p = z + (rz_n / rz) * p
                return x, r, z, p, rz_n

            x = jnp.zeros_like(b)
            z = b * dinv
            x, r, *_ = jax.lax.fori_loop(0, iters, body, (x, b, z, z, jnp.vdot(b, z)))
            return x
        cgj = jax.jit(cg)

        x_lu = np.asarray(lu(Sd, bd))
        for name, fn in (("lu", lu), ("chol", chol), ("cg48", cgj)):
            ms = timeit(fn, Sd, bd)
            err = float(np.linalg.norm(np.asarray(fn(Sd, bd)) - x_lu) /
                        (np.linalg.norm(x_lu) + 1e-9))
            print(f"n={n} {name:5s} {ms:7.3f} ms  rel_err={err:.2e}")


if __name__ == "__main__":
    main()
