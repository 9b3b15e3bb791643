"""Ablate one BA LM iteration on chip: which stage costs the 5.2 ms?"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.models.camera import Camera
from orbslam2_tpu.ops import ba


def make_prob(K=64, M=4096, O=8):
    rng = np.random.default_rng(1)
    poses = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    poses[:, 0, 3] = np.linspace(0, 2, K)
    points = np.stack([
        rng.uniform(-3, 3, M), rng.uniform(-2, 2, M), rng.uniform(5, 10, M),
    ], 1).astype(np.float32)
    obs_kf = rng.integers(0, K, (M, O)).astype(np.int32)
    pc = np.einsum("moij,mj->moi", poses[obs_kf][..., :3, :3], points) + \
        poses[obs_kf][..., :3, 3]
    u = 520 * pc[..., 0] / pc[..., 2] + 320
    v = 520 * pc[..., 1] / pc[..., 2] + 240
    obs_uvr = np.stack([u, v, -np.ones_like(u)], -1).astype(np.float32)
    return ba.BAProblem(
        poses=jnp.asarray(poses),
        opt_mask=jnp.asarray(np.arange(K) > 0),
        points=jnp.asarray(points),
        point_valid=jnp.asarray(np.ones(M, bool)),
        obs_kf=jnp.asarray(obs_kf),
        obs_uvr=jnp.asarray(obs_uvr),
        obs_sigma2=jnp.asarray(np.ones((M, O), np.float32)),
        obs_valid=jnp.asarray(np.ones((M, O), bool)),
    )


def timeit(fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3



def main():
    cam = Camera.create(fx=520.0, fy=520.0, cx=320.0, cy=240.0,
                        width=640, height=480)
    prob = make_prob()
    obst = ba._transpose_obs(prob)
    obst = jax.tree.map(jnp.asarray, obst)
    valid0 = (prob.obs_valid & (prob.obs_kf >= 0)
              & prob.point_valid[:, None]).T
    lam = jnp.float32(1e-4)

    @jax.jit
    def proj_only(prob):
        r, Jp, Jl, z = ba._project_t(cam, prob.poses, prob.points, obst)
        s = sum(x.sum() for x in r)
        s += sum(x.sum() for row in Jp for x in row if x is not None)
        s += sum(x.sum() for row in Jl for x in row if x is not None)
        return s

    @jax.jit
    def cost_only(prob):
        c, _ = ba._cost_t(cam, prob.poses, prob.points, obst, valid0, True)
        return c

    @jax.jit
    def full_build_solve(prob):
        dc, dl = ba._build_and_solve(cam, prob.poses, prob.points, prob,
                                     obst, valid0, True, lam)
        return dc.sum() + dl.sum()

    @jax.jit
    def one_iter(prob):
        dc, dl = ba._build_and_solve(cam, prob.poses, prob.points, prob,
                                     obst, valid0, True, lam)
        poses, points = ba._apply(prob.poses, prob.points, dc, dl)
        c, _ = ba._cost_t(cam, poses, points, obst, valid0, True)
        return c

    for name, fn in (
        ("proj+jac", proj_only),
        ("cost_of", cost_only),
        ("build+solve", full_build_solve),
        ("full_iter", one_iter),
    ):
        print(f"{name:18s} {timeit(fn, prob):7.3f} ms")

    fn10 = jax.jit(lambda p: ba.optimize_ba(cam=cam, prob=p, iters=10,
                                            outlier_rounds=0))
    ms = timeit(fn10, prob, reps=5)
    print(f"{'optimize_ba(10)/10':18s} {ms/10:7.3f} ms")


if __name__ == "__main__":
    main()
