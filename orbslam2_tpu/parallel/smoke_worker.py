#!/usr/bin/env python
"""Worker process for the 2-process jax.distributed smoke test.

Run (one per process, same machine):

  python -m orbslam2_tpu.parallel.smoke_worker <proc_id> <n_procs> \
      <coordinator host:port> <problem.npz> <out.npz>

Each process brings up 4 virtual CPU devices, joins the multi-controller
runtime via parallel.distributed.initialize, builds the GLOBAL 8-device
landmark mesh, and runs one sharded-BA solve; process 0 writes the resulting
poses/cost for the parent to compare against a single-process solve. This is
the documented launch recipe for real multi-host pods (one process per host,
coordinator on host 0) scaled down to one machine.
"""

import os
import sys


def main():
    proc_id = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    coord = sys.argv[3]
    prob_npz = sys.argv[4]
    out_npz = sys.argv[5]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    )
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

    from orbslam2_tpu.parallel import distributed

    distributed.initialize(
        coordinator_address=coord, num_processes=nprocs, process_id=proc_id
    )

    import jax
    import jax.numpy as jnp
    import numpy as np

    from orbslam2_tpu.models.camera import Camera
    from orbslam2_tpu.ops import ba
    from orbslam2_tpu.parallel import sharded_ba

    assert jax.process_count() == nprocs, jax.process_count()
    data = np.load(prob_npz)
    cam = Camera(*[jnp.asarray(data[f"cam_{f}"]) for f in Camera._fields])
    prob = ba.BAProblem(
        *[jnp.asarray(data[f"prob_{f}"]) for f in ba.BAProblem._fields]
    )

    mesh = distributed.global_landmark_mesh()
    assert mesh.devices.size == 4 * nprocs, mesh.devices.size
    dist = distributed.shard_problem_global(mesh, prob)
    fn = sharded_ba.make_sharded_ba(mesh, iters=8)
    res = fn(cam, dist)
    poses = np.asarray(jax.device_get(res.poses))
    cost = float(res.cost)
    if proc_id == 0:
        np.savez(out_npz, poses=poses, cost=cost,
                 n_processes=jax.process_count(),
                 n_devices=jax.device_count())
    # block until everyone is done so the coordinator does not tear down
    # while peers are still executing the solve
    import jax.experimental.multihost_utils as mh
    mh.sync_global_devices("smoke_done")


if __name__ == "__main__":
    main()
