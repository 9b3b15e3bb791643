"""Two-process jax.distributed smoke test (VERDICT r1 item 8).

Spawns two real python processes that join one multi-controller runtime
(coordinator on localhost), build a GLOBAL 8-device mesh (4 virtual CPU
devices per process), and run the landmark-sharded BA — then compares the
result against a single-process solve of the same problem. This exercises
parallel/distributed.py end-to-end: initialize(), global_landmark_mesh(),
shard_problem_global(), and cross-process collectives in the psum-reduced
Schur solve.
"""

import os
import socket
import subprocess
import sys

import numpy as np

from orbslam2_tpu.models.camera import Camera
from orbslam2_tpu.ops import ba

from test_ba import make_ba_problem

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_ba(tmp_path, rng):
    cam, prob, poses_true, pts_true, _ = make_ba_problem(
        rng, K=6, M=128, n_fixed=2
    )
    # serialize problem + camera for the workers
    payload = {}
    for f in Camera._fields:
        payload[f"cam_{f}"] = np.asarray(getattr(cam, f))
    for f in ba.BAProblem._fields:
        payload[f"prob_{f}"] = np.asarray(getattr(prob, f))
    prob_npz = tmp_path / "prob.npz"
    out_npz = tmp_path / "out.npz"
    np.savez(prob_npz, **payload)

    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "orbslam2_tpu.parallel.smoke_worker",
             str(i), "2", f"127.0.0.1:{port}", str(prob_npz), str(out_npz)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=480)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\n{err[-3000:]}"

    result = np.load(out_npz)
    assert int(result["n_processes"]) == 2
    assert int(result["n_devices"]) == 8

    # same optimum as a single-process, single-device solve (reduction
    # order differs across the process boundary -> not bitwise)
    single = ba.optimize_ba(cam, prob, iters=8)
    np.testing.assert_allclose(
        result["poses"], np.asarray(single.poses), atol=2e-4
    )
    np.testing.assert_allclose(
        float(result["cost"]), float(single.cost), rtol=1e-3
    )
