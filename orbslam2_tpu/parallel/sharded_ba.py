"""Multi-chip bundle adjustment: landmark-sharded Schur reduction over a mesh.

The reference's global BA is a single-threaded g2o solve behind a detached
std::thread (†LoopClosing::RunGlobalBundleAdjustment, SURVEY §2.2). The
TPU-native equivalent shards the *map axis* (SURVEY §5.7): landmark blocks
(points + their observation rows) are split across devices on a
`jax.sharding.Mesh`; each device assembles its partial reduced camera system
S and RHS; one `psum` over ICI combines them; every device solves the
(replicated, small) camera system and back-substitutes its own landmarks.

Communication per LM iteration: one all-reduce of (6K)^2 + 6K floats —
independent of the number of landmarks, so scaling is compute-bound until K
grows into the thousands.
"""

from __future__ import annotations


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.camera import Camera
from ..ops import ba, precision

AXIS = "landmarks"


def _in_specs() -> ba.BAProblem:
    """Partition specs: camera state replicated, landmark axis sharded."""
    return ba.BAProblem(
        poses=P(),
        opt_mask=P(),
        points=P(AXIS),
        point_valid=P(AXIS),
        obs_kf=P(AXIS),
        obs_uvr=P(AXIS),
        obs_sigma2=P(AXIS),
        obs_valid=P(AXIS),
    )


def _out_specs() -> ba.BAResult:
    return ba.BAResult(
        poses=P(),            # replicated (identical on all devices)
        points=P(AXIS),       # each device owns its landmark shard
        obs_inlier=P(AXIS),
        cost=P(),
    )


def make_sharded_ba(
    mesh: Mesh,
    iters: int = 10,
    outlier_rounds: int = 1,
    fix_points: bool = False,
):
    """Build a jitted, mesh-sharded BA step.

    The returned callable has the same signature/semantics as
    `ops.ba.optimize_ba` but runs SPMD over `mesh` axis "landmarks"; the
    landmark dimension M of every landmark-indexed array must be divisible by
    the mesh size.
    """

    @precision.f32_matmuls
    def impl(cam: Camera, prob: ba.BAProblem) -> ba.BAResult:
        return ba.optimize_ba_impl(
            cam, prob, iters, outlier_rounds, fix_points, AXIS
        )

    sharded = jax.shard_map(
        impl,
        mesh=mesh,
        in_specs=(P(), _in_specs()),
        out_specs=_out_specs(),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_landmark_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


def shard_problem(mesh: Mesh, prob: ba.BAProblem) -> ba.BAProblem:
    """Place a host problem onto the mesh with the BA shardings."""
    specs = _in_specs()
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), prob, specs
    )
