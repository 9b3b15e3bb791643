"""Sharded BA correctness: 8-device virtual CPU mesh vs single device."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orbslam2_tpu.ops import ba, geometry as geo
from orbslam2_tpu.parallel import sharded_ba

from test_ba import make_ba_problem, pose_errors


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must force 8 virtual devices"
    return sharded_ba.make_landmark_mesh(jax.devices()[:8])


class TestShardedBA:
    def test_matches_single_device(self, mesh, rng):
        cam, prob, poses_true, pts_true, _ = make_ba_problem(
            rng, K=6, M=128, n_fixed=2
        )
        single = ba.optimize_ba(cam, prob, iters=8)
        fn = sharded_ba.make_sharded_ba(mesh, iters=8)
        dist = sharded_ba.shard_problem(mesh, prob)
        multi = fn(cam, dist)
        # Same optimum (not bitwise — reduction order differs — but tight)
        np.testing.assert_allclose(
            np.asarray(multi.poses), np.asarray(single.poses), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(multi.points), np.asarray(single.points), atol=2e-3
        )
        np.testing.assert_allclose(
            float(multi.cost), float(single.cost), rtol=1e-3
        )

    def test_converges_on_mesh(self, mesh, rng):
        cam, prob, poses_true, pts_true, _ = make_ba_problem(
            rng, K=6, M=256, n_fixed=2, pose_pert=0.08
        )
        fn = sharded_ba.make_sharded_ba(mesh, iters=10)
        res = fn(cam, sharded_ba.shard_problem(mesh, prob))
        errs = pose_errors(res.poses, poses_true)
        assert errs[2:].max() < 2e-2, errs

    def test_sharding_layout(self, mesh, rng):
        """Landmark arrays actually live sharded across the mesh."""
        cam, prob, *_ = make_ba_problem(rng, K=4, M=64, n_fixed=1)
        dist = sharded_ba.shard_problem(mesh, prob)
        shards = dist.points.addressable_shards
        assert len(shards) == 8
        assert shards[0].data.shape == (64 // 8, 3)
