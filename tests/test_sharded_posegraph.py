"""Edge-sharded essential-graph optimization: sharded == single-device."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pg_fixtures

from orbslam2_tpu.ops import geometry as geo, pose_graph
from orbslam2_tpu.parallel import sharded_pose_graph as spg


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must force 8 virtual devices"
    return spg.make_edge_mesh(jax.devices()[:8])


def _problem(K=96, seed=3):
    rng = np.random.default_rng(seed)
    S_true = pg_fixtures.circle_poses(K)
    ei = list(range(1, K)) + [0]
    ej = list(range(0, K - 1)) + [K - 1]
    for k in range(0, K - 5, 7):   # covisibility edges
        ei.append(k + 5)
        ej.append(k)
    Sij = pg_fixtures.relative_edges(S_true, ei, ej)
    drift = np.zeros(7, np.float32)
    drift[0] = 0.004
    drift[6] = 0.001
    S_init = pg_fixtures.integrate_drift(Sij[: K - 1], S_true[0], drift)
    fixed = np.zeros(K, bool)
    fixed[0] = True
    return (S_true, S_init, fixed,
            np.asarray(ei, np.int32), np.asarray(ej, np.int32),
            Sij.astype(np.float32), np.ones(len(ei), bool))


class TestShardedPoseGraph:
    def test_matches_single_device(self, mesh):
        S_true, S_init, fixed, ei, ej, Sij, ev = _problem()
        K = S_init.shape[0]
        order = jnp.arange(K)
        args = (jnp.asarray(S_init), jnp.asarray(fixed), jnp.ones(K, bool))
        r_single = pose_graph.optimize_pose_graph(
            *args, jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(Sij),
            jnp.asarray(ev), iters=15, solver="cg",
        )
        fn = spg.make_sharded_pose_graph(mesh, iters=15)
        eis, ejs, Sijs, evs = spg.shard_edges(mesh, ei, ej, Sij, ev)
        r_sharded = fn(*args, eis, ejs, Sijs, evs, order)
        # same optimum: per-vertex camera centers agree to solver tolerance
        np.testing.assert_allclose(
            np.asarray(r_sharded.poses), np.asarray(r_single.poses),
            atol=2e-3,
        )
        assert np.isfinite(float(r_sharded.cost))

    def test_corrects_drift_on_mesh(self, mesh):
        S_true, S_init, fixed, ei, ej, Sij, ev = _problem(K=96, seed=5)
        K = S_init.shape[0]
        fn = spg.make_sharded_pose_graph(mesh, iters=15)
        eis, ejs, Sijs, evs = spg.shard_edges(mesh, ei, ej, Sij, ev)
        res = fn(jnp.asarray(S_init), jnp.asarray(fixed),
                 jnp.ones(K, bool), eis, ejs, Sijs, evs, jnp.arange(K))
        S_opt = np.asarray(res.poses)
        assert np.isfinite(S_opt).all()

        def center(S8):
            S = jnp.asarray(S8)
            return np.asarray(
                -geo.sim3_R(S).T @ geo.sim3_t(S) / geo.sim3_s(S))

        e_init = np.linalg.norm(center(S_init[K - 1]) - center(S_true[K - 1]))
        e_opt = np.linalg.norm(center(S_opt[K - 1]) - center(S_true[K - 1]))
        assert e_opt < 0.2 * e_init, (e_init, e_opt)

    def test_pad_edges(self, mesh):
        ei = np.arange(10, dtype=np.int32)
        ej = np.arange(10, dtype=np.int32)
        Sij = np.tile(np.asarray(geo.sim3_identity())[None], (10, 1))
        ev = np.ones(10, bool)
        pi, pj, pS, pv = spg.pad_edges(mesh, ei, ej, Sij, ev)
        assert len(pi) % 8 == 0
        assert pv[:10].all() and not pv[10:].any()


class TestLoopClosingMeshPath:
    def test_correction_through_sharded_graph(self, mesh, rng):
        """The full CorrectLoop path with mesh_essential_graph=True produces
        the same drift reduction as the single-device essential graph."""
        import sys
        sys.path.insert(0, "tests")
        from test_loop_closing import build_drifted_loop

        from orbslam2_tpu.loop_closing import LoopCloser
        from orbslam2_tpu.map.keyframe_database import KeyFrameDatabase

        cfg, m, cam, gt_poses = build_drifted_loop(rng)
        cfg.runtime.mesh_essential_graph = True
        kfdb = KeyFrameDatabase(m)
        lc = LoopCloser(cfg, m, cam, kfdb)
        n_kf = len(m.valid_keyframes())
        closed = False
        for kf in range(n_kf):
            closed = lc.process_keyframe(kf, run_global_ba=False) or closed
        assert closed, "loop was not detected/corrected"
        last = n_kf - 1
        err = np.linalg.norm(np.asarray(geo.se3_log(
            jnp.asarray(m.kf_pose[last])
            @ geo.se3_inverse(jnp.asarray(gt_poses[last]))
        )))
        inj = np.linalg.norm(np.float32([0.04, 0.015, -0.03]) * last)
        assert err < 0.5 * inj, (err, inj)
