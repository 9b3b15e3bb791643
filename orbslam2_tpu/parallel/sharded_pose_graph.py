"""Multi-chip essential-graph optimization: edge-sharded CG over a mesh.

The reference's OptimizeEssentialGraph is a single-threaded g2o solve over
every keyframe (†src/Optimizer.cc ≈L660-900). The TPU-native equivalent
shards the *edge axis* (SURVEY §5.7: "pose-graph optimization shards edges
the same way"): each device linearizes its own edge shard (the jacfwd
autodiff is ~14 residual evaluations per edge — the dominant per-iteration
cost) and computes its partial CG matvec; vertex-space reductions are one
(K, 7) `psum` each. Vertex-level structure (gauge recentering, the
spanning-chain preconditioner scans) is replicated — O(K) work that would
not amortize the collective it takes to shard it.

Communication per LM iteration: one (K, 7) all-reduce for the gradient plus
one per CG iteration — independent of edge count, so scaling is
linearization-bound until K grows into the tens of thousands.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import pose_graph, precision

AXIS = "edges"


def make_sharded_pose_graph(mesh: Mesh, iters: int = 20,
                            fix_scale: bool = False):
    """Build a jitted, mesh-sharded essential-graph step.

    Same signature/semantics as `ops.pose_graph.optimize_pose_graph` with
    solver="cg": (S_init, fixed, valid, edge_i, edge_j, edge_Sij,
    edge_valid, order) -> PoseGraphResult. The edge arrays' length must be
    divisible by the mesh size — pad with edge_valid=False rows
    (`pad_edges` below).
    """

    @precision.f32_matmuls
    def impl(S_init, fixed, valid, ei, ej, Sij, ev, order):
        return pose_graph.pose_graph_impl(
            S_init, fixed, valid, ei, ej, Sij, ev,
            iters=iters, fix_scale=fix_scale, solver="cg", order=order,
            axis_name=AXIS,
        )

    sharded = jax.shard_map(
        impl,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P()),
        out_specs=pose_graph.PoseGraphResult(poses=P(), cost=P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_edge_mesh(devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, (AXIS,))


def pad_edges(mesh: Mesh, edge_i, edge_j, edge_Sij, edge_valid):
    """Pad the edge axis to a multiple of the mesh size (invalid rows)."""
    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    E = edge_i.shape[0]
    pad = (-E) % n
    if pad == 0:
        return edge_i, edge_j, edge_Sij, edge_valid
    ei = np.concatenate([np.asarray(edge_i), np.zeros(pad, edge_i.dtype)])
    ej = np.concatenate([np.asarray(edge_j), np.zeros(pad, edge_j.dtype)])
    Sij = np.concatenate([
        np.asarray(edge_Sij),
        np.tile(np.asarray(edge_Sij)[:1], (pad, 1)),
    ])
    ev = np.concatenate([np.asarray(edge_valid), np.zeros(pad, bool)])
    return ei, ej, Sij, ev


def shard_edges(mesh: Mesh, edge_i, edge_j, edge_Sij, edge_valid):
    """Device-put padded edge arrays with the edge axis sharded."""
    sh = NamedSharding(mesh, P(AXIS))
    ei, ej, Sij, ev = pad_edges(mesh, edge_i, edge_j, edge_Sij, edge_valid)
    return (jax.device_put(jnp.asarray(ei), sh),
            jax.device_put(jnp.asarray(ej), sh),
            jax.device_put(jnp.asarray(Sij), sh),
            jax.device_put(jnp.asarray(ev), sh))
