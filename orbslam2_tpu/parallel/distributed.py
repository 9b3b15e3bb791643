"""Multi-host runtime: jax.distributed + global-mesh sharded BA.

The reference has no distributed story (single process, SURVEY §5.8); the
TPU-native equivalent is the standard JAX multi-controller runtime: one
process per host, `jax.distributed.initialize`, a global mesh over every
chip, and the same landmark-sharded BA from sharded_ba.py — collectives ride
ICI within a slice and DCN across hosts, chosen by XLA from the sharding.

Single-host testing uses the virtual CPU mesh (tests/test_sharded_ba.py);
this module adds the process-coordination glue for real pods. It is exercised
in dry-run form by __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Start the multi-controller runtime (no-op on a single process).

    On TPU pods the three arguments are auto-detected from the environment;
    pass them explicitly for CPU/GPU multi-process tests.
    """
    import jax

    if num_processes is not None and num_processes <= 1:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def global_landmark_mesh():
    """Mesh over every device of every process (the global BA mesh)."""
    import jax
    from jax.sharding import Mesh

    from .sharded_ba import AXIS

    return Mesh(np.asarray(jax.devices()), (AXIS,))


def shard_problem_global(mesh, prob):
    """Place a host-local BAProblem onto a (possibly multi-host) mesh.

    Each process holds the full problem (maps are small relative to HBM);
    `device_put` with a NamedSharding slices out each device's landmark
    shard. For maps too large per host, switch to
    `jax.make_array_from_process_local_data` with per-host landmark ranges.
    """
    from jax.sharding import NamedSharding
    import jax

    from .sharded_ba import _in_specs

    specs = _in_specs()
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), prob, specs
    )
