"""Multi-host (DCN) seam — SURVEY.md §2.4's second network tier.

The reference distributes map jobs across MACHINES (its platform scatters
8-header proofs to separate provers and reduces pairwise). The TPU-native
equivalent is a two-tier device mesh:

    ("dcn", "ici"): the outer axis spans HOSTS (data-center network),
    the inner axis spans the chips of one host (ICI).

Layout rule (the scaling-book recipe): shard *independent* work — header
batches, map-proof instances — over "dcn" so cross-host traffic is only
the boundary links/reductions; shard *cooperative* work (one big NTT,
one trace) over "ici" only, so its all_to_all/psum stay on-die.

`init_distributed` wraps jax.distributed.initialize; `dcn_mesh` builds
the (num_hosts, local_devices) mesh from the global device list. Works
unchanged for real multi-host TPU slices and for the hermetic CPU demo
(scripts/dcn_demo.py: 2 processes x 4 virtual CPU devices — exercised by
tests/test_multihost.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: str, num_processes: int,
                     process_id: int) -> None:
    """Join the multi-process runtime (idempotent per process).

    On real pods the three values come from the scheduler environment and
    jax.distributed.initialize() can discover them itself; passing them
    explicitly keeps the hermetic CPU demo and tests deterministic."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def dcn_mesh(dcn_axis: str = "dcn", ici_axis: str = "batch") -> Mesh:
    """(num_hosts, devices_per_host) mesh over the GLOBAL device list.

    Rows are hosts (process_index), columns the host-local devices — so
    P(dcn_axis) shards across hosts and P(ici_axis) within one."""
    devs = jax.devices()
    by_proc: dict = {}
    for d in devs:
        by_proc.setdefault(d.process_index, []).append(d)
    n_local = len(next(iter(by_proc.values())))
    assert all(len(v) == n_local for v in by_proc.values()), \
        "uneven devices per host"
    grid = np.array([by_proc[p] for p in sorted(by_proc)])
    return Mesh(grid, (dcn_axis, ici_axis))


def shard_headers(mesh: Mesh, dcn_axis: str = "dcn",
                  ici_axis: str = "batch") -> NamedSharding:
    """Header-batch sharding over BOTH tiers: the batch axis splits
    host-first (so adjacent headers stay on one host and only the batch
    boundary links cross the DCN)."""
    return NamedSharding(mesh, P((dcn_axis, ici_axis)))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
