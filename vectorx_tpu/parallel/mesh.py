"""Device-mesh helpers — the TPU-native replacement for the reference's
process-level MapReduce distribution (SURVEY.md §2.3/§2.4).

The reference scatters 8-header map jobs across platform machines and
reduces proofs pairwise; here the same data parallelism is a sharded batch
axis on a jax Mesh, with XLA inserting ICI collectives for the boundary
link checks and commitment reductions.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "batch") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(mesh: Mesh, axis: str = "batch") -> NamedSharding:
    """Shard the leading axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
