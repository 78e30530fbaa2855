"""Data-parallel proving — independent STARK instances across the mesh.

The reference distributes its MapReduce leaf proofs (8-header map jobs)
across platform machines (SURVEY.md §2.3.1); the TPU-native equivalent is
one proof instance per device. Instance inputs are committed to their
device; because dispatch is asynchronous, the per-phase jitted kernels of
different instances execute concurrently across devices while the host
orchestrates (no cross-proof communication exists — the reduce step joins
the *outputs*, matching the reference's process-boundary recursion seam).

The reduce tree over the resulting proofs (recursive aggregation) is the
round-2+ roadmap item; today the joiner checks all instances verify and
combines their public outputs.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax

from ..stark import prover, verifier
from ..stark.air import Air


def prove_many(air: Air, traces: Sequence, publics: Sequence,
               config: prover.StarkConfig,
               devices: Optional[List] = None) -> List[prover.StarkProof]:
    """Prove k independent instances, one per device (round-robin).

    traces[i]: (num_cols, N) Fp; publics[i]: list of scalar Fp.
    """
    devices = devices or jax.devices()
    proofs = []
    for i, (trace, pubs) in enumerate(zip(traces, publics)):
        dev = devices[i % len(devices)]
        trace_d = jax.device_put(trace, dev)
        pubs_d = [jax.device_put(p, dev) for p in pubs]
        proofs.append(prover.prove(air, trace_d, pubs_d, config))
    return proofs


def verify_many(air: Air, proofs: Sequence, publics: Sequence, log_n: int,
                config: prover.StarkConfig) -> bool:
    oks = [verifier.verify(air, pf, pubs, log_n, config)
           for pf, pubs in zip(proofs, publics)]
    return all(bool(ok) for ok in oks)
