"""Data-parallel proving — the MapReduce dispatch layer.

The reference distributes its MapReduce leaf proofs (8-header map jobs)
across platform machines and joins them with reduce circuits that
recursively verify pairs (SURVEY.md §2.3.1, subchain_verification.rs:72-289).
TPU-native equivalents here:

- **map** (`prove_many`): one proof instance per device (round-robin);
  async dispatch overlaps the per-phase jitted kernels of different
  instances across the mesh — no cross-proof communication exists, same
  process-boundary seam as the reference.
- **reduce** (`map_reduce_prove`): the shard proofs collapse to ONE proof
  through an in-AIR reduce node (stark/recursion_air.py via
  parallel/aggregate.py) that verifies every child and links their
  boundary publics.
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


def prove_headers_procs(headers: Sequence[bytes], max_chunks: int,
                        config: prover.StarkConfig, checkpoint_dir: str,
                        procs: int, timeout_s: float = 3600.0) -> None:
    """Scatter the per-header map proofs across worker PROCESSES.

    The reference's operator ships map jobs to platform machines and
    collects proof artifacts (`bin/vectorx.rs:122-130`); here each
    worker process (`vectorx_tpu.parallel.map_worker`) proves a
    round-robin shard of the headers and hands the artifacts back
    through the content-addressed checkpoint store — after this returns,
    `statements.prove_header_range` with the same checkpoint dir hits
    every header proof. Coordination is process exit codes (a non-zero
    worker raises with its stderr tail), not sentinel files.

    On a single-accelerator host run this with a CPU backend (workers
    would contend for the one chip); in a multi-host deployment the
    spawn can be replaced by remote dispatch — the job-file + checkpoint
    wire format is the seam.
    """
    import binascii
    import json as _json
    import os
    import subprocess
    import sys
    import tempfile

    from ..stark import serialize

    procs = max(1, min(procs, len(headers)))
    cfg_hex = binascii.hexlify(serialize.serialize_config(config)).decode()
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    # a worker proves its units SEQUENTIALLY — a forced multi-device CPU
    # mesh inherited from the parent (tests: 8 virtual devices) just
    # oversubscribes the host x procs; pin workers to one device
    if "xla_force_host_platform_device_count" in env.get("XLA_FLAGS", ""):
        import re as _re
        env["XLA_FLAGS"] = _re.sub(
            r"--xla_force_host_platform_device_count=\d+",
            "--xla_force_host_platform_device_count=1", env["XLA_FLAGS"])
    with tempfile.TemporaryDirectory(prefix="vx_map_") as td:
        workers = []
        for p in range(procs):
            shard = [binascii.hexlify(h).decode()
                     for h in headers[p::procs]]
            job = {"kind": "header", "headers": shard,
                   "max_chunks": max_chunks, "config": cfg_hex,
                   "checkpoint": checkpoint_dir}
            jf = os.path.join(td, f"job{p}.json")
            with open(jf, "w") as f:
                _json.dump(job, f)
            workers.append(subprocess.Popen(
                [sys.executable, "-m", "vectorx_tpu.parallel.map_worker",
                 jf], env=env, stdout=subprocess.PIPE,
                stderr=subprocess.PIPE, text=True))
        errs = []
        for p, w in enumerate(workers):
            try:
                _, err = w.communicate(timeout=timeout_s)
            except subprocess.TimeoutExpired:
                w.kill()
                _, err = w.communicate()
                errs.append(f"worker {p}: timeout after {timeout_s}s")
                continue
            if w.returncode != 0:
                errs.append(f"worker {p}: rc={w.returncode}: {err[-500:]}")
        if errs:
            raise RuntimeError("map-proof dispatch failed: "
                               + "; ".join(errs))


def verify_many(air: Air, proofs: Sequence, publics: Sequence, log_n: int,
                config: prover.StarkConfig) -> bool:
    oks = [verifier.verify(air, pf, pubs, log_n, config)
           for pf, pubs in zip(proofs, publics)]
    return all(bool(ok) for ok in oks)


def map_reduce_prove(air: Air, traces: Sequence, publics: Sequence,
                     layout, config: prover.StarkConfig,
                     outer_config: Optional[prover.StarkConfig] = None,
                     devices: Optional[List] = None):
    """Map-prove every shard across the mesh, then REDUCE to one proof.

    ``layout``: aggregate.ChainLayout naming each shard claim's
    start/end public slots; adjacent shards are linked end_i ==
    start_{i+1} inside the reduce node. Returns an aggregate.Node whose
    single proof verifies every shard and the chain adjacency (check with
    aggregate.verify_aggregate). Lookup-bearing and constant-column
    shard AIRs are supported (phase-4 VKs); very wide statement AIRs
    (HeaderAir/Ed25519) await the phase-5 liveness-capped recording
    (stark/RECURSION.md)."""
    from . import aggregate as agg
    proofs = prove_many(air, traces, publics, config, devices)
    log_n = traces[0][0].shape[-1].bit_length() - 1
    nodes = [agg.Node(air=air, proof=p, publics=list(pu), log_n=log_n,
                      config=config, layout=layout)
             for p, pu in zip(proofs, publics)]
    return agg.aggregate_chain(nodes, outer_config or config)
