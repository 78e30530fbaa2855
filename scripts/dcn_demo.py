"""2-process CPU demo of the multi-host (DCN) seam.

Each process hosts 4 virtual CPU devices; the global mesh is
(dcn=2, batch=4). Two phases:

1. A 16-header subchain shards host-first over both tiers
   (parallel.multihost.shard_headers), so the hash-chain adjacency
   check's collective permute crosses the DCN boundary once — the same
   comm pattern a real two-pod map deployment produces.
2. MAP PROOFS OVER THE DCN AXIS (SURVEY §2.3.1: the reference's platform
   scatters whole leaf proofs to machines): each process PROVES one
   chain shard on its host-local devices, ships the proof blob through
   the handoff directory (the wire format a real deployment would RPC —
   stark/serialize), and process 0 REDUCES both into ONE aggregate proof
   (parallel.aggregate) and verifies it, adjacency link included.

Run (tests/test_multihost.py does this automatically):
    python scripts/dcn_demo.py <port> <pid> <handoff_dir>
Process 0 prints `DCN_DEMO_OK <state_root_hex>` then `DCN_MAP_OK` on
success.
"""

import hashlib
import os
import sys
import time


def main() -> None:
    port, pid = sys.argv[1], int(sys.argv[2])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vectorx_tpu.parallel import multihost, subchain
    from vectorx_tpu.circuits import scale

    multihost.init_distributed(f"localhost:{port}", num_processes=2,
                               process_id=pid)
    assert len(jax.devices()) == 8, jax.devices()
    mesh = multihost.dcn_mesh()
    assert mesh.shape == {"dcn": 2, "batch": 4}, mesh.shape

    # deterministic synthetic chain — every process builds the same input
    rng = np.random.default_rng(0)
    trusted = bytes(32)
    headers, parent = [], trusted
    for i in range(16):
        body = parent + scale.encode_compact_u32(1 + i) + bytes(32)
        hdr = body + bytes(rng.integers(0, 256, 96, dtype=np.uint8)) \
            + bytes(32)
        headers.append(hdr)
        parent = hashlib.blake2b(hdr, digest_size=32).digest()
    buf, sizes = subchain.pack_headers(headers, 16, max_header_size=256)

    shard = multihost.shard_headers(mesh)
    repl = multihost.replicate(mesh)
    fn = jax.jit(subchain.verify_subchain,
                 in_shardings=(shard, shard, repl, repl, repl))
    res = fn(jax.device_put(jnp.asarray(buf), shard),
             jax.device_put(jnp.asarray(sizes), shard),
             jnp.int32(16),
             jnp.asarray(np.frombuffer(trusted, np.uint8)),
             jnp.uint32(0))
    ok = bool(res.links_ok) and bool(res.blocks_sequential)
    root = np.asarray(res.state_root_words).tobytes().hex()
    if pid == 0:
        print(("DCN_DEMO_OK " + root) if ok else "DCN_DEMO_FAIL",
              flush=True)

    # -- phase 2: map proofs across the DCN axis --------------------------
    handoff = sys.argv[3] if len(sys.argv) > 3 else None
    if handoff is None:
        return
    from vectorx_tpu.field import goldilocks as gl
    from vectorx_tpu.parallel import aggregate as agg, map_prove
    from vectorx_tpu.stark import prover, serialize
    from vectorx_tpu.stark.air import FibonacciAir

    air = FibonacciAir()
    cfg = prover.StarkConfig(rate_bits=1, num_queries=2, final_poly_len=4)
    n = 16
    log_n = 4
    # deterministic 2-shard chain; shard p belongs to process p
    tA, pA = FibonacciAir.make_trace(n)
    a_last = (int(np.asarray(tA[0][0, -1]))
              | (int(np.asarray(tA[1][0, -1])) << 32))
    b_last = (int(np.asarray(tA[0][1, -1]))
              | (int(np.asarray(tA[1][1, -1])) << 32))
    tB, pB = FibonacciAir.make_trace(n, a_last, b_last)
    traces, pubs = [tA, tB], [pA, pB]
    mine = pid
    pubs_fp = [gl.to_fp(x) for x in pubs[mine]]
    proof = map_prove.prove_many(air, [traces[mine]], [pubs_fp], cfg,
                                 devices=jax.local_devices())[0]
    blob = serialize.serialize_proof(proof)
    tmp = os.path.join(handoff, f"shard{mine}.bin.tmp")
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, os.path.join(handoff, f"shard{mine}.bin"))

    if pid != 0:
        # stay alive until process 0 finishes the reduce: exiting early
        # tears down the jax.distributed coordination service under it
        done = os.path.join(handoff, "reduce.done")
        deadline = time.time() + 600
        while not os.path.exists(done) and time.time() < deadline:
            time.sleep(0.5)
        return
    # gather the remote shard's blob, reduce, verify
    other = os.path.join(handoff, "shard1.bin")
    deadline = time.time() + 300
    while not os.path.exists(other):
        if time.time() > deadline:
            print("DCN_MAP_FAIL timeout", flush=True)
            return
        time.sleep(0.5)
    like = serialize.empty_proof_like_shapes(air, cfg, log_n)
    with open(other, "rb") as f:
        proof_b = serialize.deserialize_proof(f.read(), like)
    layout = agg.ChainLayout(start=(0,), end=(2,))
    nodes = [agg.Node(air=air, proof=proof, publics=list(pubs[0]),
                      log_n=log_n, config=cfg, layout=layout),
             agg.Node(air=air, proof=proof_b, publics=list(pubs[1]),
                      log_n=log_n, config=cfg, layout=layout)]
    node = agg.aggregate_chain(nodes, cfg)
    shapes = [(air, log_n, cfg, 3), (air, log_n, cfg, 3)]
    links = [(0, 2, 1, 0)]
    expose = [(0, 0), (1, 2)]
    ok2 = agg.verify_aggregate(node, shapes, links, expose)
    print("DCN_MAP_OK" if ok2 else "DCN_MAP_FAIL", flush=True)
    with open(os.path.join(handoff, "reduce.done"), "w") as f:
        f.write("1")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
