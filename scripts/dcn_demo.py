"""2-process CPU demo of the multi-host (DCN) seam.

Each process hosts 4 virtual CPU devices; the global mesh is
(dcn=2, batch=4). A 16-header subchain shards host-first over both tiers
(parallel.multihost.shard_headers), so the hash-chain adjacency check's
collective permute crosses the DCN boundary once — the same comm pattern
a real two-pod map deployment produces.

Run (tests/test_multihost.py does this automatically):
    python scripts/dcn_demo.py <port> 0 &
    python scripts/dcn_demo.py <port> 1
Process 0 prints `DCN_DEMO_OK <state_root_hex>` on success.
"""

import hashlib
import os
import sys


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


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
