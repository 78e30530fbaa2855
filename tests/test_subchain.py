import hashlib

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from vectorx_tpu.circuits import scale, commitments
from vectorx_tpu.parallel import mesh as pmesh
from vectorx_tpu.parallel import subchain

RNG = np.random.default_rng(7)


def make_chain(trusted_hash: bytes, trusted_block: int, n: int, size=300):
    """Synthetic SCALE-shaped headers forming a valid blake2b chain."""
    headers, metas = [], []
    parent = trusted_hash
    for i in range(n):
        bn = trusted_block + 1 + i
        state_root = bytes(RNG.integers(0, 256, 32, dtype=np.uint8))
        data_root = bytes(RNG.integers(0, 256, 32, dtype=np.uint8))
        body = parent + scale.encode_compact_u32(bn) + state_root
        filler = bytes(RNG.integers(0, 256, size - len(body) - 32, dtype=np.uint8))
        hdr = body + filler + data_root
        headers.append(hdr)
        metas.append(dict(state_root=state_root, data_root=data_root))
        parent = hashlib.blake2b(hdr, digest_size=32).digest()
    return headers, metas, parent  # parent == hash of last header


def words_to_bytes(w):
    return b"".join(int(x).to_bytes(4, "big") for x in np.asarray(w))


def test_subchain_verify_small():
    trusted_hash = bytes(RNG.integers(0, 256, 32, dtype=np.uint8))
    trusted_block = 1000
    tree_size = 16
    n_headers = 11
    headers, metas, target_hash = make_chain(trusted_hash, trusted_block, n_headers)
    buf, sizes = subchain.pack_headers(headers, tree_size, max_header_size=512)

    res = jax.jit(subchain.verify_subchain)(
        jnp.asarray(buf), jnp.asarray(sizes), jnp.int32(n_headers),
        jnp.asarray(np.frombuffer(trusted_hash, np.uint8)),
        jnp.uint32(trusted_block))

    assert bool(res.links_ok)
    assert bool(res.blocks_sequential)
    assert words_to_bytes(res.target_hash_words) == target_hash

    want_state, want_data = commitments.range_commitments(
        [m["state_root"] for m in metas], [m["data_root"] for m in metas], tree_size)
    assert words_to_bytes(res.state_root_words) == want_state
    assert words_to_bytes(res.data_root_words) == want_data


def test_subchain_detects_broken_link():
    trusted_hash = bytes(32)
    headers, _, _ = make_chain(trusted_hash, 5, 8)
    # corrupt one parent pointer
    h3 = bytearray(headers[3])
    h3[0] ^= 1
    headers[3] = bytes(h3)
    buf, sizes = subchain.pack_headers(headers, 8, max_header_size=512)
    res = jax.jit(subchain.verify_subchain)(
        jnp.asarray(buf), jnp.asarray(sizes), jnp.int32(8),
        jnp.asarray(np.frombuffer(trusted_hash, np.uint8)), jnp.uint32(5))
    assert not bool(res.links_ok)


def test_subchain_sharded_8_devices():
    """Same computation, header axis sharded over the 8-device CPU mesh."""
    assert len(jax.devices()) == 8
    m = pmesh.make_mesh(8)
    shard = pmesh.shard_batch(m)
    repl = pmesh.replicate(m)

    trusted_hash = bytes(RNG.integers(0, 256, 32, dtype=np.uint8))
    tree_size = 16  # 2 headers per device
    headers, metas, target_hash = make_chain(trusted_hash, 77, tree_size)
    buf, sizes = subchain.pack_headers(headers, tree_size, max_header_size=512)

    jitted = jax.jit(
        subchain.verify_subchain,
        in_shardings=(shard, shard, repl, repl, repl),
    )
    res = jitted(
        jax.device_put(jnp.asarray(buf), shard),
        jax.device_put(jnp.asarray(sizes), shard),
        jnp.int32(tree_size),
        jnp.asarray(np.frombuffer(trusted_hash, np.uint8)),
        jnp.uint32(77))

    assert bool(res.links_ok)
    assert words_to_bytes(res.target_hash_words) == target_hash
    want_state, want_data = commitments.range_commitments(
        [m_["state_root"] for m_ in metas], [m_["data_root"] for m_ in metas], tree_size)
    assert words_to_bytes(res.state_root_words) == want_state
    assert words_to_bytes(res.data_root_words) == want_data
