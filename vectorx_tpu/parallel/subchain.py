"""Sharded header-subchain verification — the MapReduce-equivalent data path.

Re-implements the reference's ``verify_subchain`` semantics
(/root/reference/circuits/builder/subchain_verification.rs):

  map  (:81-232):  per header — Blake2b-256 hash of the SCALE bytes, decode
                   {block_nb, parent_hash, state_root, data_root}, check
                   hash/parent adjacency, mask padding ("noop") headers;
  reduce (:233-289): combine per-batch state/data Merkle roots and check
                   batch adjacency;
  final  (:293-296): endpoints must equal (trusted_block/hash, target_block/
                   hash).

TPU-native mapping: the header axis shards across the device mesh (the
reference's map-job axis, 8 headers/job → here headers/chips). The
adjacency check is one jnp.roll over the global header axis — XLA lowers it
to an ICI collective-permute under jit+sharding. The range commitments are
the standard simple-Merkle tree whose first log2(headers/chip) levels are
local and whose top levels are an all-gather + small replicated tree.

This module is the *witness-level* execution of the statement (what the
reference's hints + dummy programs compute natively, input/mod.rs:493-528);
the STARK AIR that proves the same relation consumes its intermediate
tensors as the trace.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..circuits import scale
from ..circuits.commitments import (_bytes32_to_words, _words_to_bytes32,
                                    sha256_pair_words)
from ..hashes import blake2b as b2


class SubchainResult(NamedTuple):
    target_hash_words: jax.Array    # (8,) uint32 — Blake2b-256 of last active header (as BE words of the LE digest bytes)
    state_root_words: jax.Array     # (8,) uint32 — simple Merkle root (BE words)
    data_root_words: jax.Array      # (8,) uint32
    links_ok: jax.Array             # () bool — hash-chain adjacency holds
    blocks_sequential: jax.Array    # () bool — block numbers increment by 1


def _digest_planes_to_bytes32(d_lo: jax.Array, d_hi: jax.Array) -> jax.Array:
    """Blake2b digest planes (..., 4) -> (..., 32) uint8 (LE per u64 word)."""
    def split(x):  # (..., 4) uint32 -> (..., 16) uint8 LE
        parts = [((x >> jnp.uint32(s)) & jnp.uint32(0xFF)).astype(jnp.uint8)
                 for s in (0, 8, 16, 24)]
        return jnp.stack(parts, axis=-1).reshape(x.shape[:-1] + (16,))
    lo_b = split(d_lo)   # bytes 0..3 of each word
    hi_b = split(d_hi)   # bytes 4..7
    lo_w = lo_b.reshape(lo_b.shape[:-1] + (4, 4))
    hi_w = hi_b.reshape(hi_b.shape[:-1] + (4, 4))
    return jnp.concatenate([lo_w, hi_w], axis=-1).reshape(lo_b.shape[:-1] + (32,))


def verify_subchain(
    header_bytes: jax.Array,     # (n, S) uint8, zero-padded SCALE headers
    header_sizes: jax.Array,     # (n,) int32 (0 => padding slot)
    num_active: jax.Array,       # () int32 — headers trusted+1..=target
    trusted_hash: jax.Array,     # (32,) uint8
    trusted_block: jax.Array,    # () uint32
) -> SubchainResult:
    """Verify the chain and compute range commitments, fully batched.

    The caller shards `header_bytes`/`header_sizes` over the mesh batch
    axis; everything here is collective-safe under jit.
    """
    n, S = header_bytes.shape
    assert S % b2.CHUNK_BYTES == 0
    max_chunks = S // b2.CHUNK_BYTES

    # --- map: hash every header (Blake2b-256, variable length) -----------
    words = header_bytes.reshape(n, max_chunks, 16, 8)
    m_lo = (words[..., 0].astype(jnp.uint32)
            | (words[..., 1].astype(jnp.uint32) << 8)
            | (words[..., 2].astype(jnp.uint32) << 16)
            | (words[..., 3].astype(jnp.uint32) << 24))
    m_hi = (words[..., 4].astype(jnp.uint32)
            | (words[..., 5].astype(jnp.uint32) << 8)
            | (words[..., 6].astype(jnp.uint32) << 16)
            | (words[..., 7].astype(jnp.uint32) << 24))
    d_lo, d_hi = b2.blake2b256_variable(m_lo, m_hi, header_sizes.astype(jnp.uint32))
    hashes = _digest_planes_to_bytes32(d_lo, d_hi)          # (n, 32)

    # --- map: decode every header ----------------------------------------
    decoded = scale.decode_header_vec(header_bytes, header_sizes)

    idx = jnp.arange(n, dtype=jnp.int32)
    active = idx < num_active                                # (n,)

    # --- adjacency: parent_hash[i] == hash[i-1] (roll => collective-permute)
    prev_hash = jnp.roll(hashes, 1, axis=0)
    prev_hash = jnp.where((idx == 0)[:, None], trusted_hash[None, :], prev_hash)
    link_ok_each = jnp.all(decoded.parent_hash == prev_hash, axis=-1)
    links_ok = jnp.all(jnp.where(active, link_ok_each, True))

    # --- block numbers increment from trusted_block + 1 -------------------
    expected = trusted_block.astype(jnp.uint32) + jnp.uint32(1) + idx.astype(jnp.uint32)
    blocks_ok = jnp.all(jnp.where(active, decoded.block_number == expected, True))

    # --- target hash: hash of the last active header ----------------------
    last = jnp.maximum(num_active - 1, 0)
    target_hash = hashes[last]                               # (32,)

    # --- range commitments (zero leaves beyond num_active) ----------------
    state_leaves = jnp.where(active[:, None], decoded.state_root, 0).astype(jnp.uint8)
    data_leaves = jnp.where(active[:, None], decoded.data_root, 0).astype(jnp.uint8)
    state_words = _bytes32_to_words(state_leaves)            # (n, 8)
    data_words = _bytes32_to_words(data_leaves)

    state_root = _merkle_root_words(state_words)
    data_root = _merkle_root_words(data_words)

    return SubchainResult(
        target_hash_words=_bytes32_to_words(target_hash),
        state_root_words=state_root,
        data_root_words=data_root,
        links_ok=links_ok,
        blocks_sequential=blocks_ok,
    )


def _merkle_root_words(leaves: jax.Array) -> jax.Array:
    """(n, 8) -> (8,): simple Merkle tree, one batched SHA-256 per level."""
    nodes = leaves
    while nodes.shape[0] > 1:
        nodes = sha256_pair_words(nodes[0::2], nodes[1::2])
    return nodes[0]


# ---------------------------------------------------------------------------
# Host-side packing
# ---------------------------------------------------------------------------

def pack_headers(headers: list, tree_size: int, max_header_size: int):
    """SCALE header bytes -> padded (tree_size, S) buffer + sizes."""
    assert len(headers) <= tree_size
    S = max_header_size
    buf = np.zeros((tree_size, S), dtype=np.uint8)
    sizes = np.zeros((tree_size,), dtype=np.int32)
    for i, h in enumerate(headers):
        assert len(h) <= S
        buf[i, :len(h)] = np.frombuffer(h, dtype=np.uint8)
        sizes[i] = len(h)
    return buf, sizes
