"""Public-input commitments — bit-exact parity with the reference chain.

Three SHA-256-based commitments fix the on-chain ABI:

1. **Chained authority-set hash**: h_i = sha256(h_{i-1} || pubkey_i), h_{-1}
   empty — /root/reference/circuits/input/mod.rs:250-260 and the in-circuit
   `compute_authority_set_commitment` (builder/justification.rs:127-162).
2. **Simple Merkle root**: unhashed 32-byte leaves zero-padded to a power of
   two, SHA-256 internal nodes — input/mod.rs:464-489 and
   `get_root_from_hashed_leaves` (SURVEY.md §2.2).
3. **state/data root range commitments**: the simple Merkle roots over the
   per-block state/data roots of (trusted, target] padded with zero leaves
   to the tree size — input/mod.rs:493-528.

Host versions (hashlib, exact) for witness/oracle; vectorized versions (our
batched SHA-256 kernel) for on-device trace generation. Both must agree
bit-for-bit — tests enforce it.
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..hashes import sha256 as s2


# ---------------------------------------------------------------------------
# Host-side (exact)
# ---------------------------------------------------------------------------

def authority_set_hash(pubkeys: Sequence[bytes]) -> bytes:
    """Chained SHA-256 over 32-byte Ed25519 pubkeys."""
    h = b""
    for pk in pubkeys:
        assert len(pk) == 32
        h = hashlib.sha256(h + pk).digest()
    return h


def simple_merkle_root(leaves: Sequence[bytes]) -> bytes:
    """VectorX simple Merkle root: zero-pad to pow2, unhashed leaves."""
    if not leaves:
        return b""
    nodes: List[bytes] = [bytes(l) for l in leaves]
    assert all(len(l) == 32 for l in nodes)
    while len(nodes) & (len(nodes) - 1):
        nodes.append(b"\x00" * 32)
    while len(nodes) > 1:
        nodes = [hashlib.sha256(nodes[2 * i] + nodes[2 * i + 1]).digest()
                 for i in range(len(nodes) // 2)]
    return nodes[0]


def range_commitments(state_roots: Sequence[bytes], data_roots: Sequence[bytes],
                      tree_size: int) -> tuple:
    """(state_root_commitment, data_root_commitment) for (trusted, target].

    Roots are for blocks trusted+1..=target, zero-padded to tree_size.
    """
    assert tree_size & (tree_size - 1) == 0
    assert len(state_roots) == len(data_roots) <= tree_size
    pad = [b"\x00" * 32] * (tree_size - len(state_roots))
    return (simple_merkle_root(list(state_roots) + pad),
            simple_merkle_root(list(data_roots) + pad))


# ---------------------------------------------------------------------------
# Vectorized (on-device)
# ---------------------------------------------------------------------------

def _bytes32_to_words(b: jax.Array) -> jax.Array:
    """(..., 32) uint8 -> (..., 8) uint32 BE words."""
    b = b.astype(jnp.uint32)
    r = b.reshape(b.shape[:-1] + (8, 4))
    return (r[..., 0] << 24) | (r[..., 1] << 16) | (r[..., 2] << 8) | r[..., 3]


def _words_to_bytes32(w: jax.Array) -> jax.Array:
    """(..., 8) uint32 BE words -> (..., 32) uint8."""
    parts = [((w >> jnp.uint32(s)) & jnp.uint32(0xFF)).astype(jnp.uint8)
             for s in (24, 16, 8, 0)]
    return jnp.stack(parts, axis=-1).reshape(w.shape[:-1] + (32,))


def _pad_block_64B() -> np.ndarray:
    """Second block of a 64-byte message: 0x80 marker + bit length 512."""
    w = np.zeros(16, dtype=np.uint32)
    w[0] = 0x80000000
    w[15] = 512
    return w


@jax.jit
def sha256_pair_words(left: jax.Array, right: jax.Array) -> jax.Array:
    """sha256(left || right) on (..., 8)-word inputs -> (..., 8) words."""
    block0 = jnp.concatenate([left, right], axis=-1)
    block1 = jnp.broadcast_to(jnp.asarray(_pad_block_64B()), block0.shape)
    blocks = jnp.stack([block0, block1], axis=-2)
    return s2.sha256_blocks(blocks)


def simple_merkle_root_vec(leaves: jax.Array) -> jax.Array:
    """(n, 8)-word leaves (n a power of two) -> (8,) root words.

    One batched SHA-256 per level — the whole level hashes in parallel.
    """
    nodes = leaves
    while nodes.shape[0] > 1:
        nodes = sha256_pair_words(nodes[0::2], nodes[1::2])
    return nodes[0]


@jax.jit
def authority_set_hash_vec(pubkeys: jax.Array, num_active: jax.Array) -> jax.Array:
    """Chained authority-set hash with active masking, on-device.

    pubkeys: (n, 32) uint8; num_active: () int32 — only the first num_active
    keys contribute (mirrors the select-masking in justification.rs:127-162).
    Returns (8,) digest words (the hash after num_active steps).
    """
    n = pubkeys.shape[0]
    pk_words = _bytes32_to_words(pubkeys)  # (n, 8)

    # step 0: sha256(pk_0) — a 32-byte message (1 block)
    blk = jnp.zeros((16,), jnp.uint32)
    blk = blk.at[:8].set(pk_words[0]).at[8].set(jnp.uint32(0x80000000))
    blk = blk.at[15].set(jnp.uint32(256))
    h0 = s2.sha256_blocks(blk[None, :])  # (8,)

    def step(h, inp):
        i, pk = inp
        new = sha256_pair_words(h, pk)
        keep = i < num_active
        return jnp.where(keep, new, h), None

    idx = jnp.arange(1, n, dtype=jnp.int32)
    h, _ = jax.lax.scan(step, h0, (idx, pk_words[1:]))
    # num_active == 0 -> empty hash chain -> b"" (represented as zeros)
    h = jnp.where(num_active > 0, h, jnp.zeros_like(h))
    return h
