"""header_range + rotate — full statement pipelines (witness-level).

The complete computation of the reference's two circuits
(/root/reference/circuits/header_range.rs:26-59, rotate.rs:80-109), as ONE
jittable device program each: subchain verification (Blake2b hashing +
SCALE decode + adjacency + range commitments, sharded over the mesh) plus
GRANDPA justification verification (chained authority hash, precommit
decode, batched Ed25519, 2/3 threshold), emitting the exact public outputs
the on-chain contract consumes (96-byte / 32-byte ABI).

This is the "execute the statement" layer: it generates every intermediate
tensor the STARK AIRs constrain, and doubles as the high-throughput
non-ZK prover (the reference's dummy programs only *fetch* these values;
here they are recomputed and checked).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel import subchain
from . import justification as just
from . import rotate as rot
from .commitments import _words_to_bytes32


class HeaderRangeResult(NamedTuple):
    target_header_hash: jax.Array    # (32,) uint8
    state_root_commitment: jax.Array  # (32,) uint8
    data_root_commitment: jax.Array  # (32,) uint8
    ok: jax.Array                    # () bool — every check passed


def header_range(
    # public inputs (evm_read order, header_range.rs:32-36)
    trusted_block: jax.Array,        # () uint32
    trusted_header_hash: jax.Array,  # (32,) uint8
    authority_set_id,                # ((), ()) uint32 (lo, hi)
    authority_set_hash: jax.Array,   # (32,) uint8
    target_block: jax.Array,         # () uint32
    # witness
    header_bytes: jax.Array,         # (tree_size, S) uint8
    header_sizes: jax.Array,         # (tree_size,) int32
    j: just.JustificationData,
) -> HeaderRangeResult:
    num_active = (target_block - trusted_block).astype(jnp.int32)

    sub = subchain.verify_subchain(header_bytes, header_sizes, num_active,
                                   trusted_header_hash, trusted_block)
    target_hash = _words_to_bytes32(sub.target_hash_words)

    j_ok = just.verify_simple_justification(
        target_block, target_hash, authority_set_id, authority_set_hash, j)

    ok = sub.links_ok & sub.blocks_sequential & j_ok
    return HeaderRangeResult(
        target_header_hash=target_hash,
        state_root_commitment=_words_to_bytes32(sub.state_root_words),
        data_root_commitment=_words_to_bytes32(sub.data_root_words),
        ok=ok)


class RotateResult(NamedTuple):
    new_authority_set_hash: jax.Array  # (32,) uint8
    ok: jax.Array                      # () bool


def rotate(
    # public inputs (rotate.rs:87-88)
    current_authority_set_id,          # ((), ()) uint32 (lo, hi)
    current_authority_set_hash: jax.Array,  # (32,) uint8
    # witness (RotateHint output, rotate.rs:17-65)
    epoch_end_block_number: jax.Array,  # () uint32
    header_bytes: jax.Array,            # (S,) uint8
    header_size: jax.Array,             # () int32
    num_authorities: jax.Array,         # () int32
    start_position: jax.Array,          # () int32
    new_pubkeys: jax.Array,             # (MAX_N, 32) uint8
    j: just.JustificationData,
) -> RotateResult:
    from ..hashes import blake2b as b2

    # hash the epoch-end header (rotate.rs:295)
    S = header_bytes.shape[0]
    words = header_bytes.reshape(S // 128, 16, 8)
    m_lo = (words[..., 0].astype(jnp.uint32) | (words[..., 1].astype(jnp.uint32) << 8)
            | (words[..., 2].astype(jnp.uint32) << 16) | (words[..., 3].astype(jnp.uint32) << 24))
    m_hi = (words[..., 4].astype(jnp.uint32) | (words[..., 5].astype(jnp.uint32) << 8)
            | (words[..., 6].astype(jnp.uint32) << 16) | (words[..., 7].astype(jnp.uint32) << 24))
    d_lo, d_hi = b2.blake2b256_variable(m_lo[None], m_hi[None],
                                        header_size.astype(jnp.uint32)[None])
    target_hash = subchain._digest_planes_to_bytes32(d_lo, d_hi)[0]

    # justification by the CURRENT authority set (rotate.rs:299-304)
    j_ok = just.verify_simple_justification(
        epoch_end_block_number, target_hash, current_authority_set_id,
        current_authority_set_hash, j)

    # epoch-end encoding checks (rotate.rs:308-314)
    enc_ok = rot.verify_epoch_end_header(header_bytes, num_authorities,
                                         start_position, new_pubkeys)

    new_hash = rot.new_authority_set_hash(new_pubkeys, num_authorities)
    return RotateResult(new_authority_set_hash=new_hash, ok=j_ok & enc_ok)
