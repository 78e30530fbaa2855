"""SCALE codec for the VectorX circuits — host (exact) + vectorized decode.

Parity targets in the reference:
- compact-u32 decode (4 candidate widths muxed by the 2-bit mode):
  /root/reference/circuits/builder/decoder.rs:39-103
- header decode {parent_hash, block_number, state_root, data_root}:
  decoder.rs:104-157 (state_root offset muxed by compact length; data_root =
  last 32 bytes of the variable-length header)
- precommit decode (53-byte layout, LE fields): decoder.rs:159-200 and
  input/mod.rs:262-290

The vectorized decoders operate on uint8 byte tensors with traced values but
static shapes, so they batch across headers/precommits and run inside jit on
TPU. One-hot muxes (mode/offset selection) are expressed as jnp.where chains
— XLA lowers these to selects over VPU lanes (the TPU analogue of the
reference's `select_array_random_gate` random-access gate).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .consts import (
    DATA_ROOT_OFFSET_FROM_END,
    ENCODED_PRECOMMIT_LENGTH,
    HASH_SIZE,
    MAX_COMPACT_UINT_BYTES,
)

# ---------------------------------------------------------------------------
# Host-side exact codec (witness generation / oracles)
# ---------------------------------------------------------------------------

def encode_compact_u32(v: int) -> bytes:
    """SCALE compact encoding of a u32 (substrate spec)."""
    assert 0 <= v <= 0xFFFFFFFF
    if v < 1 << 6:
        return bytes([v << 2])
    if v < 1 << 14:
        return ((v << 2) | 0b01).to_bytes(2, "little")
    if v < 1 << 30:
        return ((v << 2) | 0b10).to_bytes(4, "little")
    n_bytes = (v.bit_length() + 7) // 8
    return bytes([((n_bytes - 4) << 2) | 0b11]) + v.to_bytes(n_bytes, "little")


def decode_compact_u32(data: bytes) -> Tuple[int, int, int]:
    """-> (value, mode, encoded_length)."""
    mode = data[0] & 0b11
    if mode == 0:
        return data[0] >> 2, 0, 1
    if mode == 1:
        return int.from_bytes(data[:2], "little") >> 2, 1, 2
    if mode == 2:
        return int.from_bytes(data[:4], "little") >> 2, 2, 4
    n = (data[0] >> 2) + 4
    return int.from_bytes(data[1:1 + n], "little"), 3, 1 + n


def decode_header_bytes(header: bytes) -> dict:
    """Exact header field extraction (witness-side oracle)."""
    parent_hash = header[0:HASH_SIZE]
    block_number, mode, clen = decode_compact_u32(header[HASH_SIZE:HASH_SIZE + MAX_COMPACT_UINT_BYTES])
    state_root = header[HASH_SIZE + clen: HASH_SIZE + clen + HASH_SIZE]
    data_root = header[len(header) - DATA_ROOT_OFFSET_FROM_END:]
    return dict(parent_hash=parent_hash, block_number=block_number,
                state_root=state_root, data_root=data_root)


def decode_precommit_bytes(precommit: bytes) -> Tuple[bytes, int, int, int]:
    """Exact 53-byte precommit decode -> (block_hash, block_nb, round, set_id).

    Parity: input/mod.rs:262-290 (asserts leading byte == 1).
    """
    assert len(precommit) == ENCODED_PRECOMMIT_LENGTH
    assert precommit[0] == 1
    block_hash = precommit[1:33]
    block_number = int.from_bytes(precommit[33:37], "little")
    round_ = int.from_bytes(precommit[37:45], "little")
    authority_set_id = int.from_bytes(precommit[45:53], "little")
    return block_hash, block_number, round_, authority_set_id


def encode_precommit_bytes(block_hash: bytes, block_number: int, round_: int,
                           authority_set_id: int) -> bytes:
    """The signed GRANDPA precommit message (indexer builds this:
    /root/reference/bin/indexer.rs:63-68)."""
    return (bytes([1]) + block_hash + block_number.to_bytes(4, "little")
            + round_.to_bytes(8, "little") + authority_set_id.to_bytes(8, "little"))


# ---------------------------------------------------------------------------
# Vectorized decoders (uint8 tensors, static shapes)
# ---------------------------------------------------------------------------

class DecodedCompact(NamedTuple):
    value: jax.Array        # uint32
    mode: jax.Array         # int32 in {0,1,2,3}
    length: jax.Array       # int32 in {1,2,4,5}


def decode_compact_u32_vec(b: jax.Array) -> DecodedCompact:
    """b: (..., 5) uint8 -> decoded compact u32 (batched).

    Mode 3 supports only 4-byte payloads (block numbers are u32) — same
    restriction the reference enforces (decoder.rs:81-89).
    """
    b = b.astype(jnp.uint32)
    mode = (b[..., 0] & 3).astype(jnp.int32)
    v0 = b[..., 0] >> 2
    v1 = (b[..., 0] >> 2) | (b[..., 1] << 6)
    v2 = ((b[..., 0] >> 2) | (b[..., 1] << 6) | (b[..., 2] << 14)
          | (b[..., 3] << 22))
    v3 = (b[..., 1] | (b[..., 2] << 8) | (b[..., 3] << 16) | (b[..., 4] << 24))
    value = jnp.where(mode == 0, v0,
             jnp.where(mode == 1, v1,
              jnp.where(mode == 2, v2, v3)))
    length = jnp.where(mode == 0, 1,
              jnp.where(mode == 1, 2,
               jnp.where(mode == 2, 4, 5))).astype(jnp.int32)
    return DecodedCompact(value=value, mode=mode, length=length)


class DecodedHeader(NamedTuple):
    block_number: jax.Array   # (...,) uint32
    parent_hash: jax.Array    # (..., 32) uint8
    state_root: jax.Array     # (..., 32) uint8
    data_root: jax.Array      # (..., 32) uint8


def decode_header_vec(header_bytes: jax.Array, header_size: jax.Array) -> DecodedHeader:
    """header_bytes: (..., S) uint8 zero-padded; header_size: (...,) int32.

    Matches decoder.rs:104-157: parent hash at [0,32); compact block number
    at 32; state root at one of 4 offsets selected by the compact mode;
    data root = bytes [size-32, size) via a dynamic-offset gather.
    """
    parent_hash = header_bytes[..., :HASH_SIZE]
    compact = decode_compact_u32_vec(
        header_bytes[..., HASH_SIZE:HASH_SIZE + MAX_COMPACT_UINT_BYTES])

    # state root: offset 32 + {1, 2, 4, 5}
    offsets = [33, 34, 36, 37]
    candidates = [header_bytes[..., o:o + HASH_SIZE] for o in offsets]
    mode = compact.mode[..., None]
    state_root = jnp.where(mode == 0, candidates[0],
                  jnp.where(mode == 1, candidates[1],
                   jnp.where(mode == 2, candidates[2], candidates[3])))

    # data root: dynamic window [size-32, size). One-hot × matrix would burn
    # HBM at S=35840; take_along_axis gather is the TPU-friendly form.
    start = jnp.maximum(header_size - DATA_ROOT_OFFSET_FROM_END, 0)
    idx = start[..., None] + jnp.arange(HASH_SIZE, dtype=header_size.dtype)
    data_root = jnp.take_along_axis(header_bytes, idx, axis=-1)

    return DecodedHeader(block_number=compact.value, parent_hash=parent_hash,
                         state_root=state_root, data_root=data_root)


class DecodedPrecommit(NamedTuple):
    block_hash: jax.Array       # (..., 32) uint8
    block_number: jax.Array     # (...,) uint32
    round: Tuple[jax.Array, jax.Array]            # u64 as (lo, hi) uint32
    authority_set_id: Tuple[jax.Array, jax.Array]  # u64 as (lo, hi) uint32
    valid: jax.Array            # (...,) bool — leading byte == 1


def _le_u32(b: jax.Array) -> jax.Array:
    b = b.astype(jnp.uint32)
    return b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16) | (b[..., 3] << 24)


def decode_precommit_vec(p: jax.Array) -> DecodedPrecommit:
    """p: (..., 53) uint8 -> decoded precommit (batched)."""
    valid = p[..., 0] == 1
    block_hash = p[..., 1:33]
    block_number = _le_u32(p[..., 33:37])
    round_ = (_le_u32(p[..., 37:41]), _le_u32(p[..., 41:45]))
    set_id = (_le_u32(p[..., 45:49]), _le_u32(p[..., 49:53]))
    return DecodedPrecommit(block_hash=block_hash, block_number=block_number,
                            round=round_, authority_set_id=set_id, valid=valid)
