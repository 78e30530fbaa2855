"""Rotate (authority-set handoff) verification — epoch-end header checks.

Parity with the reference's `RotateMethods` (/root/reference/circuits/
builder/rotate.rs):

- `verify_consensus_log` (:74-94): digest prefix byte 1 == 0x04 (Consensus)
  and bytes 2..6 == b"FRNK";
- `verify_scheduled_change_message_length_and_flag` (:96-136): skip the
  compact-encoded message length, require the ScheduledChange enum flag 0x01;
- `verify_encoded_num_authorities` (:138-167): the compact-encoded new
  authority count must equal the witnessed count;
- `verify_epoch_end_header` (:169-276): each active validator slot must be
  (pubkey_i || weight 1u64 LE), followed by delay == 0u32 after the last;
- `rotate` (:278-323): hash header, verify justification by the CURRENT
  set, verify the epoch-end encoding, output the NEW set's chained hash.

Dynamic offsets (`start_position`, prefix cursor) are data-dependent
gathers — the TPU-native equivalent of the reference's RLC-seeded
`get_fixed_subarray` (soundness there came from the random challenge; here
the gather is computed directly in the tensor program, so correctness is
structural).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import scale
from .commitments import authority_set_hash_vec, _words_to_bytes32
from .consts import (CONSENSUS_ENGINE_ID_PREFIX_LENGTH, DELAY_LENGTH,
                     MAX_COMPACT_UINT_BYTES, MAX_PREFIX_LENGTH, PUBKEY_LENGTH,
                     VALIDATOR_LENGTH, WEIGHT_LENGTH)


def _window(arr: jax.Array, start: jax.Array, size: int) -> jax.Array:
    """Dynamic-offset window gather: arr (..., S) -> (..., size)."""
    idx = start[..., None] + jnp.arange(size, dtype=jnp.int32)
    return jnp.take_along_axis(arr, idx, axis=-1)


def verify_epoch_end_header(
    header_bytes: jax.Array,    # (S,) uint8
    num_authorities: jax.Array,  # () int32
    start_position: jax.Array,   # () int32 — consensus-log digest offset
    new_pubkeys: jax.Array,      # (MAX_N, 32) uint8
) -> jax.Array:
    """Returns () bool. Mirrors rotate.rs:169-276."""
    max_n = new_pubkeys.shape[0]
    ok = num_authorities > 0

    prefix = _window(header_bytes[None], start_position[None], MAX_PREFIX_LENGTH)[0]

    # consensus log: flag 0x04 + engine id "FRNK" (rotate.rs:74-94)
    ok = ok & (prefix[1] == 4)
    ok = ok & jnp.all(prefix[2:6] == jnp.asarray([70, 82, 78, 75], jnp.uint8))

    # scheduled-change message length (value unchecked) + flag 0x01
    msg_len = scale.decode_compact_u32_vec(
        prefix[None, CONSENSUS_ENGINE_ID_PREFIX_LENGTH:
               CONSENSUS_ENGINE_ID_PREFIX_LENGTH + MAX_COMPACT_UINT_BYTES])
    cursor = jnp.int32(CONSENSUS_ENGINE_ID_PREFIX_LENGTH) + msg_len.length[0]
    ok = ok & (prefix[cursor] == 1)
    cursor = cursor + 1

    # encoded new-authority-set size must equal the witnessed count
    enc_n = _window(prefix[None], cursor[None], MAX_COMPACT_UINT_BYTES)[0]
    dec_n = scale.decode_compact_u32_vec(enc_n[None])
    ok = ok & (dec_n.value[0] == num_authorities.astype(jnp.uint32))
    total_prefix_length = cursor + dec_n.length[0]

    # validator records: (pubkey || weight=1u64 LE) x n, then delay=0u32
    sub_size = max_n * VALIDATOR_LENGTH + DELAY_LENGTH
    sub = _window(header_bytes[None],
                  (start_position + total_prefix_length)[None], sub_size)[0]
    recs = sub[:max_n * VALIDATOR_LENGTH].reshape(max_n, VALIDATOR_LENGTH)
    active = jnp.arange(max_n, dtype=jnp.int32) < num_authorities

    pk_match = jnp.all(recs[:, :PUBKEY_LENGTH] == new_pubkeys, axis=-1)
    expected_weight = jnp.asarray([1, 0, 0, 0, 0, 0, 0, 0], jnp.uint8)
    wt_match = jnp.all(recs[:, PUBKEY_LENGTH:] == expected_weight, axis=-1)
    ok = ok & jnp.all(jnp.where(active, pk_match & wt_match, True))

    # delay bytes directly after the last validator record
    delay = _window(sub[None],
                    (num_authorities * VALIDATOR_LENGTH)[None], DELAY_LENGTH)[0]
    ok = ok & jnp.all(delay == 0)
    return ok


def new_authority_set_hash(new_pubkeys: jax.Array,
                           num_authorities: jax.Array) -> jax.Array:
    """(32,) uint8 — chained SHA-256 over the new set (rotate.rs:319-322)."""
    return _words_to_bytes32(authority_set_hash_vec(new_pubkeys, num_authorities))


# ---------------------------------------------------------------------------
# Host-side witness preparation (locating the ScheduledChange log)
# ---------------------------------------------------------------------------

def find_scheduled_change(header_bytes: bytes):
    """Locate the GRANDPA ScheduledChange consensus log in a SCALE header.

    Returns (start_position, num_authorities, pubkeys) or None — the
    host-side mirror of the reference's `get_header_rotate` hint
    (input/mod.rs:835-968). start_position points at the digest item's
    *first byte* (the byte before the 0x04 consensus flag, matching the
    prefix layout the circuit checks).
    """
    data = header_bytes
    # scan for the pattern 0x04 'F' 'R' 'N' 'K' then a ScheduledChange
    for pos in range(1, len(data) - 6):
        if data[pos] == 0x04 and data[pos + 1:pos + 5] == b"FRNK":
            cursor = pos + 5
            try:
                _, _, clen = scale.decode_compact_u32(data[cursor:cursor + 5])
            except Exception:
                continue
            cursor += clen
            if cursor >= len(data) or data[cursor] != 0x01:
                continue  # not a ScheduledChange message
            cursor += 1
            try:
                n_auth, _, clen2 = scale.decode_compact_u32(data[cursor:cursor + 5])
            except Exception:
                continue
            cursor += clen2
            end = cursor + n_auth * VALIDATOR_LENGTH + DELAY_LENGTH
            if end > len(data):
                continue
            pubkeys = [data[cursor + i * VALIDATOR_LENGTH:
                            cursor + i * VALIDATOR_LENGTH + PUBKEY_LENGTH]
                       for i in range(n_auth)]
            # validate weights + delay like the hint does (input/mod.rs:900-950)
            weights_ok = all(
                data[cursor + i * VALIDATOR_LENGTH + PUBKEY_LENGTH:
                     cursor + (i + 1) * VALIDATOR_LENGTH]
                == b"\x01\x00\x00\x00\x00\x00\x00\x00"
                for i in range(n_auth))
            delay_ok = data[end - DELAY_LENGTH:end] == b"\x00" * DELAY_LENGTH
            if weights_ok and delay_ok:
                return pos - 1, n_auth, pubkeys
    return None
