"""GRANDPA justification verification — batched, device-resident.

Parity with the reference's `verify_simple_justification`
(/root/reference/circuits/builder/justification.rs:195-257):

  1. chained authority-set commitment must equal the trusted hash
     (:214-218, chained SHA-256 with active masking);
  2. the 53-byte precommit must decode to the expected block number /
     authority-set id / block hash (:221-224);
  3. every signature flagged `validator_signed` must verify over the shared
     precommit message (:237-243 — here ONE batched Ed25519 tensor pass);
  4. more than 2/3 of the active authorities signed
     (:164-186: num_signed * 3 > num_active * 2, equal voting power).

EdDSA challenges (SHA-512(R||A||M) mod L) arrive as witness input — hashing
is on-device (hashes/sha512.py); the mod-L reduction is host-side for now
(circuits/ed25519.py seam; sc_reduce lands with the AIR).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import scale
from . import ed25519 as ed
from .commitments import authority_set_hash_vec, _words_to_bytes32
from .consts import ENCODED_PRECOMMIT_LENGTH


class JustificationData(NamedTuple):
    """Witness data, canonically ordered (the indexer's record)."""
    pubkeys: jax.Array            # (N, 32) uint8
    signatures: jax.Array         # (N, 64) uint8 (dummy on unsigned lanes)
    validator_signed: jax.Array   # (N,) bool
    num_authorities: jax.Array    # () int32
    encoded_precommit: jax.Array  # (53,) uint8
    challenges: jax.Array         # (N, 32) uint8 — SHA512(R||A||M) mod L, LE


def verify_simple_justification(
    block_number: jax.Array,        # () uint32
    block_hash: jax.Array,          # (32,) uint8
    authority_set_id: jax.Array,    # ((), ()) (lo, hi) uint32
    authority_set_hash: jax.Array,  # (32,) uint8
    j: JustificationData,
) -> jax.Array:
    """Returns () bool — all four checks hold."""
    # 1. authority-set commitment
    commit_words = authority_set_hash_vec(j.pubkeys, j.num_authorities)
    commit_bytes = _words_to_bytes32(commit_words)
    ok = jnp.all(commit_bytes == authority_set_hash)

    # 2. precommit decode + match
    dec = scale.decode_precommit_vec(j.encoded_precommit[None])
    ok = ok & dec.valid[0]
    ok = ok & (dec.block_number[0] == block_number)
    ok = ok & (dec.authority_set_id[0][0] == authority_set_id[0])
    ok = ok & (dec.authority_set_id[1][0] == authority_set_id[1])
    ok = ok & jnp.all(dec.block_hash[0] == block_hash)

    # 3. conditional batch EdDSA over the shared message
    sig_ok = ed.verify_batch(
        j.pubkeys, j.signatures[:, :32], j.signatures[:, 32:],
        j.challenges, j.validator_signed)
    ok = ok & jnp.all(sig_ok)

    # 4. threshold: num_signed * 3 > num_active * 2
    num_signed = jnp.sum(j.validator_signed.astype(jnp.uint32))
    ok = ok & (num_signed * 3 > j.num_authorities.astype(jnp.uint32) * 2)
    return ok


# ---------------------------------------------------------------------------
# Host-side witness preparation
# ---------------------------------------------------------------------------

def prepare_justification(pubkeys_hex, signatures_hex, validator_signed,
                          num_authorities: int, encoded_precommit: bytes,
                          max_authorities: int) -> JustificationData:
    """Pad an indexer record to the static MAX width and precompute
    challenges (mirrors get_justification_from_block's padding,
    input/mod.rs:789-829)."""
    n = max_authorities
    pk = np.zeros((n, 32), np.uint8)
    sg = np.zeros((n, 64), np.uint8)
    vs = np.zeros((n,), bool)
    for i, (p, s) in enumerate(zip(pubkeys_hex, signatures_hex)):
        pk[i] = np.frombuffer(bytes.fromhex(p), np.uint8)
        sg[i] = np.frombuffer(bytes.fromhex(s), np.uint8)
        vs[i] = bool(validator_signed[i])

    ch = ed.compute_challenges(
        [sg[i, :32].tobytes() for i in range(n)],
        [pk[i].tobytes() for i in range(n)],
        encoded_precommit)

    return JustificationData(
        pubkeys=jnp.asarray(pk), signatures=jnp.asarray(sg),
        validator_signed=jnp.asarray(vs),
        num_authorities=jnp.int32(num_authorities),
        encoded_precommit=jnp.asarray(np.frombuffer(encoded_precommit, np.uint8)),
        challenges=jnp.asarray(ch))
