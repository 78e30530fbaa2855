"""Justification indexer — verifies GRANDPA justifications, stores them.

Behavioral parity with /root/reference/bin/indexer.rs: subscribe to
``grandpa_subscribeJustifications``, rebuild the 53-byte signed precommit
message, verify every precommit signature, require >2/3 of the authority
set, align signatures to the canonical authority ordering with dummy-filled
unsigned lanes, and persist the record.

Signature verification runs through OUR batched device verifier
(circuits/ed25519.py) — the reference verifies one-by-one on CPU
(indexer.rs:73-92); here the whole precommit set is one tensor batch.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import List, Optional, Protocol, Sequence, Tuple

import numpy as np

from ..circuits import scale
from ..circuits import ed25519 as ed
from .store import InMemoryStore, StoredJustification

log = logging.getLogger("vectorx.indexer")

DUMMY_SIGNATURE = bytes(64)  # unsigned-lane filler (never verified)


@dataclass
class Justification:
    """Decoded GRANDPA justification (commit + per-precommit sigs)."""
    round: int
    block_hash: bytes       # commit target
    block_number: int
    authority_set_id: int
    precommit_pubkeys: List[bytes]
    precommit_signatures: List[bytes]


class JustificationSource(Protocol):
    async def next_justification(self) -> Justification: ...
    async def get_authorities(self, block: int) -> List[bytes]: ...


def build_signed_message(block_hash: bytes, block_number: int, round_: int,
                         authority_set_id: int) -> bytes:
    """SCALE encode of (PrecommitMessage(precommit), round, set_id) —
    the 53-byte message every authority signs (indexer.rs:63-68)."""
    return scale.encode_precommit_bytes(block_hash, block_number, round_,
                                        authority_set_id)


def verify_justification(
    j: Justification,
    authorities: Sequence[bytes],
    use_device: bool = True,
) -> Optional[StoredJustification]:
    """Verify + canonicalize a justification; None if below threshold.

    Mirrors indexer.rs:63-141 (including the equal-voting-power 2/3 rule
    ``signed_count > (n * 2) / 3``).
    """
    import jax.numpy as jnp

    msg = build_signed_message(j.block_hash, j.block_number, j.round,
                               j.authority_set_id)

    n = len(j.precommit_pubkeys)
    if n == 0:
        return None

    if use_device:
        pk = jnp.asarray(np.stack([np.frombuffer(p, np.uint8) for p in j.precommit_pubkeys]))
        r = jnp.asarray(np.stack([np.frombuffer(s[:32], np.uint8) for s in j.precommit_signatures]))
        s = jnp.asarray(np.stack([np.frombuffer(s[32:], np.uint8) for s in j.precommit_signatures]))
        h = jnp.asarray(ed.compute_challenges(
            [sig[:32] for sig in j.precommit_signatures], j.precommit_pubkeys, msg))
        ok = np.asarray(ed.verify_batch(pk, r, s, h, jnp.ones((n,), bool)))
    else:
        from cryptography.hazmat.primitives.asymmetric.ed25519 import Ed25519PublicKey
        ok = []
        for p, sig in zip(j.precommit_pubkeys, j.precommit_signatures):
            try:
                Ed25519PublicKey.from_public_bytes(p).verify(sig, msg)
                ok.append(True)
            except Exception:
                ok.append(False)
        ok = np.asarray(ok)

    pubkey_to_sig = {
        p: sig for p, sig, valid in
        zip(j.precommit_pubkeys, j.precommit_signatures, ok) if valid
    }

    num_authorities = len(authorities)
    signed_count = len(pubkey_to_sig)
    if signed_count <= (num_authorities * 2) // 3:  # indexer.rs:103-111
        return None

    pubkeys, signatures, validator_signed = [], [], []
    for auth in authorities:  # canonical order (indexer.rs:117-127)
        sig = pubkey_to_sig.get(auth)
        pubkeys.append(auth.hex())
        signatures.append((sig if sig is not None else DUMMY_SIGNATURE).hex())
        validator_signed.append(sig is not None)

    return StoredJustification(
        block_number=j.block_number,
        signed_message=msg.hex(),
        pubkeys=pubkeys,
        signatures=signatures,
        num_authorities=num_authorities,
        validator_signed=validator_signed,
    )


async def run(source: JustificationSource, store: InMemoryStore) -> None:
    """Main loop (indexer.rs:15-143)."""
    while True:
        j = await source.next_justification()
        authorities = await source.get_authorities(j.block_number - 1)
        stored = verify_justification(j, authorities)
        if stored is None:
            log.info("justification for block %d below threshold", j.block_number)
            continue
        store.add_justification(stored)
        log.info("stored justification for block %d (%d/%d signed)",
                 j.block_number, sum(stored.validator_signed), stored.num_authorities)
