"""Sharded Ed25519 STARK proving for GRANDPA justifications.

Bridges the witness-level justification record (circuits/justification.py)
to the Ed25519 verification AIR: lanes are packed 2^(B-8) signatures per
2^B-row trace shard (disabled lanes get the self-satisfying dummy), each
shard proves independently — the reference's conditional 300-signature
Curta EdDSA STARK (justification.rs:237-243) becomes a set of data-parallel
DEEP-ALI proofs that map across devices exactly like the header MapReduce
shards (parallel/map_prove.py; SURVEY.md §2.3.2).
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence, Tuple

from ..circuits.ed25519 import L_ORDER
from ..field import goldilocks as gl
from . import prover, verifier
from .air_ed25519 import Ed25519VerifyAir, dummy_sig

Sig = Tuple[bytes, bytes, int, int]


def sigs_from_justification(pubkeys: Sequence[bytes],
                            signatures: Sequence[bytes],
                            signed: Sequence[bool],
                            message: bytes) -> List[Sig]:
    """Signed lanes -> (A, R, s, h) statements; unsigned lanes -> dummy.

    h = SHA-512(R ‖ A ‖ M) mod L is public (computable from public data),
    mirroring the ed25519-dalek verify the reference uses as its oracle
    (input/mod.rs:241-247)."""
    out: List[Sig] = []
    for pk, sg, en in zip(pubkeys, signatures, signed):
        if not en:
            out.append(dummy_sig())
            continue
        r_bytes, s_bytes = bytes(sg[:32]), bytes(sg[32:])
        s = int.from_bytes(s_bytes, "little")
        assert s < L_ORDER, "non-canonical s (malleable signature)"
        h = int.from_bytes(
            hashlib.sha512(r_bytes + bytes(pk) + message).digest(),
            "little") % L_ORDER
        out.append((bytes(pk), r_bytes, s, h))
    return out


def shard_sigs(sigs: Sequence[Sig], B: int) -> List[List[Sig]]:
    per = 1 << (B - 8)
    shards = []
    for i in range(0, len(sigs), per):
        shards.append(list(sigs[i:i + per]))
    return shards


def prove_sigs(sigs: Sequence[Sig], B: int,
               config: prover.StarkConfig,
               devices=None) -> List[Tuple[Ed25519VerifyAir,
                                           prover.StarkProof, List[int]]]:
    """-> per-shard (air, proof, publics). Shards round-robin across
    devices; async dispatch overlaps their kernel streams."""
    import jax
    devices = devices or jax.devices()
    out = []
    for i, shard in enumerate(shard_sigs(sigs, B)):
        air = Ed25519VerifyAir(shard, B=B)
        trace, publics = air.make_trace_vec()
        dev = devices[i % len(devices)]
        trace_d = jax.device_put(trace, dev)
        pubs_d = [jax.device_put(gl.to_fp(p), dev) for p in publics]
        proof = prover.prove(air, trace_d, pubs_d, config)
        out.append((air, proof, publics))
    return out


def verify_sigs(shards: Sequence[Tuple[Ed25519VerifyAir, prover.StarkProof,
                                       List[int]]],
                config: prover.StarkConfig) -> bool:
    ok = True
    for air, proof, publics in shards:
        pubs = [gl.to_fp(p) for p in publics]
        ok = ok and bool(verifier.verify(air, proof, pubs, air.B, config))
    return ok
