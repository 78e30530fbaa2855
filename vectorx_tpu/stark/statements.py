"""Full-statement STARK bundles — header_range proven end to end.

The reference's HeaderRangeCircuit (/root/reference/circuits/header_range.rs
:26-59) composes Curta STARK gadgets (Blake2b, chained SHA-256, EdDSA)
under one recursive plonky2 proof. The TPU-native equivalent, pre-
recursion, is a **bundle of DEEP-ALI STARKs whose public values interlock**:

  per header i in (trusted, target] ......... HeaderAir proof
      (Blake2b digest + parent/block#/state_root/data_root extraction)
  state/data range commitments .............. MerkleSha256Air proofs
      (leaves = the extracted roots, zero-padded to the tree size —
       subchain_verification.rs:213-220 semantics)
  authority-set commitment .................. ChainedSha256Air proof
      (compute_authority_set_commitment, justification.rs:127-162)
  GRANDPA precommit signatures .............. Ed25519VerifyAir shard proofs
      (curta_eddsa_verify_sigs_conditional, justification.rs:237-243)

`verify_header_range` checks every proof AND the cross-proof links that
the reference enforces in-circuit (adjacency digest==parent chains,
sequential block numbers, Merkle-leaf equality, signer-set membership,
the 53-byte precommit ABI, 2/3 threshold — justification.rs:164-257,
subchain_verification.rs:163-296). Each map-style unit (one header, one
Merkle tree, one signature shard) proves independently, so proving maps
across devices exactly like the reference's MapReduce leaves map across
platform machines (SURVEY.md §2.3.1); recursive aggregation of this
bundle is the multi-chip roadmap item.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np

from ..circuits import scale
from ..circuits.commitments import authority_set_hash
from ..circuits.consts import ENCODED_PRECOMMIT_LENGTH
from ..circuits.ed25519 import L_ORDER
from ..field import goldilocks as gl
from . import prover, verifier
from .air_header import HeaderAir, header_publics_fields
from .air_rotate import P_WLEN, RotateHeaderAir, rotate_window_fields
from .air_sha256_chain import ChainedSha256Air
from .air_sha256_merkle import MerkleSha256Air
from .air_ed25519 import Ed25519VerifyAir, dummy_sig
from .ed25519_prove import sigs_from_justification, shard_sigs
from .prover import StarkConfig, StarkProof

Sig = Tuple[bytes, bytes, int, int]


class VerificationError(AssertionError):
    pass


def _check(cond, msg):
    if not cond:
        raise VerificationError(msg)


def _sig_ckpt_bytes(shard) -> bytes:
    """Stable byte identity of a signature shard (checkpoint keying)."""
    return b"".join(a + r + int(s).to_bytes(32, "little")
                    + int(h).to_bytes(64, "little")
                    for (a, r, s, h) in shard)


def _pubs_fp(publics):
    return [gl.to_fp(int(p)) for p in publics]


def _leaf_words(leaf: bytes) -> List[int]:
    return [int.from_bytes(leaf[4 * i:4 * i + 4], "big") for i in range(8)]


def _words_leaf(words: Sequence[int]) -> bytes:
    return b"".join(int(w).to_bytes(4, "big") for w in words)


@dataclass
class HeaderRangeStarkProof:
    """The statement proof: interlocking STARKs + the public witness data
    the verifier needs to rebuild instance-bound constant columns."""
    tree_size: int
    max_chunks: int
    max_authorities: int
    ed_B: int
    # subchain
    header_publics: List[List[int]]
    header_proofs: List[StarkProof]
    # range commitments
    state_merkle_publics: List[int]
    state_merkle_proof: StarkProof
    data_merkle_publics: List[int]
    data_merkle_proof: StarkProof
    # justification
    authorities: List[bytes]          # full active set, canonical order
    signed: List[bool]
    round_: int
    shard_sigs: List[List[Sig]]       # per-lane (A, R, s, h)
    sig_publics: List[List[int]]
    sig_proofs: List[StarkProof]
    # in-STARK challenge binding: h = SHA-512(R‖A‖M) mod L per lane
    # (air_sha512.Sha512ChallengeAir over the SAME shard lane tuples)
    sha512_publics: List[List[int]]
    sha512_proofs: List[StarkProof]
    chain_publics: List[int]
    chain_proof: StarkProof


def prove_header_range(
    trusted_block: int,
    target_block: int,
    headers: Sequence[bytes],         # SCALE headers for (trusted, target]
    authorities: Sequence[bytes],     # active set, canonical order
    signatures: Sequence[Optional[bytes]],  # 64-byte sig or None per lane
    authority_set_id: int,
    round_: int,
    config: StarkConfig,
    *,
    tree_size: int,
    max_chunks: int,
    max_authorities: int,
    ed_B: int = 8,
    devices=None,
    checkpoint: Optional[str] = None,
    procs: int = 1,
) -> HeaderRangeStarkProof:
    n = len(headers)
    assert n == target_block - trusted_block and 0 < n <= tree_size
    devices = devices or jax.devices()
    from .checkpoint import Checkpoint
    cp = Checkpoint(checkpoint)

    if procs > 1:
        # multi-process map phase (reference: bin/vectorx.rs:122-130 —
        # leaf jobs scattered to machines): workers prove the per-header
        # shards and hand artifacts back via the checkpoint store, so the
        # loop below hits cp for every header.
        assert checkpoint, "procs > 1 needs a checkpoint dir for handoff"
        from ..parallel.map_prove import prove_headers_procs
        prove_headers_procs([bytes(h) for h in headers], max_chunks,
                            config, checkpoint, procs)

    def put(i, trace, pubs):
        dev = devices[i % len(devices)]
        return (jax.device_put(trace, dev),
                [jax.device_put(p, dev) for p in pubs])

    # -- per-header hash+decode proofs -----------------------------------
    air_h = HeaderAir(max_chunks)
    header_publics, header_proofs = [], []
    state_roots, data_roots = [], []
    for i, hdr in enumerate(headers):
        parts = (bytes(hdr), str(max_chunks).encode())
        hit = cp.load("hdr", config, parts, air_h)
        if hit is not None:
            proof, publics = hit
        else:
            trace, publics, _ = air_h.make_trace(bytes(hdr))
            trace_d, pubs_d = put(i, trace, _pubs_fp(publics))
            proof = prover.prove(air_h, trace_d, pubs_d, config)
            cp.store("hdr", config, parts, proof, publics)
        header_proofs.append(proof)
        header_publics.append(publics)
        f = header_publics_fields(publics)
        state_roots.append(f["state_root"])
        data_roots.append(f["data_root"])
    target_hash = hashlib.blake2b(bytes(headers[-1]),
                                  digest_size=32).digest()

    # -- range-commitment Merkle proofs -----------------------------------
    def merkle(leaves: List[bytes], slot: int):
        parts = (b"".join(leaves), str(tree_size).encode())
        words = [_leaf_words(lf) for lf in
                 leaves + [bytes(32)] * (tree_size - len(leaves))]
        air = MerkleSha256Air(words)
        hit = cp.load("merkle", config, parts, air)
        if hit is not None:
            return list(hit[1]), hit[0]
        trace, publics, _root = air.make_trace()
        trace_d, pubs_d = put(slot, trace, _pubs_fp(publics))
        proof = prover.prove(air, trace_d, pubs_d, config)
        cp.store("merkle", config, parts, proof, publics)
        return list(publics), proof

    state_pub, state_prf = merkle(state_roots, n)
    data_pub, data_prf = merkle(data_roots, n + 1)

    # -- authority-set commitment proof ------------------------------------
    chain_air = ChainedSha256Air(max_authorities)
    words = ChainedSha256Air.pubkeys_to_words(list(authorities),
                                              max_authorities)
    parts = (b"".join(authorities), str(max_authorities).encode())
    hit = cp.load("chain", config, parts, chain_air)
    if hit is not None:
        chain_prf, chain_pub = hit[0], hit[1]
    else:
        trace, chain_pub, _out = chain_air.make_trace(words,
                                                      len(authorities))
        trace_d, pubs_d = put(n + 2, trace, _pubs_fp(chain_pub))
        chain_prf = prover.prove(chain_air, trace_d, pubs_d, config)
        cp.store("chain", config, parts, chain_prf, chain_pub)

    # -- precommit signatures ----------------------------------------------
    message = scale.encode_precommit_bytes(target_hash, target_block,
                                           round_, authority_set_id)
    signed = [s is not None for s in signatures]
    sigs = sigs_from_justification(
        list(authorities),
        [s if s is not None else bytes(64) for s in signatures],
        signed, message)
    shards = shard_sigs(sigs, ed_B)
    sig_publics, sig_proofs, shard_list = [], [], []
    for i, shard in enumerate(shards):
        air = Ed25519VerifyAir(shard, B=ed_B)
        parts = (_sig_ckpt_bytes(shard), message, str(ed_B).encode())
        hit = cp.load("sig", config, parts, air)
        if hit is not None:
            proof, publics = hit
        else:
            strace, _ = air.make_trace_vec()
            publics = air.publics_list()
            trace_d, pubs_d = put(i, strace, _pubs_fp(publics))
            proof = prover.prove(air, trace_d, pubs_d, config)
            cp.store("sig", config, parts, proof, publics)
        sig_proofs.append(proof)
        sig_publics.append(publics)
        shard_list.append(list(air.sigs))

    sha_publics, sha_proofs = _prove_challenge_shards(
        shard_list, message, ed_B, config, cp, put)

    return HeaderRangeStarkProof(
        tree_size=tree_size, max_chunks=max_chunks,
        max_authorities=max_authorities, ed_B=ed_B,
        header_publics=header_publics, header_proofs=header_proofs,
        state_merkle_publics=state_pub, state_merkle_proof=state_prf,
        data_merkle_publics=data_pub, data_merkle_proof=data_prf,
        authorities=list(authorities), signed=signed, round_=round_,
        shard_sigs=shard_list, sig_publics=sig_publics,
        sig_proofs=sig_proofs,
        sha512_publics=sha_publics, sha512_proofs=sha_proofs,
        chain_publics=list(chain_pub), chain_proof=chain_prf)


def _prove_challenge_shards(shard_list, message: bytes, ed_B: int,
                            config: StarkConfig, cp, put):
    """One Sha512ChallengeAir proof per signature shard: every lane's
    h = SHA-512(R‖A‖M) mod L proven in-STARK (the reference's Curta EdDSA
    computes the challenge the same way, justification.rs:237-243)."""
    from .air_sha512 import Sha512ChallengeAir
    publics_l, proofs = [], []
    for i, shard in enumerate(shard_list):
        air = Sha512ChallengeAir(shard, message, B=ed_B)
        parts = (_sig_ckpt_bytes(shard), message, b"sha512",
                 str(ed_B).encode())
        hit = cp.load("sha512", config, parts, air)
        if hit is not None:
            proof, publics = hit
        else:
            trace, publics = air.make_trace()
            trace_d, pubs_d = put(i, trace, _pubs_fp(publics))
            proof = prover.prove(air, trace_d, pubs_d, config)
            cp.store("sha512", config, parts, proof, publics)
        proofs.append(proof)
        publics_l.append(list(publics))
    return publics_l, proofs


def _verify_challenge_shards(bundle, message: bytes,
                             config: StarkConfig) -> None:
    from .air_sha512 import Sha512ChallengeAir
    _check(len(bundle.sha512_proofs) == len(bundle.sha512_publics)
           == len(bundle.shard_sigs), "sha512 shard counts")
    for i, shard in enumerate(bundle.shard_sigs):
        air = Sha512ChallengeAir(shard, message, B=bundle.ed_B)
        _check([int(p) for p in bundle.sha512_publics[i]]
               == air.publics_list(), f"sha512 shard {i} publics")
        _check(bool(verifier.verify(air, bundle.sha512_proofs[i],
                                    _pubs_fp(bundle.sha512_publics[i]),
                                    bundle.ed_B, config)),
               f"sha512 shard {i} proof")


def verify_header_range(
    bundle: HeaderRangeStarkProof,
    trusted_block: int,
    trusted_header_hash: bytes,
    authority_set_id: int,
    authority_set_hash_pub: bytes,
    target_block: int,
    config: StarkConfig,
) -> Tuple[bytes, bytes, bytes]:
    """Raises VerificationError on any failed check. Returns the contract
    outputs (target_header_hash, state_root_commitment,
    data_root_commitment) — the 96-byte evm_write triple
    (header_range.rs:56-58)."""
    n = target_block - trusted_block
    _check(0 < n <= bundle.tree_size, "bad range size")
    _check(len(bundle.header_proofs) == n == len(bundle.header_publics),
           "header proof count")

    # ===== phase A: host-side claim/link checks (cheap — run them ALL
    # before any STARK verification so malformed bundles fail fast) =======

    # subchain adjacency links (subchain_verification.rs:163-296)
    prev_hash = trusted_header_hash
    state_roots, data_roots = [], []
    fields = []
    for i in range(n):
        try:
            f = header_publics_fields(bundle.header_publics[i])
        except AssertionError as e:
            raise VerificationError(f"header {i} publics: {e}")
        fields.append(f)
        _check(f["parent_hash"] == prev_hash, f"chain link at header {i}")
        _check(f["block_number"] == trusted_block + 1 + i,
               f"block number at header {i}")
        prev_hash = f["digest"]
        state_roots.append(f["state_root"])
        data_roots.append(f["data_root"])
    target_hash = prev_hash

    # range-commitment leaves must be the extracted roots, zero-padded
    def merkle_claim(publics, leaves, label):
        words = [_leaf_words(lf) for lf in
                 leaves + [bytes(32)] * (bundle.tree_size - len(leaves))]
        flat = [w for row in words for w in row]
        _check([int(p) for p in publics[:len(flat)]] == flat,
               f"{label} merkle leaves")
        air = MerkleSha256Air(words)
        _check(len(publics) == air.num_publics, f"{label} publics size")
        return air, _words_leaf([int(p) for p in publics[len(flat):]])

    state_air, state_commit = merkle_claim(bundle.state_merkle_publics,
                                           state_roots, "state")
    data_air, data_commit = merkle_claim(bundle.data_merkle_publics,
                                         data_roots, "data")

    # authority set (justification.rs:127-162)
    n_auth = len(bundle.authorities)
    _check(0 < n_auth <= bundle.max_authorities, "authority count")
    _check(authority_set_hash(bundle.authorities) == authority_set_hash_pub,
           "authority-set commitment")
    _check(int(bundle.chain_publics[0]) == n_auth, "chain num_active")
    _check(_words_leaf([int(p) for p in bundle.chain_publics[1:9]])
           == authority_set_hash_pub, "chain digest")

    # precommit lanes + 2/3 threshold (justification.rs:164-257)
    message = scale.encode_precommit_bytes(target_hash, target_block,
                                           bundle.round_, authority_set_id)
    assert len(message) == ENCODED_PRECOMMIT_LENGTH
    _check_lanes(bundle, message)

    # ===== phase B: STARK verification of every bundled proof =============
    air_h = HeaderAir(bundle.max_chunks)
    log_n_h = air_h.n_rows.bit_length() - 1
    for i in range(n):
        _check(bool(verifier.verify(air_h, bundle.header_proofs[i],
                                    _pubs_fp(bundle.header_publics[i]),
                                    log_n_h, config)),
               f"header proof {i}")
    for air, proof, publics, label in (
            (state_air, bundle.state_merkle_proof,
             bundle.state_merkle_publics, "state merkle"),
            (data_air, bundle.data_merkle_proof,
             bundle.data_merkle_publics, "data merkle")):
        _check(bool(verifier.verify(air, proof, _pubs_fp(publics),
                                    air.n_rows.bit_length() - 1, config)),
               f"{label} proof")
    chain_air = ChainedSha256Air(bundle.max_authorities)
    _check(bool(verifier.verify(chain_air, bundle.chain_proof,
                                _pubs_fp(bundle.chain_publics),
                                chain_air.n_rows.bit_length() - 1, config)),
           "authority-chain proof")
    _verify_sig_shards(bundle, config)
    _verify_challenge_shards(bundle, message, config)

    return target_hash, state_commit, data_commit


def _check_lanes(bundle, message: bytes) -> None:
    """Host checks on the signature lanes: signer-set membership,
    canonical s, dummy padding, 2/3 threshold. The CHALLENGE
    h = SHA-512(R‖A‖M) mod L is no longer recomputed here — it is proven
    in-STARK per shard (air_sha512.Sha512ChallengeAir, verified by
    _verify_challenge_shards over the same lane tuples)."""
    n_auth = len(bundle.authorities)
    _check(len(bundle.signed) == n_auth, "signed flags length")
    lanes = [sig for shard in bundle.shard_sigs for sig in shard]
    _check(len(lanes) >= n_auth, "missing signature lanes")
    dmy = dummy_sig()
    n_signed = 0
    for i in range(len(lanes)):
        a, r, s, h = lanes[i]
        if i < n_auth and bundle.signed[i]:
            n_signed += 1
            _check(a == bundle.authorities[i], f"lane {i} pubkey")
            _check(0 <= s < L_ORDER, f"lane {i} malleable s")
        else:
            _check((a, r, s, h) == dmy, f"lane {i} must be dummy")
    _check(n_signed * 3 > n_auth * 2, "2/3 threshold")


def _verify_sig_shards(bundle, config: StarkConfig) -> None:
    _check(len(bundle.shard_sigs) == len(bundle.sig_proofs)
           == len(bundle.sig_publics), "shard counts")
    for i, shard in enumerate(bundle.shard_sigs):
        air = Ed25519VerifyAir(shard, B=bundle.ed_B)
        _check([int(p) for p in bundle.sig_publics[i]]
               == air.publics_list(), f"sig shard {i} publics")
        _check(bool(verifier.verify(air, bundle.sig_proofs[i],
                                    _pubs_fp(bundle.sig_publics[i]),
                                    bundle.ed_B, config)),
               f"sig shard {i} proof")


# ===========================================================================
# rotate — authority-set handoff statement
# ===========================================================================


@dataclass
class RotateStarkProof:
    """Proof that a justified epoch-end header schedules the new set
    (the reference's RotateCircuit, rotate.rs:80-109)."""
    max_chunks: int
    max_authorities: int
    ed_B: int
    epoch_end_block: int
    header_publics: List[int]
    header_proof: StarkProof
    window: bytes                      # claimed ScheduledChange region
    # justification by the CURRENT set
    authorities: List[bytes]
    signed: List[bool]
    round_: int
    shard_sigs: List[List[Sig]]
    sig_publics: List[List[int]]
    sig_proofs: List[StarkProof]
    sha512_publics: List[List[int]]
    sha512_proofs: List[StarkProof]
    cur_chain_publics: List[int]
    cur_chain_proof: StarkProof
    # commitment of the NEW set (rotate.rs:319-322)
    new_chain_publics: List[int]
    new_chain_proof: StarkProof


def prove_rotate(
    epoch_end_block: int,
    header: bytes,                     # epoch-end SCALE header
    authorities: Sequence[bytes],      # CURRENT active set
    signatures: Sequence[Optional[bytes]],
    authority_set_id: int,
    round_: int,
    config: StarkConfig,
    *,
    max_chunks: int,
    max_authorities: int,
    ed_B: int = 8,
    devices=None,
    checkpoint: Optional[str] = None,
    procs: int = 1,                    # accepted for CLI symmetry; the
                                       # rotate map phase is one header
) -> RotateStarkProof:
    del procs
    devices = devices or jax.devices()
    from .checkpoint import Checkpoint
    cp = Checkpoint(checkpoint)

    def put(i, trace, pubs):
        dev = devices[i % len(devices)]
        return (jax.device_put(trace, dev),
                [jax.device_put(p, dev) for p in pubs])

    air_r = RotateHeaderAir(max_chunks)
    trace, publics, digest, (start, n_new, new_pubkeys) = \
        air_r.make_trace(bytes(header))
    parts_h = (bytes(header), str(max_chunks).encode())
    hit = cp.load("rot-hdr", config, parts_h, air_r)
    if hit is not None:
        header_proof = hit[0]
    else:
        trace_d, pubs_d = put(0, trace, _pubs_fp(publics))
        header_proof = prover.prove(air_r, trace_d, pubs_d, config)
        cp.store("rot-hdr", config, parts_h, header_proof, publics)
    end = start + int(publics[P_WLEN])
    window = bytes(header)[start:end]

    def chain(keys, slot):
        air = ChainedSha256Air(max_authorities)
        parts = (b"".join(keys), str(max_authorities).encode())
        hit = cp.load("rot-chain", config, parts, air)
        if hit is not None:
            return list(hit[1]), hit[0]
        words = ChainedSha256Air.pubkeys_to_words(list(keys),
                                                  max_authorities)
        tr, pub, _ = air.make_trace(words, len(keys))
        tr_d, pb_d = put(slot, tr, _pubs_fp(pub))
        proof = prover.prove(air, tr_d, pb_d, config)
        cp.store("rot-chain", config, parts, proof, pub)
        return list(pub), proof

    cur_pub, cur_prf = chain(authorities, 1)
    new_pub, new_prf = chain(new_pubkeys, 2)

    message = scale.encode_precommit_bytes(digest, epoch_end_block,
                                           round_, authority_set_id)
    signed = [s is not None for s in signatures]
    sigs = sigs_from_justification(
        list(authorities),
        [s if s is not None else bytes(64) for s in signatures],
        signed, message)
    sig_publics, sig_proofs, shard_list = [], [], []
    for i, shard in enumerate(shard_sigs(sigs, ed_B)):
        air = Ed25519VerifyAir(shard, B=ed_B)
        parts = (_sig_ckpt_bytes(shard), message, str(ed_B).encode())
        hit = cp.load("sig", config, parts, air)
        if hit is not None:
            proof, pub = hit
        else:
            strace, _ = air.make_trace_vec()
            pub = air.publics_list()
            tr_d, pb_d = put(i, strace, _pubs_fp(pub))
            proof = prover.prove(air, tr_d, pb_d, config)
            cp.store("sig", config, parts, proof, pub)
        sig_proofs.append(proof)
        sig_publics.append(pub)
        shard_list.append(list(air.sigs))

    sha_publics, sha_proofs = _prove_challenge_shards(
        shard_list, message, ed_B, config, cp, put)

    return RotateStarkProof(
        max_chunks=max_chunks, max_authorities=max_authorities, ed_B=ed_B,
        epoch_end_block=epoch_end_block,
        header_publics=list(publics), header_proof=header_proof,
        window=window,
        authorities=list(authorities), signed=signed, round_=round_,
        shard_sigs=shard_list, sig_publics=sig_publics,
        sig_proofs=sig_proofs,
        sha512_publics=sha_publics, sha512_proofs=sha_proofs,
        cur_chain_publics=cur_pub, cur_chain_proof=cur_prf,
        new_chain_publics=new_pub, new_chain_proof=new_prf)


def verify_rotate(
    bundle: RotateStarkProof,
    authority_set_id: int,
    authority_set_hash_pub: bytes,
    config: StarkConfig,
) -> bytes:
    """Raises VerificationError on failure. Returns the contract output
    new_authority_set_hash (rotate.rs:108)."""
    # ===== phase A: host-side claim/link checks (fail fast) ===============
    try:
        f = rotate_window_fields(bundle.header_publics, bundle.window)
    except AssertionError as e:
        raise VerificationError(f"rotate header publics: {e}")
    _check(f["block_number"] == bundle.epoch_end_block,
           "epoch-end block number")
    digest = f["digest"]

    # current authority set
    n_auth = len(bundle.authorities)
    _check(0 < n_auth <= bundle.max_authorities, "authority count")
    _check(authority_set_hash(bundle.authorities) == authority_set_hash_pub,
           "current authority-set commitment")
    _check(int(bundle.cur_chain_publics[0]) == n_auth, "cur chain count")
    _check(_words_leaf([int(p) for p in bundle.cur_chain_publics[1:9]])
           == authority_set_hash_pub, "cur chain digest")

    # justification lanes over the epoch-end precommit
    message = scale.encode_precommit_bytes(
        digest, bundle.epoch_end_block, bundle.round_, authority_set_id)
    _check_lanes(bundle, message)

    # new set commitment claim (the contract output, rotate.rs:319-322)
    new_keys = f["new_pubkeys"]
    _check(0 < len(new_keys) <= bundle.max_authorities, "new set size")
    new_hash = authority_set_hash(new_keys)
    _check(int(bundle.new_chain_publics[0]) == len(new_keys),
           "new chain count")
    _check(_words_leaf([int(p) for p in bundle.new_chain_publics[1:9]])
           == new_hash, "new chain digest")

    # ===== phase B: STARK verification =====================================
    air_r = RotateHeaderAir(bundle.max_chunks)
    _check(bool(verifier.verify(air_r, bundle.header_proof,
                                _pubs_fp(bundle.header_publics),
                                air_r.n_rows.bit_length() - 1, config)),
           "rotate header proof")
    chain_air = ChainedSha256Air(bundle.max_authorities)
    log_c = chain_air.n_rows.bit_length() - 1
    _check(bool(verifier.verify(chain_air, bundle.cur_chain_proof,
                                _pubs_fp(bundle.cur_chain_publics),
                                log_c, config)), "cur chain proof")
    _check(bool(verifier.verify(chain_air, bundle.new_chain_proof,
                                _pubs_fp(bundle.new_chain_publics),
                                log_c, config)), "new chain proof")
    _verify_sig_shards(bundle, config)
    _verify_challenge_shards(bundle, message, config)
    return new_hash


# ===========================================================================
# bundle (de)serialization — the platform artifact boundary
# ===========================================================================
# The prove/verify split runs in different processes (the reference's
# build/prove CLI verbs + gateway callback, succinct.json:6-9); bundles
# round-trip through a self-describing artifact: JSON header (witness/
# public data + per-proof byte lengths) followed by the serialize_proof
# blobs, whose deserialization templates are rebuilt from config alone
# (serialize.empty_proof_like_shapes).

import json as _json

from . import serialize as _ser

_BMAGIC = b"VXB1"


def _sig_to_json(sig: Sig):
    a, r, s, h = sig
    return [a.hex(), r.hex(), hex(s), hex(h)]


def _sig_from_json(row) -> Sig:
    return (bytes.fromhex(row[0]), bytes.fromhex(row[1]),
            int(row[2], 16), int(row[3], 16))


def _pack(meta: dict, proofs: List[StarkProof]) -> bytes:
    blobs = [_ser.serialize_proof(p) for p in proofs]
    meta["proof_lengths"] = [len(b) for b in blobs]
    header = _json.dumps(meta).encode()
    return (_BMAGIC + len(header).to_bytes(4, "little") + header
            + b"".join(blobs))


def _unpack(data: bytes):
    assert data[:4] == _BMAGIC, "bad bundle magic"
    hlen = int.from_bytes(data[4:8], "little")
    meta = _json.loads(data[8:8 + hlen].decode())
    off = 8 + hlen
    blobs = []
    for ln in meta["proof_lengths"]:
        blobs.append(data[off:off + ln])
        off += ln
    assert off == len(data), "trailing bytes"
    return meta, blobs


def _like(air, config):
    return _ser.empty_proof_like_shapes(air, config,
                                        air.n_rows.bit_length() - 1)


def _deser_challenge_proofs(blobs, shard_sigs_l, meta, config):
    """sha512 proof templates depend only on (B,) — shapes are lane/
    message independent — so a placeholder instance serves as `like`."""
    from .air_sha512 import Sha512ChallengeAir
    like_s = _like(Sha512ChallengeAir([], bytes(53), B=meta["ed_B"]),
                   config)
    return [_ser.deserialize_proof(blobs[i], like_s)
            for i in range(len(shard_sigs_l))]


def serialize_header_range(bundle: HeaderRangeStarkProof,
                           config: StarkConfig) -> bytes:
    meta = dict(
        kind="header_range",
        config=_json.loads(_ser.serialize_config(config).decode()),
        tree_size=bundle.tree_size, max_chunks=bundle.max_chunks,
        max_authorities=bundle.max_authorities, ed_B=bundle.ed_B,
        header_publics=[[int(p) for p in ps]
                        for ps in bundle.header_publics],
        state_merkle_publics=[int(p) for p in bundle.state_merkle_publics],
        data_merkle_publics=[int(p) for p in bundle.data_merkle_publics],
        authorities=[a.hex() for a in bundle.authorities],
        signed=list(map(bool, bundle.signed)), round=bundle.round_,
        shard_sigs=[[_sig_to_json(s) for s in sh]
                    for sh in bundle.shard_sigs],
        sig_publics=[[int(p) for p in ps] for ps in bundle.sig_publics],
        sha512_publics=[[int(p) for p in ps]
                        for ps in bundle.sha512_publics],
        chain_publics=[int(p) for p in bundle.chain_publics],
    )
    proofs = (list(bundle.header_proofs)
              + [bundle.state_merkle_proof, bundle.data_merkle_proof,
                 bundle.chain_proof] + list(bundle.sig_proofs)
              + list(bundle.sha512_proofs))
    return _pack(meta, proofs)


def deserialize_header_range(data: bytes) -> Tuple[HeaderRangeStarkProof,
                                                   StarkConfig]:
    meta, blobs = _unpack(data)
    assert meta["kind"] == "header_range"
    cfg_d = dict(meta["config"])
    cfg_d.pop("version", None)
    config = StarkConfig(**cfg_d)

    air_h = HeaderAir(meta["max_chunks"])
    like_h = _like(air_h, config)
    n = len(meta["header_publics"])
    header_proofs = [_ser.deserialize_proof(blobs[i], like_h)
                     for i in range(n)]
    ts = meta["tree_size"]
    m_words = [[int(w) for w in meta["state_merkle_publics"][8 * i:8 * i + 8]]
               for i in range(ts)]
    like_m = _like(MerkleSha256Air(m_words), config)
    state_prf = _ser.deserialize_proof(blobs[n], like_m)
    d_words = [[int(w) for w in meta["data_merkle_publics"][8 * i:8 * i + 8]]
               for i in range(ts)]
    data_prf = _ser.deserialize_proof(blobs[n + 1],
                                      _like(MerkleSha256Air(d_words), config))
    like_c = _like(ChainedSha256Air(meta["max_authorities"]), config)
    chain_prf = _ser.deserialize_proof(blobs[n + 2], like_c)
    shard_sigs_l = [[_sig_from_json(s) for s in sh]
                    for sh in meta["shard_sigs"]]
    sig_proofs = []
    for i, sh in enumerate(shard_sigs_l):
        like_e = _like(Ed25519VerifyAir(sh, B=meta["ed_B"]), config)
        sig_proofs.append(_ser.deserialize_proof(blobs[n + 3 + i], like_e))
    sha_proofs = _deser_challenge_proofs(
        blobs[n + 3 + len(shard_sigs_l):], shard_sigs_l, meta, config)

    return HeaderRangeStarkProof(
        tree_size=ts, max_chunks=meta["max_chunks"],
        max_authorities=meta["max_authorities"], ed_B=meta["ed_B"],
        header_publics=meta["header_publics"],
        header_proofs=header_proofs,
        state_merkle_publics=meta["state_merkle_publics"],
        state_merkle_proof=state_prf,
        data_merkle_publics=meta["data_merkle_publics"],
        data_merkle_proof=data_prf,
        authorities=[bytes.fromhex(a) for a in meta["authorities"]],
        signed=list(meta["signed"]), round_=meta["round"],
        shard_sigs=shard_sigs_l, sig_publics=meta["sig_publics"],
        sig_proofs=sig_proofs,
        sha512_publics=meta["sha512_publics"], sha512_proofs=sha_proofs,
        chain_publics=meta["chain_publics"], chain_proof=chain_prf), config


def serialize_rotate(bundle: RotateStarkProof, config: StarkConfig) -> bytes:
    meta = dict(
        kind="rotate",
        config=_json.loads(_ser.serialize_config(config).decode()),
        max_chunks=bundle.max_chunks,
        max_authorities=bundle.max_authorities, ed_B=bundle.ed_B,
        epoch_end_block=bundle.epoch_end_block,
        header_publics=[int(p) for p in bundle.header_publics],
        window=bundle.window.hex(),
        authorities=[a.hex() for a in bundle.authorities],
        signed=list(map(bool, bundle.signed)), round=bundle.round_,
        shard_sigs=[[_sig_to_json(s) for s in sh]
                    for sh in bundle.shard_sigs],
        sig_publics=[[int(p) for p in ps] for ps in bundle.sig_publics],
        sha512_publics=[[int(p) for p in ps]
                        for ps in bundle.sha512_publics],
        cur_chain_publics=[int(p) for p in bundle.cur_chain_publics],
        new_chain_publics=[int(p) for p in bundle.new_chain_publics],
    )
    proofs = ([bundle.header_proof, bundle.cur_chain_proof,
               bundle.new_chain_proof] + list(bundle.sig_proofs)
              + list(bundle.sha512_proofs))
    return _pack(meta, proofs)


def deserialize_rotate(data: bytes) -> Tuple[RotateStarkProof, StarkConfig]:
    meta, blobs = _unpack(data)
    assert meta["kind"] == "rotate"
    cfg_d = dict(meta["config"])
    cfg_d.pop("version", None)
    config = StarkConfig(**cfg_d)

    like_r = _like(RotateHeaderAir(meta["max_chunks"]), config)
    header_proof = _ser.deserialize_proof(blobs[0], like_r)
    like_c = _like(ChainedSha256Air(meta["max_authorities"]), config)
    cur_prf = _ser.deserialize_proof(blobs[1], like_c)
    new_prf = _ser.deserialize_proof(blobs[2], like_c)
    shard_sigs_l = [[_sig_from_json(s) for s in sh]
                    for sh in meta["shard_sigs"]]
    sig_proofs = []
    for i, sh in enumerate(shard_sigs_l):
        like_e = _like(Ed25519VerifyAir(sh, B=meta["ed_B"]), config)
        sig_proofs.append(_ser.deserialize_proof(blobs[3 + i], like_e))
    sha_proofs = _deser_challenge_proofs(
        blobs[3 + len(shard_sigs_l):], shard_sigs_l, meta, config)

    return RotateStarkProof(
        max_chunks=meta["max_chunks"],
        max_authorities=meta["max_authorities"], ed_B=meta["ed_B"],
        epoch_end_block=meta["epoch_end_block"],
        header_publics=meta["header_publics"], header_proof=header_proof,
        window=bytes.fromhex(meta["window"]),
        authorities=[bytes.fromhex(a) for a in meta["authorities"]],
        signed=list(meta["signed"]), round_=meta["round"],
        shard_sigs=shard_sigs_l, sig_publics=meta["sig_publics"],
        sig_proofs=sig_proofs,
        sha512_publics=meta["sha512_publics"], sha512_proofs=sha_proofs,
        cur_chain_publics=meta["cur_chain_publics"],
        cur_chain_proof=cur_prf,
        new_chain_publics=meta["new_chain_publics"],
        new_chain_proof=new_prf), config
