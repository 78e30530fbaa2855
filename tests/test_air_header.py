"""Prove an Avail-header statement (hash + SCALE field extraction) in-STARK.

The AIR under test binds parent_hash / block-number bytes / state_root /
data_root to the same bytes whose Blake2b-256 digest it proves — the
fused equivalent of the reference's curta_blake2b_variable + decode_header
(builder/header.rs:14-19, builder/decoder.rs:104-157)."""

import hashlib

import numpy as np

from vectorx_tpu.circuits import scale
from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.stark import prover, verifier
from vectorx_tpu.stark import air_header as ah

RNG = np.random.default_rng(2024)

AIR = ah.HeaderAir(max_chunks=2)        # 256 rows
LOG_N = AIR.n_rows.bit_length() - 1
CFG = prover.StarkConfig(rate_bits=2, num_queries=6, final_poly_len=4)


def _make_header(block_number: int, size: int) -> bytes:
    parent = bytes(RNG.integers(0, 256, 32, dtype=np.uint8))
    state_root = bytes(RNG.integers(0, 256, 32, dtype=np.uint8))
    data_root = bytes(RNG.integers(0, 256, 32, dtype=np.uint8))
    body = parent + scale.encode_compact_u32(block_number) + state_root
    filler = bytes(RNG.integers(0, 256, size - len(body) - 32, dtype=np.uint8))
    return body + filler + data_root


def _pubs_fp(publics):
    return [gl.to_fp(int(p)) for p in publics]


def test_witness_fields_and_digest():
    for bn, size in ((5, 150), (16384, 230), (70, 98)):
        hdr = _make_header(bn, size)
        _, publics, digest = AIR.make_trace(hdr)
        assert digest == hashlib.blake2b(hdr, digest_size=32).digest()
        fields = ah.header_publics_fields(publics)
        want = scale.decode_header_bytes(hdr)
        assert fields["block_number"] == bn
        assert fields["parent_hash"] == want["parent_hash"]
        assert fields["state_root"] == want["state_root"]
        assert fields["data_root"] == want["data_root"]
        assert fields["digest"] == digest
        assert fields["length"] == size


def test_prove_verify_header():
    # data-root window crosses the chunk boundary (bytes 118..150)
    hdr = _make_header(16384, 150)
    trace, publics, digest = AIR.make_trace(hdr)
    pubs = _pubs_fp(publics)
    proof = prover.prove(AIR, trace, pubs, CFG)
    assert bool(verifier.verify(AIR, proof, pubs, LOG_N, CFG))

    # lying about a data-root byte (with honestly re-derived γs) must fail:
    # the in-trace RLC accumulator no longer matches the claim
    bad = list(publics)
    bad[ah.P_DR + 7] = (bad[ah.P_DR + 7] + 1) % 256
    bad[ah.P_G1], bad[ah.P_G2] = ah.derive_gammas(bad[:ah.P_G1])
    assert not bool(verifier.verify(AIR, proof, _pubs_fp(bad), LOG_N, CFG))

    # lying about a state-root byte must fail the same way
    bad = list(publics)
    bad[ah.P_SR] = (bad[ah.P_SR] + 1) % 256
    bad[ah.P_G1], bad[ah.P_G2] = ah.derive_gammas(bad[:ah.P_G1])
    assert not bool(verifier.verify(AIR, proof, _pubs_fp(bad), LOG_N, CFG))

    # lying about a block-number byte must fail (static selector pin)
    bad = list(publics)
    bad[ah.P_BN] = (bad[ah.P_BN] + 4) % 256
    bad[ah.P_G1], bad[ah.P_G2] = ah.derive_gammas(bad[:ah.P_G1])
    assert not bool(verifier.verify(AIR, proof, _pubs_fp(bad), LOG_N, CFG))

    # lying about the parent hash must fail (first-row pin)
    bad = list(publics)
    bad[ah.P_PARENT] = (bad[ah.P_PARENT] + 1) % (1 << 32)
    bad[ah.P_G1], bad[ah.P_G2] = ah.derive_gammas(bad[:ah.P_G1])
    assert not bool(verifier.verify(AIR, proof, _pubs_fp(bad), LOG_N, CFG))

    # stale γs (not re-derived after a claim change) are rejected by the
    # public-vector validator before any proof check
    bad = list(publics)
    bad[ah.P_DR] = (bad[ah.P_DR] + 1) % 256
    try:
        ah.header_publics_fields(bad)
        assert False, "stale γ accepted"
    except AssertionError as e:
        assert "γ" in str(e)


def test_reject_tampered_byte_rows():
    """Corrupting the byte-rows family must break the word-tie."""
    hdr = _make_header(7, 120)
    trace, publics, _ = AIR.make_trace(hdr)
    pubs = _pubs_fp(publics)
    lo = trace[0].at[ah.MB, 50].set(trace[0][ah.MB, 50] ^ np.uint32(1))
    # also fix its bit decomposition so only the word-tie can catch it
    lo = lo.at[ah.MBB, 50].set(lo[ah.MBB, 50] ^ np.uint32(1))
    proof = prover.prove(AIR, (lo, trace[1]), pubs, CFG)
    assert not bool(verifier.verify(AIR, proof, pubs, LOG_N, CFG))
