"""Prove a real Blake2b-256 hash in our own STARK, bit-exact vs hashlib."""

import hashlib

import numpy as np

from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.stark import prover, verifier
from vectorx_tpu.stark.air_blake2b import Blake2bAir, OUT

RNG = np.random.default_rng(99)

LOG_N = 7
CFG = prover.StarkConfig(rate_bits=2, num_queries=6, final_poly_len=4)
AIR = Blake2bAir()


def _pubs_fp(publics):
    return [gl.to_fp(p) for p in publics]


def test_witness_matches_hashlib():
    for msg in (b"", b"abc", b"vectorx tpu blake2b air",
                bytes(RNG.bytes(128)), bytes(RNG.bytes(100))):
        _, _, digest = Blake2bAir.make_trace(msg)
        assert digest == hashlib.blake2b(msg, digest_size=32).digest(), msg


def test_prove_verify_blake2b():
    msg = b"avail header bytes (scale encoded)"
    trace, publics, digest = Blake2bAir.make_trace(msg)
    assert digest == hashlib.blake2b(msg, digest_size=32).digest()

    pubs = _pubs_fp(publics)
    proof = prover.prove(AIR, trace, pubs, CFG)
    assert bool(verifier.verify(AIR, proof, pubs, LOG_N, CFG))

    # claiming a different digest must fail
    bad = list(publics)
    bad[33] = (bad[33] + 1) % (1 << 32)
    assert not bool(verifier.verify(AIR, proof, _pubs_fp(bad), LOG_N, CFG))

    # claiming a different length must fail
    bad2 = list(publics)
    bad2[32] = bad2[32] + 1
    assert not bool(verifier.verify(AIR, proof, _pubs_fp(bad2), LOG_N, CFG))


def test_reject_tampered_digest_register():
    msg = b"tamper me"
    trace, publics, _ = Blake2bAir.make_trace(msg)
    pubs = _pubs_fp(publics)
    lo = trace[0].at[OUT + 2, 120].set(trace[0][OUT + 2, 120] ^ np.uint32(1))
    proof = prover.prove(AIR, (lo, trace[1]), pubs, CFG)
    assert not bool(verifier.verify(AIR, proof, pubs, LOG_N, CFG))


# --- variable-length multi-chunk ------------------------------------------

from vectorx_tpu.stark.air_blake2b import Blake2bVarAir

VAIR = Blake2bVarAir(max_chunks=2)   # 2 blocks -> 256 rows
VLOG_N = VAIR.n_rows.bit_length() - 1


def test_var_witness_matches_hashlib():
    for n in (1, 60, 128, 129, 200, 256):
        msg = bytes(RNG.bytes(n))
        _, _, digest = VAIR.make_trace(msg)
        assert digest == hashlib.blake2b(msg, digest_size=32).digest(), n


def test_var_prove_verify_two_chunks():
    msg = bytes(RNG.bytes(200))      # 2 active chunks
    trace, publics, digest = VAIR.make_trace(msg)
    assert digest == hashlib.blake2b(msg, digest_size=32).digest()
    pubs = _pubs_fp(publics)
    proof = prover.prove(VAIR, trace, pubs, CFG)
    assert bool(verifier.verify(VAIR, proof, pubs, VLOG_N, CFG))

    bad = list(publics)
    bad[1] = (bad[1] + 1) % (1 << 32)
    assert not bool(verifier.verify(VAIR, proof, _pubs_fp(bad), VLOG_N, CFG))
    bad2 = list(publics)
    bad2[0] = bad2[0] - 1            # wrong claimed length
    assert not bool(verifier.verify(VAIR, proof, _pubs_fp(bad2), VLOG_N,
                                    CFG))


def test_var_prove_verify_masked_chunk():
    msg = bytes(RNG.bytes(50))       # 1 active chunk, 1 inactive
    trace, publics, digest = VAIR.make_trace(msg)
    assert digest == hashlib.blake2b(msg, digest_size=32).digest()
    pubs = _pubs_fp(publics)
    proof = prover.prove(VAIR, trace, pubs, CFG)
    assert bool(verifier.verify(VAIR, proof, pubs, VLOG_N, CFG))
