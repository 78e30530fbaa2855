"""Prove a real SHA-256 compression in our own STARK, bit-exact vs hashlib."""

import hashlib

import numpy as np
import jax.numpy as jnp

from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.stark import prover, verifier
from vectorx_tpu.stark.air_sha256 import Sha256CompressAir, N_ROWS

RNG = np.random.default_rng(55)

LOG_N = 7  # 128 rows
CFG = prover.StarkConfig(rate_bits=2, num_queries=6, final_poly_len=4)
AIR = Sha256CompressAir()

IV = [0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
      0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19]


def _pubs_fp(publics):
    return [gl.to_fp(p) for p in publics]


def _sha256_single_block_digest(msg_bytes_55: bytes):
    """hashlib digest of a message short enough for one padded block."""
    return hashlib.sha256(msg_bytes_55).digest()


def test_witness_matches_hashlib():
    # one fully padded block of a 3-byte message -> digest must equal hashlib
    msg = b"abc"
    ml = len(msg) * 8
    block = msg + b"\x80" + b"\x00" * (55 - len(msg)) + ml.to_bytes(8, "big")
    words = [int.from_bytes(block[4 * i:4 * i + 4], "big") for i in range(16)]
    _, publics, out = Sha256CompressAir.make_trace(IV, words)
    digest = b"".join(int(w).to_bytes(4, "big") for w in out)
    assert digest == hashlib.sha256(msg).digest()


def test_prove_verify_sha256_block():
    msg = b"vectorx tpu proving sha"
    ml = len(msg) * 8
    block = msg + b"\x80" + b"\x00" * (55 - len(msg)) + ml.to_bytes(8, "big")
    words = [int.from_bytes(block[4 * i:4 * i + 4], "big") for i in range(16)]
    trace, publics, out = Sha256CompressAir.make_trace(IV, words)
    assert b"".join(int(w).to_bytes(4, "big") for w in out) == \
        hashlib.sha256(msg).digest()

    pubs = _pubs_fp(publics)
    proof = prover.prove(AIR, trace, pubs, CFG)
    assert bool(verifier.verify(AIR, proof, pubs, LOG_N, CFG))

    # claiming a different digest must fail
    bad = list(publics)
    bad[24] = (bad[24] + 1) % (1 << 32)
    assert not bool(verifier.verify(AIR, proof, _pubs_fp(bad), LOG_N, CFG))


def test_reject_tampered_message_bits():
    words = [int(x) for x in RNG.integers(0, 1 << 32, 16, dtype=np.uint64)]
    trace, publics, _ = Sha256CompressAir.make_trace(IV, words)
    pubs = _pubs_fp(publics)
    # corrupt one schedule window value mid-trace
    lo = trace[0].at[194 + 3, 20].set(trace[0][194 + 3, 20] ^ jnp.uint32(1))
    proof = prover.prove(AIR, (lo, trace[1]), pubs, CFG)
    assert not bool(verifier.verify(AIR, proof, pubs, LOG_N, CFG))
