"""Prove the simple-Merkle range commitment in our own STARK."""

import numpy as np

from vectorx_tpu.circuits.commitments import simple_merkle_root
from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.stark import prover, verifier
from vectorx_tpu.stark.air_sha256_merkle import MerkleSha256Air

RNG = np.random.default_rng(42)

N_LEAVES = 4
CFG = prover.StarkConfig(rate_bits=2, num_queries=6, final_poly_len=4)


def _leaves(n):
    raw = [RNG.bytes(32) for _ in range(n)]
    words = [[int.from_bytes(b[4 * i:4 * i + 4], "big") for i in range(8)]
             for b in raw]
    return raw, words


def _digest(words):
    return b"".join(int(w).to_bytes(4, "big") for w in words)


def test_witness_matches_host_merkle():
    for n in (2, 4, 8):
        raw, words = _leaves(n)
        air = MerkleSha256Air(words)
        _, publics, root = air.make_trace()
        assert _digest(root) == simple_merkle_root(raw), n


def test_prove_verify_merkle_root():
    raw, words = _leaves(N_LEAVES)
    air = MerkleSha256Air(words)
    log_n = air.n_rows.bit_length() - 1
    trace, publics, root = air.make_trace()
    assert _digest(root) == simple_merkle_root(raw)

    pubs = [gl.to_fp(p) for p in publics]
    proof = prover.prove(air, trace, pubs, CFG)
    assert bool(verifier.verify(air, proof, pubs, log_n, CFG))

    # a different claimed root must fail
    bad = list(publics)
    bad[-1] = (bad[-1] + 1) % (1 << 32)
    assert not bool(verifier.verify(air, proof, [gl.to_fp(p) for p in bad],
                                    log_n, CFG))


def test_reject_tampered_stack_register():
    raw, words = _leaves(N_LEAVES)
    air = MerkleSha256Air(words)
    log_n = air.n_rows.bit_length() - 1
    trace, publics, _ = air.make_trace()
    pubs = [gl.to_fp(p) for p in publics]
    col = air._stk(0) + 2
    lo = trace[0].at[col, 700].set(trace[0][col, 700] ^ np.uint32(5))
    proof = prover.prove(air, (lo, trace[1]), pubs, CFG)
    assert not bool(verifier.verify(air, proof, pubs, log_n, CFG))
