"""Prove the chained authority-set commitment in our own STARK."""

import numpy as np

from vectorx_tpu.circuits.commitments import authority_set_hash
from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.stark import prover, verifier
from vectorx_tpu.stark.air_sha256_chain import ChainedSha256Air

RNG = np.random.default_rng(77)

N_MAX = 2                      # 2 authorities -> 4 blocks -> 512 rows
AIR = ChainedSha256Air(N_MAX)
LOG_N = AIR.n_rows.bit_length() - 1
CFG = prover.StarkConfig(rate_bits=2, num_queries=6, final_poly_len=4)


def _keys(n):
    return [RNG.bytes(32) for _ in range(n)]


def _pubs_fp(publics):
    return [gl.to_fp(p) for p in publics]


def _digest(out_words):
    return b"".join(int(w).to_bytes(4, "big") for w in out_words)


def test_witness_matches_host_chain():
    keys = _keys(N_MAX)
    words = ChainedSha256Air.pubkeys_to_words(keys, N_MAX)
    for num_active in range(N_MAX + 1):
        _, publics, out = AIR.make_trace(words, num_active)
        expect = (authority_set_hash(keys[:num_active])
                  if num_active else b"")
        got = _digest(out) if num_active else b""
        assert got == expect, num_active
        assert publics[0] == num_active


def test_prove_verify_chained_commitment():
    keys = _keys(N_MAX)
    words = ChainedSha256Air.pubkeys_to_words(keys, N_MAX)
    trace, publics, out = AIR.make_trace(words, N_MAX)
    assert _digest(out) == authority_set_hash(keys)

    pubs = _pubs_fp(publics)
    proof = prover.prove(AIR, trace, pubs, CFG)
    assert bool(verifier.verify(AIR, proof, pubs, LOG_N, CFG))

    # wrong digest claim must fail
    bad = list(publics)
    bad[1] = (bad[1] + 1) % (1 << 32)
    assert not bool(verifier.verify(AIR, proof, _pubs_fp(bad), LOG_N, CFG))

    # wrong num_active claim must fail
    bad2 = list(publics)
    bad2[0] = N_MAX - 1
    assert not bool(verifier.verify(AIR, proof, _pubs_fp(bad2), LOG_N, CFG))


def test_prove_verify_masked_chain():
    """num_active < n_max: inactive tail keys must not affect the digest."""
    keys = _keys(N_MAX)
    words = ChainedSha256Air.pubkeys_to_words(keys, N_MAX)
    trace, publics, out = AIR.make_trace(words, 1)
    assert _digest(out) == authority_set_hash(keys[:1])

    pubs = _pubs_fp(publics)
    proof = prover.prove(AIR, trace, pubs, CFG)
    assert bool(verifier.verify(AIR, proof, pubs, LOG_N, CFG))


def test_reject_tampered_chain_register():
    keys = _keys(N_MAX)
    words = ChainedSha256Air.pubkeys_to_words(keys, N_MAX)
    trace, publics, _ = AIR.make_trace(words, N_MAX)
    from vectorx_tpu.stark.air_sha256_chain import CHN
    # corrupt the chain register inside the second hash's rows
    lo = trace[0].at[CHN + 2, 200].set(trace[0][CHN + 2, 200] ^ np.uint32(3))
    pubs = _pubs_fp(publics)
    proof = prover.prove(AIR, (lo, trace[1]), pubs, CFG)
    assert not bool(verifier.verify(AIR, proof, pubs, LOG_N, CFG))
