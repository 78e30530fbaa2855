"""End-to-end: prove a real Poseidon hash chain in our own STARK."""

import numpy as np
import jax.numpy as jnp

from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.hashes import poseidon as ps
from vectorx_tpu.stark import prover, verifier
from vectorx_tpu.stark.air_poseidon import PoseidonChainAir, PERIOD

from oracle import P

RNG = np.random.default_rng(33)

NUM_PERMS = 2
LOG_N = 6  # 2 * 32 rows
CFG = prover.StarkConfig(rate_bits=2, num_queries=6, final_poly_len=4, cap_height=0)
AIR = PoseidonChainAir()


def _pubs_fp(publics):
    return [gl.to_fp(p) for p in publics]


def test_witness_matches_reference_hash():
    state = [int(x) % P for x in RNG.integers(0, 1 << 64, 12, dtype=np.uint64)]
    trace, publics, final = PoseidonChainAir.make_trace(state, NUM_PERMS)
    want = state
    for _ in range(NUM_PERMS):
        want = ps.permute_ints(want)
    assert final == want
    assert publics[12:] == want
    assert trace[0].shape == (PoseidonChainAir.num_cols, PERIOD * NUM_PERMS)


def test_prove_verify_poseidon_chain():
    state = [int(x) % P for x in RNG.integers(0, 1 << 64, 12, dtype=np.uint64)]
    trace, publics, _ = PoseidonChainAir.make_trace(state, NUM_PERMS)
    pubs = _pubs_fp(publics)
    proof = prover.prove(AIR, trace, pubs, CFG)
    assert bool(verifier.verify(AIR, proof, pubs, LOG_N, CFG))

    # a wrong claimed output must fail
    bad = list(publics)
    bad[12] = (bad[12] + 1) % P
    assert not bool(verifier.verify(AIR, proof, _pubs_fp(bad), LOG_N, CFG))


def test_reject_forged_hash_trace():
    # a trace claiming a different final state (tampered mid-chain) fails
    state = [1] * 12
    trace, publics, _ = PoseidonChainAir.make_trace(state, NUM_PERMS)
    lo = trace[0].at[0, 40].set(trace[0][0, 40] ^ jnp.uint32(2))
    bad_trace = (lo, trace[1])
    pubs = _pubs_fp(publics)
    proof = prover.prove(AIR, bad_trace, pubs, CFG)
    assert not bool(verifier.verify(AIR, proof, pubs, LOG_N, CFG))
