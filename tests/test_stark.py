import numpy as np
import jax
import jax.numpy as jnp

from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.stark import prover, verifier
from vectorx_tpu.stark.air import FibonacciAir
from vectorx_tpu.stark.challenger import Challenger

from oracle import P

LOG_N = 5
N = 1 << LOG_N
CFG = prover.StarkConfig(rate_bits=2, num_queries=10, final_poly_len=4, cap_height=0)
AIR = FibonacciAir()


def _publics_fp(publics):
    return [gl.to_fp(p) for p in publics]


def _prove(trace, publics):
    # eager orchestration over jitted phases (whole-graph jit compiles for
    # minutes on this 2-core host; phase jits are shared + cached)
    return prover.prove(AIR, trace, publics, CFG)


def _verify(proof, publics):
    return verifier.verify(AIR, proof, publics, LOG_N, CFG)


def test_fibonacci_prove_verify():
    trace, publics = FibonacciAir.make_trace(N)
    pubs = _publics_fp(publics)
    proof = _prove(trace, pubs)
    assert bool(_verify(proof, pubs))


def test_reject_wrong_public():
    trace, publics = FibonacciAir.make_trace(N)
    proof = _prove(trace, _publics_fp(publics))
    bad = list(publics)
    bad[2] = (bad[2] + 1) % P
    assert not bool(_verify(proof, _publics_fp(bad)))


def test_reject_invalid_trace():
    trace, publics = FibonacciAir.make_trace(N)
    # corrupt one interior trace cell -> transition constraint broken
    lo = trace[0].at[0, 7].set(trace[0][0, 7] ^ jnp.uint32(3))
    bad_trace = (lo, trace[1])
    proof = _prove(bad_trace, _publics_fp(publics))
    assert not bool(_verify(proof, _publics_fp(publics)))


def test_reject_tampered_opening():
    trace, publics = FibonacciAir.make_trace(N)
    pubs = _publics_fp(publics)
    proof = _prove(trace, pubs)
    tz = proof.trace_zeta
    proof.trace_zeta = ((tz[0][0].at[0].set(tz[0][0][0] ^ jnp.uint32(1)), tz[0][1]), tz[1])
    assert not bool(_verify(proof, pubs))
