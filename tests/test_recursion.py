"""Recursion phase 1: the tape-ALU AIR proves an inner proof's ALI check."""

import numpy as np

from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.stark import prover, verifier, recursion as rc
from vectorx_tpu.stark.air import FibonacciAir

CFG = prover.StarkConfig(rate_bits=2, num_queries=6, final_poly_len=4)
# the full-verification tape is ~450 ops even for Fibonacci — keep the
# in-suite instance minimal (2-core CPU host; see CLAUDE.md)
CFG_MIN = prover.StarkConfig(rate_bits=1, num_queries=2, final_poly_len=4)


def _pubs_fp(publics):
    return [gl.to_fp(int(p)) for p in publics]


def test_tape_alu_prove_verify():
    t = rc.Tape()
    a = t.load(3, 1)
    b = t.load(5, 2)
    c = t.mul(a, b)
    d = t.add(c, a)
    e = t.sub(d, b)
    for _ in range(4):             # reuse registers across live ranges
        e = t.mul(e, e)
    air = rc.TapeAluAir(t, [e])
    trace, publics = air.make_trace()
    log_n = air.n_rows.bit_length() - 1
    pubs = _pubs_fp(publics)
    proof = prover.prove(air, trace, pubs, CFG)
    assert bool(verifier.verify(air, proof, pubs, log_n, CFG))

    # claiming a different output must fail
    bad = list(publics)
    bad[0] = (bad[0] + 1) % rc.P
    assert not bool(verifier.verify(air, proof, _pubs_fp(bad), log_n, CFG))


def test_ali_of_fibonacci_proof_in_stark():
    """Prove in-STARK that a real inner proof passes its ALI check."""
    inner_air = FibonacciAir()
    log_n = 5
    trace, publics = FibonacciAir.make_trace(1 << log_n)
    pubs = [gl.to_fp(p) for p in publics]
    inner_proof = prover.prove(inner_air, trace, pubs, CFG)
    assert bool(verifier.verify(inner_air, inner_proof, pubs, log_n, CFG))

    outer_air, outer_proof, outer_pubs = rc.prove_ali_in_stark(
        inner_air, inner_proof, pubs, log_n, CFG, CFG)
    # the recorded ALI check must land on exactly zero
    assert outer_pubs == [0, 0]
    outer_log_n = outer_air.n_rows.bit_length() - 1
    assert bool(verifier.verify(outer_air, outer_proof,
                                _pubs_fp(outer_pubs), outer_log_n, CFG))


def test_full_verify_arith_in_stark():
    """Phase 2: ALI + DEEP composition + FRI folds/final poly all recorded
    on one tape and proven in the tape-ALU AIR."""
    inner_air = FibonacciAir()
    log_n = 4
    trace, publics = FibonacciAir.make_trace(1 << log_n)
    pubs = [gl.to_fp(p) for p in publics]
    inner_proof = prover.prove(inner_air, trace, pubs, CFG_MIN)

    outer_air, outer_proof, outer_pubs = rc.prove_verify_in_stark(
        inner_air, inner_proof, pubs, log_n, CFG_MIN, CFG_MIN)
    assert outer_pubs == [0, 0]
    outer_log_n = outer_air.n_rows.bit_length() - 1
    assert bool(verifier.verify(outer_air, outer_proof,
                                _pubs_fp(outer_pubs), outer_log_n, CFG_MIN))


def test_verify_arith_recording_catches_bad_fri_leaf():
    """Corrupt one FRI layer-0 leaf: some μ-combined zero-cell is nonzero."""
    import dataclasses
    inner_air = FibonacciAir()
    log_n = 4
    trace, publics = FibonacciAir.make_trace(1 << log_n)
    pubs = [gl.to_fp(p) for p in publics]
    inner_proof = prover.prove(inner_air, trace, pubs, CFG_MIN)

    ql = inner_proof.fri_proof.query_leaves
    bad0 = (ql[0][0].at[0, 0].set(ql[0][0][0, 0] ^ np.uint32(1)), ql[0][1])
    bad_fri = dataclasses.replace(inner_proof.fri_proof,
                                  query_leaves=[bad0] + list(ql[1:]))
    bad_proof = dataclasses.replace(inner_proof, fri_proof=bad_fri)
    tape, out_cell = rc.record_verify_arith(inner_air, bad_proof, pubs,
                                            log_n, CFG_MIN)
    assert tape.value(out_cell) != (0, 0)

    # the honest proof's tape lands on exactly zero
    tape, out_cell = rc.record_verify_arith(inner_air, inner_proof, pubs,
                                            log_n, CFG_MIN)
    assert tape.value(out_cell) == (0, 0)


def test_ali_recording_catches_wrong_opening():
    """Corrupt one opened trace value: the recorded ALI result is nonzero."""
    inner_air = FibonacciAir()
    log_n = 5
    trace, publics = FibonacciAir.make_trace(1 << log_n)
    pubs = [gl.to_fp(p) for p in publics]
    inner_proof = prover.prove(inner_air, trace, pubs, CFG)
    alpha, zeta = rc.inner_challenges(inner_air, inner_proof, pubs)

    import dataclasses
    tz = inner_proof.trace_zeta
    bad_tz = ((tz[0][0].at[0].set(tz[0][0][0] ^ np.uint32(1)), tz[0][1]),
              (tz[1][0], tz[1][1]))
    bad_proof = dataclasses.replace(inner_proof, trace_zeta=bad_tz)
    tape, out_cell = rc.record_ali(inner_air, bad_proof, pubs, log_n,
                                   CFG, alpha, zeta)
    assert tape.value(out_cell) != (0, 0)
