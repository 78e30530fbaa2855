"""Recursion phases 2-5: FULL in-AIR verification (transcript + Merkle +
ALI + DEEP + FRI) on the unified Poseidon/ALU machine, incl. lookup-bearing
inner AIRs and the MapReduce reduce node (cross-child public links).

The outer prove is expensive on the CPU test mesh, so only ONE test runs
prove+verify end to end; the rest use air.check_constraints — exactly the
polynomial identities the prover commits to, evaluated on the trace domain.
"""

import dataclasses

import numpy as np
import pytest

from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.hashes import poseidon as ps
from vectorx_tpu.stark import prover, verifier, recursion_air as ra
from vectorx_tpu.stark.air import Air, FibonacciAir, check_constraints

P = gl.MODULUS
CFG_MIN = prover.StarkConfig(rate_bits=1, num_queries=2, final_poly_len=4)
LOG_N = 4


def _fp(publics):
    return [gl.to_fp(int(p) % P) for p in publics]


@pytest.fixture(scope="module")
def inner():
    air = FibonacciAir()
    trace, publics = FibonacciAir.make_trace(1 << LOG_N)
    pubs = _fp(publics)
    proof = prover.prove(air, trace, pubs, CFG_MIN)
    assert bool(verifier.verify(air, proof, pubs, LOG_N, CFG_MIN))
    return air, proof, pubs


def test_machine_vs_poseidon_oracle():
    """Bare machine: sponge/compress rows reproduce the real hash, bit
    decomposition + mux + ladder work, tampering breaks constraints."""
    mb = ra.MachineBuilder()
    a = mb.pin_public(5)
    b = mb.pin_public(7)
    d = mb.axpy(mb.mul(a, b), a, 3)          # 5·7 + 3·5 = 50
    bits = mb.decompose64(d)
    mb.sponge([a, b])
    dig = mb.read_digest()
    for j, v in enumerate(ps.hash_ints([5, 7])):
        mb.eq_cells(dig[j], mb.const(v))
    mb.eq_cells(mb.mux(bits[1], a, b), b)    # bit1(50) = 1 -> picks b
    mb.eq_cells(mb.ladder(bits[:6], 3), mb.const(pow(3, 50, P)))
    mb.compress([mb.const(v) for v in (1, 2, 3, 4)],
                [mb.const(v) for v in (5, 6, 7, 8)])
    for j, v in enumerate(ps.hash_two_to_one_ints([1, 2, 3, 4],
                                                  [5, 6, 7, 8])):
        mb.eq_lane(j, mb.const(v))

    air = ra.RecursionAir(mb)
    trace, pubs = air.make_trace()
    assert check_constraints(air, trace, _fp(pubs))
    bad = (trace[0].at[air.COL_C, 5].set(
        trace[0][air.COL_C, 5] ^ np.uint32(1)), trace[1])
    assert not check_constraints(air, bad, _fp(pubs))


def test_full_verify_in_air_constraints(inner):
    """The complete verification of a real proof satisfies the machine;
    the schedule is witness-independent; a tampered FRI leaf (bound by
    in-AIR Merkle + transcript now) is unsatisfiable."""
    air, proof, pubs = inner
    mb = ra.MachineBuilder()
    cells = [mb.pin_public(v) for v in ra._pub_ints(pubs)]
    ra.record_stark_verify(mb, air, proof, cells, LOG_N, CFG_MIN)
    oair = ra.RecursionAir(mb)
    trace, opubs = oair.make_trace()
    assert check_constraints(oair, trace, _fp(opubs))

    # verifier-side rebuild from the claim shape alone
    vair = ra.outer_air_for(air, LOG_N, CFG_MIN, len(pubs))
    assert vair.schedule_digest() == oair.schedule_digest()

    ql = proof.fri_proof.query_leaves
    bad0 = (ql[0][0].at[0, 0].set(ql[0][0][0, 0] ^ np.uint32(1)), ql[0][1])
    bad_fri = dataclasses.replace(proof.fri_proof,
                                  query_leaves=[bad0] + list(ql[1:]))
    bad = dataclasses.replace(proof, fri_proof=bad_fri)
    mb2 = ra.MachineBuilder()
    c2 = [mb2.pin_public(v) for v in ra._pub_ints(pubs)]
    ra.record_stark_verify(mb2, air, bad, c2, LOG_N, CFG_MIN)
    a2 = ra.RecursionAir(mb2)
    t2, p2 = a2.make_trace()
    assert not check_constraints(a2, t2, _fp(p2))


def test_tampered_inner_cap_rejected(inner):
    """Corrupt the inner trace cap: every transcript challenge shifts and
    the recorded witness cannot satisfy the machine (the binding the
    phase-1 tape could not provide)."""
    air, proof, pubs = inner
    tc = proof.trace_cap
    bad = dataclasses.replace(
        proof, trace_cap=(tc[0].at[0, 0].set(tc[0][0, 0] ^ np.uint32(1)),
                          tc[1]))
    mb = ra.MachineBuilder()
    cells = [mb.pin_public(v) for v in ra._pub_ints(pubs)]
    ra.record_stark_verify(mb, air, bad, cells, LOG_N, CFG_MIN)
    a2 = ra.RecursionAir(mb)
    t2, p2 = a2.make_trace()
    assert not check_constraints(a2, t2, _fp(p2))


class RangeAir(Air):
    """Minimal LogUp inner AIR (both columns range-checked to [0, N))."""

    num_cols = 2
    num_publics = 1
    max_constraint_degree = 3

    def lookup_range_columns(self):
        return [0, 1]

    def first_row(self, alg, local, publics, consts=()):
        return [alg.sub(local[0], alg.lift(publics[0]))]


def test_lookup_inner_recursion():
    """Lookup-bearing inner AIRs recurse: γ/aux-cap transcript extension,
    aux openings in ALI + DEEP, the committed-ramp t(ζ) check."""
    rng = np.random.default_rng(7)
    air = RangeAir()
    n = 1 << LOG_N
    v0 = rng.integers(0, n, n, dtype=np.uint64)
    v1 = rng.integers(0, n, n, dtype=np.uint64)
    trace = gl.to_fp(np.stack([v0, v1]))
    pubs = [gl.to_fp(int(v0[0]))]
    proof = prover.prove(air, trace, pubs, CFG_MIN)
    assert bool(verifier.verify(air, proof, pubs, LOG_N, CFG_MIN))

    mb = ra.MachineBuilder()
    cells = [mb.pin_public(v) for v in ra._pub_ints(pubs)]
    ra.record_stark_verify(mb, air, proof, cells, LOG_N, CFG_MIN)
    oair = ra.RecursionAir(mb)
    tr, pu = oair.make_trace()
    assert check_constraints(oair, tr, _fp(pu))

    azv = proof.aux_zeta
    bad_az = ((azv[0][0].at[0].set(azv[0][0][0] ^ np.uint32(1)),
               azv[0][1]), azv[1])
    bad = dataclasses.replace(proof, aux_zeta=bad_az)
    mb2 = ra.MachineBuilder()
    c2 = [mb2.pin_public(v) for v in ra._pub_ints(pubs)]
    ra.record_stark_verify(mb2, air, bad, c2, LOG_N, CFG_MIN)
    a2 = ra.RecursionAir(mb2)
    t2, p2 = a2.make_trace()
    assert not check_constraints(a2, t2, _fp(p2))


def test_reduce_node_links_and_rejects(inner):
    """MapReduce reduce semantics: verify TWO child proofs in one outer
    AIR, link B's start to A's end, expose the combined claim — and
    reject a forged continuation (subchain_verification.rs:233-289)."""
    air, prA, fpA, = inner
    pubA = ra._pub_ints(fpA)
    trA, _ = FibonacciAir.make_trace(1 << LOG_N)
    a_last = int(np.asarray(trA[0][0, -1])) | (
        int(np.asarray(trA[1][0, -1])) << 32)
    b_last = int(np.asarray(trA[0][1, -1])) | (
        int(np.asarray(trA[1][1, -1])) << 32)
    trB, pubB = FibonacciAir.make_trace(1 << LOG_N, a_last, b_last)
    fpB = _fp(pubB)
    prB = prover.prove(air, trB, fpB, CFG_MIN)

    children = [(air, prA, fpA, LOG_N, CFG_MIN),
                (air, prB, fpB, LOG_N, CFG_MIN)]
    links = [(0, 2, 1, 0)]               # res_A == a0_B
    expose = [(0, 0), (0, 1), (1, 2)]    # combined: a0_A, b0_A, res_B

    mb = ra.MachineBuilder()
    cl = [[mb.loadw(v) for v in ra._pub_ints(pu)]
          for (_, _, pu, _, _) in children]
    for (ci, pi) in expose:
        pc = mb.pin_public(mb.vals[cl[ci][pi]])
        mb.eq_cells(pc, cl[ci][pi])
    for (ci, pi, cj, pj) in links:
        mb.eq_cells(cl[ci][pi], cl[cj][pj])
    for (ai, pri, pu, ln, cf), cc in zip(children, cl):
        ra.record_stark_verify(mb, ai, pri, cc, ln, cf)
    oair = ra.RecursionAir(mb)
    tr, pu = oair.make_trace()
    assert check_constraints(oair, tr, _fp(pu))
    assert pu == [pubA[0], pubA[1], ra._pub_ints(fpB)[2]]

    # forged continuation: child B claims a different start
    mb2 = ra.MachineBuilder()
    cl2 = [[mb2.loadw(v) for v in ra._pub_ints(pu2)]
           for (_, _, pu2, _, _) in children]
    cl2[1][0] = mb2.loadw((ra._pub_ints(fpB)[0] + 1) % P)
    for (ci, pi) in expose:
        pc = mb2.pin_public(mb2.vals[cl2[ci][pi]])
        mb2.eq_cells(pc, cl2[ci][pi])
    for (ci, pi, cj, pj) in links:
        mb2.eq_cells(cl2[ci][pi], cl2[cj][pj])
    for (ai, pri, pu2, ln, cf), cc in zip(children, cl2):
        ra.record_stark_verify(mb2, ai, pri, cc, ln, cf)
    a2 = ra.RecursionAir(mb2)
    t2, p2 = a2.make_trace()
    assert not check_constraints(a2, t2, _fp(p2))


def test_recursive_prove_verify_end_to_end(inner):
    """ONE outer STARK replaces the inner verification entirely: prove the
    machine trace, verify with the standard verifier against an outer AIR
    rebuilt from the claim shape."""
    air, proof, pubs = inner
    oair, oproof, opubs = ra.prove_recursive(air, proof, pubs, LOG_N,
                                             CFG_MIN, CFG_MIN)
    olog_n = oair.n_rows.bit_length() - 1
    vair = ra.outer_air_for(air, LOG_N, CFG_MIN, len(pubs))
    assert bool(verifier.verify(vair, oproof, _fp(opubs), olog_n, CFG_MIN))
    bad = list(opubs)
    bad[2] = (bad[2] + 1) % P
    assert not bool(verifier.verify(vair, oproof, _fp(bad), olog_n,
                                    CFG_MIN))


def test_const_column_inner_recursion():
    """Phase 4: an inner AIR WITH constant columns recurses — the
    preprocessed-constant VK cap enters as schedule literals, const
    openings are transcript-absorbed and DEEP/Merkle-bound. Tampering a
    const opening breaks the machine."""
    from test_const_vk import ConstAffineAir
    air = ConstAffineAir()
    trace, publics = air.make_trace(1 << LOG_N)
    pubs = _fp(publics)
    proof = prover.prove(air, trace, pubs, CFG_MIN)
    assert bool(verifier.verify(air, proof, pubs, LOG_N, CFG_MIN))

    mb = ra.MachineBuilder()
    cells = [mb.pin_public(v) for v in ra._pub_ints(pubs)]
    ra.record_stark_verify(mb, air, proof, cells, LOG_N, CFG_MIN)
    oair = ra.RecursionAir(mb)
    tr, pu = oair.make_trace()
    assert check_constraints(oair, tr, _fp(pu))

    # verifier-side rebuild recomputes the same VK literals
    vair = ra.outer_air_for(air, LOG_N, CFG_MIN, len(pubs))
    assert vair.schedule_digest() == oair.schedule_digest()

    # tampered const ζ-opening: DEEP/ALI consistency breaks in-machine
    czv = proof.const_zeta
    bad_cz = ((czv[0][0].at[0].set(czv[0][0][0] ^ np.uint32(1)),
               czv[0][1]), czv[1])
    bad = dataclasses.replace(proof, const_zeta=bad_cz)
    mb2 = ra.MachineBuilder()
    c2 = [mb2.pin_public(v) for v in ra._pub_ints(pubs)]
    ra.record_stark_verify(mb2, air, bad, c2, LOG_N, CFG_MIN)
    a2 = ra.RecursionAir(mb2)
    t2, p2 = a2.make_trace()
    assert not check_constraints(a2, t2, _fp(p2))


def test_two_level_recursion_constraints(inner):
    """Phase 4b: a recursion proof is itself recursable (RecursionAir's
    schedule lives in constant columns -> VK path), enabling log-depth
    reduce trees (subchain_verification.rs:233-289's recursive shape).

    The level-1 outer proof uses a short FRI (final_poly_len 32) so the
    level-2 machine stays as small as possible; even so the record +
    constraint check is ~10^5 rows and runs tens of minutes on this
    2-core host — heavy-gated (run once per round via VX_HEAVY_TESTS;
    default CI covers phase 4 with test_const_column_inner_recursion)."""
    import os
    import pytest
    if not os.environ.get("VX_HEAVY_TESTS"):
        pytest.skip("two-level recursion: ~10^5-row machine, heavy")
    air, proof, pubs = inner
    cfg1 = prover.StarkConfig(rate_bits=1, num_queries=2,
                              final_poly_len=32)
    oair, oproof, opubs = ra.prove_recursive(air, proof, pubs, LOG_N,
                                             CFG_MIN, cfg1)
    olog_n = oair.n_rows.bit_length() - 1

    mb = ra.MachineBuilder()
    cells = [mb.pin_public(v) for v in opubs]
    ra.record_stark_verify(mb, oair, oproof, cells, olog_n, cfg1)
    a2 = ra.RecursionAir(mb)
    t2, p2 = a2.make_trace()
    assert check_constraints(a2, t2, _fp(p2))

    # tampered level-1 public: the level-2 machine must reject
    badp = list(p2)
    badp[0] = (badp[0] + 1) % P
    assert not check_constraints(a2, t2, _fp(badp))
