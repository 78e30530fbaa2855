"""GF(2^255-19) limb-arithmetic gadgets proven in-STARK (8-bit-limb config).

Production uses 16-bit limbs over 2^16-row traces; the gadget code is
parameterized by limb width, so an 8-bit instantiation over a 256-row
trace exercises the identical constraint/witness logic cheaply.
"""

import numpy as np

from vectorx_tpu.circuits.ed25519 import D_CONST
from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.stark import prover, verifier
from vectorx_tpu.stark.air import Air
from vectorx_tpu.stark.gadget_fp25519 import (Allocator, FpAddSub, FpMul,
                                              P25519, limbs_to_int)

RNG = np.random.default_rng(31)

B = 8
L = 32
LOG_N = 8
N = 1 << LOG_N
CFG = prover.StarkConfig(rate_bits=2, num_queries=6, final_poly_len=4)


class Fp25519OpsAir(Air):
    """Per-row: m = a*b; d = m + a; e = d - b; f = e * D_CONST (all mod p).

    Publics: [f mod 2^8 of row 0] (a token public so the list is nonempty;
    correctness is enforced row-wise by the gadget constraints + lookups).
    """

    num_publics = 1
    max_constraint_degree = 3

    def __init__(self):
        alloc = Allocator()
        self.a = alloc.take(L)
        self.b = alloc.take(L)
        self.mul = FpMul(alloc, B)
        self.add = FpAddSub(alloc, B, +1)
        self.sub = FpAddSub(alloc, B, -1)
        self.cmul = FpMul(alloc, B, b_const=D_CONST)
        self.num_cols = alloc.n
        self._lookups = alloc.lookups

    def lookup_range_columns(self):
        return self._lookups

    def _row_constraints(self, alg, local):
        a = [local[i] for i in self.a]
        b = [local[i] for i in self.b]
        cs = list(self.mul.constraints(alg, local, a, b))
        m = self.mul.c_limbs(local)
        cs += self.add.constraints(alg, local, m, a)
        d = self.add.d_limbs(local)
        cs += self.sub.constraints(alg, local, d, b)
        e = self.sub.d_limbs(local)
        cs += self.cmul.constraints(alg, local, e)
        return cs

    def transition(self, alg, local, next_row, publics, consts=(),
                   consts_next=()):
        return self._row_constraints(alg, local)

    def first_row(self, alg, local, publics, consts=()):
        return [alg.sub(local[self.cmul.c[0]], alg.lift(publics[0]))]

    def last_row(self, alg, local, publics, consts=()):
        return self._row_constraints(alg, local)

    def make_trace(self, a_vals, b_vals):
        cols = np.zeros((self.num_cols, N), dtype=np.object_)
        outs = []
        for r in range(N):
            a, bb = int(a_vals[r]), int(b_vals[r])
            for i in range(L):
                cols[self.a[i], r] = (a >> (B * i)) & 0xFF
                cols[self.b[i], r] = (bb >> (B * i)) & 0xFF
            m = self.mul.fill(cols, r, a, bb)
            d = self.add.fill(cols, r, m, a)
            e = self.sub.fill(cols, r, d, bb)
            f = self.cmul.fill(cols, r, e)
            outs.append(f)
        publics = [outs[0] & 0xFF]
        return gl.to_fp(cols), publics, outs


AIR = Fp25519OpsAir()


def _rand_fe(k):
    return [int.from_bytes(RNG.bytes(32), "little") % P25519 for _ in range(k)]


def test_witness_matches_int_oracle():
    a_vals, b_vals = _rand_fe(4), _rand_fe(4)
    air = Fp25519OpsAir()
    cols_trace, _, outs = air.make_trace(
        a_vals * (N // 4), b_vals * (N // 4))
    for i in range(4):
        a, b = a_vals[i], b_vals[i]
        expect = (((a * b) % P25519 + a) % P25519 - b) % P25519
        expect = expect * D_CONST % P25519
        assert outs[i] == expect


def test_prove_verify_fp_ops():
    a_vals, b_vals = _rand_fe(N), _rand_fe(N)
    trace, publics, outs = AIR.make_trace(a_vals, b_vals)
    pubs = [gl.to_fp(p) for p in publics]
    proof = prover.prove(AIR, trace, pubs, CFG)
    assert bool(verifier.verify(AIR, proof, pubs, LOG_N, CFG))

    # tampering one product limb must fail
    lo = trace[0].at[AIR.mul.c[3], 7].set(
        (trace[0][AIR.mul.c[3], 7] + 1) % np.uint32(256))
    proof2 = prover.prove(AIR, (lo, trace[1]), pubs, CFG)
    assert not bool(verifier.verify(AIR, proof2, pubs, LOG_N, CFG))


def test_out_of_range_limb_rejected():
    """A 9-bit limb forged into the witness must be caught by the lookup."""
    a_vals, b_vals = _rand_fe(N), _rand_fe(N)
    trace, publics, _ = AIR.make_trace(a_vals, b_vals)
    pubs = [gl.to_fp(p) for p in publics]
    # add 256 to a q limb and subtract 1 from the next to keep the value
    # close (the carry identity breaks anyway; the point is the range)
    c0 = AIR.mul.q[2]
    lo = trace[0].at[c0, 5].set(trace[0][c0, 5] + np.uint32(256))
    proof = prover.prove(AIR, (lo, trace[1]), pubs, CFG)
    assert not bool(verifier.verify(AIR, proof, pubs, LOG_N, CFG))
