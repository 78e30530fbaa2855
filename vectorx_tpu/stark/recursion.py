"""Recursion phase 1 — the arithmetic-tape ALU AIR (see RECURSION.md).

The reference aggregates MapReduce shard proofs by *recursively verifying
plonky2 proofs in-circuit* (subchain_verification.rs:233-289 reduce nodes;
SURVEY.md §2.2 "Recursion / proof aggregation"). The heaviest part of a
DEEP-ALI verification is pure GF(p^2) arithmetic — the ALI consistency
check re-evaluates the inner AIR's constraints at ζ (verifier.py step 1).
This module makes that arithmetic provable:

- ``TapeAlgebra``: an AIR-algebra whose add/sub/mul RECORD a static
  op tape instead of computing — run any AIR's constraint code (and the
  α-combination / vanishing-divisor math) through it once to compile the
  whole ALI check into a straight-line Fp2 program.
- ``TapeAluAir``: a generic one-op-per-row machine proving a tape's
  execution. Operands live in a K-register file carried across rows;
  all wiring (op one-hots, read/write port selectors, literal values) is
  PUBLIC CONSTANT columns — verifier-evaluated, never committed — the
  same statically-scheduled wiring style as air_sha256_merkle's stack
  slots and air_ed25519's ladder selectors. Register allocation is
  linear-scan over the tape's live ranges.

Phase 2 (record_verify_arith / prove_verify_in_stark): the ENTIRE
arithmetic content of verification — ALI at ζ, DEEP composition at every
query position, FRI fold consistency and the final-poly Horner check —
records on ONE tape whose μ-combined zero-cells pin to a single [0, 0]
output. Transcript replay (Poseidon) and Merkle-path rows are the next
phase; until they land, the outer verifier replays the inner Fiat-Shamir
transcript host-side from claim data (caps/openings ride in constant
columns), so challenges and openings enter the tape as literals.

Limitations: inner AIRs using GROUPED tensor constraints (self._stack)
record one tape op per group element only through the scalar ExtAlgebra
path; lookup (LogUp) inner AIRs are not yet recordable.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..field import ext
from ..field import goldilocks as gl
from .air import Air

P = gl.MODULUS
W = ext.W   # Fp2 = Fp[u]/(u^2 - W)

OP_NOP, OP_LOAD, OP_ADD, OP_SUB, OP_MUL = 0, 1, 2, 3, 4


@dataclass(frozen=True)
class TapeOp:
    op: int
    a: int = -1          # operand cell ids (-1 = unused)
    b: int = -1
    lit: Tuple[int, int] = (0, 0)   # LOAD literal (re, im)


class Tape:
    """A straight-line GF(p^2) program; cell i is defined by ops[i]."""

    def __init__(self):
        self.ops: List[TapeOp] = []
        self.vals: List[Tuple[int, int]] = []   # concrete execution trace

    def _push(self, op: TapeOp, val: Tuple[int, int]) -> int:
        self.ops.append(op)
        self.vals.append((val[0] % P, val[1] % P))
        return len(self.ops) - 1

    def load(self, re: int, im: int = 0) -> int:
        return self._push(TapeOp(OP_LOAD, lit=(re % P, im % P)),
                          (re, im))

    def add(self, a: int, b: int) -> int:
        (ar, ai), (br, bi) = self.vals[a], self.vals[b]
        return self._push(TapeOp(OP_ADD, a, b), (ar + br, ai + bi))

    def sub(self, a: int, b: int) -> int:
        (ar, ai), (br, bi) = self.vals[a], self.vals[b]
        return self._push(TapeOp(OP_SUB, a, b), (ar - br, ai - bi))

    def mul(self, a: int, b: int) -> int:
        (ar, ai), (br, bi) = self.vals[a], self.vals[b]
        return self._push(TapeOp(OP_MUL, a, b),
                          (ar * br + W * ai * bi, ar * bi + ai * br))

    def value(self, cell: int) -> Tuple[int, int]:
        return self.vals[cell]


class TapeCell:
    """Ring-element wrapper so AIR constraint code records transparently."""

    __slots__ = ("tape", "cell")

    def __init__(self, tape: Tape, cell: int):
        self.tape = tape
        self.cell = cell


class TapeAlgebra:
    """Drop-in for ExtAlgebra that records instead of computing.

    Elements are TapeCells. ``lift`` takes a *concrete* scalar Fp (publics
    are known to the outer verifier and enter as literals)."""

    def __init__(self, tape: Optional[Tape] = None):
        self.tape = tape or Tape()

    def _wrap(self, cell: int) -> TapeCell:
        return TapeCell(self.tape, cell)

    def add(self, a: TapeCell, b: TapeCell) -> TapeCell:
        return self._wrap(self.tape.add(a.cell, b.cell))

    def sub(self, a: TapeCell, b: TapeCell) -> TapeCell:
        return self._wrap(self.tape.sub(a.cell, b.cell))

    def mul(self, a: TapeCell, b: TapeCell) -> TapeCell:
        return self._wrap(self.tape.mul(a.cell, b.cell))

    def constant(self, c: int) -> TapeCell:
        return self._wrap(self.tape.load(c % P))

    def lift(self, scalar: gl.Fp) -> TapeCell:
        v = int(np.asarray(scalar[0])) | (int(np.asarray(scalar[1])) << 32)
        return self._wrap(self.tape.load(v % P))

    def lift_ext(self, v: ext.Fp2) -> TapeCell:
        re = int(np.asarray(v[0][0])) | (int(np.asarray(v[0][1])) << 32)
        im = int(np.asarray(v[1][0])) | (int(np.asarray(v[1][1])) << 32)
        return self._wrap(self.tape.load(re % P, im % P))

    def one(self) -> TapeCell:
        return self.constant(1)

    def zero(self) -> TapeCell:
        return self.constant(0)

    def inv_hint(self, a: TapeCell) -> TapeCell:
        """Witnessed inverse: loads 1/a as a literal and constrains
        a * inv == 1 by returning inv while the caller multiplies — the
        caller must enforce the product check (record_ali does)."""
        ar, ai = self.tape.value(a.cell)
        inv = ext_inv_int(ar, ai)
        return self._wrap(self.tape.load(*inv))


def ext_inv_int(re: int, im: int) -> Tuple[int, int]:
    d = pow((re * re - W * im * im) % P, P - 2, P)
    return (re * d) % P, (-im * d) % P


# ---------------------------------------------------------------------------
# Recording the ALI check of an inner proof
# ---------------------------------------------------------------------------

def _to_int_ext(v: ext.Fp2) -> Tuple[int, int]:
    re = int(np.asarray(v[0][0])) | (int(np.asarray(v[0][1])) << 32)
    im = int(np.asarray(v[1][0])) | (int(np.asarray(v[1][1])) << 32)
    return re % P, im % P


def record_ali(air: Air, proof, publics: List[gl.Fp], log_n: int,
               config, alpha: ext.Fp2, zeta: ext.Fp2,
               alg: Optional[TapeAlgebra] = None) -> Tuple[Tape, int]:
    """Record the full ALI consistency check (verifier.py step 1) for a
    non-grouped, lookup-free inner AIR as one tape. Returns (tape,
    result_cell) where the result cell must equal 0 iff the check holds
    (expected_q - opened_q).

    The inner openings/challenges enter as tape literals: they are claim
    data the outer verifier knows (and, in later phases, data bound by
    in-AIR Merkle/transcript rows). Pass ``alg`` to continue recording on
    an existing tape (record_verify_arith shares one tape for all checks)."""
    from ..poly import domain as pdom
    from .prover import num_quotient_chunks, _pick_ext

    assert not air.lookup_range_columns(), "lookup AIRs: later phase"
    n = 1 << log_n
    g_dom = gl.primitive_root_of_unity(log_n)
    g_last = pow(g_dom, n - 1, P)

    alg = alg or TapeAlgebra()
    tape = alg.tape
    C = air.num_cols
    local = [alg._wrap(tape.load(*_to_int_ext(_pick_ext(proof.trace_zeta, c))))
             for c in range(C)]
    nxt = [alg._wrap(tape.load(*_to_int_ext(_pick_ext(proof.trace_gzeta, c))))
           for c in range(C)]

    cvals = np.asarray(air.constant_columns(n), dtype=np.object_)
    if cvals.shape[0]:
        cfp = gl.to_fp(cvals)
        g_zeta_pt = ext.mul_base(zeta, gl.full((), g_dom))
        cz = pdom.barycentric_eval(cfp, zeta, log_n)
        cgz = pdom.barycentric_eval(cfp, g_zeta_pt, log_n)
        consts = [alg._wrap(tape.load(*_to_int_ext(_pick_ext(cz, i))))
                  for i in range(cvals.shape[0])]
        consts_next = [alg._wrap(tape.load(*_to_int_ext(_pick_ext(cgz, i))))
                       for i in range(cvals.shape[0])]
    else:
        consts, consts_next = [], []

    ct = air.transition(alg, local, nxt, publics, consts, consts_next)
    cf = air.first_row(alg, local, publics, consts)
    cl = air.last_row(alg, local, publics, consts)

    a_int = _to_int_ext(alpha)
    z_int = _to_int_ext(zeta)
    alpha_c = alg._wrap(tape.load(*a_int))

    def comb(cs, k_cell):
        acc = alg.zero()
        for c in cs:
            acc = alg.add(acc, alg.mul(k_cell[0], c))
            k_cell[0] = alg.mul(k_cell[0], alpha_c)
        return acc

    k_cell = [alg.one()]
    ct_c = comb(ct, k_cell)
    cf_c = comb(cf, k_cell)
    cl_c = comb(cl, k_cell)

    # divisors at ζ: (ζ^N - 1), (ζ - 1), (ζ - g_last); inverses enter as
    # witnessed literals validated by product==1 checks folded into the
    # final equality (soundness: a wrong inverse breaks the product term)
    zeta_c = alg._wrap(tape.load(*z_int))
    zn = zeta_c
    for _ in range(log_n):
        zn = alg.mul(zn, zn)
    one = alg.one()
    zh = alg.sub(zn, one)
    zm1 = alg.sub(zeta_c, one)
    zmg = alg.sub(zeta_c, alg.constant(g_last))

    inv_zh = alg.inv_hint(zh)
    inv_zm1 = alg.inv_hint(zm1)
    inv_zmg = alg.inv_hint(zmg)

    expected = alg.add(
        alg.add(alg.mul(alg.mul(ct_c, zmg), inv_zh),
                alg.mul(cf_c, inv_zm1)),
        alg.mul(cl_c, inv_zmg))

    n_chunks = num_quotient_chunks(air)
    opened = alg.zero()
    zn_pow = alg.one()
    for i in range(n_chunks):
        qv = alg._wrap(tape.load(
            *_to_int_ext(_pick_ext(proof.quotient_zeta, i))))
        opened = alg.add(opened, alg.mul(zn_pow, qv))
        zn_pow = alg.mul(zn_pow, zn)

    diff = alg.sub(expected, opened)
    # inverse well-formedness: (d*inv - 1) terms folded in with α-powers
    acc = diff
    for d, inv in ((zh, inv_zh), (zm1, inv_zm1), (zmg, inv_zmg)):
        k_cell[0] = alg.mul(k_cell[0], alpha_c)
        bad = alg.sub(alg.mul(d, inv), one)
        acc = alg.add(acc, alg.mul(k_cell[0], bad))
    return tape, acc.cell


# ---------------------------------------------------------------------------
# Register allocation (linear scan, no spills — K must cover max liveness)
# ---------------------------------------------------------------------------

def allocate_registers(tape: Tape, out_cells: Sequence[int]) -> Tuple[
        List[int], int]:
    """-> (reg[i] for each cell i, K). Cells live from def to last use;
    out_cells stay live to the end."""
    n = len(tape.ops)
    last_use = [i for i in range(n)]
    for i, op in enumerate(tape.ops):
        for src in (op.a, op.b):
            if src >= 0:
                last_use[src] = i
    for c in out_cells:
        last_use[c] = n
    free: List[int] = []
    next_reg = 0
    reg = [-1] * n
    # release registers after their holder's last use
    expiry: dict = {}
    for i, op in enumerate(tape.ops):
        for c in expiry.pop(i, []):
            free.append(reg[c])
        if free:
            reg[i] = free.pop()
        else:
            reg[i] = next_reg
            next_reg += 1
        if last_use[i] < n:
            expiry.setdefault(last_use[i], []).append(i)
    return reg, next_reg


# ---------------------------------------------------------------------------
# The ALU AIR
# ---------------------------------------------------------------------------


class TapeAluAir(Air):
    """Proves execution of a Tape on a K-register file, one op per row.

    Columns (2K + 6): R[2k]=reg k re, R[2k+1]=reg k im | ARE AIM BRE BIM
    (committed operand taps — keeps the mul constraint at degree 3) |
    CRE CIM (the op result).

    Consts per row: op one-hots LOAD/ADD/SUB/MUL | a-port(K) | b-port(K) |
    w-port(K) | literal re, im | out-pin selectors (one per output cell).

    Constraints (all degree ≤ 3):
      ARE − Σ asel_k R_{k,re} = 0     (and AIM/BRE/BIM)      [operand taps]
      s_load·(C − lit) = 0
      s_add ·(C − (A+B)) = 0 ; s_sub·(C − (A−B)) = 0
      s_mul ·(CRE − (ARE·BRE + W·AIM·BIM)) = 0               [deg 3]
      s_mul ·(CIM − (ARE·BIM + AIM·BRE)) = 0
      R'_k  − wsel_k·C − (1−wsel_k)·R_k = 0                  [writes]
      osel_j·(C − public_j) = 0                              [output pins]
    Rows past the tape are NOPs: every selector 0 ⇒ registers copy and
    C/A/B are unconstrained dead cells.
    """

    max_constraint_degree = 3

    def __init__(self, tape: Tape, out_cells: Sequence[int],
                 k_regs: int = 0):
        self.tape = tape
        self.out_cells = list(out_cells)
        reg, k_min = allocate_registers(tape, out_cells)
        self.reg = reg
        self.K = max(k_regs, k_min)
        n = 1
        while n < len(tape.ops) + 1:
            n <<= 1
        self.n_rows = n
        self.ARE = 2 * self.K
        self.AIM = self.ARE + 1
        self.BRE = self.AIM + 1
        self.BIM = self.BRE + 1
        self.CRE = self.BIM + 1
        self.CIM = self.CRE + 1
        self.num_cols = self.CIM + 1
        self.num_publics = 2 * len(out_cells)
        # const layout
        self.C_OP = 0
        self.C_ASEL = 4
        self.C_BSEL = 4 + self.K
        self.C_WSEL = 4 + 2 * self.K
        self.C_LRE = 4 + 3 * self.K
        self.C_LIM = self.C_LRE + 1
        self.C_OSEL = self.C_LIM + 1
        self.num_consts = self.C_OSEL + len(out_cells)

    def constant_columns(self, n_rows: int):
        out = np.zeros((self.num_consts, n_rows), dtype=np.uint64)
        if n_rows != self.n_rows:
            return out
        opsel = {OP_LOAD: 0, OP_ADD: 1, OP_SUB: 2, OP_MUL: 3}
        for i, op in enumerate(self.tape.ops):
            out[self.C_OP + opsel[op.op], i] = 1
            if op.op == OP_LOAD:
                out[self.C_LRE, i] = op.lit[0]
                out[self.C_LIM, i] = op.lit[1]
            if op.a >= 0:
                out[self.C_ASEL + self.reg[op.a], i] = 1
            if op.b >= 0:
                out[self.C_BSEL + self.reg[op.b], i] = 1
            out[self.C_WSEL + self.reg[i], i] = 1
        for j, c in enumerate(self.out_cells):
            out[self.C_OSEL + j, c] = 1
        return out

    def transition(self, alg, local, next_row, publics, consts=(),
                   consts_next=()):
        cs = []
        one = alg.one()
        K = self.K
        s_load, s_add, s_sub, s_mul = (consts[self.C_OP + j]
                                       for j in range(4))
        wmul = alg.constant(W)

        def blend(base, comp):
            acc = alg.zero()
            for k in range(K):
                acc = alg.add(acc, alg.mul(consts[base + k],
                                           local[2 * k + comp]))
            return acc

        # operand taps (hold on every op row; dead on NOP rows — the blend
        # is then 0 and the committed operand must be 0 too, harmless)
        cs.append(alg.sub(local[self.ARE], blend(self.C_ASEL, 0)))
        cs.append(alg.sub(local[self.AIM], blend(self.C_ASEL, 1)))
        cs.append(alg.sub(local[self.BRE], blend(self.C_BSEL, 0)))
        cs.append(alg.sub(local[self.BIM], blend(self.C_BSEL, 1)))

        are, aim = local[self.ARE], local[self.AIM]
        bre, bim = local[self.BRE], local[self.BIM]
        cre, cim = local[self.CRE], local[self.CIM]

        cs.append(alg.mul(s_load, alg.sub(cre, consts[self.C_LRE])))
        cs.append(alg.mul(s_load, alg.sub(cim, consts[self.C_LIM])))
        cs.append(alg.mul(s_add, alg.sub(cre, alg.add(are, bre))))
        cs.append(alg.mul(s_add, alg.sub(cim, alg.add(aim, bim))))
        cs.append(alg.mul(s_sub, alg.sub(cre, alg.sub(are, bre))))
        cs.append(alg.mul(s_sub, alg.sub(cim, alg.sub(aim, bim))))
        cs.append(alg.mul(s_mul, alg.sub(
            cre, alg.add(alg.mul(are, bre),
                         alg.mul(wmul, alg.mul(aim, bim))))))
        cs.append(alg.mul(s_mul, alg.sub(
            cim, alg.add(alg.mul(are, bim), alg.mul(aim, bre)))))

        # register writes
        for k in range(K):
            w = consts[self.C_WSEL + k]
            for comp, cval in ((0, cre), (1, cim)):
                cs.append(alg.sub(
                    next_row[2 * k + comp],
                    alg.add(alg.mul(w, cval),
                            alg.mul(alg.sub(one, w),
                                    local[2 * k + comp]))))

        # output pins
        for j in range(len(self.out_cells)):
            osel = consts[self.C_OSEL + j]
            cs.append(alg.mul(osel, alg.sub(
                cre, alg.lift(publics[2 * j]))))
            cs.append(alg.mul(osel, alg.sub(
                cim, alg.lift(publics[2 * j + 1]))))
        return cs

    def first_row(self, alg, local, publics, consts=()):
        return [local[c] for c in range(2 * self.K)]

    # -- witness ----------------------------------------------------------

    def make_trace(self):
        """Execute the tape -> ((num_cols, n_rows) trace, publics)."""
        n = self.n_rows
        cols = np.zeros((self.num_cols, n), dtype=np.object_)
        regs = [(0, 0)] * self.K
        for i, op in enumerate(self.tape.ops):
            for k in range(self.K):
                cols[2 * k, i] = regs[k][0]
                cols[2 * k + 1, i] = regs[k][1]
            a = regs[self.reg[op.a]] if op.a >= 0 else (0, 0)
            b = regs[self.reg[op.b]] if op.b >= 0 else (0, 0)
            cols[self.ARE, i], cols[self.AIM, i] = a
            cols[self.BRE, i], cols[self.BIM, i] = b
            c = self.tape.vals[i]
            cols[self.CRE, i], cols[self.CIM, i] = c
            regs[self.reg[i]] = c
        for r in range(len(self.tape.ops), n):
            for k in range(self.K):
                cols[2 * k, r] = regs[k][0]
                cols[2 * k + 1, r] = regs[k][1]
        publics = []
        for c in self.out_cells:
            publics += list(self.tape.vals[c])
        return gl.to_fp(cols), publics


def inner_challenges(air: Air, proof, publics: List[gl.Fp]):
    """Replay the inner Fiat-Shamir transcript host-side -> (α, ζ).

    Phase-1 seam: caps/openings are claim data; once transcript rows land
    in-AIR (RECURSION.md phase 2) this becomes part of the outer trace."""
    import jax.numpy as jnp
    from .challenger import Challenger

    challenger = Challenger.new()
    challenger.observe((jnp.stack([p[0] for p in publics]),
                        jnp.stack([p[1] for p in publics])))
    challenger.observe_digests(proof.trace_cap)
    assert not air.lookup_range_columns(), "lookup AIRs: phase 2"
    assert not np.asarray(air.constant_columns(2)).shape[0], \
        "const-column AIRs: use recursion_air (phase-4 VK transcript)"
    alpha = challenger.squeeze_ext(1)
    alpha = ((alpha[0][0][0], alpha[0][1][0]),
             (alpha[1][0][0], alpha[1][1][0]))
    challenger.observe_digests(proof.quotient_cap)
    zeta = challenger.squeeze_ext(1)
    zeta = ((zeta[0][0][0], zeta[0][1][0]), (zeta[1][0][0], zeta[1][1][0]))
    return alpha, zeta


def inner_transcript(air: Air, proof, publics: List[gl.Fp], log_n: int,
                     config):
    """Replay the FULL inner Fiat-Shamir transcript host-side.

    -> (alpha, zeta, beta, fold_betas, indices, mu): every challenge the
    inner verifier derives, plus one extra squeeze ``mu`` used to fold all
    of the recursion tape's zero-cells into a single output (sound: mu is
    Fiat-Shamir over the complete inner claim, so the inner prover cannot
    steer a nonzero check vector into the kernel of the mu-combination).
    Indices are returned as Python ints (they address claim data when the
    tape is built). Phase-2 seam: once transcript rows land in-AIR these
    values become trace cells instead of literals."""
    import jax.numpy as jnp
    from .challenger import Challenger

    assert not air.lookup_range_columns(), "lookup AIRs: later phase"
    assert not np.asarray(air.constant_columns(2)).shape[0], \
        "const-column AIRs: use recursion_air (phase-4 VK transcript)"
    ch = Challenger.new()
    ch.observe((jnp.stack([p[0] for p in publics]),
                jnp.stack([p[1] for p in publics])))
    ch.observe_digests(proof.trace_cap)

    def sq():
        v = ch.squeeze_ext(1)
        return ((v[0][0][0], v[0][1][0]), (v[1][0][0], v[1][1][0]))

    def obs_ext(v):
        ch.observe((jnp.concatenate([jnp.atleast_1d(v[0][0]),
                                     jnp.atleast_1d(v[1][0])]),
                    jnp.concatenate([jnp.atleast_1d(v[0][1]),
                                     jnp.atleast_1d(v[1][1])])))

    alpha = sq()
    ch.observe_digests(proof.quotient_cap)
    zeta = sq()
    obs_ext(proof.trace_zeta)
    obs_ext(proof.trace_gzeta)
    obs_ext(proof.quotient_zeta)
    beta = sq()

    log_n_lde = log_n + config.rate_bits
    fri_cfg = config.fri_config
    num_layers = fri_cfg.num_layers(log_n_lde)
    fold_betas = []
    for layer in range(num_layers):
        ch.observe_digests(proof.fri_proof.caps[layer])
        fold_betas.append(sq())
    fc = proof.fri_proof.final_coeffs
    ch.observe((jnp.concatenate([fc[0][0], fc[1][0]]),
                jnp.concatenate([fc[0][1], fc[1][1]])))
    # FRI grinding nonce (round-2 fri.py change): ALWAYS transcript-bound
    # before query sampling, even at pow_bits 0 — mirror it exactly or
    # every query index diverges.
    ch.observe((jnp.atleast_1d(proof.fri_proof.pow_nonce[0]),
                jnp.atleast_1d(proof.fri_proof.pow_nonce[1])))
    ch.squeeze(1)
    indices = [int(i) for i in
               np.asarray(ch.squeeze_indices(fri_cfg.num_queries,
                                             log_n_lde - 1))]
    mu = sq()
    return alpha, zeta, beta, fold_betas, indices, mu


def _int_at(fp, *ix) -> int:
    """Base-field (lo, hi) uint32 arrays -> Python int at index."""
    return (int(np.asarray(fp[0][ix])) |
            (int(np.asarray(fp[1][ix])) << 32)) % P


def record_verify_arith(air: Air, proof, publics: List[gl.Fp], log_n: int,
                        config) -> Tuple[Tape, int]:
    """Record EVERY arithmetic check of the DEEP-ALI verifier on one tape:

      1. ALI consistency at ζ (record_ali),
      3. DEEP composition recomputed from the opened rows at each query
         position, checked against the FRI layer-0 leaves,
      4. FRI fold consistency per query per layer + final-poly Horner.

    (numbering = verifier.py's; check 2, Merkle membership, is the hash
    region and lands with the Poseidon-row phase — see RECURSION.md.)

    Returns (tape, acc_cell): acc = Σ μ^k · zero_cell_k must equal 0.
    Claim data (openings, FRI leaves, challenges, index-derived domain
    points) enter as literals — the tape's wiring is public, re-derivable
    by the outer verifier from the inner claim. Divisions by tape-computed
    values are witnessed inverses with recorded product==1 checks."""
    from .prover import num_quotient_chunks, _pick_ext

    alpha, zeta, beta, fold_betas, indices, mu = inner_transcript(
        air, proof, publics, log_n, config)

    alg = TapeAlgebra()
    tape = alg.tape
    _, ali_cell = record_ali(air, proof, publics, log_n, config,
                             alpha, zeta, alg=alg)

    one = alg.one()
    mu_c = alg._wrap(tape.load(*_to_int_ext(mu)))
    acc = [alg._wrap(ali_cell)]          # ALI zero-cell carries weight μ^0
    mu_pow = [mu_c]

    def pin_zero(cell: TapeCell):
        acc[0] = alg.add(acc[0], alg.mul(mu_pow[0], cell))
        mu_pow[0] = alg.mul(mu_pow[0], mu_c)

    # -- shared cells -------------------------------------------------------
    n = 1 << log_n
    rate = config.rate_bits
    log_n_lde = log_n + rate
    n_lde = n << rate
    half0 = n_lde // 2
    g_dom = gl.primitive_root_of_unity(log_n)
    shift0 = gl.MULTIPLICATIVE_GROUP_GENERATOR
    w_lde = gl.primitive_root_of_unity(log_n_lde)
    num_cols = air.num_cols
    n_chunks = num_quotient_chunks(air)
    fri_cfg = config.fri_config
    num_layers = fri_cfg.num_layers(log_n_lde)
    fl = fri_cfg.final_poly_len

    zeta_c = alg._wrap(tape.load(*_to_int_ext(zeta)))
    gzeta_c = alg.mul(zeta_c, alg.constant(g_dom))
    beta_c = alg._wrap(tape.load(*_to_int_ext(beta)))

    # claim data as host ints (re-loaded as fresh literals per use — keeps
    # register liveness O(1) so the outer trace width is independent of the
    # inner AIR's column count)
    tz_int = [_to_int_ext(_pick_ext(proof.trace_zeta, c))
              for c in range(num_cols)]
    gz_int = [_to_int_ext(_pick_ext(proof.trace_gzeta, c))
              for c in range(num_cols)]
    qz_int = [_to_int_ext(_pick_ext(proof.quotient_zeta, i))
              for i in range(n_chunks)]

    leaves0 = proof.fri_proof.query_leaves[0]   # (q, 4) [re_a im_a re_b im_b]

    def inv_checked(cell: TapeCell) -> TapeCell:
        inv = alg.inv_hint(cell)
        pin_zero(alg.sub(alg.mul(cell, inv), one))
        return inv

    # -- 3: DEEP composition at each query, both leaf halves ----------------
    for qi, idx in enumerate(indices):
        for side, pos, rows, quot in (
                (0, idx, proof.trace_rows_a, proof.quot_rows_a),
                (1, idx + half0, proof.trace_rows_b, proof.quot_rows_b)):
            x_int = (shift0 * pow(w_lde, pos, P)) % P
            xe = alg._wrap(tape.load(x_int))
            inv_xz = inv_checked(alg.sub(xe, zeta_c))
            inv_xgz = inv_checked(alg.sub(xe, gzeta_c))

            F = alg.zero()
            bpow = alg.mul(one, one)
            for c in range(num_cols):
                tv = alg._wrap(tape.load(_int_at(rows, qi, c)))
                zc = alg._wrap(tape.load(*tz_int[c]))
                term = alg.mul(alg.sub(tv, zc), inv_xz)
                F = alg.add(F, alg.mul(bpow, term))
                bpow = alg.mul(bpow, beta_c)
            for c in range(num_cols):
                tv = alg._wrap(tape.load(_int_at(rows, qi, c)))
                gc = alg._wrap(tape.load(*gz_int[c]))
                term = alg.mul(alg.sub(tv, gc), inv_xgz)
                F = alg.add(F, alg.mul(bpow, term))
                bpow = alg.mul(bpow, beta_c)
            for i in range(n_chunks):
                qv = alg._wrap(tape.load(_int_at(quot, qi, 2 * i),
                                         _int_at(quot, qi, 2 * i + 1)))
                qc = alg._wrap(tape.load(*qz_int[i]))
                term = alg.mul(alg.sub(qv, qc), inv_xz)
                F = alg.add(F, alg.mul(bpow, term))
                bpow = alg.mul(bpow, beta_c)

            leaf = alg._wrap(tape.load(_int_at(leaves0, qi, 2 * side),
                                       _int_at(leaves0, qi, 2 * side + 1)))
            pin_zero(alg.sub(F, leaf))

    # -- 4: FRI fold consistency + final poly (fri.verify mirror) -----------
    from .fri import _layer_domain, INV2
    inv2_c = alg.constant(INV2)
    fc = proof.fri_proof.final_coeffs

    for qi, idx0 in enumerate(indices):
        idx = idx0
        a = alg._wrap(tape.load(_int_at(leaves0, qi, 0),
                                _int_at(leaves0, qi, 1)))
        b = alg._wrap(tape.load(_int_at(leaves0, qi, 2),
                                _int_at(leaves0, qi, 3)))
        cur = None
        for layer in range(num_layers):
            half = 1 << (log_n_lde - layer - 1)
            layer_idx = idx % half
            if layer > 0:
                leaves = proof.fri_proof.query_leaves[layer]
                a = alg._wrap(tape.load(_int_at(leaves, qi, 0),
                                        _int_at(leaves, qi, 1)))
                b = alg._wrap(tape.load(_int_at(leaves, qi, 2),
                                        _int_at(leaves, qi, 3)))
                expect = a if idx < half else b
                pin_zero(alg.sub(cur, expect))
            shift_l, root_l, _ = _layer_domain(log_n_lde, layer)
            x_int = (shift_l * pow(root_l, layer_idx, P)) % P
            inv2x = alg._wrap(tape.load(pow(2 * x_int % P, P - 2, P)))
            s = alg.mul(alg.add(a, b), inv2_c)
            d = alg.mul(alg.sub(a, b), inv2x)
            fb = alg._wrap(tape.load(*_to_int_ext(fold_betas[layer])))
            cur = alg.add(s, alg.mul(d, fb))
            idx = layer_idx

        shift_f, root_f, _ = _layer_domain(log_n_lde, num_layers)
        xf = alg._wrap(tape.load((shift_f * pow(root_f, idx, P)) % P))
        horner = alg._wrap(tape.load(_int_at(fc[0], fl - 1),
                                     _int_at(fc[1], fl - 1)))
        for i in range(fl - 2, -1, -1):
            horner = alg.add(alg.mul(horner, xf),
                             alg._wrap(tape.load(_int_at(fc[0], i),
                                                 _int_at(fc[1], i))))
        pin_zero(alg.sub(cur, horner))

    return tape, acc[0].cell


def prove_verify_in_stark(inner_air: Air, inner_proof, inner_publics,
                          inner_log_n: int, inner_config, outer_config,
                          k_regs: int = 0):
    """Record the inner proof's FULL arithmetic verification (ALI + DEEP +
    FRI folds/final poly) and prove its execution in the tape-ALU AIR.

    The outer statement: "the verification program derived from the inner
    claim executes to 0" — publics are [0, 0]. Merkle membership of the
    openings (verifier.py check 2) remains outside the tape until the
    Poseidon-row phase; the outer verifier still re-derives the tape's
    constants from the claim, so the openings it wires in are the committed
    ones."""
    from . import prover as pv

    tape, out_cell = record_verify_arith(inner_air, inner_proof,
                                         inner_publics, inner_log_n,
                                         inner_config)
    air = TapeAluAir(tape, [out_cell], k_regs)
    trace, publics = air.make_trace()
    pubs_fp = [gl.to_fp(p) for p in publics]
    proof = pv.prove(air, trace, pubs_fp, outer_config)
    return air, proof, publics


def prove_ali_in_stark(inner_air: Air, inner_proof, inner_publics,
                       inner_log_n: int, inner_config, outer_config,
                       k_regs: int = 0):
    """Record the inner proof's ALI check and prove its execution.

    Returns (outer_air, outer_proof, outer_publics). The outer statement:
    "the recorded ALI program, whose wiring and literals are public
    constants derived from the inner claim, executes to 0" — publics are
    [0, 0] (the result cell's re/im)."""
    from . import prover as pv

    alpha, zeta = inner_challenges(inner_air, inner_proof, inner_publics)
    tape, out_cell = record_ali(inner_air, inner_proof, inner_publics,
                                inner_log_n, inner_config, alpha, zeta)
    air = TapeAluAir(tape, [out_cell], k_regs)
    trace, publics = air.make_trace()
    pubs_fp = [gl.to_fp(p) for p in publics]
    proof = pv.prove(air, trace, pubs_fp, outer_config)
    return air, proof, publics
