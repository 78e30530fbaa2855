"""Pallas TPU kernel for the Poseidon permutation.

The Merkle/transcript hot loop as ONE fused kernel: all 30 rounds stay in
VMEM (no HBM round trips between rounds — the XLA path is HBM-bound on
the per-round (B, 12, 12) broadcast temps), with the *batch* axis on the
128-wide lanes — state layout is (12, TILE), one Poseidon lane per
sublane row, TILE independent permutations across the vector lanes.

Round structure exploited:
- the MDS matrix is the power-of-two circulant (hashes/poseidon.MDS_ROW),
  so each full-round term is two shifts + 16-bit carry-save accumulation
  — no 64x64 modmuls in the full-round MDS at all;
- the 22 partial rounds run the Poseidon-paper Appendix-B SPARSE
  factorization (hashes/poseidon.fast_partial_ints): per round one lane-0
  S-box, a 12-term row dot into lane 0 and an 11-term column scatter —
  two batched constant modmuls instead of the dense MDS — with ONE dense
  12x12 matvec closing the chain (measured 1.25x over the dense-MDS
  partial rounds back-to-back on chip).

Dispatch: hashes/poseidon.permute routes here on TPU backends for large
batches (VX_POSEIDON_PALLAS=1/0 overrides); the lax.scan path remains the
portable fallback and the differential oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import goldilocks as gl
from ..hashes import poseidon as ps

TILE = 4096  # permutations per grid step (lanes); throughput is flat
             # from 1024 up — bigger tiles just amortize grid overhead.
             # 8192 overflows the 16M scoped-VMEM stack with the sparse
             # partial-round temps (measured: 20.46M requested)

_M16 = 0xFFFF
_U16 = 16


def _reduce128_lazy(n0, n1, n2, n3):
    """gl.reduce128 minus the final canonicalize: result < 2^64, correct
    mod p. Intermediate round values never need the canonical rep — one
    canonicalize at the end of the permutation restores it."""
    t0_lo, t0_hi, borrow = gl.sub64((n0, n1), (n3, jnp.zeros_like(n3)))
    eps = jnp.uint32(gl.EPSILON)
    t0_lo2 = t0_lo - borrow * eps
    b2 = (t0_lo < borrow * eps).astype(jnp.uint32)
    t0 = (t0_lo2, t0_hi - b2)
    nz = (n2 != 0).astype(jnp.uint32)
    t1 = ((jnp.uint32(0) - n2) * nz, n2 - nz)
    lo, hi, carry = gl.add64(t0, t1)
    lo2 = lo + carry * eps
    c2 = (lo2 < lo).astype(jnp.uint32)
    return lo2, hi + c2


def _mul_lazy(a, b):
    return _reduce128_lazy(*gl._mul_wide64(a, b))


def _sqr_lazy(a):
    """a² via 3 unique 32x32 products (the cross term doubled)."""
    lo, hi = a
    ll_lo, ll_hi = gl.umul32_wide(lo, lo)
    lh_lo, lh_hi = gl.umul32_wide(lo, hi)
    hh_lo, hh_hi = gl.umul32_wide(hi, hi)
    # double the cross term (weight 2^32): 2·(lh_lo, lh_hi)
    d_lo = lh_lo + lh_lo
    dc = (d_lo < lh_lo).astype(jnp.uint32)
    d_hi = lh_hi + lh_hi + dc
    dch = (d_hi < lh_hi).astype(jnp.uint32)   # carry into limb 3
    n0 = ll_lo
    n1 = ll_hi + d_lo
    c1 = (n1 < ll_hi).astype(jnp.uint32)
    n2 = hh_lo + d_hi
    c2 = (n2 < hh_lo).astype(jnp.uint32)
    n2 = n2 + c1
    c2 = c2 + (n2 < c1).astype(jnp.uint32)
    n3 = hh_hi + dch + c2
    return _reduce128_lazy(n0, n1, n2, n3)


def _add_lazy(a, b):
    """Lazy add: exact when at least one operand is canonical (< p) —
    the sum then stays < 2^65 - 2^32 and the single epsilon fold cannot
    wrap hi. For two FULL-RANGE lazy operands use _add_lazy2."""
    lo, hi, carry = gl.add64(a, b)
    eps = jnp.uint32(gl.EPSILON)
    lo2 = lo + carry * eps
    c2 = (lo2 < lo).astype(jnp.uint32)
    return lo2, hi + c2


def _add_lazy2(a, b):
    """Lazy add exact for TWO full-range lazy operands (both may be in
    [p, 2^64)): the sum can reach [2^65 - 2^32, 2^65), where the epsilon
    fold's hi+c2 wraps and silently drops 2^64 ≡ epsilon (mod p). Detect
    that wrap and fold epsilon once more (one compare + add)."""
    lo, hi, carry = gl.add64(a, b)
    eps = jnp.uint32(gl.EPSILON)
    lo2 = lo + carry * eps
    c2 = (lo2 < lo).astype(jnp.uint32)
    hi2 = hi + c2
    wrap = jnp.logical_and(c2 == 1, hi2 == 0).astype(jnp.uint32)
    lo3 = lo2 + wrap * eps
    c3 = (lo3 < lo2).astype(jnp.uint32)
    return lo3, hi2 + c3


def _sbox(x):
    x2 = _sqr_lazy(x)
    x3 = _mul_lazy(x2, x)
    return _mul_lazy(_sqr_lazy(x3), x)


def _mds_shift(state, k_ref, k2_ref, nzm_ref):
    """(12, T) state -> MDS·state via shift-accumulate (exact, < 2^64).

    Terms s[j]·2^{K[i,j]} split into <2^32 limbs at 2^0/2^32/2^64. The
    j-sum keeps one u32 accumulator PER LIMB plus an overflow COUNTER
    (each add contributes ≤ 1 carry; counters stay ≤ 11·2 < 2^5) — two
    ops per limb-add instead of four 16-bit splits — then ONE 128-bit
    reduction per output element. Shift tables arrive as VMEM refs
    (Pallas kernels cannot capture array constants)."""
    lo, hi = state
    z = jnp.zeros(lo.shape, jnp.uint32)
    a0, v0 = z, z          # limb 0 accumulator + overflow count
    a1, v1 = z, z          # limb 1 (B + C share it)
    a2, v2 = z, z          # limb 2
    for j in range(ps.WIDTH):
        K = k_ref[:, j:j + 1]                # (12, 1) shifts, this column
        lo_j = lo[j:j + 1]                   # (1, T)
        hi_j = hi[j:j + 1]
        A = lo_j << K                        # limb 0
        t = a0 + A
        v0 = v0 + (t < A).astype(jnp.uint32)
        a0 = t
        C = hi_j << K                        # limb 1
        t = a1 + C
        v1 = v1 + (t < C).astype(jnp.uint32)
        a1 = t
        K2 = k2_ref[:, j:j + 1]
        NZ = nzm_ref[:, j:j + 1]             # 0xFFFFFFFF where K != 0
        B = (lo_j >> K2) & NZ                # limb 1
        t = a1 + B
        v1 = v1 + (t < B).astype(jnp.uint32)
        a1 = t
        D = (hi_j >> K2) & NZ                # limb 2
        t = a2 + D
        v2 = v2 + (t < D).astype(jnp.uint32)
        a2 = t
    # value = a0 + 2^32(v0 + a1) + 2^64(v1 + a2) + 2^96·v2
    n1 = v0 + a1
    c1 = (n1 < a1).astype(jnp.uint32)
    n2 = v1 + a2 + c1                        # ≤ 2^32-1 + ~2^5: no overflow
    c2 = (n2 < a2).astype(jnp.uint32)
    n3 = v2 + c2
    return _reduce128_lazy(a0, n1, n2, n3)


def _sum12_128(plo, phi):
    """Σ over the 12 sublanes of (12, T) lazy (lo, hi) values, as one
    128-bit column sum -> reduced (1, T). 16-bit splits summed via int32
    (Mosaic has no unsigned reductions; columns < 2^20, exact)."""
    m16 = jnp.uint32(0xFFFF)
    u16 = jnp.uint32(16)

    def s16(x, shift):
        part = (x >> u16) if shift else (x & m16)
        return jnp.sum(part.astype(jnp.int32), axis=0,
                       keepdims=True).astype(jnp.uint32)

    c0, c1 = s16(plo, 0), s16(plo, 1)
    c2, c3 = s16(phi, 0), s16(phi, 1)
    n0 = c0 + ((c1 & m16) << u16)
    cy0 = (n0 < c0).astype(jnp.uint32)
    mid = (c1 >> u16) + c2 + cy0
    n1 = mid + ((c3 & m16) << u16)
    cy1 = (n1 < mid).astype(jnp.uint32)
    n2 = (c3 >> u16) + cy1
    return _reduce128_lazy(n0, n1, n2, jnp.zeros_like(n0))


def _kernel(rc_lo_ref, rc_hi_ref, k_ref, k2_ref, nzm_ref,
            prow_lo_ref, prow_hi_ref, pcol_lo_ref, pcol_hi_ref,
            d_lo_ref, d_hi_ref,
            s_lo_ref, s_hi_ref, o_lo_ref, o_hi_ref):
    half_f = ps.FULL_ROUNDS // 2
    n_rounds = ps.N_ROUNDS

    def add_rc(state, r):
        rc_lo = rc_lo_ref[pl.ds(r, 1), :].reshape(12, 1)
        rc_hi = rc_hi_ref[pl.ds(r, 1), :].reshape(12, 1)
        return _add_lazy(state, (jnp.broadcast_to(rc_lo, state[0].shape),
                                 jnp.broadcast_to(rc_hi, state[0].shape)))

    def mds(t):
        return _mds_shift(t, k_ref, k2_ref, nzm_ref)

    def full_round(r, state):
        return mds(_sbox(add_rc(state, r)))

    def partial_round(i, state):
        """Sparse round i (hashes.poseidon.fast_partial_ints):
        s0' = sbox(s0 + a_i); out0 = <row_i, (s0', s1..)>;
        out_j = what_i[j]*s0' + s_j. a_i rides slot 0 of the col table
        (that lane of the scatter is overwritten by the row dot)."""
        lo, hi = state
        shape = (12, lo.shape[1])
        clo = pcol_lo_ref[pl.ds(i, 1), :].reshape(12, 1)
        chi = pcol_hi_ref[pl.ds(i, 1), :].reshape(12, 1)
        a = (jnp.broadcast_to(clo[0:1], (1, shape[1])),
             jnp.broadcast_to(chi[0:1], (1, shape[1])))
        s0 = _sbox(_add_lazy((lo[0:1], hi[0:1]), a))
        full_lo = jnp.concatenate([s0[0], lo[1:]], axis=0)
        full_hi = jnp.concatenate([s0[1], hi[1:]], axis=0)
        rlo = prow_lo_ref[pl.ds(i, 1), :].reshape(12, 1)
        rhi = prow_hi_ref[pl.ds(i, 1), :].reshape(12, 1)
        plo, phi = _mul_lazy((full_lo, full_hi),
                             (jnp.broadcast_to(rlo, shape),
                              jnp.broadcast_to(rhi, shape)))
        out0 = _sum12_128(plo, phi)
        qlo, qhi = _mul_lazy((jnp.broadcast_to(s0[0], shape),
                              jnp.broadcast_to(s0[1], shape)),
                             (jnp.broadcast_to(clo, shape),
                              jnp.broadcast_to(chi, shape)))
        # both operands full-range lazy -> needs the double-carry add
        rest = _add_lazy2((full_lo, full_hi), (qlo, qhi))
        return (jnp.concatenate([out0[0], rest[0][1:]], axis=0),
                jnp.concatenate([out0[1], rest[1][1:]], axis=0))

    def dense_d(state):
        """state -> D @ state (one 12x12 matvec closing the sparse chain;
        leftover L is pre-folded into the next rc row host-side)."""
        lo, hi = state
        shape = (12, lo.shape[1])
        z = jnp.zeros(shape, jnp.uint32)
        a0, v0 = z, z                      # Σ product-lo + overflow count
        a1, v1 = z, z                      # Σ product-hi + overflow count
        for j in range(ps.WIDTH):
            dlo = d_lo_ref[:, j:j + 1]
            dhi = d_hi_ref[:, j:j + 1]
            plo, phi = _mul_lazy(
                (jnp.broadcast_to(lo[j:j + 1], shape),
                 jnp.broadcast_to(hi[j:j + 1], shape)),
                (jnp.broadcast_to(dlo, shape), jnp.broadcast_to(dhi, shape)))
            t = a0 + plo
            v0 = v0 + (t < plo).astype(jnp.uint32)
            a0 = t
            t = a1 + phi
            v1 = v1 + (t < phi).astype(jnp.uint32)
            a1 = t
        n1 = v0 + a1
        c1 = (n1 < a1).astype(jnp.uint32)
        n2 = v1 + c1
        return _reduce128_lazy(a0, n1, n2, jnp.zeros_like(n2))

    state = (s_lo_ref[:], s_hi_ref[:])           # (12, T)
    state = jax.lax.fori_loop(0, half_f, full_round, state)
    state = jax.lax.fori_loop(0, ps.PARTIAL_ROUNDS, partial_round, state)
    state = dense_d(state)
    state = jax.lax.fori_loop(n_rounds - half_f, n_rounds, full_round,
                              state)
    # intermediate rounds run LAZY (< 2^64, non-canonical); one final
    # canonicalize restores the representation invariant
    state = gl.canonicalize(state)
    o_lo_ref[:] = state[0]
    o_hi_ref[:] = state[1]


@functools.partial(jax.jit, static_argnames=("interpret",))
def permute_tiles(s_lo: jax.Array, s_hi: jax.Array, interpret: bool = False):
    """(12, B) planes with B a multiple of TILE -> permuted planes."""
    b = s_lo.shape[1]
    grid = (b // TILE,)
    spec = pl.BlockSpec((12, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    cspec = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    kt, k2t = ps._mds_shift_tables()
    nzm = np.where(kt != 0, 0xFFFFFFFF, 0).astype(np.uint32)
    ((prow_lo, prow_hi), (pcol_lo, pcol_hi), (d_lo, d_hi),
     (rc_lo, rc_hi)) = ps._np_fast_partial()
    np_ = ps.PARTIAL_ROUNDS
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[cspec((ps.N_ROUNDS, 12)), cspec((ps.N_ROUNDS, 12)),
                  cspec((12, 12)), cspec((12, 12)), cspec((12, 12)),
                  cspec((np_, 12)), cspec((np_, 12)),
                  cspec((np_, 12)), cspec((np_, 12)),
                  cspec((12, 12)), cspec((12, 12)),
                  spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct(s_lo.shape, jnp.uint32),
                   jax.ShapeDtypeStruct(s_hi.shape, jnp.uint32)],
        interpret=interpret,
    )(jnp.asarray(rc_lo), jnp.asarray(rc_hi), jnp.asarray(kt),
      jnp.asarray(k2t), jnp.asarray(nzm),
      jnp.asarray(prow_lo), jnp.asarray(prow_hi),
      jnp.asarray(pcol_lo), jnp.asarray(pcol_hi),
      jnp.asarray(d_lo), jnp.asarray(d_hi), s_lo, s_hi)


def permute(state: gl.Fp, interpret: bool = False) -> gl.Fp:
    """Drop-in for hashes.poseidon.permute: (..., 12) -> (..., 12)."""
    lo, hi = state
    lead = lo.shape[:-1]
    n = int(np.prod(lead)) if lead else 1
    pad = (-n) % TILE
    lo2 = lo.reshape(n, 12).T
    hi2 = hi.reshape(n, 12).T
    if pad:
        lo2 = jnp.pad(lo2, ((0, 0), (0, pad)))
        hi2 = jnp.pad(hi2, ((0, 0), (0, pad)))
    o_lo, o_hi = permute_tiles(lo2, hi2, interpret=interpret)
    o_lo = o_lo[:, :n].T.reshape(lead + (12,))
    o_hi = o_hi[:, :n].T.reshape(lead + (12,))
    return o_lo, o_hi
