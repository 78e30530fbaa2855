"""Goldilocks field GF(p), p = 2^64 - 2^32 + 1, as vectorized JAX uint32-pair ops.

TPU-native design: TPUs have no native 64-bit integer multiply, so a field
element is a pair of uint32 arrays ``(lo, hi)`` with value ``hi * 2^32 + lo``.
All arithmetic is built from 32-bit adds/muls/shifts that map directly onto the
TPU VPU (8x128 lanes); no 64-bit emulation from XLA is relied upon, which keeps
the same code path usable inside Pallas kernels.

The reduction algorithm mirrors the standard Goldilocks reduction (as used by
the reference's prover dependency, plonky2's ``reduce128``; see
/root/reference/Cargo.lock:4848-4868 for the dependency, reimplemented here
from the field's mathematical structure):

    2^64 ≡ 2^32 - 1 (mod p)      ("EPSILON")
    2^96 ≡ -1       (mod p)

so for a 128-bit product ``x = n3*2^96 + n2*2^64 + lo64``:

    x ≡ lo64 + n2 * (2^32 - 1) - n3  (mod p)

Elements are kept **canonical** (in ``[0, p)``) at every public-function
boundary; all internal intermediates are plain wrapping uint32 arithmetic.

Public API operates on ``Fp`` pairs (lo, hi) of equal-shape uint32 arrays and
is shape-polymorphic; everything vmaps/jits/shards freely.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Constants
# ---------------------------------------------------------------------------

MODULUS = 0xFFFFFFFF00000001  # p = 2^64 - 2^32 + 1
EPSILON = 0xFFFFFFFF  # 2^64 mod p = 2^32 - 1
P_LO = np.uint32(MODULUS & 0xFFFFFFFF)  # 0x00000001
P_HI = np.uint32(MODULUS >> 32)  # 0xFFFFFFFF

# Multiplicative group order p - 1 = 2^32 * 3 * 5 * 17 * 257 * 65537.
TWO_ADICITY = 32
# g = 7 generates the full multiplicative group; 7^((p-1)/2^32) generates the
# 2^32-th roots of unity.
MULTIPLICATIVE_GROUP_GENERATOR = 7
# 7^((p-1) / 2^32) mod p (power-of-two root of unity of maximal order).
POWER_OF_TWO_GENERATOR = 0x185629DCDA58878C

_U32 = jnp.uint32

Fp = Tuple[jax.Array, jax.Array]  # (lo, hi) uint32 pairs


def _u32(x) -> jax.Array:
    return jnp.asarray(x, dtype=jnp.uint32)


# ---------------------------------------------------------------------------
# Host-side conversion helpers
# ---------------------------------------------------------------------------

def to_fp(values) -> Fp:
    """Python ints / numpy uint64 array -> canonical (lo, hi) uint32 pair."""
    arr = np.asarray(values, dtype=np.object_)
    arr = np.vectorize(lambda v: int(v) % MODULUS, otypes=[np.object_])(arr)
    lo = np.vectorize(lambda v: v & 0xFFFFFFFF, otypes=[np.object_])(arr)
    hi = np.vectorize(lambda v: v >> 32, otypes=[np.object_])(arr)
    return (
        jnp.asarray(lo.astype(np.uint32)),
        jnp.asarray(hi.astype(np.uint32)),
    )


def from_fp(x: Fp) -> np.ndarray:
    """(lo, hi) -> numpy object array of Python ints (exact)."""
    lo = np.asarray(x[0], dtype=np.uint64)
    hi = np.asarray(x[1], dtype=np.uint64)
    out = np.vectorize(lambda l, h: (int(h) << 32) | int(l), otypes=[np.object_])(lo, hi)
    return out


def zeros(shape) -> Fp:
    return jnp.zeros(shape, _U32), jnp.zeros(shape, _U32)


def ones(shape) -> Fp:
    return jnp.ones(shape, _U32), jnp.zeros(shape, _U32)


def full(shape, value: int) -> Fp:
    value %= MODULUS
    return (
        jnp.full(shape, value & 0xFFFFFFFF, _U32),
        jnp.full(shape, value >> 32, _U32),
    )


# ---------------------------------------------------------------------------
# 64-bit primitive ops on uint32 pairs (wrapping, no modular semantics)
# ---------------------------------------------------------------------------

def add64(a: Fp, b: Fp) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(a + b) mod 2^64 plus the carry-out bit (uint32 0/1)."""
    lo = a[0] + b[0]
    c0 = (lo < a[0]).astype(_U32)
    hi_nc = a[1] + b[1]
    carry_hi = (hi_nc < a[1]).astype(_U32)
    hi = hi_nc + c0
    carry_hi = carry_hi | (hi < hi_nc).astype(_U32)
    return lo, hi, carry_hi


def sub64(a: Fp, b: Fp) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(a - b) mod 2^64 plus the borrow-out bit (uint32 0/1)."""
    lo = a[0] - b[0]
    borrow0 = (a[0] < b[0]).astype(_U32)
    hi_nb = a[1] - b[1]
    borrow_hi = (a[1] < b[1]).astype(_U32)
    hi = hi_nb - borrow0
    borrow_hi = borrow_hi | ((hi_nb < borrow0).astype(_U32))
    return lo, hi, borrow_hi


def umul32_wide(x: jax.Array, y: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """32x32 -> 64-bit product as (lo, hi) uint32, via 16-bit half products."""
    x0 = x & _u32(0xFFFF)
    x1 = x >> _u32(16)
    y0 = y & _u32(0xFFFF)
    y1 = y >> _u32(16)
    p00 = x0 * y0
    p01 = x0 * y1
    p10 = x1 * y0
    p11 = x1 * y1
    mid = p01 + p10
    carry_mid = (mid < p01).astype(_U32)  # bit 32 of (p01 + p10)
    lo = p00 + (mid << _u32(16))
    carry_lo = (lo < p00).astype(_U32)
    hi = p11 + (mid >> _u32(16)) + (carry_mid << _u32(16)) + carry_lo
    return lo, hi


def ge64(a: Fp, b: Fp) -> jax.Array:
    """a >= b as bool array, for 64-bit uint32 pairs."""
    return (a[1] > b[1]) | ((a[1] == b[1]) & (a[0] >= b[0]))


# ---------------------------------------------------------------------------
# Modular ops (inputs/outputs canonical in [0, p))
# ---------------------------------------------------------------------------

def canonicalize(x: Fp) -> Fp:
    """Reduce a value < 2^64 into [0, p) by a single conditional subtract."""
    p = (jnp.broadcast_to(_u32(P_LO), x[0].shape), jnp.broadcast_to(_u32(P_HI), x[0].shape))
    ge = ge64(x, p)
    lo_s, hi_s, _ = sub64(x, p)
    return jnp.where(ge, lo_s, x[0]), jnp.where(ge, hi_s, x[1])


def add(a: Fp, b: Fp) -> Fp:
    """Canonical modular add."""
    lo, hi, carry = add64(a, b)
    # 2^64 ≡ EPSILON: fold the carry back in. a+b < 2p < 2^65, so after
    # folding the value is < 2^64 and at most one subtract of p is needed.
    lo2 = lo + carry * _u32(EPSILON)
    c2 = (lo2 < lo).astype(_U32)
    hi2 = hi + c2
    return canonicalize((lo2, hi2))


def sub(a: Fp, b: Fp) -> Fp:
    """Canonical modular subtract."""
    lo, hi, borrow = sub64(a, b)
    # borrow means we wrapped mod 2^64: subtract EPSILON (i.e. add p ≡ -2^64).
    lo2 = lo - borrow * _u32(EPSILON)
    b2 = (lo < borrow * _u32(EPSILON)).astype(_U32)
    hi2 = hi - b2
    return lo2, hi2


def neg(a: Fp) -> Fp:
    z = (jnp.zeros_like(a[0]), jnp.zeros_like(a[1]))
    return sub(z, a)


def _mul_wide64(a: Fp, b: Fp) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """64x64 -> 128-bit product as four uint32 limbs (n0 lowest)."""
    ll_lo, ll_hi = umul32_wide(a[0], b[0])  # a_lo * b_lo -> limbs 0,1
    lh_lo, lh_hi = umul32_wide(a[0], b[1])  # a_lo * b_hi -> limbs 1,2
    hl_lo, hl_hi = umul32_wide(a[1], b[0])  # a_hi * b_lo -> limbs 1,2
    hh_lo, hh_hi = umul32_wide(a[1], b[1])  # a_hi * b_hi -> limbs 2,3

    n0 = ll_lo

    # limb 1: ll_hi + lh_lo + hl_lo, carries into limb 2
    s1 = ll_hi + lh_lo
    c1 = (s1 < ll_hi).astype(_U32)
    n1 = s1 + hl_lo
    c1 = c1 + (n1 < s1).astype(_U32)

    # limb 2: lh_hi + hl_hi + hh_lo + c1, carries into limb 3
    s2 = lh_hi + hl_hi
    c2 = (s2 < lh_hi).astype(_U32)
    s2b = s2 + hh_lo
    c2 = c2 + (s2b < s2).astype(_U32)
    n2 = s2b + c1
    c2 = c2 + (n2 < s2b).astype(_U32)

    # limb 3: hh_hi + c2 (cannot overflow: true product < 2^128)
    n3 = hh_hi + c2
    return n0, n1, n2, n3


def reduce128(n0: jax.Array, n1: jax.Array, n2: jax.Array, n3: jax.Array) -> Fp:
    """Reduce a 128-bit value (four uint32 limbs) to canonical [0, p)."""
    lo64: Fp = (n0, n1)

    # t0 = lo64 - n3  (mod p): if borrow, the wrapped value gained 2^64 ≡ EPS,
    # so subtract EPSILON to compensate.
    t0_lo, t0_hi, borrow = sub64(lo64, (n3, jnp.zeros_like(n3)))
    t0_lo2 = t0_lo - borrow * _u32(EPSILON)
    b2 = (t0_lo < borrow * _u32(EPSILON)).astype(_U32)
    t0 = (t0_lo2, t0_hi - b2)

    # t1 = n2 * EPSILON = (n2 << 32) - n2, computed exactly in 64 bits:
    # (n2 << 32) - n2 = ((n2 - 1) << 32) + (2^32 - n2)   for n2 > 0; 0 for n2 == 0.
    nz = (n2 != 0).astype(_U32)
    t1_hi = n2 - nz
    t1_lo = (_u32(0) - n2) * nz
    t1 = (t1_lo, t1_hi)

    # t2 = t0 + t1; fold carry (2^64 ≡ EPSILON), then canonicalize.
    lo, hi, carry = add64(t0, t1)
    lo2 = lo + carry * _u32(EPSILON)
    c2 = (lo2 < lo).astype(_U32)
    hi2 = hi + c2
    return canonicalize((lo2, hi2))


def mul(a: Fp, b: Fp) -> Fp:
    """Canonical modular multiply."""
    return reduce128(*_mul_wide64(a, b))


def square(a: Fp) -> Fp:
    return mul(a, a)


def mul_scalar(a: Fp, k: int) -> Fp:
    """Multiply by a small Python-int constant."""
    return mul(a, full(a[0].shape, k))


def pow_const(a: Fp, e: int) -> Fp:
    """a ** e for a Python-int exponent.

    Small exponents unroll (lets XLA fold constants); large ones run a
    square-and-multiply lax.scan so the trace stays ~100 primitives instead
    of ~6k (a fully-unrolled 64-bit Fermat chain dominates whole-protocol
    graphs otherwise).
    """
    if e < (1 << 4):
        result = ones(a[0].shape)
        base = a
        while e > 0:
            if e & 1:
                result = mul(result, base)
            base = square(base)
            e >>= 1
        return result

    nbits = e.bit_length()
    bits = jnp.asarray([(e >> i) & 1 for i in range(nbits)], dtype=jnp.uint32)

    def body(carry, bit):
        result, base = carry
        result = select(bit == 1, mul(result, base), result)
        return (result, square(base)), None

    (result, _), _ = jax.lax.scan(body, (ones(a[0].shape), a), bits)
    return result


def inv(a: Fp) -> Fp:
    """Multiplicative inverse via Fermat: a^(p-2). inv(0) = 0."""
    return pow_const(a, MODULUS - 2)


def batch_inv(a: Fp) -> Fp:
    """Montgomery batch inversion over the last axis (O(n) muls + one inv)."""
    # For simplicity and jit-friendliness use Fermat elementwise; callers on
    # hot paths should prefer this only for small tensors.
    return inv(a)


def sum_mod(a: Fp, axis: int = -1) -> Fp:
    """Modular sum over an axis via carry-save 16-bit columns (≤ 2^15 terms).

    One pass of 4 uint32 column sums + a single 128-bit reduction — replaces
    a chain of n modular adds (the MDS/barycentric inner product hot path).
    """
    n = a[0].shape[axis]
    assert n <= (1 << 15), "sum_mod: too many terms for 16-bit carry-save"
    m16 = _u32(0xFFFF)

    def _sum16(x):
        # Mosaic has no unsigned reductions; columns are < 2^31 so an int32
        # sum is exact. astype is value-preserving here.
        return jnp.sum(x.astype(jnp.int32), axis=axis).astype(jnp.uint32)

    s0 = _sum16(a[0] & m16)
    s1 = _sum16(a[0] >> _u32(16))
    s2 = _sum16(a[1] & m16)
    s3 = _sum16(a[1] >> _u32(16))
    # value = s0 + s1*2^16 + s2*2^32 + s3*2^48, each s_k < 2^31
    lo = s0 + (s1 << _u32(16))
    c0 = (lo < s0).astype(_U32)
    hi_a = (s1 >> _u32(16)) + s2 + c0          # < 2^32, no overflow (s_k < 2^31)
    hi = hi_a + (s3 << _u32(16))
    c1 = (hi < hi_a).astype(_U32)
    n2 = (s3 >> _u32(16)) + c1
    return reduce128(lo, hi, n2, jnp.zeros_like(n2))


def is_zero(a: Fp) -> jax.Array:
    return (a[0] == 0) & (a[1] == 0)


def eq(a: Fp, b: Fp) -> jax.Array:
    return (a[0] == b[0]) & (a[1] == b[1])


def select(mask: jax.Array, a: Fp, b: Fp) -> Fp:
    """mask ? a : b (mask is bool array)."""
    return jnp.where(mask, a[0], b[0]), jnp.where(mask, a[1], b[1])


def double(a: Fp) -> Fp:
    return add(a, a)


# ---------------------------------------------------------------------------
# Roots of unity (host-side exact computation)
# ---------------------------------------------------------------------------

def primitive_root_of_unity(log_n: int) -> int:
    """Python int: primitive 2^log_n-th root of unity."""
    assert 0 <= log_n <= TWO_ADICITY
    base = POWER_OF_TWO_GENERATOR
    for _ in range(TWO_ADICITY - log_n):
        base = (base * base) % MODULUS
    return base


def host_pow(base: int, e: int) -> int:
    return pow(base, e, MODULUS)


def host_inv(a: int) -> int:
    return pow(a, MODULUS - 2, MODULUS)
