"""GF(2^255 - 19) as 16x16-bit-limb uint32 tensors — curve25519 arithmetic.

Backbone of the batched Ed25519 verifier (the reference's hottest gadget:
300 signatures per proof via the Curta EdDSA STARK, /root/reference/
circuits/builder/justification.rs:237-243). TPU-native: a field element is
a (..., 16) uint32 array of 16-bit limbs; multiplication is a 16x16 limb
outer product (32-bit-safe) reduced by anti-diagonal column sums — an
einsum-shaped pattern XLA vectorizes, with no 64-bit integers anywhere.

All public functions keep elements **canonical** (< p) unless noted.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

P25519 = (1 << 255) - 19
NLIMB = 16
_M16 = jnp.uint32(0xFFFF)

_P_LIMBS = np.array([(P25519 >> (16 * i)) & 0xFFFF for i in range(NLIMB)],
                    dtype=np.uint32)


# ---------------------------------------------------------------------------
# Conversions
# ---------------------------------------------------------------------------

def to_limbs(values) -> jax.Array:
    """Python ints -> (..., 16) uint32 limbs (canonical)."""
    arr = np.asarray(values, dtype=np.object_)
    arr = np.vectorize(lambda v: int(v) % P25519, otypes=[np.object_])(arr)
    out = np.zeros(arr.shape + (NLIMB,), dtype=np.uint32)
    it = np.nditer(arr, flags=["multi_index", "refs_ok"])
    for v in it:
        val = int(v.item())
        for i in range(NLIMB):
            out[it.multi_index + (i,)] = (val >> (16 * i)) & 0xFFFF
    return jnp.asarray(out)


def from_limbs(x: jax.Array) -> np.ndarray:
    """Limbs -> canonical Python ints (reduces: ring values are lazy)."""
    arr = np.asarray(x, dtype=np.uint64)
    out = np.zeros(arr.shape[:-1], dtype=np.object_)
    it = np.nditer(out, flags=["multi_index", "refs_ok"], op_flags=["readwrite"])
    for o in it:
        val = 0
        for i in reversed(range(NLIMB)):
            val = (val << 16) | int(arr[it.multi_index + (i,)])
        out[it.multi_index] = val % P25519
    return out


def zeros(shape) -> jax.Array:
    return jnp.zeros(shape + (NLIMB,), jnp.uint32)


def const(shape, value: int) -> jax.Array:
    value %= P25519
    limbs = [(value >> (16 * i)) & 0xFFFF for i in range(NLIMB)]
    return jnp.broadcast_to(jnp.asarray(limbs, jnp.uint32), shape + (NLIMB,))


# ---------------------------------------------------------------------------
# Carry propagation / canonicalization
# ---------------------------------------------------------------------------

def _carry_chain(c: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Propagate carries over (..., 16) columns (< 2^32) -> 16-bit limbs +
    the final carry-out (value * 2^256... i.e. overflow beyond bit 256)."""
    limbs = []
    carry = jnp.zeros_like(c[..., 0])
    for i in range(NLIMB):
        v = c[..., i] + carry
        limbs.append(v & _M16)
        carry = v >> jnp.uint32(16)
    return jnp.stack(limbs, axis=-1), carry


def _fold_carry(limbs: jax.Array, carry: jax.Array) -> jax.Array:
    """value + carry*2^256 ≡ value + 38*carry (mod p); one extra chain."""
    c0 = limbs[..., 0] + carry * jnp.uint32(38)
    out = [c0 & _M16]
    carry2 = c0 >> jnp.uint32(16)
    for i in range(1, NLIMB):
        v = limbs[..., i] + carry2
        out.append(v & _M16)
        carry2 = v >> jnp.uint32(16)
    # carry2 can only be nonzero if the whole value was close to 2^256;
    # fold once more (now certainly zero after this)
    c0 = out[0] + carry2 * jnp.uint32(38)
    out[0] = c0 & _M16
    c = c0 >> jnp.uint32(16)
    for i in range(1, NLIMB):
        v = out[i] + c
        out[i] = v & _M16
        c = v >> jnp.uint32(16)
    return jnp.stack(out, axis=-1)


def _ge_p(x: jax.Array) -> jax.Array:
    """x >= p for 16-limb canonical-range values (< 2^256)."""
    p = jnp.asarray(_P_LIMBS)
    gt = jnp.zeros(x.shape[:-1], dtype=bool)
    eq = jnp.ones(x.shape[:-1], dtype=bool)
    for i in reversed(range(NLIMB)):
        gt = gt | (eq & (x[..., i] > p[i]))
        eq = eq & (x[..., i] == p[i])
    return gt | eq


def _sub_p(x: jax.Array) -> jax.Array:
    p = jnp.asarray(_P_LIMBS)
    out = []
    borrow = jnp.zeros(x.shape[:-1], jnp.uint32)
    for i in range(NLIMB):
        v = x[..., i] - p[i] - borrow
        out.append(v & _M16)
        borrow = (v >> jnp.uint32(16)) & jnp.uint32(1)  # wrapped => borrow
    return jnp.stack(out, axis=-1)


def canonicalize(x: jax.Array) -> jax.Array:
    """Reduce a 16-limb value (< 2^256) into [0, p) — two conditional
    subtracts (2^256 - 1 = 2p + 37, so at most two are ever needed)."""
    for _ in range(2):
        ge = _ge_p(x)
        x = jnp.where(ge[..., None], _sub_p(x), x)
    return x


# ---------------------------------------------------------------------------
# Ring ops
# ---------------------------------------------------------------------------

def add(a: jax.Array, b: jax.Array) -> jax.Array:
    """Lazy modular add: 16-bit limbs out, value < 2^256."""
    limbs, carry = _carry_chain(a + b)
    return _fold_carry(limbs, carry)


def sub(a: jax.Array, b: jax.Array) -> jax.Array:
    """Lazy modular subtract: a - b + 4p (4p > 2^256 > b), signed carries."""
    # 4p limb columns (17 bits in the top column is fine: columns are u32)
    tp = np.zeros(NLIMB, dtype=np.uint32)
    fourp = 4 * P25519
    for i in range(NLIMB):
        tp[i] = (fourp >> (16 * i)) & 0xFFFF
    tp[NLIMB - 1] |= (fourp >> (16 * NLIMB)) << 16  # keep the 2^256 part
    cols = a.astype(jnp.uint32) + jnp.asarray(tp) - b.astype(jnp.uint32)
    # columns may be "negative" (wrapped); signed arithmetic-shift carries
    limbs = []
    carry = jnp.zeros_like(cols[..., 0])
    for i in range(NLIMB):
        v = cols[..., i] + carry
        limbs.append(v & _M16)
        carry = (v.astype(jnp.int32) >> 16).astype(jnp.uint32)
    out = jnp.stack(limbs, axis=-1)
    # a - b + 4p < 2^256 + 4p < 2^258; top carry <= 5 folds via 2^256 ≡ 38
    return _fold_carry(out, carry)


def neg(a: jax.Array) -> jax.Array:
    return sub(zeros(a.shape[:-1]), a)


@lru_cache(maxsize=None)
def _column_matrix() -> np.ndarray:
    """(512, 32) 0/1 int32: maps [lo_flat(256) | hi_flat(256)] product halves
    onto their 2^16-weighted columns (hi parts land one column higher)."""
    m = np.zeros((2 * NLIMB * NLIMB, 2 * NLIMB), dtype=np.int32)
    for i in range(NLIMB):
        for j in range(NLIMB):
            m[i * NLIMB + j, i + j] = 1
            m[NLIMB * NLIMB + i * NLIMB + j, i + j + 1] = 1
    return m


def mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Modular multiply: limb outer product, columns via ONE integer matmul
    (the TPU MXU-shaped path), carry-save fold. Output is 16-bit limbs,
    value < 2^256 (lazily reduced — see canonicalize)."""
    prod = a[..., :, None] * b[..., None, :]        # (..., 16, 16) < 2^32
    lo = (prod & _M16).astype(jnp.int32)
    hi = (prod >> jnp.uint32(16)).astype(jnp.int32)
    lead = prod.shape[:-2]
    flat = jnp.concatenate([lo.reshape(lead + (NLIMB * NLIMB,)),
                            hi.reshape(lead + (NLIMB * NLIMB,))], axis=-1)
    cols = jax.lax.dot_general(
        flat, jnp.asarray(_column_matrix()),
        dimension_numbers=(((flat.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.uint32)  # (..., 32) < 2^25

    # fold columns >= 16: 2^(16k) = 2^(16(k-16)) * 2^256 ≡ 38 * 2^(16(k-16))
    folded = cols[..., :NLIMB] + cols[..., NLIMB:] * jnp.uint32(38)
    limbs, carry = _carry_chain(folded)
    return _fold_carry(limbs, carry)


def square(a: jax.Array) -> jax.Array:
    return mul(a, a)


def mul_small(a: jax.Array, k: int) -> jax.Array:
    """Multiply by a constant; fast limb-scale path for k < 2^15."""
    if k >= (1 << 15):
        return mul(a, const(a.shape[:-1], k))
    cols = a * jnp.uint32(k)
    limbs, carry = _carry_chain(cols)
    return _fold_carry(limbs, carry)


@partial(jax.jit, static_argnames=("k",))
def pow2k(a: jax.Array, k: int) -> jax.Array:
    """a^(2^k) — k squarings under a scan (flat trace)."""
    def body(x, _):
        return square(x), None
    out, _ = jax.lax.scan(body, a, None, length=k)
    return out


def inv(a: jax.Array) -> jax.Array:
    """a^(p-2) via the standard curve25519 addition chain."""
    # p - 2 = 2^255 - 21
    x1 = a
    x2 = mul(pow2k(x1, 1), x1)            # 2^2 - 1
    x4 = mul(pow2k(x2, 2), x2)            # 2^4 - 1
    x8 = mul(pow2k(x4, 4), x4)            # 2^8 - 1
    x16 = mul(pow2k(x8, 8), x8)           # 2^16 - 1
    x32 = mul(pow2k(x16, 16), x16)        # 2^32 - 1
    x64 = mul(pow2k(x32, 32), x32)        # 2^64 - 1
    x128 = mul(pow2k(x64, 64), x64)       # 2^128 - 1
    x250 = x128
    x250 = mul(pow2k(x250, 64), x64)      # 2^192 - 1
    x250 = mul(pow2k(x250, 32), x32)      # 2^224 - 1
    x250 = mul(pow2k(x250, 16), x16)      # 2^240 - 1
    x250 = mul(pow2k(x250, 8), x8)        # 2^248 - 1
    x250 = mul(pow2k(x250, 2), x2)        # 2^250 - 1
    # now (2^250-1) * 2^5 + 11 = 2^255 - 21
    out = mul(pow2k(x250, 5), _small_pow(a, 11))
    return out


def _small_pow(a: jax.Array, e: int) -> jax.Array:
    result = const(a.shape[:-1], 1)
    base = a
    while e:
        if e & 1:
            result = mul(result, base)
        base = square(base)
        e >>= 1
    return result


def pow_p58(a: jax.Array) -> jax.Array:
    """a^((p-5)/8) — used in Ed25519 decompression square roots.

    (p-5)/8 = 2^252 - 3.
    """
    x1 = a
    x2 = mul(pow2k(x1, 1), x1)
    x4 = mul(pow2k(x2, 2), x2)
    x8 = mul(pow2k(x4, 4), x4)
    x16 = mul(pow2k(x8, 8), x8)
    x32 = mul(pow2k(x16, 16), x16)
    x64 = mul(pow2k(x32, 32), x32)
    x128 = mul(pow2k(x64, 64), x64)
    x250 = mul(pow2k(x128, 64), x64)
    x250 = mul(pow2k(x250, 32), x32)
    x250 = mul(pow2k(x250, 16), x16)
    x250 = mul(pow2k(x250, 8), x8)
    x250 = mul(pow2k(x250, 2), x2)        # 2^250 - 1
    # (2^250 - 1) * 4 + 1 = 2^252 - 3
    return mul(pow2k(x250, 2), x1)


def eq(a: jax.Array, b: jax.Array) -> jax.Array:
    """Equality mod p (canonicalizes both sides: values are lazily reduced)."""
    return jnp.all(canonicalize(a) == canonicalize(b), axis=-1)


def is_zero(a: jax.Array) -> jax.Array:
    return jnp.all(canonicalize(a) == 0, axis=-1)


def select(mask: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.where(mask[..., None], a, b)
