"""Batched Ed25519 verification over the device — the justification hot loop.

Re-implements the capability of the reference's Curta EdDSA STARK gadget
(`curta_eddsa_verify_sigs_conditional`, /root/reference/circuits/builder/
justification.rs:237-243: up to 300 conditional signature checks over one
53-byte precommit message). TPU-native: all 300 signatures verify as ONE
batched tensor program — point coordinates are (batch, 16)-limb tensors
(field/field25519.py), scalar muls are 256-step lax.scans of batched
double/add, and the EdDSA challenge H = SHA-512(R||A||M) is the batched
sha512 kernel.

Verification equation (cofactorless, matching ed25519-dalek `verify` used by
the reference's witness/oracle path, input/mod.rs:241-247):

    [s]B == R + [h]A,   h = SHA-512(R || A || M) mod L

Scalar reduction mod L currently happens host-side (`reduce_scalars_mod_l`);
the batched curve pipeline is fully on-device.

Doubling/addition: extended twisted-Edwards coordinates (X:Y:Z:T), a = -1
(dbl-2008-hwcd / add-2008-hwcd-3 formulas).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import field25519 as fe
from ..hashes import sha512 as s512

P = fe.P25519
L_ORDER = (1 << 252) + 27742317777372353535851937790883648493
D_CONST = (-121665 * pow(121666, P - 2, P)) % P
SQRT_M1 = pow(2, (P - 1) // 4, P)

# base point
_BY = (4 * pow(5, P - 2, P)) % P
_BX = None  # derived below


def _recover_x(y: int, sign: int) -> int:
    u = (y * y - 1) % P
    v = (D_CONST * y * y + 1) % P
    x = (u * pow(v, 3, P)) % P * pow((u * pow(v, 7, P)) % P, (P - 5) // 8, P) % P
    if (v * x * x) % P == (-u) % P:
        x = (x * SQRT_M1) % P
    assert (v * x * x) % P == u % P
    if x % 2 != sign:
        x = P - x
    return x


_BX = _recover_x(_BY, 0)


class Point(NamedTuple):
    """Extended coordinates, each (..., 16) limbs."""
    x: jax.Array
    y: jax.Array
    z: jax.Array
    t: jax.Array


def identity(shape) -> Point:
    return Point(fe.zeros(shape), fe.const(shape, 1), fe.const(shape, 1),
                 fe.zeros(shape))


def base_point(shape) -> Point:
    return Point(fe.const(shape, _BX), fe.const(shape, _BY),
                 fe.const(shape, 1), fe.const(shape, _BX * _BY % P))


def point_add(p: Point, q: Point) -> Point:
    a = fe.mul(fe.sub(p.y, p.x), fe.sub(q.y, q.x))
    b = fe.mul(fe.add(p.y, p.x), fe.add(q.y, q.x))
    c = fe.mul(fe.mul_small(fe.mul(p.t, q.t), 2), fe.const(p.x.shape[:-1], D_CONST))
    d = fe.mul_small(fe.mul(p.z, q.z), 2)
    e = fe.sub(b, a)
    f = fe.sub(d, c)
    g = fe.add(d, c)
    h = fe.add(b, a)
    return Point(fe.mul(e, f), fe.mul(g, h), fe.mul(f, g), fe.mul(e, h))


def point_double(p: Point) -> Point:
    a = fe.square(p.x)
    b = fe.square(p.y)
    c = fe.mul_small(fe.square(p.z), 2)
    e = fe.sub(fe.sub(fe.square(fe.add(p.x, p.y)), a), b)
    g = fe.sub(b, a)
    f = fe.sub(g, c)
    h = fe.sub(fe.zeros(p.x.shape[:-1]), fe.add(a, b))
    return Point(fe.mul(e, f), fe.mul(g, h), fe.mul(f, g), fe.mul(e, h))


def point_select(mask: jax.Array, p: Point, q: Point) -> Point:
    return Point(fe.select(mask, p.x, q.x), fe.select(mask, p.y, q.y),
                 fe.select(mask, p.z, q.z), fe.select(mask, p.t, q.t))


@jax.jit
def scalar_mul_binary(p: Point, bits: jax.Array) -> Point:
    """[k]P, binary double-and-add (reference path; 256 dbl + 256 cond-add)."""
    shape = p.x.shape[:-1]
    acc = identity(shape)

    def body(carry, bit):
        acc, base = carry
        added = point_add(acc, base)
        acc = point_select(bit.astype(bool), added, acc)
        base = point_double(base)
        return (acc, base), None

    (acc, _), _ = jax.lax.scan(body, (acc, p), jnp.moveaxis(bits, -1, 0))
    return acc


@jax.jit
def scalar_mul(p: Point, bits: jax.Array) -> Point:
    """[k]P via a 4-bit window: 15-entry table then 64 x (4 dbl + 1 add).

    ~1.7x fewer field muls than the binary ladder, and the per-digit table
    lookup is a batched gather (TPU-friendly). bits: (..., 256) LSB-first.
    """
    shape = p.x.shape[:-1]

    # table T[k] = [k]P, k = 0..15 (T[0] = identity), built under a scan
    # so the trace stays one point-add body
    def tbl_body(prev, _):
        nxt = point_add(prev, p)
        return nxt, prev

    _, entries = jax.lax.scan(tbl_body, identity(shape), None, length=16)
    table = Point(entries.x, entries.y, entries.z, entries.t)  # (16, ..., 16)

    # 4-bit digits, MSB-first
    b4 = bits.reshape(bits.shape[:-1] + (64, 4)).astype(jnp.uint32)
    digits = (b4[..., 0] | (b4[..., 1] << 1) | (b4[..., 2] << 2)
              | (b4[..., 3] << 3))                    # (..., 64) LSB-first
    digits = jnp.flip(digits, axis=-1)                # MSB-first

    def lookup(d):
        idx = d[None, ..., None]                       # (1, ..., 1)
        return Point(*[jnp.take_along_axis(getattr(table, f),
                                           idx.astype(jnp.int32), axis=0)[0]
                       for f in ("x", "y", "z", "t")])

    def body(acc, d):
        for _ in range(4):
            acc = point_double(acc)
        return point_add(acc, lookup(d)), None

    acc, _ = jax.lax.scan(body, identity(shape), jnp.moveaxis(digits, -1, 0))
    return acc


def bytes_to_bits_le(b: jax.Array) -> jax.Array:
    """(..., 32) uint8 -> (..., 256) LSB-first bits."""
    shifts = jnp.arange(8, dtype=jnp.uint32)
    bits = (b[..., :, None].astype(jnp.uint32) >> shifts) & jnp.uint32(1)
    return bits.reshape(b.shape[:-1] + (256,))


def bytes_to_limbs_le(b: jax.Array) -> jax.Array:
    """(..., 32) uint8 little-endian -> (..., 16) 16-bit limbs."""
    b = b.astype(jnp.uint32)
    lo = b[..., 0::2]
    hi = b[..., 1::2]
    return lo | (hi << jnp.uint32(8))


def limbs_to_bytes_le(l: jax.Array) -> jax.Array:
    lo = (l & jnp.uint32(0xFF)).astype(jnp.uint8)
    hi = ((l >> jnp.uint32(8)) & jnp.uint32(0xFF)).astype(jnp.uint8)
    return jnp.stack([lo, hi], axis=-1).reshape(l.shape[:-1] + (32,))


@jax.jit
def decompress(compressed: jax.Array) -> Tuple[Point, jax.Array]:
    """(..., 32) uint8 compressed points -> (Point, valid flag)."""
    sign = (compressed[..., 31] >> 7).astype(jnp.uint32)
    y_bytes = compressed.at[..., 31].set(compressed[..., 31] & jnp.uint8(0x7F))
    y = bytes_to_limbs_le(y_bytes)
    y_valid = ~fe._ge_p(y)
    y = fe.canonicalize(y)

    shape = y.shape[:-1]
    one = fe.const(shape, 1)
    y2 = fe.square(y)
    u = fe.sub(y2, one)
    v = fe.add(fe.mul(y2, fe.const(shape, D_CONST)), one)

    v3 = fe.mul(fe.square(v), v)
    v7 = fe.mul(fe.square(v3), v)
    x = fe.mul(fe.mul(u, v3), fe.pow_p58(fe.mul(u, v7)))

    vxx = fe.mul(v, fe.square(x))
    ok_direct = fe.eq(vxx, u)
    ok_flip = fe.eq(vxx, fe.sub(fe.zeros(shape), u))
    x_flipped = fe.mul(x, fe.const(shape, SQRT_M1))
    x = fe.select(ok_direct, x, x_flipped)
    valid = y_valid & (ok_direct | ok_flip)

    # x = 0 with sign bit set is invalid
    x_is_zero = fe.is_zero(x)
    valid = valid & ~(x_is_zero & (sign == 1))

    # choose sign (parity needs the canonical representative)
    x = fe.canonicalize(fe.canonicalize(x))
    x_neg = fe.canonicalize(fe.canonicalize(fe.sub(fe.zeros(shape), x)))
    wrong_sign = (x[..., 0] & jnp.uint32(1)) != sign
    x = fe.select(wrong_sign, x_neg, x)

    return Point(x, y, one, fe.mul(x, y)), valid


def point_eq(p: Point, q: Point) -> jax.Array:
    """Projective equality: X1 Z2 == X2 Z1 and Y1 Z2 == Y2 Z1."""
    return (fe.eq(fe.mul(p.x, q.z), fe.mul(q.x, p.z))
            & fe.eq(fe.mul(p.y, q.z), fe.mul(q.y, p.z)))


def verify_batch(pubkeys: jax.Array, r_bytes: jax.Array, s_bytes: jax.Array,
                 h_bytes: jax.Array, enabled: jax.Array) -> jax.Array:
    """Batched cofactorless EdDSA check.

    pubkeys/r_bytes/s_bytes/h_bytes: (n, 32) uint8 (h = SHA512(R||A||M) mod L,
    LE). enabled: (n,) bool — disabled lanes return True (the reference's
    conditional-verification semantics for padding signatures).

    Eager orchestration over jitted stages: scalar_mul compiles ONCE and is
    reused for both [s]B and [h]A (a monolithic jit of the whole check
    compiles for tens of minutes on a small host).
    """
    a_pt, a_ok = decompress(pubkeys)
    r_pt, r_ok = decompress(r_bytes)

    s_bits = bytes_to_bits_le(s_bytes)
    h_bits = bytes_to_bits_le(h_bytes)

    lhs = scalar_mul(base_point(pubkeys.shape[:-1]), s_bits)   # [s]B
    rhs = point_add(r_pt, scalar_mul(a_pt, h_bits))            # R + [h]A

    ok = a_ok & r_ok & point_eq(lhs, rhs)
    return jnp.where(enabled, ok, True)


# ---------------------------------------------------------------------------
# Host-side helpers
# ---------------------------------------------------------------------------

def compute_challenges(r_list, a_list, msg: bytes) -> np.ndarray:
    """h = SHA512(R || A || M) mod L for each signature -> (n, 32) uint8 LE.

    Fully on-device: batched SHA-512 (hashes/sha512.py) then the batched
    sc_reduce mod-L pass (field/scalar25519.py).
    """
    from ..field import scalar25519 as sc
    msgs = [bytes(r) + bytes(a) + msg for r, a in zip(r_list, a_list)]
    digests = s512.sha512_bytes(msgs)
    d_arr = jnp.asarray(
        np.stack([np.frombuffer(d, np.uint8) for d in digests]))
    return np.asarray(sc.sc_reduce512(d_arr))
