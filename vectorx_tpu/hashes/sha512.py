"""Batched SHA-512 as uint32-pair vector ops — bit-exact with hashlib.

Needed for Ed25519: the EdDSA challenge is H = SHA-512(R || A || M)
(the reference's Curta EdDSA gadget computes the same internally,
SURVEY.md §2.2 "Curta Ed25519"). 64-bit words live as (lo, hi) uint32
planes exactly like blake2b.py; rounds run under lax.scan.

Layout: message blocks (..., n_blocks, 16) per plane (BE u64 words);
digest (..., 8) word pairs.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

U64 = Tuple[jax.Array, jax.Array]

_K = [
    0x428a2f98d728ae22, 0x7137449123ef65cd, 0xb5c0fbcfec4d3b2f, 0xe9b5dba58189dbbc,
    0x3956c25bf348b538, 0x59f111f1b605d019, 0x923f82a4af194f9b, 0xab1c5ed5da6d8118,
    0xd807aa98a3030242, 0x12835b0145706fbe, 0x243185be4ee4b28c, 0x550c7dc3d5ffb4e2,
    0x72be5d74f27b896f, 0x80deb1fe3b1696b1, 0x9bdc06a725c71235, 0xc19bf174cf692694,
    0xe49b69c19ef14ad2, 0xefbe4786384f25e3, 0x0fc19dc68b8cd5b5, 0x240ca1cc77ac9c65,
    0x2de92c6f592b0275, 0x4a7484aa6ea6e483, 0x5cb0a9dcbd41fbd4, 0x76f988da831153b5,
    0x983e5152ee66dfab, 0xa831c66d2db43210, 0xb00327c898fb213f, 0xbf597fc7beef0ee4,
    0xc6e00bf33da88fc2, 0xd5a79147930aa725, 0x06ca6351e003826f, 0x142929670a0e6e70,
    0x27b70a8546d22ffc, 0x2e1b21385c26c926, 0x4d2c6dfc5ac42aed, 0x53380d139d95b3df,
    0x650a73548baf63de, 0x766a0abb3c77b2a8, 0x81c2c92e47edaee6, 0x92722c851482353b,
    0xa2bfe8a14cf10364, 0xa81a664bbc423001, 0xc24b8b70d0f89791, 0xc76c51a30654be30,
    0xd192e819d6ef5218, 0xd69906245565a910, 0xf40e35855771202a, 0x106aa07032bbd1b8,
    0x19a4c116b8d2d0c8, 0x1e376c085141ab53, 0x2748774cdf8eeb99, 0x34b0bcb5e19b48a8,
    0x391c0cb3c5c95a63, 0x4ed8aa4ae3418acb, 0x5b9cca4f7763e373, 0x682e6ff3d6b2b8a3,
    0x748f82ee5defb2fc, 0x78a5636f43172f60, 0x84c87814a1f0ab72, 0x8cc702081a6439ec,
    0x90befffa23631e28, 0xa4506cebde82bde9, 0xbef9a3f7b2c67915, 0xc67178f2e372532b,
    0xca273eceea26619c, 0xd186b8c721c0c207, 0xeada7dd6cde0eb1e, 0xf57d4f7fee6ed178,
    0x06f067aa72176fba, 0x0a637dc5a2c898a6, 0x113f9804bef90dae, 0x1b710b35131c471b,
    0x28db77f523047d84, 0x32caab7b40c72493, 0x3c9ebe0a15c9bebc, 0x431d67c49c100d4c,
    0x4cc5d4becb3e42b6, 0x597f299cfc657e2a, 0x5fcb6fab3ad6faec, 0x6c44198c4a475817,
]
_K_LO = np.array([k & 0xFFFFFFFF for k in _K], dtype=np.uint32)
_K_HI = np.array([k >> 32 for k in _K], dtype=np.uint32)

_H0 = [
    0x6a09e667f3bcc908, 0xbb67ae8584caa73b, 0x3c6ef372fe94f82b, 0xa54ff53a5f1d36f1,
    0x510e527fade682d1, 0x9b05688c2b3e6c1f, 0x1f83d9abfb41bd6b, 0x5be0cd19137e2179,
]
_H0_LO = np.array([h & 0xFFFFFFFF for h in _H0], dtype=np.uint32)
_H0_HI = np.array([h >> 32 for h in _H0], dtype=np.uint32)


def _add(a: U64, b: U64) -> U64:
    lo = a[0] + b[0]
    carry = (lo < a[0]).astype(jnp.uint32)
    return lo, a[1] + b[1] + carry


def _xor(a: U64, b: U64) -> U64:
    return a[0] ^ b[0], a[1] ^ b[1]


def _and(a: U64, b: U64) -> U64:
    return a[0] & b[0], a[1] & b[1]


def _not(a: U64) -> U64:
    return ~a[0], ~a[1]


def _rotr(x: U64, r: int) -> U64:
    lo, hi = x
    if r == 32:
        return hi, lo
    if r < 32:
        rr, rl = jnp.uint32(r), jnp.uint32(32 - r)
        return (lo >> rr) | (hi << rl), (hi >> rr) | (lo << rl)
    r -= 32
    rr, rl = jnp.uint32(r), jnp.uint32(32 - r)
    return (hi >> rr) | (lo << rl), (lo >> rr) | (hi << rl)


def _shr(x: U64, r: int) -> U64:
    lo, hi = x
    if r < 32:
        rr, rl = jnp.uint32(r), jnp.uint32(32 - r)
        return (lo >> rr) | (hi << rl), hi >> rr
    rr = jnp.uint32(r - 32)
    return hi >> rr, jnp.zeros_like(hi)


def compress(state: Tuple[jax.Array, jax.Array],
             block: Tuple[jax.Array, jax.Array]) -> Tuple[jax.Array, jax.Array]:
    """state: ((..., 8), (..., 8)) planes; block: ((..., 16), (..., 16))."""
    s_lo, s_hi = state
    b_lo, b_hi = block

    def sched(window, _):
        w_lo, w_hi = window
        def at(i):
            return (w_lo[..., i], w_hi[..., i])
        wm15, wm2, wm16, wm7 = at(1), at(14), at(0), at(9)
        s0 = _xor(_xor(_rotr(wm15, 1), _rotr(wm15, 8)), _shr(wm15, 7))
        s1 = _xor(_xor(_rotr(wm2, 19), _rotr(wm2, 61)), _shr(wm2, 6))
        new = _add(_add(wm16, s0), _add(wm7, s1))
        w_lo = jnp.concatenate([w_lo[..., 1:], new[0][..., None]], axis=-1)
        w_hi = jnp.concatenate([w_hi[..., 1:], new[1][..., None]], axis=-1)
        return (w_lo, w_hi), new

    _, w_ext = jax.lax.scan(sched, (b_lo, b_hi), None, length=64)
    w_lo_all = jnp.concatenate([jnp.moveaxis(b_lo, -1, 0), w_ext[0]], axis=0)
    w_hi_all = jnp.concatenate([jnp.moveaxis(b_hi, -1, 0), w_ext[1]], axis=0)

    def rnd(carry, xs):
        a, b, c, d, e, f, g, h = carry
        w_l, w_h, k_l, k_h = xs
        w_i = (w_l, w_h)
        k_i = (k_l, k_h)
        s1 = _xor(_xor(_rotr(e, 14), _rotr(e, 18)), _rotr(e, 41))
        ch = _xor(_and(e, f), _and(_not(e), g))
        t1 = _add(_add(_add(h, s1), _add(ch, k_i)), w_i)
        s0 = _xor(_xor(_rotr(a, 28), _rotr(a, 34)), _rotr(a, 39))
        maj = _xor(_xor(_and(a, b), _and(a, c)), _and(b, c))
        t2 = _add(s0, maj)
        return (_add(t1, t2), a, b, c, _add(d, t1), e, f, g), None

    init = tuple((s_lo[..., i], s_hi[..., i]) for i in range(8))
    out, _ = jax.lax.scan(rnd, init, (w_lo_all, w_hi_all,
                                      jnp.asarray(_K_LO), jnp.asarray(_K_HI)))
    new_lo = jnp.stack([_add((s_lo[..., i], s_hi[..., i]), out[i])[0] for i in range(8)], axis=-1)
    new_hi = jnp.stack([_add((s_lo[..., i], s_hi[..., i]), out[i])[1] for i in range(8)], axis=-1)
    return new_lo, new_hi


@jax.jit
def sha512_blocks(b_lo: jax.Array, b_hi: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Fully-padded: (..., n_blocks, 16) planes -> (..., 8) digest planes."""
    lead = b_lo.shape[:-2]
    state = (jnp.broadcast_to(jnp.asarray(_H0_LO), lead + (8,)),
             jnp.broadcast_to(jnp.asarray(_H0_HI), lead + (8,)))
    state, _ = jax.lax.scan(
        lambda s, blk: (compress(s, blk), None),
        state, (jnp.moveaxis(b_lo, -2, 0), jnp.moveaxis(b_hi, -2, 0)))
    return state


@jax.jit
def sha512_variable(b_lo: jax.Array, b_hi: jax.Array,
                    n_active_blocks: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Variable block count in a padded buffer (padding pre-placed by caller)."""
    lead = b_lo.shape[:-2]
    state = (jnp.broadcast_to(jnp.asarray(_H0_LO), lead + (8,)),
             jnp.broadcast_to(jnp.asarray(_H0_HI), lead + (8,)))

    def body(s, xs):
        i, blk_lo, blk_hi = xs
        new = compress(s, (blk_lo, blk_hi))
        active = (i < n_active_blocks)[..., None]
        return (jnp.where(active, new[0], s[0]), jnp.where(active, new[1], s[1])), None

    xs = (jnp.arange(b_lo.shape[-2], dtype=n_active_blocks.dtype),
          jnp.moveaxis(b_lo, -2, 0), jnp.moveaxis(b_hi, -2, 0))
    state, _ = jax.lax.scan(body, state, xs)
    return state


# ---------------------------------------------------------------------------
# Host-side packing
# ---------------------------------------------------------------------------

def pad_message(msg: bytes) -> Tuple[np.ndarray, np.ndarray]:
    """SHA-512 padding -> (n_blocks, 16) BE u64 planes (lo, hi)."""
    ml = len(msg) * 8
    data = msg + b"\x80"
    data += b"\x00" * ((-(len(data) + 16)) % 128)
    data += ml.to_bytes(16, "big")
    words = np.frombuffer(data, dtype=">u8").reshape(-1, 16)
    return ((words & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (words >> np.uint64(32)).astype(np.uint32))


def digest_to_bytes(d_lo: np.ndarray, d_hi: np.ndarray) -> bytes:
    out = b""
    for i in range(8):
        out += int(d_hi[i]).to_bytes(4, "big") + int(d_lo[i]).to_bytes(4, "big")
    return out


def sha512_bytes(messages) -> list:
    packed = [pad_message(m) for m in messages]
    nb = max(p[0].shape[0] for p in packed)
    lo = np.zeros((len(messages), nb, 16), np.uint32)
    hi = np.zeros((len(messages), nb, 16), np.uint32)
    counts = np.zeros((len(messages),), np.int32)
    for i, (pl, ph) in enumerate(packed):
        lo[i, :pl.shape[0]] = pl
        hi[i, :ph.shape[0]] = ph
        counts[i] = pl.shape[0]
    d_lo, d_hi = sha512_variable(jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(counts))
    d_lo, d_hi = np.asarray(d_lo), np.asarray(d_hi)
    return [digest_to_bytes(d_lo[i], d_hi[i]) for i in range(len(messages))]
