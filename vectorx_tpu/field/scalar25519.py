"""Ed25519 scalar field (mod L) — device-side sc_reduce.

L = 2^252 + 27742317777372353535851937790883648493 (the basepoint order).
The EdDSA challenge h = SHA-512(R||A||M) mod L was the one host-side seam
left in the batched verifier (circuits/ed25519.py `compute_challenges`);
this closes it: a 512-bit digest reduces on-device by 260 rounds of
compare-and-subtract against a precomputed (L << k) table under one
`lax.scan` — pure uint32 limb ops, batched over signatures.

Layout: 16-bit limbs, 33 limbs per 513-bit working value (matches the
field25519 conventions; no 64-bit ints anywhere).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

L_ORDER = (1 << 252) + 27742317777372353535851937790883648493
NLIMB = 33          # 33 * 16 = 528 bits of headroom
_M16 = jnp.uint32(0xFFFF)
N_ROUNDS = 261      # 512 - 252 + 1 rounds cover any 512-bit input


def _shifted_l_table() -> np.ndarray:
    out = np.zeros((N_ROUNDS, NLIMB), dtype=np.uint32)
    for r in range(N_ROUNDS):
        k = N_ROUNDS - 1 - r            # descending shifts
        v = L_ORDER << k
        for i in range(NLIMB):
            out[r, i] = (v >> (16 * i)) & 0xFFFF
    return out


def _ge(x: jax.Array, t: jax.Array) -> jax.Array:
    """x >= t, limbwise lexicographic. x: (..., 33), t: (33,)."""
    gt = jnp.zeros(x.shape[:-1], dtype=bool)
    eq = jnp.ones(x.shape[:-1], dtype=bool)
    for i in reversed(range(NLIMB)):
        gt = gt | (eq & (x[..., i] > t[i]))
        eq = eq & (x[..., i] == t[i])
    return gt | eq


def _sub(x: jax.Array, t: jax.Array) -> jax.Array:
    """x - t with borrow propagation (requires x >= t)."""
    out = []
    borrow = jnp.zeros(x.shape[:-1], jnp.uint32)
    for i in range(NLIMB):
        d = x[..., i] + jnp.uint32(0x10000) - t[i] - borrow
        out.append(d & _M16)
        borrow = jnp.uint32(1) - (d >> jnp.uint32(16))
    return jnp.stack(out, axis=-1)


@jax.jit
def sc_reduce_limbs(x: jax.Array) -> jax.Array:
    """(..., 33) uint32 16-bit limbs -> (..., 33) limbs of x mod L."""
    table = jnp.asarray(_shifted_l_table())

    def body(acc, t):
        ge = _ge(acc, t)
        sub = _sub(acc, t)
        return jnp.where(ge[..., None], sub, acc), None

    out, _ = jax.lax.scan(body, x, table)
    return out


def bytes_to_limbs512(b: jax.Array) -> jax.Array:
    """(..., 64) uint8 little-endian -> (..., 33) 16-bit limbs."""
    b = b.astype(jnp.uint32)
    lo = b[..., 0::2]
    hi = b[..., 1::2]
    limbs32 = lo | (hi << jnp.uint32(8))          # (..., 32)
    pad = jnp.zeros(limbs32.shape[:-1] + (1,), jnp.uint32)
    return jnp.concatenate([limbs32, pad], axis=-1)


def limbs_to_bytes32(l: jax.Array) -> jax.Array:
    """(..., 33) limbs (value < 2^256) -> (..., 32) uint8 LE."""
    l16 = l[..., :16]
    lo = (l16 & jnp.uint32(0xFF)).astype(jnp.uint8)
    hi = ((l16 >> jnp.uint32(8)) & jnp.uint32(0xFF)).astype(jnp.uint8)
    return jnp.stack([lo, hi], axis=-1).reshape(l.shape[:-1] + (32,))


@jax.jit
def sc_reduce512(digests: jax.Array) -> jax.Array:
    """(..., 64) uint8 SHA-512 digests -> (..., 32) uint8 LE of (d mod L)."""
    return limbs_to_bytes32(sc_reduce_limbs(bytes_to_limbs512(digests)))
