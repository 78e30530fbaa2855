"""Batched SHA-256 as uint32 vector ops — bit-exact with hashlib.

SHA-256 fixes the reference's *public* commitments: the chained
authority-set hash (/root/reference/circuits/input/mod.rs:250-260), the
simple Merkle root over state/data roots (input/mod.rs:464-489), and the
in-circuit equivalents (curta_sha256, SURVEY.md §2.2). On TPU the 32-bit
bitwise schedule maps directly onto VPU lanes; the batch axis is the
parallel dimension (hash many messages at once — e.g. all Merkle-tree nodes
of one level, or 300 chain steps across independent sets).

Layout: messages as uint32 big-endian words, shape (..., n_blocks, 16);
digest (..., 8) words. Static block counts (circuit-style); variable length
within a padded buffer via `sha256_variable` masking.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_K = np.array([
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2], dtype=np.uint32)

_H0 = np.array([
    0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
    0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19], dtype=np.uint32)


def _rotr(x, r):
    return (x >> jnp.uint32(r)) | (x << jnp.uint32(32 - r))


def compress(state: jax.Array, block: jax.Array) -> jax.Array:
    """One compression: state (..., 8), block (..., 16) BE words -> (..., 8).

    Message schedule + 64 rounds run under lax.scan (two ~20-op bodies), so
    trace/compile cost stays flat no matter how many blocks call sites chain.
    """
    # schedule: rolling 16-word window emits w[16..63]
    def sched(window, _):
        wm16 = window[..., 0]
        wm15 = window[..., 1]
        wm7 = window[..., 9]
        wm2 = window[..., 14]
        s0 = _rotr(wm15, 7) ^ _rotr(wm15, 18) ^ (wm15 >> jnp.uint32(3))
        s1 = _rotr(wm2, 17) ^ _rotr(wm2, 19) ^ (wm2 >> jnp.uint32(10))
        new = wm16 + s0 + wm7 + s1
        window = jnp.concatenate([window[..., 1:], new[..., None]], axis=-1)
        return window, new

    _, w_ext = jax.lax.scan(sched, block, None, length=48)  # (48, ...)
    w_all = jnp.concatenate([jnp.moveaxis(block, -1, 0), w_ext], axis=0)  # (64, ...)

    def rnd(carry, xs):
        a, b, c, d, e, f, g, h = carry
        w_i, k_i = xs
        s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + s1 + ch + k_i + w_i
        s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = s0 + maj
        return (t1 + t2, a, b, c, d + t1, e, f, g), None

    init = tuple(state[..., i] for i in range(8))
    out, _ = jax.lax.scan(rnd, init, (w_all, jnp.asarray(_K)))
    return state + jnp.stack(out, axis=-1)


@jax.jit
def sha256_blocks(blocks: jax.Array) -> jax.Array:
    """Fully-padded messages: (..., n_blocks, 16) BE words -> (..., 8) digest."""
    state = jnp.broadcast_to(jnp.asarray(_H0), blocks.shape[:-2] + (8,))
    state, _ = jax.lax.scan(
        lambda s, blk: (compress(s, blk), None),
        state, jnp.moveaxis(blocks, -2, 0))
    return state


@jax.jit
def sha256_variable(blocks: jax.Array, n_active_blocks: jax.Array) -> jax.Array:
    """Variable block count within a padded buffer, via masking.

    blocks: (..., MAX_BLOCKS, 16) — caller places SHA padding inside the
    active region (block n_active-1). n_active_blocks: (...,) int32.
    Matches curta_sha256's fixed-layout/variable-length semantics.
    """
    state = jnp.broadcast_to(jnp.asarray(_H0), blocks.shape[:-2] + (8,))

    def body(s, xs):
        i, blk = xs
        new = compress(s, blk)
        active = (i < n_active_blocks)[..., None]
        return jnp.where(active, new, s), None

    xs = (jnp.arange(blocks.shape[-2], dtype=n_active_blocks.dtype),
          jnp.moveaxis(blocks, -2, 0))
    state, _ = jax.lax.scan(body, state, xs)
    return state


# ---------------------------------------------------------------------------
# Host-side packing helpers
# ---------------------------------------------------------------------------

def pad_message(msg: bytes) -> np.ndarray:
    """Standard SHA-256 padding -> (n_blocks, 16) uint32 BE words."""
    ml = len(msg) * 8
    data = msg + b"\x80"
    data += b"\x00" * ((-(len(data) + 8)) % 64)
    data += ml.to_bytes(8, "big")
    arr = np.frombuffer(data, dtype=">u4").astype(np.uint32)
    return arr.reshape(-1, 16)


def digest_to_bytes(digest_words: np.ndarray) -> bytes:
    """(8,) uint32 words -> 32-byte digest."""
    return b"".join(int(w).to_bytes(4, "big") for w in np.asarray(digest_words))


def sha256_bytes(messages) -> np.ndarray:
    """Convenience: equal-length byte strings -> (n, 32) uint8 digests."""
    blocks = np.stack([pad_message(m) for m in messages])
    out = np.asarray(sha256_blocks(jnp.asarray(blocks)))
    return np.stack([
        np.frombuffer(digest_to_bytes(out[i]), dtype=np.uint8)
        for i in range(out.shape[0])
    ])
