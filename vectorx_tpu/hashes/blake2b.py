"""Batched variable-length Blake2b-256 as uint32-pair vector ops.

Blake2b-256 is the Avail header hash — the reference hashes every
SCALE-encoded header with it (``hash_encoded_header`` →
``curta_blake2b_variable``, /root/reference/circuits/builder/header.rs:14-19)
over buffers padded to MAX_HEADER_SIZE = 280 chunks × 128 B
(/root/reference/circuits/consts.rs:9-16). Bit-exactness with the chain is
mandatory: header hashes feed the on-chain public outputs.

TPU-native layout: 64-bit words live as two uint32 planes (lo, hi); a batch
of messages is shape (..., MAX_CHUNKS, 16) per plane. The 12-round G-network
is pure VPU ops (adds, xors, rotates); the *batch* axis carries the
parallelism (e.g. 8 headers per map shard × N shards). Variable length is
handled exactly like the reference circuit: a static MAX_CHUNKS buffer,
a traced byte length, and per-chunk active/last masking.

Caller contract (same as the reference's witness padding,
input/mod.rs:344-372): bytes at positions >= length must be zero.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

U64 = Tuple[jax.Array, jax.Array]  # (lo, hi) uint32 planes

_IV = np.array([
    0x6a09e667f3bcc908, 0xbb67ae8584caa73b, 0x3c6ef372fe94f82b,
    0xa54ff53a5f1d36f1, 0x510e527fade682d1, 0x9b05688c2b3e6c1f,
    0x1f83d9abfb41bd6b, 0x5be0cd19137e2179], dtype=np.uint64)

_SIGMA = np.array([
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
    [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
    [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
    [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
    [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
    [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
    [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
    [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
    [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0]], dtype=np.int32)

DIGEST_BYTES = 32
CHUNK_BYTES = 128


def _add(a: U64, b: U64) -> U64:
    lo = a[0] + b[0]
    carry = (lo < a[0]).astype(jnp.uint32)
    return lo, a[1] + b[1] + carry


def _xor(a: U64, b: U64) -> U64:
    return a[0] ^ b[0], a[1] ^ b[1]


def _rotr(x: U64, r: int) -> U64:
    lo, hi = x
    if r == 32:
        return hi, lo
    if r < 32:
        rr = jnp.uint32(r)
        rl = jnp.uint32(32 - r)
        return (lo >> rr) | (hi << rl), (hi >> rr) | (lo << rl)
    # r in (32, 64): rotr(r) == swap then rotr(r-32)
    r -= 32
    rr = jnp.uint32(r)
    rl = jnp.uint32(32 - r)
    return (hi >> rr) | (lo << rl), (lo >> rr) | (hi << rl)


def _g(v, a, b, c, d, x: U64, y: U64):
    v[a] = _add(_add(v[a], v[b]), x)
    v[d] = _rotr(_xor(v[d], v[a]), 32)
    v[c] = _add(v[c], v[d])
    v[b] = _rotr(_xor(v[b], v[c]), 24)
    v[a] = _add(_add(v[a], v[b]), y)
    v[d] = _rotr(_xor(v[d], v[a]), 16)
    v[c] = _add(v[c], v[d])
    v[b] = _rotr(_xor(v[b], v[c]), 63)


def _const64(val: int, shape) -> U64:
    return (jnp.full(shape, val & 0xFFFFFFFF, jnp.uint32),
            jnp.full(shape, (val >> 32) & 0xFFFFFFFF, jnp.uint32))


def compress(h_lo, h_hi, m_lo, m_hi, t: U64, last_mask: jax.Array):
    """One Blake2b compression.

    h: (..., 8) planes; m: (..., 16) planes; t: (...,) byte-counter planes;
    last_mask: (...,) uint32 0/1 — applies the final-block flag.
    Returns new (h_lo, h_hi).
    """
    shape = h_lo.shape[:-1]
    v = [(h_lo[..., i], h_hi[..., i]) for i in range(8)]
    v += [_const64(int(_IV[i]), shape) for i in range(8)]
    v[12] = _xor(v[12], t)
    full = last_mask * jnp.uint32(0xFFFFFFFF)
    v[14] = (v[14][0] ^ full, v[14][1] ^ full)

    # 12 rounds under lax.scan; per-round message permutation is a gather
    # over the word axis by the SIGMA row (keeps the trace to one round body)
    sigma12 = jnp.asarray(np.concatenate([_SIGMA, _SIGMA[:2]], axis=0))  # (12, 16)

    def round_body(carry, s):
        v_lo, v_hi = carry  # (..., 16) planes
        ms_lo = jnp.take(m_lo, s, axis=-1)
        ms_hi = jnp.take(m_hi, s, axis=-1)
        vv = [(v_lo[..., i], v_hi[..., i]) for i in range(16)]
        mm = [(ms_lo[..., i], ms_hi[..., i]) for i in range(16)]
        _g(vv, 0, 4, 8, 12, mm[0], mm[1])
        _g(vv, 1, 5, 9, 13, mm[2], mm[3])
        _g(vv, 2, 6, 10, 14, mm[4], mm[5])
        _g(vv, 3, 7, 11, 15, mm[6], mm[7])
        _g(vv, 0, 5, 10, 15, mm[8], mm[9])
        _g(vv, 1, 6, 11, 12, mm[10], mm[11])
        _g(vv, 2, 7, 8, 13, mm[12], mm[13])
        _g(vv, 3, 4, 9, 14, mm[14], mm[15])
        v_lo = jnp.stack([x[0] for x in vv], axis=-1)
        v_hi = jnp.stack([x[1] for x in vv], axis=-1)
        return (v_lo, v_hi), None

    v_lo0 = jnp.stack([x[0] for x in v], axis=-1)
    v_hi0 = jnp.stack([x[1] for x in v], axis=-1)
    (v_lo, v_hi), _ = jax.lax.scan(round_body, (v_lo0, v_hi0), sigma12)

    out_lo = h_lo ^ v_lo[..., :8] ^ v_lo[..., 8:]
    out_hi = h_hi ^ v_hi[..., :8] ^ v_hi[..., 8:]
    return out_lo, out_hi


@jax.jit
def blake2b256_variable(m_lo: jax.Array, m_hi: jax.Array, length: jax.Array):
    """Variable-length Blake2b-256 over a zero-padded MAX_CHUNKS buffer.

    m_lo/m_hi: (..., MAX_CHUNKS, 16) uint32 planes (LE u64 message words).
    length: (...,) uint32 total message byte length (bytes >= length are 0).
    Returns digest planes (..., 4): h[0..3] — 32 bytes little-endian.
    """
    max_chunks = m_lo.shape[-2]
    shape = m_lo.shape[:-2]
    length = length.astype(jnp.uint32)

    h_lo = jnp.broadcast_to(
        jnp.asarray((_IV & np.uint64(0xFFFFFFFF)).astype(np.uint32)), shape + (8,))
    h_hi = jnp.broadcast_to(
        jnp.asarray((_IV >> np.uint64(32)).astype(np.uint32)), shape + (8,))
    # parameter block: digest_length=32, fanout=1, depth=1
    param = jnp.zeros(shape + (8,), jnp.uint32).at[..., 0].set(jnp.uint32(0x01010020))
    h_lo = h_lo ^ param

    # number of chunks: max(1, ceil(length / 128))
    n_chunks = jnp.maximum((length + jnp.uint32(127)) // jnp.uint32(128), jnp.uint32(1))

    def chunk_body(carry, xs):
        h_lo, h_hi = carry
        i, mc_lo, mc_hi = xs
        is_active = i < n_chunks
        is_last = i == n_chunks - jnp.uint32(1)
        # t = bytes processed through this block; for the last block, = length
        t_full = (i + jnp.uint32(1)) * jnp.uint32(CHUNK_BYTES)
        t_lo = jnp.where(is_last, length, jnp.broadcast_to(t_full, length.shape))
        t = (t_lo, jnp.zeros_like(t_lo))  # < 2^32 bytes (280*128 << 2^32)
        new_lo, new_hi = compress(h_lo, h_hi, mc_lo, mc_hi, t,
                                  is_last.astype(jnp.uint32))
        keep = is_active[..., None]
        return (jnp.where(keep, new_lo, h_lo), jnp.where(keep, new_hi, h_hi)), None

    xs = (jnp.arange(max_chunks, dtype=jnp.uint32),
          jnp.moveaxis(m_lo, -2, 0), jnp.moveaxis(m_hi, -2, 0))
    (h_lo, h_hi), _ = jax.lax.scan(chunk_body, (h_lo, h_hi), xs)

    return h_lo[..., :4], h_hi[..., :4]


# ---------------------------------------------------------------------------
# Host-side packing helpers
# ---------------------------------------------------------------------------

def pack_message(msg: bytes, max_chunks: int) -> Tuple[np.ndarray, np.ndarray, int]:
    """bytes -> zero-padded (max_chunks, 16) LE u64 planes + length."""
    assert len(msg) <= max_chunks * CHUNK_BYTES
    buf = msg + b"\x00" * (max_chunks * CHUNK_BYTES - len(msg))
    words = np.frombuffer(buf, dtype="<u8").reshape(max_chunks, 16)
    return ((words & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (words >> np.uint64(32)).astype(np.uint32),
            len(msg))


def digest_to_bytes(d_lo: np.ndarray, d_hi: np.ndarray) -> bytes:
    """(4,) planes -> 32-byte digest (little-endian words)."""
    out = b""
    for i in range(4):
        out += int(d_lo[i]).to_bytes(4, "little")
        out += int(d_hi[i]).to_bytes(4, "little")
    return out


def blake2b256_bytes(messages, max_chunks: int) -> list:
    """Convenience: list of byte strings -> list of 32-byte digests."""
    packed = [pack_message(m, max_chunks) for m in messages]
    m_lo = jnp.asarray(np.stack([p[0] for p in packed]))
    m_hi = jnp.asarray(np.stack([p[1] for p in packed]))
    lengths = jnp.asarray(np.array([p[2] for p in packed], dtype=np.uint32))
    d_lo, d_hi = blake2b256_variable(m_lo, m_hi, lengths)
    d_lo = np.asarray(d_lo)
    d_hi = np.asarray(d_hi)
    return [digest_to_bytes(d_lo[i], d_hi[i]) for i in range(len(messages))]
