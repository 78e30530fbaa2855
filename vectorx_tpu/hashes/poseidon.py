"""Poseidon permutation over Goldilocks — the framework's algebraic hash.

Role: transcript (Fiat-Shamir) hashing and Merkle-cap commitments inside our
own STARK prover — the same role plonky2's Poseidon plays for the reference
prover (the ``AlgebraicHasher`` bound, /root/reference/circuits/
header_range.rs:28-29). The reference's *public* outputs never depend on
Poseidon (those are SHA-256/Blake2b, see circuits/commitments.py), so this
hash only needs to be self-consistent and cryptographically sound; we pick
our own nothing-up-my-sleeve constants rather than copying any upstream's.

Parameters (per the Poseidon paper's recommendations for t=12, α=7, |F|≈2^64,
128-bit security — the same regime the reference's prover dependency uses):

- width t = 12 (rate 8, capacity 4) — digests are 4 field elements (≈256 bits)
- S-box x^7 (gcd(7, p-1) = 1)
- 8 full rounds (4 + 4) and 22 partial rounds
- MDS matrix: 12x12 Cauchy matrix M[i][j] = 1/(x_i + y_j), x_i = i,
  y_j = 12 + j — Cauchy matrices are provably MDS
- round constants: SHA-256 counter stream over a domain tag, rejection-sampled
  below p

Layout: a batch of states is ``(lo, hi)`` uint32 arrays of shape (..., 12);
everything vmaps/jits/shards. The Pallas fused kernel lives in
ops/poseidon_pallas.py; this module is the portable reference path (still
fully vectorized and TPU-executable).
"""

from __future__ import annotations

import hashlib
from functools import lru_cache
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl

WIDTH = 12
RATE = 8
CAPACITY = 4
DIGEST_WIDTH = 4
FULL_ROUNDS = 8  # 4 before + 4 after the partial rounds
PARTIAL_ROUNDS = 22
N_ROUNDS = FULL_ROUNDS + PARTIAL_ROUNDS
ALPHA = 7

P = gl.MODULUS

_DOMAIN_TAG = b"vectorx_tpu/poseidon/goldilocks/t12a7/v1"


# ---------------------------------------------------------------------------
# Constant generation (host-side, exact)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def round_constants() -> Tuple[Tuple[int, ...], ...]:
    """(N_ROUNDS, WIDTH) round constants from a SHA-256 counter stream."""
    out: List[int] = []
    counter = 0
    while len(out) < N_ROUNDS * WIDTH:
        h = hashlib.sha256(_DOMAIN_TAG + counter.to_bytes(8, "little")).digest()
        counter += 1
        for off in range(0, 32, 8):
            v = int.from_bytes(h[off:off + 8], "little")
            if v < P:  # rejection sampling: uniform in [0, p)
                out.append(v)
            if len(out) == N_ROUNDS * WIDTH:
                break
    return tuple(
        tuple(out[r * WIDTH:(r + 1) * WIDTH]) for r in range(N_ROUNDS)
    )


@lru_cache(maxsize=None)
def mds_matrix() -> Tuple[Tuple[int, ...], ...]:
    """12x12 Cauchy MDS matrix M[i][j] = 1 / (i + (12 + j)) mod p."""
    return tuple(
        tuple(pow(i + 12 + j, P - 2, P) for j in range(WIDTH))
        for i in range(WIDTH)
    )


@lru_cache(maxsize=None)
def _np_constants():
    rc = np.array(round_constants(), dtype=np.object_)
    rc_lo = (rc & 0xFFFFFFFF).astype(np.uint32)
    rc_hi = (rc >> 32).astype(np.uint32)
    m = np.array(mds_matrix(), dtype=np.object_)
    m_lo = (m & 0xFFFFFFFF).astype(np.uint32)
    m_hi = (m >> 32).astype(np.uint32)
    return rc_lo, rc_hi, m_lo, m_hi


def _device_constants():
    # NB: never cache jnp arrays — a first call inside a jit trace would
    # cache tracers and leak them into later traces.
    rc_lo, rc_hi, m_lo, m_hi = _np_constants()
    return (jnp.asarray(rc_lo), jnp.asarray(rc_hi),
            jnp.asarray(m_lo), jnp.asarray(m_hi))


# ---------------------------------------------------------------------------
# Pure-Python oracle (exact ints) — used by tests and host-side transcripts
# ---------------------------------------------------------------------------

def permute_ints(state: Sequence[int]) -> List[int]:
    assert len(state) == WIDTH
    s = [x % P for x in state]
    rc = round_constants()
    m = mds_matrix()

    def full_round(s, r):
        s = [(x + c) % P for x, c in zip(s, rc[r])]
        s = [pow(x, ALPHA, P) for x in s]
        return [sum(m[i][j] * s[j] for j in range(WIDTH)) % P for i in range(WIDTH)]

    def partial_round(s, r):
        s = [(x + c) % P for x, c in zip(s, rc[r])]
        s[0] = pow(s[0], ALPHA, P)
        return [sum(m[i][j] * s[j] for j in range(WIDTH)) % P for i in range(WIDTH)]

    r = 0
    for _ in range(FULL_ROUNDS // 2):
        s = full_round(s, r); r += 1
    for _ in range(PARTIAL_ROUNDS):
        s = partial_round(s, r); r += 1
    for _ in range(FULL_ROUNDS // 2):
        s = full_round(s, r); r += 1
    return s


def hash_two_to_one_ints(left: Sequence[int], right: Sequence[int]) -> List[int]:
    state = list(left) + list(right) + [0] * CAPACITY
    return permute_ints(state)[:DIGEST_WIDTH]


def hash_ints(inputs: Sequence[int]) -> List[int]:
    """Sponge (overwrite mode), zero-padded to a RATE multiple, 4-elem digest.

    Note: zero-padding means callers must use fixed-length input domains
    (always true in the prover: trace shapes are static).
    """
    state = [0] * WIDTH
    inputs = [x % P for x in inputs]
    inputs = inputs + [0] * ((-len(inputs)) % RATE)
    for i in range(0, len(inputs), RATE):
        state[:RATE] = inputs[i:i + RATE]
        state = permute_ints(state)
    return state[:DIGEST_WIDTH]


# ---------------------------------------------------------------------------
# Vectorized JAX path — state is Fp of shape (..., 12)
# ---------------------------------------------------------------------------

def _sbox(x: gl.Fp) -> gl.Fp:
    x2 = gl.square(x)
    x3 = gl.mul(x2, x)
    x6 = gl.square(x3)
    return gl.mul(x6, x)


def _mds(state: gl.Fp) -> gl.Fp:
    _, _, m_lo, m_hi = _device_constants()
    # out[..., i] = sum_j M[i, j] * s[..., j]: one broadcast modular multiply
    # into (..., 12, 12) then a carry-save column sum (gl.sum_mod) — no
    # 11-deep modular-add chain.
    s_lo = state[0][..., None, :]  # (..., 1, 12)
    s_hi = state[1][..., None, :]
    prod = gl.mul((s_lo, s_hi), (m_lo, m_hi))  # (..., 12, 12)
    return gl.sum_mod(prod, axis=-1)


@jax.jit
def permute(state: gl.Fp) -> gl.Fp:
    """Poseidon permutation on (..., 12) states.

    Rounds run under lax.scan (3 small round bodies instead of a 30x
    unrolled graph) — keeps trace/compile time flat as call sites multiply.
    """
    rc_lo, rc_hi, _, _ = _device_constants()
    half_f = FULL_ROUNDS // 2

    def bcast_rc(rc, s):
        return (jnp.broadcast_to(rc[0], s[0].shape),
                jnp.broadcast_to(rc[1], s[0].shape))

    def full_round(s, rc):
        s = gl.add(s, bcast_rc(rc, s))
        s = _sbox(s)
        return _mds(s), None

    def partial_round(s, rc):
        s = gl.add(s, bcast_rc(rc, s))
        first = _sbox((s[0][..., 0], s[1][..., 0]))
        s = (s[0].at[..., 0].set(first[0]), s[1].at[..., 0].set(first[1]))
        return _mds(s), None

    r0 = (rc_lo[:half_f], rc_hi[:half_f])
    r1 = (rc_lo[half_f:half_f + PARTIAL_ROUNDS], rc_hi[half_f:half_f + PARTIAL_ROUNDS])
    r2 = (rc_lo[half_f + PARTIAL_ROUNDS:], rc_hi[half_f + PARTIAL_ROUNDS:])

    state, _ = jax.lax.scan(full_round, state, r0)
    state, _ = jax.lax.scan(partial_round, state, r1)
    state, _ = jax.lax.scan(full_round, state, r2)
    return state


@jax.jit
def hash_two_to_one(left: gl.Fp, right: gl.Fp) -> gl.Fp:
    """Merkle 2-to-1 compression: (...,4),(...,4) -> (...,4)."""
    lo = jnp.concatenate(
        [left[0], right[0], jnp.zeros(left[0].shape[:-1] + (CAPACITY,), jnp.uint32)],
        axis=-1)
    hi = jnp.concatenate(
        [left[1], right[1], jnp.zeros(left[1].shape[:-1] + (CAPACITY,), jnp.uint32)],
        axis=-1)
    out = permute((lo, hi))
    return out[0][..., :DIGEST_WIDTH], out[1][..., :DIGEST_WIDTH]


@jax.jit
def hash_many(inputs: gl.Fp) -> gl.Fp:
    """Sponge (overwrite mode) over the last axis: (..., n) -> (..., 4).

    n is static; padded to a multiple of RATE with zeros (matching the
    zero-extension the int oracle applies implicitly when n % RATE != 0).
    The absorb loop runs under lax.scan — ONE permute in the graph however
    wide the rows are (an unrolled loop made XLA:CPU compile time scale
    with trace width: ~0.5 s per absorbed chunk for Merkle leaf hashing of
    limb-heavy AIR traces)."""
    n = inputs[0].shape[-1]
    n_pad = (-n) % RATE
    lo = inputs[0]
    hi = inputs[1]
    if n_pad:
        pad = [(0, 0)] * (lo.ndim - 1) + [(0, n_pad)]
        lo = jnp.pad(lo, pad)
        hi = jnp.pad(hi, pad)
    nch = lo.shape[-1] // RATE
    lo_c = jnp.moveaxis(lo.reshape(lo.shape[:-1] + (nch, RATE)), -2, 0)
    hi_c = jnp.moveaxis(hi.reshape(hi.shape[:-1] + (nch, RATE)), -2, 0)
    state = gl.zeros(lo.shape[:-1] + (WIDTH,))

    def absorb(state, chunk):
        s_lo = jnp.concatenate([chunk[0], state[0][..., RATE:]], axis=-1)
        s_hi = jnp.concatenate([chunk[1], state[1][..., RATE:]], axis=-1)
        return permute((s_lo, s_hi)), None

    state, _ = jax.lax.scan(absorb, state, (lo_c, hi_c))
    return state[0][..., :DIGEST_WIDTH], state[1][..., :DIGEST_WIDTH]
