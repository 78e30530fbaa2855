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
- MDS matrix: 12x12 circulant with POWER-OF-TWO entries (MDS_ROW) — the
  MDS layer becomes shift-accumulate instead of 144 full 64x64 modmuls
  per state per round (the permutation's dominant VPU cost). The MDS
  property is verified EXHAUSTIVELY for this field: all 2,704,155 square
  submatrices are nonsingular mod p (scripts/verify_mds.py; the suite
  re-checks all minors up to 3x3)
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


#: circulant MDS row — every entry a POWER OF TWO, so the MDS layer is
#: shift-accumulate instead of 144 full 64x64 modmuls (the permutation's
#: dominant VPU cost; the previous Cauchy matrix had full-size entries).
#: This row is the widely-reviewed width-12 circulant parameter set used
#: by plonky2-family Goldilocks Poseidon instances (a public parameter,
#: like SHA round constants). MDS property INDEPENDENTLY verified for
#: this field: scripts/verify_mds.py exhaustively checks all 2,704,155
#: square submatrices are nonsingular mod p (full run ≈ 8 min; the test
#: suite re-verifies all minors up to 4x4).
MDS_ROW = (1, 1, 2, 1, 8, 32, 2, 256, 4096, 8, 65536, 1024)


@lru_cache(maxsize=None)
def mds_matrix() -> Tuple[Tuple[int, ...], ...]:
    """12x12 circulant MDS matrix M[i][j] = MDS_ROW[(j - i) mod 12]."""
    return tuple(
        tuple(MDS_ROW[(j - i) % WIDTH] for j in range(WIDTH))
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


def _mat_inv_mod(A: Sequence[Sequence[int]]) -> List[List[int]]:
    """Exact inverse of a square matrix mod p (Gauss-Jordan)."""
    n = len(A)
    M = [[A[i][j] % P for j in range(n)] + [1 if j == i else 0 for j in range(n)]
         for i in range(n)]
    for col in range(n):
        piv = next(r for r in range(col, n) if M[r][col] % P != 0)
        M[col], M[piv] = M[piv], M[col]
        inv = pow(M[col][col], P - 2, P)
        M[col] = [(x * inv) % P for x in M[col]]
        for r in range(n):
            if r != col and M[r][col]:
                f = M[r][col]
                M[r] = [(M[r][j] - f * M[col][j]) % P for j in range(2 * n)]
    return [row[n:] for row in M]


@lru_cache(maxsize=None)
def fast_partial_ints():
    """Poseidon-paper Appendix-B sparse factorization of the partial rounds.

    The 22 partial rounds  s -> M @ sbox0(s + rc_r)  are rewritten as

        for i in 0..21:  s -> S_i @ sbox0(s + a_i*e0)
        s -> D @ s + L

    with each S_i SPARSE ([[m00_i, v_i^T], [w_hat_i, I]]) and ONE dense
    matrix D = [[1, 0], [0, Mh_0 Mh_1 ... Mh_21]] at the end — derived by
    the factorization M = M' M'' (M' = diag(1, Mh), M'' sparse) and the
    commutation sbox0 ∘ M' = M' ∘ sbox0 (M' preserves lane 0); the
    lanes-1..11 round constants fold forward into a_i and the leftover L.
    Exactness is asserted against permute_ints (test_poseidon.py).

    Returns (a, rows, whats, D, L):
      a[i]      lane-0 pre-sbox constant, round i
      rows[i]   length-12: [m00_i, v_i(11)]   (out0 = <rows[i], state'>)
      whats[i]  length-12: [0,     w_hat_i(11)] (out_j = whats[i][j]*s0' + s_j)
      D         12x12 dense matrix ([[1,0],[0,Dh]])
      L         length-12 leftover constant vector
    """
    t, n_p, hf = WIDTH, PARTIAL_ROUNDS, FULL_ROUNDS // 2
    M = [list(r) for r in mds_matrix()]
    rc = round_constants()

    # ---- constant folding: full-width rc -> lane-0 a_i + leftover L ----
    c = list(rc[hf])
    a: List[int] = []
    L: List[int] = []
    for i in range(n_p):
        a.append(c[0])
        tail = [sum(M[r][j] * c[j] for j in range(1, t)) % P for r in range(t)]
        if i < n_p - 1:
            c = [(tail[k] + rc[hf + i + 1][k]) % P for k in range(t)]
        else:
            L = tail

    # ---- sparse factorization ----
    def matmul(A, B):
        n = len(A)
        return [[sum(A[i][k] * B[k][j] for k in range(n)) % P
                 for j in range(n)] for i in range(n)]

    Mi = [row[:] for row in M]
    rows: List[List[int]] = []
    whats: List[List[int]] = []
    Dh = [[1 if i == j else 0 for j in range(t - 1)] for i in range(t - 1)]
    for i in range(n_p):
        m00 = Mi[0][0]
        v = [Mi[0][j] for j in range(1, t)]
        w = [Mi[r][0] for r in range(1, t)]
        Mh = [[Mi[r][j] for j in range(1, t)] for r in range(1, t)]
        w_hat = [sum(r_ * w_ for r_, w_ in zip(row, w)) % P
                 for row in _mat_inv_mod(Mh)]
        rows.append([m00] + v)
        whats.append([0] + w_hat)
        Dh = matmul(Dh, Mh)
        # M_{i+1} = S_i @ M_i'
        S = [[m00] + v] + [[w_hat[r]] + [1 if j == r else 0
                                         for j in range(t - 1)]
                           for r in range(t - 1)]
        Mp = [[1] + [0] * (t - 1)] + [[0] + Mh[r] for r in range(t - 1)]
        Mi = matmul(S, Mp)
    D = [[1] + [0] * (t - 1)] + [[0] + Dh[r] for r in range(t - 1)]
    return (tuple(a), tuple(map(tuple, rows)), tuple(map(tuple, whats)),
            tuple(map(tuple, D)), tuple(L))


@lru_cache(maxsize=None)
def _np_fast_partial():
    """fast_partial_ints + the L-folded rc table as uint32 lo/hi planes."""
    a, rows, whats, D, L = fast_partial_ints()

    def planes(x):
        arr = np.array(x, dtype=np.object_)
        return ((arr & 0xFFFFFFFF).astype(np.uint32),
                (arr >> 32).astype(np.uint32))

    hf = FULL_ROUNDS // 2
    rc = np.array(round_constants(), dtype=np.object_)
    rc_mod = rc.copy()
    rc_mod[hf + PARTIAL_ROUNDS] = [
        (int(x) + l) % P for x, l in zip(rc[hf + PARTIAL_ROUNDS], L)]
    # pack a_i into slot 0 of the w_hat table (lane 0 of the col scatter
    # is overwritten by the row dot, so that slot is free)
    col = [(a[i],) + whats[i][1:] for i in range(PARTIAL_ROUNDS)]
    return planes(rows), planes(col), planes(D), planes(rc_mod)


def permute_ints_fast(state: Sequence[int]) -> List[int]:
    """permute_ints via the fast-partial factorization (exact oracle for
    the Pallas kernel's round structure; asserted == permute_ints)."""
    assert len(state) == WIDTH
    s = [x % P for x in state]
    rc = round_constants()
    m = mds_matrix()
    a, rows, whats, D, L = fast_partial_ints()

    def full_round(s, r):
        s = [(x + c) % P for x, c in zip(s, rc[r])]
        s = [pow(x, ALPHA, P) for x in s]
        return [sum(m[i][j] * s[j] for j in range(WIDTH)) % P
                for i in range(WIDTH)]

    hf = FULL_ROUNDS // 2
    for r in range(hf):
        s = full_round(s, r)
    for i in range(PARTIAL_ROUNDS):
        s0 = pow((s[0] + a[i]) % P, ALPHA, P)
        out0 = (rows[i][0] * s0
                + sum(rows[i][j] * s[j] for j in range(1, WIDTH))) % P
        s = [out0] + [(whats[i][j] * s0 + s[j]) % P for j in range(1, WIDTH)]
    s = [sum(D[i][j] * s[j] for j in range(WIDTH)) % P for i in range(WIDTH)]
    s = [(x + l) % P for x, l in zip(s, L)]
    for r in range(hf + PARTIAL_ROUNDS, N_ROUNDS):
        s = full_round(s, r)
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


@lru_cache(maxsize=None)
def _mds_shift_tables():
    """(K, K2) uint32 (12, 12): shift amounts log2(M[i][j]) and their
    32-complements (K2 clamped to 31 where K == 0 — masked out anyway)."""
    m = mds_matrix()
    k = np.zeros((WIDTH, WIDTH), dtype=np.uint32)
    for i in range(WIDTH):
        for j in range(WIDTH):
            e = m[i][j]
            assert e & (e - 1) == 0, "MDS entries must be powers of two"
            k[i, j] = e.bit_length() - 1
    k2 = np.where(k == 0, 31, 32 - k).astype(np.uint32)
    return k, k2


def _mds(state: gl.Fp) -> gl.Fp:
    """out[..., i] = Σ_j 2^{K[i,j]} · s[..., j] — SHIFT-accumulate.

    Every MDS entry is a power of two (MDS_ROW), so each term is two
    shifts instead of a 64x64 modmul; the j-sum runs in 16-bit carry-save
    columns with ONE 128-bit reduction per output element. This replaces
    144 gl.mul calls (~90 VPU ops each) per state per round — the
    permutation's dominant cost — with ~16 ops per term."""
    kt, k2t = _mds_shift_tables()
    K = jnp.asarray(kt)
    K2 = jnp.asarray(k2t)
    zmask = jnp.asarray((kt == 0))
    lo = state[0][..., None, :]                  # (..., 1, 12)
    hi = state[1][..., None, :]
    z = jnp.uint32(0)
    # s·2^K limbs: A @2^0 | B, C @2^32 | D @2^64   (each < 2^32)
    A = lo << K
    B = jnp.where(zmask, z, lo >> K2)
    C = hi << K
    D = jnp.where(zmask, z, hi >> K2)

    m16 = jnp.uint32(0xFFFF)

    def _s16(x, shift):
        part = (x >> jnp.uint32(16)) if shift else (x & m16)
        return jnp.sum(part.astype(jnp.int32), axis=-1).astype(jnp.uint32)

    c0 = _s16(A, 0)
    c1 = _s16(A, 1)
    c2 = _s16(B, 0) + _s16(C, 0)
    c3 = _s16(B, 1) + _s16(C, 1)
    c4 = _s16(D, 0)
    c5 = _s16(D, 1)
    # combine Σ c_t 2^{16t} (c_t < 2^21) into four u32 limbs, then reduce
    u16 = jnp.uint32(16)
    lo_ = c0 + (c1 << u16)
    cy0 = (lo_ < c0).astype(jnp.uint32)
    hi_a = (c1 >> u16) + c2 + cy0
    hi_ = hi_a + (c3 << u16)
    cy1 = (hi_ < hi_a).astype(jnp.uint32)
    n2_a = (c3 >> u16) + c4 + cy1
    n2 = n2_a + (c5 << u16)
    cy2 = (n2 < n2_a).astype(jnp.uint32)
    n3 = (c5 >> u16) + cy2
    return gl.reduce128(lo_, hi_, n2, n3)


#: batch threshold for routing whole permutations into the fused-VMEM
#: Pallas kernel (ops/poseidon_pallas): below this the pad/transpose
#: overhead beats the win. The XLA path is HBM-bound on per-round temps;
#: the kernel keeps all 30 rounds resident in VMEM (~1.7x measured).
PALLAS_MIN_BATCH = 4096


def _pallas_dispatch(batch: int) -> bool:
    """VX_POSEIDON_PALLAS=1/0 overrides; CPU always uses the XLA path."""
    import os
    env = os.environ.get("VX_POSEIDON_PALLAS")
    if env is not None:
        return env == "1"
    return batch >= PALLAS_MIN_BATCH and jax.default_backend() != "cpu"


def _permute_rounds(state: gl.Fp, mds_fn) -> gl.Fp:
    """The 30 rounds under lax.scan (3 small round bodies instead of a
    30x unrolled graph — keeps trace/compile time flat as call sites
    multiply), with the MDS layer pluggable."""
    rc_lo, rc_hi, _, _ = _device_constants()
    half_f = FULL_ROUNDS // 2

    def bcast_rc(rc, s):
        return (jnp.broadcast_to(rc[0], s[0].shape),
                jnp.broadcast_to(rc[1], s[0].shape))

    def full_round(s, rc):
        s = gl.add(s, bcast_rc(rc, s))
        s = _sbox(s)
        return mds_fn(s), None

    def partial_round(s, rc):
        s = gl.add(s, bcast_rc(rc, s))
        first = _sbox((s[0][..., 0], s[1][..., 0]))
        s = (s[0].at[..., 0].set(first[0]), s[1].at[..., 0].set(first[1]))
        return mds_fn(s), None

    r0 = (rc_lo[:half_f], rc_hi[:half_f])
    r1 = (rc_lo[half_f:half_f + PARTIAL_ROUNDS],
          rc_hi[half_f:half_f + PARTIAL_ROUNDS])
    r2 = (rc_lo[half_f + PARTIAL_ROUNDS:], rc_hi[half_f + PARTIAL_ROUNDS:])

    state, _ = jax.lax.scan(full_round, state, r0)
    state, _ = jax.lax.scan(partial_round, state, r1)
    state, _ = jax.lax.scan(full_round, state, r2)
    return state


@jax.jit
def permute(state: gl.Fp) -> gl.Fp:
    """Poseidon permutation on (..., 12) states (bit-exact on all paths)."""
    lead = state[0].shape[:-1]
    batch = 1
    for d in lead:
        batch *= d
    if _pallas_dispatch(batch):
        from ..ops import poseidon_pallas as pp
        return pp.permute(state)
    return _permute_rounds(state, _mds)


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
