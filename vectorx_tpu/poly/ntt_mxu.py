"""Four-step NTT with MXU int8 limb-plane matmuls — the speed-of-light path.

The radix-2 butterfly NTT (ntt.py) is VPU-bound: log2(N) full-array passes.
The four-step decomposition N = N1*N2 turns the transform into two batched
SMALL transforms that are dense matrix products plus a twiddle pass:

    x(n1, n2) --DFT_N1 over n1--> * tw(k1, n2) --DFT_N2--> X(k1, k2)

and an (N1 x N1) modular matmul maps onto the TPU's systolic array: each
Goldilocks element splits into eight 8-bit limb planes; int8 x int8 -> int32
MXU products accumulate exactly (<= 2048 * 255^2 * 8 < 2^31); the 15
base-256 result planes carry-normalize into five 32-bit words; the < 2^160
value folds mod p via 2^64 = 2^32 - 1, 2^96 = -1, 2^128 = -2^32.

int8 is signed, so limbs are stored CENTERED (l - 128) with rank-1
corrections (matrix-plane row sums, input-plane column sums, and a
constant) restoring the unsigned products.

This is the MXU replacement for the reference prover's dominant kernel
(plonky2's rayon NTT/LDE, SURVEY.md §2.2); the butterfly path remains the
fallback for small sizes.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl

P = gl.MODULUS
MIN_LOG_N = 8      # below this the butterfly path wins


# ---------------------------------------------------------------------------
# Host-side precomputation
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _dft_block_planes(n: int, w_root: int):
    """DFT matrix as ONE block int8 matrix accumulating limb pairs.

    BM[(s, i), (m, j)] = limb_{s-m}(M[i, j]) for 0 <= s-m < 8, else 0,
    stored centered (-128). A single (15n x 8n) @ (8n x K) int8 matmul
    then yields all 15 base-256 result planes with the limb-pair
    accumulation done INSIDE the contraction (no (l, m) intermediates
    touching HBM). Returns (block (15n, 8n) int8, rowsums (15, n) int32
    of the uncentered block rows).
    """
    row = np.empty(n, dtype=np.object_)
    acc = 1
    for j in range(n):
        row[j] = acc
        acc = acc * w_root % P
    M = np.empty((n, n), dtype=np.object_)
    M[0] = 1
    if n > 1:
        M[1] = row
    for i in range(2, n):
        M[i] = M[i - 1] * row % P
    return block_planes_from_matrix(M.astype(np.uint64))


def block_planes_from_matrix(M64: np.ndarray):
    """ANY (n, n) uint64 matrix mod p -> (centered int8 block (15n, 8n),
    rowsums (15, n) int32) for one-matmul modular products via
    _matmul_mod. Shared by the four-step NTT and the Poseidon MDS layer
    (hashes/poseidon._mds_mxu)."""
    n = M64.shape[0]
    planes = np.empty((8, n, n), dtype=np.uint8)
    for l in range(8):
        planes[l] = ((M64 >> np.uint64(8 * l)) & np.uint64(0xFF)).astype(
            np.uint8)
    block = np.zeros((15, n, 8, n), dtype=np.uint8)
    for s in range(15):
        for m in range(8):
            l = s - m
            if 0 <= l < 8:
                block[s, :, m, :] = planes[l]
    block = block.reshape(15 * n, 8 * n)
    rowsums = block.astype(np.int64).sum(axis=1).astype(np.int32)
    # NOTE: cached values must stay NUMPY — a cached jnp constant created
    # while tracing leaks its tracer into later traces (jit retraces on new
    # batch shapes). Callers jnp.asarray per trace.
    return ((block.astype(np.int16) - 128).astype(np.int8),
            rowsums.reshape(15, n))


@lru_cache(maxsize=None)
def _twiddle_table(n1: int, n2: int, root: int) -> gl.Fp:
    """tw[k1, n2] = root^(k1*n2) as Fp planes."""
    row = np.empty(n2, dtype=np.object_)
    acc = 1
    for j in range(n2):
        row[j] = acc
        acc = acc * root % P
    T = np.empty((n1, n2), dtype=np.object_)
    T[0] = 1
    for i in range(1, n1):
        T[i] = T[i - 1] * row % P
    T64 = T.astype(np.uint64)
    return ((T64 & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (T64 >> np.uint64(32)).astype(np.uint32))


# ---------------------------------------------------------------------------
# Modular matmul on the MXU: out[i, k] = sum_j M[i, j] * x[j, k]  (mod p)
# ---------------------------------------------------------------------------

def _to_planes_centered(x: gl.Fp):
    """(lo, hi) (..., J, K) -> centered int8 planes (..., 8*J, K) and the
    total uncentered limb sum (..., K) int32 (sum over all 8J rows)."""
    lo, hi = x
    ps = [((lo >> jnp.uint32(8 * m)) & jnp.uint32(0xFF)) for m in range(4)]
    ps += [((hi >> jnp.uint32(8 * m)) & jnp.uint32(0xFF)) for m in range(4)]
    planes_u = jnp.stack(ps, axis=-3)                  # (..., 8, J, K)
    total = planes_u.astype(jnp.int32).sum(axis=(-3, -2))    # (..., K)
    planes_c = (planes_u.astype(jnp.int16) - jnp.int16(128)).astype(jnp.int8)
    shape = planes_c.shape[:-3] + (planes_c.shape[-3] * planes_c.shape[-2],
                                   planes_c.shape[-1])
    return planes_c.reshape(shape), total


def _matmul_mod(m_block, m_rowsums, x: gl.Fp) -> gl.Fp:
    """out[i,k] = sum_j M[i,j] x[j,k] mod p via one int8 block matmul."""
    xp, xtot = _to_planes_centered(x)          # (..., 8J, K), (..., K)
    j8 = m_block.shape[-1]                     # 8 * J
    n1 = m_block.shape[0] // 15
    c128 = jnp.int32(128)
    const = jnp.int32(128 * 128 * j8)

    dot = jnp.einsum("ij,...jk->...ik", m_block, xp,
                     preferred_element_type=jnp.int32)   # (..., 15*n1, K)
    lead = dot.shape[:-2]
    dot = dot.reshape(lead + (15, n1, dot.shape[-1]))
    # true = dot' + 128 * xtot[k] + 128 * rowsum[s,i] - 128^2 * 8J
    corr = (c128 * xtot[..., None, None, :]
            + c128 * m_rowsums[:, :, None] - const)
    planes = dot + corr
    return _fold_planes([planes[..., s, :, :] for s in range(15)])


def _fold_planes(planes_acc) -> gl.Fp:
    """15 base-256 digit planes (int32, >= 0) -> Fp (lo, hi), reduced."""
    digits = []
    carry = jnp.zeros_like(planes_acc[0], dtype=jnp.uint32)
    for s in range(15):
        d = planes_acc[s].astype(jnp.uint32) + carry
        digits.append(d & jnp.uint32(0xFF))
        carry = d >> jnp.uint32(8)
    for _ in range(5):
        digits.append(carry & jnp.uint32(0xFF))
        carry = carry >> jnp.uint32(8)

    def word(i):
        w = digits[4 * i]
        for b in range(1, 4):
            w = w | (digits[4 * i + b] << jnp.uint32(8 * b))
        return w

    w0, w1, w2, w3, w4 = (word(i) for i in range(5))
    z = jnp.zeros_like(w0)
    # value = w0 + w1 2^32 + w2 2^64 + w3 2^96 + w4 2^128
    #       = (w0 + w1 2^32) + w2 (2^32 - 1) - w3 - w4 2^32   (mod p)
    acc = (w0, w1)
    acc = gl.add(acc, gl.mul_scalar((w2, z), (1 << 32) - 1))
    acc = gl.sub(acc, (w3, z))
    acc = gl.sub(acc, gl.mul_scalar((w4, z), 1 << 32))
    return acc


# ---------------------------------------------------------------------------
# Public transforms
# ---------------------------------------------------------------------------

def _split(n: int) -> Tuple[int, int]:
    log_n = n.bit_length() - 1
    n1 = 1 << ((log_n + 1) // 2)
    return n1, n // n1


#: columns per sequential tile. The block matmul's s32 accumulator is
#: (batch, 15·n1, n2); untiled, an 800-col trace LDE at 2^16+ wants >12 GB
#: of HBM temp (observed OOM proving Ed25519VerifyAir, 3336 cols). lax.map
#: over column tiles bounds the temp at TILE×15×N ints with no FLOP change.
NTT_BATCH_TILE = 128
#: accumulator element budget: TILE adapts down for huge transforms so
#: TILE·15·N s32 stays ≈ 1 GB (a 2^20-point LDE at TILE=128 wanted an
#: 8 GB temp — the 300-authority ChainedSha256Air OOM).
NTT_TILE_BUDGET = 1 << 28


def _batch_tile(n: int) -> int:
    return max(1, min(NTT_BATCH_TILE, NTT_TILE_BUDGET // (15 * n)))


@partial(jax.jit, static_argnames=("inverse",))
def ntt_mxu(x: gl.Fp, inverse: bool = False) -> gl.Fp:
    """Four-step forward/inverse NTT over the last axis (N = 2^k, k >= 4).

    Batches wider than the (size-adaptive) tile stream through the MXU
    in tiles."""
    lead = x[0].shape[:-1]
    n = x[0].shape[-1]
    b = 1
    for d in lead:
        b *= d
    if b > _batch_tile(n):
        t = _batch_tile(n)
        nb = -(-b // t)
        pad = nb * t - b
        lo = jnp.pad(x[0].reshape(b, n), ((0, pad), (0, 0)))
        hi = jnp.pad(x[1].reshape(b, n), ((0, pad), (0, 0)))
        out = jax.lax.map(lambda c: _ntt_mxu_core(c, inverse),
                          (lo.reshape(nb, t, n), hi.reshape(nb, t, n)))
        return (out[0].reshape(nb * t, n)[:b].reshape(lead + (n,)),
                out[1].reshape(nb * t, n)[:b].reshape(lead + (n,)))
    return _ntt_mxu_core(x, inverse)


def _ntt_mxu_core(x: gl.Fp, inverse: bool = False) -> gl.Fp:
    n = x[0].shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n and log_n >= 4
    n1, n2 = _split(n)
    root = gl.primitive_root_of_unity(log_n)
    if inverse:
        root = pow(root, P - 2, P)
    w1 = pow(root, n2, P)          # order n1
    w2 = pow(root, n1, P)          # order n2

    lead = x[0].shape[:-1]
    xm = (x[0].reshape(lead + (n1, n2)), x[1].reshape(lead + (n1, n2)))

    m1p, m1r = _dft_block_planes(n1, w1)
    y = _matmul_mod(m1p, m1r, xm)                       # (..., k1, n2)

    tw = _twiddle_table(n1, n2, root)
    y = gl.mul(y, (jnp.broadcast_to(tw[0], y[0].shape),
                   jnp.broadcast_to(tw[1], y[0].shape)))

    yt = (jnp.swapaxes(y[0], -1, -2), jnp.swapaxes(y[1], -1, -2))
    m2p, m2r = _dft_block_planes(n2, w2)
    zt = _matmul_mod(m2p, m2r, yt)                      # (..., k2, k1)

    out = (zt[0].reshape(lead + (n,)), zt[1].reshape(lead + (n,)))
    if inverse:
        ninv = pow(n, P - 2, P)
        out = gl.mul_scalar(out, ninv)
    return out
