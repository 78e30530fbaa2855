"""Radix-2 NTT / coset LDE over Goldilocks — the prover's dominant kernel.

Replaces the reference prover's CPU NTT (plonky2's rayon-parallel LDE; see
SURVEY.md §2.2) with a vectorized, statically-shaped butterfly network that
XLA maps onto TPU VPU lanes. The size-N transform is log2(N) stages; each
stage is one full-width modular mul + add/sub pass, expressed as reshapes so
the lane dimension stays dense. Batch axes lead; the transform axis is last.

Stage structure (decimation-in-time, bit-reversed input):
    view (..., N) as (..., N/m, m); halves u, v of width m/2;
    out = [u + w*v, u - w*v]  with per-stage twiddles w (host-precomputed).

Multi-chip scaling: the leading batch axis (trace columns / independent
polynomials) shards over the mesh with no communication; a single huge NTT
can additionally split butterfly stages across chips with all_to_all at the
transpose point (see parallel/; roadmap for the >2^24 regime).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl

P = gl.MODULUS


# ---------------------------------------------------------------------------
# Host-side precomputation
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _bit_reverse_perm(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


@lru_cache(maxsize=None)
def _stage_twiddles(log_n: int, inverse: bool) -> Tuple[Tuple[np.ndarray, np.ndarray], ...]:
    """Per-stage twiddle factors w_m^j, j in [0, m/2), as (lo, hi) uint32."""
    root = gl.primitive_root_of_unity(log_n)
    if inverse:
        root = pow(root, P - 2, P)
    out = []
    for s in range(1, log_n + 1):
        m = 1 << s
        w_m = pow(root, (1 << log_n) // m, P)
        tw = np.empty(m // 2, dtype=np.object_)
        acc = 1
        for j in range(m // 2):
            tw[j] = acc
            acc = (acc * w_m) % P
        out.append((
            (tw.astype(np.uint64) & 0xFFFFFFFF).astype(np.uint32),
            (tw.astype(np.uint64) >> np.uint64(32)).astype(np.uint32),
        ))
    return tuple(out)


@lru_cache(maxsize=None)
def _n_inv(log_n: int) -> int:
    return pow(1 << log_n, P - 2, P)


# ---------------------------------------------------------------------------
# Core transforms
# ---------------------------------------------------------------------------

from functools import partial


MXU_THRESHOLD_LOG_N = 12   # four-step matmul NTT wins above this
MXU_MAX_LOG_N = 18         # above this the (15·n1, 8·n1) int8 DFT block
                           # constant alone is >100 MB and the axon AOT
                           # compile helper falls over (observed at 2^20,
                           # the 300-auth ChainedSha256Air LDE); the
                           # butterfly compiles trivially and is
                           # HBM-bandwidth-bound anyway at these sizes


def _mxu_dispatch(log_n: int) -> bool:
    """Use the int8 four-step matmul path? Only on accelerators — there it
    rides the systolic array; on XLA:CPU the same einsum falls back to a
    generic int8 GEMM that is ~100x slower than the butterfly network
    (a 2^13+ prove on the CPU test mesh went from minutes to hours before
    this gate). VX_NTT_MXU=1/0 overrides."""
    import os
    env = os.environ.get("VX_NTT_MXU")
    if env is not None:
        return env == "1" and log_n >= MXU_THRESHOLD_LOG_N
    if not (MXU_THRESHOLD_LOG_N <= log_n <= MXU_MAX_LOG_N):
        return False
    return jax.default_backend() != "cpu"


def ntt(x: gl.Fp, inverse: bool = False) -> gl.Fp:
    """In-order forward (or inverse) NTT over the last axis. N must be 2^k.

    Dispatches to the MXU four-step path (ntt_mxu.py) for large sizes on
    accelerators and the VPU butterfly network otherwise.
    """
    n = x[0].shape[-1]
    if _mxu_dispatch(n.bit_length() - 1):
        from .ntt_mxu import ntt_mxu
        return ntt_mxu(x, inverse)
    return _ntt_butterfly(x, inverse)


@partial(jax.jit, static_argnames=("inverse",))
def _ntt_butterfly(x: gl.Fp, inverse: bool = False) -> gl.Fp:
    n = x[0].shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, f"NTT size must be a power of two, got {n}"
    if n == 1:
        return x

    perm = jnp.asarray(_bit_reverse_perm(log_n))
    lo = jnp.take(x[0], perm, axis=-1)
    hi = jnp.take(x[1], perm, axis=-1)

    tws = _stage_twiddles(log_n, inverse)
    lead = lo.shape[:-1]
    for s in range(1, log_n + 1):
        m = 1 << s
        half = m // 2
        tw_lo, tw_hi = tws[s - 1]
        w = (jnp.asarray(tw_lo), jnp.asarray(tw_hi))
        shape = lead + (n // m, m)
        lo = lo.reshape(shape)
        hi = hi.reshape(shape)
        u = (lo[..., :half], hi[..., :half])
        v = (lo[..., half:], hi[..., half:])
        t = gl.mul(v, (jnp.broadcast_to(w[0], u[0].shape),
                       jnp.broadcast_to(w[1], u[0].shape)))
        a = gl.add(u, t)
        b = gl.sub(u, t)
        lo = jnp.concatenate([a[0], b[0]], axis=-1).reshape(lead + (n,))
        hi = jnp.concatenate([a[1], b[1]], axis=-1).reshape(lead + (n,))

    if inverse:
        ninv = gl.full(lo.shape, _n_inv(log_n))
        lo, hi = gl.mul((lo, hi), ninv)
    return lo, hi


def intt(x: gl.Fp) -> gl.Fp:
    return ntt(x, inverse=True)


# ---------------------------------------------------------------------------
# Polynomial utilities
# ---------------------------------------------------------------------------

def coeffs_to_evals(coeffs: gl.Fp) -> gl.Fp:
    """Evaluate a coefficient vector on the size-N subgroup (natural order)."""
    return ntt(coeffs)


def evals_to_coeffs(evals: gl.Fp) -> gl.Fp:
    return intt(evals)


@lru_cache(maxsize=None)
def _shift_powers(n: int, shift: int) -> Tuple[np.ndarray, np.ndarray]:
    pw = np.empty(n, dtype=np.object_)
    acc = 1
    for i in range(n):
        pw[i] = acc
        acc = (acc * shift) % P
    return (
        (pw.astype(np.uint64) & 0xFFFFFFFF).astype(np.uint32),
        (pw.astype(np.uint64) >> np.uint64(32)).astype(np.uint32),
    )


import os as _os

#: column-batch bound for the blowup: NTT butterfly temps are several
#: (B, n_ext) u32 planes, so a 700-col 2^20-point LDE transiently holds
#: >8 GB without tiling — the round-4 recursion-leaf OOM. Tiles are
#: bit-exact (each column transforms independently).
LDE_TILE_CELLS = int(_os.environ.get("VX_LDE_TILE_CELLS", str(1 << 26)))


def _coset_lde_one(evals: gl.Fp, rate_bits: int, shift: int) -> gl.Fp:
    coeffs = intt(evals)
    n = coeffs[0].shape[-1]
    n_ext = n << rate_bits
    # scale coefficient i by shift^i, then zero-pad and forward NTT
    sp_lo, sp_hi = _shift_powers(n, shift % P)
    scaled = gl.mul(coeffs, (jnp.asarray(sp_lo), jnp.asarray(sp_hi)))
    pad = [(0, 0)] * (scaled[0].ndim - 1) + [(0, n_ext - n)]
    lo = jnp.pad(scaled[0], pad)
    hi = jnp.pad(scaled[1], pad)
    return ntt((lo, hi))


def coset_lde(evals: gl.Fp, rate_bits: int, shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR) -> gl.Fp:
    """Low-degree extend size-N subgroup evals onto the size-N*2^rate coset.

    evals (..., N) -> (..., N << rate_bits), evaluated at shift * H' where H'
    is the larger subgroup. This is the trace-commitment domain expansion
    (the blowup the reference prover performs inside ``circuit.prove``).
    2-D inputs whose blown-up size exceeds LDE_TILE_CELLS stream through
    column tiles (bounds the butterfly temps; bit-exact)."""
    if evals[0].ndim == 2:
        b = evals[0].shape[0]
        n_ext = evals[0].shape[-1] << rate_bits
        if b * n_ext > LDE_TILE_CELLS:
            tile = max(1, LDE_TILE_CELLS // n_ext)
            if _os.environ.get("VX_LDE_HOST_ACC") == "1":
                # accumulate tiles in HOST memory and upload once: the
                # device-side concatenate otherwise holds tile list +
                # result simultaneously (2x the full LDE — the
                # recursion-leaf OOM). Costs one full round trip through
                # the tunnel; used by the big-machine proves only.
                import numpy as _np
                out_lo = _np.empty((b, n_ext), _np.uint32)
                out_hi = _np.empty((b, n_ext), _np.uint32)
                for i in range(0, b, tile):
                    o = _coset_lde_one((evals[0][i:i + tile],
                                        evals[1][i:i + tile]),
                                       rate_bits, shift)
                    out_lo[i:i + tile] = _np.asarray(o[0])
                    out_hi[i:i + tile] = _np.asarray(o[1])
                    del o
                return jnp.asarray(out_lo), jnp.asarray(out_hi)
            outs = [_coset_lde_one((evals[0][i:i + tile],
                                    evals[1][i:i + tile]),
                                   rate_bits, shift)
                    for i in range(0, b, tile)]
            return (jnp.concatenate([o[0] for o in outs]),
                    jnp.concatenate([o[1] for o in outs]))
    return _coset_lde_one(evals, rate_bits, shift)


def coset_intt(evals: gl.Fp, shift: int) -> gl.Fp:
    """Coefficients of the poly whose evals on shift*H are given. (..., N)."""
    coeffs = intt(evals)
    n = coeffs[0].shape[-1]
    sp_lo, sp_hi = _shift_powers(n, pow(shift % P, P - 2, P))
    return gl.mul(coeffs, (jnp.asarray(sp_lo), jnp.asarray(sp_hi)))


def coeffs_to_coset_evals(coeffs: gl.Fp, rate_bits: int,
                          shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR) -> gl.Fp:
    """(..., N) coefficients -> evals on the blown-up coset shift*H_{N<<rate}."""
    n = coeffs[0].shape[-1]
    n_ext = n << rate_bits
    sp_lo, sp_hi = _shift_powers(n, shift % P)
    scaled = gl.mul(coeffs, (jnp.asarray(sp_lo), jnp.asarray(sp_hi)))
    pad = [(0, 0)] * (scaled[0].ndim - 1) + [(0, n_ext - n)]
    return ntt((jnp.pad(scaled[0], pad), jnp.pad(scaled[1], pad)))


def eval_poly_at(coeffs: gl.Fp, point: gl.Fp) -> gl.Fp:
    """Horner evaluation of (..., N) coefficient vectors at a point (scalar Fp)."""
    n = coeffs[0].shape[-1]
    acc = (coeffs[0][..., n - 1], coeffs[1][..., n - 1])
    for i in range(n - 2, -1, -1):
        acc = gl.add(gl.mul(acc, point), (coeffs[0][..., i], coeffs[1][..., i]))
    return acc
