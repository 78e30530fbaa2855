"""Pallas TPU kernel for the Poseidon permutation.

The Merkle/transcript hot loop as ONE fused kernel: all 30 rounds stay in
VMEM (no HBM round trips between rounds, no XLA op-graph overhead), with
the *batch* axis on the 128-wide lanes — state layout is (12, TILE), i.e.
one Poseidon lane per sublane row, TILE independent permutations across
the vector lanes. uint32 16-bit-half multiplies target the VPU directly.

Dispatch: hashes/poseidon.permute routes here on TPU backends (and under
``VECTORX_PALLAS=1``); the lax.scan reference path remains the portable
fallback and the differential oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import goldilocks as gl
from ..hashes import poseidon as ps

TILE = 512  # permutations per grid step (lanes)


def _kernel(rc_lo_ref, rc_hi_ref, mds_lo_ref, mds_hi_ref,
            s_lo_ref, s_hi_ref, o_lo_ref, o_hi_ref):
    mds_lo = mds_lo_ref[:][:, :, None]    # (12, 12, 1)
    mds_hi = mds_hi_ref[:][:, :, None]

    half_f = ps.FULL_ROUNDS // 2
    n_rounds = ps.N_ROUNDS

    state = (s_lo_ref[:], s_hi_ref[:])    # (12, T)

    def sbox(x):
        x2 = gl.square(x)
        x3 = gl.mul(x2, x)
        return gl.mul(gl.square(x3), x)

    def mds(s):
        # out[i] = sum_j m[i, j] * s[j]
        prod = gl.mul((s[0][None, :, :], s[1][None, :, :]),
                      (mds_lo, mds_hi))   # (12, 12, T)
        return gl.sum_mod(prod, axis=1)

    def round_body(r, state):
        rc_lo = rc_lo_ref[pl.ds(r, 1), :]   # (1, 12) dynamic ref slice
        rc_hi = rc_hi_ref[pl.ds(r, 1), :]
        add_rc = gl.add(state, (rc_lo.reshape(12, 1), rc_hi.reshape(12, 1)))
        sboxed = sbox(add_rc)
        is_full = jnp.logical_or(r < half_f, r >= n_rounds - half_f)
        row0 = jax.lax.broadcasted_iota(jnp.int32, add_rc[0].shape, 0) == 0
        keep = jnp.logical_or(is_full, row0)
        mixed = (jnp.where(keep, sboxed[0], add_rc[0]),
                 jnp.where(keep, sboxed[1], add_rc[1]))
        return mds(mixed)

    state = jax.lax.fori_loop(0, n_rounds, round_body, state)
    o_lo_ref[:] = state[0]
    o_hi_ref[:] = state[1]


@functools.partial(jax.jit, static_argnames=("interpret",))
def permute_tiles(s_lo: jax.Array, s_hi: jax.Array, interpret: bool = False):
    """(12, B) planes with B a multiple of TILE -> permuted planes."""
    b = s_lo.shape[1]
    grid = (b // TILE,)
    spec = pl.BlockSpec((12, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    cspec = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    rc_lo, rc_hi, mds_lo, mds_hi = ps._np_constants()
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[cspec((ps.N_ROUNDS, 12)), cspec((ps.N_ROUNDS, 12)),
                  cspec((12, 12)), cspec((12, 12)), spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct(s_lo.shape, jnp.uint32),
                   jax.ShapeDtypeStruct(s_hi.shape, jnp.uint32)],
        interpret=interpret,
    )(jnp.asarray(rc_lo), jnp.asarray(rc_hi), jnp.asarray(mds_lo),
      jnp.asarray(mds_hi), s_lo, s_hi)


def permute(state: gl.Fp, interpret: bool = False) -> gl.Fp:
    """Drop-in for hashes.poseidon.permute: (..., 12) -> (..., 12)."""
    lo, hi = state
    lead = lo.shape[:-1]
    n = int(np.prod(lead)) if lead else 1
    pad = (-n) % TILE
    lo2 = lo.reshape(n, 12).T
    hi2 = hi.reshape(n, 12).T
    if pad:
        lo2 = jnp.pad(lo2, ((0, 0), (0, pad)))
        hi2 = jnp.pad(hi2, ((0, 0), (0, pad)))
    o_lo, o_hi = permute_tiles(lo2, hi2, interpret=interpret)
    o_lo = o_lo[:, :n].T.reshape(lead + (12,))
    o_hi = o_hi[:, :n].T.reshape(lead + (12,))
    return o_lo, o_hi
