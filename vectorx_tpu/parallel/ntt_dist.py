"""Multi-chip NTT — four-step butterfly partition with all_to_all.

SURVEY.md §2.3.3: a single transform too large for one chip splits its
butterfly stages across the mesh. The four-step decomposition (ntt_mxu.py)
makes the communication pattern exact and minimal:

    view x as (n1, n2), shard the n2 (column) axis over the mesh
    stage 1: per-device column DFTs  — (n1 × n1) @ (n1, n2/D), LOCAL MXU
    twiddle: elementwise w^(k1·j)    — LOCAL (table sharded the same way)
    transpose: (n1, n2) → (n2, n1)   — ONE all_to_all over ICI
    stage 2: per-device column DFTs  — (n2 × n2) @ (n2, n1/D), LOCAL MXU

All FLOPs stay on the MXU; the single collective moves each element once
(the theoretical minimum for a distributed transpose). Input: the (n1, n2)
matrix view sharded P(None, axis); output: the transposed (n2, n1) result
sharded P(None, axis) — flat order k2·n1 + k1, matching ntt_mxu's output
layout.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as Pspec

from ..field import goldilocks as gl
from ..poly import ntt_mxu as nm

P = gl.MODULUS


def _as_matrix(x: gl.Fp):
    n = x[0].shape[-1]
    n1, n2 = nm._split(n)
    return (x[0].reshape(n1, n2), x[1].reshape(n1, n2)), n1, n2


def ntt_sharded(x: gl.Fp, mesh: Mesh, axis: str = "batch",
                inverse: bool = False) -> gl.Fp:
    """Distributed four-step NTT of one (n,) polynomial over `mesh`.

    Returns the flat (n,) result (== poly.ntt/ntt_mxu output), computed
    with the column axis sharded and ONE all_to_all at the transpose.
    """
    D = int(np.prod([mesh.shape[a] for a in mesh.axis_names if a == axis]))
    xm, n1, n2 = _as_matrix(x)
    n = n1 * n2
    log_n = n.bit_length() - 1
    assert n2 % D == 0 and n1 % D == 0, (n1, n2, D)
    root = gl.primitive_root_of_unity(log_n)
    if inverse:
        root = pow(root, P - 2, P)
    w1 = pow(root, n2, P)
    w2 = pow(root, n1, P)
    m1p, m1r = nm._dft_block_planes(n1, w1)
    m2p, m2r = nm._dft_block_planes(n2, w2)
    tw = nm._twiddle_table(n1, n2, root)

    col = NamedSharding(mesh, Pspec(None, axis))

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(Pspec(None, axis), Pspec(None, axis)),
             out_specs=Pspec(None, axis))
    def step(xm_loc, tw_loc):
        # stage 1: column DFTs on the local panel (n1, n2/D)
        y = nm._matmul_mod(jnp.asarray(m1p), jnp.asarray(m1r), xm_loc)
        y = gl.mul(y, (jnp.broadcast_to(tw_loc[0], y[0].shape),
                       jnp.broadcast_to(tw_loc[1], y[0].shape)))

        # distributed transpose: (n1, n2)@cols -> (n2, n1)@cols
        def transpose(c):
            r = n1 // D
            a = c.reshape(D, r, c.shape[-1])          # split row blocks
            a = jax.lax.all_to_all(a, axis, 0, 0)     # (D, r, n2/D)
            a = jnp.moveaxis(a, 0, 1).reshape(r, n2)  # rows e·r..(e+1)r
            return a.T                                # (n2, r)

        yt = (transpose(y[0]), transpose(y[1]))

        # stage 2: column DFTs on the transposed panel (n2, n1/D)
        return nm._matmul_mod(jnp.asarray(m2p), jnp.asarray(m2r), yt)

    xm_s = jax.device_put(xm, col)
    tw_s = jax.device_put((jnp.asarray(tw[0]), jnp.asarray(tw[1])), col)
    zt = step(xm_s, tw_s)                              # (n2, n1) col-shard
    out = (zt[0].reshape(n), zt[1].reshape(n))
    if inverse:
        ninv = pow(n, P - 2, P)
        out = gl.mul_scalar(out, ninv)
    return out


def coset_lde_sharded(evals: gl.Fp, rate_bits: int, mesh: Mesh,
                      axis: str = "batch",
                      shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR) -> gl.Fp:
    """Distributed trace LDE: per-column coset blowup with every transform
    butterfly-partitioned across `mesh` (poly/ntt.coset_lde semantics).
    Plug into prover.prove via the ``lde_fn`` seam."""
    from ..poly import ntt as pntt
    n = evals[0].shape[-1]
    n_ext = n << rate_bits
    sp = pntt._shift_powers(n, shift % P)
    spj = (jnp.asarray(sp[0]), jnp.asarray(sp[1]))
    cols_lo, cols_hi = [], []
    for c in range(evals[0].shape[0]):
        coeffs = ntt_sharded((evals[0][c], evals[1][c]), mesh, axis,
                             inverse=True)
        scaled = gl.mul(coeffs, spj)
        padded = (jnp.pad(scaled[0], (0, n_ext - n)),
                  jnp.pad(scaled[1], (0, n_ext - n)))
        out = ntt_sharded(padded, mesh, axis)
        cols_lo.append(out[0])
        cols_hi.append(out[1])
    return jnp.stack(cols_lo), jnp.stack(cols_hi)
