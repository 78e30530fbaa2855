"""Multi-chip NTT — four-step butterfly partition with all_to_all.

SURVEY.md §2.3.3: a single transform too large for one chip splits its
butterfly stages across the mesh. The four-step decomposition (ntt_mxu.py)
makes the communication pattern exact and minimal:

    view x as (B, n1, n2), shard the n2 (column) axis over the mesh
    stage 1: per-device column DFTs  — (n1 × n1) @ (B, n1, n2/D), LOCAL MXU
    twiddle: elementwise w^(k1·j)    — LOCAL (table sharded the same way)
    transpose: (n1, n2) → (n2, n1)   — ONE all_to_all over ICI
    stage 2: per-device column DFTs  — (n2 × n2) @ (B, n2, n1/D), LOCAL MXU

All FLOPs stay on the MXU; the single collective moves each element once
(the theoretical minimum for a distributed transpose). The B axis batches
independent polynomials (trace columns) through the SAME collective — one
LDE of an 800-column trace is exactly two sharded transforms, not 1,600.

Compile caching: `shard_map` closures are built ONCE per
(mesh, axis, n1, n2, inverse) and stored in `_STEP_CACHE`; jax.jit then
caches executables per batch shape. (Round 2 built a fresh closure per
call — 97 s of XLA:CPU recompile per transform, which timed out the
driver's multichip dryrun. Do not regress this.)
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

# (mesh_key, axis, n1, n2, inverse) -> (jitted step, sharded twiddle planes)
_STEP_CACHE: dict = {}


def _mesh_key(mesh: Mesh, axis: str):
    return (tuple(d.id for d in mesh.devices.flat), mesh.axis_names,
            tuple(mesh.shape.items()), axis)


def _build_step(mesh: Mesh, axis: str, n1: int, n2: int, inverse: bool):
    """Compile-cached batched four-step NTT step over `mesh`.

    Returns (step, tw_sharded): step takes ((B, n1, n2) lo/hi planes,
    tw planes) and returns (B, n2, n1) planes of the transposed result —
    flat order k2·n1 + k1 per batch element, matching ntt_mxu's layout.
    """
    key = (_mesh_key(mesh, axis), n1, n2, inverse)
    hit = _STEP_CACHE.get(key)
    if hit is not None:
        return hit

    D = mesh.shape[axis]
    assert n2 % D == 0 and n1 % D == 0, (n1, n2, D)
    n = n1 * n2
    log_n = n.bit_length() - 1
    root = gl.primitive_root_of_unity(log_n)
    if inverse:
        root = pow(root, P - 2, P)
    w1 = pow(root, n2, P)
    w2 = pow(root, n1, P)
    m1p, m1r = nm._dft_block_planes(n1, w1)
    m2p, m2r = nm._dft_block_planes(n2, w2)
    tw = nm._twiddle_table(n1, n2, root)

    col3 = NamedSharding(mesh, Pspec(None, None, axis))
    col2 = NamedSharding(mesh, Pspec(None, axis))
    tw_s = jax.device_put((jnp.asarray(tw[0]), jnp.asarray(tw[1])), col2)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(Pspec(None, None, axis), Pspec(None, axis)),
             out_specs=Pspec(None, None, axis))
    def _shard_step(xm_loc, tw_loc):
        # stage 1: column DFTs on the local panel (B, n1, n2/D)
        y = nm._matmul_mod(jnp.asarray(m1p), jnp.asarray(m1r), xm_loc)
        y = gl.mul(y, (jnp.broadcast_to(tw_loc[0], y[0].shape),
                       jnp.broadcast_to(tw_loc[1], y[0].shape)))

        # distributed transpose: (B, n1, n2)@cols -> (B, n2, n1)@cols
        def transpose(c):
            b = c.shape[0]
            r = n1 // D
            a = c.reshape(b, D, r, c.shape[-1])       # split row blocks
            a = jax.lax.all_to_all(a, axis, 1, 1)     # (B, D, r, n2/D)
            a = jnp.moveaxis(a, 1, 2).reshape(b, r, n2)
            return jnp.swapaxes(a, -1, -2)            # (B, n2, r)

        yt = (transpose(y[0]), transpose(y[1]))

        # stage 2: column DFTs on the transposed panel (B, n2, n1/D)
        return nm._matmul_mod(jnp.asarray(m2p), jnp.asarray(m2r), yt)

    step = jax.jit(_shard_step, in_shardings=(col3, col2),
                   out_shardings=col3)
    _STEP_CACHE[key] = (step, tw_s)
    return step, tw_s


def _run(x_flat: gl.Fp, mesh: Mesh, axis: str, inverse: bool) -> gl.Fp:
    """(B, n) planes -> (B, n) transformed planes (natural order)."""
    b, n = x_flat[0].shape
    n1, n2 = nm._split(n)
    step, tw_s = _build_step(mesh, axis, n1, n2, inverse)
    col3 = NamedSharding(mesh, Pspec(None, None, axis))
    xm = jax.device_put((x_flat[0].reshape(b, n1, n2),
                         x_flat[1].reshape(b, n1, n2)), col3)
    zt = step(xm, tw_s)                               # (B, n2, n1) col-shard
    out = (zt[0].reshape(b, n), zt[1].reshape(b, n))
    if inverse:
        ninv = pow(n, P - 2, P)
        out = gl.mul_scalar(out, ninv)
    return out


def ntt_sharded(x: gl.Fp, mesh: Mesh, axis: str = "batch",
                inverse: bool = False) -> gl.Fp:
    """Distributed four-step NTT over `mesh`; last axis is the transform.

    Accepts (n,) or (B, n) planes; batch elements ride the same single
    all_to_all. Output matches poly.ntt/ntt_mxu bit-exactly.
    """
    flat = x[0].ndim == 1
    xf = ((x[0][None, :], x[1][None, :]) if flat else x)
    out = _run(xf, mesh, axis, inverse)
    if flat:
        return out[0][0], out[1][0]
    return out


def coset_intt_sharded(evals: gl.Fp, shift: int, mesh: Mesh,
                       axis: str = "batch") -> gl.Fp:
    """poly/ntt.coset_intt via the distributed four-step transform:
    coefficients of the poly whose evals on shift*H are given."""
    from ..poly import ntt as pntt
    flat = evals[0].ndim == 1
    ev = ((evals[0][None, :], evals[1][None, :]) if flat else evals)
    coeffs = _run(ev, mesh, axis, inverse=True)
    n = coeffs[0].shape[-1]
    sp = pntt._shift_powers(n, pow(shift % P, P - 2, P))
    out = gl.mul(coeffs, (jnp.asarray(sp[0]), jnp.asarray(sp[1])))
    if flat:
        return out[0][0], out[1][0]
    return out


def coeffs_to_coset_evals_sharded(coeffs: gl.Fp, rate_bits: int, mesh: Mesh,
                                  axis: str = "batch",
                                  shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR
                                  ) -> gl.Fp:
    """poly/ntt.coeffs_to_coset_evals via the distributed transform."""
    from ..poly import ntt as pntt
    flat = coeffs[0].ndim == 1
    cf = ((coeffs[0][None, :], coeffs[1][None, :]) if flat else coeffs)
    n = cf[0].shape[-1]
    n_ext = n << rate_bits
    sp = pntt._shift_powers(n, shift % P)
    scaled = gl.mul(cf, (jnp.asarray(sp[0]), jnp.asarray(sp[1])))
    padded = (jnp.pad(scaled[0], ((0, 0), (0, n_ext - n))),
              jnp.pad(scaled[1], ((0, 0), (0, n_ext - n))))
    out = _run(padded, mesh, axis, inverse=False)
    if flat:
        return out[0][0], out[1][0]
    return out


class ShardedNttOps:
    """The full prover NTT surface over a device mesh — plug into
    prover.prove via ``lde_fn=ops.coset_lde, ntt_ops=ops`` so BOTH the
    trace/aux blowups and the quotient-phase NTT tail (coset INTT, chunk
    coset re-evals, subgroup evals) ride the distributed four-step
    transform (ROADMAP §4; VERDICT r3 item 8). Bit-exact vs poly/ntt."""

    def __init__(self, mesh: Mesh, axis: str = "batch"):
        self.mesh = mesh
        self.axis = axis

    def coset_lde(self, evals: gl.Fp, rate_bits: int) -> gl.Fp:
        return coset_lde_sharded(evals, rate_bits, self.mesh, self.axis)

    def coset_intt(self, evals: gl.Fp, shift: int) -> gl.Fp:
        return coset_intt_sharded(evals, shift, self.mesh, self.axis)

    def coeffs_to_coset_evals(self, coeffs: gl.Fp, rate_bits: int,
                              shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR
                              ) -> gl.Fp:
        return coeffs_to_coset_evals_sharded(coeffs, rate_bits, self.mesh,
                                             self.axis, shift)

    def ntt(self, x: gl.Fp) -> gl.Fp:
        return ntt_sharded(x, self.mesh, self.axis)


def coset_lde_sharded(evals: gl.Fp, rate_bits: int, mesh: Mesh,
                      axis: str = "batch",
                      shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR) -> gl.Fp:
    """Distributed trace LDE: ALL columns blown up via two batched sharded
    transforms (poly/ntt.coset_lde semantics). Plug into prover.prove via
    the ``lde_fn`` seam."""
    from ..poly import ntt as pntt
    flat = evals[0].ndim == 1
    ev = ((evals[0][None, :], evals[1][None, :]) if flat else evals)
    b, n = ev[0].shape
    n_ext = n << rate_bits
    coeffs = _run(ev, mesh, axis, inverse=True)
    sp = pntt._shift_powers(n, shift % P)
    scaled = gl.mul(coeffs, (jnp.asarray(sp[0]), jnp.asarray(sp[1])))
    padded = (jnp.pad(scaled[0], ((0, 0), (0, n_ext - n))),
              jnp.pad(scaled[1], ((0, 0), (0, n_ext - n))))
    out = _run(padded, mesh, axis, inverse=False)
    if flat:
        return out[0][0], out[1][0]
    return out
