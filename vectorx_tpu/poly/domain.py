"""Evaluation-domain utilities: subgroup/coset powers, vanishing polys,
barycentric evaluation.

Device-friendly: power tables are built by log-step doubling (log N concats)
instead of host loops, so they trace fast and live on-device; barycentric
evaluation is one vectorized batch-inverse + inner product (the TPU-native
replacement for Horner's O(N) sequential chain when opening polynomials at
out-of-domain points).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl
from ..field import ext

P = gl.MODULUS


@partial(jax.jit, static_argnames=("log_n", "shift"))
def domain_points(log_n: int, shift: int = 1) -> gl.Fp:
    """(shift * w^j) for j in [0, 2^log_n), w the 2^log_n root of unity."""
    root = gl.primitive_root_of_unity(log_n)
    pts = gl.ones((1,))
    sq = root
    for _ in range(log_n):
        mult = gl.full(pts[0].shape, sq)
        pts = (jnp.concatenate([pts[0], gl.mul(pts, mult)[0]]),
               jnp.concatenate([pts[1], gl.mul(pts, mult)[1]]))
        sq = (sq * sq) % P
    if shift != 1:
        pts = gl.mul(pts, gl.full(pts[0].shape, shift % P))
    return pts


def barycentric_eval(evals: gl.Fp, zeta: ext.Fp2, log_n: int,
                     shift: int = 1) -> ext.Fp2:
    """Evaluate polys from their subgroup/coset evals at an out-of-domain
    point — tiled over the leading (poly) axis when the stack is large.

    The recursion leaf's ζ-opening stacks ~1,100 polys × 2^19 evals; the
    fused program's (C, N) ext temps are ~9 GB and OOMed one v5e
    (round-5 leaf2 log: four 2.25 GB select_n temps). Per-poly results
    are independent, so row tiles are byte-exact; VX_BARY_TILE_CELLS
    (default 2^26) bounds each jitted call's working set."""
    import os
    lead = evals[0].shape[:-1]
    n = evals[0].shape[-1]
    cells = int(np.prod(lead)) * n if lead else n
    tile_cells = int(os.environ.get("VX_BARY_TILE_CELLS", str(1 << 26)))
    if len(lead) == 1 and cells > tile_cells > 0:
        rows = max(1, tile_cells // n)
        parts = [
            _barycentric_eval_jit((evals[0][i:i + rows],
                                   evals[1][i:i + rows]),
                                  zeta, log_n, shift)
            for i in range(0, lead[0], rows)
        ]
        return jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs), *parts)
    return _barycentric_eval_jit(evals, zeta, log_n, shift)


@partial(jax.jit, static_argnames=("log_n", "shift"))
def _barycentric_eval_jit(evals: gl.Fp, zeta: ext.Fp2, log_n: int, shift: int = 1) -> ext.Fp2:
    """Evaluate polys from their subgroup/coset evals at an out-of-domain point.

    evals: (..., N) base-field evaluations on shift*H (natural order).
    zeta:  scalar Fp2 point (shape () components).
    Returns (...,) Fp2 values via

        T(ζ) = (ζ^N - s^N) / (N * s^N) * Σ_j T(x_j) * x_j / (ζ - x_j)
    """
    n = 1 << log_n
    x = domain_points(log_n, shift)  # (N,)

    # (ζ - x_j) in Fp2, then batch inverse
    zb = ((jnp.broadcast_to(zeta[0][0], (n,)), jnp.broadcast_to(zeta[0][1], (n,))),
          (jnp.broadcast_to(zeta[1][0], (n,)), jnp.broadcast_to(zeta[1][1], (n,))))
    diff = ext.sub(zb, ext.from_base(x))
    inv_diff = ext.inv(diff)  # (N,)
    weights = ext.mul_base(inv_diff, x)  # x_j / (ζ - x_j)

    # Σ_j T(x_j) * weight_j  over last axis, T base-field
    lead = evals[0].shape[:-1]
    w_re = (jnp.broadcast_to(weights[0][0], lead + (n,)),
            jnp.broadcast_to(weights[0][1], lead + (n,)))
    w_im = (jnp.broadcast_to(weights[1][0], lead + (n,)),
            jnp.broadcast_to(weights[1][1], lead + (n,)))
    term_re = gl.mul(evals, w_re)
    term_im = gl.mul(evals, w_im)

    def _sum_last(v: gl.Fp) -> gl.Fp:
        # log-tree modular reduction over the last axis
        lo, hi = v
        size = lo.shape[-1]
        while size > 1:
            half = size // 2
            a = (lo[..., :half], hi[..., :half])
            b = (lo[..., half:], hi[..., half:])
            lo, hi = gl.add(a, b)
            size = half
        return lo[..., 0], hi[..., 0]

    s_re = _sum_last(term_re)
    s_im = _sum_last(term_im)

    # prefactor (ζ^N - s^N) / (N * s^N)
    zn = ext.pow_const((zeta[0], zeta[1]), n)
    sn = pow(shift % P, n, P)
    pref = ext.mul_base(
        ext.sub(zn, ext.from_base(gl.full((), sn))),
        gl.full((), pow(n * sn % P, P - 2, P)),
    )
    pref_re = ((jnp.broadcast_to(pref[0][0], lead), jnp.broadcast_to(pref[0][1], lead)),
               (jnp.broadcast_to(pref[1][0], lead), jnp.broadcast_to(pref[1][1], lead)))
    return ext.mul(pref_re, (s_re, s_im))


def vanishing_on_coset(log_n: int, rate_bits: int, shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR) -> gl.Fp:
    """(x^N - 1) evaluated on the LDE coset shift*H_{N*2^rate}: (N_lde,).

    Periodic with period 2^rate_bits — computed small then tiled.
    """
    n = 1 << log_n
    n_lde = n << rate_bits
    # x^N = shift^N * omega^j where omega = W^N has order 2^rate_bits
    w = gl.primitive_root_of_unity(log_n + rate_bits)
    omega = pow(w, n, P)
    sn = pow(shift % P, n, P)
    vals = []
    acc = sn
    for _ in range(1 << rate_bits):
        vals.append((acc - 1) % P)
        acc = (acc * omega) % P
    small = gl.to_fp(vals)
    reps = n_lde // (1 << rate_bits)
    return (jnp.tile(small[0], reps), jnp.tile(small[1], reps))
