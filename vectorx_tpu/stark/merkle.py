"""Poseidon Merkle tree with caps — trace/FRI commitments for the prover.

The commitment structure our STARK prover uses for trace columns and FRI
codewords, in the role plonky2's Merkle caps play for the reference prover
(SURVEY.md §2.2 "Poseidon hash"). A *cap* of height h is the set of 2^h
subtree roots, committing the tree while shortening query paths by h levels.

Leaves are rows of a (num_leaves, row_width) matrix of field elements;
each leaf digest = Poseidon sponge of its row; internal nodes =
Poseidon 2-to-1. Levels are built with one batched permutation per level —
each level halves, total work ~2x the leaf hashing, all VPU-friendly.

Distinct from circuits/commitments.py's SHA-256 "simple merkle" (which must
match the reference's *public* on-chain commitment bit-for-bit); this tree is
internal to our proof system.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl
from ..hashes import poseidon as ps

Digest = gl.Fp  # (..., 4) lo/hi


@jax.tree_util.register_dataclass
@dataclass
class MerkleTree:
    """levels[0] = leaf digests (n, 4); levels[-1] = cap (2^cap_height, 4)."""
    levels: List[Digest]
    cap_height: int = field(default=0, metadata=dict(static=True))

    @property
    def cap(self) -> Digest:
        return self.levels[-1]

    @property
    def num_leaves(self) -> int:
        return self.levels[0][0].shape[0]


def hash_leaves(rows: gl.Fp) -> Digest:
    """(n, w) field-element rows -> (n, 4) leaf digests."""
    return ps.hash_many(rows)


def _levels_from_digests(digests: Digest, cap_height: int) -> List[Digest]:
    levels = [digests]
    while digests[0].shape[0] > (1 << cap_height):
        left = (digests[0][0::2], digests[1][0::2])
        right = (digests[0][1::2], digests[1][1::2])
        digests = ps.hash_two_to_one(left, right)
        levels.append(digests)
    return levels


def _build_levels(rows: gl.Fp, cap_height: int) -> List[Digest]:
    return _levels_from_digests(hash_leaves(rows), cap_height)


_build_jit = {}


def build(rows: gl.Fp, cap_height: int = 0) -> MerkleTree:
    n = rows[0].shape[0]
    assert n & (n - 1) == 0, "leaf count must be a power of two"
    assert (1 << cap_height) <= n
    from .prover import phase_jit_enabled
    if phase_jit_enabled():
        # one fused program per (n, width, cap): leaf sponge + all levels
        key = (n, rows[0].shape[1], cap_height)
        if key not in _build_jit:
            import jax
            _build_jit[key] = jax.jit(
                lambda r, ch=cap_height: _build_levels(r, ch))
        levels = _build_jit[key](rows)
    else:
        levels = _build_levels(rows, cap_height)
    return MerkleTree(levels=levels, cap_height=cap_height)


# -- column-major commitment with tiled leaf hashing -------------------------
#
# The prover's LDEs are COLUMN-major (w, n_lde). Committing them used to
# transpose the whole matrix into a second full-size buffer and sponge all
# n_lde rows at once — for wide AIRs at big LDEs that transposed copy (plus
# the batched sponge state) is the first allocation to OOM a chip
# (CLAUDE.md: ~800 cols at LDE rows >= 2^17 on one v5e). Here leaf hashing
# streams over row tiles under lax.map: peak extra memory is one
# (w, TILE) slice + its transpose + the (n, 4) digests.

import os as _os

TILE_ROWS = int(_os.environ.get("VX_MERKLE_TILE_ROWS", "8192"))
TILE_MIN_CELLS = int(_os.environ.get("VX_MERKLE_TILE_MIN", str(1 << 25)))


def _leaf_digests_tiled(cols: gl.Fp, tile: int) -> Digest:
    import jax
    w, n = cols[0].shape
    nt = n // tile

    def one(i):
        lo = jax.lax.dynamic_slice(cols[0], (0, i * tile), (w, tile))
        hi = jax.lax.dynamic_slice(cols[1], (0, i * tile), (w, tile))
        return ps.hash_many((lo.T, hi.T))          # (tile, 4)

    ds = jax.lax.map(one, jnp.arange(nt))          # (nt, tile, 4)
    return (ds[0].reshape(n, 4), ds[1].reshape(n, 4))


_build_cols_jit = {}


def build_cols(cols: gl.Fp, cap_height: int = 0) -> MerkleTree:
    """Commit the ROWS of a column-major (w, n) matrix. Small matrices
    take the fused transpose path; large ones stream leaf hashing over
    row tiles (bit-identical digests — same rows, same sponge)."""
    w, n = cols[0].shape
    assert n & (n - 1) == 0, "leaf count must be a power of two"
    tile = TILE_ROWS
    if w * n < TILE_MIN_CELLS or n % tile or n <= tile:
        return build((cols[0].T, cols[1].T), cap_height)
    from .prover import phase_jit_enabled
    import jax

    def _go(c, ch=cap_height, t=tile):
        return _levels_from_digests(_leaf_digests_tiled(c, t), ch)

    if phase_jit_enabled():
        key = (n, w, cap_height, tile)
        if key not in _build_cols_jit:
            _build_cols_jit[key] = jax.jit(_go)
        levels = _build_cols_jit[key](cols)
    else:
        levels = _go(cols)
    return MerkleTree(levels=levels, cap_height=cap_height)


def prove(tree: MerkleTree, index) -> Digest:
    """Sibling path for a leaf: (depth, 4) digests. index may be traced."""
    sib_lo, sib_hi = [], []
    idx = jnp.asarray(index, jnp.int32)
    for level in tree.levels[:-1]:
        sib = idx ^ 1
        sib_lo.append(level[0][sib])
        sib_hi.append(level[1][sib])
        idx = idx >> 1
    return jnp.stack(sib_lo), jnp.stack(sib_hi)


@jax.jit
def verify_batch(cap: Digest, indices: jax.Array, leaf_rows: gl.Fp,
                 paths: Digest) -> jax.Array:
    """Batched path verification — (q,) indices, (q, w) rows, (q, depth, 4)
    paths -> (q,) bools.

    One batched Poseidon call per level (NOT a vmap over scalar verifies:
    vmap would inline the permute's jaxpr per query and blow up
    trace/compile size ~10x), and the level walk runs under lax.scan in
    ONE jitted program — the eager per-level loop was ~depth tunnel
    dispatches per opened tree (~200 for a production header verify, the
    round-4 verify-latency gap)."""
    digest = ps.hash_many(leaf_rows)  # (q, 4)
    idx = jnp.asarray(indices, jnp.int32)
    depth = paths[0].shape[1]
    if depth:
        sibs = (jnp.moveaxis(paths[0], 1, 0), jnp.moveaxis(paths[1], 1, 0))

        def level(carry, sib):
            dg, ix = carry
            is_right = ((ix & 1) == 1)[:, None]
            left = gl.select(is_right, sib, dg)
            right = gl.select(is_right, dg, sib)
            return (ps.hash_two_to_one(left, right), ix >> 1), None

        (digest, idx), _ = jax.lax.scan(level, (digest, idx), sibs)
    cap_entry = (cap[0][idx], cap[1][idx])
    return jnp.all(gl.eq(digest, cap_entry), axis=-1)


def verify(cap: Digest, index, leaf_row: gl.Fp, path: Digest) -> jax.Array:
    """Recompute root from a leaf row + sibling path; check against the cap.

    Returns a bool scalar. Shapes static; index may be traced.
    """
    digest = ps.hash_many((leaf_row[0][None, :], leaf_row[1][None, :]))
    digest = (digest[0][0], digest[1][0])  # (4,)
    idx = jnp.asarray(index, jnp.int32)
    depth = path[0].shape[0]
    for d in range(depth):
        sib = (path[0][d], path[1][d])
        is_right = (idx & 1).astype(bool)
        left = gl.select(is_right, sib, digest)
        right = gl.select(is_right, digest, sib)
        out = ps.hash_two_to_one((left[0][None, :], left[1][None, :]),
                                 (right[0][None, :], right[1][None, :]))
        digest = (out[0][0], out[1][0])
        idx = idx >> 1
    cap_entry = (cap[0][idx], cap[1][idx])
    return jnp.all(gl.eq(digest, cap_entry))
