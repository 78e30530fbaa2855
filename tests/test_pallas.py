"""Pallas kernel correctness (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import jax
import pytest

from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.hashes import poseidon as ps
from vectorx_tpu.ops import poseidon_pallas as pp

from oracle import P

RNG = np.random.default_rng(21)


def test_pallas_permute_matches_reference():
    states = [[int(x) % P for x in RNG.integers(0, 1 << 64, 12, dtype=np.uint64)]
              for _ in range(5)]
    fp = gl.to_fp(states)
    got = pp.permute(fp, interpret=True)
    want = ps.permute(fp)
    assert np.array_equal(np.asarray(got[0]), np.asarray(want[0]))
    assert np.array_equal(np.asarray(got[1]), np.asarray(want[1]))


def test_pallas_permute_multi_tile_grid():
    """Batch > TILE: two grid steps + lane padding must stay exact."""
    n = pp.TILE + 3
    states = np.stack([RNG.integers(0, P, 12, dtype=np.uint64)
                       for _ in range(4)])
    reps = np.tile(states, (n // 4 + 1, 1))[:n]
    fp = gl.to_fp(reps.astype(object))
    got = pp.permute(fp, interpret=True)
    want = {tuple(int(x) for x in s): ps.permute_ints([int(x) for x in s])
            for s in states}
    got_int = (np.asarray(got[0], np.uint64)
               | (np.asarray(got[1], np.uint64) << 32))
    for i in (0, 1, pp.TILE - 1, pp.TILE, n - 1):
        key = tuple(int(x) for x in reps[i])
        assert got_int[i].tolist() == want[key], i
