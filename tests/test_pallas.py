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
