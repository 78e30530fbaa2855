"""LogUp range-check lookup argument: prove values lie in [0, n_rows)."""

import numpy as np

from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.stark import prover, verifier
from vectorx_tpu.stark.air import Air

RNG = np.random.default_rng(11)

LOG_N = 6
N = 1 << LOG_N
CFG = prover.StarkConfig(rate_bits=2, num_queries=6, final_poly_len=4)


class RangeAir(Air):
    """Two committed columns, both range-checked to [0, N) via LogUp.

    One public pins the first row of column 0 (so the publics list is
    non-empty); everything else is witness.
    """

    num_cols = 2
    num_publics = 1
    max_constraint_degree = 3

    def lookup_range_columns(self):
        return [0, 1]

    def first_row(self, alg, local, publics, consts=()):
        return [alg.sub(local[0], alg.lift(publics[0]))]


AIR = RangeAir()


def _make(vals0, vals1):
    trace = gl.to_fp(np.stack([vals0, vals1]))
    publics = [gl.to_fp(int(vals0[0]))]
    return trace, publics


def test_lookup_accepts_in_range():
    v0 = RNG.integers(0, N, N, dtype=np.uint64)
    v1 = RNG.integers(0, N, N, dtype=np.uint64)
    trace, pubs = _make(v0, v1)
    proof = prover.prove(AIR, trace, pubs, CFG)
    assert bool(verifier.verify(AIR, proof, pubs, LOG_N, CFG))


def test_lookup_rejects_out_of_range():
    v0 = RNG.integers(0, N, N, dtype=np.uint64)
    v1 = RNG.integers(0, N, N, dtype=np.uint64)
    v1[17] = N + 3                      # out of range
    trace, pubs = _make(v0, v1)
    proof = prover.prove(AIR, trace, pubs, CFG)
    assert not bool(verifier.verify(AIR, proof, pubs, LOG_N, CFG))


def test_lookup_rejects_forged_multiplicity():
    """Tamper the committed multiplicity column — LogUp sum must break."""
    v0 = RNG.integers(0, N, N, dtype=np.uint64)
    v1 = RNG.integers(0, N, N, dtype=np.uint64)
    trace, pubs = _make(v0, v1)
    proof = prover.prove(AIR, trace, pubs, CFG)
    # corrupt one aux opening (aux rows at query positions) — Merkle check
    # must catch it
    import jax.numpy as jnp
    rows = proof.aux_rows_a
    proof.aux_rows_a = (rows[0].at[0, 0].set(rows[0][0, 0] ^ jnp.uint32(1)),
                        rows[1])
    assert not bool(verifier.verify(AIR, proof, pubs, LOG_N, CFG))


def test_tiled_logup_quotient_bit_exact():
    """The HBM-lean lax.scan LogUp path (VX_LOGUP_TILE) must emit the
    byte-identical proof to the grouped-tensor path — same α assignment,
    same transcript (the round-2 Ed25519 B=13 OOM fix)."""
    import os
    from vectorx_tpu.stark import serialize
    from vectorx_tpu.stark.air import Air

    class ManyRangeAir(Air):
        num_cols = 9
        num_publics = 1

        def lookup_range_columns(self):
            return list(range(9))

        def first_row(self, alg, local, publics, consts=()):
            return [alg.sub(local[0], alg.lift(publics[0]))]

    rng = np.random.default_rng(5)
    n = 16
    vals = rng.integers(0, n, (9, n), dtype=np.uint64)
    trace = gl.to_fp(vals)
    pubs = [gl.to_fp(int(vals[0, 0]))]
    cfg = prover.StarkConfig(rate_bits=1, num_queries=2, final_poly_len=4)
    old = {k: os.environ.get(k) for k in ("VX_LOGUP_TILE", "VX_DEEP_TILE")}
    try:
        os.environ["VX_LOGUP_TILE"] = "0"
        os.environ["VX_DEEP_TILE"] = "0"
        p0 = prover.prove(ManyRangeAir(), trace, pubs, cfg)
        # both HBM-lean scans on, tiny tiles (forces padding + multiple
        # tiles): proofs must stay byte-identical
        os.environ["VX_LOGUP_TILE"] = "2"
        os.environ["VX_DEEP_TILE"] = "4"
        air = ManyRangeAir()
        p1 = prover.prove(air, trace, pubs, cfg)
        assert bool(verifier.verify(air, p1, pubs, 4, cfg))
        assert (serialize.serialize_proof(p0)
                == serialize.serialize_proof(p1))
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
