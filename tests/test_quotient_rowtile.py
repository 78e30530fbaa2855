"""Row-windowed quotient constraint evaluation (VX_QUOT_ROWTILE) must
emit byte-identical proofs to the fused full-domain path — same α
assignment, same transcript. This is the memory mode that bounds the
recursion outer machine's quotient temps at groups×B instead of
groups×N_lde (the round-4 leaf OOM: 18.6 GB needed vs 15.75 GB HBM)."""

import os

import numpy as np

from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.stark import prover, serialize, verifier
from vectorx_tpu.stark.air import Air, FibonacciAir

from test_ram_multiset import CFG as RAM_CFG, PUBS as RAM_PUBS, RamAir, _vals


def _with_rowtile(rt):
    old = os.environ.get("VX_QUOT_ROWTILE")

    def restore():
        if old is None:
            os.environ.pop("VX_QUOT_ROWTILE", None)
        else:
            os.environ["VX_QUOT_ROWTILE"] = old

    os.environ["VX_QUOT_ROWTILE"] = str(rt)
    return restore


def _roundtrip(air_fn, trace, pubs, cfg, log_n, rt):
    restore = _with_rowtile(0)
    try:
        p0 = prover.prove(air_fn(), trace, pubs, cfg)
        os.environ["VX_QUOT_ROWTILE"] = str(rt)
        air = air_fn()
        p1 = prover.prove(air, trace, pubs, cfg)
        assert bool(verifier.verify(air, p1, pubs, log_n, cfg))
        assert (serialize.serialize_proof(p0)
                == serialize.serialize_proof(p1))
    finally:
        restore()


def test_rowtile_plain_air_bit_exact():
    n = 32
    trace, publics = FibonacciAir.make_trace(n)
    pubs = [gl.to_fp(p) for p in publics]
    cfg = prover.StarkConfig(rate_bits=2, num_queries=4, final_poly_len=4)
    _roundtrip(FibonacciAir, trace, pubs, cfg, 5, 16)


def test_rowtile_lookup_air_bit_exact():
    class ManyRangeAir(Air):
        num_cols = 5
        num_publics = 1

        def lookup_range_columns(self):
            return list(range(5))

        def first_row(self, alg, local, publics, consts=()):
            return [alg.sub(local[0], alg.lift(publics[0]))]

    rng = np.random.default_rng(9)
    n = 16
    vals = rng.integers(0, n, (5, n), dtype=np.uint64)
    trace = gl.to_fp(vals)
    pubs = [gl.to_fp(int(vals[0, 0]))]
    cfg = prover.StarkConfig(rate_bits=1, num_queries=2, final_poly_len=4)
    _roundtrip(ManyRangeAir, trace, pubs, cfg, 4, 8)


def test_rowtile_ram_air_bit_exact():
    trace = gl.to_fp(_vals()[None, :])
    _roundtrip(RamAir, trace, RAM_PUBS, RAM_CFG, 5, 32)


def test_rowtile_skipped_when_logup_tiled():
    """AIRs whose pair count exceeds VX_LOGUP_TILE keep the fused tiled-
    LogUp scan (rowtile would reintroduce (kk2, B) grouped temps); the
    proof must still be byte-exact with rowtile requested."""
    class WideRangeAir(Air):
        num_cols = 9
        num_publics = 1

        def lookup_range_columns(self):
            return list(range(9))

        def first_row(self, alg, local, publics, consts=()):
            return [alg.sub(local[0], alg.lift(publics[0]))]

    rng = np.random.default_rng(11)
    n = 16
    vals = rng.integers(0, n, (9, n), dtype=np.uint64)
    trace = gl.to_fp(vals)
    pubs = [gl.to_fp(int(vals[0, 0]))]
    cfg = prover.StarkConfig(rate_bits=1, num_queries=2, final_poly_len=4)
    old_lk = os.environ.get("VX_LOGUP_TILE")
    restore = _with_rowtile(0)
    try:
        os.environ["VX_LOGUP_TILE"] = "2"     # kk2=5 > 2 -> tiled LogUp
        p0 = prover.prove(WideRangeAir(), trace, pubs, cfg)
        os.environ["VX_QUOT_ROWTILE"] = "8"
        air = WideRangeAir()
        p1 = prover.prove(air, trace, pubs, cfg)
        assert bool(verifier.verify(air, p1, pubs, 4, cfg))
        assert (serialize.serialize_proof(p0)
                == serialize.serialize_proof(p1))
    finally:
        restore()
        if old_lk is None:
            os.environ.pop("VX_LOGUP_TILE", None)
        else:
            os.environ["VX_LOGUP_TILE"] = old_lk
