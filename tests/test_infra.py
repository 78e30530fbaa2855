"""Serialization, hints, profiling, watch — infra subsystems."""

import asyncio
import logging

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.stark import fri, serialize
from vectorx_tpu.stark.challenger import Challenger
from vectorx_tpu.stark.hints import HintRegistry, WitnessBuilder
from vectorx_tpu.stark.watch import watch_fp
from vectorx_tpu.utils.profiling import PhaseTimer
from vectorx_tpu.poly import ntt as pntt

from oracle import P

RNG = np.random.default_rng(41)


def _small_fri_proof():
    cfg = fri.FriConfig(rate_bits=2, num_queries=4, final_poly_len=4)
    d = 16
    cre = [int(x) % P for x in RNG.integers(0, 1 << 64, d, dtype=np.uint64)]
    er = pntt.coset_lde(pntt.ntt(gl.to_fp([cre])), 2)
    re = (er[0][0], er[1][0])
    proof, _ = fri.prove((re, re), Challenger.new(), cfg)
    return proof, cfg


class TestSerialization:
    def test_proof_round_trip(self):
        proof, cfg = _small_fri_proof()
        blob = serialize.serialize_proof(proof)
        assert blob[:4] == b"VXTP"
        back = serialize.deserialize_proof(blob, proof)
        for a, b in zip(jax.tree_util.tree_leaves(proof),
                        jax.tree_util.tree_leaves(back)):
            assert np.array_equal(np.asarray(a), np.asarray(b))
        # the restored proof must still verify
        ok, _, _ = fri.verify(back, 6, Challenger.new(), cfg)
        assert bool(ok)

    def test_structure_mismatch_rejected(self):
        proof, cfg = _small_fri_proof()
        blob = serialize.serialize_proof(proof)
        wrong_like = jax.tree_util.tree_map(lambda x: x, proof)
        wrong_like.caps = wrong_like.caps[:-1]  # different structure
        with pytest.raises(AssertionError):
            serialize.deserialize_proof(blob, wrong_like)

    def test_config_round_trip(self):
        cfg = fri.FriConfig(rate_bits=2, num_queries=4, final_poly_len=4)
        blob = serialize.serialize_config(cfg)
        assert serialize.deserialize_config(blob, fri.FriConfig) == cfg

    def test_tamper_detected_by_verifier(self):
        proof, cfg = _small_fri_proof()
        blob = bytearray(serialize.serialize_proof(proof))
        blob[-3] ^= 1  # flip a payload byte
        back = serialize.deserialize_proof(bytes(blob), proof)
        ok, _, _ = fri.verify(back, 6, Challenger.new(), cfg)
        assert not bool(ok)


class TestHints:
    def test_concurrent_resolution(self):
        reg = HintRegistry()

        @reg.hint("fetch_header")
        async def fetch_header(n):
            await asyncio.sleep(0.01)
            return b"hdr%d" % n

        wb = WitnessBuilder(reg)
        for i in range(10):
            wb.request(f"h{i}", "fetch_header", i)
        out = asyncio.run(wb.resolve())
        assert out["h3"] == b"hdr3"
        assert len(out) == 10

    def test_duplicate_name_rejected(self):
        reg = HintRegistry()
        reg.register("x", None)
        with pytest.raises(ValueError):
            reg.register("x", None)


class TestProfiling:
    def test_phase_timer(self):
        t = PhaseTimer()
        with t.phase("outer"):
            with t.phase("inner"):
                pass
        assert "outer" in t.totals and "outer/inner" in t.totals
        assert t.report()


class TestWatch:
    def test_watch_under_jit(self, caplog):
        fp = gl.to_fp([5, P - 1])

        @jax.jit
        def f(x):
            watch_fp("vals", x)
            return gl.add(x, x)

        with caplog.at_level(logging.INFO, logger="vectorx.watch"):
            out = f(fp)
            jax.block_until_ready(out)
            jax.effects_barrier()
        assert any("watch vals" in r.message for r in caplog.records)


class TestCheckpoint:
    """Checkpoint/resume for long bundle proves (SURVEY.md §5.4)."""

    def test_roundtrip_and_keying(self, tmp_path):
        from vectorx_tpu.stark import prover, serialize as _ser
        from vectorx_tpu.stark.air import FibonacciAir
        from vectorx_tpu.stark.checkpoint import Checkpoint

        cfg = prover.StarkConfig(rate_bits=1, num_queries=2,
                                 final_poly_len=4)
        air = FibonacciAir()
        air.n_rows = 16                       # fixed-shape marker
        trace, publics = FibonacciAir.make_trace(16)
        pubs = [gl.to_fp(p) for p in publics]
        proof = prover.prove(air, trace, pubs, cfg)

        cp = Checkpoint(str(tmp_path))
        parts = (b"unit-0", b"16")
        assert cp.load("hdr", cfg, parts, air) is None     # cold miss
        cp.store("hdr", cfg, parts, proof, publics)
        hit = cp.load("hdr", cfg, parts, air)
        assert hit is not None
        got_proof, got_pubs = hit
        assert got_pubs == [int(p) % P for p in publics]
        assert (_ser.serialize_proof(got_proof)
                == _ser.serialize_proof(proof))

        # different inputs or config must NOT hit
        assert cp.load("hdr", cfg, (b"unit-1", b"16"), air) is None
        cfg2 = prover.StarkConfig(rate_bits=2, num_queries=2,
                                  final_poly_len=4)
        assert cp.load("hdr", cfg2, parts, air) is None

        # corrupt entry fails closed (reprove)
        import os
        vxp = [f for f in os.listdir(tmp_path) if f.endswith(".vxp")][0]
        with open(tmp_path / vxp, "wb") as f:
            f.write(b"garbage")
        assert cp.load("hdr", cfg, parts, air) is None

    def test_disabled_is_noop(self):
        from vectorx_tpu.stark.checkpoint import Checkpoint
        cp = Checkpoint(None)
        assert cp.load("x", None, (), None) is None
        cp.store("x", None, (), None, [])    # must not raise
