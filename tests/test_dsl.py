"""L5 DSL (stark/dsl.py): the typed builder must express a REAL AIR —
the Poseidon chain port must accept the hand-written AIR's witness
verbatim and prove/verify through the standard pipeline — and the typed
families (u32 bytes/bits, select) must be sound (tamper-rejected)."""

import numpy as np

from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.stark import prover, verifier
from vectorx_tpu.stark.air import check_constraints
from vectorx_tpu.stark.air_poseidon import PoseidonChainAir
from vectorx_tpu.stark.air_poseidon_dsl import build_poseidon_chain_air
from vectorx_tpu.stark.dsl import AirBuilder, TraceWriter

P = gl.MODULUS


def _fp(publics):
    return [gl.to_fp(int(p) % P) for p in publics]


def test_dsl_poseidon_port_accepts_handwritten_witness():
    air, _ = build_poseidon_chain_air()
    ref = PoseidonChainAir()
    assert air.num_cols == ref.num_cols
    assert air.num_publics == ref.num_publics
    trace, publics, _ = PoseidonChainAir.make_trace(list(range(12)), 1)
    assert check_constraints(air, trace, _fp(publics))
    bad = (trace[0].at[0, 5].set(trace[0][0, 5] ^ np.uint32(1)), trace[1])
    assert not check_constraints(air, bad, _fp(publics))


def test_dsl_poseidon_port_proves_and_verifies():
    air, _ = build_poseidon_chain_air()
    trace, publics, _ = PoseidonChainAir.make_trace(list(range(12)), 1)
    pubs = _fp(publics)
    cfg = prover.StarkConfig(rate_bits=1, num_queries=2, final_poly_len=4)
    proof = prover.prove(air, trace, pubs, cfg)
    assert bool(verifier.verify(air, proof, pubs, 5, cfg))
    bad = list(publics)
    bad[12] = (bad[12] + 1) % P
    assert not bool(verifier.verify(air, proof, _fp(bad), 5, cfg))


def test_dsl_typed_families_and_select():
    """u32 (bytes-of-bits) well-formedness + select combinator: a tiny
    accumulator AIR authored purely in the DSL."""
    b = AirBuilder(num_publics=2, name="acc")
    v = b.u32("v")
    flag = b.bit("flag")

    @b.transition
    def _(ctx):
        # v' = flag ? v + 1 : v
        ctx.eq(ctx.nxt(v.value),
               ctx.select(ctx.cur(flag), ctx.cur(v.value) + 1,
                          ctx.cur(v.value)))

    @b.first_row
    def _(ctx):
        ctx.eq(ctx.cur(v.value), ctx.pub(0))

    @b.last_row
    def _(ctx):
        ctx.eq(ctx.cur(v.value), ctx.pub(1))

    air = b.build()
    n = 16
    w = TraceWriter(b, n)
    val = 250
    for r in range(n):
        w.set_uint(v, r, val)
        f = 1 if r % 2 == 0 and r < n - 1 else 0
        w.set(flag, r, f)
        val += f
    trace = w.finish()
    pubs = _fp([250, val])
    assert check_constraints(air, trace, pubs)

    # tamper a BIT inside the byte family: recomposition must break
    bit_idx = v.parts[0].parts[3].idx
    bad = (trace[0].at[bit_idx, 4].set(
        trace[0][bit_idx, 4] ^ np.uint32(1)), trace[1])
    assert not check_constraints(air, bad, pubs)

    # non-boolean flag must break booleanity
    bad2 = (trace[0].at[flag.idx, 2].set(np.uint32(2)), trace[1])
    assert not check_constraints(air, bad2, pubs)
