"""Phase-5 streamed recorder coverage (VERDICT r4 item 4): the
`_OpeningStreamer`/`_RefCell`/value-RAM path that carries the HeaderAir
recursion leaf auto-enables only above STREAM_MIN_CELLS, which no small
in-suite machine reaches — so these tests force `stream=True` on a tiny
Fibonacci inner proof and check, on every CI run:

  * the streamed machine is satisfiable AND its RAM multiset balances;
  * the claim-shape rebuild (outer_air_for stream=True) matches;
  * a tampered re-witnessed RAM value breaks the multiset argument
    (check_constraints alone cannot see it — that is the RAM's job);
  * a replayed/tampered opening breaks the transcript binding.

RAM-multiset satisfiability is checked on the trace domain directly
(aux built by prover._build_ram_aux at random γ/δ, constraints from
prover._ram_constraint_evals) — the same polynomial identities the
prover commits to, without a full outer prove on the 2-core host.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from vectorx_tpu.field import ext, goldilocks as gl
from vectorx_tpu.stark import prover, verifier, recursion_air as ra
from vectorx_tpu.stark.air import FibonacciAir, check_constraints

P = gl.MODULUS
CFG_MIN = prover.StarkConfig(rate_bits=1, num_queries=2, final_poly_len=4)
LOG_N = 4


def _fp(publics):
    return [gl.to_fp(int(p) % P) for p in publics]


def _inner():
    air = FibonacciAir()
    trace, publics = FibonacciAir.make_trace(1 << LOG_N)
    pubs = _fp(publics)
    proof = prover.prove(air, trace, pubs, CFG_MIN)
    assert bool(verifier.verify(air, proof, pubs, LOG_N, CFG_MIN))
    return air, proof, pubs


def _record_streamed(air, proof, pubs, tamper_proof=None):
    mb = ra.MachineBuilder()
    cells = [mb.pin_public(v) for v in ra._pub_ints(pubs)]
    ra.record_stark_verify(mb, air, tamper_proof or proof, cells, LOG_N,
                           CFG_MIN, stream=True)
    return ra.RecursionAir(mb)


def _ram_balanced(oair, trace) -> bool:
    """Trace-domain RAM-multiset check at random γ/δ: inverse definitions
    hold on every row, S steps on transitions, S(0)=0, S wraps to 0."""
    n = trace[0].shape[1]
    import random
    rng = random.Random(123)        # P > int64: numpy integers() overflows

    def rnd():
        return tuple(
            tuple(gl.to_fp(rng.randrange(1, P))) for _ in range(2))

    gamma, delta = rnd(), rnd()
    aux = prover._build_ram_aux(oair, trace, gamma, delta, n)
    mult_c, ld_c, ad_c, act_c, val_col = oair.ram_multiset()
    cfp = gl.to_fp(np.asarray(oair.constant_columns(n), dtype=np.object_))

    def cc(i):
        return ext.from_base((cfp[0][i], cfp[1][i]))

    inv_v = ((aux[0][0], aux[1][0]), (aux[0][1], aux[1][1]))
    sR_v = ((aux[0][2], aux[1][2]), (aux[0][3], aux[1][3]))
    sR_next = ((jnp.roll(aux[0][2], -1), jnp.roll(aux[1][2], -1)),
               (jnp.roll(aux[0][3], -1), jnp.roll(aux[1][3], -1)))
    val_x = ext.from_base((trace[0][val_col], trace[1][val_col]))
    r_e, r_t, r_f, r_l = prover._ram_constraint_evals(
        gamma, delta, cc(ad_c), cc(mult_c), cc(ld_c), cc(act_c), val_x,
        inv_v, sR_v, sR_next)

    def ez(v, sl):
        return bool(jnp.all(gl.is_zero((v[0][0][sl], v[0][1][sl])))
                    and jnp.all(gl.is_zero((v[1][0][sl], v[1][1][sl]))))

    ok = all(ez(c, slice(None)) for c in r_e)
    ok = ok and all(ez(c, slice(0, n - 1)) for c in r_t)
    ok = ok and all(ez(c, slice(0, 1)) for c in r_f)
    ok = ok and all(ez(c, slice(n - 1, n)) for c in r_l)
    return ok


def test_streamed_record_satisfiable_and_ram_balanced():
    air, proof, pubs = _inner()
    oair = _record_streamed(air, proof, pubs)
    assert oair.has_ram, "stream=True must route openings through the RAM"
    trace, opubs = oair.make_trace()
    assert check_constraints(oair, trace, _fp(opubs))
    assert _ram_balanced(oair, trace)
    # claim-shape rebuild matches the recorded schedule
    vair = ra.outer_air_for(air, LOG_N, CFG_MIN, len(pubs), stream=True)
    assert vair.schedule_digest() == oair.schedule_digest()


def test_streamed_tampered_ram_value_unbalances_multiset():
    """Flip a re-witnessed value on a RAM LOAD row: the machine's base
    constraints may still hold locally, but the multiset must break —
    this is exactly the soundness surface the value RAM carries."""
    air, proof, pubs = _inner()
    oair = _record_streamed(air, proof, pubs)
    trace, opubs = oair.make_trace()
    cc = np.asarray(oair.constant_columns(oair.n_rows), dtype=np.uint64)
    load_rows = np.nonzero(cc[oair.C_RLOAD])[0]
    assert load_rows.size > 0
    r = int(load_rows[0])
    bad = (trace[0].at[oair.COL_C, r].set(
        trace[0][oair.COL_C, r] ^ np.uint32(1)), trace[1])
    assert not (_ram_balanced(oair, bad)
                and check_constraints(oair, bad, _fp(opubs)))


def test_streamed_replayed_opening_rejected():
    """Tamper one ζ-opening in the inner proof: the streamed recorder
    re-witnesses it, so the transcript/ALI binding must fail."""
    air, proof, pubs = _inner()
    tz = proof.trace_zeta
    bad_tz = ((tz[0][0].at[0].set((tz[0][0][0] + 1) % np.uint32(0xffffffff)),
               tz[0][1]), tz[1])
    bad = dataclasses.replace(proof, trace_zeta=bad_tz)
    oair = _record_streamed(air, proof, pubs, tamper_proof=bad)
    trace, opubs = oair.make_trace()
    ok_base = check_constraints(oair, trace, _fp(opubs))
    ok_ram = _ram_balanced(oair, trace)
    assert not (ok_base and ok_ram)
