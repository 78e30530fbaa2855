"""Ed25519 EdDSA verification AIR (B=8 limbs, one signature per 256-row
trace — production config batches 2^(B-8) lanes on 2^B rows).

Signature generated with host-side exact-int Edwards arithmetic; the AIR
then proves decompression + [s]B − [h]A == R in-STARK.
"""

import hashlib

import numpy as np
import pytest

from vectorx_tpu.circuits.ed25519 import D_CONST, L_ORDER, _BX, _BY
from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.stark import prover, verifier
from vectorx_tpu.stark.air import BaseVecAlgebra
from vectorx_tpu.stark.air_ed25519 import (Ed25519VerifyAir, P,
                                           compress_host, dummy_sig)

RNG = np.random.default_rng(123)

LOG_N = 8
CFG = prover.StarkConfig(rate_bits=2, num_queries=6, final_poly_len=4)


# -- host-side exact Edwards (a = -1) ----------------------------------------

def _add(p1, p2):
    x1, y1 = p1
    x2, y2 = p2
    dxy = D_CONST * x1 % P * x2 % P * y1 % P * y2 % P
    x3 = (x1 * y2 + y1 * x2) % P * pow(1 + dxy, P - 2, P) % P
    y3 = (y1 * y2 + x1 * x2) % P * pow(1 - dxy, P - 2, P) % P
    return x3, y3


def _smul(k, pt):
    acc = (0, 1)
    while k:
        if k & 1:
            acc = _add(acc, pt)
        pt = _add(pt, pt)
        k >>= 1
    return acc


def make_signature(msg: bytes, seed: int):
    """-> (a_bytes, r_bytes, s, h) with [s]B == R + [h]A."""
    rng = np.random.default_rng(seed)
    a_sec = int.from_bytes(rng.bytes(32), "little") % L_ORDER
    A = _smul(a_sec, (_BX, _BY))
    r_sec = int.from_bytes(rng.bytes(32), "little") % L_ORDER
    R = _smul(r_sec, (_BX, _BY))
    a_bytes, r_bytes = compress_host(*A), compress_host(*R)
    h = int.from_bytes(hashlib.sha512(r_bytes + a_bytes + msg).digest(),
                       "little") % L_ORDER
    s = (r_sec + h * a_sec) % L_ORDER
    # sanity: [s]B == R + [h]A
    assert _smul(s, (_BX, _BY)) == _add(R, _smul(h, A))
    return a_bytes, r_bytes, s, h


SIG = make_signature(b"vectorx precommit", 7)


def _assert_vanish(air, trace):
    import jax.numpy as jnp
    n = air.n_rows
    alg = BaseVecAlgebra((n,))
    local = [(trace[0][c], trace[1][c]) for c in range(air.num_cols)]
    nxt = [(jnp.roll(trace[0][c], -1), jnp.roll(trace[1][c], -1))
           for c in range(air.num_cols)]
    cvals = air.constant_columns(n)
    cfp = gl.to_fp(cvals.astype(object))
    consts = [(cfp[0][i], cfp[1][i]) for i in range(cvals.shape[0])]
    cnx = [(jnp.roll(cfp[0][i], -1), jnp.roll(cfp[1][i], -1))
           for i in range(cvals.shape[0])]
    pubs = [gl.to_fp(p) for p in air.publics_list()]
    cs = air.transition(alg, local, nxt, pubs, consts, cnx)
    for ci, c in enumerate(cs):
        lo, hi = np.asarray(c[0]), np.asarray(c[1])
        bad = (lo[..., :-1] != 0) | (hi[..., :-1] != 0)
        assert not bad.any(), (ci, np.argwhere(bad)[:4])


def test_constraints_vanish_on_trace():
    air = Ed25519VerifyAir([SIG], B=8)
    trace, _ = air.make_trace()
    # the row-batched production witness path must emit the identical trace
    trace_v, _ = air.make_trace_vec()
    assert np.array_equal(np.asarray(trace[0]), np.asarray(trace_v[0]))
    assert np.array_equal(np.asarray(trace[1]), np.asarray(trace_v[1]))
    _assert_vanish(air, trace)


def test_bad_signature_rejected_at_witness():
    a, r, s, h = SIG
    air = Ed25519VerifyAir([(a, r, s, (h + 1) % L_ORDER)], B=8)
    with pytest.raises(AssertionError):
        air.make_trace()


def test_prove_verify_ed25519():
    air = Ed25519VerifyAir([SIG], B=8)
    trace, publics = air.make_trace_vec()
    pubs = [gl.to_fp(p) for p in publics]
    proof = prover.prove(air, trace, pubs, CFG)
    assert bool(verifier.verify(air, proof, pubs, LOG_N, CFG))

    import os
    if not os.environ.get("VX_HEAVY_TESTS"):
        return  # tamper re-prove (~10 min on 2-core CPU) — soundness of the
        # prover on tampered traces is exercised by the cheaper AIRs
        # (test_gadget_vec/test_lookup/test_stark) on every run
    # tampering the accumulator mid-ladder must fail
    c0 = air.acc[0][0]
    lo = trace[0].at[c0, 100].set((trace[0][c0, 100] + 1) % np.uint32(251))
    proof2 = prover.prove(air, (lo, trace[1]), pubs, CFG)
    assert not bool(verifier.verify(air, proof2, pubs, LOG_N, CFG))


def test_dummy_lane_satisfies():
    """The disabled-lane filler ([0]B == O + [0]B) satisfies the AIR."""
    air = Ed25519VerifyAir([dummy_sig()], B=8)
    trace, _ = air.make_trace_vec()
    _assert_vanish(air, trace)
