import numpy as np
import jax.numpy as jnp
import pytest

from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.field import ext
from vectorx_tpu.poly import ntt as pntt
from vectorx_tpu.stark import fri, merkle
from vectorx_tpu.stark.challenger import Challenger

from oracle import P

RNG = np.random.default_rng(3)

LOG_N = 8        # codeword size 256
RATE_BITS = 2    # degree bound 64
CFG = fri.FriConfig(rate_bits=RATE_BITS, num_queries=10, final_poly_len=8, cap_height=0)

import jax


def _prove(cw):
    return fri.prove(cw, Challenger.new(), CFG)[0]


def _verify(proof):
    return fri.verify(proof, LOG_N, Challenger.new(), CFG)


def low_degree_codeword():
    d = 1 << (LOG_N - RATE_BITS)
    cre = [int(x) % P for x in RNG.integers(0, 1 << 64, size=d, dtype=np.uint64)]
    cim = [int(x) % P for x in RNG.integers(0, 1 << 64, size=d, dtype=np.uint64)]
    evals_re = pntt.coset_lde(pntt.ntt(gl.to_fp([cre])), RATE_BITS)
    evals_im = pntt.coset_lde(pntt.ntt(gl.to_fp([cim])), RATE_BITS)
    re = (evals_re[0][0], evals_re[1][0])
    im = (evals_im[0][0], evals_im[1][0])
    return (re, im)


def test_fri_accepts_low_degree():
    cw = low_degree_codeword()
    proof = _prove(cw)
    ok, indices, layer0 = _verify(proof)
    assert bool(ok)

    # layer-0 openings must match the actual codeword
    a, b, leaf_idx = layer0
    half = 1 << (LOG_N - 1)
    idx = np.asarray(leaf_idx)
    cw_re = np.asarray(gl.from_fp(cw[0]))
    cw_im = np.asarray(gl.from_fp(cw[1]))
    a_re = np.asarray(gl.from_fp(a[0]))
    a_im = np.asarray(gl.from_fp(a[1]))
    b_re = np.asarray(gl.from_fp(b[0]))
    for qi in range(CFG.num_queries):
        assert int(a_re[qi]) == int(cw_re[idx[qi]])
        assert int(a_im[qi]) == int(cw_im[idx[qi]])
        assert int(b_re[qi]) == int(cw_re[idx[qi] + half])


def test_fri_rejects_tampered_leaf():
    cw = low_degree_codeword()
    proof = _prove(cw)
    bad = proof.query_leaves[1]
    bad_lo = bad[0].at[0, 0].set(bad[0][0, 0] ^ jnp.uint32(1))
    proof.query_leaves[1] = (bad_lo, bad[1])
    ok, _, _ = _verify(proof)
    assert not bool(ok)


def test_fri_rejects_tampered_final_poly():
    cw = low_degree_codeword()
    proof = _prove(cw)
    fc = proof.final_coeffs
    re = fc[0]
    proof.final_coeffs = ((re[0].at[0].set(re[0][0] ^ jnp.uint32(1)), re[1]), fc[1])
    ok, _, _ = _verify(proof)
    assert not bool(ok)


def test_fri_rejects_high_degree():
    # random (not low-degree) codeword must fail w.h.p.
    n = 1 << LOG_N
    re = gl.to_fp([int(x) % P for x in RNG.integers(0, 1 << 64, size=n, dtype=np.uint64)])
    im = gl.to_fp([int(x) % P for x in RNG.integers(0, 1 << 64, size=n, dtype=np.uint64)])
    cw = (re, im)
    proof = _prove(cw)
    ok, _, _ = _verify(proof)
    assert not bool(ok)


POW_CFG = fri.FriConfig(rate_bits=RATE_BITS, num_queries=10,
                        final_poly_len=8, cap_height=0, pow_bits=4)


def test_fri_grinding_accepts_and_binds():
    cw = low_degree_codeword()
    proof, _ = fri.prove(cw, Challenger.new(), POW_CFG)
    ok, _, _ = fri.verify(proof, LOG_N, Challenger.new(), POW_CFG)
    assert bool(ok)
    # a tampered grinding nonce changes the query indices AND fails the
    # zero-bits check w.h.p.
    proof.pow_nonce = (proof.pow_nonce[0] ^ jnp.uint32(1), proof.pow_nonce[1])
    ok, _, _ = fri.verify(proof, LOG_N, Challenger.new(), POW_CFG)
    assert not bool(ok)


def test_fri_grinding_changes_transcript():
    # pow_bits=0 proof must not verify under a pow_bits>0 config: the
    # transcript diverges, so the fold betas/indices mismatch
    cw = low_degree_codeword()
    proof, _ = fri.prove(cw, Challenger.new(), CFG)
    proof.pow_nonce = (jnp.zeros((), jnp.uint32), jnp.zeros((), jnp.uint32))
    ok, _, _ = fri.verify(proof, LOG_N, Challenger.new(), POW_CFG)
    assert not bool(ok)


def test_merkle_round_trip():
    rows = gl.to_fp([[i, i + 1, i * 7 % P, 5] for i in range(16)])
    tree = merkle.build(rows, cap_height=1)
    for idx in [0, 7, 15]:
        path = merkle.prove(tree, idx)
        leaf = (rows[0][idx], rows[1][idx])
        assert bool(merkle.verify(tree.cap, idx, leaf, path))
    # wrong leaf fails
    leaf = (rows[0][3], rows[1][3])
    path = merkle.prove(tree, 4)
    assert not bool(merkle.verify(tree.cap, 4, leaf, path))
