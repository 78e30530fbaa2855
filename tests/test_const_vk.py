"""Preprocessed-constant verifying keys (recursion phase 4 protocol).

AIRs with constant columns commit them ONCE into a Poseidon tree
(prover.constant_vk); proofs carry ζ/gζ openings + query rows/paths, and
the verifier checks membership against its OWN recomputed cap — the
plonky2 `constants_sigmas_cap` role (see stark/RECURSION.md phase 4)."""

import numpy as np
import jax.numpy as jnp

from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.stark import prover, verifier
from vectorx_tpu.stark.air import Air

from oracle import P

LOG_N = 5
N = 1 << LOG_N
CFG = prover.StarkConfig(rate_bits=2, num_queries=4, final_poly_len=4)


class ConstAffineAir(Air):
    """One column x with x' = x + c(i); c is a public constant column.

    Publics: [x0, x_last]. The minimal AIR whose soundness rests on the
    constant commitment: forging c forges the claimed endpoint."""

    num_cols = 1
    num_publics = 2

    def __init__(self, seed: int = 0):
        self.seed = seed

    def constant_columns(self, n_rows: int):
        out = np.zeros((1, n_rows), dtype=np.uint64)
        for i in range(n_rows):
            out[0, i] = (7 * i * i + 3 * i + 1 + self.seed) % P
        return out

    def transition(self, alg, local, next_row, publics, consts=(),
                   consts_next=()):
        (x,) = local
        (xn,) = next_row
        return [alg.sub(xn, alg.add(x, consts[0]))]

    def first_row(self, alg, local, publics, consts=()):
        return [alg.sub(local[0], alg.lift(publics[0]))]

    def last_row(self, alg, local, publics, consts=()):
        return [alg.sub(local[0], alg.lift(publics[1]))]

    def make_trace(self, n: int, x0: int = 5):
        c = self.constant_columns(n)[0]
        xs = [x0 % P]
        for i in range(n - 1):
            xs.append((xs[-1] + int(c[i])) % P)
        return gl.to_fp([xs]), [x0 % P, xs[-1]]


def _setup(seed=0):
    air = ConstAffineAir(seed)
    trace, publics = air.make_trace(N)
    pubs = [gl.to_fp(p) for p in publics]
    proof = prover.prove(air, trace, pubs, CFG)
    return air, proof, pubs


def test_const_air_prove_verify():
    air, proof, pubs = _setup()
    assert proof.const_zeta is not None
    assert proof.const_rows_a is not None
    assert bool(verifier.verify(air, proof, pubs, LOG_N, CFG))


def test_reject_tampered_const_zeta():
    air, proof, pubs = _setup()
    cz = proof.const_zeta
    proof.const_zeta = ((cz[0][0].at[0].set(cz[0][0][0] ^ jnp.uint32(1)),
                         cz[0][1]), cz[1])
    assert not bool(verifier.verify(air, proof, pubs, LOG_N, CFG))


def test_reject_tampered_const_row():
    air, proof, pubs = _setup()
    cr = proof.const_rows_a
    proof.const_rows_a = (cr[0].at[0, 0].set(cr[0][0, 0] ^ jnp.uint32(1)),
                          cr[1])
    assert not bool(verifier.verify(air, proof, pubs, LOG_N, CFG))


def test_reject_wrong_vk():
    """A proof built against different constants (same shapes) must not
    verify: the VK cap is recomputed from the verifier's AIR and bound
    into the transcript."""
    air1, _, _ = _setup(seed=0)
    air2 = ConstAffineAir(seed=1)
    trace2, publics2 = air2.make_trace(N)
    pubs2 = [gl.to_fp(p) for p in publics2]
    proof2 = prover.prove(air2, trace2, pubs2, CFG)
    assert not bool(verifier.verify(air1, proof2, pubs2, LOG_N, CFG))
