"""Pair-multiset value RAM (air.ram_multiset — stark/RECURSION.md
phase 5): Σ stores 1/(γ−addr−δ·val) == Σ loads 1/(γ−addr−δ·val) with
γ, δ squeezed after the trace commitment. A load is only satisfiable by
replaying some store's (addr, value); multiplicities work both ways."""

import numpy as np

from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.stark import prover, verifier
from vectorx_tpu.stark.air import Air

N = 32
CFG = prover.StarkConfig(rate_bits=2, num_queries=6, final_poly_len=4)


class RamAir(Air):
    """One committed value column; mult/load/addr/active flags in consts.
    Rows 0-7 store addrs 100..107; rows 12-19 load them reversed; row 24
    re-loads addr 100 (its store's multiplicity = 2) and row 25 is a
    ZERO-multiplicity store (value never reloaded — must still verify)."""

    num_cols = 1
    num_publics = 1
    n_rows = N

    def ram_multiset(self):
        # (mult_c, load_c, addr_c, active_c, val_col)
        return (0, 1, 2, 3, 0)

    def constant_columns(self, n_rows):
        out = np.zeros((4, n_rows), dtype=np.uint64)
        for i in range(8):
            out[0, i] = 2 if i == 0 else 1     # addr 100 loaded twice
            out[2, i] = 100 + i
            out[3, i] = 1
        for i in range(8):
            out[1, 12 + i] = 1
            out[2, 12 + i] = 107 - i
            out[3, 12 + i] = 1
        out[1, 24] = 1
        out[2, 24] = 100
        out[3, 24] = 1
        out[2, 25] = 200                        # mult-0 store, fresh addr
        out[3, 25] = 1
        return out


def _vals():
    vals = np.zeros(N, dtype=object)
    stored = {100 + i: (1000 + 7 * i) for i in range(8)}
    for i in range(8):
        vals[i] = stored[100 + i]
    for i in range(8):
        vals[12 + i] = stored[107 - i]
    vals[24] = stored[100]
    vals[25] = 424242          # mult-0 store: arbitrary, never reloaded
    return vals


PUBS = [gl.to_fp(7)]


def test_ram_multiset_prove_verify():
    air = RamAir()
    proof = prover.prove(air, gl.to_fp(_vals()[None, :]), PUBS, CFG)
    assert bool(verifier.verify(air, proof, PUBS, 5, CFG))


def test_ram_wrong_load_value_rejected():
    air = RamAir()
    bad = _vals()
    bad[12] = 999999
    proof = prover.prove(air, gl.to_fp(bad[None, :]), PUBS, CFG)
    assert not bool(verifier.verify(air, proof, PUBS, 5, CFG))


def test_ram_unmatched_load_rejected():
    class RamAir2(RamAir):
        def constant_columns(self, n_rows):
            out = super().constant_columns(n_rows)
            out[1, 26] = 1
            out[2, 26] = 55          # load from a never-stored address
            out[3, 26] = 1
            return out

    v = _vals()
    v[26] = 1234
    proof = prover.prove(RamAir2(), gl.to_fp(v[None, :]), PUBS, CFG)
    assert not bool(verifier.verify(RamAir2(), proof, PUBS, 5, CFG))
