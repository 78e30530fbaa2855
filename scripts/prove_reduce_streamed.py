"""Reduce node over STREAMED leaves on the chip (phase 5 → phase 3b):
two real Poseidon-chain proofs with a boundary link (A.out == B.in)
verified inside ONE outer proof, with the value-RAM streamed recorder
forced on — the MapReduce reduce semantics of the reference
(`/root/reference/circuits/builder/subchain_verification.rs:233-289`)
composed with the round-4/5 streaming machinery.

Scale note (why Poseidon leaves): ONE HeaderAir(1) streamed child is a
2^19-row machine; TWO would put the reduce node's resident LDEs alone
(~1,100 cols x 2^21) past one v5e's HBM. Reducing statement-scale
leaves needs the multi-chip sharded prove (parallel/ntt_dist) — the
mechanism (streamed children + links + expose + standard verifier) is
identical at this scale.

Writes PROD_SIZES.json row `reduce_streamed_poseidon2`.
Run: python scripts/prove_reduce_streamed.py     (axon = one TPU v5e)
"""

import json
import os
import sys
import time

os.environ.setdefault("VX_QUOT_ROWTILE", "65536")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_JSON = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "PROD_SIZES.json")


def main():
    import numpy as np

    from vectorx_tpu.field import goldilocks as gl
    from vectorx_tpu.stark import prover, verifier
    from vectorx_tpu.stark import recursion_air as ra
    from vectorx_tpu.stark.air_poseidon import PoseidonChainAir, WIDTH

    inner_cfg = prover.StarkConfig(rate_bits=4, num_queries=21,
                                   final_poly_len=8,
                                   pow_bits=prover.PRODUCTION_POW_BITS)
    outer_cfg = prover.StarkConfig(rate_bits=2, num_queries=42,
                                   final_poly_len=8,
                                   pow_bits=prover.PRODUCTION_POW_BITS)

    t_all = time.time()
    air = PoseidonChainAir()
    x0 = list(range(1, WIDTH + 1))
    tr_a, pub_a, mid = PoseidonChainAir.make_trace(x0, 2)
    tr_b, pub_b, out = PoseidonChainAir.make_trace(mid, 2)
    log_n = 6                                     # 2 perms x 32 rows

    children = []
    for name, tr, pub in (("A", tr_a, pub_a), ("B", tr_b, pub_b)):
        t0 = time.time()
        pubs_fp = [gl.to_fp(int(p)) for p in pub]
        proof = prover.prove(air, tr, pubs_fp, inner_cfg)
        np.asarray(proof.trace_cap[0])
        assert bool(verifier.verify(air, proof, pubs_fp, log_n, inner_cfg))
        print(f"inner {name}: {time.time() - t0:.1f}s", flush=True)
        children.append((air, proof, list(pub), log_n, inner_cfg))

    # adjacency: A.out (publics 12..24) == B.in (publics 0..12); expose
    # A.in and B.out as the combined claim
    links = [(0, WIDTH + i, 1, i) for i in range(WIDTH)]
    expose = ([(0, i) for i in range(WIDTH)]
              + [(1, WIDTH + i) for i in range(WIDTH)])

    t0 = time.time()
    oair, oproof, opubs = ra.prove_reduce(children, links, expose,
                                          outer_cfg, stream=True)
    np.asarray(oproof.trace_cap[0])
    t_prove = time.time() - t0
    print(f"reduce prove (streamed, cold): {t_prove:.1f}s rows="
          f"{oair.n_rows} K={oair.K} cols={oair.num_cols}+"
          f"{oair.num_consts}", flush=True)
    assert oair.has_ram, "stream=True must engage the value RAM"

    olog = oair.n_rows.bit_length() - 1
    shapes = [(air, log_n, inner_cfg, len(pub_a)),
              (air, log_n, inner_cfg, len(pub_b))]
    t0 = time.time()
    vair = ra.reduce_air_for(shapes, links, expose, stream=True)
    assert vair.schedule_digest() == oair.schedule_digest()
    opubs_fp = [gl.to_fp(p) for p in opubs]
    ok = bool(verifier.verify(vair, oproof, opubs_fp, olog, outer_cfg))
    t_verify = time.time() - t0
    print(f"reduce verify: {ok} {t_verify:.1f}s", flush=True)
    assert ok

    # combined claim binds: outer publics == A.in ++ B.out
    assert [int(p) for p in opubs[:WIDTH]] == [int(v) % gl.MODULUS
                                               for v in x0]
    assert [int(p) for p in opubs[WIDTH:2 * WIDTH]] == list(out)

    bad = list(opubs)
    bad[WIDTH] = (bad[WIDTH] + 1) % gl.MODULUS
    assert not bool(verifier.verify(
        vair, oproof, [gl.to_fp(p) for p in bad], olog, outer_cfg))
    print("tampered combined claim rejected", flush=True)

    outj = {}
    if os.path.exists(_JSON):
        with open(_JSON) as f:
            outj = json.load(f)
    outj["reduce_streamed_poseidon2"] = dict(
        children=2, inner_rows=1 << log_n, inner_rate_bits=inner_cfg.rate_bits,
        inner_queries=inner_cfg.num_queries, outer_rows=oair.n_rows,
        outer_K=oair.K, outer_cols=oair.num_cols,
        outer_consts=oair.num_consts, outer_rate_bits=outer_cfg.rate_bits,
        outer_queries=outer_cfg.num_queries,
        prove_cold_s=round(t_prove, 1), verify_s=round(t_verify, 1),
        total_s=round(time.time() - t_all, 1))
    with open(_JSON, "w") as f:
        json.dump(outj, f, indent=1, sort_keys=True)
    print("PROD_SIZES.json updated: reduce_streamed_poseidon2", flush=True)


if __name__ == "__main__":
    main()
