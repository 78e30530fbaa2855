import numpy as np
import jax

from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.parallel import map_prove
from vectorx_tpu.stark import prover
from vectorx_tpu.stark.air import FibonacciAir

LOG_N = 5
N = 1 << LOG_N
CFG = prover.StarkConfig(rate_bits=2, num_queries=6, final_poly_len=4)
AIR = FibonacciAir()


def test_parallel_instances_across_devices():
    assert len(jax.devices()) == 8
    k = 4
    traces, pubs = [], []
    for i in range(k):
        t, p = FibonacciAir.make_trace(N, a0=i, b0=i + 1)
        traces.append(t)
        pubs.append([gl.to_fp(x) for x in p])

    proofs = map_prove.prove_many(AIR, traces, pubs, CFG)
    assert len(proofs) == k
    # each proof landed on its own device
    devs = {proofs[i].trace_cap[0].devices().pop() for i in range(k)}
    assert len(devs) == k
    assert map_prove.verify_many(AIR, proofs, pubs, LOG_N, CFG)

    # cross-wiring publics must fail
    assert not map_prove.verify_many(AIR, proofs, pubs[1:] + pubs[:1], LOG_N, CFG)


def test_map_reduce_prove_end_to_end():
    """Map shards across devices -> ONE reduce proof verifying all of
    them + chain adjacency (the reference's MapReduce shape). The
    heaviest default-suite prove (~minutes on the 2-core host) — kept
    in-suite deliberately: this is the flagship aggregation path."""
    from vectorx_tpu.parallel import aggregate as agg
    cfg = prover.StarkConfig(rate_bits=1, num_queries=2, final_poly_len=4)
    n = 16
    tA, pA = FibonacciAir.make_trace(n)
    a_last = int(np.asarray(tA[0][0, -1])) | (int(np.asarray(tA[1][0, -1])) << 32)
    b_last = int(np.asarray(tA[0][1, -1])) | (int(np.asarray(tA[1][1, -1])) << 32)
    tB, pB = FibonacciAir.make_trace(n, a_last, b_last)
    layout = agg.ChainLayout(start=(0,), end=(2,))
    node = map_prove.map_reduce_prove(
        AIR, [tA, tB],
        [[gl.to_fp(x) for x in pA], [gl.to_fp(x) for x in pB]],
        layout, cfg)
    shapes = [(AIR, 4, cfg, 3), (AIR, 4, cfg, 3)]
    links = [(0, 2, 1, 0)]
    expose = [(0, 0), (1, 2)]
    assert agg.verify_aggregate(node, shapes, links, expose)
