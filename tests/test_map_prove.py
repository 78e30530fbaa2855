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
