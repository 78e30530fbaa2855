"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: Goldilocks NTT throughput at 2^20 points on the MXU
four-step path (the prover's dominant kernel — the reference's plonky2
LDE equivalent, SURVEY.md §6). vs_baseline is measured against an estimate
of the Rust reference prover's rayon NTT on its 32-vCPU CI host (~1e8
pts/s for 2^20; the reference publishes no numbers — BASELINE.md documents
the absence).

Methodology: the axon tunnel has ~33 ms fixed dispatch+fetch latency and
block_until_ready is not a reliable barrier, so each timed dispatch runs
REPS chained transforms under one jit (inputs varied per step via a
counter xor so nothing is served from cache) with an on-device reduce +
host fetch as the barrier; a separately-measured empty-dispatch latency
is subtracted once per dispatch.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.poly import ntt as pntt

LOG_N = 20
BATCH = 8          # independent polynomials (trace columns)
REPS = 8           # chained transforms per dispatch
ITERS = 4
BASELINE_NTT_PTS_PER_S = 1.0e8  # est. plonky2 rayon NTT, 32-vCPU host


def _dispatch_latency():
    x = jnp.ones((8,), jnp.uint32)
    f = jax.jit(lambda v, k: (v + k).sum())
    np.asarray(f(x, jnp.uint32(0)))
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        np.asarray(f(x, jnp.uint32(i + 1)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    n = 1 << LOG_N
    rng = np.random.default_rng(0)
    x = (jnp.asarray(rng.integers(0, 1 << 32, (BATCH, n), dtype=np.uint32)),
         jnp.asarray(rng.integers(0, 1 << 31, (BATCH, n), dtype=np.uint32)))

    def chained(v, k0):
        def body(carry, k):
            lo, hi = carry
            return pntt.ntt((lo ^ k, hi)), None
        out, _ = jax.lax.scan(
            body, v, k0 + jnp.arange(REPS, dtype=jnp.uint32))
        return out[0].sum() + out[1].sum()

    fwd = jax.jit(chained)
    np.asarray(fwd(x, jnp.uint32(0)))          # compile + warmup
    lat = _dispatch_latency()

    times = []
    for i in range(ITERS):
        t0 = time.perf_counter()
        np.asarray(fwd(x, jnp.uint32(100 * (i + 1))))
        times.append(time.perf_counter() - t0)
    dt = max(min(times) - lat, 1e-9) / REPS

    pts_per_s = BATCH * n / dt
    print(json.dumps({
        "metric": f"goldilocks_ntt_2e{LOG_N}_batch{BATCH}",
        "value": round(pts_per_s, 1),
        "unit": "points/s",
        "vs_baseline": round(pts_per_s / BASELINE_NTT_PTS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
