"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (round 1): Goldilocks radix-2 NTT throughput at 2^20 points
(the prover's dominant kernel — the reference's plonky2 LDE equivalent,
SURVEY.md §6). vs_baseline is measured against an estimate of the Rust
reference prover's rayon NTT on its 32-vCPU CI host (~1e8 pts/s for 2^20;
the reference publishes no numbers — BASELINE.md documents the absence).

Run on whatever jax.devices()[0] is (real TPU under the driver).
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
ITERS = 5
BASELINE_NTT_PTS_PER_S = 1.0e8  # est. plonky2 rayon NTT, 32-vCPU host


def main():
    n = 1 << LOG_N
    rng = np.random.default_rng(0)
    lo = jnp.asarray(rng.integers(0, 1 << 32, size=(BATCH, n), dtype=np.uint32))
    hi = jnp.asarray(rng.integers(0, 1 << 31, size=(BATCH, n), dtype=np.uint32))
    x = (lo, hi)

    # Reduce on-device and fetch the scalar to host each iteration: on the
    # axon backend block_until_ready is not a reliable completion barrier,
    # and XLA could serve repeated identical inputs from cache — so vary the
    # input per iteration and use the host fetch as the barrier.
    fwd = jax.jit(lambda v, k: jax.tree.map(
        lambda a: a.sum(), pntt.ntt((v[0] ^ k, v[1]))))
    r = fwd(x, jnp.uint32(0))
    np.asarray(r[0])  # compile + warmup

    times = []
    for i in range(ITERS):
        t0 = time.perf_counter()
        r = fwd(x, jnp.uint32(i + 1))
        np.asarray(r[0])
        times.append(time.perf_counter() - t0)
    dt = min(times)

    pts_per_s = BATCH * n / dt
    print(json.dumps({
        "metric": f"goldilocks_ntt_2e{LOG_N}_batch{BATCH}",
        "value": round(pts_per_s, 1),
        "unit": "points/s",
        "vs_baseline": round(pts_per_s / BASELINE_NTT_PTS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
