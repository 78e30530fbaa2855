"""Benchmark harness — prints ONE JSON line per metric for the driver.

Axes (BASELINE.md "Metrics the TPU build must establish"):
  goldilocks_ntt      — 2^20-point NTT on the MXU four-step path
  poseidon            — width-12 permutations/s, portable vector path
  poseidon_pallas     — same, fused-VMEM Pallas kernel
  blake2b             — variable-length Blake2b-256 bytes/s
  header_proof        — warm single-header STARK proof seconds (2 KiB
                        header, 16 chunks, rate 8, 28 queries, pow 16)
  subchain_scaling    — 8-device vs 1-device sharded subchain throughput
                        on the host CPU mesh (functional scaling check;
                        this host has 2 cores, so it measures collective
                        overhead, not real chip scaling)

vs_baseline: the reference publishes NO numbers (BASELINE.md). Baselines
here are order-of-magnitude estimates of the reference's rayon CPU path
on its 32-vCPU CI host, documented per metric; treat ratios as indicative.

Methodology: the axon tunnel has ~33 ms fixed dispatch+fetch latency and
block_until_ready is not a reliable barrier, so each timed dispatch runs
REPS chained computations under one jit (inputs varied per step so nothing
is served from a result cache) with an on-device reduce + host fetch as
the barrier; a separately-measured empty-dispatch latency is subtracted
once per dispatch.

Slow metrics (header_proof) respect VX_BENCH_BUDGET_S (default 2700 s):
they are skipped if the budget is already spent, so the fast metrics
always land. VX_BENCH_SKIP_SLOW=1 skips them outright.
"""

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

T_START = time.time()
# Default sized to the driver's end-of-round window: round-2 ran with
# 5400 s and was killed mid-metric (BENCH_r02.json rc=124) — keep the
# whole run well under the window and guard slow metrics individually.
BUDGET_S = float(os.environ.get("VX_BENCH_BUDGET_S", "2400"))
SKIP_SLOW = os.environ.get("VX_BENCH_SKIP_SLOW") == "1"

ITERS = 4  # axon tunnel throughput drifts run-to-run (±2x observed); the
          # min over a few samples is a usable floor. r3 ran 8 and the
          # extra samples × cold compiles blew the driver window
          # (BENCH_r03 rc=124, 2/6 metrics) — cheap metrics must all land
          # before anything that compiles for minutes.

# estimated reference (rayon, 32 vCPU) throughputs — see module docstring
BASE_NTT_PTS_S = 1.0e8
BASE_POSEIDON_PERMS_S = 1.0e7
BASE_BLAKE2B_BYTES_S = 5.0e9      # ~0.8 GB/s/core hashing, imperfect scaling
BASE_HEADER_PROOF_S = 10.0        # ~1/8 of a plonky2x 8-header map proof


def emit(metric, value, unit, vs_baseline):
    print(json.dumps({
        "metric": metric,
        "value": round(float(value), 4),
        "unit": unit,
        "vs_baseline": round(float(vs_baseline), 4),
    }), flush=True)


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


def _time_dispatch(fn, args_fn, lat):
    """min over ITERS of (one fused dispatch) minus fixed latency."""
    times = []
    for i in range(ITERS):
        a = args_fn(i + 1)
        t0 = time.perf_counter()
        np.asarray(fn(*a))
        times.append(time.perf_counter() - t0)
    return max(min(times) - lat, 1e-9)


def bench_ntt(lat):
    from vectorx_tpu.poly import ntt as pntt
    LOG_N, BATCH, REPS = 20, 8, 8
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
    np.asarray(fwd(x, jnp.uint32(0)))
    dt = _time_dispatch(fwd, lambda i: (x, jnp.uint32(100 * i)), lat) / REPS
    pts = BATCH * n / dt
    emit(f"goldilocks_ntt_2e{LOG_N}_batch{BATCH}", pts, "points/s",
         pts / BASE_NTT_PTS_S)


def _bench_poseidon(permute, name, lat):
    from vectorx_tpu.field import goldilocks as gl
    # B=2^15 put only ~262k perms behind one dispatch — ~24 ms of work
    # against a ~33 ms tunnel latency, so the latency-estimate noise
    # dominated the measurement (driver artifacts r2-r4 floored at ~0.6x
    # baseline while in-process back-to-back peaks hit 11M/s). 2^17 puts
    # ~1M perms (≈100 ms) behind each dispatch; the Pallas kernel tiles
    # at 4096 rows so VMEM residency is unchanged.
    B, REPS = 1 << 17, 8
    rng = np.random.default_rng(1)
    s = (jnp.asarray(rng.integers(0, 1 << 32, (B, 12), dtype=np.uint32)),
         jnp.asarray(rng.integers(0, 1 << 31, (B, 12), dtype=np.uint32)))

    def chained(v, k0):
        def body(carry, k):
            lo, hi = carry
            return permute((lo ^ k, hi)), None
        out, _ = jax.lax.scan(
            body, v, k0 + jnp.arange(REPS, dtype=jnp.uint32))
        return out[0].sum() + out[1].sum()

    fwd = jax.jit(chained)
    np.asarray(fwd(s, jnp.uint32(0)))
    dt = _time_dispatch(fwd, lambda i: (s, jnp.uint32(77 * i)), lat) / REPS
    perms = B / dt
    emit(name, perms, "perms/s", perms / BASE_POSEIDON_PERMS_S)


def bench_poseidon(lat):
    """The portable XLA path (production dispatch prefers the Pallas
    kernel at this batch — pinned off here so both paths stay measured)."""
    from vectorx_tpu.hashes import poseidon as ps
    os.environ["VX_POSEIDON_PALLAS"] = "0"
    try:
        _bench_poseidon(ps.permute, "poseidon_perms_b131072", lat)
    finally:
        os.environ.pop("VX_POSEIDON_PALLAS", None)


def bench_poseidon_pallas(lat):
    from vectorx_tpu.ops import poseidon_pallas as pp
    _bench_poseidon(lambda s: pp.permute(s), "poseidon_pallas_perms_b131072",
                    lat)


def bench_blake2b(lat):
    from vectorx_tpu.hashes import blake2b as b2
    B, CHUNKS, REPS = 2048, 16, 4          # 2 KiB messages
    nbytes = B * CHUNKS * 128
    rng = np.random.default_rng(2)
    m_lo = jnp.asarray(rng.integers(0, 1 << 32, (B, CHUNKS, 16),
                                    dtype=np.uint32))
    m_hi = jnp.asarray(rng.integers(0, 1 << 32, (B, CHUNKS, 16),
                                    dtype=np.uint32))
    length = jnp.full((B,), CHUNKS * 128, jnp.uint32)

    def chained(lo, hi, k0):
        def body(carry, k):
            d_lo, _ = b2.blake2b256_variable(lo ^ k, hi, length)
            return carry + d_lo.sum(), None
        acc, _ = jax.lax.scan(
            body, jnp.uint32(0), k0 + jnp.arange(REPS, dtype=jnp.uint32))
        return acc

    fwd = jax.jit(chained)
    np.asarray(fwd(m_lo, m_hi, jnp.uint32(0)))
    dt = _time_dispatch(fwd, lambda i: (m_lo, m_hi, jnp.uint32(31 * i)),
                        lat) / REPS
    bps = nbytes / dt
    emit(f"blake2b256_bytes_b{B}x{CHUNKS * 128}", bps, "bytes/s",
         bps / BASE_BLAKE2B_BYTES_S)


def bench_header_proof(lat):
    """Warm single-header proof at production soundness (2 KiB header).

    Witnesses are prebuilt (host work, measured separately in
    PROD_SIZES.json); the timed quantity is prover.prove alone — inputs
    vary per iteration so the axon tunnel cannot serve a cached result.
    The metric is EMITTED before the (budget-guarded) verify so a slow
    host-side verify can never eat the driver window (BENCH_r02 rc=124)."""
    from vectorx_tpu.circuits import scale
    from vectorx_tpu.field import goldilocks as gl
    from vectorx_tpu.stark import air_header as ah
    from vectorx_tpu.stark import prover, verifier

    rng = np.random.default_rng(3)
    air = ah.HeaderAir(max_chunks=16)       # 2 KiB headers, 2048 rows
    log_n = air.n_rows.bit_length() - 1
    cfg = prover.StarkConfig(rate_bits=3, num_queries=28, final_poly_len=8,
                             pow_bits=prover.PRODUCTION_POW_BITS)

    def make_header(bn, size):
        parent = bytes(rng.integers(0, 256, 32, dtype=np.uint8))
        body = parent + scale.encode_compact_u32(bn)
        body += bytes(rng.integers(0, 256, size - len(body) - 32,
                                   dtype=np.uint8))
        return body + bytes(rng.integers(0, 256, 32, dtype=np.uint8))

    cases = []
    for i in range(3):
        trace, publics, _ = air.make_trace(make_header(1000 + i, 1990))
        cases.append((trace, [gl.to_fp(int(p)) for p in publics]))

    def prove_one(trace, pubs):
        proof = prover.prove(air, trace, pubs, cfg)
        # fetch one leaf to barrier the device work
        np.asarray(proof.trace_cap[0])
        return proof

    prove_one(*cases[0])                      # compile (cold)
    times = []
    for trace, pubs in cases:
        t0 = time.perf_counter()
        proof = prove_one(trace, pubs)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    emit("header_proof_2KiB_rate8_q28_pow16_warm", dt, "s",
         BASE_HEADER_PROOF_S / dt)
    # No post-emit verify: a multi-minute host-side verify after the last
    # metric is exactly what overran the driver window in rounds 2-4
    # (rc=124 with all metrics captured). Verification correctness is the
    # test suite's job; the bench's job is to exit 0.


def bench_subchain_scaling():
    """8-device vs 1-device sharded subchain wall-clock on a CPU mesh
    (subprocess per device count; honest about what a 2-core host can
    show — this validates the collective path, not chip scaling)."""
    code = r"""
import hashlib, sys, time
import numpy as np
import jax
import jax.numpy as jnp
from vectorx_tpu.parallel import subchain
from vectorx_tpu.circuits import scale
rng = np.random.default_rng(7)
trusted = bytes(rng.integers(0, 256, 32, dtype=np.uint8))
headers, parent = [], trusted
for bn in range(16):
    body = parent + scale.encode_compact_u32(1001 + bn)
    body += bytes(rng.integers(0, 256, 120 - len(body) - 32, dtype=np.uint8))
    h = body + bytes(rng.integers(0, 256, 32, dtype=np.uint8))
    parent = hashlib.blake2b(h, digest_size=32).digest()
    headers.append(h)
buf, sizes = subchain.pack_headers(headers, 16, max_header_size=256)
args = (jnp.asarray(buf), jnp.asarray(sizes), jnp.int32(len(headers)),
        jnp.asarray(np.frombuffer(trusted, np.uint8)), jnp.uint32(1000))
fn = jax.jit(subchain.verify_subchain)
res = fn(*args)   # compile + run
jax.block_until_ready(res.links_ok)
assert bool(res.links_ok) and bool(res.blocks_sequential)
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    res = fn(*args)
    jax.block_until_ready(res.links_ok)
    ts.append(time.perf_counter() - t0)
print(min(ts))
"""
    def run(ndev):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = "/root/repo"
        env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count={ndev}")
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, timeout=900)
        if out.returncode != 0:
            raise RuntimeError(out.stderr[-500:])
        return float(out.stdout.strip().splitlines()[-1])

    t1 = run(1)
    t8 = run(8)
    # Honest labeling (round-4 review): on this 2-core host an 8-device
    # mesh can only lose wall-clock to collective overhead — the number
    # validates that the sharded path runs, not chip scaling. Emit it as
    # an overhead probe with the caveat in the unit string.
    emit("subchain_8dev_over_1dev_wallclock_2core_host_probe", t1 / t8,
         "x wall-clock (collective-overhead probe on a 2-core CPU mesh; "
         "NOT chip scaling)", (t1 / t8) / 8.0)


def main():
    lat = _dispatch_latency()
    # Cheap metrics (seconds of compile each) run FIRST so a driver kill
    # mid-run still leaves a full set of kernel numbers; the two
    # compile-heavy metrics (ntt 2^20 scan, header_proof cold prover
    # compile) run last, each behind the budget guard. Three rounds of
    # rc=124 with 2/6 metrics captured is the failure mode this order
    # exists to prevent.
    benches = [
        ("poseidon", lambda: bench_poseidon(lat)),
        ("poseidon_pallas", lambda: bench_poseidon_pallas(lat)),
        ("blake2b", lambda: bench_blake2b(lat)),
        ("ntt", lambda: bench_ntt(lat)),
        ("subchain_scaling", bench_subchain_scaling),
        ("header_proof", lambda: bench_header_proof(lat)),
    ]
    for name, fn in benches:
        if name == "header_proof" and SKIP_SLOW:
            print(f"# skipped {name} (VX_BENCH_SKIP_SLOW)", file=sys.stderr)
            continue
        if time.time() - T_START > BUDGET_S:
            print(f"# skipped {name} (budget)", file=sys.stderr)
            continue
        if name == "header_proof" and time.time() - T_START > BUDGET_S * 0.5:
            # its cold compile alone can eat many minutes — don't start it
            # unless at least half the budget remains
            print(f"# skipped {name} (insufficient budget headroom)",
                  file=sys.stderr)
            continue
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — a failed metric must not
            print(f"# {name} failed: {e}", file=sys.stderr)   # kill the rest


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    sys.stderr.flush()
    # hard-exit: axon tunnel/atexit teardown must never be able to hang
    # the process past the driver window after the last metric printed
    os._exit(0)
