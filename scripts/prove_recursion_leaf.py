"""Recursion phase 5 on the chip: a REAL HeaderAir proof verified inside
a RecursionAir proof (VERDICT r3 item 1's leaf milestone).

Pipeline:
  1. prove a real 1-chunk Avail-style header through HeaderAir at a
     recursion-friendly inner config (rate 2^10 x 9 queries x 16 grinding
     bits ~ 106-bit conjectured; LDE 2^17 x 799 cols — needs the tiled
     Merkle commit);
  2. record the streamed outer machine (transcript-replay binding +
     value-RAM spilling, ~2^19 rows x ~730 committed cols, K ~ 691);
  3. prove the outer machine on the chip (rate 2 x 84 queries x 16
     grinding bits ~ 100-bit) and verify it with the STANDARD verifier
     against the claim-shape rebuild (outer_air_for) — plus a tampered-
     publics rejection.

Writes PROD_SIZES.json row `recursion_leaf_header1`.
Run: python scripts/prove_recursion_leaf.py     (axon = one TPU v5e)
"""

import json
import os
import sys
import time

# big-machine memory mode: host-accumulated tiled LDE (no device-side
# concat double-buffer) + lazy per-column next-row rolls (no second
# full-LDE copy in the quotient phase)
os.environ.setdefault("VX_LDE_HOST_ACC", "1")
os.environ.setdefault("VX_LAZY_ROLL", "1")
# round-5 OOM fix: row-windowed quotient constraint evaluation — the
# fused phase's full-LDE constraint temps were the round-4 OOM
# (leaf4_r4.log: 18.62 GB needed vs 15.75 GB). 2^16-row windows bound
# them at 1/16 with one extra gather of the resident LDEs per block.
os.environ.setdefault("VX_QUOT_ROWTILE", "32768")
# round-5 attempt-3: memory-lean openings (no full stacked concatenate;
# per-part barycentric, tiled) + tighter DEEP deviation tile
os.environ.setdefault("VX_OPEN_SPLIT", "1")
os.environ.setdefault("VX_DEEP_TILE", "64")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_JSON = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "PROD_SIZES.json")

import numpy as np


def main():
    from vectorx_tpu.circuits import scale
    from vectorx_tpu.field import goldilocks as gl
    from vectorx_tpu.stark import air_header as ah
    from vectorx_tpu.stark import prover, verifier
    from vectorx_tpu.stark import recursion_air as ra

    rng = np.random.default_rng(21)
    air_h = ah.HeaderAir(max_chunks=1)
    inner_cfg = prover.StarkConfig(rate_bits=10, num_queries=9,
                                   final_poly_len=32,
                                   pow_bits=prover.PRODUCTION_POW_BITS)
    outer_cfg = prover.StarkConfig(rate_bits=1, num_queries=84,
                                   final_poly_len=8,
                                   pow_bits=prover.PRODUCTION_POW_BITS)

    parent = bytes(rng.integers(0, 256, 32, dtype=np.uint8))
    body = parent + scale.encode_compact_u32(123456)
    body += bytes(rng.integers(0, 256, 120 - len(body) - 32,
                               dtype=np.uint8))
    hdr = body + bytes(rng.integers(0, 256, 32, dtype=np.uint8))

    # inner-proof checkpoint: reruns of the OUTER phases (the part still
    # being tuned) skip the ~16-min inner prove + verify
    from vectorx_tpu.stark.checkpoint import Checkpoint
    cp = Checkpoint(os.environ.get("VX_LEAF_CKPT",
                                   "/root/repo/.leaf_ckpt"))
    t0 = time.time()
    hit = cp.load("leaf-inner", inner_cfg, (hdr,), air_h)
    if hit is not None:
        proof, publics = hit
        pubs_fp = [gl.to_fp(int(p)) for p in publics]
        print(f"inner header proof: checkpoint hit", flush=True)
    else:
        trace, publics, _ = air_h.make_trace(hdr)
        pubs_fp = [gl.to_fp(int(p)) for p in publics]
        proof = prover.prove(air_h, trace, pubs_fp, inner_cfg)
        np.asarray(proof.trace_cap[0])
        t_inner = time.time() - t0
        print(f"inner header proof: {t_inner:.1f}s", flush=True)
        assert bool(verifier.verify(air_h, proof, pubs_fp, 7, inner_cfg))
        print("inner verifies", flush=True)
        cp.store("leaf-inner", inner_cfg, (hdr,), proof,
                 [int(x) for x in publics])
    t_inner = time.time() - t0

    t0 = time.time()
    stats = {}
    mb = ra.MachineBuilder()
    cells = [mb.pin_public(v) for v in ra._pub_ints(publics)]
    ra.record_stark_verify(mb, air_h, proof, cells, 7, inner_cfg,
                           stream=True, stats=stats)
    oair = ra.RecursionAir(mb)
    t_rec = time.time() - t0
    print(f"record: {t_rec:.1f}s rows={len(mb.rows)} pow2={oair.n_rows} "
          f"K={oair.K} cols={oair.num_cols}+{oair.num_consts}", flush=True)

    t0 = time.time()
    # witness cache: the outer trace is deterministic given the recorded
    # schedule + inner proof (both checkpointed), so reruns skip the
    # ~10-min make_trace; kept HOST-resident through the heavy LDE +
    # quotient phases (VX_LDE_HOST_ACC uploads tile-wise; the opening
    # phase re-uploads tiled via VX_OPEN_SPLIT) — the resident device
    # copy was ~20% of HBM during the round-4/5 OOMs
    wit_dir = os.environ.get("VX_LEAF_CKPT", "/root/repo/.leaf_ckpt")
    wit_key = str(oair.schedule_digest())[:16]
    wlo = os.path.join(wit_dir, f"otrace_{wit_key}_lo.npy")
    whi = os.path.join(wit_dir, f"otrace_{wit_key}_hi.npy")
    wpu = os.path.join(wit_dir, f"opubs_{wit_key}.json")
    if os.path.exists(wlo) and os.path.exists(whi) and os.path.exists(wpu):
        otrace = (np.load(wlo), np.load(whi))
        with open(wpu) as f:
            opubs = [int(x) for x in json.load(f)]
        print("outer witness: cache hit", flush=True)
    else:
        otrace, opubs = oair.make_trace()
        otrace = (np.asarray(otrace[0]), np.asarray(otrace[1]))
        os.makedirs(wit_dir, exist_ok=True)
        np.save(wlo, otrace[0])
        np.save(whi, otrace[1])
        with open(wpu, "w") as f:
            json.dump([int(x) for x in opubs], f)
    opubs_fp = [gl.to_fp(p) for p in opubs]
    t_wit = time.time() - t0
    print(f"outer witness: {t_wit:.1f}s (host-resident)", flush=True)

    t0 = time.time()
    oproof = prover.prove(oair, otrace, opubs_fp, outer_cfg)
    np.asarray(oproof.trace_cap[0])
    t_cold = time.time() - t0
    print(f"outer prove (cold): {t_cold:.1f}s", flush=True)

    olog = oair.n_rows.bit_length() - 1
    t0 = time.time()
    vair = ra.outer_air_for(air_h, 7, inner_cfg, len(publics), stream=True)
    t_rebuild = time.time() - t0
    assert vair.schedule_digest() == oair.schedule_digest()
    t0 = time.time()
    ok = bool(verifier.verify(vair, oproof, opubs_fp, olog, outer_cfg))
    t_ver = time.time() - t0
    print(f"outer verify: {ok} {t_ver:.1f}s (claim rebuild "
          f"{t_rebuild:.1f}s)", flush=True)
    assert ok
    bad = list(opubs)
    bad[0] = (bad[0] + 1) % gl.MODULUS
    assert not bool(verifier.verify(
        vair, oproof, [gl.to_fp(p) for p in bad], olog, outer_cfg))
    print("tampered inner publics rejected", flush=True)

    out = {}
    if os.path.exists(_JSON):
        with open(_JSON) as f:
            out = json.load(f)
    out["recursion_leaf_header1"] = dict(
        inner_rows=air_h.n_rows, inner_cols=air_h.num_cols,
        inner_rate_bits=inner_cfg.rate_bits,
        inner_queries=inner_cfg.num_queries,
        outer_rows=oair.n_rows, outer_K=oair.K,
        outer_cols=oair.num_cols, outer_consts=oair.num_consts,
        outer_rate_bits=outer_cfg.rate_bits,
        outer_queries=outer_cfg.num_queries,
        inner_prove_s=round(t_inner, 1), record_s=round(t_rec, 1),
        witness_s=round(t_wit, 1), outer_prove_cold_s=round(t_cold, 1),
        outer_verify_s=round(t_ver, 1))
    with open(_JSON, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["recursion_leaf_header1"]), flush=True)


if __name__ == "__main__":
    main()
