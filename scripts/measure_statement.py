"""Production-soundness header_range measurement on the real chip
(VERDICT round-2 item 4): one full prove_header_range at rate 4 / 42
queries / 16 grinding bits with 300 authorities — the memory-lean
production parameterization (~same ~100-bit conjectured soundness as
rate 8 x 28; README soundness table) — turning BASELINE.md's derived
estimate into a measured number.

Defaults: tree_size 8, 8 small headers, 300 authorities (the reference's
test proves 300 auth x 256 headers, header_range.rs:228-277 — same
soundness, smaller tree; scale by headers/tree for the full figure),
ed_B 13 (32 sigs/shard -> 10 Ed25519 + 10 SHA-512 shard proofs).

Run: python scripts/measure_statement.py        (axon = one TPU v5e)
Env: VX_MS_AUTH (default 300), VX_MS_HEADERS (8), VX_MS_EDB (13).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

N_AUTH = int(os.environ.get("VX_MS_AUTH", "300"))
N_HEADERS = int(os.environ.get("VX_MS_HEADERS", "8"))
ED_B = int(os.environ.get("VX_MS_EDB", "13"))


def main():
    import hashlib

    from cryptography.hazmat.primitives.asymmetric.ed25519 import (
        Ed25519PrivateKey)
    from cryptography.hazmat.primitives import serialization

    from vectorx_tpu.circuits import scale
    from vectorx_tpu.stark import statements as st
    from vectorx_tpu.stark.prover import (StarkConfig,
                                          PRODUCTION_POW_BITS)

    # memory-lean production parameterization (rate 4 x 42 queries + 16
    # grinding bits ~ same ~100-bit conjectured soundness as rate 8 x 28;
    # README soundness table) — the 300-auth chain AIR is a 2^17-row
    # trace, and rate 4 keeps its LDE at 2^19
    cfg = StarkConfig(rate_bits=2, num_queries=42, final_poly_len=8,
                      pow_bits=PRODUCTION_POW_BITS)
    rng = np.random.default_rng(17)
    trusted_block = 1000
    tree = N_HEADERS

    # synthetic but structurally valid chain (120-byte headers, 1 chunk:
    # HeaderAir requires 65 <= len <= 128*chunks - 4)
    headers = []
    parent = bytes(rng.integers(0, 256, 32, dtype=np.uint8))
    trusted_hash = parent
    for i in range(N_HEADERS):
        bn = trusted_block + 1 + i
        body = parent + scale.encode_compact_u32(bn)
        body += bytes(rng.integers(0, 256,
                                   120 - len(body) - 32, dtype=np.uint8))
        hdr = body + bytes(rng.integers(0, 256, 32, dtype=np.uint8))
        headers.append(hdr)
        parent = hashlib.blake2b(hdr, digest_size=32).digest()
    target_hash = parent
    target_block = trusted_block + N_HEADERS

    keys = [Ed25519PrivateKey.generate() for _ in range(N_AUTH)]
    auths = [k.public_key().public_bytes(
        serialization.Encoding.Raw, serialization.PublicFormat.Raw)
        for k in keys]
    round_, set_id = 1, 7
    msg = scale.encode_precommit_bytes(target_hash, target_block,
                                       round_, set_id)
    t0 = time.time()
    sigs = [k.sign(msg) for k in keys]
    t_sign = time.time() - t0
    print(f"signed {N_AUTH} lanes in {t_sign:.1f}s", flush=True)

    t0 = time.time()
    bundle = st.prove_header_range(
        trusted_block, target_block, headers, auths, sigs, set_id, round_,
        cfg, tree_size=tree, max_chunks=1, max_authorities=N_AUTH,
        ed_B=ED_B)
    t_prove = time.time() - t0
    print(f"prove_header_range: {t_prove:.1f}s", flush=True)

    from vectorx_tpu.circuits.commitments import authority_set_hash
    t0 = time.time()
    st.verify_header_range(bundle, trusted_block, trusted_hash, set_id,
                           authority_set_hash(auths), target_block, cfg)
    t_verify = time.time() - t0
    print(f"verify_header_range: {t_verify:.1f}s", flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROD_SIZES.json")
    out = {}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    out[f"header_range_{N_HEADERS}_prod"] = dict(
        tree_size=tree, n_headers=N_HEADERS, n_auth=N_AUTH, ed_B=ED_B,
        rate_bits=cfg.rate_bits, queries=cfg.num_queries,
        pow_bits=cfg.pow_bits,
        sign_s=round(t_sign, 1), prove_s=round(t_prove, 1),
        verify_s=round(t_verify, 1),
        n_sig_shards=len(bundle.sig_proofs),
        n_sha512_shards=len(bundle.sha512_proofs))
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out[f"header_range_{N_HEADERS}_prod"]), flush=True)


if __name__ == "__main__":
    main()
