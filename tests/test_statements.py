"""End-to-end header_range STARK bundle: every sub-proof + cross links."""

import hashlib

import numpy as np
import pytest

from cryptography.hazmat.primitives.asymmetric.ed25519 import Ed25519PrivateKey
from cryptography.hazmat.primitives import serialization

from vectorx_tpu.circuits import commitments, scale
from vectorx_tpu.stark import statements as st
from vectorx_tpu.stark.prover import StarkConfig

from test_subchain import make_chain

RNG = np.random.default_rng(31)

# minimal config: the default suite must stay runnable on the 2-core
# CPU mesh host; soundness-parameter coverage lives in the fast
# prover tests (test_stark/test_fri run rate 2+)
CFG = StarkConfig(rate_bits=1, num_queries=4, final_poly_len=4)

TRUSTED_BLOCK = 128
N_HEADERS = 2
TREE = 2
MAX_CHUNKS = 2
N_AUTH = 2   # both sign: 2*3 > 2*2 satisfies the threshold
SET_ID = 11
ROUND = 1


@pytest.fixture(scope="module")
def setup():
    trusted_hash = bytes(RNG.integers(0, 256, 32, dtype=np.uint8))
    headers, metas, target_hash = make_chain(
        trusted_hash, TRUSTED_BLOCK, N_HEADERS, size=150)

    keys = [Ed25519PrivateKey.generate() for _ in range(N_AUTH)]
    pubs = [k.public_key().public_bytes(
        serialization.Encoding.Raw, serialization.PublicFormat.Raw)
        for k in keys]
    msg = scale.encode_precommit_bytes(
        target_hash, TRUSTED_BLOCK + N_HEADERS, ROUND, SET_ID)
    sigs = [k.sign(msg) for k in keys]

    # procs=2: the header map proofs run in two WORKER PROCESSES and
    # return through the checkpoint store (parallel/map_worker — the
    # reference's platform-dispatch seam, bin/vectorx.rs:122-130); the
    # rest of the bundle proves in-process as before.
    import tempfile
    with tempfile.TemporaryDirectory(prefix="vx_ckpt_") as ckpt:
        bundle = st.prove_header_range(
            TRUSTED_BLOCK, TRUSTED_BLOCK + N_HEADERS, headers, pubs, sigs,
            SET_ID, ROUND, CFG,
            tree_size=TREE, max_chunks=MAX_CHUNKS, max_authorities=N_AUTH,
            checkpoint=ckpt, procs=2)
    return dict(trusted_hash=trusted_hash, headers=headers, metas=metas,
                target_hash=target_hash, pubs=pubs, bundle=bundle)


def _verify(s, bundle=None):
    return st.verify_header_range(
        bundle or s["bundle"], TRUSTED_BLOCK, s["trusted_hash"], SET_ID,
        commitments.authority_set_hash(s["pubs"]),
        TRUSTED_BLOCK + N_HEADERS, CFG)


def test_bundle_verifies_and_matches_reference_outputs(setup):
    target_hash, state_c, data_c = _verify(setup)
    assert target_hash == setup["target_hash"]
    ws, wd = commitments.range_commitments(
        [m["state_root"] for m in setup["metas"]],
        [m["data_root"] for m in setup["metas"]], TREE)
    assert state_c == ws
    assert data_c == wd


def test_bundle_rejects_broken_chain_link(setup):
    import dataclasses
    b = setup["bundle"]
    bad_pub = [list(p) for p in b.header_publics]
    # claim a different parent hash for header 1 (γs honestly re-derived)
    from vectorx_tpu.stark import air_header as ah
    bad_pub[1][ah.P_PARENT] = (bad_pub[1][ah.P_PARENT] + 1) % (1 << 32)
    bad_pub[1][ah.P_G1], bad_pub[1][ah.P_G2] = ah.derive_gammas(
        bad_pub[1][:ah.P_G1])
    bad = dataclasses.replace(b, header_publics=bad_pub)
    with pytest.raises(st.VerificationError):
        _verify(setup, bad)


def test_bundle_rejects_wrong_target_block(setup):
    with pytest.raises(st.VerificationError):
        st.verify_header_range(
            setup["bundle"], TRUSTED_BLOCK, setup["trusted_hash"], SET_ID,
            commitments.authority_set_hash(setup["pubs"]),
            TRUSTED_BLOCK + N_HEADERS + 1, CFG)


def test_bundle_rejects_wrong_authority_set(setup):
    with pytest.raises(st.VerificationError):
        st.verify_header_range(
            setup["bundle"], TRUSTED_BLOCK, setup["trusted_hash"], SET_ID,
            hashlib.sha256(b"not the set").digest(),
            TRUSTED_BLOCK + N_HEADERS, CFG)


def test_bundle_rejects_forged_merkle_leaf(setup):
    import dataclasses
    b = setup["bundle"]
    pub = [int(p) for p in b.state_merkle_publics]
    pub[0] = (pub[0] + 1) % (1 << 32)
    bad = dataclasses.replace(b, state_merkle_publics=pub)
    with pytest.raises(st.VerificationError):
        _verify(setup, bad)


def test_bundle_serialization_round_trip(setup):
    blob = st.serialize_header_range(setup["bundle"], CFG)
    back, cfg = st.deserialize_header_range(blob)
    assert cfg == CFG
    target_hash, state_c, data_c = _verify(setup, back)
    assert target_hash == setup["target_hash"]


def test_bundle_rejects_unsigned_majority(setup):
    import dataclasses
    b = setup["bundle"]
    # flip one lane to unsigned: 1*3 is not > 2*2 -> threshold fails
    # (and the lane no longer matches its dummy claim either)
    bad = dataclasses.replace(b, signed=[True, False])
    with pytest.raises(st.VerificationError):
        _verify(setup, bad)
