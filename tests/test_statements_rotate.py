"""End-to-end rotate STARK bundle: epoch-end header + handoff."""

import hashlib

import numpy as np
import pytest

from cryptography.hazmat.primitives.asymmetric.ed25519 import Ed25519PrivateKey
from cryptography.hazmat.primitives import serialization

from vectorx_tpu.circuits import commitments, scale
from vectorx_tpu.stark import statements as st
from vectorx_tpu.stark.prover import StarkConfig

RNG = np.random.default_rng(41)

# minimal config: the default suite must stay runnable on the 2-core
# CPU mesh host; soundness-parameter coverage lives in the fast
# prover tests (test_stark/test_fri run rate 2+)
CFG = StarkConfig(rate_bits=1, num_queries=4, final_poly_len=4)

EPOCH_END_BLOCK = 180
N_CUR = 2          # current authorities (both sign: 2*3 > 2*2)
N_NEW = 2          # scheduled new authorities
SET_ID = 4
ROUND = 1
MAX_CHUNKS = 2


def _keys(n):
    ks = [Ed25519PrivateKey.generate() for _ in range(n)]
    pubs = [k.public_key().public_bytes(
        serialization.Encoding.Raw, serialization.PublicFormat.Raw)
        for k in ks]
    return ks, pubs


def make_epoch_end_header(block_number, new_pubkeys):
    """Synthetic SCALE header with a GRANDPA ScheduledChange consensus log."""
    parent = bytes(RNG.integers(0, 256, 32, dtype=np.uint8))
    state_root = bytes(RNG.integers(0, 256, 32, dtype=np.uint8))
    extrinsics_root = bytes(RNG.integers(0, 256, 32, dtype=np.uint8))
    data_root = bytes(RNG.integers(0, 256, 32, dtype=np.uint8))
    recs = b"".join(pk + b"\x01" + bytes(7) for pk in new_pubkeys)
    message = b"\x01" + scale.encode_compact_u32(len(new_pubkeys)) \
        + recs + bytes(4)
    log = b"\x04" + b"FRNK" + scale.encode_compact_u32(len(message)) + message
    digest = b"\x04" + log        # digest count prefix byte, then the item
    return (parent + scale.encode_compact_u32(block_number) + state_root
            + extrinsics_root + digest + data_root)


@pytest.fixture(scope="module")
def setup():
    cur_keys, cur_pubs = _keys(N_CUR)
    _, new_pubs = _keys(N_NEW)
    header = make_epoch_end_header(EPOCH_END_BLOCK, new_pubs)
    digest = hashlib.blake2b(header, digest_size=32).digest()
    msg = scale.encode_precommit_bytes(digest, EPOCH_END_BLOCK, ROUND, SET_ID)
    sigs = [k.sign(msg) for k in cur_keys]
    bundle = st.prove_rotate(
        EPOCH_END_BLOCK, header, cur_pubs, sigs, SET_ID, ROUND, CFG,
        max_chunks=MAX_CHUNKS, max_authorities=N_CUR)
    return dict(cur_pubs=cur_pubs, new_pubs=new_pubs, header=header,
                bundle=bundle)


def test_rotate_bundle_verifies(setup):
    new_hash = st.verify_rotate(
        setup["bundle"], SET_ID,
        commitments.authority_set_hash(setup["cur_pubs"]), CFG)
    assert new_hash == commitments.authority_set_hash(setup["new_pubs"])


def test_rotate_rejects_wrong_current_set(setup):
    with pytest.raises(st.VerificationError):
        st.verify_rotate(setup["bundle"], SET_ID,
                         hashlib.sha256(b"wrong").digest(), CFG)


def test_rotate_rejects_tampered_window(setup):
    import dataclasses
    b = setup["bundle"]
    w = bytearray(b.window)
    w[10] ^= 1                      # corrupt a claimed new-pubkey byte
    bad = dataclasses.replace(b, window=bytes(w))
    with pytest.raises(st.VerificationError):
        st.verify_rotate(bad, SET_ID,
                         commitments.authority_set_hash(setup["cur_pubs"]),
                         CFG)


def test_rotate_serialization_round_trip(setup):
    blob = st.serialize_rotate(setup["bundle"], CFG)
    back, cfg = st.deserialize_rotate(blob)
    assert cfg == CFG
    new_hash = st.verify_rotate(
        back, SET_ID, commitments.authority_set_hash(setup["cur_pubs"]), CFG)
    assert new_hash == commitments.authority_set_hash(setup["new_pubs"])


def test_rotate_rejects_wrong_epoch_block(setup):
    import dataclasses
    bad = dataclasses.replace(setup["bundle"],
                              epoch_end_block=EPOCH_END_BLOCK + 1)
    with pytest.raises(st.VerificationError):
        st.verify_rotate(bad, SET_ID,
                         commitments.authority_set_hash(setup["cur_pubs"]),
                         CFG)
