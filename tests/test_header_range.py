"""End-to-end witness-level pipeline tests: header_range + rotate."""

import hashlib

import numpy as np
import jax
import jax.numpy as jnp

from cryptography.hazmat.primitives.asymmetric.ed25519 import Ed25519PrivateKey
from cryptography.hazmat.primitives import serialization

from vectorx_tpu.circuits import (commitments, header_range as hr,
                                  justification as just, rotate as rot, scale)
from vectorx_tpu.parallel import subchain
from vectorx_tpu.services import indexer

from test_subchain import make_chain, words_to_bytes

RNG = np.random.default_rng(13)

MAX_N = 8  # max authorities in tests
TREE = 8
S = 512


def make_authorities(n):
    keys = [Ed25519PrivateKey.generate() for _ in range(n)]
    pubs = [k.public_key().public_bytes(
        serialization.Encoding.Raw, serialization.PublicFormat.Raw) for k in keys]
    return keys, pubs


def make_justification_data(keys, pubs, block_hash, block_number, set_id,
                            n_sign=None):
    n = len(keys)
    n_sign = n if n_sign is None else n_sign
    msg = scale.encode_precommit_bytes(block_hash, block_number, 1, set_id)
    sigs, signed = [], []
    for i, k in enumerate(keys):
        if i < n_sign:
            sigs.append(k.sign(msg).hex())
            signed.append(True)
        else:
            sigs.append(bytes(64).hex())
            signed.append(False)
    return just.prepare_justification(
        [p.hex() for p in pubs], sigs, signed, n, msg, MAX_N)


def test_header_range_end_to_end():
    trusted_block = 1000
    n_headers = 5
    trusted_hash = bytes(RNG.integers(0, 256, 32, dtype=np.uint8))
    headers, metas, target_hash = make_chain(trusted_hash, trusted_block, n_headers)
    buf, sizes = subchain.pack_headers(headers, TREE, max_header_size=S)

    keys, pubs = make_authorities(4)
    set_id = 77
    jd = make_justification_data(keys, pubs, target_hash,
                                 trusted_block + n_headers, set_id)
    set_hash = commitments.authority_set_hash(pubs)

    res = jax.jit(hr.header_range)(
        jnp.uint32(trusted_block),
        jnp.asarray(np.frombuffer(trusted_hash, np.uint8)),
        (jnp.uint32(set_id), jnp.uint32(0)),
        jnp.asarray(np.frombuffer(set_hash, np.uint8)),
        jnp.uint32(trusted_block + n_headers),
        jnp.asarray(buf), jnp.asarray(sizes), jd)

    assert bool(res.ok)
    assert bytes(np.asarray(res.target_header_hash)) == target_hash
    ws, wd = commitments.range_commitments(
        [m["state_root"] for m in metas], [m["data_root"] for m in metas], TREE)
    assert bytes(np.asarray(res.state_root_commitment)) == ws
    assert bytes(np.asarray(res.data_root_commitment)) == wd


def test_header_range_rejects_minority_justification():
    trusted_block = 50
    n_headers = 3
    trusted_hash = bytes(32)
    headers, _, target_hash = make_chain(trusted_hash, trusted_block, n_headers)
    buf, sizes = subchain.pack_headers(headers, TREE, max_header_size=S)

    keys, pubs = make_authorities(6)
    jd = make_justification_data(keys, pubs, target_hash, trusted_block + n_headers,
                                 9, n_sign=4)  # 4 <= 2/3*6 -> fail
    set_hash = commitments.authority_set_hash(pubs)

    res = jax.jit(hr.header_range)(
        jnp.uint32(trusted_block), jnp.asarray(np.frombuffer(trusted_hash, np.uint8)),
        (jnp.uint32(9), jnp.uint32(0)),
        jnp.asarray(np.frombuffer(set_hash, np.uint8)),
        jnp.uint32(trusted_block + n_headers),
        jnp.asarray(buf), jnp.asarray(sizes), jd)
    assert not bool(res.ok)


def test_header_range_rejects_wrong_set_hash():
    trusted_block = 50
    n_headers = 3
    trusted_hash = bytes(32)
    headers, _, target_hash = make_chain(trusted_hash, trusted_block, n_headers)
    buf, sizes = subchain.pack_headers(headers, TREE, max_header_size=S)
    keys, pubs = make_authorities(4)
    jd = make_justification_data(keys, pubs, target_hash, trusted_block + n_headers, 9)
    wrong_hash = bytes(32)
    res = jax.jit(hr.header_range)(
        jnp.uint32(trusted_block), jnp.asarray(np.frombuffer(trusted_hash, np.uint8)),
        (jnp.uint32(9), jnp.uint32(0)),
        jnp.asarray(np.frombuffer(wrong_hash, np.uint8)),
        jnp.uint32(trusted_block + n_headers),
        jnp.asarray(buf), jnp.asarray(sizes), jd)
    assert not bool(res.ok)


def _make_epoch_end_header(new_pubs, size=S - 64):
    """Header whose digest contains a GRANDPA ScheduledChange for new_pubs."""
    n = len(new_pubs)
    validators = b"".join(p + b"\x01" + b"\x00" * 7 for p in new_pubs)
    sched = b"\x01" + scale.encode_compact_u32(n) + validators + b"\x00" * 4
    log = b"\x04" + b"FRNK" + scale.encode_compact_u32(len(sched)) + sched

    parent = bytes(RNG.integers(0, 256, 32, dtype=np.uint8))
    state_root = bytes(RNG.integers(0, 256, 32, dtype=np.uint8))
    data_root = bytes(RNG.integers(0, 256, 32, dtype=np.uint8))
    body = parent + scale.encode_compact_u32(123) + state_root
    prefix_filler = bytes(RNG.integers(0, 256, 40, dtype=np.uint8))
    start_position = len(body) + len(prefix_filler)  # byte BEFORE the 0x04
    hdr = body + prefix_filler + b"\x00" + log       # 0x00 is the pre-byte
    filler2 = bytes(RNG.integers(0, 256, size - len(hdr) - 32, dtype=np.uint8))
    hdr = hdr + filler2 + data_root
    return hdr, start_position


def test_find_scheduled_change_and_verify_epoch_end():
    _, new_pubs = make_authorities(5)
    hdr, start_pos = _make_epoch_end_header(new_pubs)

    found = rot.find_scheduled_change(hdr)
    assert found is not None
    pos, n_auth, pubkeys = found
    assert pos == start_pos
    assert n_auth == 5
    assert pubkeys == list(new_pubs)

    pk = np.zeros((MAX_N, 32), np.uint8)
    for i, p in enumerate(new_pubs):
        pk[i] = np.frombuffer(p, np.uint8)
    hb = np.zeros((S,), np.uint8)
    hb[:len(hdr)] = np.frombuffer(hdr, np.uint8)

    ok = jax.jit(rot.verify_epoch_end_header)(
        jnp.asarray(hb), jnp.int32(5), jnp.int32(start_pos), jnp.asarray(pk))
    assert bool(ok)

    # tampered weight byte must fail
    hb2 = hb.copy()
    weight_off = hdr.index(new_pubs[0]) + 32  # first validator's weight
    hb2[weight_off] ^= 1
    ok2 = jax.jit(rot.verify_epoch_end_header)(
        jnp.asarray(hb2), jnp.int32(5), jnp.int32(start_pos), jnp.asarray(pk))
    assert not bool(ok2)


def test_rotate_end_to_end():
    cur_keys, cur_pubs = make_authorities(4)
    _, new_pubs = make_authorities(5)
    hdr, start_pos = _make_epoch_end_header(new_pubs)
    target_hash = hashlib.blake2b(hdr, digest_size=32).digest()

    epoch_end_block = 4321
    set_id = 10
    jd = make_justification_data(cur_keys, cur_pubs, target_hash,
                                 epoch_end_block, set_id)
    cur_set_hash = commitments.authority_set_hash(cur_pubs)

    pk = np.zeros((MAX_N, 32), np.uint8)
    for i, p in enumerate(new_pubs):
        pk[i] = np.frombuffer(p, np.uint8)
    hb = np.zeros((S,), np.uint8)
    hb[:len(hdr)] = np.frombuffer(hdr, np.uint8)

    res = jax.jit(hr.rotate)(
        (jnp.uint32(set_id), jnp.uint32(0)),
        jnp.asarray(np.frombuffer(cur_set_hash, np.uint8)),
        jnp.uint32(epoch_end_block),
        jnp.asarray(hb), jnp.int32(len(hdr)),
        jnp.int32(5), jnp.int32(start_pos), jnp.asarray(pk), jd)

    assert bool(res.ok)
    assert bytes(np.asarray(res.new_authority_set_hash)) == \
        commitments.authority_set_hash(new_pubs)
