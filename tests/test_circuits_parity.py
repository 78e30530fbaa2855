"""Parity tests against the reference's hermetic golden vectors.

Golden data sources (data values only, pinned by the reference's own CI):
- compact-int cases: /root/reference/circuits/builder/decoder.rs:238-249
- precommit vector: decoder.rs:388-395
"""

import hashlib

import numpy as np
import jax.numpy as jnp

from vectorx_tpu.circuits import scale, commitments, consts

RNG = np.random.default_rng(5)

# (value, expected mode) — decoder.rs:238-249
COMPACT_CASES = [
    (0, 0), (1, 0), (63, 0), (64, 1), (16383, 1), (16384, 2),
    (1073741823, 2), (1073741824, 3), (4294967295, 3),
]

# decoder.rs:388-395
GOLDEN_PRECOMMIT = bytes([
    1, 38, 27, 45, 113, 196, 242, 16, 36, 228, 137, 117, 93, 79, 157, 136,
    222, 239, 71, 241, 37, 152, 13, 194, 159, 190, 169, 38, 234, 124, 89,
    223, 233, 161, 217, 4, 0, 75, 58, 0, 0, 0, 0, 0, 0, 42, 1, 0, 0, 0, 0,
    0, 0,
])
GOLDEN_PRECOMMIT_BLOCK = 317857
GOLDEN_PRECOMMIT_SET_ID = 298


class TestCompactInt:
    def test_host_round_trip(self):
        for v, mode in COMPACT_CASES:
            enc = scale.encode_compact_u32(v)
            dec, m, length = scale.decode_compact_u32(enc + b"\x00" * 5)
            assert (dec, m) == (v, mode), v
            assert length == len(enc)

    def test_vectorized_matches(self):
        bufs = []
        for v, _ in COMPACT_CASES:
            enc = scale.encode_compact_u32(v)
            bufs.append(np.frombuffer(enc.ljust(5, b"\x00"), dtype=np.uint8))
        out = scale.decode_compact_u32_vec(jnp.asarray(np.stack(bufs)))
        for i, (v, mode) in enumerate(COMPACT_CASES):
            assert int(out.value[i]) == v
            assert int(out.mode[i]) == mode


class TestPrecommit:
    def test_host_golden(self):
        bh, bn, rnd, sid = scale.decode_precommit_bytes(GOLDEN_PRECOMMIT)
        assert bn == GOLDEN_PRECOMMIT_BLOCK
        assert sid == GOLDEN_PRECOMMIT_SET_ID
        # re-encode round trip
        assert scale.encode_precommit_bytes(bh, bn, rnd, sid) == GOLDEN_PRECOMMIT

    def test_vectorized_golden(self):
        p = jnp.asarray(np.frombuffer(GOLDEN_PRECOMMIT, dtype=np.uint8))[None]
        out = scale.decode_precommit_vec(p)
        assert bool(out.valid[0])
        assert int(out.block_number[0]) == GOLDEN_PRECOMMIT_BLOCK
        set_id = int(out.authority_set_id[0][0]) | (int(out.authority_set_id[1][0]) << 32)
        assert set_id == GOLDEN_PRECOMMIT_SET_ID


class TestHeaderDecode:
    def _make_header(self, block_number, size=300):
        parent = bytes(RNG.integers(0, 256, 32, dtype=np.uint8))
        state_root = bytes(RNG.integers(0, 256, 32, dtype=np.uint8))
        data_root = bytes(RNG.integers(0, 256, 32, dtype=np.uint8))
        body = parent + scale.encode_compact_u32(block_number) + state_root
        filler = bytes(RNG.integers(0, 256, size - len(body) - 32, dtype=np.uint8))
        hdr = body + filler + data_root
        return hdr, dict(parent_hash=parent, block_number=block_number,
                         state_root=state_root, data_root=data_root)

    def test_host_and_vec(self):
        S = 512
        headers, wants, sizes = [], [], []
        for bn in [0, 63, 64, 16383, 16384, 1073741823, 1073741824, 4294967295]:
            hdr, want = self._make_header(bn)
            got = scale.decode_header_bytes(hdr)
            for k in want:
                assert got[k] == want[k], (bn, k)
            headers.append(np.frombuffer(hdr.ljust(S, b"\x00"), dtype=np.uint8))
            sizes.append(len(hdr))
            wants.append(want)

        out = scale.decode_header_vec(jnp.asarray(np.stack(headers)),
                                      jnp.asarray(np.array(sizes, np.int32)))
        for i, want in enumerate(wants):
            assert int(out.block_number[i]) == want["block_number"]
            assert bytes(np.asarray(out.parent_hash[i])) == want["parent_hash"]
            assert bytes(np.asarray(out.state_root[i])) == want["state_root"]
            assert bytes(np.asarray(out.data_root[i])) == want["data_root"]


class TestCommitments:
    def test_authority_set_hash_host(self):
        pks = [bytes(RNG.integers(0, 256, 32, dtype=np.uint8)) for _ in range(5)]
        h = b""
        for pk in pks:
            h = hashlib.sha256(h + pk).digest()
        assert commitments.authority_set_hash(pks) == h

    def test_authority_set_hash_vec_matches_host(self):
        n = 16
        pks = [bytes(RNG.integers(0, 256, 32, dtype=np.uint8)) for _ in range(n)]
        arr = jnp.asarray(np.stack([np.frombuffer(p, dtype=np.uint8) for p in pks]))
        for active in [1, 3, n]:
            got_words = commitments.authority_set_hash_vec(arr, jnp.int32(active))
            got = b"".join(int(w).to_bytes(4, "big") for w in np.asarray(got_words))
            assert got == commitments.authority_set_hash(pks[:active]), active

    def test_simple_merkle_root_host_vs_vec(self):
        for n in [1, 2, 4, 8, 16]:
            leaves = [bytes(RNG.integers(0, 256, 32, dtype=np.uint8)) for _ in range(n)]
            want = commitments.simple_merkle_root(leaves)
            arr = jnp.asarray(np.stack([np.frombuffer(l, dtype=np.uint8) for l in leaves]))
            words = commitments._bytes32_to_words(arr)
            got_words = commitments.simple_merkle_root_vec(words)
            got = bytes(np.asarray(commitments._words_to_bytes32(got_words)))
            assert got == want, n

    def test_merkle_pads_to_pow2(self):
        leaves = [bytes([i] * 32) for i in range(1, 6)]  # 5 leaves -> pad to 8
        want = commitments.simple_merkle_root(leaves)
        manual = leaves + [b"\x00" * 32] * 3
        lvl = [hashlib.sha256(manual[2 * i] + manual[2 * i + 1]).digest() for i in range(4)]
        lvl = [hashlib.sha256(lvl[0] + lvl[1]).digest(), hashlib.sha256(lvl[2] + lvl[3]).digest()]
        assert want == hashlib.sha256(lvl[0] + lvl[1]).digest()

    def test_range_commitments(self):
        sr = [bytes(RNG.integers(0, 256, 32, dtype=np.uint8)) for _ in range(5)]
        dr = [bytes(RNG.integers(0, 256, 32, dtype=np.uint8)) for _ in range(5)]
        s, d = commitments.range_commitments(sr, dr, 8)
        assert s == commitments.simple_merkle_root(sr + [b"\x00" * 32] * 3)
        assert d == commitments.simple_merkle_root(dr + [b"\x00" * 32] * 3)
