import hashlib

import numpy as np
import pytest

from vectorx_tpu.runtime import native

from oracle import P, gl_mul, gl_inv, ntt_naive

RNG = np.random.default_rng(15)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_gl_ops():
    for a, b in [(1, 1), (P - 1, P - 1), (0xFFFFFFFF, 0x100000000),
                 (123456789123456789, 987654321987654321)]:
        assert native.gl_mul(a, b) == gl_mul(a % P, b % P)
        assert native.gl_inv(a) == gl_inv(a % P)


def test_ntt_matches_oracle():
    from vectorx_tpu.field import goldilocks as gl
    for log_n in [3, 6, 10]:
        n = 1 << log_n
        v = [int(x) % P for x in RNG.integers(0, 1 << 64, n, dtype=np.uint64)]
        root = gl.primitive_root_of_unity(log_n)
        got = native.ntt(v, root)
        assert [int(x) for x in got] == ntt_naive(v, root)
        back = native.ntt(got, root, inverse=True)
        assert [int(x) for x in back] == v


def test_poseidon_matches_python():
    from vectorx_tpu.hashes import poseidon as ps
    states = RNG.integers(0, P, size=(4, 12), dtype=np.uint64)
    got = native.poseidon_permute(states.copy())
    for i in range(4):
        want = ps.permute_ints([int(x) for x in states[i]])
        assert [int(x) for x in got[i]] == want


def test_hashes_match_hashlib():
    for n in [0, 1, 53, 127, 128, 129, 1000]:
        msg = bytes(RNG.integers(0, 256, n, dtype=np.uint8))
        assert native.blake2b256(msg) == hashlib.blake2b(msg, digest_size=32).digest()
        assert native.sha256(msg) == hashlib.sha256(msg).digest()


def test_blake2b_batch():
    msgs = np.zeros((3, 256), np.uint8)
    lens = np.array([10, 128, 200], np.uint32)
    raw = [bytes(RNG.integers(0, 256, int(l), dtype=np.uint8)) for l in lens]
    for i, r in enumerate(raw):
        msgs[i, :len(r)] = np.frombuffer(r, np.uint8)
    out = native.blake2b256_batch(msgs, lens)
    for i, r in enumerate(raw):
        assert bytes(out[i]) == hashlib.blake2b(r, digest_size=32).digest()
