import hashlib

import numpy as np
import jax.numpy as jnp

from vectorx_tpu.hashes import sha256 as s2
from vectorx_tpu.hashes import blake2b as b2

RNG = np.random.default_rng(4)


class TestSha256:
    def test_against_hashlib(self):
        msgs = [
            b"", b"abc", b"a" * 55, b"a" * 56, b"a" * 63, b"a" * 64,
            b"a" * 65, bytes(RNG.integers(0, 256, size=200, dtype=np.uint8)),
        ]
        for m in msgs:
            blocks = jnp.asarray(s2.pad_message(m))[None]
            got = s2.digest_to_bytes(np.asarray(s2.sha256_blocks(blocks))[0])
            assert got == hashlib.sha256(m).digest(), m[:16]

    def test_batched(self):
        msgs = [bytes(RNG.integers(0, 256, size=64, dtype=np.uint8)) for _ in range(10)]
        digests = s2.sha256_bytes(msgs)
        for i, m in enumerate(msgs):
            assert bytes(digests[i]) == hashlib.sha256(m).digest()

    def test_variable_blocks(self):
        # same padded buffer size, different active block counts
        max_blocks = 4
        msgs = [b"x" * 10, b"y" * 100, b"z" * 150]
        bufs, counts = [], []
        for m in msgs:
            pm = s2.pad_message(m)
            n = pm.shape[0]
            pad = np.zeros((max_blocks - n, 16), np.uint32)
            bufs.append(np.concatenate([pm, pad]))
            counts.append(n)
        out = s2.sha256_variable(jnp.asarray(np.stack(bufs)),
                                 jnp.asarray(np.array(counts, np.int32)))
        for i, m in enumerate(msgs):
            assert s2.digest_to_bytes(np.asarray(out)[i]) == hashlib.sha256(m).digest()


class TestBlake2b:
    def test_against_hashlib(self):
        msgs = [
            b"", b"abc", b"a" * 127, b"a" * 128, b"a" * 129, b"a" * 256,
            bytes(RNG.integers(0, 256, size=1000, dtype=np.uint8)),
        ]
        got = b2.blake2b256_bytes(msgs, max_chunks=9)
        for g, m in zip(got, msgs):
            assert g == hashlib.blake2b(m, digest_size=32).digest(), (len(m), g.hex())

    def test_avail_like_header_sizes(self):
        # variable lengths inside one big padded batch, like header hashing
        msgs = [bytes(RNG.integers(0, 256, size=int(n), dtype=np.uint8))
                for n in [1, 53, 500, 1337, 4096]]
        got = b2.blake2b256_bytes(msgs, max_chunks=40)
        for g, m in zip(got, msgs):
            assert g == hashlib.blake2b(m, digest_size=32).digest(), len(m)
