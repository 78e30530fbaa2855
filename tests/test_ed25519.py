import hashlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cryptography.hazmat.primitives.asymmetric.ed25519 import Ed25519PrivateKey
from cryptography.hazmat.primitives import serialization

from vectorx_tpu.circuits import ed25519 as ed
from vectorx_tpu.field import field25519 as fe

RNG = np.random.default_rng(9)
MSG = bytes(range(53))  # precommit-sized message


def make_sigs(n, msg=MSG):
    pks, rs, ss = [], [], []
    for _ in range(n):
        sk = Ed25519PrivateKey.generate()
        pk = sk.public_key().public_bytes(
            serialization.Encoding.Raw, serialization.PublicFormat.Raw)
        sig = sk.sign(msg)
        pks.append(pk)
        rs.append(sig[:32])
        ss.append(sig[32:])
    return pks, rs, ss


def to_arr(lst):
    return jnp.asarray(np.stack([np.frombuffer(b, dtype=np.uint8) for b in lst]))


class TestCurveOps:
    def test_base_point_on_curve(self):
        # -x^2 + y^2 = 1 + d x^2 y^2
        x, y = ed._BX, ed._BY
        P = ed.P
        assert (-x * x + y * y) % P == (1 + ed.D_CONST * x * x * y * y) % P

    def test_decompress_base(self):
        enc = (ed._BY | ((ed._BX & 1) << 255)).to_bytes(32, "little")
        pt, ok = ed.decompress(to_arr([enc]))
        assert bool(ok[0])
        assert int(fe.from_limbs(pt.x)[0]) == ed._BX
        assert int(fe.from_limbs(pt.y)[0]) == ed._BY

    def test_scalar_mul_matches_reference(self):
        # [k]B for a few k, vs python integer implementation
        def ref_scalar_mul(k):
            # simple affine double-and-add using python ints
            P = ed.P
            d = ed.D_CONST

            def add(p, q):
                (x1, y1), (x2, y2) = p, q
                x3 = (x1 * y2 + x2 * y1) * pow(1 + d * x1 * x2 * y1 * y2, P - 2, P)
                y3 = (y1 * y2 + x1 * x2) * pow(1 - d * x1 * x2 * y1 * y2, P - 2, P)
                return x3 % P, y3 % P

            acc = (0, 1)
            base = (ed._BX, ed._BY)
            while k:
                if k & 1:
                    acc = add(acc, base)
                base = add(base, base)
                k >>= 1
            return acc

        for k in [1, 2, 7, (1 << 252) + 12345]:
            kb = np.frombuffer(int(k).to_bytes(32, "little"), np.uint8)
            bits = ed.bytes_to_bits_le(jnp.asarray(kb)[None])
            got = ed.scalar_mul(ed.base_point((1,)), bits)
            zinv = pow(int(fe.from_limbs(got.z)[0]), ed.P - 2, ed.P)
            gx = int(fe.from_limbs(got.x)[0]) * zinv % ed.P
            gy = int(fe.from_limbs(got.y)[0]) * zinv % ed.P
            assert (gx, gy) == ref_scalar_mul(k), k


class TestVerify:
    def test_valid_signatures(self):
        n = 4
        pks, rs, ss = make_sigs(n)
        h = ed.compute_challenges(rs, pks, MSG)
        ok = ed.verify_batch(to_arr(pks), to_arr(rs), to_arr(ss),
                             jnp.asarray(h), jnp.ones((n,), bool))
        assert bool(jnp.all(ok))

    def test_invalid_signature_rejected(self):
        pks, rs, ss = make_sigs(2)
        bad_s = bytearray(ss[0])
        bad_s[0] ^= 1
        ss[0] = bytes(bad_s)
        h = ed.compute_challenges(rs, pks, MSG)
        ok = ed.verify_batch(to_arr(pks), to_arr(rs), to_arr(ss),
                             jnp.asarray(h), jnp.ones((2,), bool))
        assert not bool(ok[0])
        assert bool(ok[1])

    def test_wrong_message_rejected(self):
        pks, rs, ss = make_sigs(1)
        h = ed.compute_challenges(rs, pks, b"\x00" * 53)
        ok = ed.verify_batch(to_arr(pks), to_arr(rs), to_arr(ss),
                             jnp.asarray(h), jnp.ones((1,), bool))
        assert not bool(ok[0])

    def test_disabled_lane_passes(self):
        # dummy signature on a disabled lane must report True
        pks, rs, ss = make_sigs(1)
        garbage = [bytes(32)]
        h = ed.compute_challenges(garbage, garbage, MSG)
        ok = ed.verify_batch(to_arr(garbage), to_arr(garbage), to_arr(garbage),
                             jnp.asarray(h), jnp.zeros((1,), bool))
        assert bool(ok[0])


class TestSha512:
    def test_against_hashlib(self):
        from vectorx_tpu.hashes import sha512 as s512
        msgs = [b"", b"abc", b"x" * 111, b"x" * 112, b"x" * 128, b"y" * 300,
                bytes(RNG.integers(0, 256, 117, dtype=np.uint8))]
        got = s512.sha512_bytes(msgs)
        for g, m in zip(got, msgs):
            assert g == hashlib.sha512(m).digest(), len(m)


def test_sc_reduce512_matches_int_oracle():
    import numpy as np
    import jax.numpy as jnp
    from vectorx_tpu.field import scalar25519 as sc

    rng = np.random.default_rng(7)
    raw = rng.integers(0, 256, (16, 64), dtype=np.uint8)
    # boundary cases: all 0xFF, exactly L, L-1, 2^252
    raw[0] = 0xFF
    raw[1, :] = 0
    raw[1, :32] = np.frombuffer(sc.L_ORDER.to_bytes(32, "little"), np.uint8)
    raw[2, :] = 0
    raw[2, :32] = np.frombuffer((sc.L_ORDER - 1).to_bytes(32, "little"),
                                np.uint8)
    raw[3, :] = 0
    raw[3, 31] = 0x10  # 2^252
    out = np.asarray(sc.sc_reduce512(jnp.asarray(raw)))
    for i in range(16):
        v = int.from_bytes(raw[i].tobytes(), "little") % sc.L_ORDER
        got = int.from_bytes(out[i].tobytes(), "little")
        assert got == v, i
