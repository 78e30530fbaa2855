import numpy as np
import pytest

from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.field import ext

from oracle import P, gl_add, gl_sub, gl_mul, gl_inv, fp2_mul, fp2_inv

RNG = np.random.default_rng(0)

# Adversarial values around every boundary.
EDGE = [
    0, 1, 2, 0xFFFFFFFF, 0x100000000, 0xFFFFFFFF00000000,
    P - 1, P - 2, (1 << 63), (1 << 63) - 1, 0x123456789ABCDEF0,
    0xFFFFFFFE, 0x1FFFFFFFE, P // 2, P // 2 + 1,
]


def rand_elems(n):
    return [int(x) % P for x in RNG.integers(0, 1 << 64, size=n, dtype=np.uint64)]


def pairs():
    vals = EDGE + rand_elems(200)
    a = [v % P for v in vals]
    b = list(reversed(a))
    return a, b


class TestBaseField:
    def test_roundtrip(self):
        a, _ = pairs()
        fa = gl.to_fp(a)
        back = gl.from_fp(fa)
        assert [int(x) for x in back] == a

    def test_add(self):
        a, b = pairs()
        got = gl.from_fp(gl.add(gl.to_fp(a), gl.to_fp(b)))
        want = [gl_add(x, y) for x, y in zip(a, b)]
        assert [int(x) for x in got] == want

    def test_sub(self):
        a, b = pairs()
        got = gl.from_fp(gl.sub(gl.to_fp(a), gl.to_fp(b)))
        want = [gl_sub(x, y) for x, y in zip(a, b)]
        assert [int(x) for x in got] == want

    def test_mul(self):
        a, b = pairs()
        got = gl.from_fp(gl.mul(gl.to_fp(a), gl.to_fp(b)))
        want = [gl_mul(x, y) for x, y in zip(a, b)]
        assert [int(x) for x in got] == want

    def test_mul_exhaustive_edges(self):
        # all pairs of edge values
        a = [x % P for x in EDGE for _ in EDGE]
        b = [y % P for _ in EDGE for y in EDGE]
        got = gl.from_fp(gl.mul(gl.to_fp(a), gl.to_fp(b)))
        want = [gl_mul(x, y) for x, y in zip(a, b)]
        assert [int(x) for x in got] == want

    def test_neg(self):
        a, _ = pairs()
        got = gl.from_fp(gl.neg(gl.to_fp(a)))
        want = [(-x) % P for x in a]
        assert [int(x) for x in got] == want

    def test_inv(self):
        a = [x for x in EDGE + rand_elems(20) if x % P != 0]
        got = gl.from_fp(gl.inv(gl.to_fp(a)))
        want = [gl_inv(x % P) for x in a]
        assert [int(x) for x in got] == want

    def test_pow(self):
        a = rand_elems(8)
        for e in [0, 1, 2, 7, 1 << 32, P - 2]:
            got = gl.from_fp(gl.pow_const(gl.to_fp(a), e))
            want = [pow(x, e, P) for x in a]
            assert [int(x) for x in got] == want, e

    def test_roots_of_unity(self):
        for log_n in [0, 1, 2, 10, 32]:
            w = gl.primitive_root_of_unity(log_n)
            assert pow(w, 1 << log_n, P) == 1
            if log_n > 0:
                assert pow(w, 1 << (log_n - 1), P) == P - 1  # == -1

    def test_select_eq_iszero(self):
        a = gl.to_fp([0, 1, P - 1])
        b = gl.to_fp([5, 1, 0])
        assert list(np.asarray(gl.is_zero(a))) == [True, False, False]
        assert list(np.asarray(gl.eq(a, b))) == [False, True, False]
        m = np.asarray([True, False, True])
        sel = gl.from_fp(gl.select(m, a, b))
        assert [int(x) for x in sel] == [0, 1, P - 1]


class TestExtField:
    def test_mul(self):
        a, b = pairs()
        n = len(a) // 2
        xs = list(zip(a[:n], a[n:2 * n]))
        ys = list(zip(b[:n], b[n:2 * n]))
        fx = ext.to_fp2(xs)
        fy = ext.to_fp2(ys)
        got = ext.mul(fx, fy)
        gre = [int(v) for v in gl.from_fp(got[0])]
        gim = [int(v) for v in gl.from_fp(got[1])]
        want = [fp2_mul(x, y) for x, y in zip(xs, ys)]
        assert gre == [w[0] for w in want]
        assert gim == [w[1] for w in want]

    def test_inv(self):
        xs = [(3, 4), (1, 0), (0, 1), (P - 1, P - 2), (12345, 67890)]
        fx = ext.to_fp2(xs)
        got = ext.inv(fx)
        gre = [int(v) for v in gl.from_fp(got[0])]
        gim = [int(v) for v in gl.from_fp(got[1])]
        want = [fp2_inv(x) for x in xs]
        assert gre == [w[0] for w in want]
        assert gim == [w[1] for w in want]

    def test_mul_inv_is_one(self):
        xs = [(3, 4), (999, 1), (P - 5, 17)]
        fx = ext.to_fp2(xs)
        prod = ext.mul(fx, ext.inv(fx))
        assert [int(v) for v in gl.from_fp(prod[0])] == [1, 1, 1]
        assert [int(v) for v in gl.from_fp(prod[1])] == [0, 0, 0]

    def test_w_is_nonresidue(self):
        # X^2 - 7 irreducible <=> 7 is a quadratic non-residue mod p
        assert pow(7, (P - 1) // 2, P) == P - 1
