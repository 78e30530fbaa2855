import numpy as np
import jax

from vectorx_tpu.field import field25519 as f25

P = f25.P25519
RNG = np.random.default_rng(8)

EDGE = [0, 1, 2, P - 1, P - 2, (1 << 255) - 20, (1 << 254), 19, 38,
        (1 << 128) - 1, (1 << 128), 0xFFFF, 0x10000]


def rand(n):
    return [int.from_bytes(RNG.bytes(32), "little") % P for _ in range(n)]


def pairs():
    a = EDGE + rand(40)
    b = list(reversed(a))
    return a, b


def test_roundtrip():
    a, _ = pairs()
    assert [int(v) for v in f25.from_limbs(f25.to_limbs(a))] == [x % P for x in a]


def test_add_sub_mul():
    a, b = pairs()
    la, lb = f25.to_limbs(a), f25.to_limbs(b)
    got_add = [int(v) for v in f25.from_limbs(jax.jit(f25.add)(la, lb))]
    got_sub = [int(v) for v in f25.from_limbs(jax.jit(f25.sub)(la, lb))]
    got_mul = [int(v) for v in f25.from_limbs(jax.jit(f25.mul)(la, lb))]
    for i, (x, y) in enumerate(zip(a, b)):
        assert got_add[i] == (x + y) % P, ("add", i)
        assert got_sub[i] == (x - y) % P, ("sub", i)
        assert got_mul[i] == (x * y) % P, ("mul", i)


def test_mul_small():
    a, _ = pairs()
    la = f25.to_limbs(a)
    got = [int(v) for v in f25.from_limbs(f25.mul_small(la, 121666))]
    assert got == [(x * 121666) % P for x in a]


def test_inv():
    a = [x for x in EDGE + rand(10) if x % P != 0]
    la = f25.to_limbs(a)
    got = [int(v) for v in f25.from_limbs(jax.jit(f25.inv)(la))]
    assert got == [pow(x, P - 2, P) for x in a]


def test_pow_p58():
    a = rand(5)
    la = f25.to_limbs(a)
    got = [int(v) for v in f25.from_limbs(jax.jit(f25.pow_p58)(la))]
    assert got == [pow(x, (P - 5) // 8, P) for x in a]
