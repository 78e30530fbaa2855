import numpy as np
import jax

from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.poly import ntt as pntt

from oracle import P, ntt_naive

RNG = np.random.default_rng(2)


def rand_vec(n):
    return [int(x) % P for x in RNG.integers(0, 1 << 64, size=n, dtype=np.uint64)]


def test_ntt_matches_naive():
    for log_n in [0, 1, 2, 3, 4, 6]:
        n = 1 << log_n
        v = rand_vec(n)
        root = gl.primitive_root_of_unity(log_n)
        want = ntt_naive(v, root)
        got = gl.from_fp(pntt.ntt(gl.to_fp([v])))
        assert [int(x) for x in got[0]] == want, f"n={n}"


def test_ntt_round_trip():
    for log_n in [1, 3, 5, 8]:
        n = 1 << log_n
        v = rand_vec(n)
        fp = gl.to_fp([v])
        back = gl.from_fp(pntt.intt(pntt.ntt(fp)))
        assert [int(x) for x in back[0]] == v, f"n={n}"


def test_ntt_batch_and_jit():
    vs = [rand_vec(16) for _ in range(3)]
    fp = gl.to_fp(vs)
    j = jax.jit(pntt.ntt)(fp)
    nj = pntt.ntt(fp)
    assert np.array_equal(np.asarray(j[0]), np.asarray(nj[0]))
    root = gl.primitive_root_of_unity(4)
    got = gl.from_fp(j)
    for i, v in enumerate(vs):
        assert [int(x) for x in got[i]] == ntt_naive(v, root)


def test_coset_lde_extends_evaluations():
    # degree < n poly: LDE evals must equal direct evaluation on shifted coset
    log_n, rate_bits = 3, 2
    n = 1 << log_n
    coeffs = rand_vec(n)
    root = gl.primitive_root_of_unity(log_n)
    evals = ntt_naive(coeffs, root)

    lde = gl.from_fp(pntt.coset_lde(gl.to_fp([evals]), rate_bits))
    n_ext = n << rate_bits
    big_root = gl.primitive_root_of_unity(log_n + rate_bits)
    g = gl.MULTIPLICATIVE_GROUP_GENERATOR
    for k in range(n_ext):
        x = (g * pow(big_root, k, P)) % P
        direct = sum(c * pow(x, i, P) for i, c in enumerate(coeffs)) % P
        assert int(lde[0][k]) == direct, k


def test_eval_poly_at():
    coeffs = rand_vec(8)
    pt = 0xDEADBEEF12345678 % P
    got = gl.from_fp(pntt.eval_poly_at(gl.to_fp([coeffs]), gl.to_fp([pt])))
    want = sum(c * pow(pt, i, P) for i, c in enumerate(coeffs)) % P
    assert int(got[0]) == want


def test_mxu_batch_tiling_matches_butterfly():
    """Batches wider than NTT_BATCH_TILE stream through lax.map tiles —
    bit-exact vs the butterfly path (the untiled einsum OOMed one v5e on
    ~3000-column AIR LDEs; see ntt_mxu.NTT_BATCH_TILE)."""
    import numpy as np
    import jax.numpy as jnp
    from vectorx_tpu.poly import ntt as pntt
    from vectorx_tpu.poly.ntt_mxu import NTT_BATCH_TILE, ntt_mxu

    rng = np.random.default_rng(17)
    b = NTT_BATCH_TILE + 9          # forces 2 tiles + padding
    x = gl.to_fp(rng.integers(0, gl.MODULUS, (b, 32),
                              dtype=np.uint64).astype(object))
    assert bool(jnp.all(gl.eq(pntt._ntt_butterfly(x), ntt_mxu(x))))
    assert bool(jnp.all(gl.eq(pntt._ntt_butterfly(x, inverse=True),
                              ntt_mxu(x, inverse=True))))
