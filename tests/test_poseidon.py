import numpy as np
import jax

from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.hashes import poseidon as ps

from oracle import P

RNG = np.random.default_rng(1)


def rand_state(batch):
    return [[int(x) % P for x in RNG.integers(0, 1 << 64, size=ps.WIDTH, dtype=np.uint64)]
            for _ in range(batch)]


def test_constants_sane():
    rc = ps.round_constants()
    assert len(rc) == ps.N_ROUNDS and all(len(r) == ps.WIDTH for r in rc)
    flat = [c for r in rc for c in r]
    assert all(0 <= c < P for c in flat)
    assert len(set(flat)) == len(flat)  # no repeats (overwhelmingly likely)

    m = ps.mds_matrix()
    # power-of-two circulant: exhaustively MDS-verified offline
    # (scripts/verify_mds.py, all 2.7M square submatrices); here re-check
    # every minor up to 3x3 as a fast regression guard on the row values
    import itertools
    for k in (1, 2, 3):
        for rs in itertools.combinations(range(12), k):
            for cs in itertools.combinations(range(12), k):
                sub = [[m[r][c] for c in cs] for r in rs]
                if k == 1:
                    det = sub[0][0]
                elif k == 2:
                    det = sub[0][0] * sub[1][1] - sub[0][1] * sub[1][0]
                else:
                    det = (sub[0][0] * (sub[1][1] * sub[2][2] - sub[1][2] * sub[2][1])
                           - sub[0][1] * (sub[1][0] * sub[2][2] - sub[1][2] * sub[2][0])
                           + sub[0][2] * (sub[1][0] * sub[2][1] - sub[1][1] * sub[2][0]))
                assert det % P != 0, (rs, cs)


def test_permutation_matches_oracle():
    states = rand_state(5) + [[0] * 12, [1] * 12, [P - 1] * 12]
    lo = gl.to_fp(states)
    got = ps.permute(lo)
    vals = [[int(v) for v in row] for row in gl.from_fp(got)]
    for i, s in enumerate(states):
        assert vals[i] == ps.permute_ints(s), f"state {i}"


def test_permutation_jit_and_batch_shapes():
    states = rand_state(4)
    fp = gl.to_fp(states)
    j = jax.jit(ps.permute)(fp)
    nj = ps.permute(fp)
    assert np.array_equal(np.asarray(j[0]), np.asarray(nj[0]))
    assert np.array_equal(np.asarray(j[1]), np.asarray(nj[1]))


def test_hash_two_to_one():
    l = [1, 2, 3, 4]
    r = [5, 6, 7, 8]
    want = ps.hash_two_to_one_ints(l, r)
    got = ps.hash_two_to_one(gl.to_fp([l]), gl.to_fp([r]))
    vals = [[int(v) for v in row] for row in gl.from_fp(got)]
    assert vals[0] == want


def test_hash_many_matches_oracle():
    for n in [1, 4, 8, 9, 16, 23]:
        ints = [int(x) % P for x in RNG.integers(0, 1 << 64, size=n, dtype=np.uint64)]
        want = ps.hash_ints(ints)
        got = ps.hash_many(gl.to_fp([ints]))
        vals = [[int(v) for v in row] for row in gl.from_fp(got)]
        assert vals[0] == want, n


def test_diffusion():
    # single-bit input change flips the whole digest (sanity, not a proof)
    a = [0] * 12
    b = [1] + [0] * 11
    da = ps.permute_ints(a)
    db = ps.permute_ints(b)
    assert all(x != y for x, y in zip(da, db))


def test_fast_partial_factorization_exact():
    """The Appendix-B sparse factorization (fast_partial_ints — what the
    Pallas kernel executes) is EXACTLY the standard permutation."""
    rng = np.random.default_rng(77)
    for _ in range(8):
        s = [int(x) for x in rng.integers(0, P, 12, dtype=np.uint64)]
        assert ps.permute_ints_fast(s) == ps.permute_ints(s)
