"""On-chip Poseidon exactness check (ADVICE r3 item 2): the Pallas
kernel's Mosaic lowering is only CI-covered under interpret=True; this
script runs the REAL kernel on the axon chip and bit-compares against the
host-side exact-int permutation for a few thousand random states,
including states biased into the lazy-overflow band [p, 2^64) where the
_add_lazy2 double-carry matters.

Run: python scripts/verify_poseidon_chip.py   (axon = one TPU v5e)
Exit 0 on exact match; prints the first mismatch otherwise.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp


def main():
    from vectorx_tpu.field import goldilocks as gl
    from vectorx_tpu.hashes import poseidon as ps
    from vectorx_tpu.ops import poseidon_pallas as pp

    P = gl.MODULUS
    rng = np.random.default_rng(42)
    # host-side exact-int oracle is the cost driver (~30ms/state pure
    # Python); 2048 states ≈ 1 min of one core — raise when the host is
    # otherwise idle
    B = int(os.environ.get("VX_VERIFY_B", "2048"))
    vals = rng.integers(0, P, (B, 12), dtype=np.uint64).astype(object)
    # bias some rows toward p-1 / near-2^32 boundaries (carry paths)
    for i in range(0, B, 17):
        vals[i] = [(P - 1 - int(rng.integers(0, 8))) % P for _ in range(12)]
    for i in range(1, B, 29):
        vals[i] = [int(rng.integers(0, 5)) * 0xFFFFFFFF % P
                   for _ in range(12)]

    lo = np.array([[int(v) & 0xFFFFFFFF for v in row] for row in vals],
                  dtype=np.uint32)
    hi = np.array([[int(v) >> 32 for v in row] for row in vals],
                  dtype=np.uint32)

    out = pp.permute((jnp.asarray(lo), jnp.asarray(hi)))
    got = (np.asarray(out[0]).astype(np.uint64)
           | (np.asarray(out[1]).astype(np.uint64) << 32))

    bad = 0
    for i in range(B):
        want = ps.permute_ints([int(v) for v in vals[i]])
        if [int(x) for x in got[i]] != [w % P for w in want]:
            print(f"MISMATCH row {i}:")
            print("  in  ", [int(v) for v in vals[i]])
            print("  got ", [int(x) for x in got[i]])
            print("  want", [w % P for w in want])
            bad += 1
            if bad > 3:
                sys.exit(1)
    if bad:
        sys.exit(1)
    print(f"OK: pallas permute == permute_ints on {B} random states "
          f"(incl. boundary-biased rows) on "
          f"{jnp.zeros(1).devices().pop().platform}")


if __name__ == "__main__":
    import jax
    main()
