"""AIR (algebraic intermediate representation) interface for the STARK.

An AIR defines a trace layout plus constraint polynomials over (local_row,
next_row, publics). The same constraint code runs in two rings:

- ``BaseVecAlgebra``: base-field vectors over the whole LDE domain (prover —
  every constraint evaluates on all N_lde points at once, pure VPU work);
- ``ExtAlgebra``:     GF(p^2) scalars at the out-of-domain point ζ (verifier
  ALI consistency check).

This is the TPU-native counterpart of the reference stack's builder DSL +
constraint system (plonky2x ``CircuitBuilder`` ops, SURVEY.md L5): instead
of routing individual gates, constraints are dense tensor expressions XLA
can fuse.

Transition constraints hold on rows 0..N-2 (divisor (x^N-1)/(x-g^{N-1})),
``first``/``last`` boundary constraints at row 0 / N-1 (divisors x-1,
x-g^{N-1}).
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax.numpy as jnp

from ..field import goldilocks as gl
from ..field import ext


class BaseVecAlgebra:
    """Elements: Fp arrays of a fixed shape (the LDE domain)."""

    def __init__(self, shape):
        self.shape = shape

    def add(self, a, b):
        return gl.add(a, b)

    def sub(self, a, b):
        return gl.sub(a, b)

    def mul(self, a, b):
        return gl.mul(a, b)

    def constant(self, c: int):
        return gl.full(self.shape, c % gl.MODULUS)

    def lift(self, scalar: gl.Fp):
        """Broadcast a scalar Fp (shape ()) into the domain shape."""
        return (jnp.broadcast_to(scalar[0], self.shape),
                jnp.broadcast_to(scalar[1], self.shape))

    def one(self):
        return self.constant(1)

    def zero(self):
        return self.constant(0)


class ExtAlgebra:
    """Elements: Fp2 scalars (shape-() components)."""

    def add(self, a, b):
        return ext.add(a, b)

    def sub(self, a, b):
        return ext.sub(a, b)

    def mul(self, a, b):
        return ext.mul(a, b)

    def constant(self, c: int):
        return ext.from_base(gl.full((), c % gl.MODULUS))

    def lift(self, scalar: gl.Fp):
        return ext.from_base(scalar)

    def one(self):
        return self.constant(1)

    def zero(self):
        return self.constant(0)


class GX(list):
    """A GROUP of scalar machine cells (XCells) — the MachineBuilder-ring
    counterpart of a leading group axis on tensor ring elements
    (recursion_air.XAlgMB). Lives here so AIR constraint helpers can be
    ring-generic without importing the recursion machinery."""


def is_group_cells(e) -> bool:
    return isinstance(e, GX)


def stack_group(elems):
    """Stack ring elements along a leading group axis: jnp.stack for
    tensor rings, GX list for the machine ring (XCells = int tuples)."""
    elems = list(elems)
    e0 = elems[0]
    if isinstance(e0, GX):
        # group-of-groups: flatten in stack order (matches tensor
        # semantics only for callers that immediately reduce; none today)
        raise TypeError("stack_group over GX groups is not supported")
    import numpy as _np
    if (isinstance(e0, tuple) and len(e0) == 2
            and isinstance(e0[0], (int, _np.integer))):
        return GX(elems)
    import jax
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *elems)


def roll_group(e, k: int):
    """Circular roll along the group axis (jnp.roll semantics: element i
    of the result is element i-k of the input)."""
    if isinstance(e, GX):
        m = len(e)
        k %= m
        return GX(e[m - k:] + e[:m - k])
    import jax
    return jax.tree_util.tree_map(lambda x: jnp.roll(x, k, axis=0), e)


def slice_group(e, a: int, b: int):
    if isinstance(e, GX):
        return GX(list(e)[a:b])
    import jax
    return jax.tree_util.tree_map(lambda x: x[a:b], e)


def index_group(e, i: int):
    """Single element of a group (a scalar ring element)."""
    if isinstance(e, GX):
        return e[i]
    import jax
    return jax.tree_util.tree_map(lambda x: x[i], e)


def sum_group(e, alg=None):
    """Σ over the group axis -> scalar ring element. The machine ring
    needs `alg` (cells add via emitted rows)."""
    if isinstance(e, GX):
        acc = e[0]
        for x in e[1:]:
            acc = alg.add(acc, x)
        return acc
    if isinstance(e[0], tuple):   # ext ring: ((lo,hi),(lo,hi))
        return (gl.sum_mod(e[0], axis=0), gl.sum_mod(e[1], axis=0))
    return gl.sum_mod(e, axis=0)


class Air:
    """Subclass and define the trace + constraints.

    Conventions:
    - ``local``/``next_row`` are lists of ring elements, one per column.
    - ``publics`` is a list of Fp scalars (shape ()); use ``alg.lift``.
    - ``consts``/``consts_next`` are lists of ring elements for the AIR's
      *public constant columns* (``constant_columns``): known to both
      sides, interpolated over the trace domain, NOT committed — the
      verifier evaluates them itself (selector/round-constant polynomials,
      e.g. the SHA-256 round constants).
    - every constraint must have total degree <= max_constraint_degree.
    """

    num_cols: int = 0
    max_constraint_degree: int = 3

    def phase_cache_key(self):
        """Key for sharing compiled prover/verifier phase programs ACROSS
        AIR instances — None (default) keeps per-instance caches.

        Override to a (type, shape...) tuple ONLY when every per-instance
        difference flows through `constant_columns`/`make_trace` (i.e.
        the constraint CODE depends solely on the shape parameters): the
        first instance's traced program is then reused for all. Shard
        AIRs (Ed25519VerifyAir, Sha512ChallengeAir) qualify — a 10-shard
        production prove otherwise pays ~10x the one-time compile."""
        return None

    def ram_multiset(self):
        """None, or (mult_cidx, load_cidx, addr_cidx, active_cidx,
        val_col) declaring a pair-multiset memory argument over the
        trace (phase-5 value RAM, stark/RECURSION.md):

            Σ_stores mult(r)/(γ − addr(r) − δ·val(r))
                == Σ_loads 1/(γ − addr(r) − δ·val(r))

        mult (store multiplicity: how many loads that store serves —
        STATIC, 0 legal), load (0/1) and active (0/1: store-or-load row)
        are CONSTANT-column flags, addr a CONSTANT column, val a
        COMMITTED column. γ, δ are squeezed after the trace commitment
        (the only sound ordering for a multiset over free witness
        cells), so a value may be re-witnessed at any later row: every
        load is forced to replay some store. Adds 4 aux base columns
        (inv re/im, running-sum re/im) to the LogUp aux commitment."""
        return None

    def lookup_range_columns(self) -> List[int]:
        """Trace column indices range-checked to [0, n_rows) via LogUp.

        The table is the row ramp 0..n_rows-1 (so a 2^16-row trace gives
        exactly 16-bit range checks — the form the reference's starkyx
        gadgets use for limb arithmetic). Aux columns (inverses, running
        sum, multiplicities) are built by the prover after the trace
        commitment and a dedicated challenge γ; see prover.py.
        """
        return []

    def constant_columns(self, n_rows: int):
        """-> (k, n_rows) numpy int array (possibly k = 0)."""
        import numpy as np
        return np.zeros((0, n_rows), dtype=np.uint64)

    def transition(self, alg, local: List, next_row: List, publics: List,
                   consts: List = (), consts_next: List = ()) -> List:
        return []

    def transition_iter(self, alg, local: List, next_row: List,
                        publics: List, consts: List = (),
                        consts_next: List = ()):
        """Streaming form: yield the SAME constraints in the SAME order as
        ``transition``. Consumers that fold constraints incrementally (the
        recursion recorder — stark/RECURSION.md phase 5) use this; wide
        AIRs override it with a true generator so no more than one
        constraint's cells are live at a time. Default: delegate (no
        liveness benefit, full compatibility)."""
        yield from self.transition(alg, local, next_row, publics, consts,
                                   consts_next)

    def first_row(self, alg, local: List, publics: List,
                  consts: List = ()) -> List:
        return []

    def last_row(self, alg, local: List, publics: List,
                 consts: List = ()) -> List:
        return []

    def num_constraints(self) -> int:
        """Total constraint count (transition + first + last)."""
        import numpy as np
        alg = ExtAlgebra()
        dummy = [alg.zero() for _ in range(self.num_cols)]
        k = self.constant_columns(2).shape[0]
        dc = [alg.zero() for _ in range(k)]
        pubs = [gl.zeros(()) for _ in range(getattr(self, "num_publics", 0))]
        return (len(self.transition(alg, dummy, dummy, pubs, dc, dc))
                + len(self.first_row(alg, dummy, pubs, dc))
                + len(self.last_row(alg, dummy, pubs, dc)))


def check_constraints(air: Air, trace, publics) -> bool:
    """Evaluate every constraint directly on the trace domain (no LDE, no
    commitment) — the cheap satisfiability oracle used by machine-building
    code and tamper tests. Transition constraints must vanish on rows
    0..N-2, first/last on their rows. Grouped tensor constraints supported.
    """
    import numpy as np
    n = trace[0].shape[1]
    alg = BaseVecAlgebra((n,))
    local = [(trace[0][c], trace[1][c]) for c in range(air.num_cols)]
    nxt = [(jnp.roll(trace[0][c], -1), jnp.roll(trace[1][c], -1))
           for c in range(air.num_cols)]
    cvals = np.asarray(air.constant_columns(n), dtype=np.object_)
    if cvals.shape[0]:
        cfp = gl.to_fp(cvals)
        consts = [(cfp[0][i], cfp[1][i]) for i in range(cvals.shape[0])]
        consts_next = [(jnp.roll(cfp[0][i], -1), jnp.roll(cfp[1][i], -1))
                       for i in range(cvals.shape[0])]
    else:
        consts, consts_next = [], []
    ok = True
    for c in air.transition(alg, local, nxt, publics, consts, consts_next):
        z = gl.is_zero((c[0][..., :n - 1], c[1][..., :n - 1]))
        ok = ok and bool(jnp.all(z))
    for c in air.first_row(alg, local, publics, consts):
        ok = ok and bool(jnp.all(gl.is_zero((c[0][..., 0], c[1][..., 0]))))
    for c in air.last_row(alg, local, publics, consts):
        ok = ok and bool(jnp.all(gl.is_zero((c[0][..., n - 1],
                                             c[1][..., n - 1]))))
    return ok


class FibonacciAir(Air):
    """Toy AIR: two columns (a, b); step (a, b) -> (b, a+b).

    Publics: [a0, b0, res] with res = a at the last row.
    The smoke-test AIR for the end-to-end prover (the `dummy program` of our
    stack, cf. the reference's rustx dummies used to exercise the pipeline).
    """

    num_cols = 2
    num_publics = 3

    def transition(self, alg, local, next_row, publics, consts=(), consts_next=()):
        a, b = local
        an, bn = next_row
        return [
            alg.sub(an, b),                    # a' = b
            alg.sub(bn, alg.add(a, b)),        # b' = a + b
        ]

    def first_row(self, alg, local, publics, consts=()):
        a, b = local
        return [
            alg.sub(a, alg.lift(publics[0])),
            alg.sub(b, alg.lift(publics[1])),
        ]

    def last_row(self, alg, local, publics, consts=()):
        a, b = local
        return [alg.sub(a, alg.lift(publics[2]))]

    @staticmethod
    def make_trace(n: int, a0: int = 0, b0: int = 1):
        """Host-side trace builder -> ((2, n) Fp trace, publics list)."""
        P = gl.MODULUS
        a, b = a0 % P, b0 % P
        col_a, col_b = [], []
        for _ in range(n):
            col_a.append(a)
            col_b.append(b)
            a, b = b, (a + b) % P
        trace = gl.to_fp([col_a, col_b])
        publics = [a0 % P, b0 % P, col_a[-1]]
        return trace, publics
