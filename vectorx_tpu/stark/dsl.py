"""L5 frontend: a typed column/constraint builder for authoring AIRs.

The reference's circuit authors never touch its proof system: they
declare typed variables (`/root/reference/circuits/vars.rs:14-64` —
ByteVariable, U32Variable, Bytes32Variable, ArrayVariable aggregates via
the `CircuitVariable` derive) and compose builder ops on them
(plonky2x `CircuitBuilder`). This module is the TPU-AIR counterpart:
instead of a gate graph it builds a row-transition AIR — typed column
FAMILIES with automatic well-formedness constraints, and expression
combinators that compile to the existing degree-≤3 constraint classes.

Usage:

    b = AirBuilder(num_publics=24)
    s  = b.felts("s", 12)            # base-field columns
    ph = b.bits("ph", 32)            # booleanity auto-constrained
    v  = b.u32("bn")                 # 4 byte columns + recomposition

    @b.transition
    def _(ctx):
        ctx.eq(ctx.nxt(s[0]), ctx.cur(s[1]))        # a' = b
        ...

    air = b.build()                  # a stark.air.Air instance

Expressions are operator-overloaded (`+ - *`, int constants auto-lift)
and evaluate over ANY ring algebra the prover/verifier/recursion
machinery supplies — so a DSL-authored AIR proves, verifies, and
recurses exactly like a hand-written one. `air_poseidon_dsl.py` ports
the Poseidon chain AIR as the proof (bit-compatible trace layout).

Well-formedness the families add automatically:
  bit   — b·(b−1) = 0 on every row
  u8    — 8 bit columns + linear recomposition to the value column
  u16   — 16 bit columns + recomposition (the limb type of the
          GF(2^255−19) gadgets)
  u32   — 4 u8 families + little-endian byte recomposition (the
          reference's U32Variable layout, vars.rs:23)
  bytes32 — ArrayVariable<ByteVariable, 32> analogue: 32 u8 families
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence

import numpy as np

from ..field import goldilocks as gl
from .air import Air

P = gl.MODULUS


# ---------------------------------------------------------------------------
# Expressions — deferred evaluation over an arbitrary constraint algebra
# ---------------------------------------------------------------------------


class Expr:
    """A ring expression; `f(env) -> ring element` where env carries the
    algebra and the row accessors. Build with + - * and the Ctx helpers;
    ints lift to field constants."""

    __slots__ = ("f",)

    def __init__(self, f: Callable):
        self.f = f

    @staticmethod
    def _lift(v) -> "Expr":
        if isinstance(v, Expr):
            return v
        if isinstance(v, int):
            return Expr(lambda env, c=v % P: env.alg.constant(c))
        raise TypeError(f"cannot lift {type(v)} into an AIR expression")

    def __add__(self, o):
        o = Expr._lift(o)
        return Expr(lambda env: env.alg.add(self.f(env), o.f(env)))

    __radd__ = __add__

    def __sub__(self, o):
        o = Expr._lift(o)
        return Expr(lambda env: env.alg.sub(self.f(env), o.f(env)))

    def __rsub__(self, o):
        return Expr._lift(o).__sub__(self)

    def __mul__(self, o):
        o = Expr._lift(o)
        return Expr(lambda env: env.alg.mul(self.f(env), o.f(env)))

    __rmul__ = __mul__

    def __neg__(self):
        return Expr(lambda env: env.alg.sub(env.alg.zero(), self.f(env)))


@dataclass(frozen=True)
class Col:
    """A typed column handle. `kind` is documentation + well-formedness
    marker; `idx` is the committed-trace column index."""

    name: str
    idx: int
    kind: str                      # 'felt' | 'bit' | const kinds

    def cur(self) -> Expr:
        return Expr(lambda env, i=self.idx: env.local[i])

    def nxt(self) -> Expr:
        return Expr(lambda env, i=self.idx: env.next[i])


@dataclass(frozen=True)
class ConstCol:
    """A preprocessed (uncommitted, public) constant column — committed
    once per shape into the verifying key (prover.constant_vk)."""

    name: str
    idx: int

    def cur(self) -> Expr:
        return Expr(lambda env, i=self.idx: env.consts[i])

    def nxt(self) -> Expr:
        return Expr(lambda env, i=self.idx: env.consts_next[i])


@dataclass(frozen=True)
class UInt:
    """A fixed-width unsigned integer: a value column plus its bit/byte
    decomposition family (well-formedness constraints auto-added)."""

    value: Col
    parts: tuple                   # bit Cols (u8/u16) or u8 UInts (u32)
    width: int


class _Env:
    __slots__ = ("alg", "local", "next", "publics", "consts", "consts_next")

    def __init__(self, alg, local, nxt, publics, consts, consts_next):
        self.alg = alg
        self.local = local
        self.next = nxt
        self.publics = publics
        self.consts = consts
        self.consts_next = consts_next


class Ctx:
    """Constraint-authoring context passed to @transition/@first_row/
    @last_row/@every_row functions. Collects `eq`/`zero` constraints."""

    def __init__(self):
        self._constraints: List[Expr] = []

    # -- accessors --------------------------------------------------------

    def cur(self, col: Col) -> Expr:
        return col.cur()

    def nxt(self, col: Col) -> Expr:
        return col.nxt()

    def pub(self, i: int) -> Expr:
        return Expr(lambda env: env.alg.lift(env.publics[i]))

    def one(self) -> Expr:
        return Expr(lambda env: env.alg.one())

    def zero_e(self) -> Expr:
        return Expr(lambda env: env.alg.zero())

    # -- constraint sinks -------------------------------------------------

    def zero(self, e: Expr) -> None:
        """Constrain e == 0 (in this context's row class)."""
        self._constraints.append(Expr._lift(e))

    def eq(self, a: Expr, b) -> None:
        self.zero(Expr._lift(a) - b)

    # -- combinators (the reference's builder-op analogues) ---------------

    def select(self, bit: Expr, a: Expr, b: Expr) -> Expr:
        """bit ? a : b   (degree +1; plonky2x `builder.select`)."""
        return Expr._lift(b) + Expr._lift(bit) * (Expr._lift(a) - b)

    def sum(self, es: Sequence[Expr]) -> Expr:
        acc = Expr._lift(0)
        for e in es:
            acc = acc + e
        return acc

    def dot(self, es: Sequence[Expr], coeffs: Sequence[int]) -> Expr:
        """Σ coeff_i · e_i with int coefficients (constant-folded)."""
        acc = Expr._lift(0)
        for e, c in zip(es, coeffs):
            acc = acc + Expr._lift(e) * (c % P)
        return acc

    def one_hot_dot(self, sel: Sequence[Expr], values: Sequence[int]) -> Expr:
        """Blend per-phase constants through a one-hot register — the
        'random access by selector' op (plonky2x `builder.select_array`
        for constant tables)."""
        return self.dot(sel, values)

    def recompose(self, parts: Sequence[Expr], base: int) -> Expr:
        """Σ parts_i · base^i (little-endian)."""
        acc = Expr._lift(0)
        mult = 1
        for p in parts:
            acc = acc + Expr._lift(p) * mult
            mult = (mult * base) % P
        return acc

    def rlc_window(self, gamma: Expr, elems: Sequence[Expr]) -> Expr:
        """γ-RLC of a window: Σ elems_i · γ^i — the byte-window binding
        used by air_header/air_rotate (plonky2x RLC subarray gadget)."""
        acc = Expr._lift(0)
        g_pow = self.one()
        for e in elems:
            acc = acc + Expr._lift(e) * g_pow
            g_pow = g_pow * gamma
        return acc


class _DslAir(Air):
    """The Air produced by AirBuilder.build()."""

    max_constraint_degree = 3

    def __init__(self, builder: "AirBuilder"):
        self.num_cols = builder._next_col
        self.num_publics = builder.num_publics
        self._t_fns = list(builder._t_fns)
        self._f_fns = list(builder._f_fns)
        self._l_fns = list(builder._l_fns)
        self._e_fns = list(builder._e_fns)
        self._auto_bits = [c.idx for c in builder._bit_cols]
        self._const_vals = builder._const_vals
        self._lookup_cols = list(builder._lookup_cols)
        self._name = builder.name
        if builder.n_rows is not None:
            self.n_rows = builder.n_rows

    # -- constraint classes ----------------------------------------------

    def _run(self, fns, alg, local, nxt, publics, consts, consts_next):
        env = _Env(alg, local, nxt, publics, consts, consts_next)
        out = []
        for fn in fns:
            ctx = Ctx()
            fn(ctx)
            out.extend(e.f(env) for e in ctx._constraints)
        return out

    def transition(self, alg, local, next_row, publics, consts=(),
                   consts_next=()):
        cs = []
        # family well-formedness: bit booleanity on every transition row
        for i in self._auto_bits:
            b = local[i]
            cs.append(alg.sub(alg.mul(b, b), b))
        cs.extend(self._run(self._t_fns + self._e_fns, alg, local,
                            next_row, publics, consts, consts_next))
        return cs

    def first_row(self, alg, local, publics, consts=()):
        return self._run(self._f_fns, alg, local, local, publics, consts,
                         consts)

    def last_row(self, alg, local, publics, consts=()):
        cs = []
        for i in self._auto_bits:
            b = local[i]
            cs.append(alg.sub(alg.mul(b, b), b))
        cs.extend(self._run(self._l_fns + self._e_fns, alg, local, local,
                            publics, consts, consts))
        return cs

    def lookup_range_columns(self):
        return list(self._lookup_cols)

    def constant_columns(self, n_rows: int):
        if not self._const_vals:
            return np.zeros((0, n_rows), dtype=np.uint64)
        out = np.zeros((len(self._const_vals), n_rows), dtype=np.uint64)
        for i, vals in enumerate(self._const_vals):
            m = min(len(vals), n_rows)
            out[i, :m] = np.asarray(vals[:m], dtype=np.uint64)
        return out


class AirBuilder:
    """Declare typed columns and constraint functions; build() an Air.

    Mirrors the split the reference enforces between circuit authors and
    the proof system: columns are typed handles, constraints are written
    against accessor/combinator ops, and the proof-system mapping
    (column indices, booleanity, decomposition identities, lookup
    registration) is the builder's job — not the author's."""

    def __init__(self, num_publics: int = 0, name: str = "dsl_air",
                 n_rows: Optional[int] = None):
        self.num_publics = num_publics
        self.name = name
        self.n_rows = n_rows
        self._next_col = 0
        self._next_const = 0
        self._bit_cols: List[Col] = []
        self._lookup_cols: List[int] = []
        self._const_vals: List[list] = []
        self._t_fns: List[Callable] = []
        self._f_fns: List[Callable] = []
        self._l_fns: List[Callable] = []
        self._e_fns: List[Callable] = []
        self._names = {}

    # -- column families --------------------------------------------------

    def _col(self, name: str, kind: str) -> Col:
        if name in self._names:
            raise ValueError(f"duplicate column name {name!r}")
        c = Col(name, self._next_col, kind)
        self._names[name] = c
        self._next_col += 1
        return c

    def felt(self, name: str) -> Col:
        return self._col(name, "felt")

    def felts(self, name: str, k: int) -> List[Col]:
        return [self.felt(f"{name}[{j}]") for j in range(k)]

    def bit(self, name: str) -> Col:
        c = self._col(name, "bit")
        self._bit_cols.append(c)
        return c

    def bits(self, name: str, k: int) -> List[Col]:
        return [self.bit(f"{name}[{j}]") for j in range(k)]

    def _uint_bits(self, name: str, width: int) -> UInt:
        v = self.felt(name)
        bs = self.bits(f"{name}.b", width)

        def wf(ctx, v=v, bs=bs):
            ctx.eq(ctx.cur(v),
                   ctx.recompose([ctx.cur(b) for b in bs], 2))

        self.every_row(wf)
        return UInt(v, tuple(bs), width)

    def u8(self, name: str) -> UInt:
        """A byte: value column + 8 bit columns (ByteVariable analogue —
        the reference also represents bytes as 8 bools, vars.rs ByteVariable)."""
        return self._uint_bits(name, 8)

    def u16(self, name: str) -> UInt:
        return self._uint_bits(name, 16)

    def u32(self, name: str) -> UInt:
        """U32Variable analogue: 4 little-endian u8 families + a value
        column recomposing them."""
        v = self.felt(name)
        bytes_ = tuple(self.u8(f"{name}.byte{j}") for j in range(4))

        def wf(ctx, v=v, bytes_=bytes_):
            ctx.eq(ctx.cur(v),
                   ctx.recompose([ctx.cur(b.value) for b in bytes_], 256))

        self.every_row(wf)
        return UInt(v, bytes_, 32)

    def bytes32(self, name: str) -> List[UInt]:
        """Bytes32Variable analogue: 32 byte families."""
        return [self.u8(f"{name}[{j}]") for j in range(32)]

    def range_checked(self, name: str) -> Col:
        """A column range-checked to [0, n_rows) via the LogUp row-ramp
        table (the starkyx-style limb range check)."""
        c = self._col(name, "felt")
        self._lookup_cols.append(c.idx)
        return c

    def constant(self, name: str, values: Sequence[int]) -> ConstCol:
        c = ConstCol(name, self._next_const)
        self._next_const += 1
        self._const_vals.append([int(v) % P for v in values])
        return c

    # -- constraint registration ------------------------------------------

    def transition(self, fn: Callable) -> Callable:
        self._t_fns.append(fn)
        return fn

    def first_row(self, fn: Callable) -> Callable:
        self._f_fns.append(fn)
        return fn

    def last_row(self, fn: Callable) -> Callable:
        self._l_fns.append(fn)
        return fn

    def every_row(self, fn: Callable) -> Callable:
        """Holds on all rows (emitted into both the transition and the
        last-row class, like the LogUp inverse definitions)."""
        self._e_fns.append(fn)
        return fn

    def build(self) -> _DslAir:
        return _DslAir(self)


class TraceWriter:
    """Witness-side counterpart: fill named columns with exact ints and
    emit the (num_cols, n_rows) Goldilocks trace."""

    def __init__(self, builder_or_air, n_rows: int):
        src = builder_or_air
        names = src._names if isinstance(src, AirBuilder) else None
        if names is None:
            raise TypeError("TraceWriter wants the AirBuilder")
        self._names = names
        self._n = n_rows
        self._cols = np.zeros((max(c.idx for c in names.values()) + 1,
                               n_rows), dtype=np.object_)

    def set(self, col, row: int, value: int) -> None:
        idx = col.idx if isinstance(col, Col) else self._names[col].idx
        self._cols[idx, row] = int(value) % P

    def set_uint(self, u: UInt, row: int, value: int) -> None:
        """Set a UInt's value column AND its whole decomposition family."""
        value = int(value)
        self.set(u.value, row, value % P)
        if u.parts and isinstance(u.parts[0], UInt):      # u32: bytes
            for j, b in enumerate(u.parts):
                self.set_uint(b, row, (value >> (8 * j)) & 0xFF)
        else:                                             # bits
            for j, b in enumerate(u.parts):
                self.set(b, row, (value >> j) & 1)

    def finish(self) -> gl.Fp:
        return gl.to_fp(self._cols)
