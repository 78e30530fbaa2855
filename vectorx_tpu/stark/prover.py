"""DEEP-ALI STARK prover — trace commit → quotient → DEEP → FRI.

The TPU-native replacement for the reference's plonky2 ``circuit.prove``
(SURVEY.md §3.1 step "plonky2 prove: witgen → trace LDE (NTT) → Poseidon
Merkle commit → FRI"). Everything is statically shaped and jittable; the
heavy phases are dense tensor passes:

  1. trace LDE         — batched coset NTT over all columns
  2. trace commit      — batched Poseidon Merkle (rows of the LDE matrix)
  3. constraint eval   — AIR constraints evaluated on the whole LDE domain
                         at once (BaseVecAlgebra), combined with α-powers
  4. quotient          — divide by vanishing polys (pointwise, batch-inverse),
                         split into degree-N chunks, commit
  5. DEEP composition  — open trace/quotient at ζ (barycentric), batch the
                         deviation quotients with β-powers into one GF(p^2)
                         codeword
  6. FRI               — low-degree proof of the composition codeword
  7. query openings    — trace/quotient rows + Merkle paths at FRI indices

Transcript order is fixed (see verifier.py, which mirrors it exactly):
publics | trace cap | α | quotient cap | ζ | openings | β | FRI.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl
from ..field import ext
from ..poly import ntt as pntt
from ..poly import domain as pdom
from . import fri, merkle
from .air import Air, BaseVecAlgebra
from .challenger import Challenger

P = gl.MODULUS


@dataclass(frozen=True)
class StarkConfig:
    rate_bits: int = 3
    num_queries: int = 28
    final_poly_len: int = 8
    cap_height: int = 0
    # FRI grinding bits: conjectured security ≈ rate_bits·num_queries +
    # pow_bits (see README "Soundness" table). Test configs use 0;
    # production configs should use PRODUCTION_POW_BITS.
    pow_bits: int = 0

    @property
    def fri_config(self) -> fri.FriConfig:
        return fri.FriConfig(rate_bits=self.rate_bits, num_queries=self.num_queries,
                             final_poly_len=self.final_poly_len, cap_height=self.cap_height,
                             pow_bits=self.pow_bits)


#: plonky2's standard_recursion_config grinds 16 bits; same margin here.
PRODUCTION_POW_BITS = 16


@jax.tree_util.register_dataclass
@dataclass
class StarkProof:
    trace_cap: gl.Fp
    quotient_cap: gl.Fp
    trace_zeta: ext.Fp2        # (num_cols,)
    trace_gzeta: ext.Fp2       # (num_cols,)
    quotient_zeta: ext.Fp2     # (num_chunks,)
    fri_proof: fri.FriProof
    # openings at FRI query positions (a: idx, b: idx + N_lde/2)
    trace_rows_a: gl.Fp        # (q, num_cols)
    trace_rows_b: gl.Fp
    trace_paths_a: gl.Fp       # (q, depth, 4)
    trace_paths_b: gl.Fp
    quot_rows_a: gl.Fp         # (q, 2*num_chunks)
    quot_rows_b: gl.Fp
    quot_paths_a: gl.Fp
    quot_paths_b: gl.Fp
    # LogUp lookup aux commitment (present iff air.lookup_range_columns()):
    # base columns [inv_k(re,im)]*K | inv_t(re,im) | m | S(re,im)
    aux_cap: gl.Fp | None = None
    aux_zeta: ext.Fp2 | None = None     # (num_aux,)
    aux_gzeta: ext.Fp2 | None = None
    aux_rows_a: gl.Fp | None = None
    aux_rows_b: gl.Fp | None = None
    aux_paths_a: gl.Fp | None = None
    aux_paths_b: gl.Fp | None = None
    # Preprocessed-constant openings (present iff air.constant_columns is
    # non-empty). The constant-column coset LDE is committed ONCE per
    # (air, log_n, config) into a Poseidon tree — the VERIFYING KEY
    # (constant_vk) — whose cap the verifier recomputes from the AIR
    # itself (never trusted from the proof). ζ/gζ values feed ALI in
    # place of barycentric evaluation; rows/paths bind them through DEEP
    # — the exact plonky2 `constants_sigmas_cap` role
    # (/root/reference: plonky2 recursion dependency), enabling in-AIR
    # recursion of constant-column AIRs (stark/RECURSION.md phase 4).
    const_zeta: ext.Fp2 | None = None   # (num_consts,)
    const_gzeta: ext.Fp2 | None = None
    const_rows_a: gl.Fp | None = None
    const_rows_b: gl.Fp | None = None
    const_paths_a: gl.Fp | None = None
    const_paths_b: gl.Fp | None = None


def _alpha_powers(alpha: ext.Fp2, n: int) -> List[ext.Fp2]:
    powers = []
    acc = ext.ones(())
    for _ in range(n):
        powers.append(acc)
        acc = ext.mul(acc, alpha)
    return powers


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("n",))
def _alpha_power_array(alpha: ext.Fp2, n: int) -> ext.Fp2:
    """[1, α, α², ...] stacked — (n,)-component Fp2, built under a scan."""
    def body(acc, _):
        return ext.mul(acc, alpha), acc
    _, arr = jax.lax.scan(body, ext.ones(()), None, length=n)
    return arr


def _slice_ext(v: ext.Fp2, a: int, b: int) -> ext.Fp2:
    return ((v[0][0][a:b], v[0][1][a:b]), (v[1][0][a:b], v[1][1][a:b]))


def _ext_col(v: ext.Fp2) -> ext.Fp2:
    """(m,) Fp2 -> (m, 1) Fp2 for broadcasting against (m, N)."""
    return ((v[0][0][:, None], v[0][1][:, None]),
            (v[1][0][:, None], v[1][1][:, None]))


def _ext_row(v: ext.Fp2) -> ext.Fp2:
    """(N,) Fp2 -> (1, N) Fp2."""
    return ((v[0][0][None, :], v[0][1][None, :]),
            (v[1][0][None, :], v[1][1][None, :]))


def _ext_sum0(v: ext.Fp2) -> ext.Fp2:
    """Sum an (m, ...) Fp2 over axis 0 (carry-save)."""
    return gl.sum_mod(v[0], axis=0), gl.sum_mod(v[1], axis=0)


def _weighted_sum0(terms: ext.Fp2, w: ext.Fp2) -> ext.Fp2:
    """Σ_i w_i * terms_i over axis 0: terms (m, N), w (m,) -> (N,)."""
    return _ext_sum0(ext.mul(_ext_col(w), terms))


def _ext_scalar_times_base_vec(s: ext.Fp2, v: gl.Fp) -> ext.Fp2:
    sb_re = (jnp.broadcast_to(s[0][0], v[0].shape), jnp.broadcast_to(s[0][1], v[0].shape))
    sb_im = (jnp.broadcast_to(s[1][0], v[0].shape), jnp.broadcast_to(s[1][1], v[0].shape))
    return gl.mul(sb_re, v), gl.mul(sb_im, v)


def _ext_vec_scale(s: ext.Fp2, v: ext.Fp2) -> ext.Fp2:
    """scalar Fp2 × vector Fp2."""
    shape = v[0][0].shape
    sb = ((jnp.broadcast_to(s[0][0], shape), jnp.broadcast_to(s[0][1], shape)),
          (jnp.broadcast_to(s[1][0], shape), jnp.broadcast_to(s[1][1], shape)))
    return ext.mul(sb, v)


def num_quotient_chunks(air: Air) -> int:
    return max(air.max_constraint_degree - 1, 1)


def constant_vk(air: Air, log_n: int, config: "StarkConfig"):
    """The preprocessed-constant commitment (verifying key) for one
    AIR/shape — or None if the AIR has no constant columns.

    Returns (tree, rows, cfp, c_lde): the Poseidon Merkle tree over the
    transposed constant-column coset LDE, its leaf rows, the subgroup
    evals and the LDE. Pure function of (air, log_n, rate, cap_height) —
    cached on the air object; a verifier calls this to obtain the cap it
    trusts (derived from the AIR, never read from a proof)."""
    cache = air.__dict__.setdefault("_vx_vk", {})
    key = (log_n, config.rate_bits, config.cap_height)
    if key not in cache:
        n = 1 << log_n
        cvals = np.asarray(air.constant_columns(n), dtype=np.object_)
        if cvals.shape[0] == 0:
            cache[key] = None
        else:
            cfp = gl.to_fp(cvals)
            c_lde = pntt.coset_lde(cfp, config.rate_bits)
            # column-major commit (tiled leaf hashing above the size
            # threshold); query rows are gathered from c_lde on demand
            tree = merkle.build_cols(c_lde, cap_height=config.cap_height)
            cache[key] = (tree, None, cfp, c_lde)
    return cache[key]


# ---------------------------------------------------------------------------
# LogUp range-check lookup (air.lookup_range_columns)
# ---------------------------------------------------------------------------
# Identity proven:  Σ_r Σ_k 1/(γ - w_k(r)) == Σ_r m(r)/(γ - r)
# i.e. every looked-up value lies in the row ramp [0, n_rows). Looked
# columns are PAIRED: one witnessed inverse serves two columns via
#   (γ - w0)(γ - w1)·inv = 1        (degree 3 — exactly the AIR budget)
#   pair contribution = inv·(2γ - w0 - w1) = 1/(γ-w0) + 1/(γ-w1)
# halving the aux trace vs one-inverse-per-column (the limb-heavy AIRs
# have thousands of looked columns). Odd column counts are padded by
# repeating the last column (its multiplicity simply counts twice).
# Aux base columns: [inv_k.re, inv_k.im]*ceil(K/2) | inv_t.re, inv_t.im |
# m | S.re, S.im | t  where S is the exclusive running sum and t is the
# table ramp itself, committed so t(ζ) is an ordinary opening (pinned by
# t(0)=0, t'=t+1) — the verifier (and the in-AIR recursive verifier,
# recursion_air.py) then never evaluates the ramp polynomial barycentric.


def num_aux_cols(n_lookups: int, has_ram: bool = False) -> int:
    lk = (2 * ((n_lookups + 1) // 2) + 6) if n_lookups else 0
    return lk + (4 if has_ram else 0)


def total_aux_cols(air: Air) -> int:
    return num_aux_cols(len(air.lookup_range_columns()),
                        air.ram_multiset() is not None)


def _ram_constraint_evals(gamma_r, delta_r, addr_x, mult_x, ld_x, act_x,
                          val_x, inv_v, s_val, s_next):
    """Pair-multiset RAM constraints in any ext ring (air.ram_multiset —
    the phase-5 value RAM). fp = γ − addr − δ·val;
    fp·inv == active (forces inv = 0 on inactive rows);
    S' = S + (mult − load)·inv with S(0) = 0 and S wrapping to 0:
        Σ_stores mult/fp == Σ_loads 1/fp
    — every load replays some store's (addr, value), and a store row's
    STATIC multiplicity says how many loads it serves (0 is legal: the
    value is simply never reloaded). All terms degree ≤ 2. Returns
    (every, transition, first, last) constraint lists — appended AFTER
    the LogUp lists in every consumer (prover quotient, verifier ALI,
    recursion record)."""
    fp = ext.sub(gamma_r, ext.add(addr_x, ext.mul(delta_r, val_x)))
    def_i = ext.sub(ext.mul(fp, inv_v), act_x)
    contrib = ext.mul(ext.sub(mult_x, ld_x), inv_v)
    re_ = [def_i]
    rt = [ext.sub(ext.sub(s_next, s_val), contrib)]
    rf = [s_val]
    rl = [ext.add(s_val, contrib)]
    return re_, rt, rf, rl


def _padded_lk(lk_cols):
    lk = list(lk_cols)
    if len(lk) % 2:
        lk.append(lk[-1])
    return lk


def _ramp_fp(n: int) -> gl.Fp:
    return (jnp.arange(n, dtype=jnp.uint32), jnp.zeros((n,), jnp.uint32))


def _recombine_u(re_v: ext.Fp2, im_v: ext.Fp2) -> ext.Fp2:
    """Value of an ext element stored as two base columns: re + u*im."""
    a, b = re_v
    c, d = im_v
    return (gl.add(a, gl.mul_scalar(d, ext.W)), gl.add(b, c))


def _lookup_constraint_evals(gamma, w0_g, w1_g, inv_g, inv_t, m_val,
                             s_val, s_next, t_val, t_next):
    """Evaluate the LogUp constraints in any ext ring (vectors at prove
    time, scalars at ζ for the verifier). ``w0_g``/``w1_g``/``inv_g`` are
    GROUPED ext elements with the ceil(K/2) column PAIRS stacked on a
    leading axis — one tensor op covers all pair-inverse definitions
    (essential for limb-heavy AIRs, e.g. Ed25519 with ~2000 looked
    columns). Returns (transition, first, last) lists of (possibly
    grouped) constraints; the inverse definitions appear in both
    transition and last so they hold on every row."""
    one = ext.ones(())
    d0 = ext.sub(gamma, w0_g)
    d1 = ext.sub(gamma, w1_g)
    defs_g = ext.sub(ext.mul(ext.mul(d0, d1), inv_g), one)
    def_t = ext.sub(ext.mul(ext.sub(gamma, t_val), inv_t), one)
    pair_num = ext.add(d0, d1)                    # 2γ - w0 - w1
    contrib_g = ext.mul(inv_g, pair_num)
    contrib = (gl.sum_mod(contrib_g[0], axis=0),
               gl.sum_mod(contrib_g[1], axis=0))
    contrib = ext.sub(contrib, ext.mul(m_val, inv_t))
    # the degree-3 inverse definitions hold on EVERY row (divisor x^N − 1,
    # quotient degree 2N−3 — a last-row divisor (x − g_last) would overflow
    # the 2-chunk quotient budget at degree 3N−4)
    le = [defs_g, def_t]
    lt = [ext.sub(ext.sub(s_next, s_val), contrib),
          ext.sub(ext.sub(t_next, t_val), one)]     # ramp step t' = t + 1
    lf = [s_val, t_val]                             # S(0) = 0, t(0) = 0
    ll = [ext.add(s_val, contrib)]
    return le, lt, lf, ll


def _num_lookup_constraints(n_lookups: int):
    """(transition, first, last) counts (pairs + table def + sum step)."""
    kk2 = (n_lookups + 1) // 2
    return kk2 + 3, 2, kk2 + 2


def _ext_slice0(v: ext.Fp2, sl) -> ext.Fp2:
    return ((v[0][0][sl], v[0][1][sl]), (v[1][0][sl], v[1][1][sl]))


def _build_aux_trace(trace: gl.Fp, lk_cols, gamma: ext.Fp2, n: int) -> gl.Fp:
    """-> (num_aux, n) base-column aux trace (one batched inverse pass over
    the column-pair denominators plus the table denominator)."""
    lk = _padded_lk(lk_cols)
    kk2 = len(lk) // 2
    t_ramp = _ramp_fp(n)
    ci = jnp.asarray(lk, dtype=jnp.int32)
    w = ext.from_base((trace[0][ci], trace[1][ci]))        # (2·kk2, n)
    d = ext.sub(_broadcast_ext(gamma, (2 * kk2, n)), w)
    d0 = _ext_slice0(d, slice(0, None, 2))
    d1 = _ext_slice0(d, slice(1, None, 2))
    denom_p = ext.mul(d0, d1)                              # (kk2, n)
    denom_t = ext.sub(_broadcast_ext(gamma, (1, n)),
                      ext.from_base((t_ramp[0][None, :], t_ramp[1][None, :])))
    denoms = ((jnp.concatenate([denom_p[0][0], denom_t[0][0]]),
               jnp.concatenate([denom_p[0][1], denom_t[0][1]])),
              (jnp.concatenate([denom_p[1][0], denom_t[1][0]]),
               jnp.concatenate([denom_p[1][1], denom_t[1][1]])))
    inv_all = ext.inv(denoms)
    inv_p = _ext_slice0(inv_all, slice(0, kk2))
    inv_t = _ext_slice0(inv_all, kk2)

    in_range = (trace[1][ci] == 0) & (trace[0][ci] < jnp.uint32(n))
    idx = jnp.where(in_range, trace[0][ci], jnp.uint32(0))
    counts = jnp.zeros((n,), jnp.uint32).at[idx.reshape(-1)].add(
        in_range.reshape(-1).astype(jnp.uint32))
    m_fp = (counts, jnp.zeros((n,), jnp.uint32))

    contrib_g = ext.mul(inv_p, ext.add(d0, d1))
    contrib = (gl.sum_mod(contrib_g[0], axis=0),
               gl.sum_mod(contrib_g[1], axis=0))
    contrib = ext.sub(contrib, ext.mul_base(inv_t, m_fp))

    def exscan(fp: gl.Fp) -> gl.Fp:
        inc = jax.lax.associative_scan(gl.add, fp)
        lo = jnp.concatenate([jnp.zeros((1,), jnp.uint32), inc[0][:-1]])
        hi = jnp.concatenate([jnp.zeros((1,), jnp.uint32), inc[1][:-1]])
        return lo, hi

    s_re = exscan(contrib[0])
    s_im = exscan(contrib[1])

    # interleave re/im base columns: inv pairs | inv_t | m | S | t
    re_lo = jnp.concatenate([inv_p[0][0], inv_t[0][0][None]])
    re_hi = jnp.concatenate([inv_p[0][1], inv_t[0][1][None]])
    im_lo = jnp.concatenate([inv_p[1][0], inv_t[1][0][None]])
    im_hi = jnp.concatenate([inv_p[1][1], inv_t[1][1][None]])
    inter_lo = jnp.stack([re_lo, im_lo], axis=1).reshape(-1, n)
    inter_hi = jnp.stack([re_hi, im_hi], axis=1).reshape(-1, n)
    cols_lo = jnp.concatenate(
        [inter_lo, m_fp[0][None], s_re[0][None], s_im[0][None],
         t_ramp[0][None]])
    cols_hi = jnp.concatenate(
        [inter_hi, m_fp[1][None], s_re[1][None], s_im[1][None],
         t_ramp[1][None]])
    return cols_lo, cols_hi


def _build_ram_aux(air: Air, trace: gl.Fp, gamma: ext.Fp2,
                   delta_r: ext.Fp2, n: int) -> gl.Fp:
    """(4, n) RAM aux base columns [inv.re | inv.im | S.re | S.im] for
    air.ram_multiset (see _ram_constraint_evals)."""
    mult_c, ld_c, ad_c, act_c, val_col = air.ram_multiset()
    cvals = np.asarray(air.constant_columns(n), dtype=np.object_)
    mult = gl.to_fp(cvals[mult_c])
    ld = gl.to_fp(cvals[ld_c])
    ad = gl.to_fp(cvals[ad_c])
    act = gl.to_fp(cvals[act_c])
    val = (trace[0][val_col], trace[1][val_col])
    gb = _broadcast_ext(gamma, (n,))
    db = _broadcast_ext(delta_r, (n,))
    fp = ext.sub(gb, ext.add(ext.from_base(ad), ext.mul_base(db, val)))
    inv = ext.mul_base(ext.inv(fp), act)          # 0 on inactive rows
    contrib = ext.mul_base(inv, gl.sub(mult, ld))

    def exscan(fp_: gl.Fp) -> gl.Fp:
        inc = jax.lax.associative_scan(gl.add, fp_)
        lo = jnp.concatenate([jnp.zeros((1,), jnp.uint32), inc[0][:-1]])
        hi = jnp.concatenate([jnp.zeros((1,), jnp.uint32), inc[1][:-1]])
        return lo, hi

    s_re = exscan(contrib[0])
    s_im = exscan(contrib[1])
    lo = jnp.stack([inv[0][0], inv[1][0], s_re[0], s_im[0]])
    hi = jnp.stack([inv[0][1], inv[1][1], s_re[1], s_im[1]])
    return lo, hi


def _build_aux(air: Air, trace: gl.Fp, lk_cols, gamma: ext.Fp2,
               delta_r, n: int) -> gl.Fp:
    """Full aux trace: LogUp range block (if any) then the RAM block."""
    parts = []
    if lk_cols:
        parts.append(_build_aux_trace(trace, lk_cols, gamma, n))
    if air.ram_multiset() is not None:
        parts.append(_build_ram_aux(air, trace, gamma, delta_r, n))
    return (jnp.concatenate([p[0] for p in parts]),
            jnp.concatenate([p[1] for p in parts]))


def quotient_tail(quotient, n: int, n_chunks: int, rate: int, shift: int,
                  intt_fn=None, c2e_fn=None, ntt_fn=None):
    """Quotient codeword -> (quot_cols, chunk_evals_lde, chunk_evals_sub):
    coset INTT, degree-N chunk split, per-chunk coset/subgroup re-evals.
    The NTT entry points are injectable — prover.prove(ntt_ops=...) routes
    them through parallel/ntt_dist for multi-chip quotient NTTs
    (ROADMAP §4: the second half of >1-chip single-proof scaling)."""
    intt_fn = intt_fn or pntt.coset_intt
    c2e_fn = c2e_fn or pntt.coeffs_to_coset_evals
    ntt_fn = ntt_fn or pntt.ntt
    q_coeffs_re = intt_fn(quotient[0], shift)
    q_coeffs_im = intt_fn(quotient[1], shift)
    chunk_evals_lde, chunk_evals_sub = [], []
    for i in range(n_chunks):
        cre = (q_coeffs_re[0][i * n:(i + 1) * n],
               q_coeffs_re[1][i * n:(i + 1) * n])
        cim = (q_coeffs_im[0][i * n:(i + 1) * n],
               q_coeffs_im[1][i * n:(i + 1) * n])
        chunk_evals_lde.append((c2e_fn(cre, rate, shift),
                                c2e_fn(cim, rate, shift)))
        chunk_evals_sub.append((ntt_fn(cre), ntt_fn(cim)))
    quot_cols_lo = jnp.stack(
        [c[j][0] for c in chunk_evals_lde for j in (0, 1)])
    quot_cols_hi = jnp.stack(
        [c[j][1] for c in chunk_evals_lde for j in (0, 1)])
    return (quot_cols_lo, quot_cols_hi), chunk_evals_lde, chunk_evals_sub


def _quotient_phase_fn(air: Air, log_n: int, rate: int, has_lk: bool,
                       n_lookups: int, with_tail: bool = True):
    """Build the (traceable) quotient-phase function for one AIR/shape.

    ONE jitted program covers: constraint evaluation over the LDE domain,
    lookup constraint evaluation, α-combination, vanishing division, chunk
    split + re-evaluation. Keeping this under a single jit is the
    difference between ~10 device dispatches and ~10,000 eager ones per
    prove (the dominant prover cost on the axon tunnel).

    with_tail=False stops at the quotient codeword — the multi-chip path
    runs the NTT tail through sharded transforms outside this program."""
    n = 1 << log_n
    n_lde = n << rate
    blowup = 1 << rate
    num_cols = air.num_cols
    g_dom = gl.primitive_root_of_unity(log_n)
    g_last = pow(g_dom, n - 1, P)
    shift = gl.MULTIPLICATIVE_GROUP_GENERATOR
    n_chunks = num_quotient_chunks(air)
    ram_spec = air.ram_multiset()

    def fn(trace_lde, c_lde, publics, alpha, gamma, delta, aux_lde):
        alg = BaseVecAlgebra((n_lde,))
        local = [(trace_lde[0][c], trace_lde[1][c]) for c in range(num_cols)]
        import os as _os
        if _os.environ.get("VX_LAZY_ROLL") == "1":
            # per-column rolls on access: the bulk roll below is a SECOND
            # full-LDE copy (6+ GB for the recursion-leaf machine). Lazy
            # rolls trade ~2 graph ops per accessed column for that copy
            # — only worth it for big-K machines, hence env-gated.
            class _LazyNext:
                def __getitem__(self, c):
                    if isinstance(c, slice):
                        return [self[j]
                                for j in range(*c.indices(num_cols))]
                    return (jnp.roll(trace_lde[0][c], -blowup),
                            jnp.roll(trace_lde[1][c], -blowup))

                def __len__(self):
                    return num_cols

                def __iter__(self):
                    for c in range(num_cols):
                        yield self[c]

            nxt = _LazyNext()
        else:
            # one roll of the whole (C, N_lde) tensor, then per-column
            # views (a per-column roll costs thousands of ops to trace
            # for limb AIRs)
            r_lo = jnp.roll(trace_lde[0], -blowup, axis=1)
            r_hi = jnp.roll(trace_lde[1], -blowup, axis=1)
            nxt = [(r_lo[c], r_hi[c]) for c in range(num_cols)]
        if c_lde is not None:
            # the constant LDE arrives PRECOMPUTED (constant_vk cache) —
            # recomputing it in-graph both traced a 2nd NTT of every
            # const column and broke the host-accumulated tiling under
            # jit (tracer leak)
            n_cc = c_lde[0].shape[0]
            consts = [(c_lde[0][i], c_lde[1][i]) for i in range(n_cc)]
            import os as _os2
            if _os2.environ.get("VX_LAZY_ROLL") == "1":
                class _LazyCNext:
                    def __getitem__(self, i):
                        if isinstance(i, slice):
                            return [self[j]
                                    for j in range(*i.indices(n_cc))]
                        return (jnp.roll(c_lde[0][i], -blowup),
                                jnp.roll(c_lde[1][i], -blowup))

                    def __len__(self):
                        return n_cc

                    def __iter__(self):
                        for i in range(n_cc):
                            yield self[i]

                consts_next = _LazyCNext()
            else:
                cr_lo = jnp.roll(c_lde[0], -blowup, axis=1)
                cr_hi = jnp.roll(c_lde[1], -blowup, axis=1)
                consts_next = [(cr_lo[i], cr_hi[i]) for i in range(n_cc)]
        else:
            consts, consts_next = [], []
        ct = air.transition(alg, local, nxt, publics, consts, consts_next)
        cf = air.first_row(alg, local, publics, consts)
        cl = air.last_row(alg, local, publics, consts)

        if has_lk:
            lk_p = _padded_lk(air.lookup_range_columns())
            kk2 = len(lk_p) // 2

            def aux_elem(i):
                return ((aux_lde[0][2 * i], aux_lde[1][2 * i]),
                        (aux_lde[0][2 * i + 1], aux_lde[1][2 * i + 1]))

            inv_t_v = aux_elem(kk2)
            m_v = ext.from_base((aux_lde[0][2 * kk2 + 2],
                                 aux_lde[1][2 * kk2 + 2]))
            s_v = ((aux_lde[0][2 * kk2 + 3], aux_lde[1][2 * kk2 + 3]),
                   (aux_lde[0][2 * kk2 + 4], aux_lde[1][2 * kk2 + 4]))
            s_next_v = ((jnp.roll(aux_lde[0][2 * kk2 + 3], -blowup),
                         jnp.roll(aux_lde[1][2 * kk2 + 3], -blowup)),
                        (jnp.roll(aux_lde[0][2 * kk2 + 4], -blowup),
                         jnp.roll(aux_lde[1][2 * kk2 + 4], -blowup)))
            t_v = ext.from_base((aux_lde[0][2 * kk2 + 5],
                                 aux_lde[1][2 * kk2 + 5]))
            t_next_v = ext.from_base(
                (jnp.roll(aux_lde[0][2 * kk2 + 5], -blowup),
                 jnp.roll(aux_lde[1][2 * kk2 + 5], -blowup)))
        tile = _logup_tile()
        tiled_lk = has_lk and bool(tile) and kk2 > tile

        if has_lk and not tiled_lk:
            ci = jnp.asarray(lk_p, dtype=jnp.int32)
            w_all = ext.from_base((trace_lde[0][ci], trace_lde[1][ci]))
            w0_g = _ext_slice0(w_all, slice(0, None, 2))    # (kk2, N_lde)
            w1_g = _ext_slice0(w_all, slice(1, None, 2))
            invs_g = ((aux_lde[0][0:2 * kk2:2], aux_lde[1][0:2 * kk2:2]),
                      (aux_lde[0][1:2 * kk2:2], aux_lde[1][1:2 * kk2:2]))
            lk_e, lk_t, lk_f, lk_l = _lookup_constraint_evals(
                gamma, w0_g, w1_g, invs_g, inv_t_v, m_v, s_v, s_next_v,
                t_v, t_next_v)
        elif not has_lk:
            lk_e, lk_t, lk_f, lk_l = [], [], [], []

        if ram_spec is not None:
            assert not tiled_lk, "RAM + tiled-LogUp not supported yet"
            mult_c, ld_c, ad_c, act_c, val_col = ram_spec
            base_r = (2 * kk2 + 6) if has_lk else 0

            def ram_aux(i):
                return ((aux_lde[0][base_r + i], aux_lde[1][base_r + i]),
                        (aux_lde[0][base_r + i + 1],
                         aux_lde[1][base_r + i + 1]))

            inv_v = ram_aux(0)
            sR_v = ram_aux(2)
            sR_next = ((jnp.roll(aux_lde[0][base_r + 2], -blowup),
                        jnp.roll(aux_lde[1][base_r + 2], -blowup)),
                       (jnp.roll(aux_lde[0][base_r + 3], -blowup),
                        jnp.roll(aux_lde[1][base_r + 3], -blowup)))
            addr_x = ext.from_base((c_lde[0][ad_c], c_lde[1][ad_c]))
            mult_x = ext.from_base((c_lde[0][mult_c], c_lde[1][mult_c]))
            ld_x = ext.from_base((c_lde[0][ld_c], c_lde[1][ld_c]))
            act_x = ext.from_base((c_lde[0][act_c], c_lde[1][act_c]))
            val_x = ext.from_base((trace_lde[0][val_col],
                                   trace_lde[1][val_col]))
            r_e, r_t, r_f, r_l = _ram_constraint_evals(
                gamma, delta, addr_x, mult_x, ld_x, act_x, val_x, inv_v,
                sR_v, sR_next)
            lk_e = lk_e + r_e
            lk_t = lk_t + r_t
            lk_f = lk_f + r_f
            lk_l = lk_l + r_l

        def _group_size(c):
            g = c[0].shape[:-1]
            return int(np.prod(g)) if g else 1

        def _group_size_ext(c):
            g = c[0][0].shape[:-1]
            return int(np.prod(g)) if g else 1

        if tiled_lk:
            # -- HBM-lean LogUp: lax.scan over column-pair tiles ----------
            # The grouped path holds ~30 (kk2, N_lde) ext temps — ~12.5 GB
            # for Ed25519VerifyAir (kk2≈1591) at rate 8, the round-2 OOM.
            # Scanning TILE pairs at a time bounds live temps at TILE×N_lde
            # while producing the IDENTICAL α-combination: the pair-defs
            # block occupies α^[k_e_base, k_e_base+kk2) in flatten order,
            # exactly as _combine_ext assigns to the grouped tensor.
            one = ext.ones(())
            n_air = sum(_group_size(c) for c in ct + cf + cl)
            k_e_base = n_air + 2 + 2 + 1      # + lk_t + lk_f + lk_l
            n_tiles = -(-kk2 // tile)
            padded = n_tiles * tile
            alphas_arr = _alpha_power_array(alpha, k_e_base + padded + 1)
            w0_idx = np.empty((n_tiles, tile), np.int32)
            w1_idx = np.empty((n_tiles, tile), np.int32)
            a0_idx = np.empty((n_tiles, tile), np.int32)
            a1_idx = np.empty((n_tiles, tile), np.int32)
            msk = np.zeros((n_tiles, tile), np.uint32)
            for j in range(padded):
                t_, l_ = divmod(j, tile)
                jj = min(j, kk2 - 1)          # tail pad repeats, masked out
                w0_idx[t_, l_] = lk_p[2 * jj]
                w1_idx[t_, l_] = lk_p[2 * jj + 1]
                a0_idx[t_, l_] = 2 * jj
                a1_idx[t_, l_] = 2 * jj + 1
                msk[t_, l_] = 1 if j < kk2 else 0
            al_e = _slice_ext(alphas_arr, k_e_base, k_e_base + padded)
            al_tiles = jax.tree_util.tree_map(
                lambda a: a.reshape(n_tiles, tile), al_e)

            def body(carry, xs):
                contrib_c, ce_c = carry
                w0i, w1i, a0i, a1i, m, al = xs
                w0 = ext.from_base((trace_lde[0][w0i], trace_lde[1][w0i]))
                w1 = ext.from_base((trace_lde[0][w1i], trace_lde[1][w1i]))
                inv = ((aux_lde[0][a0i], aux_lde[1][a0i]),
                       (aux_lde[0][a1i], aux_lde[1][a1i]))
                d0 = ext.sub(gamma, w0)
                d1 = ext.sub(gamma, w1)
                defs = ext.sub(ext.mul(ext.mul(d0, d1), inv), one)
                mask_fp = (m[:, None], jnp.zeros_like(m)[:, None])
                pairc = ext.mul_base(ext.mul(inv, ext.add(d0, d1)),
                                     mask_fp)
                contrib_c = ext.add(contrib_c, _ext_sum0(pairc))
                ce_c = ext.add(ce_c, _weighted_sum0(
                    ext.mul_base(defs, mask_fp), al))
                return (contrib_c, ce_c), None

            init = (ext.zeros((n_lde,)), ext.zeros((n_lde,)))
            (contrib, ce_part), _ = jax.lax.scan(
                body, init,
                (jnp.asarray(w0_idx), jnp.asarray(w1_idx),
                 jnp.asarray(a0_idx), jnp.asarray(a1_idx),
                 jnp.asarray(msk), al_tiles))
            contrib = ext.sub(contrib, ext.mul(m_v, inv_t_v))
            def_t = ext.sub(ext.mul(ext.sub(gamma, t_v), inv_t_v), one)
            lk_t = [ext.sub(ext.sub(s_next_v, s_v), contrib),
                    ext.sub(ext.sub(t_next_v, t_v), one)]
            lk_f = [s_v, t_v]
            lk_l = [ext.add(s_v, contrib)]
            lk_e = []                          # folded into ce_part
        else:
            n_constraints = (sum(_group_size(c) for c in ct + cf + cl)
                             + sum(_group_size_ext(c)
                                   for c in lk_t + lk_f + lk_l + lk_e))
            alphas_arr = _alpha_power_array(alpha, n_constraints)

        def _bc_mul(a, b):
            return gl.mul((jnp.broadcast_to(a[0], b[0].shape),
                           jnp.broadcast_to(a[1], b[0].shape)), b)

        def _combine(constraints, alphas_all, k0):
            """α-combine; GROUPED leading axes count as independent
            constraints, each with its own α (one stacked weighted sum)."""
            acc = ext.zeros((n_lde,))
            k = k0
            for c in constraints:
                group = c[0].shape[:-1]
                m = int(np.prod(group)) if group else 1
                cf_ = (c[0].reshape(m, n_lde), c[1].reshape(m, n_lde))
                al = _slice_ext(alphas_all, k, k + m)
                a_re = (al[0][0][:, None], al[0][1][:, None])
                a_im = (al[1][0][:, None], al[1][1][:, None])
                re = gl.sum_mod(_bc_mul(a_re, cf_), axis=0)
                im = gl.sum_mod(_bc_mul(a_im, cf_), axis=0)
                acc = ext.add(acc, (re, im))
                k += m
            return acc, k

        def _combine_ext(constraints, alphas_all, k0, acc):
            k = k0
            for c in constraints:
                group = c[0][0].shape[:-1]
                if not group:
                    acc = ext.add(acc,
                                  _ext_vec_scale(_pick_ext(alphas_all, k), c))
                    k += 1
                    continue
                m = int(np.prod(group))
                cc = ((c[0][0].reshape(m, n_lde), c[0][1].reshape(m, n_lde)),
                      (c[1][0].reshape(m, n_lde), c[1][1].reshape(m, n_lde)))
                al = _ext_col(_slice_ext(alphas_all, k, k + m))
                acc = ext.add(acc, _ext_sum0(ext.mul(al, cc)))
                k += m
            return acc, k

        k = 0
        ct_comb, k = _combine(ct, alphas_arr, k)
        ct_comb, k = _combine_ext(lk_t, alphas_arr, k, ct_comb)
        cf_comb, k = _combine(cf, alphas_arr, k)
        cf_comb, k = _combine_ext(lk_f, alphas_arr, k, cf_comb)
        cl_comb, k = _combine(cl, alphas_arr, k)
        cl_comb, k = _combine_ext(lk_l, alphas_arr, k, cl_comb)
        if tiled_lk:
            assert k == k_e_base, (k, k_e_base)
            ce_comb = ext.add(ce_part, _ext_vec_scale(
                _pick_ext(alphas_arr, k_e_base + kk2), def_t))
        else:
            ce_comb, k = _combine_ext(lk_e, alphas_arr, k,
                                      ext.zeros((n_lde,)))

        # quotient: divide by the per-class vanishing polynomials
        x = pdom.domain_points(log_n + rate, shift)     # (N_lde,)
        zh = pdom.vanishing_on_coset(log_n, rate, shift)
        inv_zh = gl.inv(zh)
        x_minus_glast = gl.sub(x, gl.full((n_lde,), g_last))
        inv_x_minus_1 = gl.inv(gl.sub(x, gl.ones((n_lde,))))
        inv_x_minus_glast = gl.inv(x_minus_glast)

        q_t = ext.mul_base(ext.mul_base(ct_comb, x_minus_glast), inv_zh)
        q_f = ext.mul_base(cf_comb, inv_x_minus_1)
        q_l = ext.mul_base(cl_comb, inv_x_minus_glast)
        q_e = ext.mul_base(ce_comb, inv_zh)              # every-row class
        quotient = ext.add(ext.add(ext.add(q_t, q_f), q_l), q_e)
        if not with_tail:
            return quotient

        # split into degree-N chunks; evaluate on coset LDE + subgroup
        return quotient_tail(quotient, n, n_chunks, rate, shift)

    return fn


def _logup_tile() -> int:
    """Pair-tile size for the grouped LogUp constraint evaluation inside
    the fused quotient phase. Limb-heavy AIRs (Ed25519VerifyAir: ~1591
    looked pairs) otherwise hold ~30 (kk2, N_lde) ext temps — ~12.5 GB at
    rate 8, the round-2 B=13 OOM (PROD_SIZES.json). lax.scan over tiles
    bounds live temps at TILE×N_lde with no FLOP change and the identical
    α-combination. VX_LOGUP_TILE overrides; 0 disables tiling."""
    import os
    return int(os.environ.get("VX_LOGUP_TILE", "128"))


def _deep_tile() -> int:
    """Trace-column tile for the DEEP composition (see _deep_phase_raw).
    VX_DEEP_TILE overrides; 0 disables tiling."""
    import os
    return int(os.environ.get("VX_DEEP_TILE", "256"))


def _quot_rowtile() -> int:
    """LDE-row window size for the quotient constraint evaluation.

    The fused quotient program holds every constraint-class temp over the
    FULL LDE domain — for the recursion outer machine (~1,100 columns ×
    2^20 LDE rows) those temps alone are ~9 GB and the phase OOMs one
    v5e (round-4 leaf4 log: 89×2^20 `c_lde` adds at goldilocks.py:240 +
    16×2^20 group concats at air.py:111). Constraint evaluation is
    pointwise except for next-row (+blowup) access, so it tiles cleanly
    over row windows (see _quotient_phase_fn_rowtile). 0 disables;
    VX_QUOT_ROWTILE=<rows> enables (power of two dividing N_lde)."""
    import os
    return int(os.environ.get("VX_QUOT_ROWTILE", "0"))


#: device-resident divisor arrays per (log_n, rate) for the row-tiled
#: quotient phase (4 × (N_lde,) pairs ≈ 32 MB at 2^20 — negligible)
_DOMAIN_CACHE: dict = {}


def _domain_arrays(log_n: int, rate: int):
    """(x−g_last, 1/Z_H, 1/(x−1), 1/(x−g_last)) on the LDE coset."""
    key = (log_n, rate)
    if key not in _DOMAIN_CACHE:
        shift = gl.MULTIPLICATIVE_GROUP_GENERATOR
        n = 1 << log_n
        n_lde = n << rate
        g_last = pow(gl.primitive_root_of_unity(log_n), n - 1, P)

        @jax.jit
        def build():
            x = pdom.domain_points(log_n + rate, shift)
            zh = pdom.vanishing_on_coset(log_n, rate, shift)
            xmg = gl.sub(x, gl.full((n_lde,), g_last))
            return (xmg, gl.inv(zh),
                    gl.inv(gl.sub(x, gl.ones((n_lde,)))), gl.inv(xmg))

        _DOMAIN_CACHE[key] = build()
    return _DOMAIN_CACHE[key]


def _bc_mul_m(a, b):
    return gl.mul((jnp.broadcast_to(a[0], b[0].shape),
                   jnp.broadcast_to(a[1], b[0].shape)), b)


def _combine_base_m(constraints, alphas_all, k0: int, m: int, acc):
    """α-combine base-ring constraint classes over an m-point window —
    the module-level counterpart of the fused path's inner `_combine`
    (identical op order, so the row-tiled path stays byte-exact)."""
    k = k0
    for c in constraints:
        group = c[0].shape[:-1]
        g = int(np.prod(group)) if group else 1
        cf_ = (c[0].reshape(g, m), c[1].reshape(g, m))
        al = _slice_ext(alphas_all, k, k + g)
        a_re = (al[0][0][:, None], al[0][1][:, None])
        a_im = (al[1][0][:, None], al[1][1][:, None])
        re = gl.sum_mod(_bc_mul_m(a_re, cf_), axis=0)
        im = gl.sum_mod(_bc_mul_m(a_im, cf_), axis=0)
        acc = ext.add(acc, (re, im))
        k += g
    return acc, k


def _combine_ext_m(constraints, alphas_all, k0: int, m: int, acc):
    k = k0
    for c in constraints:
        group = c[0][0].shape[:-1]
        if not group:
            acc = ext.add(acc, _ext_vec_scale(_pick_ext(alphas_all, k), c))
            k += 1
            continue
        g = int(np.prod(group))
        cc = ((c[0][0].reshape(g, m), c[0][1].reshape(g, m)),
              (c[1][0].reshape(g, m), c[1][1].reshape(g, m)))
        al = _ext_col(_slice_ext(alphas_all, k, k + g))
        acc = ext.add(acc, _ext_sum0(ext.mul(al, cc)))
        k += g
    return acc, k


def _quotient_phase_fn_rowtile(air: Air, log_n: int, rate: int,
                               has_lk: bool, tile_rows: int):
    """Row-windowed quotient constraint evaluation (VX_QUOT_ROWTILE).

    ONE jitted block program gathers window [s, s+B+blowup) (mod N_lde)
    out of the resident trace/const/aux LDEs, evaluates and α-combines
    every constraint class on the window (base + grouped LogUp + value
    RAM), divides by the windowed vanishing arrays, and returns the (B,)
    quotient slice. Live temps are bounded at groups×B instead of
    groups×N_lde; the codeword is concatenated host-side and fed to the
    standard chunk-split tail. Byte-exact vs the fused path
    (tests/test_quotient_rowtile.py). Not combined with the tiled-LogUp
    scan — AIRs whose pair count exceeds VX_LOGUP_TILE keep the fused
    path (their (kk2, B) grouped temps would defeat the window bound)."""
    n = 1 << log_n
    n_lde = n << rate
    blowup = 1 << rate
    B = tile_rows
    num_cols = air.num_cols
    ram_spec = air.ram_multiset()

    def fn_block(trace_lde, c_lde, publics, alpha, gamma, delta, aux_lde,
                 dom, start):
        alg = BaseVecAlgebra((B,))
        idx = (start + jnp.arange(B + blowup, dtype=jnp.uint32)) \
            % jnp.uint32(n_lde)
        t_lo = jnp.take(trace_lde[0], idx, axis=1)
        t_hi = jnp.take(trace_lde[1], idx, axis=1)
        local = [(t_lo[c, :B], t_hi[c, :B]) for c in range(num_cols)]
        nxt = [(t_lo[c, blowup:], t_hi[c, blowup:])
               for c in range(num_cols)]
        if c_lde is not None:
            c_lo = jnp.take(c_lde[0], idx, axis=1)
            c_hi = jnp.take(c_lde[1], idx, axis=1)
            n_cc = c_lde[0].shape[0]
            consts = [(c_lo[i, :B], c_hi[i, :B]) for i in range(n_cc)]
            consts_next = [(c_lo[i, blowup:], c_hi[i, blowup:])
                           for i in range(n_cc)]
        else:
            consts, consts_next = [], []
        ct = air.transition(alg, local, nxt, publics, consts, consts_next)
        cf = air.first_row(alg, local, publics, consts)
        cl = air.last_row(alg, local, publics, consts)

        if aux_lde[0].shape[0]:
            a_lo = jnp.take(aux_lde[0], idx, axis=1)
            a_hi = jnp.take(aux_lde[1], idx, axis=1)
        if has_lk:
            lk_p = _padded_lk(air.lookup_range_columns())
            kk2 = len(lk_p) // 2
            inv_t_v = ((a_lo[2 * kk2, :B], a_hi[2 * kk2, :B]),
                       (a_lo[2 * kk2 + 1, :B], a_hi[2 * kk2 + 1, :B]))
            m_v = ext.from_base((a_lo[2 * kk2 + 2, :B],
                                 a_hi[2 * kk2 + 2, :B]))
            s_v = ((a_lo[2 * kk2 + 3, :B], a_hi[2 * kk2 + 3, :B]),
                   (a_lo[2 * kk2 + 4, :B], a_hi[2 * kk2 + 4, :B]))
            s_next_v = ((a_lo[2 * kk2 + 3, blowup:],
                         a_hi[2 * kk2 + 3, blowup:]),
                        (a_lo[2 * kk2 + 4, blowup:],
                         a_hi[2 * kk2 + 4, blowup:]))
            t_v = ext.from_base((a_lo[2 * kk2 + 5, :B],
                                 a_hi[2 * kk2 + 5, :B]))
            t_next_v = ext.from_base((a_lo[2 * kk2 + 5, blowup:],
                                      a_hi[2 * kk2 + 5, blowup:]))
            ci = jnp.asarray(lk_p, dtype=jnp.int32)
            w_all = ext.from_base((t_lo[ci, :B], t_hi[ci, :B]))
            w0_g = _ext_slice0(w_all, slice(0, None, 2))    # (kk2, B)
            w1_g = _ext_slice0(w_all, slice(1, None, 2))
            invs_g = ((a_lo[0:2 * kk2:2, :B], a_hi[0:2 * kk2:2, :B]),
                      (a_lo[1:2 * kk2:2, :B], a_hi[1:2 * kk2:2, :B]))
            lk_e, lk_t, lk_f, lk_l = _lookup_constraint_evals(
                gamma, w0_g, w1_g, invs_g, inv_t_v, m_v, s_v, s_next_v,
                t_v, t_next_v)
        else:
            kk2 = 0
            lk_e, lk_t, lk_f, lk_l = [], [], [], []

        if ram_spec is not None:
            mult_c, ld_c, ad_c, act_c, val_col = ram_spec
            base_r = (2 * kk2 + 6) if has_lk else 0
            inv_v = ((a_lo[base_r, :B], a_hi[base_r, :B]),
                     (a_lo[base_r + 1, :B], a_hi[base_r + 1, :B]))
            sR_v = ((a_lo[base_r + 2, :B], a_hi[base_r + 2, :B]),
                    (a_lo[base_r + 3, :B], a_hi[base_r + 3, :B]))
            sR_next = ((a_lo[base_r + 2, blowup:],
                        a_hi[base_r + 2, blowup:]),
                       (a_lo[base_r + 3, blowup:],
                        a_hi[base_r + 3, blowup:]))
            addr_x = ext.from_base((c_lo[ad_c, :B], c_hi[ad_c, :B]))
            mult_x = ext.from_base((c_lo[mult_c, :B], c_hi[mult_c, :B]))
            ld_x = ext.from_base((c_lo[ld_c, :B], c_hi[ld_c, :B]))
            act_x = ext.from_base((c_lo[act_c, :B], c_hi[act_c, :B]))
            val_x = ext.from_base(local[val_col])
            r_e, r_t, r_f, r_l = _ram_constraint_evals(
                gamma, delta, addr_x, mult_x, ld_x, act_x, val_x, inv_v,
                sR_v, sR_next)
            lk_e = lk_e + r_e
            lk_t = lk_t + r_t
            lk_f = lk_f + r_f
            lk_l = lk_l + r_l

        def _gs(c):
            g = c[0].shape[:-1]
            return int(np.prod(g)) if g else 1

        def _gse(c):
            g = c[0][0].shape[:-1]
            return int(np.prod(g)) if g else 1

        n_constraints = (sum(_gs(c) for c in ct + cf + cl)
                         + sum(_gse(c)
                               for c in lk_t + lk_f + lk_l + lk_e))
        alphas_arr = _alpha_power_array(alpha, n_constraints)

        k = 0
        ct_comb, k = _combine_base_m(ct, alphas_arr, k, B,
                                     ext.zeros((B,)))
        ct_comb, k = _combine_ext_m(lk_t, alphas_arr, k, B, ct_comb)
        cf_comb, k = _combine_base_m(cf, alphas_arr, k, B,
                                     ext.zeros((B,)))
        cf_comb, k = _combine_ext_m(lk_f, alphas_arr, k, B, cf_comb)
        cl_comb, k = _combine_base_m(cl, alphas_arr, k, B,
                                     ext.zeros((B,)))
        cl_comb, k = _combine_ext_m(lk_l, alphas_arr, k, B, cl_comb)
        ce_comb, k = _combine_ext_m(lk_e, alphas_arr, k, B,
                                    ext.zeros((B,)))

        def win(a):
            return (jax.lax.dynamic_slice_in_dim(a[0], start, B),
                    jax.lax.dynamic_slice_in_dim(a[1], start, B))

        xmg_w = win(dom[0])
        izh_w = win(dom[1])
        ixm1_w = win(dom[2])
        ixmg_w = win(dom[3])
        q_t = ext.mul_base(ext.mul_base(ct_comb, xmg_w), izh_w)
        q_f = ext.mul_base(cf_comb, ixm1_w)
        q_l = ext.mul_base(cl_comb, ixmg_w)
        q_e = ext.mul_base(ce_comb, izh_w)
        return ext.add(ext.add(ext.add(q_t, q_f), q_l), q_e)

    return fn_block


def phase_jit_enabled() -> bool:
    """Fuse whole prover/verifier phases under one jit?

    ON for accelerator backends: the phases are dispatch-bound there
    (thousands of eager op launches through the device tunnel dominate a
    warm prove ~20x). OFF by default on CPU, where XLA:CPU's compile time
    for the fused graphs outweighs eager dispatch (the hermetic test mesh);
    VX_PHASE_JIT=1/0 overrides."""
    import os
    env = os.environ.get("VX_PHASE_JIT")
    if env is not None:
        return env == "1"
    return jax.default_backend() != "cpu"


#: shared phase programs for AIRs that opt in via Air.phase_cache_key
_SHARED_QJIT: dict = {}


def _phase_cache(air: Air, attr: str, shared: dict) -> dict:
    ck = air.phase_cache_key()
    if ck is None:
        return air.__dict__.setdefault(attr, {})
    return shared.setdefault(ck, {})


def _quotient_phase(air: Air, log_n: int, rate: int, trace_lde, c_lde,
                    publics, alpha, gamma, aux_lde, ntt_ops=None,
                    delta_r=None):
    """Per-(air, shape) cached (optionally jitted) quotient phase.

    ntt_ops (parallel/ntt_dist.ShardedNttOps or compatible) reroutes the
    quotient NTT tail through sharded transforms: the codeword is built
    by the (jittable) constraint program, the INTT/chunk re-evals run as
    mesh collectives outside it — bit-exact vs the fused path."""
    has_lk = len(air.lookup_range_columns()) > 0
    has_aux = has_lk or air.ram_multiset() is not None
    cache = _phase_cache(air, "_vx_qjit", _SHARED_QJIT)
    n_lde = 1 << (log_n + rate)
    rt = _quot_rowtile()
    kk2 = (len(air.lookup_range_columns()) + 1) // 2 if has_lk else 0
    lg_tile = _logup_tile()
    if (rt > 0 and n_lde % rt == 0 and n_lde // rt >= 2
            and not (has_lk and lg_tile and kk2 > lg_tile)):
        return _quotient_phase_rowtiled(
            air, log_n, rate, trace_lde, c_lde, publics, alpha, gamma,
            aux_lde, ntt_ops, delta_r, rt, has_lk, has_aux, cache)
    with_tail = ntt_ops is None
    key = (log_n, rate, len(publics), phase_jit_enabled(), with_tail)
    if key not in cache:
        fn = _quotient_phase_fn(air, log_n, rate, has_lk,
                                len(air.lookup_range_columns()),
                                with_tail=with_tail)
        cache[key] = jax.jit(fn) if phase_jit_enabled() else fn
    unit = ext.zeros(())
    if has_aux:
        out = cache[key](trace_lde, c_lde, publics, alpha,
                         gamma if gamma is not None else unit,
                         delta_r if delta_r is not None else unit, aux_lde)
    else:
        # gamma/aux unused in the non-lookup trace; static placeholders
        dummy_aux = (jnp.zeros((0, 1 << (log_n + rate)), jnp.uint32),) * 2
        out = cache[key](trace_lde, c_lde, publics, alpha, unit, unit,
                         dummy_aux)
    if with_tail:
        return out
    n = 1 << log_n
    shift = gl.MULTIPLICATIVE_GROUP_GENERATOR
    return quotient_tail(out, n, num_quotient_chunks(air), rate, shift,
                         intt_fn=ntt_ops.coset_intt,
                         c2e_fn=ntt_ops.coeffs_to_coset_evals,
                         ntt_fn=ntt_ops.ntt)


def _quotient_phase_rowtiled(air, log_n, rate, trace_lde, c_lde, publics,
                             alpha, gamma, aux_lde, ntt_ops, delta_r,
                             rt, has_lk, has_aux, cache):
    """Drive the VX_QUOT_ROWTILE block program over the LDE domain and
    run the standard chunk-split tail on the concatenated codeword."""
    n_lde = 1 << (log_n + rate)
    key = ("rowtile", log_n, rate, len(publics), rt)
    if key not in cache:
        cache[key] = jax.jit(_quotient_phase_fn_rowtile(
            air, log_n, rate, has_lk, rt))
    dom = _domain_arrays(log_n, rate)
    unit = ext.zeros(())
    if has_aux:
        aux_in = aux_lde
        g_in = gamma if gamma is not None else unit
        d_in = delta_r if delta_r is not None else unit
    else:
        aux_in = (jnp.zeros((0, n_lde), jnp.uint32),) * 2
        g_in, d_in = unit, unit
    import os as _os
    sync = _os.environ.get("VX_QUOT_SYNC", "1") == "1"
    parts = []
    for b in range(n_lde // rt):
        p = cache[key](trace_lde, c_lde, publics, alpha, g_in, d_in,
                       aux_in, dom, jnp.uint32(b * rt))
        if sync:
            # serialize block executions: the axon runtime otherwise
            # queues all blocks and their workspaces can coexist on HBM
            # (a 4-byte output fetch is the only reliable barrier here)
            np.asarray(p[0][0][0])
        parts.append(p)
    quotient = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs), *parts)
    n = 1 << log_n
    shift = gl.MULTIPLICATIVE_GROUP_GENERATOR
    if ntt_ops is None:
        return quotient_tail(quotient, n, num_quotient_chunks(air), rate,
                             shift)
    return quotient_tail(quotient, n, num_quotient_chunks(air), rate,
                         shift, intt_fn=ntt_ops.coset_intt,
                         c2e_fn=ntt_ops.coeffs_to_coset_evals,
                         ntt_fn=ntt_ops.ntt)


def prove(air: Air, trace: gl.Fp, publics: List[gl.Fp], config: StarkConfig,
          challenger: Challenger | None = None,
          lde_fn=None, ntt_ops=None) -> StarkProof:
    """trace: (num_cols, N) base field; publics: list of scalar Fp.

    ``lde_fn(trace, rate) -> trace_lde`` overrides the trace-domain blowup
    — the multi-chip seam: parallel/ntt_dist.coset_lde_sharded runs the
    butterfly-partitioned NTT (all_to_all at the four-step transpose)
    across a device mesh for traces too large for one chip. It also
    serves the aux (LogUp) blowup. ``ntt_ops`` additionally shards the
    QUOTIENT-phase NTTs (coset INTT + chunk re-evals) — with both set, a
    single proof's NTT work runs end to end on >1 chip
    (parallel/ntt_dist.ShardedNttOps bundles all of them)."""
    if challenger is None:
        challenger = Challenger.new()
    num_cols, n = trace[0].shape
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    rate = config.rate_bits
    n_lde = n << rate
    blowup = 1 << rate
    g_dom = gl.primitive_root_of_unity(log_n)       # trace-domain generator
    g_last = pow(g_dom, n - 1, P)
    shift = gl.MULTIPLICATIVE_GROUP_GENERATOR

    # -- 0: preprocessed-constant VK (cached per air/shape) ----------------
    vk = constant_vk(air, log_n, config)
    has_consts = vk is not None
    if has_consts:
        vk_tree, _, cfp, c_lde = vk
        n_consts = cfp[0].shape[0]
    else:
        vk_tree = cfp = c_lde = None
        n_consts = 0

    # -- 1/2: trace LDE + commitment --------------------------------------
    # column-major commit: no full transposed copy; leaf hashing tiles
    # over row blocks above merkle.TILE_MIN_CELLS (the transposed-LDE
    # Merkle alloc was the first OOM on one v5e for wide AIRs)
    trace_lde = (lde_fn or pntt.coset_lde)(trace, rate)   # (num_cols, N_lde)
    trace_tree = merkle.build_cols(trace_lde, cap_height=config.cap_height)

    challenger.observe((jnp.stack([p[0] for p in publics]),
                        jnp.stack([p[1] for p in publics])))
    if has_consts:
        # bind the verifying key into the transcript (domain separation
        # between AIRs sharing a trace shape)
        challenger.observe_digests(vk_tree.cap)
    challenger.observe_digests(trace_tree.cap)

    # -- LogUp/RAM aux phase (range lookups and/or the pair-multiset
    # value RAM — air.ram_multiset) ---------------------------------------
    lk_cols = air.lookup_range_columns()
    has_lk = len(lk_cols) > 0
    has_ram = air.ram_multiset() is not None
    has_aux = has_lk or has_ram
    aux_tree = aux_trace = aux_lde = gamma = delta_r = None
    if has_aux:
        gamma = challenger.squeeze_ext(1)
        gamma = ((gamma[0][0][0], gamma[0][1][0]),
                 (gamma[1][0][0], gamma[1][1][0]))
        if has_ram:
            delta_r = challenger.squeeze_ext(1)
            delta_r = ((delta_r[0][0][0], delta_r[0][1][0]),
                       (delta_r[1][0][0], delta_r[1][1][0]))
        aux_trace = _build_aux(air, trace, lk_cols, gamma, delta_r, n)
        aux_lde = (lde_fn or pntt.coset_lde)(aux_trace, rate)
        aux_tree = merkle.build_cols(aux_lde, cap_height=config.cap_height)
        challenger.observe_digests(aux_tree.cap)

    alpha = challenger.squeeze_ext(1)
    alpha = ((alpha[0][0][0], alpha[0][1][0]), (alpha[1][0][0], alpha[1][1][0]))

    # -- 3/4: constraints + quotient (ONE jitted program per air/shape) ----
    quot_cols, chunk_evals_lde, chunk_evals_sub = _quotient_phase(
        air, log_n, rate, trace_lde, c_lde, publics, alpha, gamma, aux_lde,
        ntt_ops=ntt_ops, delta_r=delta_r)
    n_chunks = num_quotient_chunks(air)
    quot_tree = merkle.build_cols(quot_cols, cap_height=config.cap_height)
    challenger.observe_digests(quot_tree.cap)

    zeta = challenger.squeeze_ext(1)
    zeta = ((zeta[0][0][0], zeta[0][1][0]), (zeta[1][0][0], zeta[1][1][0]))

    # -- 5: openings at ζ and g·ζ -----------------------------------------
    # one batched barycentric evaluation at ζ for trace columns AND all
    # quotient-chunk components (they share the domain, so the (ζ - x_j)
    # inverses and prefactor are computed once)
    g_zeta = ext.mul_base(zeta, gl.full((), g_dom))
    n_aux = aux_trace[0].shape[0] if has_aux else 0
    aux_part = [aux_trace[0]] if has_aux else []
    aux_part_hi = [aux_trace[1]] if has_aux else []
    const_part = [cfp[0]] if has_consts else []
    const_part_hi = [cfp[1]] if has_consts else []
    chunk_lo = [c[j][0][None, :] for c in chunk_evals_sub for j in (0, 1)]
    chunk_hi = [c[j][1][None, :] for c in chunk_evals_sub for j in (0, 1)]
    import os as _os
    if _os.environ.get("VX_OPEN_SPLIT") == "1":
        # memory-lean openings for big machines: evaluate each component
        # stack separately (barycentric results are per-poly independent,
        # so this is byte-exact) instead of materializing the full
        # (C_total, N) device concatenate — 4.6 GB for the recursion
        # leaf, whose opening phase OOMed round-5 attempt 2. Combined
        # with VX_BARY_TILE_CELLS the working set stays tile-bounded,
        # and a host-resident trace uploads tile-wise.
        def _bary_cat(parts_lo, parts_hi, point):
            outs = [pdom.barycentric_eval((plo, phi), point, log_n)
                    for plo, phi in zip(parts_lo, parts_hi)]
            return jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate(xs), *outs)

        opened = _bary_cat([trace[0]] + aux_part + const_part + chunk_lo,
                           [trace[1]] + aux_part_hi + const_part_hi
                           + chunk_hi, zeta)
    else:
        stack_lo = jnp.concatenate(
            [trace[0]] + aux_part + const_part + chunk_lo)
        stack_hi = jnp.concatenate(
            [trace[1]] + aux_part_hi + const_part_hi + chunk_hi)
        opened = pdom.barycentric_eval((stack_lo, stack_hi), zeta, log_n)

    def _sl(op, a, b):
        return ((op[0][0][a:b], op[0][1][a:b]), (op[1][0][a:b], op[1][1][a:b]))

    trace_zeta = _sl(opened, 0, num_cols)
    aux_zeta = _sl(opened, num_cols, num_cols + n_aux) if has_aux else None
    const_zeta = (_sl(opened, num_cols + n_aux,
                      num_cols + n_aux + n_consts) if has_consts else None)
    if has_aux or has_consts:
        if _os.environ.get("VX_OPEN_SPLIT") == "1":
            opened_g = _bary_cat([trace[0]] + aux_part + const_part,
                                 [trace[1]] + aux_part_hi + const_part_hi,
                                 g_zeta)
        else:
            gstack = (jnp.concatenate([trace[0]] + aux_part + const_part),
                      jnp.concatenate([trace[1]] + aux_part_hi
                                      + const_part_hi))
            opened_g = pdom.barycentric_eval(gstack, g_zeta, log_n)
        trace_gzeta = _sl(opened_g, 0, num_cols)
        aux_gzeta = (_sl(opened_g, num_cols, num_cols + n_aux)
                     if has_aux else None)
        const_gzeta = (_sl(opened_g, num_cols + n_aux,
                           num_cols + n_aux + n_consts)
                       if has_consts else None)
    else:
        aux_zeta = aux_gzeta = const_gzeta = None
        trace_gzeta = pdom.barycentric_eval(trace, g_zeta, log_n)

    # recombine chunk components: value = re_v + u*im_v, u^2 = W
    qv = []
    for i in range(n_chunks):
        re_v = _pick_ext(opened, num_cols + n_aux + n_consts + 2 * i)
        im_v = _pick_ext(opened, num_cols + n_aux + n_consts + 2 * i + 1)
        a, b = re_v
        c, d = im_v
        qv.append((gl.add(a, gl.mul_scalar(d, ext.W)), gl.add(b, c)))
    quotient_zeta = ((jnp.stack([v[0][0] for v in qv]), jnp.stack([v[0][1] for v in qv])),
                     (jnp.stack([v[1][0] for v in qv]), jnp.stack([v[1][1] for v in qv])))

    def obs_ext(v: ext.Fp2):
        challenger.observe((jnp.concatenate([jnp.atleast_1d(v[0][0]), jnp.atleast_1d(v[1][0])]),
                            jnp.concatenate([jnp.atleast_1d(v[0][1]), jnp.atleast_1d(v[1][1])])))

    obs_ext(trace_zeta)
    obs_ext(trace_gzeta)
    if has_aux:
        obs_ext(aux_zeta)
        obs_ext(aux_gzeta)
    if has_consts:
        obs_ext(const_zeta)
        obs_ext(const_gzeta)
    obs_ext(quotient_zeta)

    beta = challenger.squeeze_ext(1)
    beta = ((beta[0][0][0], beta[0][1][0]), (beta[1][0][0], beta[1][1][0]))

    # -- DEEP composition codeword (one fused program) ---------------------
    ch_stack = ((jnp.stack([c[0][0] for c in chunk_evals_lde]),
                 jnp.stack([c[0][1] for c in chunk_evals_lde])),
                (jnp.stack([c[1][0] for c in chunk_evals_lde]),
                 jnp.stack([c[1][1] for c in chunk_evals_lde])))
    deep_fn = (_deep_phase_jit if phase_jit_enabled() else _deep_phase_raw)
    F = deep_fn(log_n, rate, trace_lde, aux_lde, c_lde, ch_stack,
                trace_zeta, trace_gzeta, aux_zeta, aux_gzeta,
                const_zeta, const_gzeta, quotient_zeta, zeta, g_zeta, beta)

    # -- 6: FRI ------------------------------------------------------------
    fri_proof, indices = fri.prove(F, challenger, config.fri_config)

    # -- 7: trace/quotient openings at query indices (one fused program) --
    half = n_lde // 2
    idx_a = indices
    idx_b = indices + half
    open_fn = (_open_queries_jit if phase_jit_enabled()
               else _open_queries_raw)
    ((tra, tpa), (trb, tpb), (qra, qpa), (qrb, qpb), aux_opens,
     const_opens) = open_fn(
        trace_tree, trace_lde, quot_tree, quot_cols,
        aux_tree, aux_lde, vk_tree, c_lde, idx_a, idx_b)
    if has_aux:
        (ara, apa), (arb, apb) = aux_opens
    else:
        ara = arb = apa = apb = None
    if has_consts:
        (cra, cpa), (crb, cpb) = const_opens
    else:
        cra = crb = cpa = cpb = None

    return StarkProof(
        trace_cap=trace_tree.cap, quotient_cap=quot_tree.cap,
        trace_zeta=trace_zeta, trace_gzeta=trace_gzeta,
        quotient_zeta=quotient_zeta, fri_proof=fri_proof,
        trace_rows_a=tra, trace_rows_b=trb,
        trace_paths_a=tpa, trace_paths_b=tpb,
        quot_rows_a=qra, quot_rows_b=qrb,
        quot_paths_a=qpa, quot_paths_b=qpb,
        aux_cap=aux_tree.cap if has_aux else None,
        aux_zeta=aux_zeta, aux_gzeta=aux_gzeta,
        aux_rows_a=ara, aux_rows_b=arb,
        aux_paths_a=apa, aux_paths_b=apb,
        const_zeta=const_zeta, const_gzeta=const_gzeta,
        const_rows_a=cra, const_rows_b=crb,
        const_paths_a=cpa, const_paths_b=cpb,
    )


def _deep_phase_raw(log_n, rate, trace_lde, aux_lde, const_lde, ch_stack,
                    trace_zeta, trace_gzeta, aux_zeta, aux_gzeta,
                    const_zeta, const_gzeta, quotient_zeta,
                    zeta, g_zeta, beta):
    """DEEP composition: β-batched deviation quotients of every opening
    group into one GF(p^2) codeword. Shapes (and aux/const presence) are
    static, so the jitted variant compiles once per prover config.
    β-power term order (mirrored by the verifier and the in-AIR recursive
    verifier): trace ζ | trace gζ | aux ζ | aux gζ | const ζ | const gζ |
    quotient."""
    shift = gl.MULTIPLICATIVE_GROUP_GENERATOR
    n_lde = 1 << (log_n + rate)
    num_cols = trace_lde[0].shape[0]
    n_aux = aux_lde[0].shape[0] if aux_lde is not None else 0
    n_consts = const_lde[0].shape[0] if const_lde is not None else 0
    n_chunks = ch_stack[0][0].shape[0]
    has_lk = aux_lde is not None
    has_consts = const_lde is not None

    x = pdom.domain_points(log_n + rate, shift)     # (N_lde,)
    xe = ext.from_base(x)
    inv_xz = ext.inv(ext.sub(xe, _broadcast_ext(zeta, n_lde)))
    inv_xgz = ext.inv(ext.sub(xe, _broadcast_ext(g_zeta, n_lde)))

    n_terms = 2 * num_cols + 2 * n_aux + 2 * n_consts + n_chunks
    betas_arr = _alpha_power_array(beta, n_terms)

    tile = _deep_tile()

    def _block(F, lde, z_open, gz_open, k0, ncol):
        """β-weighted deviation terms of one opening block (ζ block at
        β^[k0, k0+ncol), gζ block at β^[k0+ncol, k0+2ncol)). Column
        counts above the tile stream through a lax.scan — untiled, the
        Ed25519VerifyAir blocks (3336 trace + 3188 aux cols) hold ~17
        (C, N_lde) ext temps ≈ 13 GB at rate 8 (the round-3 B=13 OOM).
        β assignment is identical (padded tail columns carry β = 0)."""
        if not (tile and ncol > tile):
            fp2 = ext.from_base(lde)
            dz = ext.sub(fp2, _ext_col(z_open))
            F = ext.add(F, _weighted_sum0(
                ext.mul(dz, _ext_row(inv_xz)),
                _slice_ext(betas_arr, k0, k0 + ncol)))
            dgz = ext.sub(fp2, _ext_col(gz_open))
            return ext.add(F, _weighted_sum0(
                ext.mul(dgz, _ext_row(inv_xgz)),
                _slice_ext(betas_arr, k0 + ncol, k0 + 2 * ncol)))
        n_tiles = -(-ncol // tile)
        padc = n_tiles * tile - ncol
        # tail tiles gather CLAMPED column indices instead of padding the
        # whole LDE into an (n_tiles, tile, N_lde) scan input — that pad
        # was a full 2x LDE copy (2 x 3 GB for the recursion leaf, its
        # round-5 DEEP OOM). Clamped duplicate columns pair with the
        # SAME zero betas the padded zero-columns carried, so every tail
        # term is an exact field zero either way: byte-identical output.
        idx_mat = np.minimum(
            np.arange(n_tiles * tile).reshape(n_tiles, tile),
            ncol - 1).astype(np.int32)

        def _pad_ext1(v, kk):
            def p(a):
                return jnp.pad(a, (0, padc)).reshape(n_tiles, tile)
            vv = ((p(v[0][0]), p(v[0][1])), (p(v[1][0]), p(v[1][1])))
            bz = _slice_ext(betas_arr, kk, kk + ncol)
            bb = ((p(bz[0][0]), p(bz[0][1])), (p(bz[1][0]), p(bz[1][1])))
            return vv, bb

        tz_t, bz_t = _pad_ext1(z_open, k0)
        tgz_t, bgz_t = _pad_ext1(gz_open, k0 + ncol)

        def body(acc, xs):
            ci, tz, bz, tgz, bgz = xs
            tfp2 = ext.from_base((lde[0][ci], lde[1][ci]))  # (tile, N_lde)
            dz = ext.sub(tfp2, _ext_col(tz))
            acc = ext.add(acc, _weighted_sum0(
                ext.mul(dz, _ext_row(inv_xz)), bz))
            dgz = ext.sub(tfp2, _ext_col(tgz))
            acc = ext.add(acc, _weighted_sum0(
                ext.mul(dgz, _ext_row(inv_xgz)), bgz))
            return acc, None

        part, _ = jax.lax.scan(body, ext.zeros((n_lde,)),
                               (jnp.asarray(idx_mat), tz_t, bz_t, tgz_t,
                                bgz_t))
        return ext.add(F, part)

    F = _block(ext.zeros((n_lde,)), trace_lde, trace_zeta, trace_gzeta,
               0, num_cols)
    kbase = 2 * num_cols
    if has_lk:
        F = _block(F, aux_lde, aux_zeta, aux_gzeta, kbase, n_aux)
        kbase += 2 * n_aux
    if has_consts:
        F = _block(F, const_lde, const_zeta, const_gzeta, kbase, n_consts)
        kbase += 2 * n_consts
    diff_q = ext.sub(ch_stack, _ext_col(quotient_zeta))
    F = ext.add(F, _weighted_sum0(ext.mul(diff_q, _ext_row(inv_xz)),
                                  _slice_ext(betas_arr, kbase, n_terms)))
    return F


_deep_phase_jit = jax.jit(_deep_phase_raw, static_argnames=("log_n", "rate"))


def _open_queries_raw(trace_tree, trace_cols, quot_tree, quot_cols,
                      aux_tree, aux_cols, vk_tree, vk_cols, idx_a, idx_b):
    """Open every committed tree at both query-index halves. Committed
    matrices arrive COLUMN-major (w, n_lde) — query rows are gathered,
    never the full transpose (memory: q×w per tree)."""
    def open_rows(tree, cols, idx):
        leaf = (cols[0][:, idx].T, cols[1][:, idx].T)
        paths = jax.vmap(lambda i: merkle.prove(tree, i))(idx)
        return leaf, paths

    out = (open_rows(trace_tree, trace_cols, idx_a),
           open_rows(trace_tree, trace_cols, idx_b),
           open_rows(quot_tree, quot_cols, idx_a),
           open_rows(quot_tree, quot_cols, idx_b))
    aux = None
    if aux_tree is not None:
        aux = (open_rows(aux_tree, aux_cols, idx_a),
               open_rows(aux_tree, aux_cols, idx_b))
    consts = None
    if vk_tree is not None:
        consts = (open_rows(vk_tree, vk_cols, idx_a),
                  open_rows(vk_tree, vk_cols, idx_b))
    return out + (aux, consts)


_open_queries_jit = jax.jit(_open_queries_raw)


def _broadcast_ext(s: ext.Fp2, n) -> ext.Fp2:
    shape = (n,) if isinstance(n, int) else tuple(n)
    return ((jnp.broadcast_to(s[0][0], shape), jnp.broadcast_to(s[0][1], shape)),
            (jnp.broadcast_to(s[1][0], shape), jnp.broadcast_to(s[1][1], shape)))


def _pick_ext(v: ext.Fp2, i: int) -> ext.Fp2:
    return ((v[0][0][i], v[0][1][i]), (v[1][0][i], v[1][1][i]))



