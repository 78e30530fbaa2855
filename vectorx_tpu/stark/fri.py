"""FRI low-degree proof over Goldilocks / GF(p^2) — commit, fold, query.

The polynomial-commitment backbone of our prover, in the role plonky2's FRI
plays for the reference (SURVEY.md §2.2 "FRI commit/query"). TPU-first
choices: codewords live as dense (N,)-shaped GF(p^2) tensors; every fold is
one vectorized butterfly-like pass; Merkle layers batch-hash; the verifier is
statically shaped (query count, layer count, path depths all static) so both
sides jit.

Protocol (degree bound d = N >> rate_bits, coset domain s·H_N):

  commit:  for each layer, pack leaf j = [f(x_j), f(-x_j)] (as 4 base
           elements), Merkle-commit, observe cap, squeeze β ∈ GF(p^2), fold
               f'(x²) = (f(x)+f(-x))/2 + β·(f(x)-f(-x))/(2x)
           halving the domain (shift s → s²), until the codeword reaches
           final_poly_len << rate_bits; then open the final polynomial's
           coefficients in the clear (coset-INTT) and observe them.
  query:   num_queries indices from the transcript; per layer open the leaf
           + Merkle path; the verifier re-folds and checks consistency down
           to a direct evaluation of the final polynomial.

Layer-0 openings are returned to the caller on verify so an outer protocol
(the DEEP-ALI STARK, prover.py) can cross-check them against its own trace
openings.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl
from ..field import ext
from ..poly import ntt as pntt
from . import merkle
from .challenger import Challenger

P = gl.MODULUS
INV2 = pow(2, P - 2, P)


@dataclass(frozen=True)
class FriConfig:
    rate_bits: int = 3          # blowup 8
    num_queries: int = 28       # ~> 80-bit query soundness at rate 8 (pre-PoW)
    final_poly_len: int = 8     # coefficients sent in the clear
    cap_height: int = 0
    pow_bits: int = 0           # proof-of-work grinding before query sampling

    def num_layers(self, log_n: int) -> int:
        final_size_bits = (self.final_poly_len.bit_length() - 1) + self.rate_bits
        return log_n - final_size_bits


@jax.tree_util.register_dataclass
@dataclass
class FriProof:
    caps: List[gl.Fp]            # per layer: (2^cap_height, 4)
    final_coeffs: ext.Fp2        # (final_poly_len,)
    # per layer: leaves (num_queries, 4), paths (num_queries, depth_k, 4)
    query_leaves: List[gl.Fp]
    query_paths: List[gl.Fp]
    # grinding response (scalar Fp; zeros when pow_bits == 0) — mirrors
    # plonky2's FriConfig proof_of_work witness: the verifier re-squeezes
    # after absorbing the nonce and requires pow_bits low-order zero bits,
    # adding pow_bits to query soundness (SURVEY.md §2.2 "FRI commit/query")
    pow_nonce: gl.Fp


# ---------------------------------------------------------------------------
# Host-side domain precomputation
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _layer_domain(log_n0: int, layer: int, shift0: int = gl.MULTIPLICATIVE_GROUP_GENERATOR):
    """(shift, root, log_size) of the layer's evaluation domain (Python ints)."""
    shift = shift0
    for _ in range(layer):
        shift = (shift * shift) % P
    log_n = log_n0 - layer
    root = gl.primitive_root_of_unity(log_n)
    return shift, root, log_n


@lru_cache(maxsize=None)
def _inv_2x_table(log_n0: int, layer: int) -> Tuple[np.ndarray, np.ndarray]:
    """inv(2 * s * w^j) for j in [0, N_layer/2) as uint32 (lo, hi)."""
    shift, root, log_n = _layer_domain(log_n0, layer)
    half = 1 << (log_n - 1)
    winv = pow(root, P - 2, P)
    base = pow(2 * shift % P, P - 2, P)
    vals = np.empty(half, dtype=np.object_)
    acc = base
    for j in range(half):
        vals[j] = acc
        acc = (acc * winv) % P
    return (
        (vals.astype(np.uint64) & 0xFFFFFFFF).astype(np.uint32),
        (vals.astype(np.uint64) >> np.uint64(32)).astype(np.uint32),
    )


@lru_cache(maxsize=None)
def _root_pow_table(log_n0: int, layer: int) -> Tuple[np.ndarray, np.ndarray]:
    """w^(2^b) for b in [0, log_n): squared-power ladder for traced pow."""
    _, root, log_n = _layer_domain(log_n0, layer)
    vals = np.empty(max(log_n, 1), dtype=np.object_)
    acc = root
    for b in range(max(log_n, 1)):
        vals[b] = acc
        acc = (acc * acc) % P
    return (
        (vals.astype(np.uint64) & 0xFFFFFFFF).astype(np.uint32),
        (vals.astype(np.uint64) >> np.uint64(32)).astype(np.uint32),
    )


GRIND_BATCH = 1024


def _grind_nonce(challenger: Challenger, pow_bits: int) -> gl.Fp:
    """Find a nonce whose absorption makes the next squeeze start with
    pow_bits low-order zero bits (on the squeezed element's low word —
    the same word squeeze_indices samples from). Batched search under a
    lax.while_loop, so it jits and runs on-device."""
    from ..hashes import poseidon as ps
    challenger._flush()
    state = challenger.state
    mask = jnp.uint32((1 << pow_bits) - 1)
    B = GRIND_BATCH

    def cond(c):
        _, found, _ = c
        return ~found

    def body(c):
        k, _, _ = c
        nonces = k * jnp.uint32(B) + jnp.arange(B, dtype=jnp.uint32)
        s_lo = jnp.broadcast_to(state[0], (B, ps.WIDTH)).at[:, 0].set(nonces)
        s_hi = jnp.broadcast_to(state[1], (B, ps.WIDTH)).at[:, 0].set(
            jnp.zeros((B,), jnp.uint32))
        out = ps.permute((s_lo, s_hi))
        ok = (out[0][:, 0] & mask) == 0
        any_ok = jnp.any(ok)
        first = jnp.argmax(ok)
        return k + 1, any_ok, jnp.where(any_ok, nonces[first], jnp.uint32(0))

    _, _, nonce = jax.lax.while_loop(
        cond, body, (jnp.uint32(0), jnp.asarray(False), jnp.uint32(0)))
    return nonce, jnp.zeros((), jnp.uint32)


def _pow_traced(table: Tuple[np.ndarray, np.ndarray], exp: jax.Array, nbits: int) -> gl.Fp:
    """w^exp for traced exp (vector), using the host ladder table."""
    acc = gl.ones(exp.shape)
    t_lo, t_hi = jnp.asarray(table[0]), jnp.asarray(table[1])
    for b in range(nbits):
        bit = ((exp >> b) & 1).astype(bool)
        mult = (jnp.broadcast_to(t_lo[b], exp.shape), jnp.broadcast_to(t_hi[b], exp.shape))
        acc = gl.select(bit, gl.mul(acc, mult), acc)
    return acc


# ---------------------------------------------------------------------------
# Codeword packing / folding
# ---------------------------------------------------------------------------

def _pack_leaves(cw: ext.Fp2) -> gl.Fp:
    """(N,) Fp2 codeword -> (N/2, 4) base rows [re(a), im(a), re(b), im(b)]."""
    (re_lo, re_hi), (im_lo, im_hi) = cw
    n = re_lo.shape[0]
    h = n // 2
    lo = jnp.stack([re_lo[:h], im_lo[:h], re_lo[h:], im_lo[h:]], axis=1)
    hi = jnp.stack([re_hi[:h], im_hi[:h], re_hi[h:], im_hi[h:]], axis=1)
    return lo, hi


@partial(jax.jit, static_argnames=("log_n0", "layer"))
def fold(cw: ext.Fp2, beta: ext.Fp2, log_n0: int, layer: int) -> ext.Fp2:
    """One FRI fold: (N,) codeword -> (N/2,) on the squared domain."""
    n = cw[0][0].shape[0]
    h = n // 2
    a = ((cw[0][0][:h], cw[0][1][:h]), (cw[1][0][:h], cw[1][1][:h]))
    b = ((cw[0][0][h:], cw[0][1][h:]), (cw[1][0][h:], cw[1][1][h:]))
    inv2 = gl.full((h,), INV2)
    s = ext.mul_base(ext.add(a, b), inv2)
    t_lo, t_hi = _inv_2x_table(log_n0, layer)
    inv2x = (jnp.asarray(t_lo), jnp.asarray(t_hi))
    d = ext.mul_base(ext.sub(a, b), inv2x)
    beta_b = ((jnp.broadcast_to(beta[0][0], (h,)), jnp.broadcast_to(beta[0][1], (h,))),
              (jnp.broadcast_to(beta[1][0], (h,)), jnp.broadcast_to(beta[1][1], (h,))))
    return ext.add(s, ext.mul(d, beta_b))


def _coset_intt_fp2(cw: ext.Fp2, log_n0: int, layer: int) -> ext.Fp2:
    """Coefficients of the polynomial whose coset evals are `cw`."""
    shift, _, log_n = _layer_domain(log_n0, layer)
    n = 1 << log_n
    re = pntt.intt(cw[0])
    im = pntt.intt(cw[1])
    sinv = pow(shift, P - 2, P)
    pw = np.empty(n, dtype=np.object_)
    acc = 1
    for i in range(n):
        pw[i] = acc
        acc = (acc * sinv) % P
    spow = (jnp.asarray((pw.astype(np.uint64) & 0xFFFFFFFF).astype(np.uint32)),
            jnp.asarray((pw.astype(np.uint64) >> np.uint64(32)).astype(np.uint32)))
    return gl.mul(re, spow), gl.mul(im, spow)


# ---------------------------------------------------------------------------
# Prover
# ---------------------------------------------------------------------------

_prove_jit = {}


def prove(codeword: ext.Fp2, challenger: Challenger, config: FriConfig):
    """Commit-phase + query-phase for a (N,) GF(p^2) codeword.

    The caller must already have bound the codeword's provenance into the
    transcript (e.g. by observing trace commitments). On accelerator
    backends the whole commit+query pipeline (folds, layer Merkle trees,
    transcript absorption, query openings) fuses under ONE jit — the FRI
    loop is otherwise ~100 tiny dispatches per prove."""
    from .prover import phase_jit_enabled
    if not phase_jit_enabled():
        return _prove_impl(codeword, challenger, config)
    n = codeword[0][0].shape[0]
    key = (n.bit_length() - 1, config, len(challenger.pending))
    if key not in _prove_jit:
        def fn(cw, state, pending):
            ch = Challenger(state=state, pending=list(pending))
            proof, idx = _prove_impl(cw, ch, config)
            return proof, idx, ch.state, tuple(ch.pending)
        _prove_jit[key] = jax.jit(fn)
    proof, idx, st, pend = _prove_jit[key](
        codeword, challenger.state, tuple(challenger.pending))
    challenger.state = st
    challenger.pending = list(pend)
    return proof, idx


def _prove_impl(codeword: ext.Fp2, challenger: Challenger,
                config: FriConfig):
    n = codeword[0][0].shape[0]
    log_n = n.bit_length() - 1
    num_layers = config.num_layers(log_n)
    assert num_layers >= 0

    trees: List[merkle.MerkleTree] = []
    codewords: List[ext.Fp2] = []
    cw = codeword
    for layer in range(num_layers):
        codewords.append(cw)
        rows = _pack_leaves(cw)
        tree = merkle.build(rows, cap_height=config.cap_height)
        trees.append(tree)
        challenger.observe_digests(tree.cap)
        beta = challenger.squeeze_ext(1)
        beta = ((beta[0][0][0], beta[0][1][0]), (beta[1][0][0], beta[1][1][0]))
        cw = fold(cw, beta, log_n, layer)

    # final polynomial, in the clear
    final_coeffs_full = _coset_intt_fp2(cw, log_n, num_layers)
    fl = config.final_poly_len
    final_coeffs = ((final_coeffs_full[0][0][:fl], final_coeffs_full[0][1][:fl]),
                    (final_coeffs_full[1][0][:fl], final_coeffs_full[1][1][:fl]))
    challenger.observe((jnp.concatenate([final_coeffs[0][0], final_coeffs[1][0]]),
                        jnp.concatenate([final_coeffs[0][1], final_coeffs[1][1]])))

    # proof-of-work grinding before query sampling (plonky2 FriConfig
    # parity). The nonce is ALWAYS transcript-bound (tamper-evident even at
    # pow_bits=0, where nonce 0 trivially satisfies the empty check).
    if config.pow_bits > 0:
        pow_nonce = _grind_nonce(challenger, config.pow_bits)
    else:
        pow_nonce = (jnp.zeros((), jnp.uint32), jnp.zeros((), jnp.uint32))
    challenger.observe((pow_nonce[0][None], pow_nonce[1][None]))
    challenger.squeeze(1)       # the checked response; advances the state

    # queries
    indices = challenger.squeeze_indices(config.num_queries, log_n - 1)
    query_leaves, query_paths = [], []
    idx = indices
    for layer in range(num_layers):
        half = 1 << (log_n - layer - 1)
        layer_idx = jnp.remainder(idx, half)
        rows = _pack_leaves(codewords[layer])
        leaf = (rows[0][layer_idx], rows[1][layer_idx])  # (q, 4)
        paths = jax.vmap(lambda i, t=trees[layer]: merkle.prove(t, i))(layer_idx)
        query_leaves.append(leaf)
        query_paths.append(paths)
        idx = layer_idx  # index into next codeword (size = this half*... )

    proof = FriProof(
        caps=[t.cap for t in trees],
        final_coeffs=final_coeffs,
        query_leaves=query_leaves,
        query_paths=query_paths,
        pow_nonce=pow_nonce,
    )
    # indices are returned so an outer protocol (the STARK) can open its own
    # commitments at the same query positions
    return proof, indices


# ---------------------------------------------------------------------------
# Verifier
# ---------------------------------------------------------------------------

def transcript(proof: FriProof, log_n: int, challenger: Challenger,
               config: FriConfig):
    """Drive the FRI transcript (caps → betas, final coeffs, pow, query
    indices). Sequential by construction; the value checks live in
    `check` so they can run under one jitted program."""
    num_layers = config.num_layers(log_n)
    assert len(proof.caps) == num_layers

    betas = []
    for layer in range(num_layers):
        challenger.observe_digests(proof.caps[layer])
        b = challenger.squeeze_ext(1)
        betas.append(((b[0][0][0], b[0][1][0]), (b[1][0][0], b[1][1][0])))

    fc = proof.final_coeffs
    challenger.observe((jnp.concatenate([fc[0][0], fc[1][0]]),
                        jnp.concatenate([fc[0][1], fc[1][1]])))

    challenger.observe((jnp.atleast_1d(proof.pow_nonce[0]),
                        jnp.atleast_1d(proof.pow_nonce[1])))
    resp = challenger.squeeze(1)
    indices = challenger.squeeze_indices(config.num_queries, log_n - 1)
    return betas, resp, indices


def check(proof: FriProof, log_n: int, config: FriConfig, betas, resp,
          indices):
    """The non-transcript half of FRI verification (jittable): pow mask,
    per-layer Merkle membership + fold consistency, final-poly match.
    Returns (ok, layer0 (a, b, leaf_idx))."""
    num_layers = config.num_layers(log_n)
    ok = jnp.asarray(True)
    if config.pow_bits > 0:
        pmask = jnp.uint32((1 << config.pow_bits) - 1)
        ok = ok & ((resp[0][0] & pmask) == 0)
    q = config.num_queries
    idx = indices
    # current claimed value per query, set from layer-0 leaves
    cur = None
    layer0_vals = None

    for layer in range(num_layers):
        half = 1 << (log_n - layer - 1)
        layer_idx = jnp.remainder(idx, half)
        leaf = proof.query_leaves[layer]   # (q, 4)
        paths = proof.query_paths[layer]   # (q, depth, 4)

        # Merkle check (batched across queries)
        mok = merkle.verify_batch(proof.caps[layer], layer_idx, leaf, paths)
        ok = ok & jnp.all(mok)

        a = ((leaf[0][:, 0], leaf[1][:, 0]), (leaf[0][:, 1], leaf[1][:, 1]))  # f(x)
        b = ((leaf[0][:, 2], leaf[1][:, 2]), (leaf[0][:, 3], leaf[1][:, 3]))  # f(-x)

        if layer == 0:
            layer0_vals = (a, b, layer_idx)
        else:
            # consistency: previous fold result must equal this layer's
            # codeword at position prev_idx: first half -> a, else -> b
            took_first = idx < half
            expect = ext.select(took_first, a, b)
            ok = ok & jnp.all(ext.eq(cur, expect))

        # fold to next layer value
        shift, _, llog = _layer_domain(log_n, layer)
        table = _root_pow_table(log_n, layer)
        w_i = _pow_traced(table, layer_idx, llog - 1 if llog > 1 else 1)
        x = gl.mul(gl.full((q,), shift), w_i)
        inv2x = gl.inv(gl.mul(gl.full((q,), 2), x))
        inv2 = gl.full((q,), INV2)
        s = ext.mul_base(ext.add(a, b), inv2)
        d = ext.mul_base(ext.sub(a, b), inv2x)
        beta = betas[layer]
        beta_b = ((jnp.broadcast_to(beta[0][0], (q,)), jnp.broadcast_to(beta[0][1], (q,))),
                  (jnp.broadcast_to(beta[1][0], (q,)), jnp.broadcast_to(beta[1][1], (q,))))
        cur = ext.add(s, ext.mul(d, beta_b))
        idx = layer_idx

    # final: evaluate final poly at the folded domain point
    shift, _, llog = _layer_domain(log_n, num_layers)
    table = _root_pow_table(log_n, num_layers)
    w_i = _pow_traced(table, idx, max(llog, 1))
    x = gl.mul(gl.full((q,), shift), w_i)
    fc = proof.final_coeffs
    fl = fc[0][0].shape[0]
    acc = ((jnp.broadcast_to(fc[0][0][fl - 1], (q,)), jnp.broadcast_to(fc[0][1][fl - 1], (q,))),
           (jnp.broadcast_to(fc[1][0][fl - 1], (q,)), jnp.broadcast_to(fc[1][1][fl - 1], (q,))))
    for i in range(fl - 2, -1, -1):
        c = ((jnp.broadcast_to(fc[0][0][i], (q,)), jnp.broadcast_to(fc[0][1][i], (q,))),
             (jnp.broadcast_to(fc[1][0][i], (q,)), jnp.broadcast_to(fc[1][1][i], (q,))))
        acc = ext.add(ext.mul_base(acc, x), c)
    ok = ok & jnp.all(ext.eq(cur, acc))

    return ok, layer0_vals


@partial(jax.jit, static_argnames=("log_n", "config"))
def _check_jit(proof: FriProof, log_n: int, config: FriConfig, betas, resp,
               indices):
    return check(proof, log_n, config, betas, resp, indices)


def verify(proof: FriProof, log_n: int, challenger: Challenger,
           config: FriConfig):
    """Returns (ok: bool scalar, indices (q,), layer0 (a, b, leaf_idx)).

    The caller must drive `challenger` identically to the prover before
    this call, and is responsible for checking the returned layer-0
    openings against the outer protocol (DEEP composition values).
    Transcript runs eagerly (inherently sequential); the value checks run
    under ONE jitted program on accelerators (the eager per-layer Merkle
    walks were ~150 tunnel dispatches of warm verify latency)."""
    from .prover import phase_jit_enabled
    betas, resp, indices = transcript(proof, log_n, challenger, config)
    if phase_jit_enabled():
        ok, layer0 = _check_jit(proof, log_n, config, betas, resp, indices)
    else:
        ok, layer0 = check(proof, log_n, config, betas, resp, indices)
    return ok, indices, layer0
