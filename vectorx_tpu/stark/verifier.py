"""DEEP-ALI STARK verifier — mirrors prover.py's transcript exactly.

Checks, all under one jit:
  1. ALI at ζ: the AIR constraints evaluated at the opened trace values,
     combined with α-powers and divided by the vanishing polys, must equal
     the opened quotient Q(ζ) = Σ ζ^{iN}·chunk_i(ζ).
  2. Merkle membership of every opened trace/quotient row at the FRI query
     positions (both halves of each FRI leaf pair).
  3. The FRI layer-0 codeword values equal the DEEP composition recomputed
     from the opened rows.
  4. The FRI fold/final-poly consistency (fri.verify).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from ..field import goldilocks as gl
from ..field import ext
from ..poly import domain as pdom
from . import fri, merkle
from .air import Air, ExtAlgebra
from .challenger import Challenger
from .prover import (StarkConfig, StarkProof, _alpha_power_array, _broadcast_ext,
                     _ext_col, _ext_row, _ext_sum0, _lookup_constraint_evals,
                     _pick_ext, _ramp_fp, _recombine_u, _slice_ext,
                     _weighted_sum0, num_quotient_chunks)

P = gl.MODULUS


def _ali_phase_fn(air: Air, log_n: int, has_lk: bool, n_consts: int):
    ram_spec = air.ram_multiset()
    """Build the traceable ALI-at-ζ check for one AIR/shape.

    Constant columns arrive as OPENED values (const_zeta/const_gzeta) —
    bound to the preprocessed-constant VK through DEEP + Merkle membership
    (prover.constant_vk), never barycentric-evaluated here. This is what
    lets the in-AIR recursive verifier (recursion_air.py) run the same
    check in O(num_consts) rows instead of O(n)."""
    n = 1 << log_n
    num_cols = air.num_cols
    n_chunks = num_quotient_chunks(air)
    g_dom = gl.primitive_root_of_unity(log_n)
    g_last = pow(g_dom, n - 1, P)

    def fn(trace_zeta, trace_gzeta, quotient_zeta, aux_zeta, aux_gzeta,
           publics, alpha, zeta, gamma, delta, const_zeta, const_gzeta):
        alg = ExtAlgebra()
        local = [_pick_ext(trace_zeta, c) for c in range(num_cols)]
        nxt = [_pick_ext(trace_gzeta, c) for c in range(num_cols)]
        consts = [_pick_ext(const_zeta, i) for i in range(n_consts)]
        consts_next = [_pick_ext(const_gzeta, i) for i in range(n_consts)]
        ct = air.transition(alg, local, nxt, publics, consts, consts_next)
        cf = air.first_row(alg, local, publics, consts)
        cl = air.last_row(alg, local, publics, consts)

        if has_lk:
            from .prover import _padded_lk
            lk_p = _padded_lk(air.lookup_range_columns())
            kk2 = len(lk_p) // 2

            def aux_at(op, i):
                return _recombine_u(_pick_ext(op, 2 * i),
                                    _pick_ext(op, 2 * i + 1))

            def aux_slice_g(op):
                re_g = ((op[0][0][0:2 * kk2:2], op[0][1][0:2 * kk2:2]),
                        (op[1][0][0:2 * kk2:2], op[1][1][0:2 * kk2:2]))
                im_g = ((op[0][0][1:2 * kk2:2], op[0][1][1:2 * kk2:2]),
                        (op[1][0][1:2 * kk2:2], op[1][1][1:2 * kk2:2]))
                return _recombine_u(re_g, im_g)

            invs_g = aux_slice_g(aux_zeta)
            inv_t_z = aux_at(aux_zeta, kk2)
            m_z = _pick_ext(aux_zeta, 2 * kk2 + 2)
            s_z = _recombine_u(_pick_ext(aux_zeta, 2 * kk2 + 3),
                               _pick_ext(aux_zeta, 2 * kk2 + 4))
            s_gz = _recombine_u(_pick_ext(aux_gzeta, 2 * kk2 + 3),
                                _pick_ext(aux_gzeta, 2 * kk2 + 4))
            ci = jnp.asarray(lk_p, dtype=jnp.int32)
            w_all = ((trace_zeta[0][0][ci], trace_zeta[0][1][ci]),
                     (trace_zeta[1][0][ci], trace_zeta[1][1][ci]))

            def wslice(sl):
                return ((w_all[0][0][sl], w_all[0][1][sl]),
                        (w_all[1][0][sl], w_all[1][1][sl]))

            w0_g = wslice(slice(0, None, 2))
            w1_g = wslice(slice(1, None, 2))
            # table ramp: an ordinary aux opening (committed column),
            # NOT a barycentric — see prover.py aux layout
            t_z = _pick_ext(aux_zeta, 2 * kk2 + 5)
            t_gz = _pick_ext(aux_gzeta, 2 * kk2 + 5)
            lk_e, lk_t, lk_f, lk_l = _lookup_constraint_evals(
                gamma, w0_g, w1_g, invs_g, inv_t_z, m_z, s_z, s_gz,
                t_z, t_gz)
        else:
            lk_e, lk_t, lk_f, lk_l = [], [], [], []

        if ram_spec is not None:
            from .prover import _ram_constraint_evals
            mult_c, ld_c, ad_c, act_c, val_col = ram_spec
            base_r = (2 * kk2 + 6) if has_lk else 0
            inv_z = _recombine_u(_pick_ext(aux_zeta, base_r),
                                 _pick_ext(aux_zeta, base_r + 1))
            sR_z = _recombine_u(_pick_ext(aux_zeta, base_r + 2),
                                _pick_ext(aux_zeta, base_r + 3))
            sR_gz = _recombine_u(_pick_ext(aux_gzeta, base_r + 2),
                                 _pick_ext(aux_gzeta, base_r + 3))
            r_e, r_t, r_f, r_l = _ram_constraint_evals(
                gamma, delta, _pick_ext(const_zeta, ad_c),
                _pick_ext(const_zeta, mult_c),
                _pick_ext(const_zeta, ld_c),
                _pick_ext(const_zeta, act_c),
                _pick_ext(trace_zeta, val_col), inv_z, sR_z, sR_gz)
            lk_e = lk_e + r_e
            lk_t = lk_t + r_t
            lk_f = lk_f + r_f
            lk_l = lk_l + r_l

        import numpy as _np

        def _gsize(c):
            g = c[0][0].shape
            return int(_np.prod(g)) if g else 1

        n_constraints = sum(_gsize(c)
                            for c in ct + cf + cl + lk_t + lk_f + lk_l + lk_e)
        alphas_arr = _alpha_power_array(alpha, n_constraints)

        def comb(cs, k0, acc):
            k = k0
            for c in cs:
                m = _gsize(c)
                cc = ((c[0][0].reshape(m), c[0][1].reshape(m)),
                      (c[1][0].reshape(m), c[1][1].reshape(m)))
                term = ext.mul(_slice_ext(alphas_arr, k, k + m), cc)
                acc = ext.add(acc, _ext_sum0(term))
                k += m
            return acc, k

        k = 0
        ct_c, k = comb(ct, k, ext.zeros(()))
        ct_c, k = comb(lk_t, k, ct_c)
        cf_c, k = comb(cf, k, ext.zeros(()))
        cf_c, k = comb(lk_f, k, cf_c)
        cl_c, k = comb(cl, k, ext.zeros(()))
        cl_c, k = comb(lk_l, k, cl_c)
        ce_c, k = comb(lk_e, k, ext.zeros(()))

        zeta_n = ext.pow_const(zeta, n)
        one = ext.ones(())
        zh = ext.sub(zeta_n, one)                     # ζ^N - 1
        zeta_m_glast = ext.sub(zeta, ext.from_base(gl.full((), g_last)))
        zeta_m_1 = ext.sub(zeta, one)

        inv_zh = ext.inv(zh)
        expected_q = ext.add(
            ext.add(
                ext.mul(ext.mul(ct_c, zeta_m_glast), inv_zh),
                ext.mul(cf_c, ext.inv(zeta_m_1))),
            ext.add(ext.mul(cl_c, ext.inv(zeta_m_glast)),
                    ext.mul(ce_c, inv_zh)))

        opened_q = ext.zeros(())
        for i in range(n_chunks):
            zpow = ext.pow_const(zeta_n, i) if i > 0 else one
            opened_q = ext.add(opened_q,
                               ext.mul(zpow, _pick_ext(quotient_zeta, i)))
        return jnp.all(ext.eq(expected_q, opened_q))

    return fn


_SHARED_VJIT: dict = {}
_SHARED_DJIT: dict = {}


def _deep_phase_fn(num_cols: int, n_aux: int, n_consts: int, n_chunks: int,
                   q: int, log_n_lde: int, shift: int, has_aux: bool,
                   has_consts: bool):
    """Build the (traceable) DEEP recomputation for one AIR/shape: both
    query sides' F(x) from the opened rows + ζ-openings, under one
    program. Pure function of its arguments so the compiled program is
    reused across proofs (closure-captured proof arrays would bake into
    the executable as constants and force a recompile per proof)."""
    n_terms = 2 * num_cols + 2 * n_aux + 2 * n_consts + n_chunks

    def fn(beta, zeta, g_zeta, idx_a, idx_b, rows_a, rows_b, opens):
        (tz, tgz, az, agz, cz, cgz, qz) = opens
        betas_arr = _alpha_power_array(beta, n_terms)
        x_all = pdom.domain_points(log_n_lde, shift)

        def deep_at(idx, rows):
            trace_rows, quot_rows, aux_rows, const_rows = rows
            x = (x_all[0][idx], x_all[1][idx])            # (q,) base
            xe = ext.from_base(x)
            inv_xz = ext.inv(ext.sub(xe, _broadcast_ext(zeta, q)))
            inv_xgz = ext.inv(ext.sub(xe, _broadcast_ext(g_zeta, q)))

            tv = ext.from_base((trace_rows[0].T, trace_rows[1].T))  # (C, q)
            diff_z = ext.sub(tv, _ext_col(tz))
            F = _weighted_sum0(ext.mul(diff_z, _ext_row(inv_xz)),
                               _slice_ext(betas_arr, 0, num_cols))
            diff_gz = ext.sub(tv, _ext_col(tgz))
            F = ext.add(F, _weighted_sum0(
                ext.mul(diff_gz, _ext_row(inv_xgz)),
                _slice_ext(betas_arr, num_cols, 2 * num_cols)))
            kbase = 2 * num_cols
            if has_aux:
                av = ext.from_base((aux_rows[0].T, aux_rows[1].T))  # (A, q)
                diff_az = ext.sub(av, _ext_col(az))
                F = ext.add(F, _weighted_sum0(
                    ext.mul(diff_az, _ext_row(inv_xz)),
                    _slice_ext(betas_arr, kbase, kbase + n_aux)))
                diff_agz = ext.sub(av, _ext_col(agz))
                F = ext.add(F, _weighted_sum0(
                    ext.mul(diff_agz, _ext_row(inv_xgz)),
                    _slice_ext(betas_arr, kbase + n_aux,
                               kbase + 2 * n_aux)))
                kbase += 2 * n_aux
            if has_consts:
                cv = ext.from_base((const_rows[0].T, const_rows[1].T))
                diff_cz = ext.sub(cv, _ext_col(cz))
                F = ext.add(F, _weighted_sum0(
                    ext.mul(diff_cz, _ext_row(inv_xz)),
                    _slice_ext(betas_arr, kbase, kbase + n_consts)))
                diff_cgz = ext.sub(cv, _ext_col(cgz))
                F = ext.add(F, _weighted_sum0(
                    ext.mul(diff_cgz, _ext_row(inv_xgz)),
                    _slice_ext(betas_arr, kbase + n_consts,
                               kbase + 2 * n_consts)))
                kbase += 2 * n_consts
            qv = ((quot_rows[0][:, 0::2].T, quot_rows[1][:, 0::2].T),
                  (quot_rows[0][:, 1::2].T, quot_rows[1][:, 1::2].T))
            diff_q = ext.sub(qv, _ext_col(qz))
            F = ext.add(F, _weighted_sum0(
                ext.mul(diff_q, _ext_row(inv_xz)),
                _slice_ext(betas_arr, kbase, n_terms)))
            return F

        return deep_at(idx_a, rows_a), deep_at(idx_b, rows_b)

    return fn


def _ali_phase(air: Air, log_n: int, proof: StarkProof, publics, alpha,
               zeta, gamma, n_consts: int, delta_r=None) -> jax.Array:
    from .prover import phase_jit_enabled, _phase_cache
    has_lk = len(air.lookup_range_columns()) > 0
    has_aux = has_lk or air.ram_multiset() is not None
    cache = _phase_cache(air, "_vx_vjit", _SHARED_VJIT)
    key = (log_n, len(publics), phase_jit_enabled())
    if key not in cache:
        fn = _ali_phase_fn(air, log_n, has_lk, n_consts)
        cache[key] = jax.jit(fn) if phase_jit_enabled() else fn
    dummy = ((jnp.zeros((0,), jnp.uint32),) * 2,) * 2
    cz = proof.const_zeta if n_consts else dummy
    cgz = proof.const_gzeta if n_consts else dummy
    unit = ext.zeros(())
    if has_aux:
        return cache[key](proof.trace_zeta, proof.trace_gzeta,
                          proof.quotient_zeta, proof.aux_zeta,
                          proof.aux_gzeta, publics, alpha, zeta,
                          gamma if gamma is not None else unit,
                          delta_r if delta_r is not None else unit,
                          cz, cgz)
    return cache[key](proof.trace_zeta, proof.trace_gzeta,
                      proof.quotient_zeta, dummy, dummy,
                      publics, alpha, zeta, unit, unit, cz, cgz)


def verify(air: Air, proof: StarkProof, publics: List[gl.Fp], log_n: int,
           config: StarkConfig, challenger: Challenger | None = None) -> jax.Array:
    if challenger is None:
        challenger = Challenger.new()
    num_cols = air.num_cols
    n = 1 << log_n
    rate = config.rate_bits
    n_lde = n << rate
    log_n_lde = log_n + rate
    n_chunks = num_quotient_chunks(air)
    g_dom = gl.primitive_root_of_unity(log_n)
    g_last = pow(g_dom, n - 1, P)
    shift = gl.MULTIPLICATIVE_GROUP_GENERATOR
    q = config.num_queries

    # -- preprocessed-constant VK: recomputed from the AIR itself (cached),
    # NEVER read from the proof ------------------------------------------
    from .prover import constant_vk
    vk = constant_vk(air, log_n, config)
    has_consts = vk is not None
    n_consts = vk[2][0].shape[0] if has_consts else 0

    # -- transcript replay -------------------------------------------------
    challenger.observe((jnp.stack([p[0] for p in publics]),
                        jnp.stack([p[1] for p in publics])))
    if has_consts:
        challenger.observe_digests(vk[0].cap)
    challenger.observe_digests(proof.trace_cap)

    lk_cols = air.lookup_range_columns()
    has_lk = len(lk_cols) > 0
    has_ram = air.ram_multiset() is not None
    has_aux = has_lk or has_ram
    gamma = delta_r = None
    if has_aux:
        gamma = challenger.squeeze_ext(1)
        gamma = ((gamma[0][0][0], gamma[0][1][0]),
                 (gamma[1][0][0], gamma[1][1][0]))
        if has_ram:
            delta_r = challenger.squeeze_ext(1)
            delta_r = ((delta_r[0][0][0], delta_r[0][1][0]),
                       (delta_r[1][0][0], delta_r[1][1][0]))
        challenger.observe_digests(proof.aux_cap)

    alpha = challenger.squeeze_ext(1)
    alpha = ((alpha[0][0][0], alpha[0][1][0]), (alpha[1][0][0], alpha[1][1][0]))
    challenger.observe_digests(proof.quotient_cap)
    zeta = challenger.squeeze_ext(1)
    zeta = ((zeta[0][0][0], zeta[0][1][0]), (zeta[1][0][0], zeta[1][1][0]))

    def obs_ext(v):
        challenger.observe((jnp.concatenate([jnp.atleast_1d(v[0][0]), jnp.atleast_1d(v[1][0])]),
                            jnp.concatenate([jnp.atleast_1d(v[0][1]), jnp.atleast_1d(v[1][1])])))

    obs_ext(proof.trace_zeta)
    obs_ext(proof.trace_gzeta)
    if has_aux:
        obs_ext(proof.aux_zeta)
        obs_ext(proof.aux_gzeta)
    if has_consts:
        obs_ext(proof.const_zeta)
        obs_ext(proof.const_gzeta)
    obs_ext(proof.quotient_zeta)
    beta = challenger.squeeze_ext(1)
    beta = ((beta[0][0][0], beta[0][1][0]), (beta[1][0][0], beta[1][1][0]))

    # -- 1: ALI consistency at ζ (ONE jitted program per air/shape — the
    # eager scalar version costs thousands of tiny dispatches) -------------
    import numpy as np
    ok = _ali_phase(air, log_n, proof, publics, alpha, zeta, gamma,
                    n_consts, delta_r)
    import os as _os
    if _os.environ.get("VX_VERIFY_DEBUG"):
        print("ALI:", bool(ok))

    # -- 4: FRI (also yields query indices + layer-0 values) ---------------
    fri_ok, indices, layer0 = fri.verify(proof.fri_proof, log_n_lde,
                                         challenger, config.fri_config)
    ok = ok & fri_ok
    a_vals, b_vals, leaf_idx = layer0    # F(x) at idx and idx+half

    # -- 2: Merkle membership of openings ----------------------------------
    half = n_lde // 2
    idx_a = indices
    idx_b = indices + half

    def check_rows(cap, idx, rows, paths):
        return jnp.all(merkle.verify_batch(cap, idx, rows, paths))

    ok = ok & check_rows(proof.trace_cap, idx_a, proof.trace_rows_a, proof.trace_paths_a)
    ok = ok & check_rows(proof.trace_cap, idx_b, proof.trace_rows_b, proof.trace_paths_b)
    ok = ok & check_rows(proof.quotient_cap, idx_a, proof.quot_rows_a, proof.quot_paths_a)
    ok = ok & check_rows(proof.quotient_cap, idx_b, proof.quot_rows_b, proof.quot_paths_b)
    if has_aux:
        ok = ok & check_rows(proof.aux_cap, idx_a, proof.aux_rows_a,
                             proof.aux_paths_a)
        ok = ok & check_rows(proof.aux_cap, idx_b, proof.aux_rows_b,
                             proof.aux_paths_b)
    if has_consts:
        # membership against the verifier's OWN (recomputed) VK cap
        ok = ok & check_rows(vk[0].cap, idx_a, proof.const_rows_a,
                             proof.const_paths_a)
        ok = ok & check_rows(vk[0].cap, idx_b, proof.const_rows_b,
                             proof.const_paths_b)

    # -- 3: DEEP composition recomputation at query points ------------------
    # ONE cached program per (air, shape) covering both query sides —
    # the eager closure was ~100 tunnel dispatches of warm verify latency
    g_zeta = ext.mul_base(zeta, gl.full((), g_dom))
    n_aux = proof.aux_zeta[0][0].shape[0] if has_aux else 0

    from .prover import _phase_cache, phase_jit_enabled
    dcache = _phase_cache(air, "_vx_djit", _SHARED_DJIT)
    dkey = ("deep", log_n, rate, q, n_aux, n_consts, phase_jit_enabled())
    if dkey not in dcache:
        fn = _deep_phase_fn(num_cols, n_aux, n_consts, n_chunks, q,
                            log_n_lde, shift, has_aux, has_consts)
        dcache[dkey] = jax.jit(fn) if phase_jit_enabled() else fn
    opens = (proof.trace_zeta, proof.trace_gzeta,
             proof.aux_zeta if has_aux else None,
             proof.aux_gzeta if has_aux else None,
             proof.const_zeta if has_consts else None,
             proof.const_gzeta if has_consts else None,
             proof.quotient_zeta)
    rows_a = (proof.trace_rows_a, proof.quot_rows_a,
              proof.aux_rows_a if has_aux else None,
              proof.const_rows_a if has_consts else None)
    rows_b = (proof.trace_rows_b, proof.quot_rows_b,
              proof.aux_rows_b if has_aux else None,
              proof.const_rows_b if has_consts else None)
    F_a, F_b = dcache[dkey](beta, zeta, g_zeta, idx_a, idx_b, rows_a,
                            rows_b, opens)
    if _os.environ.get("VX_VERIFY_DEBUG"):
        print("FRI:", bool(fri_ok), "after merkle:", bool(ok),
              "deep_a:", bool(jnp.all(ext.eq(F_a, a_vals))),
              "deep_b:", bool(jnp.all(ext.eq(F_b, b_vals))))
    ok = ok & jnp.all(ext.eq(F_a, a_vals)) & jnp.all(ext.eq(F_b, b_vals))

    return ok
