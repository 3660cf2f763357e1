"""Quotient polynomial evaluation and chunk decomposition.

TPU-native re-design of `machine/src/quotient.rs`: instead of a packed SIMD
row loop, the entire quotient domain is evaluated at once as fused XLA array
ops — every constraint is a vector expression over [Q]-length Montgomery
arrays, `next` rows are wraparound rolls, and the zerofier inverse is a
closed-form periodic vector.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from ..backend import xp_of
from ..field import babybear as bb
from ..field import ext as extf
from ..poly import ntt as nttm
from ..poly.domain import ZerofierOnCoset, coset_points
from .builder import VectorBuilder, VVal, SymbolicBuilder
from .lookup import eval_permutation_constraints


def get_log_quotient_degree(machine, chip) -> int:
    """ceil(log2(max(deg, 3) - 1)) — `symbolic_builder.rs:17-30`."""
    b = SymbolicBuilder(machine, chip)
    chip.eval(b)
    deg = max(b.max_degree, 3)
    return max((deg - 2).bit_length(), 0) if deg > 1 else 0


def _ext_cols_to_vvals(mat_m, n_ext):
    """[Q, n_ext*5] base monty -> list of n_ext VVal ext values [Q,5]."""
    out = []
    for i in range(n_ext):
        out.append(VVal(mat_m[:, i * 5 : (i + 1) * 5], True))
    return out


def resolve_chunk(env_name: str, default: int) -> int:
    """Row-tile size from the environment, rounded DOWN to a power of two
    (tiles must divide the power-of-two domain); 0 disables chunking."""
    v = int(os.environ.get(env_name, default))
    if v <= 0:
        return 0
    return 1 << (v.bit_length() - 1)


def quotient_values(machine, chip, log_degree, log_quotient_degree,
                    prep_lde, main_lde, perm_lde, cumulative_sum,
                    perm_challenges, alpha, pcs_shift, log_blowup,
                    chunk=None):
    """Evaluate the folded constraint polynomial / Z_H on the quotient
    domain (natural order).  LDE inputs are Montgomery, natural order,
    height N·2^log_blowup.  Returns ext array [N·2^qd, 5] monty.

    chunk: resolved row-tile size (power of two; None = read the
    VALIDA_TPU_QUOTIENT_CHUNK env default here).  Callers that cache the
    traced stage must pass the resolved value and key their cache on it
    (ADVICE r4: env reads inside the trace made cache layers disagree)."""
    qd = log_quotient_degree
    stride = 1 << (log_blowup - qd)
    q_size = 1 << (log_degree + qd)
    next_step = 1 << qd

    main = main_lde[::stride]
    perm = perm_lde[::stride]
    prep = prep_lde[::stride] if prep_lde is not None else None
    xp = xp_of(main)

    def window(arr):
        if arr is None:
            return [], []
        local = [VVal(arr[:, c], False) for c in range(arr.shape[1])]
        rolled = xp.roll(arr, -next_step, axis=0)
        nxt = [VVal(rolled[:, c], False) for c in range(arr.shape[1])]
        return local, nxt

    main_rolled = xp.roll(main, -next_step, axis=0)
    prep_rolled = xp.roll(prep, -next_step, axis=0) if prep is not None \
        else None
    n_perm_ext = perm.shape[1] // 5
    perm_rolled = xp.roll(perm, -next_step, axis=0)

    zc = ZerofierOnCoset(log_degree, qd, pcs_shift)
    g_sub = bb.two_adic_generator(log_degree)
    sub_last = bb.monty_scalar(bb.h_inv(g_sub))
    if xp is np:
        xs = coset_points(log_degree + qd, pcs_shift)
        first_v = zc.lagrange_basis_unnormalized(0)
        last_v = zc.lagrange_basis_unnormalized((1 << log_degree) - 1)
        zinv = zc.zerofier_inv_evals()
    else:
        # build the [Q] selector vectors IN-GRAPH: baked host constants
        # at 2^23 points are ~32 MB of StableHLO payload EACH, and the
        # remote compile service caps the request body (HTTP 413).  Same
        # arithmetic as the host branch -> bit-identical values.
        from ..poly.domain import coset_points_device

        xs = coset_points_device(log_degree + qd, pcs_shift)
        z_full = jnp.tile(jnp.asarray(zc._z_period), 1 << log_degree)
        zinv = jnp.tile(jnp.asarray(zc._zinv_period), 1 << log_degree)
        first_v = bb.mul(z_full, bb.inv(
            bb.sub(xs, np.uint32(bb.monty_scalar(1)))))
        last_v = bb.mul(z_full, bb.inv(bb.sub(xs, np.uint32(sub_last))))
    trans_v = bb.sub(xs, np.uint32(sub_last))

    def ext_const(e):
        if isinstance(e, tuple):
            e = np.array(e, dtype=np.uint32)
        return VVal(bb.to_monty(xp.asarray(e)), True)

    def eval_rows(m_l, m_n, p_l, p_n, pe_l, pe_n, tr, fi, la, zi):
        """Fold all constraints over one row block (any length)."""
        builder = VectorBuilder(
            machine,
            main_local=[VVal(m_l[:, c], False) for c in range(m_l.shape[1])],
            main_next=[VVal(m_n[:, c], False) for c in range(m_n.shape[1])],
            prep_local=([VVal(p_l[:, c], False)
                         for c in range(p_l.shape[1])] if p_l is not None
                        else []),
            prep_next=([VVal(p_n[:, c], False)
                        for c in range(p_n.shape[1])] if p_n is not None
                       else []),
            perm_local=_ext_cols_to_vvals(pe_l, n_perm_ext),
            perm_next=_ext_cols_to_vvals(pe_n, n_perm_ext),
            perm_challenges=[ext_const(perm_challenges[i]) for i in range(3)],
            is_first_row=VVal(fi, False),
            is_last_row=VVal(la, False),
            is_transition=VVal(tr, False),
            alpha=ext_const(alpha),
            mode="quotient",
            trace_height=1 << log_degree,
        )
        chip.eval(builder)
        eval_permutation_constraints(chip, builder, cumulative_sum)
        builder.fold()
        acc = builder.accumulator
        if acc is None:
            return xp.zeros((m_l.shape[0], 5), dtype=np.uint32)
        return extf.ext_mul_base(acc._as_ext(), zi)

    # Row-chunked evaluation (device only, large domains): the one-shot
    # fused graph keeps every constraint intermediate live at [Q, 5] —
    # at 2^20 rows the widest chips exceed HBM at COMPILE time (measured:
    # 15.91G/15.75G).  lax.map traces the fold once and runs it per row
    # tile, bounding temps at [chunk, 5]; values are bit-identical
    # (row-wise expressions, rolls precomputed globally).
    if chunk is None:
        chunk = resolve_chunk("VALIDA_TPU_QUOTIENT_CHUNK", 1 << 15)
    if xp is not np and chunk and q_size > chunk:
        import jax

        nch = q_size // chunk

        def rs(a):
            return a.reshape((nch, chunk) + a.shape[1:])

        ops = dict(
            m_l=rs(main), m_n=rs(main_rolled),
            pe_l=rs(perm), pe_n=rs(perm_rolled),
            tr=rs(trans_v), fi=rs(first_v), la=rs(last_v), zi=rs(zinv),
        )
        if prep is not None:
            ops["p_l"] = rs(prep)
            ops["p_n"] = rs(prep_rolled)

        def body(o):
            return eval_rows(o["m_l"], o["m_n"], o.get("p_l"), o.get("p_n"),
                             o["pe_l"], o["pe_n"], o["tr"], o["fi"],
                             o["la"], o["zi"])

        out = jax.lax.map(body, ops)
        return out.reshape(q_size, 5)

    return eval_rows(main, main_rolled, prep, prep_rolled, perm, perm_rolled,
                     trans_v, first_v, last_v, zinv)


def decompose_and_flatten(q_vals, pcs_shift, log_quotient_degree):
    """Quotient evals on coset shift·K (size N·2^qd, natural, ext monty)
    -> chunk matrix [N, 2^qd * 5] canonical, chunks in bit-reversed order.

    Chunk_i holds coefficients j = i (mod 2^qd) of Q, evaluated on the
    coset shift^{2^qd}·H_N; verifier recombines Q(z) = sum_i z^i *
    chunk_{rev(i)}(z^{2^qd}) (`machine/src/verify.rs:94-105`).
    """
    qd = log_quotient_degree
    q = q_vals.shape[0]
    n = q >> qd
    coeffs = nttm.coset_intt(q_vals, pcs_shift)  # [Q, 5]
    shift_chunk = bb.h_exp(pcs_shift, 1 << qd)
    chunks = []
    rev = nttm.bitrev_indices(qd) if qd > 0 else np.array([0])
    chunk_list = [coeffs[i :: 1 << qd] for i in range(1 << qd)]
    for i in np.asarray(rev):
        evals = nttm.coset_eval_from_coeffs(chunk_list[int(i)], shift_chunk)
        chunks.append(np.asarray(bb.from_monty(evals)))
    return np.concatenate(chunks, axis=1).reshape(n, (1 << qd) * 5)
