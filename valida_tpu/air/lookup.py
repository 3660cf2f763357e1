"""LogUp-style bus lookup engine.

Vectorized transcription of `generate_permutation_trace` /
`eval_permutation_constraints` / `generate_rlc_elements`
(`/root/reference/machine/src/chip.rs:121-331`):

* per interaction m, reciprocal column q_m(row) = 1/(alpha_bus + sum_j
  beta^j f_{m,j}(row));
* running-sum column phi accumulating +q*count for sends, -q*count for
  receives — a modular prefix sum computed with `lax.associative_scan`
  (which also shards across a device mesh, SURVEY.md §5.7);
* AIR side re-asserts the reciprocals and the telescoping sum; the machine
  verifier closes the argument with sum(cumulative_sums) == 0.

alpha_local[i] = ch0^{i+1}, alpha_global[i] = ch1^{i+1}, betas = ch2^j
(from j = 0) — matching `generate_rlc_elements`' `.powers().skip(1)`.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..backend import asarray, is_jax, xp_of
from ..field import babybear as bb
from ..field import ext as extf
from .types import SEND, RECEIVE, Interaction


def rlc_alphas(chip, machine, challenges):
    """(alphas_local, alphas_global) keyed by bus index (host ext tuples)."""
    def max_bus(interactions):
        idxs = [i.bus.index for i in interactions]
        return (max(idxs) + 1) if idxs else 1

    n_local = max_bus(chip.local_sends() + chip.local_receives())
    n_global = max_bus(chip.global_sends(machine) + chip.global_receives(machine))
    local = extf.e_powers(challenges[0], n_local + 1)[1:]
    glob = extf.e_powers(challenges[1], n_global + 1)[1:]
    return local, glob


def _interaction_rlc_device(interaction, betas_m, alpha_m, prep_m, main_m):
    """RLC over all rows: [N, 5] ext monty.

    betas_m: list of [5] monty arrays; alpha_m: [5] monty array.
    """
    xp = xp_of(main_m)
    n = main_m.shape[0]
    acc = xp.zeros((n, 5), dtype=np.uint32)
    for j, field in enumerate(interaction.fields):
        fvals = _apply_vpcol_device(field, prep_m, main_m)  # [N] base monty
        acc = bb.add(acc, bb.mul(fvals[:, None], betas_m[j][None, :]))
    return bb.add(acc, alpha_m[None, :])


def _apply_vpcol_device(vp, prep_m, main_m):
    xp = xp_of(main_m)
    n = main_m.shape[0]
    acc = xp.full((n,), np.uint32(bb.monty_scalar(vp.constant)), dtype=np.uint32)
    for (trace, idx), w in vp.weights:
        col = main_m[:, idx] if trace == "main" else prep_m[:, idx]
        if w == 1:
            acc = bb.add(acc, col)
        else:
            acc = bb.add(acc, bb.mul(col, np.uint32(bb.monty_scalar(w))))
    return acc


def _ext_powers_arr(ch_m, count, skip_first=False):
    """Powers of a [5] monty ext array: [ch^1..] if skip_first else [1, ch..]."""
    out = []
    acc = ch_m
    if not skip_first:
        one = np.zeros(5, dtype=np.uint32)
        one[0] = bb.ONE
        xp = xp_of(ch_m)
        out.append(xp.asarray(one))
        count -= 1
    for _ in range(count):
        out.append(acc)
        acc = extf.ext_mul(acc, ch_m)
    return out


def perm_cols_and_terms(machine, chip, main_m, prep_m, challenges):
    """Row-parallel part of the permutation trace: the reciprocal columns
    q_m and the per-row phi increments (sum of +-q*count).  main_m/prep_m
    are MONTGOMERY matrices; challenges is a canonical [3, 5] array.
    Returns (cols list of [N, 5] monty, terms [N, 5] monty or None) —
    row-local, so callers may evaluate it over row chunks and stitch phi
    with a carried prefix sum (the chunked `_perm_stage`)."""
    interactions = chip.all_interactions(machine)
    ch_m = bb.to_monty(challenges)
    n_local, n_global = _alpha_counts(chip, machine)
    alphas_local = _ext_powers_arr(ch_m[0], n_local, skip_first=True)
    alphas_global = _ext_powers_arr(ch_m[1], n_global, skip_first=True)
    max_fields = max((len(i.fields) for i in interactions), default=1)
    betas = _ext_powers_arr(ch_m[2], max_fields)

    cols = []
    for inter in interactions:
        alpha = (
            alphas_local[inter.bus.index]
            if inter.bus.is_local
            else alphas_global[inter.bus.index]
        )
        rlc = _interaction_rlc_device(inter, betas, alpha, prep_m, main_m)
        cols.append(extf.ext_inv(rlc))  # q_m; ext_inv maps 0 -> 0 like ref

    terms = None
    for (inter, itype), q in zip(
        [(i, t) for i, t in chip.typed_interactions(machine)], cols
    ):
        count = _apply_vpcol_device(inter.count, prep_m, main_m)
        t = extf.ext_mul_base(q, count)
        if itype == RECEIVE:
            t = bb.neg(t)
        terms = t if terms is None else bb.add(terms, t)
    return cols, terms


def generate_permutation_trace(machine, chip, main_trace, challenges,
                               prep=None):
    """main_trace: canonical uint32 [N, C] (device or numpy); challenges:
    3 ext values — host tuples or a [3, 5] canonical array (array form is
    jit-traceable, so compiled permutation stages are challenge-independent).

    prep: optional canonical preprocessed trace override (device or
    numpy).  The jitted prover MUST pass it as a traced argument: reading
    `chip.preprocessed_trace()` here bakes the CONTENT (e.g. the program
    ROM's operands) into the compiled stage, whose cache key carries only
    shapes — a second program with the same ROM length would silently
    reuse the first program's constants (found: 2^17 alu-loop proof
    failed OOD on the program chip after a 2^13 run populated the cache).

    Returns perm trace as ext matrix [N, n_interactions + 1, 5] Montgomery,
    where the last ext column is the running sum phi.
    """
    interactions = chip.all_interactions(machine)
    n = int(main_trace.shape[0])
    main_m = bb.to_monty(asarray(main_trace))
    if prep is None:
        prep = chip.preprocessed_trace()
    prep_m = None
    if prep is not None:
        xp = xp_of(asarray(main_trace))
        prep = asarray(prep)
        if int(prep.shape[0]) < n:  # pad preprocessed to trace height
            pad = xp.zeros((n - int(prep.shape[0]), int(prep.shape[1])),
                           dtype=np.uint32)
            prep = xp.concatenate([asarray(prep), pad], axis=0)
        prep_m = bb.to_monty(asarray(prep[:n]))

    if isinstance(challenges, (list, tuple)):
        challenges = asarray(np.array(challenges, dtype=np.uint32))
    cols, terms = perm_cols_and_terms(machine, chip, main_m, prep_m,
                                      challenges)

    # phi: prefix sum of sum_m (+-) q_m * count_m
    if cols:
        if is_jax(terms):
            phi = jax.lax.associative_scan(bb.add, terms, axis=0)
        else:
            # host path: values < p, so a uint64 cumsum stays exact up to
            # 2^33 rows
            phi = (np.cumsum(terms.astype(np.uint64), axis=0) % np.uint64(bb.P)
                   ).astype(np.uint32)
        xp = xp_of(phi)
    else:
        xp = xp_of(main_m)
        phi = xp.zeros((n, 5), dtype=np.uint32)

    perm = xp.stack(cols + [phi], axis=1) if cols else phi[:, None, :]
    return perm


def cumulative_sum(perm_trace):
    """Last phi value as a host ext tuple (canonical)."""
    last = np.asarray(bb.from_monty(perm_trace[-1, -1]))
    return tuple(int(x) for x in last)


def flatten_perm_trace(perm_trace):
    """[N, K, 5] ext monty -> [N, K*5] canonical for committing."""
    n, k, d = perm_trace.shape
    return np.asarray(bb.from_monty(perm_trace)).reshape(n, k * d)


def eval_permutation_constraints(chip, builder, cumulative_sum_value):
    """Builder-generic permutation AIR (mirrors chip.rs:210-289)."""
    machine = builder.machine
    interactions = list(chip.typed_interactions(machine))
    challenges = builder.perm_challenges
    alphas_local_n, alphas_global_n = _alpha_counts(chip, machine)

    # alpha powers as builder expressions: ch^(i+1)
    def powers_of(ch, count):
        out = []
        acc = ch
        for _ in range(count):
            out.append(acc)
            acc = acc * ch
        return out

    alphas_local = powers_of(challenges[0], alphas_local_n)
    alphas_global = powers_of(challenges[1], alphas_global_n)
    max_fields = max((len(i.fields) for i, _ in interactions), default=1)
    betas = [builder.const(1)]
    for _ in range(max_fields - 1):
        betas.append(betas[-1] * challenges[2])

    perm_local = builder.perm_local
    perm_next = builder.perm_next
    phi_local = perm_local[-1]
    phi_next = perm_next[-1]

    lhs = phi_next - phi_local
    rhs = builder.const(0)
    phi_0 = builder.const(0)

    for m, (inter, itype) in enumerate(interactions):
        rlc = builder.const(0)
        for j, field in enumerate(inter.fields):
            elem = field.apply(
                builder.preprocessed_local, builder.main_local, builder.const
            )
            rlc = rlc + betas[j] * elem
        alpha = (
            alphas_local[inter.bus.index]
            if inter.bus.is_local
            else alphas_global[inter.bus.index]
        )
        rlc = rlc + alpha
        builder.assert_one(rlc * perm_local[m])

        mult_local = inter.count.apply(
            builder.preprocessed_local, builder.main_local, builder.const
        )
        mult_next = inter.count.apply(
            builder.preprocessed_next, builder.main_next, builder.const
        )
        if itype == SEND:
            phi_0 = phi_0 + perm_local[m] * mult_local
            rhs = rhs + perm_next[m] * mult_next
        else:
            phi_0 = phi_0 - perm_local[m] * mult_local
            rhs = rhs - perm_next[m] * mult_next

    builder.when_transition().assert_eq(lhs, rhs)
    builder.when_first_row().assert_eq(phi_local, phi_0)
    builder.when_last_row().assert_eq(
        phi_local, _cum_sum_expr(builder, cumulative_sum_value)
    )


def _cum_sum_expr(builder, cs):
    from .builder import VVal, SVal, SymExpr

    if isinstance(builder.perm_challenges[0], SymExpr):
        return SymExpr(0)
    if isinstance(builder.perm_challenges[0], SVal):
        return SVal(tuple(cs))
    if isinstance(cs, tuple):
        cs = np.array(cs, dtype=np.uint32)
    sample = builder.perm_challenges[0].arr
    xp = xp_of(sample)
    arr = bb.to_monty(xp.asarray(cs))
    return VVal(arr, True)


def _alpha_counts(chip, machine):
    def max_bus(interactions):
        idxs = [i.bus.index for i in interactions]
        return (max(idxs) + 1) if idxs else 1

    return (
        max_bus(chip.local_sends() + chip.local_receives()),
        max_bus(chip.global_sends(machine) + chip.global_receives(machine)),
    )
