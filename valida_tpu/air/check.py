"""Debug constraint checker — row-wise zero-checking of every constraint on
the trace domain, plus bus-balance assertion.

Mirrors `machine/src/check_constraints.rs` / `debug_builder.rs`: run inside
prove() when debug checking is enabled; catches witness/AIR divergence at
the exact chip before any committing happens (the framework's "race
detector", SURVEY.md §5.2).
"""

from __future__ import annotations

import numpy as np

from ..field import babybear as bb
from ..field import ext as extf
from .builder import VectorBuilder, VVal
from .lookup import eval_permutation_constraints


def check_constraints(machine, chip, main_trace, perm_trace, perm_challenges,
                      cumulative_sum_value):
    """Assert every constraint of `chip` vanishes on all trace rows."""
    n = int(main_trace.shape[0])
    main_m = bb.to_monty(np.asarray(main_trace))

    def window(arr):
        local = [VVal(arr[:, c], False) for c in range(arr.shape[1])]
        rolled = np.roll(arr, -1, axis=0)
        nxt = [VVal(rolled[:, c], False) for c in range(arr.shape[1])]
        return local, nxt

    main_local, main_next = window(main_m)

    prep = chip.preprocessed_trace()
    prep_local, prep_next = ([], [])
    if prep is not None:
        prep = np.asarray(prep)
        if prep.shape[0] < n:
            prep = np.concatenate(
                [prep, np.zeros((n - prep.shape[0], prep.shape[1]), dtype=prep.dtype)]
            )
        prep_local, prep_next = window(bb.to_monty(np.asarray(prep[:n])))

    perm_trace = np.asarray(perm_trace)
    k = perm_trace.shape[1]
    perm_local = [VVal(perm_trace[:, i], True) for i in range(k)]
    perm_rolled = np.roll(perm_trace, -1, axis=0)
    perm_next = [VVal(perm_rolled[:, i], True) for i in range(k)]

    ones = np.uint32(bb.monty_scalar(1))
    zeros = np.uint32(0)
    idx = np.arange(n)
    is_first = VVal(np.where(idx == 0, ones, zeros), False)
    is_last = VVal(np.where(idx == n - 1, ones, zeros), False)
    is_transition = VVal(np.where(idx < n - 1, ones, zeros), False)

    def ext_const(e):
        return VVal(bb.to_monty(np.array(e, dtype=np.uint32)), True)

    builder = VectorBuilder(
        machine,
        main_local=main_local,
        main_next=main_next,
        prep_local=prep_local,
        prep_next=prep_next,
        perm_local=perm_local,
        perm_next=perm_next,
        perm_challenges=[ext_const(c) for c in perm_challenges],
        is_first_row=is_first,
        is_last_row=is_last,
        is_transition=is_transition,
        mode="debug",
        trace_height=n,
    )
    chip.eval(builder)
    eval_permutation_constraints(chip, builder, cumulative_sum_value)

    for ci, constraint in enumerate(builder.collected):
        vals = np.asarray(bb.from_monty(constraint._as_ext()))
        if vals.any():
            rows = np.unique(np.nonzero(vals)[0])[:5]
            raise AssertionError(
                f"chip {chip.name}: constraint #{ci} nonzero at rows "
                f"{rows.tolist()} (of {n})"
            )


def check_cumulative_sums(cumulative_sums):
    total = extf.E_ZERO
    for cs in cumulative_sums:
        total = extf.e_add(total, cs)
    assert total == extf.E_ZERO, (
        f"bus imbalance: sum of cumulative sums = {total}"
    )
