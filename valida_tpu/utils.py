"""Tracing / profiling helpers (SURVEY.md §5.1).

The reference instruments prover stages with `tracing` spans
(`derive/src/lib.rs:300-372`, `machine/src/quotient.rs:70`) that are free
unless a subscriber is installed.  The TPU equivalents: `jax.named_scope`
marks stages inside device profiles (visible in `jax.profiler` traces) and
an opt-in wall-clock stage log on the host.

Enable host stage timing with VALIDA_TPU_TRACE=1 or `set_trace(True)`.
"""

from __future__ import annotations

import contextlib
import os
import time

import jax

_TRACE = os.environ.get("VALIDA_TPU_TRACE", "0") == "1"
_DEPTH = 0
_COLLECT = None  # dict name -> [seconds, count, min_depth] when active


def set_trace(enabled: bool):
    global _TRACE
    _TRACE = enabled


def start_stage_collection():
    """Begin accumulating per-stage host wall-clock (benchmarks use this
    to emit a machine-readable breakdown; reference analogue: tracing
    spans consumed by a subscriber, `derive/src/lib.rs:300-372`).

    Host wall-clock per stage is meaningful in the jit prover because the
    Fiat–Shamir challenger fetches each stage's roots before the next
    stage runs — stage boundaries are natural device-sync points."""
    global _COLLECT
    _COLLECT = {}


def stop_stage_collection() -> dict:
    """-> {name: {"s": total_seconds, "n": calls}} for top-level stages
    (nested stages are excluded so the values sum to ~total prove time)."""
    global _COLLECT
    acc, _COLLECT = _COLLECT, None
    if not acc:
        return {}
    top = min(d for (_, _, d) in acc.values())
    return {
        name: {"s": round(s, 4), "n": n}
        for name, (s, n, d) in acc.items() if d == top
    }


@contextlib.contextmanager
def stage(name: str):
    """Stage marker: jax.named_scope + optional host wall-clock log.

    Stage names follow the reference's span names ("generate main traces",
    "commit to main traces", "generate permutation traces", "compute
    quotient polynomial", "commit to quotient chunks", ...).
    """
    global _DEPTH
    t0 = time.perf_counter() if (_TRACE or _COLLECT is not None) else 0.0
    depth = _DEPTH
    _DEPTH += 1
    try:
        with jax.named_scope(name.replace(" ", "_")):
            yield
    finally:
        _DEPTH -= 1
        if _TRACE or _COLLECT is not None:
            dt = time.perf_counter() - t0
            if _TRACE:
                print(f"[trace]{'  ' * depth} {name}: {dt * 1e3:.1f} ms",
                      flush=True)
            if _COLLECT is not None:
                ent = _COLLECT.setdefault(name, [0.0, 0, depth])
                ent[0] += dt
                ent[1] += 1
                ent[2] = min(ent[2], depth)
