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


def set_trace(enabled: bool):
    global _TRACE
    _TRACE = enabled


@contextlib.contextmanager
def stage(name: str):
    """Stage marker: jax.named_scope + optional host wall-clock log.

    Stage names follow the reference's span names ("generate main traces",
    "commit to main traces", "generate permutation traces", "compute
    quotient polynomial", "commit to quotient chunks", ...).
    """
    global _DEPTH
    t0 = time.perf_counter() if _TRACE else 0.0
    _DEPTH += 1
    try:
        with jax.named_scope(name.replace(" ", "_")):
            yield
    finally:
        _DEPTH -= 1
        if _TRACE:
            dt = time.perf_counter() - t0
            print(f"[trace]{'  ' * _DEPTH} {name}: {dt * 1e3:.1f} ms",
                  flush=True)
