"""Array-backend selection: numpy (host) or jax.numpy (TPU).

Every compute-layer function dispatches on its *input* array type, so the
same code serves both backends; this module controls only what new arrays
are created as at pipeline entry points (PCS commits, permutation traces,
quotient evaluation).

Default is "jax" (device execution under jit).  Tests and host-side
verification use "numpy" for zero-dispatch-overhead vectorized execution —
proving and verifying are then pure numpy, no device needed.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

def _host_cpu_fingerprint() -> str:
    """Short digest of the host's CPU architecture + feature flags.

    XLA:CPU AOT cache entries embed the compile machine's feature set;
    loading them on a host with different features risks SIGILL (observed
    as cpu_aot_loader warnings in MULTICHIP_r02.json).  Namespacing the
    persistent cache by host features guarantees entries compiled on one
    machine (e.g. prebaked payloads shipped in the repo) are never loaded
    on an incompatible one — they just miss and recompile."""
    import hashlib
    import platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    key = f"{platform.machine()}:{flags}"
    return hashlib.sha256(key.encode()).hexdigest()[:12]


# persistent XLA compilation cache: stage compiles (and slow remote
# compiles) are one-time per shape across all processes
try:
    _cache_dir = os.path.join(
        os.environ.get(
            "VALIDA_TPU_XLA_CACHE",
            os.path.expanduser("~/.cache/valida_tpu_xla"),
        ),
        f"cpu-{_host_cpu_fingerprint()}",
    )
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    # persist even sub-second compiles: the prover/verifier issue many
    # small per-shape hash/gather compiles whose *count* dominates cold
    # wall-clock (disk is cheap, loading is ~ms)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:  # cache is an optimization only
    pass

_BACKEND = "jax"

# uint32 wraparound is intentional throughout the Montgomery kernels
np.seterr(over="ignore")


def set_backend(name: str):
    global _BACKEND
    assert name in ("jax", "numpy")
    _BACKEND = name


import contextlib


@contextlib.contextmanager
def use_backend(name: str):
    """Temporarily switch the array-creation backend (e.g. the host
    verifier pins "numpy" so its re-commits never touch the device)."""
    global _BACKEND
    old = _BACKEND
    set_backend(name)
    try:
        yield
    finally:
        _BACKEND = old


def get_backend() -> str:
    return _BACKEND


def asarray(x, dtype=None):
    if isinstance(x, jax.Array):  # incl. tracers — never pull to host
        return x if dtype is None else x.astype(dtype)
    if _BACKEND == "jax":
        return jnp.asarray(x, dtype=dtype)
    return np.asarray(x, dtype=dtype)


def xp_of(a):
    """Namespace (np or jnp) matching an array's type."""
    return jnp if isinstance(a, jax.Array) else np


def is_jax(a) -> bool:
    return isinstance(a, jax.Array)
