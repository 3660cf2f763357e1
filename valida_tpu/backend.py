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

import numpy as np
import jax
import jax.numpy as jnp

_BACKEND = "jax"

# uint32 wraparound is intentional throughout the Montgomery kernels
np.seterr(over="ignore")


def set_backend(name: str):
    global _BACKEND
    assert name in ("jax", "numpy")
    _BACKEND = name


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
