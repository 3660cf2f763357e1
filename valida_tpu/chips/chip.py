"""Chip base class: trace generation + interactions + constraints.

Mirrors the `Chip` trait (`/root/reference/machine/src/chip.rs:15-68`), but
data-oriented: a chip produces canonical-uint32 numpy/jnp trace matrices and
writes constraints once against the generic builder (air/builder.py).
"""

from __future__ import annotations

import numpy as np

from ..air.types import Interaction, SEND, RECEIVE


class Chip:
    name = "chip"

    # -- trace -------------------------------------------------------------

    def width(self) -> int:
        raise NotImplementedError

    def preprocessed_width(self) -> int:
        p = self.preprocessed_trace()
        return 0 if p is None else int(p.shape[1])

    def generate_trace(self, machine) -> np.ndarray:
        """[N, width] canonical uint32, N a power of two."""
        raise NotImplementedError

    def preprocessed_trace(self):
        return None

    # -- device-side trace materialization ----------------------------------
    #
    # A chip may expose its trace as (compact op-log inputs, build fn):
    # the jitted prover then uploads only the op arrays (~5-25x fewer
    # bytes than the trace — decisive over a slow host<->TPU link) and
    # materializes the [N, width] matrix in a compiled stage.  The HOST
    # path reuses the exact same builder with xp=numpy, so both paths are
    # one implementation (bit-identical by construction).

    def device_trace_inputs(self, machine):
        """(inputs: tuple of np uint32 arrays, meta: hashable statics)
        for build_trace, or None if this chip has no device builder."""
        return None

    def build_trace(self, xp, inputs, meta):
        """Materialize the [n2, width] canonical-uint32 trace with the
        given array namespace (np or jnp).  Pure: no in-place scatter on
        xp arrays (jnp compatibility); u32-safe intermediates only —
        witnesses needing wider arithmetic are precomputed into
        `inputs` host-side."""
        raise NotImplementedError

    # -- interactions ------------------------------------------------------

    def local_sends(self) -> list:
        return []

    def local_receives(self) -> list:
        return []

    def global_sends(self, machine) -> list:
        return []

    def global_receives(self, machine) -> list:
        return []

    def typed_interactions(self, machine):
        out = []
        out += [(i, SEND) for i in self.local_sends()]
        out += [(i, RECEIVE) for i in self.local_receives()]
        out += [(i, SEND) for i in self.global_sends(machine)]
        out += [(i, RECEIVE) for i in self.global_receives(machine)]
        return out

    def all_interactions(self, machine):
        return [i for i, _t in self.typed_interactions(machine)]

    # -- constraints -------------------------------------------------------

    def eval(self, builder):
        pass


def pad_to_power_of_two(rows: np.ndarray) -> np.ndarray:
    """Pad a [N, W] trace with zero rows to the next power of two
    (`util/src/lib.rs:45-49`)."""
    n = rows.shape[0]
    if n == 0:
        n2 = 1
    else:
        n2 = 1 << max((n - 1).bit_length(), 0)
    if n2 == n:
        return rows
    pad = np.zeros((n2 - n, rows.shape[1]), dtype=rows.dtype)
    return np.concatenate([rows, pad], axis=0)


def assemble_columns(xp, width: int, n2: int, cols: dict) -> "np.ndarray":
    """{col index: uint32 vector of length n2} -> [n2, width] canonical
    trace; absent columns are zero.  Works for np and jnp."""
    zero = xp.zeros(n2, dtype=np.uint32)
    return xp.stack(
        [cols[i] if i in cols else zero for i in range(width)], axis=1
    )


def grow(xp, v, n2: int, pad: int = 0):
    """Extend a length-n vector to n2 rows with a constant pad value."""
    v = v.astype(np.uint32)
    n = int(v.shape[0])
    if n == n2:
        return v
    return xp.concatenate(
        [v, xp.full((n2 - n,), np.uint32(pad), dtype=np.uint32)]
    )


def be_byte(xp, values, i: int):
    """i-th big-endian byte column of u32 values (i=0 most significant)."""
    return (values >> np.uint32(8 * (3 - i))) & np.uint32(0xFF)


def le_byte(xp, values, i: int):
    """i-th little-endian byte (i=0 least significant)."""
    return (values >> np.uint32(8 * i)) & np.uint32(0xFF)


class IndexAllocator:
    """Tiny column-layout helper: named scalar/word/array column indices."""

    def __init__(self):
        self.width = 0

    def scalar(self) -> int:
        i = self.width
        self.width += 1
        return i

    def word(self) -> list:
        return self.array(4)

    def array(self, n: int) -> list:
        out = list(range(self.width, self.width + n))
        self.width += n
        return out
