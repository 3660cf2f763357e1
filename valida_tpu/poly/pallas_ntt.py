"""Pallas TPU kernel: VMEM-resident radix-2 NTT block stages.

The stage-loop NTT (poly/ntt.py) costs one HBM round-trip per butterfly
stage.  This kernel keeps a block of rows resident in VMEM and runs ALL
remaining stages on it, cutting HBM traffic for the tail stages from
log2(B) passes to one.

Used via `dif_hybrid`: DIF stages operate on contiguous blocks that halve
each stage, so after the first log2(N/B) global stages (plain jnp), the
remaining log2(B) stages are block-local — one pallas_call with a grid
over (blocks x column tiles) finishes the transform.

Falls back to the plain stage loop when Pallas is unavailable (e.g. CPU
tests) or shapes don't fit.

Status: correct (bit-identical to poly/ntt.dif, tested on hardware) but
currently ~1.5x SLOWER than XLA's own stage fusion — the roll-based
butterflies do ~2.5x the arithmetic to keep fixed shapes for buffer reuse.
Not wired as the default; kept as the starting point for a properly tuned
in-place kernel (tracked perf work).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..field import babybear as bb
from . import ntt as nttm

# max rows of a VMEM-resident block (B * C_TILE * 4B * ~3 buffers < 16MB)
BLOCK_ROWS = 2048
COL_TILE = 128


@functools.lru_cache(maxsize=None)
def _stage_twiddles(log_b: int, inverse: bool) -> np.ndarray:
    """[log_b, B] per-ROW stage tables: row s holds, for each of the B
    rows, the twiddle to apply if the row is the "hi" half of its
    butterfly, or 1 if it is the "lo" half.  Fixed [B, C] shapes per stage
    let Mosaic reuse buffers instead of allocating per-stage stacks."""
    pw = nttm._root_powers(log_b, inverse)
    b_rows = 1 << log_b
    out = np.zeros((max(log_b, 1) * max(b_rows, 1), 1), dtype=np.uint32)
    for s in range(log_b):
        half = b_rows >> (s + 1)
        period = half * 2
        for i in range(b_rows):
            j = i % period
            out[s * b_rows + i, 0] = (
                pw[:: 1 << s][j - half] if j >= half else 0
            )
    return out


def _block_kernel(log_b: int):
    def kernel(tw_ref, x_ref, o_ref):
        a = x_ref[...]  # [B, C_TILE]
        b_rows, cols = a.shape
        row_ids = jax.lax.broadcasted_iota(jnp.uint32, (b_rows, cols), 0)
        for s in range(log_b):
            half = b_rows >> (s + 1)
            is_lo = (row_ids & jnp.uint32(half)) == 0
            tw = jnp.broadcast_to(tw_ref[s * b_rows : (s + 1) * b_rows, :],
                                  (b_rows, cols))
            partner = jnp.where(
                is_lo,
                jnp.roll(a, -half, axis=0),
                jnp.roll(a, half, axis=0),
            )
            # lo rows: a + partner(hi); hi rows: (partner(lo) - a) * tw
            a = jnp.where(
                is_lo, bb.add(a, partner), bb.mul(bb.sub(partner, a), tw)
            )
        o_ref[...] = a

    return kernel


@functools.lru_cache(maxsize=None)
def _block_ntt_call(n_blocks: int, log_b: int, cols: int, inverse: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b_rows = 1 << log_b
    col_tiles = max(cols // COL_TILE, 1)
    tile_c = cols // col_tiles

    tw = _stage_twiddles(log_b, inverse)

    def fn(x):  # x: [n_blocks * B, cols]
        return pl.pallas_call(
            _block_kernel(log_b),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(n_blocks, col_tiles),
            in_specs=[
                pl.BlockSpec(
                    tw.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (b_rows, tile_c),
                    lambda i, j: (i, j),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (b_rows, tile_c),
                lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
        )(jnp.asarray(tw), x)

    return jax.jit(fn)


def pallas_available() -> bool:
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


def dif_hybrid(a, inverse: bool = False):
    """DIF NTT over axis 0: global jnp stages + one VMEM-resident Pallas
    kernel for the block-local tail.  Output bitrev, like nttm.dif."""
    n = int(a.shape[0])
    log_n = n.bit_length() - 1
    assert a.ndim == 2
    cols = int(a.shape[1])
    if (
        not pallas_available()
        or n < 2
        or (cols % COL_TILE and cols > COL_TILE)
    ):
        return nttm.dif(a, inverse)

    log_b = min(log_n, BLOCK_ROWS.bit_length() - 1)
    # global stages until blocks are 2^log_b rows
    pw = nttm._root_powers(log_n, inverse)
    for s in range(log_n - log_b):
        half = n >> (s + 1)
        tw = pw[:: 1 << s][:half]
        x = a.reshape((1 << s, 2, half, cols))
        x0 = x[:, 0]
        x1 = x[:, 1]
        lo = bb.add(x0, x1)
        hi = bb.mul(bb.sub(x0, x1), tw[None, :, None])
        a = jnp.stack([lo, hi], axis=1).reshape((n, cols))
    n_blocks = 1 << (log_n - log_b)
    return _block_ntt_call(n_blocks, log_b, cols, inverse)(a)
