"""Tiled/streamed LDE + Merkle commit (VERDICT r3 #4).

The monolithic commit path (`poly/ntt.coset_lde` then hash) materializes
the full [N·2^b, w] LDE before hashing — 8 GB at 2^24×64×blowup-2, which
exceeds a single chip's HBM with XLA temps on top.  The reference's
row-major `commit_batches` (Plonky3 `p3-merkle-tree`, SURVEY §2.5)
effectively streams rows into the leaf hasher; this module is the TPU
equivalent: the blowup-b LDE decomposes into b independent size-N coset
NTTs, and in the bitrev row order the PCS hashes, each coset's rows form
one CONTIGUOUS block of leaves.

    eval at shift·w_{bN}^k,  k = r + b·t
      = NTT_N( c_i · (shift·w_{bN}^r)^i )[t]
    bitrev_{bN}(k) = bitrev_b(r)·N + bitrev_N(t)

So block bitrev_b(r) of the bitrev-ordered LDE is exactly
`dif(c · powers(shift·w_{bN}^r))` — computed, hashed to [N, 8] digests,
and dropped before the next block.  Peak memory is one coset block plus
the coefficients instead of the whole LDE; the digest matrix (32 B/row)
is all that survives to the tree build.

Bit-identical to the monolithic path by construction (exact field
arithmetic, same hasher): tests/test_pcs.py::test_streamed_commit_*.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..field import babybear as bb
from ..poly import ntt as nttm
from ..crypto.merkle import get_hasher


def _rev_bits(x: int, bits: int) -> int:
    r = 0
    for _ in range(bits):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r


# module-level jitted helpers (stable fn objects -> jax's trace cache is
# keyed per shape, so repeated commits never re-trace)

_INTT_J = jax.jit(nttm.intt)
_BLOCK_J = jax.jit(lambda coeffs, sp: nttm.dif(bb.mul(coeffs, sp[:, None])))


@functools.lru_cache(maxsize=None)
def _hash_j(hasher_name: str):
    h = get_hasher(hasher_name)
    return jax.jit(lambda block: h.hash_words(bb.from_monty(block)))


@functools.lru_cache(maxsize=None)
def _compress_j(hasher_name: str):
    h = get_hasher(hasher_name)
    return jax.jit(
        lambda l, r: h.hash_words(jnp.concatenate([l, r], axis=1)))


@functools.lru_cache(maxsize=None)
def _hash_cat_j(hasher_name: str):
    h = get_hasher(hasher_name)
    return jax.jit(lambda parts: h.hash_words(
        bb.from_monty(parts[0] if len(parts) == 1
                      else jnp.concatenate(parts, axis=1))))


def lde_commit_streamed(evals, log_blowup: int, shift: int,
                        hasher="keccak", col_tile: int | None = None,
                        row_tile: int | None = None):
    """Coset-LDE + full Merkle commit without materializing the LDE.

    evals: [N, w] Montgomery uint32 device array (evaluations on H_N).
    Returns (root, digest_levels): root = canonical np.uint32[8], equal
    to `MerkleTree([from_monty(coset_lde(evals, log_blowup, shift,
    out_bitrev=True))]).root()`; digest_levels = {log_h: [2^log_h, 8]}
    device arrays (the sibling paths — rows themselves are NOT retained,
    so `open` against this commit must recompute the opened coset block
    or use the monolithic path).

    col_tile: process the per-coset NTT in column chunks of this width
    (bounds the transform temps).
    row_tile: hash leaves (and compress the top digest levels) in row
    chunks of this many rows — the VERDICT r4 #3 "one more tiling step":
    at 2^24 rows the whole-block Keccak graph's sponge state temps
    ([N, 50] u32 per live buffer) exceeded HBM at compile time.  Rows
    hash independently, so tiling is bit-identical.  The full coset
    block is never assembled: each row tile concatenates the column
    parts' row slices only.
    """
    hasher_name = get_hasher(hasher).name
    n, w = int(evals.shape[0]), int(evals.shape[1])
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if row_tile:
        assert row_tile & (row_tile - 1) == 0, "row_tile must be 2^k"
    b = 1 << log_blowup
    w_bn = bb.two_adic_generator(log_n + log_blowup)
    hash_cat_j = _hash_cat_j(hasher_name)
    compress_j = _compress_j(hasher_name)

    tiles = ([slice(0, w)] if not col_tile else
             [slice(i, min(i + col_tile, w)) for i in range(0, w, col_tile)])
    # NOTE: unequal tail tiles would compile a second block/intt variant;
    # callers pick col_tile | w in practice.
    coeff_tiles = [_INTT_J(evals[:, t]) for t in tiles]
    del evals

    rt = row_tile if (row_tile and row_tile < n) else n
    digest_blocks: list = [None] * b
    for r in range(b):
        s_r = shift % bb.P * pow(w_bn, r, bb.P) % bb.P
        sp = jnp.asarray(nttm.shift_powers(s_r, log_n))
        parts = [_BLOCK_J(c, sp) for c in coeff_tiles]
        if rt == n:
            dig = hash_cat_j(tuple(parts))
        else:
            dig = jnp.concatenate([
                hash_cat_j(tuple(p[i:i + rt] for p in parts))
                for i in range(0, n, rt)
            ], axis=0)
        del parts
        digest_blocks[_rev_bits(r, log_blowup)] = dig

    d = jnp.concatenate(digest_blocks, axis=0)
    del digest_blocks
    levels = {log_n + log_blowup: d}
    k = log_n + log_blowup
    while k > 0:
        k -= 1
        m = 1 << k  # output rows of this level
        if rt < m:
            d = jnp.concatenate([
                compress_j(d[2 * j:2 * (j + rt):2],
                           d[2 * j + 1:2 * (j + rt):2])
                for j in range(0, m, rt)
            ], axis=0)
        else:
            d = compress_j(d[0::2], d[1::2])
        levels[k] = d
    root = np.asarray(d[0])
    return root, levels
