"""Keccak-256 (original pad 0x01) over uint32 lane pairs, batched for TPU.

Replaces p3-keccak + SerializingHasher32 (`basic/src/bin/valida.rs:367-369`):
messages are streams of u32 words serialized little-endian; digests are
8 x u32 words (little-endian bytes of the 32-byte hash).

64-bit lanes are represented as two uint32 arrays (lo, hi) since TPU has no
u64; all 24 Keccak-f[1600] rounds are bitwise VPU ops, vectorized over an
arbitrary batch of messages.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..backend import xp_of

RATE_BYTES = 136
RATE_WORDS = 34  # u32 words per block
DIGEST_WORDS = 8

# Keccak round constants (public spec), as (lo, hi) u32 pairs.
_RC64 = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_RC_LO = np.array([c & 0xFFFFFFFF for c in _RC64], dtype=np.uint32)
_RC_HI = np.array([c >> 32 for c in _RC64], dtype=np.uint32)

# rho rotation offsets, indexed by lane = x + 5*y
_RHO = [0] * 25
_x, _y = 1, 0
for _t in range(24):
    _RHO[_x + 5 * _y] = ((_t + 1) * (_t + 2) // 2) % 64
    _x, _y = _y, (2 * _x + 3 * _y) % 5


# Vectorization tables for the fully-lane-parallel permutation below.
# pi: dst lane (x + 5y) -> src lane; SRC[dst] = src.
_PI_SRC = np.zeros(25, dtype=np.int32)
for _x in range(5):
    for _y in range(5):
        _src = _x + 5 * _y
        _dst = _y + 5 * ((2 * _x + 3 * _y) % 5)
        _PI_SRC[_dst] = _src
_RHO_ARR = np.array(_RHO, dtype=np.uint32)
# per-lane 64-bit rotation split into (swap halves, rotate-by r%32)
_ROT_SWAP = (_RHO_ARR >= 32).astype(np.uint32)
_ROT_R = (_RHO_ARR % 32).astype(np.uint32)
# iota: round constant vectors with only lane 0 set
_RC_LO_VEC = np.zeros((24, 25), dtype=np.uint32)
_RC_HI_VEC = np.zeros((24, 25), dtype=np.uint32)
_RC_LO_VEC[:, 0] = _RC_LO
_RC_HI_VEC[:, 0] = _RC_HI


def _rotl64_vec(xp, lo, hi, swap, r):
    """Rotate 25 (lo, hi) lane pairs left by per-lane amounts.

    swap: uint32[25] (1 if rotation >= 32); r: uint32[25] = rotation % 32.
    Shifts use (v >> (31 - r)) >> 1 so r = 0 stays defined.
    """
    a = xp.where(swap == 1, hi, lo)
    b = xp.where(swap == 1, lo, hi)
    r31 = np.uint32(31) - r
    nlo = (a << r) | ((b >> r31) >> np.uint32(1))
    nhi = (b << r) | ((a >> r31) >> np.uint32(1))
    return nlo, nhi


def keccak_f(lo, hi):
    """One Keccak-f[1600] permutation, vectorized across all 25 lanes.

    lo, hi: uint32 arrays of shape [..., 25] (lane index = x + 5*y).
    """
    xp = xp_of(lo)
    batch = lo.shape[:-1]
    for rnd in range(24):
        # theta: C[x] = xor over y; D[x] = C[x-1] ^ rotl1(C[x+1])
        l5 = lo.reshape(batch + (5, 5))  # [..., y, x]
        h5 = hi.reshape(batch + (5, 5))
        c_lo = l5[..., 0, :] ^ l5[..., 1, :] ^ l5[..., 2, :] ^ l5[..., 3, :] ^ l5[..., 4, :]
        c_hi = h5[..., 0, :] ^ h5[..., 1, :] ^ h5[..., 2, :] ^ h5[..., 3, :] ^ h5[..., 4, :]
        c1_lo = xp.roll(c_lo, -1, axis=-1)  # C[x+1]
        c1_hi = xp.roll(c_hi, -1, axis=-1)
        r1_lo = (c1_lo << np.uint32(1)) | (c1_hi >> np.uint32(31))
        r1_hi = (c1_hi << np.uint32(1)) | (c1_lo >> np.uint32(31))
        d_lo = xp.roll(c_lo, 1, axis=-1) ^ r1_lo  # C[x-1] ^ rotl1(C[x+1])
        d_hi = xp.roll(c_hi, 1, axis=-1) ^ r1_hi
        lo = (l5 ^ d_lo[..., None, :]).reshape(batch + (25,))
        hi = (h5 ^ d_hi[..., None, :]).reshape(batch + (25,))
        # rho + pi: rotate each lane, then permute lanes
        rl, rh = _rotl64_vec(xp, lo, hi, _ROT_SWAP, _ROT_R)
        b_lo = rl[..., _PI_SRC]
        b_hi = rh[..., _PI_SRC]
        # chi: b ^ (~b[x+1] & b[x+2]) along x
        b5_lo = b_lo.reshape(batch + (5, 5))
        b5_hi = b_hi.reshape(batch + (5, 5))
        n_lo = b5_lo ^ (~xp.roll(b5_lo, -1, axis=-1) & xp.roll(b5_lo, -2, axis=-1))
        n_hi = b5_hi ^ (~xp.roll(b5_hi, -1, axis=-1) & xp.roll(b5_hi, -2, axis=-1))
        lo = n_lo.reshape(batch + (25,))
        hi = n_hi.reshape(batch + (25,))
        # iota
        lo = lo ^ _RC_LO_VEC[rnd]
        hi = hi ^ _RC_HI_VEC[rnd]
    return lo, hi


def _pad_words(n_words: int) -> tuple[int, np.ndarray, np.ndarray]:
    """Static padding plan: returns (n_blocks, pad_or_mask[2 arrays]) applied
    to the zero-extended word buffer."""
    n_blocks = n_words // RATE_WORDS + 1
    total = n_blocks * RATE_WORDS
    pad = np.zeros(total, dtype=np.uint32)
    pad[n_words] ^= 0x01  # first padding byte (LE byte 0 of the word)
    pad[total - 1] ^= 0x80000000  # final 0x80 at last byte of last block
    return n_blocks, pad


# ---------------------------------------------------------------------------
# Pallas kernel (TPU): batch in VPU lanes, state lanes fully unrolled
# ---------------------------------------------------------------------------
#
# The XLA path above keeps the 25 state lanes in the minor (lane) axis —
# 25 of 128 lanes used, with per-round gathers (_PI_SRC) — and the ~1800-op
# fused graph stops fusing at large batch sizes (measured: 4x rows cost
# 6.8x at 2^18, VERDICT r2 #7).  The kernel below transposes the batch
# into lanes: every state lane is its own (8, 128)-tile value, rho/pi/chi
# become static Python reindexing (zero gathers), and the whole absorb
# loop runs in VMEM — HBM traffic is one input read + one digest write.

_PB = 1024  # batch elements per kernel program (shaped (..., 8, 128))


def _rotl_pair(lo, hi, r: int):
    """64-bit rotate-left by static r of an (lo, hi) u32 pair."""
    if r >= 32:
        lo, hi = hi, lo
        r -= 32
    if r == 0:
        return lo, hi
    r_ = np.uint32(r)
    s_ = np.uint32(32 - r)
    return ((lo << r_) | (hi >> s_), (hi << r_) | (lo >> s_))


def _keccak_f_unrolled(lo, hi):
    """keccak-f[1600] on 25-element python lists of equal-shape u32
    values; all lane plumbing is static indexing."""
    for rnd in range(24):
        c_lo = [lo[x] ^ lo[x + 5] ^ lo[x + 10] ^ lo[x + 15] ^ lo[x + 20]
                for x in range(5)]
        c_hi = [hi[x] ^ hi[x + 5] ^ hi[x + 10] ^ hi[x + 15] ^ hi[x + 20]
                for x in range(5)]
        d = [
            (c_lo[(x - 1) % 5] ^ ((c_lo[(x + 1) % 5] << np.uint32(1))
                                  | (c_hi[(x + 1) % 5] >> np.uint32(31))),
             c_hi[(x - 1) % 5] ^ ((c_hi[(x + 1) % 5] << np.uint32(1))
                                  | (c_lo[(x + 1) % 5] >> np.uint32(31))))
            for x in range(5)
        ]
        lo = [lo[i] ^ d[i % 5][0] for i in range(25)]
        hi = [hi[i] ^ d[i % 5][1] for i in range(25)]
        b_lo, b_hi = [None] * 25, [None] * 25
        for x in range(5):
            for y in range(5):
                src = x + 5 * y
                dst = y + 5 * ((2 * x + 3 * y) % 5)
                b_lo[dst], b_hi[dst] = _rotl_pair(lo[src], hi[src],
                                                  _RHO[src])
        lo = [
            b_lo[i] ^ (~b_lo[i - i % 5 + (i + 1) % 5]
                       & b_lo[i - i % 5 + (i + 2) % 5])
            for i in range(25)
        ]
        hi = [
            b_hi[i] ^ (~b_hi[i - i % 5 + (i + 1) % 5]
                       & b_hi[i - i % 5 + (i + 2) % 5])
            for i in range(25)
        ]
        lo[0] = lo[0] ^ _RC_LO[rnd]
        hi[0] = hi[0] ^ _RC_HI[rnd]
    return lo, hi


def _pallas_batch_ok(batch: int) -> bool:
    import os

    import jax

    if os.environ.get("VALIDA_TPU_KECCAK_PALLAS", "1") == "0":
        return False
    interpret = os.environ.get("VALIDA_TPU_PALLAS_INTERPRET", "0") == "1"
    if not (interpret or jax.default_backend() in ("tpu", "axon")):
        return False
    # floor is env-tunable: each distinct batch shape Mosaic-compiles the
    # ~7k-op kernel once (slow); raising the floor keeps small Merkle
    # levels on the XLA path (which matches pallas speed there anyway)
    # the env var moves the floor in BOTH directions (sub-_PB batches are
    # padded up inside the kernel, so lowering it is safe, just wasteful)
    floor = int(os.environ.get("VALIDA_TPU_KECCAK_PALLAS_MIN", 2 * _PB))
    return batch >= floor


def _keccak_pallas(words):
    """words: jnp uint32 [batch, n_words] -> [batch, 8] digests."""
    import os

    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, n_words = words.shape
    n_blocks, pad = _pad_words(n_words)
    total = n_blocks * RATE_WORDS
    bpad = (-batch) % _PB
    if bpad:
        words = jnp.concatenate(
            [words, jnp.zeros((bpad, n_words), jnp.uint32)], axis=0
        )
    bb_ = batch + bpad
    buf = jnp.concatenate(
        [words, jnp.zeros((bb_, total - n_words), jnp.uint32)], axis=1
    ) ^ jnp.asarray(pad)[None, :]
    # batch into lanes: [total, 8, bb/8]; a grid block covers 8x128
    # batch elements per word row
    wt = buf.T.reshape(total, 8, bb_ // 8)
    pbj = _PB // 8

    def kernel(x_ref, o_ref):
        shape = (8, pbj)
        lo = [jnp.zeros(shape, jnp.uint32) for _ in range(25)]
        hi = [jnp.zeros(shape, jnp.uint32) for _ in range(25)]
        for blk in range(n_blocks):
            base = blk * RATE_WORDS
            for k in range(17):
                lo[k] = lo[k] ^ x_ref[base + 2 * k]
                hi[k] = hi[k] ^ x_ref[base + 2 * k + 1]
            lo, hi = _keccak_f_unrolled(lo, hi)
        for k in range(4):
            o_ref[2 * k] = lo[k]
            o_ref[2 * k + 1] = hi[k]

    interpret = os.environ.get("VALIDA_TPU_PALLAS_INTERPRET", "0") == "1"
    out = pl.pallas_call(
        kernel,
        grid=(bb_ // _PB,),
        in_specs=[pl.BlockSpec((total, 8, pbj), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 8, pbj), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 8, bb_ // 8), jnp.uint32),
        interpret=interpret,
    )(wt)
    digests = out.reshape(8, bb_).T
    return digests[:batch]


def keccak256_words(words):
    """Batched Keccak-256 of u32-word messages.

    words: uint32 [batch, n_words] (message bytes = LE serialization).
    Returns uint32 [batch, 8].
    """
    xp = xp_of(words)
    batch, n_words = words.shape
    if xp is jnp and _pallas_batch_ok(int(batch)):
        return _keccak_pallas(words)
    n_blocks, pad = _pad_words(n_words)
    total = n_blocks * RATE_WORDS
    pad_cols = xp.zeros((batch, total - n_words), dtype=np.uint32)
    buf = xp.concatenate([words.astype(np.uint32), pad_cols], axis=1)
    buf = buf ^ pad[None, :]

    lo = xp.zeros((batch, 25), dtype=np.uint32)
    hi = xp.zeros((batch, 25), dtype=np.uint32)
    for b in range(n_blocks):
        block = buf[:, b * RATE_WORDS : (b + 1) * RATE_WORDS]
        # word k -> lane k//2, half k%2
        blk_lo = block[:, 0::2]  # 17 lanes
        blk_hi = block[:, 1::2]
        lo = xp.concatenate([lo[:, :17] ^ blk_lo, lo[:, 17:]], axis=1)
        hi = xp.concatenate([hi[:, :17] ^ blk_hi, hi[:, 17:]], axis=1)
        lo, hi = keccak_f(lo, hi)

    # squeeze 32 bytes = 4 lanes = 8 words
    out = xp.stack(
        [lo[:, 0], hi[:, 0], lo[:, 1], hi[:, 1], lo[:, 2], hi[:, 2], lo[:, 3], hi[:, 3]],
        axis=-1,
    )
    return out


# ---------------------------------------------------------------------------
# Host (pure python) mirror for Merkle path verification
# ---------------------------------------------------------------------------

_M64 = (1 << 64) - 1


def _h_rotl(v, r):
    r %= 64
    return ((v << r) | (v >> (64 - r))) & _M64


def keccak_f_host(lanes: list[int]) -> list[int]:
    a = list(lanes)
    for rnd in range(24):
        c = [a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _h_rotl(c[(x + 1) % 5], 1) for x in range(5)]
        a = [a[i] ^ d[i % 5] for i in range(25)]
        b = [0] * 25
        for x in range(5):
            for y in range(5):
                src = x + 5 * y
                dst = y + 5 * ((2 * x + 3 * y) % 5)
                b[dst] = _h_rotl(a[src], _RHO[src])
        a = [
            b[i] ^ ((~b[(i % 5 + 1) % 5 + 5 * (i // 5)] & _M64)
                    & b[(i % 5 + 2) % 5 + 5 * (i // 5)])
            for i in range(25)
        ]
        a[0] ^= _RC64[rnd]
    return a


def keccak256_words_host(words) -> np.ndarray:
    """Host Keccak-256 of a single u32-word message; returns uint32[8]."""
    words = [int(w) & 0xFFFFFFFF for w in words]
    n_words = len(words)
    n_blocks = n_words // RATE_WORDS + 1
    total = n_blocks * RATE_WORDS
    buf = words + [0] * (total - n_words)
    buf[n_words] ^= 0x01
    buf[total - 1] ^= 0x80000000
    lanes = [0] * 25
    for b in range(n_blocks):
        block = buf[b * RATE_WORDS : (b + 1) * RATE_WORDS]
        for k in range(17):
            lanes[k] ^= block[2 * k] | (block[2 * k + 1] << 32)
        lanes = keccak_f_host(lanes)
    out = []
    for lane in lanes[:4]:
        out.append(lane & 0xFFFFFFFF)
        out.append(lane >> 32)
    return np.array(out, dtype=np.uint32)
