"""Poseidon2 permutation over BabyBear, width 16, d = 7 — the
TPU-friendly Merkle hasher option (arithmetic instead of Keccak's bitops).

Structure follows the Poseidon2 paper / Plonky3's BabyBear instantiation:
  * 8 external (full) rounds — 4 initial + 4 final — with the block-circulant
    external matrix circ(2·M4, M4, ..., M4),
    M4 = [[2,3,1,1],[1,2,3,1],[1,1,2,3],[3,1,1,2]];
  * 13 internal rounds: S-box on lane 0 only, internal matrix
    x -> sum(x)·1 + diag(d)·x.
  * S-box x^7 (gcd(7, p−1) = 1, a true permutation — unlike the reference
    challenger's α = 5, which we keep only for reference parity there).

Round constants and the internal diagonal derive from SHA-256 expansion
(crypto/poseidon.py's generator, domain-separated), so the hasher is
deterministic and self-consistent; swap in extracted Plonky3 constants for
cross-stack compatibility.

Sponge (rate 8, capacity 8) over canonical u32 words; digests are 8 field
elements, interchangeable with the Keccak MMCS digest shape.
"""

from __future__ import annotations

import hashlib

import numpy as np
import jax.numpy as jnp

from ..backend import xp_of
from ..field import babybear as bb

WIDTH = 16
RATE = 8
EXTERNAL_ROUNDS = 8  # 4 + 4
INTERNAL_ROUNDS = 13

_SEED = b"validia seed/poseidon2"


def _expand(n: int, tag: bytes) -> list[int]:
    out = []
    counter = 0
    while len(out) < n:
        digest = hashlib.sha256(_SEED + tag + counter.to_bytes(8, "little")).digest()
        counter += 1
        for i in range(0, 32, 4):
            word = int.from_bytes(digest[i : i + 4], "little")
            if word < 2 * bb.P:
                out.append(word % bb.P)
                if len(out) == n:
                    break
    return out


EXTERNAL_CONSTANTS = np.array(
    _expand(EXTERNAL_ROUNDS * WIDTH, b"/ext"), dtype=np.uint32
).reshape(EXTERNAL_ROUNDS, WIDTH)
INTERNAL_CONSTANTS = np.array(_expand(INTERNAL_ROUNDS, b"/int"), dtype=np.uint32)
INTERNAL_DIAG = np.array(_expand(WIDTH, b"/diag"), dtype=np.uint32)

_EXT_C_M = ((EXTERNAL_CONSTANTS.astype(np.uint64) << 32) % np.uint64(bb.P)).astype(np.uint32)
_INT_C_M = ((INTERNAL_CONSTANTS.astype(np.uint64) << 32) % np.uint64(bb.P)).astype(np.uint32)
_DIAG_M = ((INTERNAL_DIAG.astype(np.uint64) << 32) % np.uint64(bb.P)).astype(np.uint32)

_M4 = np.array(
    [[2, 3, 1, 1], [1, 2, 3, 1], [1, 1, 2, 3], [3, 1, 1, 2]], dtype=np.int64
)


def _sbox7(x):
    x2 = bb.mul(x, x)
    x4 = bb.mul(x2, x2)
    return bb.mul(bb.mul(x4, x2), x)


def _external_linear(state):
    """circ(2*M4, M4, M4, M4) on [..., 16] via M4 blocks + block sums."""
    xp = xp_of(state)
    s4 = state.reshape(state.shape[:-1] + (4, 4))  # [..., block, lane]
    # y_block = M4 @ block  (entries 1..3: a + a, a + a + a)
    def mul_small(v, k):
        if k == 1:
            return v
        if k == 2:
            return bb.add(v, v)
        return bb.add(bb.add(v, v), v)

    cols = []
    for i in range(4):  # output lane i within block
        acc = None
        for j in range(4):
            t = mul_small(s4[..., j], int(_M4[i, j]))
            acc = t if acc is None else bb.add(acc, t)
        cols.append(acc)
    m4b = xp.stack(cols, axis=-1)  # [..., block, lane]
    # block sum then y = m4b + sum_over_blocks (circulant with extra M4 on diag)
    total = m4b[..., 0, :]
    for b in range(1, 4):
        total = bb.add(total, m4b[..., b, :])
    out = bb.add(m4b, total[..., None, :])
    return out.reshape(state.shape)


def permute(state):
    """Poseidon2 permutation: state [..., 16] Montgomery uint32."""
    state = _external_linear(state)
    half = EXTERNAL_ROUNDS // 2
    for r in range(half):
        state = bb.add(state, _EXT_C_M[r])
        state = _sbox7(state)
        state = _external_linear(state)
    for r in range(INTERNAL_ROUNDS):
        s0 = bb.add(state[..., 0], np.uint32(_INT_C_M[r]))
        s0 = _sbox7(s0)
        xp = xp_of(state)
        state = xp.concatenate([s0[..., None], state[..., 1:]], axis=-1)
        total = state[..., 0]
        for i in range(1, WIDTH):
            total = bb.add(total, state[..., i])
        state = bb.add(bb.mul(state, _DIAG_M), total[..., None])
    for r in range(half, EXTERNAL_ROUNDS):
        state = bb.add(state, _EXT_C_M[r])
        state = _sbox7(state)
        state = _external_linear(state)
    return state


# ---------------------------------------------------------------------------
# Pallas kernel (TPU): batch in VPU lanes, state stacked on axis 0
# ---------------------------------------------------------------------------
#
# The XLA path keeps the 16 state lanes in the minor (lane) axis — 16 of
# 128 VPU lanes used — and the wide fused graph (700+ Montgomery muls per
# permutation) stops fusing at large batches, exactly the keccak failure
# mode fixed in round 3 (`crypto/keccak.py`).  The kernel below transposes
# the batch into lanes: the sponge state is ONE (16, 8, 128)-shaped value
# (state lane = major axis, batch = the (8, 128) VPU tile), every field op
# is a single full-tile vector op, and the whole absorb loop runs in VMEM.
# The `bb` field primitives are plain u32 jnp ops, so they are reused
# verbatim inside the kernel — the pallas path is bit-identical by
# construction and checked by tests/test_poseidon2.py.

_PB = 1024  # batch elements per kernel program (tiles of (8, 128))


def _external_linear_lanes(lanes):
    """circ(2*M4, M4, M4, M4) over a LIST of 16 per-lane 2D tiles.

    The kernel keeps the 16 state lanes as separate (8, lanes) values:
    every Mosaic-hostile construct — [4,4,...] reshapes (unsupported >3D
    shape casts), strided slices (lowered as gathers), [16,1,1]
    broadcasts — disappears into static python indexing.  Value-exact
    vs the XLA path: mod-p ops are exact, so op grouping is free."""

    def mul_small(v, k):
        if k == 1:
            return v
        if k == 2:
            return bb.add(v, v)
        return bb.add(bb.add(v, v), v)

    m4 = []
    for b in range(4):  # block
        for i in range(4):  # output lane i within block
            acc = None
            for j in range(4):
                t = mul_small(lanes[4 * b + j], int(_M4[i, j]))
                acc = t if acc is None else bb.add(acc, t)
            m4.append(acc)
    totals = [
        bb.add(bb.add(m4[i], m4[4 + i]), bb.add(m4[8 + i], m4[12 + i]))
        for i in range(4)
    ]
    return [bb.add(m4[4 * b + i], totals[i])
            for b in range(4) for i in range(4)]


def _permute_lanes(lanes):
    """Poseidon2 permutation over a list of 16 per-lane 2D Montgomery
    tiles.  Same round structure as `permute` (lanes minor); round
    constants enter as STATIC u32 scalars (no operand, no broadcasts)."""
    lanes = _external_linear_lanes(lanes)
    half = EXTERNAL_ROUNDS // 2
    for r in range(half):
        lanes = [_sbox7(bb.add(lanes[i], np.uint32(_EXT_C_M[r, i])))
                 for i in range(WIDTH)]
        lanes = _external_linear_lanes(lanes)
    for r in range(INTERNAL_ROUNDS):
        lanes = [_sbox7(bb.add(lanes[0], np.uint32(_INT_C_M[r])))] + \
            lanes[1:]
        t = list(lanes)
        while len(t) > 1:  # pairwise tree over the lane list
            t = [bb.add(t[2 * i], t[2 * i + 1]) for i in range(len(t) // 2)]
        total = t[0]
        lanes = [bb.add(bb.mul(lanes[i], np.uint32(_DIAG_M[i])), total)
                 for i in range(WIDTH)]
    for r in range(half, EXTERNAL_ROUNDS):
        lanes = [_sbox7(bb.add(lanes[i], np.uint32(_EXT_C_M[r, i])))
                 for i in range(WIDTH)]
        lanes = _external_linear_lanes(lanes)
    return lanes


def _pallas_batch_ok(batch: int) -> bool:
    import os

    import jax

    flag = os.environ.get("VALIDA_TPU_P2_PALLAS", "")
    if flag == "0":
        return False
    interpret = os.environ.get("VALIDA_TPU_PALLAS_INTERPRET", "0") == "1"
    if not interpret:
        # Real-device dispatch is OPT-IN (VALIDA_TPU_P2_PALLAS=1): the
        # current Mosaic toolchain rejects this kernel ("Only 2D gather
        # is supported" for the absorb loop's dynamic 3D loads; strided
        # lane slices and 4D reshapes are likewise unsupported), so the
        # default device path for poseidon2 is the XLA sponge.  Keccak's
        # kernel (2D tile layout throughout) compiles and remains the
        # recommended TPU hasher.
        if flag != "1" or jax.default_backend() not in ("tpu", "axon"):
            return False
    # the env var moves the floor in BOTH directions (sub-_PB batches are
    # padded up inside the kernel, so lowering it is safe, just wasteful)
    floor = int(os.environ.get("VALIDA_TPU_P2_PALLAS_MIN", 2 * _PB))
    return batch >= floor


def _poseidon2_pallas(words):
    """words: jnp uint32 [batch, w] canonical -> [batch, 8] canonical."""
    import os

    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, w = words.shape
    n_blocks = -(-w // RATE)
    total = n_blocks * RATE
    # zero-pad: absorbing Montgomery 0 into the rate lanes is the identity
    # (state[:RATE] += 0), so a zero-extended final chunk hashes
    # identically to the narrow one
    bpad = (-batch) % _PB
    if bpad:
        words = jnp.concatenate(
            [words, jnp.zeros((bpad, w), jnp.uint32)], axis=0
        )
    nb = batch + bpad
    if total != w:
        words = jnp.concatenate(
            [words, jnp.zeros((nb, total - w), jnp.uint32)], axis=1
        )
    wt = words.T.reshape(total, 8, nb // 8)  # batch into the (8, lane) tile
    pbj = _PB // 8

    def kernel(x_ref, o_ref):
        # n_blocks is STATIC: the absorb loop unrolls as python, every
        # lane load/store is a static 2D slice of the 3D ref (dynamic
        # fori_loop indexing lowers to >2D gathers, which Mosaic
        # rejects), and the state lives as a LIST of 16 (8, pbj) tiles
        state = [jnp.zeros((8, pbj), jnp.uint32) for _ in range(WIDTH)]
        for blk in range(n_blocks):
            for i in range(RATE):
                lane = bb.from_wrapped_u32(x_ref[blk * RATE + i])
                state[i] = bb.add(state[i], lane)
            state = _permute_lanes(state)
        for i in range(RATE):
            o_ref[i] = bb.from_monty(state[i])

    interpret = os.environ.get("VALIDA_TPU_PALLAS_INTERPRET", "0") == "1"
    out = pl.pallas_call(
        kernel,
        grid=(nb // _PB,),
        in_specs=[
            pl.BlockSpec((total, 8, pbj), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RATE, 8, pbj), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((RATE, 8, nb // 8), jnp.uint32),
        interpret=interpret,
    )(wt)
    return out.reshape(RATE, nb).T[:batch]


def hash_words(words):
    """Sponge hash of u32-word rows: [n, w] canonical -> [n, 8] canonical.

    Words are reduced mod p on absorption (digest words are already < p).
    """
    xp = xp_of(words)
    n, w = words.shape
    if xp is not np and _pallas_batch_ok(int(n)):
        return _poseidon2_pallas(words.astype(np.uint32))
    state = xp.zeros((n, WIDTH), dtype=np.uint32)
    for off in range(0, w, RATE):
        chunk = words[:, off : off + RATE]
        cw = chunk.shape[1]
        block = bb.from_wrapped_u32(chunk)
        absorbed = bb.add(state[:, :cw], block)
        state = xp.concatenate([absorbed, state[:, cw:]], axis=-1)
        state = permute(state)
    return bb.from_monty(state[:, :RATE])


def hash_words_host(words) -> np.ndarray:
    w = np.asarray(words, dtype=np.uint32).reshape(1, -1)
    return hash_words(w)[0]
