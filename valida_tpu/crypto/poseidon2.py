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

# round constants shipped to the kernel as one (9, 16) operand (pallas
# forbids captured array constants): rows 0..7 external, row 8 diagonal
_CONSTS_M = np.concatenate([_EXT_C_M, _DIAG_M[None, :]], axis=0)


def _external_linear_stacked(state):
    """circ(2*M4, M4, M4, M4) with the 16 lanes on axis 0: [16, ...]."""
    s4 = state.reshape((4, 4) + state.shape[1:])  # [block, lane, ...]

    def mul_small(v, k):
        if k == 1:
            return v
        if k == 2:
            return bb.add(v, v)
        return bb.add(bb.add(v, v), v)

    rows = []
    for i in range(4):  # output lane i within block
        acc = None
        for j in range(4):
            t = mul_small(s4[:, j], int(_M4[i, j]))
            acc = t if acc is None else bb.add(acc, t)
        rows.append(acc)
    m4b = jnp.stack(rows, axis=1)  # [block, lane, ...]
    total = bb.add(bb.add(m4b[0], m4b[1]), bb.add(m4b[2], m4b[3]))
    out = bb.add(m4b, total[None])
    return out.reshape(state.shape)


def _permute_stacked(state, ext_c, diag):
    """Poseidon2 permutation, state [16, ...] Montgomery uint32.

    Same round structure as `permute` (lanes minor); used by the pallas
    kernel where axis-0 lanes give full-tile vector ops.  ext_c: [8, 16]
    external round constants; diag: [16] internal diagonal (Montgomery)."""
    state = _external_linear_stacked(state)
    half = EXTERNAL_ROUNDS // 2
    diag_b = diag[:, None, None]
    for r in range(half):
        state = bb.add(state, ext_c[r][:, None, None])
        state = _sbox7(state)
        state = _external_linear_stacked(state)
    for r in range(INTERNAL_ROUNDS):
        s0 = _sbox7(bb.add(state[0], np.uint32(_INT_C_M[r])))
        state = jnp.concatenate([s0[None], state[1:]], axis=0)
        t = bb.add(state[0::2], state[1::2])  # tree-reduce the lane sum
        t = bb.add(t[0::2], t[1::2])
        t = bb.add(t[0::2], t[1::2])
        total = bb.add(t[0], t[1])
        state = bb.add(bb.mul(state, diag_b), total[None])
    for r in range(half, EXTERNAL_ROUNDS):
        state = bb.add(state, ext_c[r][:, None, None])
        state = _sbox7(state)
        state = _external_linear_stacked(state)
    return state


def _pallas_batch_ok(batch: int) -> bool:
    import os

    import jax

    if os.environ.get("VALIDA_TPU_P2_PALLAS", "1") == "0":
        return False
    interpret = os.environ.get("VALIDA_TPU_PALLAS_INTERPRET", "0") == "1"
    if not (interpret or jax.default_backend() in ("tpu", "axon")):
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

    def kernel(c_ref, x_ref, o_ref):
        ext_c = c_ref[:EXTERNAL_ROUNDS]
        diag = c_ref[EXTERNAL_ROUNDS]

        def absorb(blk, state):
            chunk = x_ref[pl.ds(blk * RATE, RATE)]  # (8, 8, pbj)
            block = bb.from_wrapped_u32(chunk)
            state = jnp.concatenate(
                [bb.add(state[:RATE], block), state[RATE:]], axis=0
            )
            return _permute_stacked(state, ext_c, diag)

        state = jnp.zeros((WIDTH, 8, pbj), jnp.uint32)
        state = jax.lax.fori_loop(0, n_blocks, absorb, state)
        o_ref[...] = bb.from_monty(state[:RATE])

    interpret = os.environ.get("VALIDA_TPU_PALLAS_INTERPRET", "0") == "1"
    out = pl.pallas_call(
        kernel,
        grid=(nb // _PB,),
        in_specs=[
            pl.BlockSpec((9, WIDTH), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((total, 8, pbj), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RATE, 8, pbj), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((RATE, 8, nb // 8), jnp.uint32),
        interpret=interpret,
    )(jnp.asarray(_CONSTS_M), wt)
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
