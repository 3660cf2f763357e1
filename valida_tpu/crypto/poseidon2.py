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


def hash_words(words):
    """Sponge hash of u32-word rows: [n, w] canonical -> [n, 8] canonical.

    Words are reduced mod p on absorption (digest words are already < p).
    """
    xp = xp_of(words)
    n, w = words.shape
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
