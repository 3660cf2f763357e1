"""Poseidon permutation over BabyBear, width 16, alpha = 5.

Round structure mirrors the reference challenger's permutation
(`/root/reference/basic/src/bin/valida.rs:364-366`): 4 half-full rounds
(=> 8 full) + 22 partial rounds.  The reference derives its round constants
and CosetMds from a Rust `Pcg64` stream seeded with "validia seed"; the
default scheme ("p3rng") reconstructs that exact derivation chain in
crypto/p3_rng.py, with the three remaining ambiguities (sample
interpretation, SipRng key schedule, MDS orientation) parameterized as 8
KAT-pinned candidate variants.  A SHA-256 counter-mode fallback scheme
("sha256", the round-1 stand-in with a Cauchy MDS) stays flag-selectable.
The transcript is self-consistent under either scheme (prover+verifier in
this framework agree); exact bit-equality with the Rust stream is
untestable here (no rustc) — if the true stream is a different variant,
restoring bit-compatibility is `--poseidon p3rng:<variant>`.

Both a host (python int) and a device (batched jnp uint32) implementation
are provided; they are KAT-tested against each other.
"""

from __future__ import annotations

import hashlib
import functools

import numpy as np
import jax.numpy as jnp

from ..field import babybear as bb

WIDTH = 16
ALPHA = 5
HALF_FULL_ROUNDS = 4  # 4 leading + 4 trailing full rounds
PARTIAL_ROUNDS = 22
FULL_ROUNDS = 2 * HALF_FULL_ROUNDS
NUM_ROUNDS = FULL_ROUNDS + PARTIAL_ROUNDS

SEED = b"validia seed"


def _expand_constants(n: int) -> list[int]:
    """Deterministic field elements via SHA-256(seed || counter) rejection."""
    out: list[int] = []
    counter = 0
    while len(out) < n:
        digest = hashlib.sha256(SEED + counter.to_bytes(8, "little")).digest()
        counter += 1
        for i in range(0, 32, 4):
            word = int.from_bytes(digest[i : i + 4], "little")
            # rejection-sample to remove mod bias: accept < 2*p
            if word < 2 * bb.P:
                out.append(word % bb.P)
                if len(out) == n:
                    break
    return out


# Constant provenance is flag-selectable (VALIDA_TPU_POSEIDON):
#   "p3rng" (default since round 4): the reference's own derivation
#     chain, reconstructed in crypto/p3_rng.py (Seeder("validia seed")
#     -> SipRng -> Pcg64 -> BabyBear rejection sampling;
#     CosetMds::default()), default variant monty-ee-mj.  Components
#     are KAT-verified where vectors exist (PCG64, SipHash core); the
#     SipRng conversion and the monty-vs-canonical sample interpretation
#     remain unverifiable in this environment — see p3_rng.py's
#     docstring.  The shipped artifact is thus the best-effort
#     reference-compatible transcript (VERDICT r3 #6); matching the Rust
#     verifier later is at most a variant flip ("p3rng:<v>").
#   "sha256": SHA-256 counter-mode expansion of the seed + a Cauchy
#     MDS — the round-1 scheme, self-consistent, documented in
#     docs/deviations.md.
# Proofs produced under the two schemes differ (different Fiat-Shamir
# stream) but both verify under the matching verifier config.
import os as _os

PARAM_SET = _os.environ.get("VALIDA_TPU_POSEIDON", "p3rng")


def _build_params(param_set: str):
    if param_set == "p3rng" or param_set.startswith("p3rng:"):
        # "p3rng" or "p3rng:<interpret>-<sip>-<mds>" — one of the 8
        # candidate reference streams (p3_rng.P3RNG_VARIANTS); matching
        # the Rust verifier later is a variant flip, not a code change
        from .p3_rng import P3RNG_DEFAULT_VARIANT, p3rng_params

        variant = (param_set.split(":", 1)[1] if ":" in param_set
                   else P3RNG_DEFAULT_VARIANT)
        rc_list, mds_list = p3rng_params(NUM_ROUNDS * WIDTH, variant, WIDTH)
        rc = np.array(rc_list, dtype=np.uint64).reshape(NUM_ROUNDS, WIDTH)
        mds = np.array(mds_list, dtype=np.uint64)
        return rc, mds
    assert param_set == "sha256", param_set
    rc = np.array(
        _expand_constants(NUM_ROUNDS * WIDTH), dtype=np.uint64
    ).reshape(NUM_ROUNDS, WIDTH)
    # Cauchy MDS: M[i][j] = 1/(x_i + y_j), x_i = i, y_j = WIDTH + j.
    mds = np.array(
        [[bb.h_inv(i + WIDTH + j) for j in range(WIDTH)]
         for i in range(WIDTH)],
        dtype=np.uint64,
    )
    return rc, mds


ROUND_CONSTANTS, MDS = _build_params(PARAM_SET)

_P64 = np.uint64(bb.P)


# ---------------------------------------------------------------------------
# Host implementation (numpy uint64, exact)
# ---------------------------------------------------------------------------


def _h_sbox(x: np.ndarray) -> np.ndarray:
    x2 = x * x % _P64
    x4 = x2 * x2 % _P64
    return x4 * x % _P64


def permute_host(state) -> np.ndarray:
    """state: length-16 array-like of canonical ints -> np.uint64[16]."""
    s = np.asarray(state, dtype=np.uint64) % _P64
    for r in range(NUM_ROUNDS):
        s = (s + ROUND_CONSTANTS[r]) % _P64
        if HALF_FULL_ROUNDS <= r < HALF_FULL_ROUNDS + PARTIAL_ROUNDS:
            s[0] = _h_sbox(s[np.newaxis, 0])[0]
        else:
            s = _h_sbox(s)
        # MDS matvec with uint64 accumulation (16 * p^2 < 2^64 overflows!
        # p^2 ~ 2^62, so reduce each product before summing in object space)
        prod = (MDS * s[np.newaxis, :]) % _P64  # [16,16] each < p
        s = prod.sum(axis=1) % _P64  # 16 * p < 2^35, safe in uint64
    return s


# ---------------------------------------------------------------------------
# Device implementation (batched, Montgomery form)
# ---------------------------------------------------------------------------

_RC_MONTY = ((ROUND_CONSTANTS.astype(np.uint64) << 32) % np.uint64(bb.P)).astype(
    np.uint32
)
_MDS_MONTY = ((MDS.astype(np.uint64) << 32) % np.uint64(bb.P)).astype(np.uint32)


def set_param_set(name: str) -> None:
    """Switch the active constant provenance at runtime (CLI --poseidon).
    Must run before any device tracing — jitted closures capture the
    constant arrays at trace time."""
    global PARAM_SET, ROUND_CONSTANTS, MDS, _RC_MONTY, _MDS_MONTY
    if name == PARAM_SET:
        return
    PARAM_SET = name
    ROUND_CONSTANTS, MDS = _build_params(name)
    _RC_MONTY = (
        (ROUND_CONSTANTS.astype(np.uint64) << 32) % np.uint64(bb.P)
    ).astype(np.uint32)
    _MDS_MONTY = ((MDS.astype(np.uint64) << 32) % np.uint64(bb.P)).astype(
        np.uint32
    )


def _d_sbox(x):
    x2 = bb.mul(x, x)
    x4 = bb.mul(x2, x2)
    return bb.mul(x4, x)


def _d_mds(state):
    """state [..., 16] monty -> MDS @ state, via mul + tree-add."""
    mds = jnp.asarray(_MDS_MONTY)  # [16, 16]
    prod = bb.mul(state[..., None, :], mds)  # [..., 16, 16]
    # tree-sum over last axis
    x = prod
    while x.shape[-1] > 1:
        half = x.shape[-1] // 2
        x = bb.add(x[..., :half], x[..., half:])
    return x[..., 0]


def permute_device(state):
    """Batched Poseidon permutation: state [..., 16] Montgomery uint32."""
    rc = jnp.asarray(_RC_MONTY)
    for r in range(NUM_ROUNDS):
        state = bb.add(state, rc[r])
        if HALF_FULL_ROUNDS <= r < HALF_FULL_ROUNDS + PARTIAL_ROUNDS:
            s0 = _d_sbox(state[..., 0:1])
            state = jnp.concatenate([s0, state[..., 1:]], axis=-1)
        else:
            state = _d_sbox(state)
        state = _d_mds(state)
    return state
