"""Radix-2 NTT / coset LDE over BabyBear, vectorized for TPU.

Conventions
-----------
* All transforms act over **axis 0** (trace rows); trailing axes (columns)
  ride along in VPU lanes.
* "natural" order: index i holds evaluation at g^i (g = two-adic generator
  of the domain size).  "bitrev": bit-reversed indexing of the same.
* `dif(a)`:  natural-in -> bitrev-out, decimation in frequency.
* `dit(a)`:  bitrev-in  -> natural-out, decimation in time.
  A DIF with inverse twiddles followed by 1/N scaling is the inverse of DIT
  and vice versa, so typical pipelines need no explicit bit-reversal gathers.

Replaces the reference's Radix2DitParallel / Radix2Bowers
(`/root/reference/basic/src/bin/valida.rs:379`) with an XLA-fused stage loop;
each stage is one fused elementwise pass (add/sub/Montgomery-mul), log2(N)
passes total.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax.numpy as jnp

from ..field import babybear as bb
from ..backend import xp_of


def _mxu_enabled(a, log_n: int) -> bool:
    """Route device transforms through the MXU matmul NTT (mxu_ntt.py).

    On by default on the TPU backends for sizes where the [128,128]
    matmul steps apply; VALIDA_TPU_MXU_NTT=0/1 forces it off/on (1 also
    enables it on CPU jax, used by the bit-exactness tests)."""
    if isinstance(a, np.ndarray) or log_n < 7:
        return False
    flag = os.environ.get("VALIDA_TPU_MXU_NTT")
    if flag is not None:
        return flag != "0"
    import jax

    return jax.default_backend() in ("tpu", "axon")

# ---------------------------------------------------------------------------
# Twiddle / permutation caches (host-side, keyed by static shape params)
# ---------------------------------------------------------------------------


def _powers_host(w: int, n: int) -> np.ndarray:
    """[1, w, w^2, ..., w^{n-1}] canonical, via numpy uint64 log-doubling."""
    out = np.ones(max(n, 1), dtype=np.uint64)
    if n <= 1:
        return out.astype(np.uint32)
    out[1] = w
    length = 2
    while length < n:
        step = pow(int(out[length - 1]) * w % bb.P, 1, bb.P)  # w^length
        take = min(length, n - length)
        out[length : length + take] = out[:take] * np.uint64(step) % np.uint64(bb.P)
        length += take
    return out.astype(np.uint32)


@functools.lru_cache(maxsize=None)
def _root_powers(log_n: int, inverse: bool) -> np.ndarray:
    """Montgomery-form powers of the order-2^log_n root (length 2^(log_n-1))."""
    n = 1 << log_n
    w = bb.two_adic_generator(log_n)
    if inverse:
        w = bb.h_inv(w)
    canon = _powers_host(w, max(n // 2, 1))
    return ((canon.astype(np.uint64) << 32) % np.uint64(bb.P)).astype(np.uint32)


@functools.lru_cache(maxsize=None)
def bitrev_indices(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev.astype(np.int32)


@functools.lru_cache(maxsize=None)
def shift_powers(shift: int, log_n: int, bitrev: bool = False) -> np.ndarray:
    """Montgomery powers shift^i for i < 2^log_n (optionally bitrev order)."""
    canon = _powers_host(shift % bb.P, 1 << log_n)
    if bitrev:
        canon = canon[bitrev_indices(log_n)]
    return ((canon.astype(np.uint64) << 32) % np.uint64(bb.P)).astype(np.uint32)


def _bcast(tw: jnp.ndarray, ndim_rest: int):
    return tw.reshape(tw.shape + (1,) * ndim_rest)


# ---------------------------------------------------------------------------
# Core stage loops (static python loops -> unrolled & fused under jit)
# ---------------------------------------------------------------------------


def dif(a, inverse: bool = False):
    """Natural-in, bitrev-out radix-2 DIF over axis 0 (no 1/N scaling).

    Two butterfly levels are fused per pass (radix-4): the stage loop is
    memory-bound on TPU (each level re-reads the whole array from HBM),
    so fusing halves the HBM traffic at identical arithmetic cost.
    Outputs are bit-identical to the radix-2 schedule."""
    n = int(a.shape[0])
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, "NTT size must be a power of two"
    if n == 1:
        return a
    if _mxu_enabled(a, log_n):
        from . import mxu_ntt

        return mxu_ntt.dif(a, inverse)
    xp = xp_of(a)
    rest = tuple(a.shape[1:])
    nd = len(rest)
    pw = _root_powers(log_n, inverse)
    s = 0
    while log_n - s >= 2:
        q = n >> (s + 2)
        tw_s = pw[:: 1 << s][: 2 * q]
        t0 = _bcast(tw_s[:q], nd)[None]
        t1 = _bcast(tw_s[q:], nd)[None]
        te = _bcast(pw[:: 1 << (s + 1)][:q], nd)[None]
        x = a.reshape((1 << s, 2, 2, q) + rest)
        x00, x01 = x[:, 0, 0], x[:, 0, 1]
        x10, x11 = x[:, 1, 0], x[:, 1, 1]
        # level s
        lo0 = bb.add(x00, x10)
        lo1 = bb.add(x01, x11)
        hi0 = bb.mul(bb.sub(x00, x10), t0)
        hi1 = bb.mul(bb.sub(x01, x11), t1)
        # level s+1
        y0 = bb.add(lo0, lo1)
        y1 = bb.mul(bb.sub(lo0, lo1), te)
        y2 = bb.add(hi0, hi1)
        y3 = bb.mul(bb.sub(hi0, hi1), te)
        a = xp.stack([y0, y1, y2, y3], axis=1).reshape((n,) + rest)
        s += 2
    if s < log_n:  # odd log_n: one radix-2 tail stage
        half = n >> (s + 1)
        tw = pw[:: 1 << s][:half]
        x = a.reshape((1 << s, 2, half) + rest)
        x0 = x[:, 0]
        x1 = x[:, 1]
        lo = bb.add(x0, x1)
        hi = bb.mul(bb.sub(x0, x1), _bcast(tw, nd)[None])
        a = xp.stack([lo, hi], axis=1).reshape((n,) + rest)
    return a


def dit(a, inverse: bool = False):
    """Bitrev-in, natural-out radix-2 DIT over axis 0 (no 1/N scaling)."""
    n = int(a.shape[0])
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if n == 1:
        return a
    xp = xp_of(a)
    rest = tuple(a.shape[1:])
    nd = len(rest)
    pw = _root_powers(log_n, inverse)
    s = log_n - 1
    while s >= 1:  # radix-4: levels s then s-1, one HBM pass (see dif)
        q = n >> (s + 1)
        te = _bcast(pw[:: 1 << s][:q], nd)[None]
        tw_lo = pw[:: 1 << (s - 1)][: 2 * q]
        t0 = _bcast(tw_lo[:q], nd)[None]
        t1 = _bcast(tw_lo[q:], nd)[None]
        x = a.reshape((1 << (s - 1), 2, 2, q) + rest)
        x00, x01 = x[:, 0, 0], x[:, 0, 1]
        x10, x11 = x[:, 1, 0], x[:, 1, 1]
        # level s (within each half of the level-(s-1) group)
        o0 = bb.mul(x01, te)
        a0 = bb.add(x00, o0)
        a1 = bb.sub(x00, o0)
        o1 = bb.mul(x11, te)
        b0 = bb.add(x10, o1)
        b1 = bb.sub(x10, o1)
        # level s-1
        c0 = bb.mul(b0, t0)
        c1 = bb.mul(b1, t1)
        a = xp.stack(
            [bb.add(a0, c0), bb.add(a1, c1), bb.sub(a0, c0), bb.sub(a1, c1)],
            axis=1,
        ).reshape((n,) + rest)
        s -= 2
    if s == 0:  # odd log_n: one radix-2 tail stage
        half = n >> 1
        tw = pw[:half]
        x = a.reshape((1, 2, half) + rest)
        e = x[:, 0]
        o = bb.mul(x[:, 1], _bcast(tw, nd)[None])
        a = xp.stack([bb.add(e, o), bb.sub(e, o)], axis=1).reshape((n,) + rest)
    return a


def _scale_inv_n(a, log_n: int):
    inv_n = bb.monty_scalar(bb.h_inv(1 << log_n))
    return bb.mul(a, np.uint32(inv_n))


# ---------------------------------------------------------------------------
# User-facing transforms (Montgomery-form uint32 arrays)
# ---------------------------------------------------------------------------


def ntt(a):
    """Coefficients (natural) -> evaluations (natural)."""
    return dit(a[bitrev_indices(int(a.shape[0]).bit_length() - 1)], False)


def intt(a):
    """Evaluations (natural) -> coefficients (natural)."""
    n = a.shape[0]
    log_n = n.bit_length() - 1
    coeffs_rev = dif(a, inverse=True)
    coeffs = coeffs_rev[bitrev_indices(log_n)]
    return _scale_inv_n(coeffs, log_n)


def coset_eval_from_coeffs(coeffs, shift: int, out_bitrev: bool = False):
    """Evaluate polynomial (natural coeffs, len N) on coset shift·H_N."""
    n = int(coeffs.shape[0])
    log_n = n.bit_length() - 1
    sp = shift_powers(shift, log_n)
    scaled = bb.mul(coeffs, _bcast(sp, coeffs.ndim - 1))
    if out_bitrev:
        return dif(scaled, False)
    return ntt(scaled)


def coset_intt(evals, shift: int):
    """Evaluations on coset shift·H_N (natural) -> coefficients (natural)."""
    n = int(evals.shape[0])
    log_n = n.bit_length() - 1
    coeffs = intt(evals)
    sp_inv = shift_powers(bb.h_inv(shift % bb.P), log_n)
    return bb.mul(coeffs, _bcast(sp_inv, coeffs.ndim - 1))


def coset_lde(evals, log_blowup: int, shift: int, out_bitrev: bool = False):
    """Low-degree extend evaluations on H_N to the coset shift·H_{N·2^b}.

    Mirrors the PCS commit path (`derive/src/lib.rs:307-331` via Plonky3
    TwoAdicFriPcs): iNTT, zero-pad, coset NTT.
    """
    coeffs = intt(evals)
    xp = xp_of(coeffs)
    padded = xp.concatenate(
        [coeffs] + [xp.zeros_like(coeffs)] * ((1 << log_blowup) - 1),
        axis=0,
    )
    return coset_eval_from_coeffs(padded, shift, out_bitrev=out_bitrev)


def eval_at_ext_point(coeffs, z_powers):
    """Evaluate base-field polynomial columns at an extension point.

    coeffs: [N, C] monty; z_powers: [N, 5] monty (powers of z, coeff-major).
    Returns [C, 5].
    """
    from ..field import ext as extf

    # sum_i coeffs[i, c] * z^i  -> for each ext coefficient d: dot over i
    out = []
    for d in range(5):
        # [N, C] * [N, 1] summed over N with modular adds
        prod = bb.mul(coeffs, z_powers[:, d][:, None])
        out.append(_mod_sum(prod, axis=0))
    return xp_of(coeffs).stack(out, axis=-1)


def _mod_sum(x, axis=0):
    """Sum of monty values along an axis, reduced mod p.

    Accumulate in uint64?  TPU lacks u64 — use pairwise tree reduction with
    modular adds instead (log depth, fully vectorized).
    """
    xp = xp_of(x)
    n = int(x.shape[axis])
    x = xp.moveaxis(x, axis, 0)
    size = 1
    while size < n:
        size <<= 1
    if size != n:
        pad = xp.zeros((size - n,) + tuple(x.shape[1:]), dtype=x.dtype)
        x = xp.concatenate([x, pad], axis=0)
    while x.shape[0] > 1:
        half = x.shape[0] // 2
        x = bb.add(x[:half], x[half:])
    return x[0]
