"""MXU (systolic-array) NTT: four-step radix-2^r steps as exact bf16 matmuls.

The stage-loop NTT (poly/ntt.py) is compute-bound on the VPU Montgomery
multiply (~7 u32 multiplies per butterfly).  The TPU's FLOPs live in the
MXU, so this module evaluates up to 7 butterfly levels at a time as a
B-point DFT **matrix multiply** (B = 2^r <= 128) using the four-step
identity

    X[u + B·v] = DFT_M( w^{u·t} · Σ_i (w^M)^{u·i} x[i·M + t] )[v]

(`w` the order-L root, `M = L/B`): one [B,B] modular matmul over the
leading axis, a pointwise twiddle, a bit-reversal row permutation (folded
into the matrix, keeping outputs bit-identical to poly/ntt.dif's
bitrev-out convention), then recursion on the M-point blocks.  The radix
schedule puts the log2(N) mod 7 remainder FIRST so the final (M = 1) step
is always a full 128-point transform.

Modular matmul on the MXU, exactly — two interchangeable digit systems:

  int8 (default on TPU — the MXU runs s8×s8→s32 ~1.6x faster than bf16
  here, and accumulation is exact in i32 with no mantissa budget):
  * split the (canonical) DFT matrix into **balanced base-256 digits**
    D_{j,i} = digit_i(2^{8j}·D mod p) ∈ [-128, 127] (every value in
    [0, p) has exactly 4 such digits since 127·(2^24+2^16+2^8+1) > p);
  * extract balanced digits of the u32 inputs in-kernel (borrow chain);
  * concatenate the j-digits along the contraction axis: 4 int8 matmuls
    of [B, 4B] @ [4B, T]; |accumulated sum| <= 4·128·128² < 2^23 — exact;
  * lift each signed c_i to [0, p) (one conditional add) and fold
    y = Σ_i c_i·2^{8i} mod p via 3 Montgomery const-multiplies.

  bf16 (fallback; also the plain-XLA path):
  * unsigned limb pairs D_{j,i} = limb_i(2^{8j}·D mod p), entries
    0..255 — exactly representable in bf16;
  * 16 bf16 matmuls with f32 accumulation: every partial product is
    <= 255², every accumulated sum <= 128·4·255² < 2^25 — all exact;
  * fold limbs on the VPU: y = Σ_i c_i·2^{8i} mod p via 3 Montgomery
    const-multiplies (c_i < 2^25 < p, so they are already reduced).

On TPU backends every step runs as ONE fused Pallas kernel (a single HBM
read + write per step: limb extraction, the 16 MXU dots, the f32→u32
fold, and the twiddle all happen in VMEM); elsewhere a plain-XLA matmul
pipeline computes the same values (used by the CPU bit-exactness tests).

Outputs are bit-identical to poly/ntt.dif (tested); used automatically by
poly/ntt.dif for device arrays on the TPU backend.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..field import babybear as bb

_B = 128
_LOG_B = 7

# VMEM budget for one input block of a kernel program (bytes); the
# kernel's live set is ~10x the input block (i32/f32 accumulators, limb
# temps, pipelined in/out buffers) against a 16 MB scoped-vmem limit
_BLOCK_BUDGET = 1 << 19


# ---------------------------------------------------------------------------
# Host-side table construction (cached per (log_len, inverse))
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _rev_bits(log_n: int) -> tuple:
    n = 1 << log_n
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return tuple(int(v) for v in rev)


def _dft_matrix(root: int, size: int) -> np.ndarray:
    """[size, size] canonical u32: D[u, i] = root^(u*i) mod p."""
    pw = np.ones(size, dtype=np.uint64)
    for k in range(1, size):
        pw[k] = pw[k - 1] * root % bb.P
    exps = (np.arange(size, dtype=np.uint64)[:, None]
            * np.arange(size, dtype=np.uint64)[None, :]) % size
    return pw[exps.astype(np.int64)].astype(np.uint32)


def _bf16(x: np.ndarray) -> np.ndarray:
    """numpy bf16 (ml_dtypes) — caches must hold CONCRETE host arrays:
    a jnp conversion inside a traced caller would cache a tracer."""
    import ml_dtypes

    return np.asarray(x, dtype=ml_dtypes.bfloat16)


def _limb_split(d: np.ndarray) -> np.ndarray:
    """[size, size] canonical u64 -> [16, size, size] bf16 limb pairs."""
    size = d.shape[0]
    limbs = np.zeros((4, 4, size, size), dtype=np.float32)
    for j in range(4):
        dj = (d << (8 * j)) % bb.P
        for i in range(4):
            limbs[j, i] = ((dj >> (8 * i)) & 0xFF).astype(np.float32)
    return _bf16(limbs.reshape(16, size, size))


def _balanced_digits(v: np.ndarray) -> list:
    """[size, size] values in [0, p) -> 4 int8 digit matrices with
    v = Σ_i digit_i·2^{8i}, digits in [-128, 127] (top digit <= 121)."""
    v = v.astype(np.int64)
    digits = []
    for _ in range(4):
        t = v & 0xFF
        t = np.where(t >= 128, t - 256, t)
        digits.append(t.astype(np.int8))
        v = (v - t) >> 8
    assert np.all(v == 0), "balanced base-256 overflow (input >= ~2^31)"
    return digits


def _i8_split(d: np.ndarray) -> np.ndarray:
    """[size, size] canonical u64 -> [4, size, 4·size] int8 tables.

    Table i is the j-concatenation (along the contraction axis) of the
    i-th balanced digit of 2^{8j}·D mod p, so each output digit needs
    ONE s8 matmul against the digit-concatenated input."""
    size = d.shape[0]
    per_j = [_balanced_digits((d << (8 * j)) % bb.P) for j in range(4)]
    return np.stack(
        [np.concatenate([per_j[j][i] for j in range(4)], axis=1)
         for i in range(4)]
    )


def _step_dft(log_len: int, inverse: bool, radix_log: int) -> np.ndarray:
    """[128, 128] canonical DFT matrix for a radix-2^radix_log step of
    the order-(2^log_len) transform, embedded to full MXU width.

    A radix-R step (R = 2^radix_log < 128) on x viewed as [R, M] is the
    same contraction as a 128-wide step on x viewed as [128, M/rep]
    (rep = 128/R): flat index i*M + s*(M/rep) + t_lo = (i*rep + s)*(M/rep)
    + t_lo, so the 128-matrix is kron(D_R, I_rep) — every step runs as a
    full [128,128] MXU matmul.  Output rows are pre-permuted to bitrev
    order so no gather pass is needed."""
    length = 1 << log_len
    size = 1 << radix_log
    rep = _B // size
    w = bb.two_adic_generator(log_len)
    if inverse:
        w = bb.h_inv(w)
    w_b = pow(w, length // size, bb.P)
    d = _dft_matrix(w_b, size).astype(np.uint64)
    d = d[np.asarray(_rev_bits(radix_log), dtype=np.int64)]
    if rep > 1:
        d = np.kron(d, np.eye(rep, dtype=np.uint64))
    return d


def _tail_dft(inverse: bool) -> np.ndarray:
    """[128, 128] canonical matrix of the final (M=1) 128-point step."""
    w = bb.two_adic_generator(_LOG_B)
    if inverse:
        w = bb.h_inv(w)
    d = _dft_matrix(w, _B).astype(np.uint64)
    return d[np.asarray(_rev_bits(_LOG_B), dtype=np.int64)]


@functools.lru_cache(maxsize=None)
def _matmul_limbs(log_len: int, inverse: bool, radix_log: int):
    """bf16 limb matrices [16, 128, 128] for a step (see _step_dft)."""
    return _limb_split(_step_dft(log_len, inverse, radix_log))


@functools.lru_cache(maxsize=None)
def _matmul_limbs_i8(log_len: int, inverse: bool, radix_log: int):
    """int8 digit tables [4, 128, 512] for a step (see _step_dft)."""
    return _i8_split(_step_dft(log_len, inverse, radix_log))


@functools.lru_cache(maxsize=None)
def _tail_limbs(inverse: bool):
    """bf16 limb matrices for the final (M=1) 128-point transform."""
    return _limb_split(_tail_dft(inverse))


@functools.lru_cache(maxsize=None)
def _tail_limbs_i8(inverse: bool):
    """int8 digit tables for the final (M=1) 128-point transform."""
    return _i8_split(_tail_dft(inverse))


@functools.lru_cache(maxsize=None)
def _step_twiddles(log_len: int, inverse: bool, radix_log: int):
    """Montgomery table [M4, 128] (transposed for Pallas block alignment)
    matching _matmul_limbs' embedded row order: row a*rep + s at lane t_lo
    holds w^(rev(a) * (s*M4 + t_lo)), M4 = 2^(log_len-7)."""
    from . import ntt as nttm

    size = 1 << radix_log
    rep = _B // size
    m4 = 1 << (log_len - _LOG_B)
    w = bb.two_adic_generator(log_len)
    if inverse:
        w = bb.h_inv(w)
    rev = _rev_bits(radix_log)
    rows = []
    for a in range(size):
        u = rev[a]
        wu = pow(w, u, bb.P)
        row_base = nttm._powers_host(wu, m4).astype(np.uint64)  # w^(u*t_lo)
        for s in range(rep):
            scale = np.uint64(pow(wu, s * m4, bb.P))
            rows.append(row_base * scale % np.uint64(bb.P))
    tw = np.stack(rows)
    return ((tw.T << 32) % np.uint64(bb.P)).astype(np.uint32)


@functools.lru_cache(maxsize=None)
def _fold_consts():
    """Montgomery forms of 2^8, 2^16, 2^24 (for the limb fold)."""
    return tuple(
        np.uint32(bb.to_monty_int(1 << (8 * i))) for i in range(1, 4)
    )


def _radix_schedule(log_n: int) -> list:
    """Partition log_n into per-step level counts, remainder first, so the
    last (twiddle-free, M=1) step is always a full 2^7-point transform."""
    r0 = log_n % _LOG_B
    return ([r0] if r0 else []) + [_LOG_B] * (log_n // _LOG_B)


# ---------------------------------------------------------------------------
# Device kernels
# ---------------------------------------------------------------------------


def _interpret() -> bool:
    """VALIDA_TPU_PALLAS_INTERPRET=1 runs the Pallas kernels in interpret
    mode (any backend) — used to exercise the exact kernel code paths
    (tiling, padding, in-kernel arithmetic) in CPU tests."""
    import os

    return os.environ.get("VALIDA_TPU_PALLAS_INTERPRET", "0") == "1"


def _pallas_available() -> bool:
    return _interpret() or jax.default_backend() in ("tpu", "axon")


def _use_i8() -> bool:
    """int8 MXU digits by default; VALIDA_TPU_MXU_I8=0 forces bf16."""
    import os

    return os.environ.get("VALIDA_TPU_MXU_I8", "1") == "1"


def _limb_dots(x, limbs_ref, k1, k2, k3):
    """In-kernel exact modular matmul: (D @ x) mod p for x [B, T] u32.

    Each dot's f32 accumulation is <= 128*255^2 < 2^24 (exact); the
    cross-limb j-sum can reach 4x that, so it MUST accumulate in i32."""
    accs = [None] * 4
    for j in range(4):
        # Mosaic has no direct u32->bf16 cast; hop through i32/f32
        xj = (
            ((x >> np.uint32(8 * j)) & np.uint32(0xFF))
            .astype(jnp.int32)
            .astype(jnp.float32)
            .astype(jnp.bfloat16)
        )
        for i in range(4):
            p = jnp.dot(
                limbs_ref[4 * j + i], xj, preferred_element_type=jnp.float32
            ).astype(jnp.int32)
            accs[i] = p if accs[i] is None else accs[i] + p
    c = [acc.astype(jnp.uint32) for acc in accs]
    y = bb.add(c[0], bb.mul(c[1], k1))
    y = bb.add(y, bb.mul(c[2], k2))
    return bb.add(y, bb.mul(c[3], k3))


def _limb_dots_i8(x, limbs_ref, k1, k2, k3):
    """int8 variant of _limb_dots: (D @ x) mod p for x [B, T] u32 < p.

    Balanced base-256 digits of x are extracted with a borrow chain
    (t - 256 when t >= 128; the borrow feeds the next digit, and the top
    digit stays < 127 because x < p < 2^31).  Digits concatenate along
    the contraction axis so each output digit is ONE s8xs8->s32 matmul
    against the [B, 4B] table; |sums| <= 4·128·2^14 < 2^23 — exact."""
    xi = x.astype(jnp.int32)
    ds = []
    for _ in range(3):
        t = xi & np.int32(255)
        t = jnp.where(t >= np.int32(128), t - np.int32(256), t)
        ds.append(t.astype(jnp.int8))
        xi = (xi - t) >> np.int32(8)
    ds.append(xi.astype(jnp.int8))
    xc = jnp.concatenate(ds, axis=0)  # [4B, T]
    c = []
    for i in range(4):
        ci = jnp.dot(limbs_ref[i], xc, preferred_element_type=jnp.int32)
        c.append(jnp.where(ci < 0, ci + np.int32(bb.P), ci).astype(jnp.uint32))
    y = bb.add(c[0], bb.mul(c[1], k1))
    y = bb.add(y, bb.mul(c[2], k2))
    return bb.add(y, bb.mul(c[3], k3))


def _dots_and_tables(inverse: bool, log_len: int = 0, radix_log: int = 0):
    """(dots_fn, host table array) for a step, or the tail if log_len=0."""
    if _use_i8():
        tabs = (_tail_limbs_i8(inverse) if log_len == 0
                else _matmul_limbs_i8(log_len, inverse, radix_log))
        return _limb_dots_i8, tabs
    tabs = (_tail_limbs(inverse) if log_len == 0
            else _matmul_limbs(log_len, inverse, radix_log))
    return _limb_dots, tabs


def _v2(x: int) -> int:
    """2-adic valuation of a positive int."""
    return (x & -x).bit_length() - 1


_STEP_BLOCK_CAP = _BLOCK_BUDGET * 2  # hard cap on one program's input block


def _step_tile(m4: int, rest_n: int) -> int:
    """Twiddle-tile size TM for _step_pallas, or 0 if no legal tile fits.

    Mosaic requires each block's trailing dim (TM*rest_n lanes) to be a
    multiple of 128 or the full trailing dim (m4*rest_n), and its
    second-to-last dim — TM for the (TM, 128) twiddle block — to be a
    multiple of 8 or the full m4.  Powers-of-two TM >= 2^(7 - v2(rest_n))
    satisfy the lane rule; TM == m4 is the full-dim escape hatch."""
    need = 1 << max(0, _LOG_B - _v2(rest_n))
    if need >= m4:
        tm = m4
    else:
        tm = min(max(need, 8), m4)
        budget = max(_BLOCK_BUDGET // (_B * rest_n * 4), 1)
        while tm * 2 <= m4 and tm * 2 <= budget and tm * 2 * rest_n <= 2048:
            tm *= 2
    if tm * rest_n * _B * 4 > _STEP_BLOCK_CAP:
        return 0
    return tm


def _step_pallas(a, blocks: int, log_len: int, inverse: bool, rest_n: int,
                 radix_log: int, tm: int):
    """One fused step (any radix, embedded to a [128,128] matmul):
    x[blocks, 128, M4*rest] -> same shape.

    Single HBM read + write: limb extraction, the 16 bf16 MXU dots, the
    f32->u32 fold, and the pointwise twiddle all happen in VMEM.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m4 = 1 << (log_len - _LOG_B)
    dots, limbs = _dots_and_tables(inverse, log_len, radix_log)
    tw = _step_twiddles(log_len, inverse, radix_log)
    k1, k2, k3 = _fold_consts()
    tmc = tm * rest_n

    def kernel(x_ref, limbs_ref, tw_ref, out_ref):
        y = dots(x_ref[0], limbs_ref, k1, k2, k3)
        # twiddle: one broadcast multiply per twiddle position (Mosaic
        # cannot shape-cast a (B, TM, rest) broadcast down to (B, TMC))
        for t in range(tm):
            sl = slice(t * rest_n, (t + 1) * rest_n)
            out_ref[0, :, sl] = bb.mul(y[:, sl], tw_ref[t][:, None])

    x3 = a.reshape(blocks, _B, m4 * rest_n)
    return pl.pallas_call(
        kernel,
        grid=(blocks, m4 // tm),
        in_specs=[
            pl.BlockSpec((1, _B, tmc), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(limbs.shape, lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, _B), lambda b, t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _B, tmc), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x3.shape, jnp.uint32),
        interpret=_interpret(),
    )(x3, limbs, tw)


def _tail_pallas(a, blocks: int, inverse: bool, rest_n: int):
    """Fused final step: blockwise 128-point transforms (M = 1, no
    twiddle), batching TB blocks per program to amortize grid overhead."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dots, limbs = _dots_and_tables(inverse)
    k1, k2, k3 = _fold_consts()
    tb = 1
    budget = max(_BLOCK_BUDGET // (_B * rest_n * 4), 1)
    while tb < blocks and tb * 2 <= budget and tb < 16:
        tb *= 2

    def kernel(x_ref, limbs_ref, out_ref):
        for b in range(tb):
            out_ref[b] = dots(x_ref[b], limbs_ref, k1, k2, k3)

    x3 = a.reshape(blocks, _B, rest_n)
    return pl.pallas_call(
        kernel,
        grid=(blocks // tb,),
        in_specs=[
            pl.BlockSpec((tb, _B, rest_n), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(limbs.shape, lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, _B, rest_n), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x3.shape, jnp.uint32),
        interpret=_interpret(),
    )(x3, limbs)


# ---------------------------------------------------------------------------
# Megakernel: the whole transform as ONE pallas call
# ---------------------------------------------------------------------------
#
# The per-`pallas_call` dispatch cost on the tunneled TPU backend is ~3 ms
# regardless of data size (measured round 3: 24 calls in one jit = 77 ms,
# 3 calls = 12 ms, a trivial 128 MB grid kernel = the same ~6 ms as the
# real step).  A 3-step transform therefore pays ~9 ms of fixed tax on
# ~4 ms of real streaming work.  This kernel runs EVERY step inside one
# pallas program: manual double-buffered DMA between HBM and VMEM, with
# per-step 2D strided views of the ping-pong HBM buffers via Ref.reshape.
# Step compute is the same exact modular-matmul + twiddle pipeline as
# _step_pallas/_tail_pallas (bit-identical outputs, tested).


def _mega_tm(m4: int, rest_n: int, cap: int = 2048) -> int:
    """Twiddle-tile rows per chunk: power of two dividing m4 with
    tm*rest_n <= cap lanes (512 KB chunks at u32)."""
    tm = 1
    while tm * 2 <= m4 and tm * 2 * rest_n <= cap:
        tm *= 2
    return tm


def _mega_supported(log_n: int, rest_n: int) -> bool:
    # >= 2 full steps; Mosaic requires every DMA'd lane extent to be a
    # multiple of the 128-lane tile, so the megakernel serves matrices
    # whose (flattened) width is a multiple of 128 — callers batch
    # columns to hit this (the per-step pipeline covers the rest)
    return log_n >= 2 * _LOG_B and rest_n % 128 == 0 and rest_n <= 2048


def _mega_pallas(a, log_n: int, inverse: bool, rest_n: int):
    """Natural-in, bitrev-out DIF over axis 0 as ONE pallas call.

    a: [n, rest_n] uint32 (Montgomery).  Bit-identical to the step-loop
    path (same matmul tables, same twiddles, same fold arithmetic).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = 1 << log_n
    schedule = _radix_schedule(log_n)
    k_steps = len(schedule)
    dots = _limb_dots_i8 if _use_i8() else _limb_dots
    k1, k2, k3 = _fold_consts()

    # static per-step plans + host tables
    plans = []
    tables = []  # flat list of device-input tables (limbs, tw, limbs, ...)
    blocks, log_len = 1, log_n
    tb_tail = max(1, min(16, 2048 // rest_n))
    for si, radix_log in enumerate(schedule):
        last = si == k_steps - 1
        if last:
            _, limbs = _dots_and_tables(inverse)
            plans.append(("tail", blocks, None, None, len(tables), None))
            tables.append(limbs)
        else:
            m4 = 1 << (log_len - _LOG_B)
            _, limbs = _dots_and_tables(inverse, log_len, radix_log)
            tw = _step_twiddles(log_len, inverse, radix_log)
            tm = _mega_tm(m4, rest_n)
            plans.append(("step", blocks, m4, tm, len(tables),
                          len(tables) + 1))
            tables.append(limbs)
            tables.append(tw)
        blocks <<= radix_log
        log_len -= radix_log

    max_tmc = max(
        (p[3] * rest_n for p in plans if p[0] == "step"), default=0
    )
    tail_rows = tb_tail * _B

    def kernel(x_ref, *rest):
        table_refs = rest[:len(tables)]
        out_ref, scr_ref = rest[len(tables):]

        def run_step(src_ref, dst_ref, plan, in_s, out_s, in_sem, out_sem):
            kind, blocks_, m4, tm, li, ti = plan
            limbs_ref = table_refs[li]
            if kind == "tail":
                rows = tail_rows
                n_chunks = n // rows
                src2 = src_ref.reshape(n, rest_n)
                dst2 = dst_ref.reshape(n, rest_n)

                def in_dma(slot, c):
                    return pltpu.make_async_copy(
                        src2.at[pl.ds(c * rows, rows)],
                        in_s.at[slot, :rows], in_sem.at[slot])

                def out_dma(slot, c):
                    return pltpu.make_async_copy(
                        out_s.at[slot, :rows],
                        dst2.at[pl.ds(c * rows, rows)], out_sem.at[slot])

                def compute(slot):
                    for j in range(tb_tail):
                        r0 = j * _B
                        out_s[slot, r0:r0 + _B, :] = dots(
                            in_s[slot, r0:r0 + _B, :], limbs_ref, k1, k2, k3
                        )
            else:
                tmc = tm * rest_n
                tiles = m4 // tm
                n_chunks = blocks_ * tiles
                tw_ref = table_refs[ti]
                src2 = src_ref.reshape(blocks_ * _B, m4 * rest_n)
                dst2 = dst_ref.reshape(blocks_ * _B, m4 * rest_n)

                def in_dma(slot, c):
                    b, t = c // tiles, c % tiles
                    return pltpu.make_async_copy(
                        src2.at[pl.ds(b * _B, _B), pl.ds(t * tmc, tmc)],
                        in_s.at[slot, :_B, :tmc], in_sem.at[slot])

                def out_dma(slot, c):
                    b, t = c // tiles, c % tiles
                    return pltpu.make_async_copy(
                        out_s.at[slot, :_B, :tmc],
                        dst2.at[pl.ds(b * _B, _B), pl.ds(t * tmc, tmc)],
                        out_sem.at[slot])

                def compute(slot, c):
                    t = c % tiles
                    y = dots(in_s[slot, :_B, :tmc], limbs_ref, k1, k2, k3)
                    # per-twiddle-row broadcast multiply; rest_n >= 128
                    # lanes so each op runs at full lane width
                    for tl in range(tm):
                        sl = slice(tl * rest_n, (tl + 1) * rest_n)
                        row = tw_ref[t * tm + tl, :]  # [128] monty
                        out_s[slot, :_B, sl] = bb.mul(y[:, sl], row[:, None])

            in_dma(0, 0).start()

            def loop(c, _):
                cur = jax.lax.rem(c, 2)
                nxt = jax.lax.rem(c + 1, 2)

                @pl.when(c + 1 < n_chunks)
                def _():
                    in_dma(nxt, c + 1).start()

                in_dma(cur, c).wait()

                @pl.when(c >= 2)
                def _():
                    out_dma(cur, c - 2).wait()

                if kind == "tail":
                    compute(cur)
                else:
                    compute(cur, c)
                out_dma(cur, c).start()
                return 0

            jax.lax.fori_loop(0, n_chunks, loop, 0, unroll=False)
            if n_chunks >= 2:
                out_dma((n_chunks - 2) % 2, n_chunks - 2).wait()
            out_dma((n_chunks - 1) % 2, n_chunks - 1).wait()

        def body(in_s, out_s, tin_s, tout_s, in_sem, out_sem):
            for si, plan in enumerate(plans):
                # target: final out for the last step, alternating before
                dst = out_ref if (k_steps - 1 - si) % 2 == 0 else scr_ref
                src = x_ref if si == 0 else (
                    out_ref if (k_steps - si) % 2 == 0 else scr_ref
                )
                if plan[0] == "tail":
                    run_step(src, dst, plan, tin_s, tout_s, in_sem, out_sem)
                else:
                    run_step(src, dst, plan, in_s, out_s, in_sem, out_sem)

        scratch = dict(
            in_sem=pltpu.SemaphoreType.DMA((2,)),
            out_sem=pltpu.SemaphoreType.DMA((2,)),
        )
        if max_tmc:
            scratch["in_s"] = pltpu.VMEM((2, _B, max_tmc), jnp.uint32)
            scratch["out_s"] = pltpu.VMEM((2, _B, max_tmc), jnp.uint32)
        else:  # tail-only schedules never reach here (log_n >= 14)
            scratch["in_s"] = pltpu.VMEM((2, 8, 128), jnp.uint32)
            scratch["out_s"] = pltpu.VMEM((2, 8, 128), jnp.uint32)
        scratch["tin_s"] = pltpu.VMEM((2, tail_rows, rest_n), jnp.uint32)
        scratch["tout_s"] = pltpu.VMEM((2, tail_rows, rest_n), jnp.uint32)

        pl.run_scoped(
            lambda in_s, out_s, tin_s, tout_s, in_sem, out_sem: body(
                in_s, out_s, tin_s, tout_s, in_sem, out_sem),
            in_s=scratch["in_s"], out_s=scratch["out_s"],
            tin_s=scratch["tin_s"], tout_s=scratch["tout_s"],
            in_sem=scratch["in_sem"], out_sem=scratch["out_sem"],
        )

    out, _scr = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in tables],
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                   pl.BlockSpec(memory_space=pltpu.HBM)],
        out_shape=[jax.ShapeDtypeStruct((n, rest_n), jnp.uint32),
                   jax.ShapeDtypeStruct((n, rest_n), jnp.uint32)],
        interpret=_interpret(),
    )(a.reshape(n, rest_n), *tables)
    return out


def _use_mega() -> bool:
    """One-call megakernel by default on TPU; VALIDA_TPU_NTT_MEGA=0 forces
    the per-step pallas pipeline."""
    import os

    return os.environ.get("VALIDA_TPU_NTT_MEGA", "1") == "1"


# ---------------------------------------------------------------------------
# Plain-XLA fallback (CPU jax; also the reference for kernel tests)
# ---------------------------------------------------------------------------


def _mod_matmul(limbs, x):
    """Exact (D @ x) mod p for u32 x of shape [B, ...]; contracts axis 0.

    Same exactness discipline as _limb_dots: per-dot f32 sums < 2^24,
    cross-limb accumulation in i32."""
    shape = x.shape
    b = shape[0]
    xf = x.reshape(b, -1)
    k1, k2, k3 = _fold_consts()
    limbs = jnp.asarray(limbs)
    cs = [None] * 4
    for j in range(4):
        xj = ((xf >> np.uint32(8 * j)) & np.uint32(0xFF)).astype(jnp.bfloat16)
        for i in range(4):
            prod = jax.lax.dot(
                limbs[4 * j + i], xj, preferred_element_type=jnp.float32
            ).astype(jnp.int32)
            cs[i] = prod if cs[i] is None else cs[i] + prod
    c = [ci.astype(jnp.uint32) for ci in cs]
    y = bb.add(c[0], bb.mul(c[1], k1))
    y = bb.add(y, bb.mul(c[2], k2))
    y = bb.add(y, bb.mul(c[3], k3))
    return y.reshape(shape)


def _step_xla(a, blocks, log_len, inverse, rest, radix_log):
    n = int(a.shape[0])
    m4 = 1 << (log_len - _LOG_B)
    x = a.reshape((blocks, _B, m4) + rest)
    x = jnp.moveaxis(x, 1, 0)  # [128, blocks, M4, ...]
    y = _mod_matmul(_matmul_limbs(log_len, inverse, radix_log), x)
    tw = jnp.asarray(_step_twiddles(log_len, inverse, radix_log)).T
    y = bb.mul(y, tw.reshape((_B, 1, m4) + (1,) * len(rest)))
    return jnp.moveaxis(y, 0, 1).reshape((n,) + rest)


def _tail_xla(a, blocks, inverse, rest):
    n = int(a.shape[0])
    x = a.reshape((blocks, _B) + rest)
    x = jnp.moveaxis(x, 1, 0)
    y = _mod_matmul(_tail_limbs(inverse), x)
    return jnp.moveaxis(y, 0, 1).reshape((n,) + rest)


# ---------------------------------------------------------------------------
# Public transform
# ---------------------------------------------------------------------------


def dif(a, inverse: bool = False):
    """Natural-in, bitrev-out DIF over axis 0; bit-identical to ntt.dif.

    a: jnp uint32 [N, ...] Montgomery form, N a power of two >= 128.
    """
    n = int(a.shape[0])
    log_n = n.bit_length() - 1
    assert 1 << log_n == n and log_n >= _LOG_B
    rest = tuple(a.shape[1:])
    rest_n = 1
    for d in rest:
        rest_n *= int(d)
    use_pallas = _pallas_available() and rest_n * _B * 4 <= _BLOCK_BUDGET

    # Lane padding: a trailing width with a small 2-adic valuation (e.g. an
    # odd 51-column trace) forces huge 2^(7-v2) twiddle tiles.  Rounding the
    # flattened lane axis up to a multiple of 8 caps the forced tile at 16
    # for <= 7 wasted lanes; pad once for the whole transform.
    r_run = rest_n
    if use_pallas and log_n > _LOG_B:
        first_m4 = 1 << (log_n - _LOG_B)
        if _step_tile(first_m4, rest_n) == 0:
            r8 = (rest_n + 7) & ~7
            if _step_tile(first_m4, r8) != 0:
                r_run = r8
    padded = r_run != rest_n
    if padded:
        a = a.reshape(n, rest_n)
        a = jnp.concatenate(
            [a, jnp.zeros((n, r_run - rest_n), dtype=a.dtype)], axis=1
        )

    if use_pallas and _use_mega() and _mega_supported(log_n, r_run):
        out = _mega_pallas(a, log_n, inverse, r_run)
        if padded:
            out = out[:, :rest_n]
        return out.reshape((n,) + rest)

    blocks = 1
    log_len = log_n
    schedule = _radix_schedule(log_n)
    for step, radix_log in enumerate(schedule):
        last = step == len(schedule) - 1
        if last:
            assert radix_log == _LOG_B and log_len == _LOG_B
            if use_pallas:
                a = _tail_pallas(a, blocks, inverse, r_run)
                a = a.reshape(n, r_run) if padded else a.reshape((n,) + rest)
            else:
                a = _tail_xla(a, blocks, inverse,
                              (r_run,) if padded else rest)
        else:
            tm = _step_tile(1 << (log_len - _LOG_B), r_run) if use_pallas else 0
            if tm:
                a = _step_pallas(a, blocks, log_len, inverse, r_run,
                                 radix_log, tm)
                a = a.reshape(n, r_run) if padded else a.reshape((n,) + rest)
            else:
                a = _step_xla(a, blocks, log_len, inverse,
                              (r_run,) if padded else rest, radix_log)
        blocks <<= radix_log
        log_len -= radix_log
    if padded:
        a = a[:, :rest_n].reshape((n,) + rest)
    return a
