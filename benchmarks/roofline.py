"""Device roofline microbenchmarks: measured HBM stream bandwidth, MXU
int8 throughput, and a per-step NTT timing breakdown.

Gives the headline NTT number its denominator (VERDICT r2 #2): fraction
of the binding resource (HBM bytes or MXU MACs) actually achieved.

Timing discipline (CLAUDE.md): chain iterations on a data dependency and
fetch a scalar — `block_until_ready` alone under-reports through the
axon tunnel.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _time_chained(f, x, iters, rounds=3):
    y = f(x)
    _ = np.asarray(jax.tree_util.tree_leaves(y)[0].ravel()[0])  # compile+sync
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        y = x
        for _ in range(iters):
            y = f(y)
        _ = np.asarray(jax.tree_util.tree_leaves(y)[0].ravel()[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def bench_hbm_stream(log_n=19, cols=64):
    """y = x + 1 over the NTT-sized matrix: 1 read + 1 write per pass."""
    n = 1 << log_n
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 1 << 30, size=(n, cols),
                                          dtype=np.uint32)
    )
    f = jax.jit(lambda a: a + np.uint32(1))
    dt = _time_chained(f, x, iters=16)
    gbytes = 2 * n * cols * 4 / 1e9
    return {"hbm_stream_GBps": gbytes / dt, "seconds": dt}


def bench_mxu_i8(m=4096, k=4096, n=4096):
    """s8 x s8 -> s32 matmul throughput (MACs/s)."""
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(-127, 127, size=(m, k), dtype=np.int8))
    b = jnp.asarray(rng.integers(-127, 127, size=(k, n), dtype=np.int8))

    @jax.jit
    def f(b_):
        c = jax.lax.dot(a, b_, preferred_element_type=jnp.int32)
        # feed back an int8 view to chain on a data dependency
        return (c & 127).astype(jnp.int8)

    dt = _time_chained(f, b, iters=8)
    macs = m * k * n
    return {"mxu_i8_TMACs": macs / dt / 1e12, "seconds": dt}


def bench_mxu_bf16(m=4096, k=4096, n=4096):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((m, k), dtype=np.float32), dtype=jnp.bfloat16)
    b = jnp.asarray(rng.random((k, n), dtype=np.float32), dtype=jnp.bfloat16)

    @jax.jit
    def f(b_):
        c = jax.lax.dot(a, b_, preferred_element_type=jnp.float32)
        return c.astype(jnp.bfloat16)

    dt = _time_chained(f, b, iters=8)
    return {"mxu_bf16_TMACs": m * k * n / dt / 1e12, "seconds": dt}


def bench_ntt_steps(log_n=19, cols=64):
    """Time each NTT step in isolation + the fused whole transform."""
    from valida_tpu.poly import mxu_ntt as mx
    from valida_tpu.poly import ntt as nttm

    n = 1 << log_n
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 2013265921, size=(n, cols),
                                          dtype=np.uint32)
    )
    out = {}
    schedule = mx._radix_schedule(log_n)
    blocks, log_len = 1, log_n
    for si, radix_log in enumerate(schedule):
        last = si == len(schedule) - 1
        rest_n = cols
        if last:
            f = jax.jit(lambda a, b=blocks: mx._tail_pallas(
                a, b, False, rest_n).reshape(n, cols))
        else:
            tm = mx._step_tile(1 << (log_len - mx._LOG_B), rest_n)
            f = jax.jit(lambda a, b=blocks, ll=log_len, rl=radix_log, t=tm:
                        mx._step_pallas(a, b, ll, False, rest_n, rl, t)
                        .reshape(n, cols))
        dt = _time_chained(f, x, iters=8)
        out[f"step{si}_radix{radix_log}_s"] = dt
        out[f"step{si}_GBps"] = 2 * n * cols * 4 / 1e9 / dt
        blocks <<= radix_log
        log_len -= radix_log
    f_all = jax.jit(nttm.dif)
    dt = _time_chained(f_all, x, iters=8)
    out["full_ntt_s"] = dt
    out["full_ntt_butterflies_per_s"] = (n // 2) * log_n * cols / dt
    out["full_ntt_effective_GBps"] = (
        len(schedule) * 2 * n * cols * 4 / 1e9 / dt
    )
    return out


def bench_vpu_ceilings(log_n=13, cols=128):
    """Measured VPU ceilings in the two currencies the hash kernels spend:
    BabyBear Montgomery multiplies (bb.mul = ~30 elementwise u32 ops:
    16-bit-limb _mul64 + _monty_reduce) and raw keccak-style bitops
    (shift/or/xor).  These are the honest denominators for the hash
    rooflines — a hand-derived "ops/cycle × lanes × clock" number would
    hide issue-width and fusion effects the chain below experiences too."""
    from valida_tpu.field import babybear as bb

    n = 1 << log_n
    x = jnp.asarray(
        np.random.default_rng(0).integers(1, bb.P, size=(n, cols),
                                          dtype=np.uint32)
    )

    @jax.jit
    def mul_chain(a):
        for _ in range(8):
            a = bb.mul(a, a)
        return a

    dt = _time_chained(mul_chain, x, iters=8)
    bbmul_per_s = 8 * n * cols / dt

    @jax.jit
    def bitop_chain(a):
        for _ in range(8):
            a = a ^ ((a << np.uint32(1)) | (a >> np.uint32(31)))
        return a

    dt = _time_chained(bitop_chain, x, iters=8)
    # 3 u32 bitops per chain step (shl, shr, or) + 1 xor
    bitops_per_s = 8 * 4 * n * cols / dt
    return {"vpu_bbmul_per_s": bbmul_per_s, "vpu_bitops_per_s": bitops_per_s}


# Work accounting for the hash kernels (per input row of `cols` u32):
#   keccak:   perms = cols//34 + 1 (rate 34 words); one f[1600] in the
#             (lo, hi) u32-pair representation executes ~482 elementwise
#             u32 bitops per round x 24 rounds ~= 11.6e3 bitops (theta 120,
#             D-apply 50, rho 200, chi 150, iota 2; pi is free reindexing).
#   poseidon2: perms = ceil(cols/8) (rate 8); one width-16 permutation =
#             772 bb.muls (8 ext rounds x 16 lanes x 4-mul sbox7 = 512 +
#             13 int rounds x (4 + 16 diag) = 260) + ~1.5e3 bb.adds.
_KECCAK_BITOPS_PER_PERM = 482 * 24
_P2_MULS_PER_PERM = 772


def bench_hash_roofline(hasher, log_rows, cols=64, ceilings=None,
                        stream_gbps=None):
    """rows/s + fraction-of-binding-resource for one hasher/size
    (VERDICT r3 #5).  Reports the achieved share of BOTH candidate
    binding resources — HBM stream bytes and the VPU compute currency —
    so the binding one is whichever fraction is higher."""
    from valida_tpu.crypto.merkle import get_hasher
    from valida_tpu.field import babybear as bb

    h = get_hasher(hasher)
    n = 1 << log_rows
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, bb.P, size=(n, cols),
                                          dtype=np.uint32)
    )

    @jax.jit
    def f(a):
        d = h.hash_words(a)
        # feed digests back into the input's first 8 columns: a data
        # dependency so chained iterations can't overlap-and-hide
        return a.at[:, :8].set(d)

    dt = _time_chained(f, x, iters=4)
    rows_per_s = n / dt
    out = {
        "metric": "hash_roofline",
        "hasher": h.name,
        "log_rows": log_rows,
        "cols": cols,
        "rows_per_s": rows_per_s,
        "seconds": dt,
    }
    gbytes = n * (cols + 8) * 4 / 1e9  # read row + write digest
    out["effective_GBps"] = gbytes / dt
    if stream_gbps:
        out["fraction_of_stream"] = out["effective_GBps"] / stream_gbps
    if ceilings:
        if h.name == "keccak":
            perms = cols // 34 + 1
            achieved = rows_per_s * perms * _KECCAK_BITOPS_PER_PERM
            out["perm_per_row"] = perms
            out["achieved_bitops_per_s"] = achieved
            out["fraction_of_vpu_bitops"] = (
                achieved / ceilings["vpu_bitops_per_s"]
            )
        else:
            perms = -(-cols // 8)
            achieved = rows_per_s * perms * _P2_MULS_PER_PERM
            out["perm_per_row"] = perms
            out["achieved_bbmul_per_s"] = achieved
            out["fraction_of_vpu_bbmul"] = (
                achieved / ceilings["vpu_bbmul_per_s"]
            )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=19)
    ap.add_argument("--cols", type=int, default=64)
    ap.add_argument("--skip", default="",
                    help="comma list: hbm,mxu,ntt,hash")
    ap.add_argument("--hash-sizes", default="20,22",
                    help="log2 row counts for the hash rooflines")
    args = ap.parse_args()
    skip = set(args.skip.split(","))
    res = {"device": str(jax.devices()[0].device_kind)}
    if "hbm" not in skip:
        res.update(bench_hbm_stream(args.log_n, args.cols))
    if "mxu" not in skip:
        res.update(bench_mxu_i8())
        res.update(bench_mxu_bf16())
    if "ntt" not in skip:
        res.update(bench_ntt_steps(args.log_n, args.cols))
    if "hash" not in skip:
        ceil = bench_vpu_ceilings()
        res.update(ceil)
        res["hash"] = [
            bench_hash_roofline(hasher, int(lr), args.cols, ceil,
                                res.get("hbm_stream_GBps"))
            for hasher in ("keccak", "poseidon2")
            for lr in args.hash_sizes.split(",")
        ]
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
