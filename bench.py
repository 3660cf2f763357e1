"""Headline benchmark: BabyBear NTT butterflies/sec on one chip.

Runs the jitted NTT (the prover's dominant kernel: LDE / quotient / FRI
all ride on it) on the default platform (TPU when present), and compares
against the single-host numpy backend as the CPU baseline — mirroring
BASELINE.md's "field kernel throughput; NTT butterflies/sec/chip is the
headline metric".

Config: 2^19 rows x 128 columns (lane width a multiple of 128 routes
through the one-pallas-call megakernel, mxu_ntt._mega_pallas — the
batched-column layout the prover's LDE stage feeds).  The roofline
fields give the number its denominator (VERDICT r2 #2): the transform
is 3 fused passes over the matrix, so bytes_moved = 3 * 2 * nbytes; the
achieved fraction is measured against the device's own streamed-copy
bandwidth (an XLA `a + 1` pass over the same matrix), which on this
virtualized tunnel chip is far below the v5e spec sheet and is the
honest binding resource.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

LOG_N = 19
COLS = 128


def _time_chained(f, x, iters, rounds):
    """Best-of-`rounds` chained-iteration timing (the device is
    multi-tenant; the best round is the least-contended one).  Chained on
    a data dependency + scalar fetch: `block_until_ready` alone
    under-reports through the tunnel."""
    y = f(x)
    _ = np.asarray(y[0])  # compile + full sync through any transport
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        y = x
        for _ in range(iters):
            y = f(y)
        _ = np.asarray(y[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def bench_ntt_jax(log_n=LOG_N, cols=COLS, iters=8, rounds=3):
    import jax
    import jax.numpy as jnp
    from valida_tpu.poly import ntt as nttm

    n = 1 << log_n
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 2013265921, size=(n, cols), dtype=np.uint32))
    best = _time_chained(jax.jit(nttm.dif), x, iters, rounds)
    stream = _time_chained(
        jax.jit(lambda a: a + np.uint32(1)), x, iters, rounds
    )
    nbytes = n * cols * 4
    n_passes = max(1, (log_n + 6) // 7)  # radix-<=128 steps, fused per pass
    butterflies = (n // 2) * log_n * cols
    return {
        "tput": butterflies / best,
        "seconds": best,
        "bytes_moved": n_passes * 2 * nbytes,
        "effective_GBps": n_passes * 2 * nbytes / 1e9 / best,
        "stream_GBps": 2 * nbytes / 1e9 / stream,
        "roofline_frac": (n_passes * 2 * nbytes / best) / (2 * nbytes / stream),
        "mxu_MACs": 2048 * n * cols * n_passes,
        "device": str(jax.devices()[0].device_kind),
    }


def bench_ntt_numpy(log_n=18, cols=64, iters=3, rounds=2):
    from valida_tpu.poly import ntt as nttm

    n = 1 << log_n
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2013265921, size=(n, cols), dtype=np.uint32)
    nttm.dif(x)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            nttm.dif(x)
        best = min(best, (time.perf_counter() - t0) / iters)
    butterflies = (n // 2) * log_n * cols
    return butterflies / best


def main():
    dev = bench_ntt_jax()
    tput_np = bench_ntt_numpy()
    print(
        json.dumps(
            {
                "metric": "babybear_ntt_butterflies_per_sec",
                "value": dev["tput"],
                "unit": "butterflies/s",
                "vs_baseline": dev["tput"] / tput_np,
                "roofline": {
                    "effective_GBps": round(dev["effective_GBps"], 1),
                    "measured_stream_GBps": round(dev["stream_GBps"], 1),
                    "fraction_of_stream_roofline": round(
                        dev["roofline_frac"], 3
                    ),
                    "device": dev["device"],
                },
            }
        )
    )


if __name__ == "__main__":
    main()
