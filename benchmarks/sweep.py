"""BASELINE workload sweeps (BASELINE.md "Workload configs").

Runs on the default device.  Each config prints one JSON line; these are
supplementary to the repo-root bench.py headline.

  lde_merkle  — coset LDE (blowup 2) + full Merkle commit at 2^k rows,
                keccak vs poseidon2 hashers (BASELINE: "LDE+Merkle sweep
                2^22-2^24, Poseidon2 vs Keccak"; sizes here bounded by the
                single dev chip's transport)
  fib_prove   — end-to-end fib(25) BasicMachine prove wall-clock on the
                numpy host backend
  fib_prove_jax — same workload through the jitted device prover
                (warmup / first / steady-state split), the numerator of
                the BASELINE ">=2x CPU" ratio

usage: python benchmarks/sweep.py [lde_merkle|fib_prove|fib_prove_jax|all]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_lde_merkle(log_rows, cols, hasher, iters=3, split=False):
    import jax
    import jax.numpy as jnp
    from valida_tpu.field import babybear as bb
    from valida_tpu.poly import ntt as nttm
    from valida_tpu.poly.ntt import bitrev_indices
    from valida_tpu.crypto.merkle import get_hasher

    h = get_hasher(hasher)
    n = 1 << log_rows

    def lde_rows(mat):
        # out_bitrev: the commit hashes bitrev-ordered rows (as the PCS
        # does), and the dif path runs the fused pallas/MXU kernels with
        # a fraction of the dit stage-loop's HLO temps (the r3 2^22
        # poseidon2 OOM was the dit path's padded 5D stage copies)
        m = bb.to_monty(mat)
        lde_rev = nttm.coset_lde(m, 1, bb.GENERATOR, out_bitrev=True)
        return bb.from_monty(lde_rev)

    def tree_root(rows):
        d = h.hash_words(rows)
        while d.shape[0] > 1:
            d = h.hash_words(jnp.concatenate([d[0::2], d[1::2]], axis=1))
        return d[0]

    def commit(mat):
        return tree_root(lde_rows(mat))

    if split:
        # two dispatches: halves the single-program HLO-temp peak (the
        # fused commit OOMs at 2^22 x 64 on the 16 GB chip)
        lde_f = jax.jit(lde_rows)
        tree_f = jax.jit(tree_root)

        def f(mat):
            return tree_f(lde_f(mat))
    else:
        f = jax.jit(commit)

    # synthesize the trace ON DEVICE (a hash over iota, reduced mod p):
    # BASELINE's 2^22-2^24 sweep would otherwise be bounded by the dev
    # tunnel's ~15 MB/s host->device transport, not the chip
    @jax.jit
    def gen():
        i = jnp.arange(n * cols, dtype=jnp.uint32).reshape(n, cols)
        x = i * jnp.uint32(747796405) + jnp.uint32(2891336453)
        x = x ^ (x >> 16)
        return x % jnp.uint32(bb.P)

    x = gen()
    root = f(x)
    _ = np.asarray(root)
    t0 = time.perf_counter()
    for _i in range(iters):
        root = f(x)
    _ = np.asarray(root)
    dt = (time.perf_counter() - t0) / iters
    return {
        "metric": "lde_merkle_commit",
        "log_rows": log_rows,
        "cols": cols,
        "hasher": hasher,
        "value": n / dt,
        "unit": "rows/s",
        "seconds": dt,
        "split": split,
    }


def bench_lde_merkle_streamed(log_rows, cols, hasher, iters=2,
                              col_tile=None):
    """Same workload as bench_lde_merkle through the streamed per-coset
    commit (`commit/streamed.py`) — never materializes the full LDE, so
    the BASELINE 2^24 point fits one chip's HBM (VERDICT r3 #4)."""
    import jax
    import jax.numpy as jnp
    from valida_tpu.field import babybear as bb
    from valida_tpu.commit.streamed import lde_commit_streamed

    n = 1 << log_rows

    @jax.jit
    def gen():
        i = jnp.arange(n * cols, dtype=jnp.uint32).reshape(n, cols)
        x = i * jnp.uint32(747796405) + jnp.uint32(2891336453)
        x = x ^ (x >> 16)
        return bb.to_monty(x % jnp.uint32(bb.P))

    row_tile = int(os.environ.get("VALIDA_TPU_SWEEP_ROW_TILE", "0")) or None

    def once():
        # regenerate inside the timed region (deterministic, ~ms) so the
        # input buffer is droppable during the commit — at 2^24 holding
        # x across the call would cost 4 GB of the 16 GB HBM budget
        root, _ = lde_commit_streamed(gen(), 1, bb.GENERATOR, hasher,
                                      col_tile=col_tile, row_tile=row_tile)
        return root

    once()
    t0 = time.perf_counter()
    for _i in range(iters):
        root = once()
    dt = (time.perf_counter() - t0) / iters
    return {
        "metric": "lde_merkle_commit_streamed",
        "log_rows": log_rows,
        "cols": cols,
        "hasher": hasher,
        "value": n / dt,
        "unit": "rows/s",
        "seconds": dt,
        "col_tile": col_tile,
    }


def bench_fib_prove(backend_name="numpy"):
    """End-to-end fib(25) prove on the chosen backend ("numpy" = host
    eager prover; "jax" = jitted device prover, reporting first-call AND
    steady-state so the TPU/CPU ratio vs BASELINE's ">=2x single-host
    CPU" north star is adjudicated on like-for-like steady state).
    Reference analogue: the timed fib prove binary,
    `/root/reference/basic/src/bin/test_prover.rs:36-60`."""
    from valida_tpu import backend

    backend.set_backend(backend_name)
    from valida_tpu.core.advice import FixedAdviceProvider
    from valida_tpu.core.config import default_config
    from valida_tpu.core.program import ProgramROM
    from valida_tpu.machine.basic import BasicMachine
    from tests.test_basic_machine import fib_program

    m = BasicMachine()
    m.program().set_program_rom(ProgramROM(fib_program()))
    m.cpu().fp = 0x1000
    m.cpu().registers.append((m.cpu().pc, m.cpu().fp))
    m.run(advice=FixedAdviceProvider.empty())
    config = default_config(debug_checks=False)
    out = {
        "metric": "fib25_prove_wallclock",
        "backend": ("numpy-host" if backend_name == "numpy" else
                    "jax-device"),
        "queries": 40,
        "unit": "s",
    }
    if backend_name == "jax":
        from valida_tpu.machine.jit_prover import prove_jit, warmup_jit

        t0 = time.perf_counter()
        warmup_jit(m, config)
        out["warmup_s"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        proof = prove_jit(m, config)
        out["first_prove_s"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        proof = prove_jit(m, config)
        dt = time.perf_counter() - t0
    else:
        t0 = time.perf_counter()
        proof = m.prove(config)
        dt = time.perf_counter() - t0
    out["value"] = dt
    backend.set_backend("numpy")
    t0 = time.perf_counter()
    m.verify(config, proof)
    out["verify_s"] = time.perf_counter() - t0
    backend.set_backend(backend_name)
    from valida_tpu.tooling.serde import serialize_proof

    out["proof_bytes"] = len(serialize_proof(proof))
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    sizes = (
        tuple(int(s) for s in sys.argv[2].split(","))
        if len(sys.argv) > 2 else (16, 18, 20, 22)
    )
    out = []
    hashers = (sys.argv[3].split(",") if len(sys.argv) > 3
               else ["keccak", "poseidon2"])
    if which in ("lde_merkle", "all"):
        for log_rows in sizes:
            for hasher in hashers:
                try:
                    row = bench_lde_merkle(log_rows, 64, hasher)
                except Exception as e:
                    print(f"# fused OOM ({type(e).__name__}); retrying "
                          f"split pipeline", file=sys.stderr, flush=True)
                    row = bench_lde_merkle(log_rows, 64, hasher, split=True)
                out.append(row)
                print(json.dumps(out[-1]), flush=True)
    if which == "lde_merkle_streamed":
        tile = int(os.environ.get("VALIDA_TPU_SWEEP_COL_TILE", "0")) or None
        for log_rows in sizes:
            for hasher in hashers:
                out.append(bench_lde_merkle_streamed(log_rows, 64, hasher,
                                                     col_tile=tile))
                print(json.dumps(out[-1]), flush=True)
    if which in ("fib_prove", "all"):
        out.append(bench_fib_prove())
        print(json.dumps(out[-1]), flush=True)
    if which == "fib_prove_jax":
        out.append(bench_fib_prove("jax"))
        print(json.dumps(out[-1]), flush=True)


if __name__ == "__main__":
    main()
