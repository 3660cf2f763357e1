"""Large-trace workload: full u32-ALU ISA loop at a target cycle count
(BASELINE config: "alu_u32 full ISA trace ... 2^20 rows").

Generates the trace with the C++ interpreter, proves on the selected
backend, verifies, and prints one JSON line.

usage: python benchmarks/big_trace.py [log2_cycles] [numpy|jax] [queries]
       [log_final]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from valida_tpu.core import opcodes as OC
from valida_tpu.core.config import default_config
from valida_tpu.core.program import ProgramROM, InstructionWord, Operands
from valida_tpu.machine.basic import BasicMachine


def iw(opcode, a=0, b=0, c=0, d=0, e=0):
    return InstructionWord(opcode, Operands((a, b, c, d, e)))


def alu_loop_program(n_iters: int):
    """~13 cycles per iteration across the whole ALU family."""
    loop_start = 3 * 24
    return [
        iw(OC.IMM32, -4, 0, 0, 0, 0),      # counter
        iw(OC.IMM32, -8, 0, 0, 0, 3),
        iw(OC.IMM32, -12, 0, 1, 0, 1),     # 65537
        # loop:
        iw(OC.ADD32, -4, -4, 1, 0, 1),
        iw(OC.MUL32, -16, -4, -12, 0, 0),
        iw(OC.XOR32, -20, -16, -4, 0, 0),
        iw(OC.AND32, -24, -16, -12, 0, 0),
        iw(OC.OR32, -28, -20, -24, 0, 0),
        iw(OC.SUB32, -32, -16, -4, 0, 0),
        iw(OC.DIV32, -36, -16, -8, 0, 0),
        iw(OC.SHL32, -40, -4, 3, 0, 1),
        iw(OC.SHR32, -44, -16, 2, 0, 1),
        iw(OC.LT32, -48, -4, n_iters, 0, 1),
        iw(OC.EQ32, -52, -4, -8, 0, 0),
        iw(OC.SLE32, -56, -32, -16, 0, 0),
        iw(OC.BNE, loop_start, -48, 0, 0, 1),
        iw(OC.STOP),
    ]


def main():
    log2_cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    backend_name = sys.argv[2] if len(sys.argv) > 2 else "numpy"
    queries = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    log_final = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    n_iters = (1 << log2_cycles) // 14
    m = BasicMachine()
    m.program().set_program_rom(ProgramROM(alu_loop_program(n_iters)))
    m.cpu().fp = 0x1000000
    m.cpu().registers.append((m.cpu().pc, m.cpu().fp))

    t0 = time.perf_counter()
    m.run_native(build_lists=False)
    t_run = time.perf_counter() - t0

    from valida_tpu import backend

    backend.set_backend(backend_name)
    config = default_config(num_queries=queries, debug_checks=False,
                            log_final=log_final)

    t_warmup = 0.0
    if backend_name == "jax":
        from valida_tpu.machine.jit_prover import prove_jit, warmup_jit

        if os.environ.get("VALIDA_TPU_BENCH_WARMUP", "1") != "0":
            t0 = time.perf_counter()
            n_stages = warmup_jit(m, config)
            t_warmup = time.perf_counter() - t0
            print(f"[warmup] {n_stages} stages compiled in {t_warmup:.1f}s",
                  file=sys.stderr)

    first_breakdown = None
    t0 = time.perf_counter()
    if backend_name == "jax":
        from valida_tpu.utils import (start_stage_collection,
                                      stop_stage_collection)

        start_stage_collection()
        proof = prove_jit(m, config)
        first_breakdown = stop_stage_collection()
    else:
        proof = m.prove(config)
    t_prove = time.perf_counter() - t0
    if first_breakdown is not None:
        first_breakdown["(unattributed)"] = {
            "s": round(t_prove - sum(v["s"] for v in
                                     first_breakdown.values()), 4),
            "n": 1,
        }

    # steady-state wall-clock: a second prove in-process hits every
    # in-memory jit cache — first-call tracing/compiles (one-time per
    # source version, amortized by the persistent caches) excluded
    t_prove2 = None
    stage_breakdown = None
    if backend_name == "jax" and os.environ.get(
            "VALIDA_TPU_BENCH_REPEAT", "1") != "0":
        # per-stage wall-clock split of the steady-state prove (VERDICT r3
        # #3); stage boundaries sync on challenger root fetches, so host
        # wall-clock per stage is honest
        from valida_tpu.utils import (start_stage_collection,
                                      stop_stage_collection)

        start_stage_collection()
        t0 = time.perf_counter()
        proof2 = prove_jit(m, config)
        t_prove2 = time.perf_counter() - t0
        stage_breakdown = stop_stage_collection()
        stage_breakdown["(unattributed)"] = {
            "s": round(t_prove2 - sum(v["s"] for v in
                                      stage_breakdown.values()), 4),
            "n": 1,
        }
        del proof2

    backend.set_backend("numpy")
    t0 = time.perf_counter()
    m.verify(config, proof)
    t_verify = time.perf_counter() - t0

    from valida_tpu.tooling.serde import serialize_proof

    out = {
        "metric": "alu_isa_trace_prove",
        "cycles": m.cpu().clock,
        "backend": backend_name,
        "queries": queries,
        "log_final": log_final,
        "run_s": t_run,
        "warmup_s": t_warmup,
        "value": t_prove2 if t_prove2 is not None else t_prove,
        "unit": "s",
        "first_prove_s": t_prove,
        "verify_s": t_verify,
        "cycles_per_s": m.cpu().clock / (
            t_prove2 if t_prove2 is not None else t_prove),
        "proof_bytes": len(serialize_proof(proof)),
    }
    if backend_name == "jax":
        # VERDICT r2 #8: host->device transfer accounting — the op-log
        # materialization ships compact op logs instead of full traces
        from valida_tpu.machine.jit_prover import transfer_stats

        out["transfer_bytes"] = transfer_stats["bytes"]
        out["transfer_full_trace_bytes"] = transfer_stats["trace_bytes"]
        if stage_breakdown is not None:
            out["stage_breakdown_s"] = stage_breakdown
        if first_breakdown is not None:
            out["first_stage_breakdown_s"] = first_breakdown
        # what a host-built prover would have shipped: every padded main
        # trace at 4 B/cell
        out["main_trace_bytes"] = sum(
            (1 << cp.log_degree) * chip.width() * 4
            for chip, cp in zip(m.chips(), proof.chip_proofs)
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
