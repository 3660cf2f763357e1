"""Jitted device prover tests.

The fast test uses the 2-chip MiniMachine (small stage compiles).  The
full 14-chip BasicMachine validation compiles for many minutes on CPU XLA
and is gated behind VALIDA_TPU_SLOW_TESTS=1 (its stages land in the
persistent compilation cache, so reruns are quick).
"""

import os

import numpy as np
import pytest

from valida_tpu.core.advice import FixedAdviceProvider
from valida_tpu.core.config import test_config
from valida_tpu.core.program import ProgramROM
from valida_tpu.machine.basic import BasicMachine
from valida_tpu.machine.jit_prover import prove_jit

from valida_tpu.machine.examples import MiniMachine
from tests.test_basic_machine import fib_program

SLOW = os.environ.get("VALIDA_TPU_SLOW_TESTS", "0") == "1"


def test_jit_prover_mini_machine():
    m = MiniMachine([(1, 2), (3, 4), (15, 0), (7, 7)])
    config = test_config(debug_checks=False)
    p_jit = prove_jit(m, config)
    m.verify(config, p_jit)
    p_eager = m.prove(config)
    np.testing.assert_array_equal(
        p_jit.commitments.main_trace, p_eager.commitments.main_trace
    )
    np.testing.assert_array_equal(
        p_jit.commitments.perm_trace, p_eager.commitments.perm_trace
    )
    np.testing.assert_array_equal(
        p_jit.commitments.quotient_chunks, p_eager.commitments.quotient_chunks
    )
    assert (
        p_jit.opening_proof.fri.final_poly
        == p_eager.opening_proof.fri.final_poly
    )
    for cj, ce in zip(p_jit.chip_proofs, p_eager.chip_proofs):
        assert cj.cumulative_sum == ce.cumulative_sum
        assert cj.opened_values.trace_local == ce.opened_values.trace_local


def test_warmup_covers_prover_stages(tmp_path, monkeypatch):
    """warmup_jit enumerates valid stage signatures (dry = abstract eval,
    no compiles) and the exported-stage cache round-trips: a prove after
    warmup reuses the same stage objects and still verifies."""
    from valida_tpu.machine.jit_prover import warmup_jit

    monkeypatch.setenv("VALIDA_TPU_STAGE_CACHE", str(tmp_path))
    # 8 pairs -> trace height 8: distinct stage shapes from the other
    # tests, so the factories (lru-cached in-process) are built fresh and
    # write blobs into this tmp cache dir
    m = MiniMachine([(i, i + 1) for i in range(0, 15, 2)])
    config = test_config(debug_checks=False)
    n = warmup_jit(m, config, dry=True)
    assert n > 0
    # exported blobs were written for at least the quotient/perm stages
    assert any(tmp_path.iterdir())
    proof = prove_jit(m, config)
    m.verify(config, proof)


@pytest.mark.skipif(not SLOW, reason="set VALIDA_TPU_SLOW_TESTS=1")
def test_jit_prover_fib_verifies():
    m = BasicMachine()
    m.program().set_program_rom(ProgramROM(fib_program()))
    m.cpu().fp = 0x1000
    m.cpu().registers.append((m.cpu().pc, m.cpu().fp))
    m.run(advice=FixedAdviceProvider.empty())
    config = test_config(debug_checks=False)
    proof = prove_jit(m, config)
    m.verify(config, proof)


def test_exported_stage_concurrent_same_key(tmp_path, monkeypatch):
    """Regression (VERDICT r3 weak #1): two threads exporting the SAME
    missing stage key used to share one pid-derived tmp path; the loser's
    os.replace raised FileNotFoundError out of prove_jit.  Cache writes
    must never fail a prove."""
    import concurrent.futures as cf

    import jax.numpy as jnp

    from valida_tpu.machine import jit_prover as jp

    monkeypatch.setenv("VALIDA_TPU_STAGE_CACHE", str(tmp_path))

    def stage(x):
        return x + jnp.uint32(1)

    args = (jp._sds(4),)

    def build_and_run(_):
        fn = jp._exported_stage("race-test:same-key", stage, args)
        out = fn(jnp.arange(4, dtype=jnp.uint32))
        return np.asarray(out)

    with cf.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(build_and_run, range(8)))
    for r in results:
        np.testing.assert_array_equal(r, np.arange(1, 5, dtype=np.uint32))
    # exactly one published blob for the key, no leftover tmp files
    leftovers = [p for p in tmp_path.iterdir() if ".tmp." in p.name]
    assert leftovers == []
