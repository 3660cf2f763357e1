"""Milestone-1 end-to-end test: a synthetic two-chip machine with a global
bus lookup (sender + range table), proved and verified in-process.

This exercises the full pipeline of SURVEY.md §3.2-3.3 — trace commit,
LogUp permutation traces, quotient evaluation, FRI openings, OOD check,
cumulative-sum balance — without the VM layer.

The machine itself lives in valida_tpu/machine/examples.py (shared with
the driver dry-run).
"""

import pytest

from valida_tpu.core.config import test_config
from valida_tpu.machine import VerificationError
from valida_tpu.machine.examples import MiniMachine


def test_minimal_machine_prove_verify():
    pairs = [(1, 2), (3, 4), (15, 0), (7, 7), (2, 2)]
    m = MiniMachine(pairs)
    config = test_config()
    proof = m.prove(config)
    m.verify(config, proof)


def test_minimal_machine_detects_bus_imbalance():
    pairs = [(1, 2), (3, 4)]
    m = MiniMachine(pairs)
    # corrupt the receiver multiplicities -> debug check must catch it
    m.range.counts[1] += 1
    config = test_config()
    with pytest.raises(AssertionError):
        m.prove(config)


def test_minimal_machine_rejects_tampered_proof():
    pairs = [(1, 2), (3, 4)]
    m = MiniMachine(pairs)
    config = test_config()
    proof = m.prove(config)
    bad = proof
    cs = list(bad.chip_proofs[0].cumulative_sum)
    cs[0] = (cs[0] + 1) % 2013265921
    bad.chip_proofs[0].cumulative_sum = tuple(cs)
    with pytest.raises(VerificationError):
        m.verify(config, bad)


def test_ragged_machine_prove_verify():
    """RaggedMachine (4 chips, heights n/n8/16/1, preprocessed matrix)
    through the eager prover with debug checks on."""
    from valida_tpu.machine.examples import random_ragged_machine

    m = random_ragged_machine(32, seed=7)
    config = test_config()
    proof = m.prove(config)
    m.verify(config, proof)
    assert len(proof.chip_proofs) == 4
    heights = sorted(cp.log_degree for cp in proof.chip_proofs)
    assert heights == [0, 2, 4, 5]  # 1-row, 4 (32//8), 16, 32


def test_ragged_machine_detects_bus_imbalance():
    from valida_tpu.machine.examples import random_ragged_machine

    m = random_ragged_machine(32, seed=7)
    m.range.counts[m.onerow.value] -= 1  # drop the 1-row chip's receive
    config = test_config()
    with pytest.raises(AssertionError):
        m.prove(config)
