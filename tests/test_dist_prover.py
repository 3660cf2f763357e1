"""Distributed prover: prove_jit over a virtual-CPU device mesh.

The fast test proves on a 4-device mesh with 512 sender rows — big enough
that the main/perm/quotient commits take the explicit four-step
distributed NTT path (one all_to_all round per transform) — and verifies
with the independent host verifier.

The SLOW test (VALIDA_TPU_SLOW_TESTS=1) additionally proves the same
machine single-device and asserts the two proofs are BIT-IDENTICAL
(sharding must not change a single transcript byte).
"""

import os

import numpy as np
import pytest

import jax

from valida_tpu.core.config import test_config
from valida_tpu.machine.examples import random_mini_machine
from valida_tpu.machine.jit_prover import prove_jit, _dist_dif_applies
from valida_tpu.parallel.mesh import make_mesh
from valida_tpu.tooling.serde import serialize_proof

SLOW = os.environ.get("VALIDA_TPU_SLOW_TESTS", "0") == "1"


def test_dist_prove_verifies():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    mesh = make_mesh(4, dp=1)
    m = random_mini_machine(512, seed=3)
    config = test_config(debug_checks=False)
    assert _dist_dif_applies(9, mesh, "sp")  # the dist NTT path engages
    p_dist = prove_jit(m, config, mesh=mesh)
    m.verify(config, p_dist)


@pytest.mark.skipif(not SLOW, reason="set VALIDA_TPU_SLOW_TESTS=1")
def test_dist_prove_bit_identical_8_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(8, dp=1)
    m = random_mini_machine(1024, seed=3)
    config = test_config(debug_checks=False)
    assert _dist_dif_applies(10, mesh, "sp")
    p_dist = prove_jit(m, config, mesh=mesh)
    m.verify(config, p_dist)

    m2 = random_mini_machine(1024, seed=3)
    p_single = prove_jit(m2, config)
    assert serialize_proof(p_dist) == serialize_proof(p_single)


def test_dist_prove_ragged_bit_identical():
    """Default-suite multi-chip byte-identity on a machine with 4
    heterogeneous chips (heights 512/64/16/1, a preprocessed matrix, a
    1-row trace) — the cheap stand-in for the full-BasicMachine slow test
    (VERDICT r3 #8)."""
    from valida_tpu.machine.examples import random_ragged_machine

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    mesh = make_mesh(4, dp=1)
    config = test_config(debug_checks=False)

    m = random_ragged_machine(512, seed=5)
    assert _dist_dif_applies(9, mesh, "sp")
    p_dist = prove_jit(m, config, mesh=mesh)
    m.verify(config, p_dist)

    m2 = random_ragged_machine(512, seed=5)
    p_single = prove_jit(m2, config)
    assert serialize_proof(p_dist) == serialize_proof(p_single)


def _run_fib_machine():
    from valida_tpu.core.advice import FixedAdviceProvider
    from valida_tpu.core.program import ProgramROM
    from valida_tpu.machine.basic import BasicMachine
    from tests.test_basic_machine import fib_program

    m = BasicMachine()
    m.program().set_program_rom(ProgramROM(fib_program()))
    m.cpu().fp = 0x1000
    m.cpu().registers.append((m.cpu().pc, m.cpu().fp))
    m.run(advice=FixedAdviceProvider.empty())
    return m


@pytest.mark.skipif(not SLOW, reason="set VALIDA_TPU_SLOW_TESTS=1")
def test_dist_prove_full_basic_machine_bit_identical():
    """VERDICT r2 #4: the FULL 14-chip BasicMachine (heterogeneous trace
    heights, preprocessed matrices, a 1-row static-data trace, 16 buses)
    proved under a mesh, byte-identical to the single-device proof."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    mesh = make_mesh(4, dp=1)
    config = test_config(debug_checks=False)

    m = _run_fib_machine()
    p_dist = prove_jit(m, config, mesh=mesh)
    m.verify(config, p_dist)

    m2 = _run_fib_machine()
    p_single = prove_jit(m2, config)
    assert serialize_proof(p_dist) == serialize_proof(p_single)
