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
