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


def test_perm_stage_not_poisoned_by_prep_content(tmp_path, monkeypatch):
    """Regression: the perm stage used to bake chip.preprocessed_trace()
    CONTENT into the compiled stage while its cache key carried only
    shapes — proving a second machine with identical shapes but different
    preprocessed values (e.g. a different program ROM of the same length)
    silently reused the first machine's constants, and its proof failed
    verification (observed: 2^17 alu-loop OOD failure on the program
    chip after a 2^13 run).  Preprocessed traces are traced arguments
    now; both proofs must verify."""
    from valida_tpu.air.types import VPCol, Interaction
    from valida_tpu.chips import Chip
    from valida_tpu.machine.examples import RANGE_BUS, MAX, SenderChip
    from valida_tpu.machine.machine import Machine

    monkeypatch.setenv("VALIDA_TPU_STAGE_CACHE", str(tmp_path))

    class VarRangeChip(Chip):
        """Range table whose PREPROCESSED column carries the values in a
        machine-specific order — bus fields read the prep column, so a
        stale baked prep breaks the LogUp balance."""

        name = "vrange"

        def __init__(self, order):
            self.order = list(order)
            self.counts = {}

        def width(self):
            return 1

        def generate_trace(self, machine):
            rows = np.zeros((MAX, 1), dtype=np.uint32)
            for v, c in self.counts.items():
                rows[self.order.index(v), 0] = c
            return rows

        def preprocessed_trace(self):
            return np.array(self.order, dtype=np.uint32).reshape(MAX, 1)

        def global_receives(self, machine):
            return [Interaction(fields=[VPCol.single_prep(0)],
                                count=VPCol.single_main(0),
                                bus=machine.range_bus())]

        def eval(self, b):
            pass

    class VarMachine(Machine):
        def __init__(self, pairs, order):
            self.sender = SenderChip(pairs)
            self.vrange = VarRangeChip(order)
            for a, b in pairs:
                for v in (a, b):
                    self.vrange.counts[v] = self.vrange.counts.get(v, 0) + 1

        def chips(self):
            return [self.sender, self.vrange]

        def range_bus(self):
            return RANGE_BUS

    pairs = [(1, 2), (3, 4), (15, 0), (7, 7)] * 4
    config = test_config(debug_checks=False)
    m1 = VarMachine(pairs, list(range(MAX)))
    p1 = prove_jit(m1, config)
    m1.verify(config, p1)
    m2 = VarMachine(pairs, list(reversed(range(MAX))))
    p2 = prove_jit(m2, config)
    m2.verify(config, p2)


def test_pow2_chunk_resolution(monkeypatch):
    """Chunk env values resolve to powers of two (ADVICE r4: non-power
    values used to fail with an opaque reshape error) and 0 disables."""
    from valida_tpu.machine.jit_prover import _pow2_chunk

    monkeypatch.delenv("VALIDA_TPU_TEST_CHUNK", raising=False)
    assert _pow2_chunk("VALIDA_TPU_TEST_CHUNK", 1 << 16) == 1 << 16
    for env, want in [("8", 8), ("9", 8), ("100", 64), ("0", 0),
                      ("-5", 0), ("65536", 65536), ("65537", 65536)]:
        monkeypatch.setenv("VALIDA_TPU_TEST_CHUNK", env)
        assert _pow2_chunk("VALIDA_TPU_TEST_CHUNK", 1 << 16) == want


def test_bufsim_matches_challenger_buffers():
    """The warmup transcript-shape simulator tracks the real challenger's
    input/output buffer lengths under random observe/sample sequences."""
    from valida_tpu.crypto.challenger import DuplexChallenger
    from valida_tpu.machine.jit_prover import _BufSim

    rng = np.random.default_rng(3)
    host = DuplexChallenger()
    sim = _BufSim()
    for _ in range(500):
        if rng.integers(0, 2) == 0:
            n = int(rng.integers(1, 20))
            for v in rng.integers(0, 1 << 31, size=n, dtype=np.uint32):
                host.observe(int(v) % bb_P)
            sim.observe(n)
        else:
            n = int(rng.integers(1, 8))
            for _ in range(n):
                host.sample()
            sim.sample(n)
        assert len(host.input_buffer) == sim.k
        assert len(host.output_buffer) == sim.out


bb_P = 2013265921


def test_ladder_challenge_stage_matches_host():
    """The device duplex absorb+sample stage (FRI-ladder Fiat-Shamir,
    VERDICT r4 #2) is bit-identical to the host DuplexChallenger for
    every possible entry input-buffer length k0 (the mid-observe duplex
    at k0 >= 8 and the no-second-duplex case at k0 == 8 included)."""
    import jax.numpy as jnp

    from valida_tpu.crypto.challenger import DuplexChallenger
    from valida_tpu.field import babybear as bb
    from valida_tpu.machine.jit_prover import _ladder_challenge_stage

    rng = np.random.default_rng(7)
    for k0 in range(16):
        host = DuplexChallenger()
        # 16 observes duplex once; k0 more leave exactly k0 pending
        for v in rng.integers(0, bb.P, size=16 + k0, dtype=np.uint32):
            host.observe(int(v))
        assert len(host.input_buffer) == k0
        st = jnp.asarray(np.array(host.state, dtype=np.uint32))
        pending = jnp.asarray(np.array(host.input_buffer, dtype=np.uint32))
        root = rng.integers(0, 2**32 - 1, size=8, dtype=np.uint32)
        chal = _ladder_challenge_stage(k0)
        if k0:
            st2, beta_m = chal(st, pending, jnp.asarray(root))
        else:
            st2, beta_m = chal(st, jnp.asarray(root))
        host.observe_digest(root)
        beta_host = host.sample_ext()
        beta_dev = tuple(int(x) for x in np.asarray(bb.from_monty(beta_m)))
        assert beta_dev == beta_host, f"beta mismatch at k0={k0}"
        np.testing.assert_array_equal(
            np.asarray(st2), np.array(host.state, dtype=np.uint32)
        )


def test_ladder_entry_k0_matches_runtime():
    """warmup's transcript-shape simulation of the ladder's entry buffer
    length agrees with the real prove (a mismatch is only a spurious
    runtime compile, but keep the simulator honest)."""
    from valida_tpu.machine import jit_prover as jp

    recorded = []
    orig = jp._ladder_challenge_stage

    def spy(k0, exported=True, ctx=None):
        recorded.append(k0)
        return orig(k0, exported, ctx)

    m = MiniMachine([(1, 2), (3, 4), (15, 0), (7, 7)])
    config = test_config(debug_checks=False)
    jp_orig = jp._ladder_challenge_stage
    jp._ladder_challenge_stage = spy
    try:
        proof = prove_jit(m, config)
    finally:
        jp._ladder_challenge_stage = jp_orig
    m.verify(config, proof)
    assert recorded, "device challenger did not run"
    # simulate what warmup would compute for this machine's shapes
    from valida_tpu.air.quotient import get_log_quotient_degree
    from valida_tpu.commit import fri as frim

    chips = m.chips()
    pcs = config.pcs
    log_blowup = pcs.log_blowup
    qds = [get_log_quotient_degree(m, c) for c in chips]
    main_shapes = [tuple(int(x) for x in np.asarray(
        c.generate_trace(m)).shape) for c in chips]
    log_degrees = [h.bit_length() - 1 for (h, _w) in main_shapes]
    prep_shapes = {}
    for ci, c in enumerate(chips):
        p = c.preprocessed_trace()
        if p is not None:
            prep_shapes[ci] = tuple(int(x) for x in np.asarray(p).shape)
    perm_shapes = [(1 << ld, (len(c.all_interactions(m)) + 1) * 5)
                   for c, ld in zip(chips, log_degrees)]
    quot_shapes = [(1 << ld, (1 << qd) * 5)
                   for ld, qd in zip(log_degrees, qds)]
    all_mats = []
    for ci in sorted(prep_shapes):
        all_mats.append((prep_shapes[ci], ("pair", log_degrees[ci])))
    for ci in range(len(chips)):
        all_mats.append((main_shapes[ci], ("pair", log_degrees[ci])))
    for ci in range(len(chips)):
        all_mats.append((perm_shapes[ci], ("pair", log_degrees[ci])))
    for ci in range(len(chips)):
        all_mats.append((quot_shapes[ci], ("pow", qds[ci])))
    threshold = frim.direct_open_threshold(config.pcs.config)
    log_max_all = max(h.bit_length() - 1 + log_blowup
                      for (h, _w), _k in all_mats)
    direct_set = {
        mi for mi, ((h, _w), _k) in enumerate(all_mats)
        if frim.is_direct_mat(h.bit_length() - 1 + log_blowup,
                              log_max_all, threshold)
    }
    assert recorded[0] == jp._ladder_entry_k0(all_mats, direct_set)
    assert all(k == 0 for k in recorded[1:])


def test_quotient_chunked_bit_identical(monkeypatch):
    """Row-chunked quotient evaluation (lax.map tiles, used for large
    domains where the one-shot fused graph exceeds HBM at compile time)
    produces a bit-identical proof to the one-shot path."""
    from valida_tpu.machine import jit_prover as jp
    from valida_tpu.tooling.serde import serialize_proof

    config = test_config(debug_checks=False)
    monkeypatch.setenv("VALIDA_TPU_QUOTIENT_CHUNK", "8")
    monkeypatch.setenv("VALIDA_TPU_REDUCED_CHUNK", "8")
    jp._QUOTIENT_STAGE_CACHE.clear()
    jp._reduced_stage.cache_clear()
    m1 = MiniMachine([(i % 16, (i + 1) % 16) for i in range(48)])
    p1 = prove_jit(m1, config)
    m1.verify(config, p1)
    monkeypatch.setenv("VALIDA_TPU_QUOTIENT_CHUNK", "0")
    monkeypatch.setenv("VALIDA_TPU_REDUCED_CHUNK", "0")
    jp._QUOTIENT_STAGE_CACHE.clear()
    jp._reduced_stage.cache_clear()
    m2 = MiniMachine([(i % 16, (i + 1) % 16) for i in range(48)])
    p2 = prove_jit(m2, config)
    m2.verify(config, p2)
    jp._QUOTIENT_STAGE_CACHE.clear()
    assert serialize_proof(p1) == serialize_proof(p2)


def test_perm_chunked_bit_identical(monkeypatch):
    """Row-chunked permutation stage (lax.scan tiles with the phi prefix
    sum carried across tiles; used where the whole-domain RLC graph
    exceeds HBM at compile time, observed at the 2^20-cycle flagship)
    produces a bit-identical proof to the one-shot path.  Uses the
    ragged machine so a PREPROCESSED chip rides the chunked path too."""
    from valida_tpu.machine import jit_prover as jp
    from valida_tpu.machine.examples import random_ragged_machine
    from valida_tpu.tooling.serde import serialize_proof

    config = test_config(debug_checks=False)
    monkeypatch.setenv("VALIDA_TPU_PERM_CHUNK", "16")
    jp._PERM_STAGE_CACHE.clear()
    m1 = random_ragged_machine(64, seed=3)
    p1 = prove_jit(m1, config)
    m1.verify(config, p1)
    monkeypatch.setenv("VALIDA_TPU_PERM_CHUNK", "0")
    jp._PERM_STAGE_CACHE.clear()
    m2 = random_ragged_machine(64, seed=3)
    p2 = prove_jit(m2, config)
    m2.verify(config, p2)
    jp._PERM_STAGE_CACHE.clear()
    assert serialize_proof(p1) == serialize_proof(p2)
