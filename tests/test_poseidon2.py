"""Poseidon2 hasher: permutation sanity + full machine proof with the
poseidon2 MMCS."""

import os

import numpy as np
import pytest

from valida_tpu.field import babybear as bb
from valida_tpu.crypto import poseidon2 as p2
from valida_tpu.crypto.merkle import MerkleTree, verify_opening
from valida_tpu.core.config import default_config


def test_poseidon2_permutation_sanity():
    a = np.zeros((1, 16), dtype=np.uint32)
    b = np.zeros((1, 16), dtype=np.uint32)
    b[0, 0] = 1
    am = bb.to_monty(a)
    bm = bb.to_monty(b)
    pa = np.asarray(bb.from_monty(p2.permute(am)))
    pb = np.asarray(bb.from_monty(p2.permute(bm)))
    assert not np.array_equal(pa, pb)
    assert np.all(pa < bb.P) and np.all(pb < bb.P)
    # deterministic
    pa2 = np.asarray(bb.from_monty(p2.permute(bb.to_monty(a))))
    np.testing.assert_array_equal(pa, pa2)


def test_poseidon2_hash_batch_matches_host():
    rng = np.random.default_rng(5)
    msgs = rng.integers(0, bb.P, size=(4, 20), dtype=np.uint32)
    batch = np.asarray(p2.hash_words(msgs))
    for i in range(4):
        host = np.asarray(p2.hash_words_host(msgs[i]))
        np.testing.assert_array_equal(batch[i], host)


def test_merkle_poseidon2_roundtrip():
    rng = np.random.default_rng(6)
    mats = [
        rng.integers(0, bb.P, size=(8, 3), dtype=np.uint32),
        rng.integers(0, bb.P, size=(4, 2), dtype=np.uint32),
    ]
    tree = MerkleTree(mats, hasher="poseidon2")
    dims = [(m.shape[0], m.shape[1]) for m in mats]
    for idx in [0, 5]:
        rows, path = tree.open(idx)
        assert verify_opening(tree.root(), dims, idx, rows, path,
                              hasher="poseidon2")
        assert not verify_opening(tree.root(), dims, idx, rows, path,
                                  hasher="keccak")


def test_prove_with_poseidon2_mmcs():
    from valida_tpu.machine.examples import MiniMachine

    m = MiniMachine([(1, 2), (3, 4), (7, 7)])
    config = default_config(num_queries=4, proof_of_work_bits=2,
                            hasher="poseidon2")
    proof = m.prove(config)
    m.verify(config, proof)


@pytest.mark.skipif(
    os.environ.get("VALIDA_TPU_SLOW_TESTS", "0") != "1",
    reason="interpret-mode eval of the unrolled lane-list kernel is "
           "minutes-slow; set VALIDA_TPU_SLOW_TESTS=1 (device parity is "
           "covered by test_poseidon2_pallas_device_bit_identical)")
def test_poseidon2_pallas_interpret_bit_identical(monkeypatch):
    """Pallas kernel (interpret mode) vs the XLA sponge, incl. a narrow
    final chunk and batch padding to a non-multiple of _PB."""
    import jax.numpy as jnp

    monkeypatch.setattr(p2, "_PB", 16)
    monkeypatch.setenv("VALIDA_TPU_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(7)
    # the fully-unrolled lane-list kernel is slow under interpret-mode
    # eager evaluation — keep the shapes minimal (narrow final chunk +
    # batch padding to a non-multiple of _PB are still both covered)
    for w in (16, 12):
        x = rng.integers(0, 1 << 32, size=(18, w), dtype=np.uint32)
        want = np.asarray(p2.hash_words(x))
        got = np.asarray(p2._poseidon2_pallas(jnp.asarray(x)))
        np.testing.assert_array_equal(want, got)


def test_poseidon2_pallas_device_bit_identical():
    """Compiled-Mosaic pallas poseidon2 vs the XLA path (device only)."""
    import jax
    import jax.numpy as jnp
    import pytest

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("needs a TPU backend")
    rng = np.random.default_rng(8)
    x = rng.integers(0, 1 << 32, size=(4096, 64), dtype=np.uint32)
    want = np.asarray(p2.hash_words(x))
    got = np.asarray(p2._poseidon2_pallas(jnp.asarray(x)))
    np.testing.assert_array_equal(want, got)


def test_poseidon2_pallas_dispatch(monkeypatch):
    monkeypatch.setattr(p2, "_PB", 8)
    # batch >= floor but backend is CPU (no interpret): gate must refuse —
    # 16 passes the 2*_PB size floor, so this isolates the backend check
    assert not p2._pallas_batch_ok(16)
    monkeypatch.setenv("VALIDA_TPU_PALLAS_INTERPRET", "1")
    assert p2._pallas_batch_ok(16)
    assert not p2._pallas_batch_ok(15)
    # the env floor works in BOTH directions (advice r3): lowering it
    # admits smaller batches, raising it refuses larger ones
    monkeypatch.setenv("VALIDA_TPU_P2_PALLAS_MIN", "4")
    assert p2._pallas_batch_ok(8)
    monkeypatch.setenv("VALIDA_TPU_P2_PALLAS_MIN", "1024")
    assert not p2._pallas_batch_ok(512)
    monkeypatch.delenv("VALIDA_TPU_P2_PALLAS_MIN")
    monkeypatch.setenv("VALIDA_TPU_P2_PALLAS", "0")
    assert not p2._pallas_batch_ok(1 << 20)
