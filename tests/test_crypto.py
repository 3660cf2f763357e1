"""Crypto layer tests: Poseidon host/device agreement, Keccak KATs,
Merkle build/verify, challenger determinism."""

import numpy as np
import jax.numpy as jnp

from valida_tpu.field import babybear as bb
from valida_tpu.crypto import poseidon, keccak, merkle
from valida_tpu.crypto.challenger import DuplexChallenger

RNG = np.random.default_rng(99)


def test_poseidon_host_device_agree():
    states = RNG.integers(0, bb.P, size=(4, 16), dtype=np.uint32)
    dev = bb.from_monty(
        poseidon.permute_device(bb.to_monty(jnp.asarray(states)))
    )
    for i in range(4):
        host = poseidon.permute_host(states[i])
        np.testing.assert_array_equal(np.asarray(dev[i]), host.astype(np.uint32))


def test_poseidon_diffusion():
    a = np.zeros(16, dtype=np.uint32)
    b = np.zeros(16, dtype=np.uint32)
    b[0] = 1
    pa = poseidon.permute_host(a)
    pb = poseidon.permute_host(b)
    assert not np.array_equal(pa, pb)
    assert np.all(pa < bb.P) and np.all(pb < bb.P)


def test_keccak_empty_vector():
    # Keccak-256("") known answer
    want_hex = "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    want = bytes.fromhex(want_hex)
    got = keccak.keccak256_words_host([])
    got_bytes = b"".join(int(w).to_bytes(4, "little") for w in got)
    assert got_bytes == want


def test_keccak_known_word_vector():
    # Keccak-256 of 4 bytes 0x00000000 (one zero u32 word) — computed with
    # an independent implementation (pycryptodome) offline:
    # keccak256(b"\x00\x00\x00\x00") =
    #   e8e77626586f73b955364c7b4bbf0bb7f7685ebd40e852b164633a4acbd3244c
    want = bytes.fromhex(
        "e8e77626586f73b955364c7b4bbf0bb7f7685ebd40e852b164633a4acbd3244c"
    )
    got = keccak.keccak256_words_host([0])
    got_bytes = b"".join(int(w).to_bytes(4, "little") for w in got)
    assert got_bytes == want


def test_keccak_device_host_agree():
    for n_words in [1, 8, 33, 34, 35, 70]:
        msgs = RNG.integers(0, 2**32, size=(3, n_words), dtype=np.uint32)
        dev = np.asarray(keccak.keccak256_words(jnp.asarray(msgs)))
        for i in range(3):
            host = keccak.keccak256_words_host(msgs[i])
            np.testing.assert_array_equal(dev[i], host)


def test_merkle_roundtrip():
    mats = [
        RNG.integers(0, bb.P, size=(8, 3), dtype=np.uint32),
        RNG.integers(0, bb.P, size=(2, 5), dtype=np.uint32),
        RNG.integers(0, bb.P, size=(8, 1), dtype=np.uint32),
        RNG.integers(0, bb.P, size=(4, 2), dtype=np.uint32),
    ]
    tree = merkle.MerkleTree(mats)
    dims = [(m.shape[0], m.shape[1]) for m in mats]
    for index in [0, 3, 7]:
        rows, path = tree.open(index)
        assert merkle.verify_opening(tree.root(), dims, index, rows, path)
        # tamper
        bad = [r.copy() for r in rows]
        bad[1] = bad[1] ^ 1
        assert not merkle.verify_opening(tree.root(), dims, index, bad, path)


def test_challenger_determinism_and_divergence():
    a, b = DuplexChallenger(), DuplexChallenger()
    for v in [1, 2, 3]:
        a.observe(v)
        b.observe(v)
    assert a.sample() == b.sample()
    a2, b2 = DuplexChallenger(), DuplexChallenger()
    a2.observe(1)
    b2.observe(2)
    assert a2.sample() != b2.sample()


def test_challenger_sample_ext_and_bits():
    c = DuplexChallenger()
    c.observe(42)
    e = c.sample_ext()
    assert len(e) == 5 and all(0 <= x < bb.P for x in e)
    bits = c.sample_bits(8)
    assert 0 <= bits < 256


def test_challenger_grind_check():
    c = DuplexChallenger()
    c.observe(7)
    v = c.clone()
    w = c.grind(6)
    assert v.check_witness(6, w)


def test_keccak_unrolled_round_function_matches():
    """The batch-in-lanes round function used by the pallas kernel
    (r3, VERDICT r2 #7) against the lane-axis keccak_f, as plain numpy —
    the kernel's only other logic is block plumbing, covered by the
    device test below.  (Interpret-mode execution of the ~7k-op kernel
    takes >30 min and is not worth a slow test.)"""
    rng = np.random.default_rng(3)
    batch = 64
    lo = rng.integers(0, 1 << 32, size=(batch, 25), dtype=np.uint32)
    hi = rng.integers(0, 1 << 32, size=(batch, 25), dtype=np.uint32)
    want_lo, want_hi = keccak.keccak_f(lo.copy(), hi.copy())
    lo_l = [lo[:, k] for k in range(25)]
    hi_l = [hi[:, k] for k in range(25)]
    got_lo, got_hi = keccak._keccak_f_unrolled(lo_l, hi_l)
    assert np.array_equal(np.stack(got_lo, axis=1), want_lo)
    assert np.array_equal(np.stack(got_hi, axis=1), want_hi)


def test_keccak_pallas_device_bit_identical():
    """Compiled-Mosaic pallas keccak vs the host path (device only)."""
    import jax
    import pytest

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("needs a TPU backend")
    rng = np.random.default_rng(4)
    x = rng.integers(0, 1 << 32, size=(4096, 64), dtype=np.uint32)
    want = np.asarray(keccak.keccak256_words(x))
    got = np.asarray(keccak._keccak_pallas(jnp.asarray(x)))
    assert np.array_equal(want, got)


def test_keccak_pallas_padding_and_dispatch(monkeypatch):
    """Batch padding (non-multiple of _PB) and the dispatch predicate."""
    monkeypatch.setattr(keccak, "_PB", 8)
    assert not keccak._pallas_batch_ok(8)  # CPU backend: no pallas
    monkeypatch.setenv("VALIDA_TPU_PALLAS_INTERPRET", "1")
    assert keccak._pallas_batch_ok(16)
    assert not keccak._pallas_batch_ok(15)
    monkeypatch.setenv("VALIDA_TPU_KECCAK_PALLAS", "0")
    assert not keccak._pallas_batch_ok(1 << 20)
