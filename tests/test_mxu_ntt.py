"""MXU matmul-NTT (poly/mxu_ntt.py) bit-exactness against the stage-loop
transform, on the CPU jax backend via the plain-XLA fallback pipeline
(the Pallas kernels compute the same values on TPU; verified on
hardware).  Covers every radix-schedule shape: single tail step, small
leading radix, and multi-step recursion."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from valida_tpu.field import babybear as bb
from valida_tpu.poly import ntt as nttm
from valida_tpu.poly import mxu_ntt


@pytest.mark.parametrize("log_n,cols", [(7, 4), (8, 3), (10, 5), (14, 4), (15, 2)])
@pytest.mark.parametrize("inverse", [False, True])
def test_mxu_dif_matches_stage_loop(log_n, cols, inverse):
    rng = np.random.default_rng(11)
    x = rng.integers(0, bb.P, size=(1 << log_n, cols), dtype=np.uint32)
    ref = nttm.dif(x, inverse=inverse)  # numpy stage loop
    got = np.asarray(mxu_ntt.dif(jnp.asarray(x), inverse=inverse))
    assert (ref == got).all()


def test_mxu_roundtrip_through_public_api(monkeypatch):
    """intt(ntt(x)) == x with the MXU path forced on for device arrays."""
    monkeypatch.setenv("VALIDA_TPU_MXU_NTT", "1")
    rng = np.random.default_rng(12)
    x = bb.to_monty(
        rng.integers(0, bb.P, size=(1 << 9, 3), dtype=np.uint32)
    )
    xj = jnp.asarray(x)
    out = np.asarray(nttm.intt(nttm.ntt(xj)))
    assert (out == x).all()


def test_mxu_worst_case_limb_accumulation():
    """Near-maximal limbs (0x77FFFFFF < p) push the cross-limb sums past
    2^24 — inexact if the j-accumulation ran in f32 instead of i32."""
    x = np.full((1 << 8, 4), 0x77FFFFFF, dtype=np.uint32)
    x[::3] = 0x6FEFDFCF
    ref = nttm.dif(x)
    got = np.asarray(mxu_ntt.dif(jnp.asarray(x)))
    assert (ref == got).all()


def test_mxu_radix_schedule():
    assert mxu_ntt._radix_schedule(7) == [7]
    assert mxu_ntt._radix_schedule(14) == [7, 7]
    assert mxu_ntt._radix_schedule(19) == [5, 7, 7]
    assert mxu_ntt._radix_schedule(9) == [2, 7]


def test_step_tile_legality():
    """Every chosen tile must satisfy Mosaic's block rules: trailing lanes
    (tm*rest_n) a multiple of 128 or the full m4*rest_n; tm a multiple of 8
    or the full m4; block bytes under the cap."""
    for log_len in range(8, 21):
        m4 = 1 << (log_len - 7)
        for rest_n in [1, 2, 3, 4, 5, 8, 12, 20, 51, 56, 79, 100, 255, 400, 816]:
            tm = mxu_ntt._step_tile(m4, rest_n)
            if tm == 0:
                continue
            assert m4 % tm == 0
            assert (tm * rest_n) % 128 == 0 or tm == m4, (m4, rest_n, tm)
            assert tm % 8 == 0 or tm == m4, (m4, rest_n, tm)
            assert tm * rest_n * 128 * 4 <= mxu_ntt._STEP_BLOCK_CAP


@pytest.mark.parametrize("digits", ["i8", "bf16"])
@pytest.mark.parametrize("log_n,cols", [(8, 51), (14, 51), (15, 79), (10, 13)])
def test_mxu_pallas_interpret_odd_widths(monkeypatch, log_n, cols, digits):
    """The exact Pallas code path (interpret mode), both digit systems
    (int8 balanced digits — the TPU default — and the bf16 fallback):
    odd trace widths take the lane-padding branch; outputs stay
    bit-identical."""
    monkeypatch.setenv("VALIDA_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("VALIDA_TPU_MXU_I8", "1" if digits == "i8" else "0")
    rng = np.random.default_rng(13)
    x = rng.integers(0, bb.P, size=(1 << log_n, cols), dtype=np.uint32)
    ref = nttm.dif(x)
    got = np.asarray(mxu_ntt.dif(jnp.asarray(x)))
    assert (ref == got).all()


def test_mxu_i8_worst_case_digits(monkeypatch):
    """Interpret-mode int8 path on near-maximal values (top balanced
    digit at its ceiling) — overflow of any digit would break these."""
    monkeypatch.setenv("VALIDA_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("VALIDA_TPU_MXU_I8", "1")
    x = np.full((1 << 8, 8), bb.P - 1, dtype=np.uint32)
    x[::3] = 0x77FFFFFF  # p - 2: every low digit at its extreme
    x[1::3] = 0x77808080  # borrow chain through three digits
    ref = nttm.dif(x)
    got = np.asarray(mxu_ntt.dif(jnp.asarray(x)))
    assert (ref == got).all()


@pytest.mark.skipif(
    __import__("jax").default_backend() not in ("tpu", "axon"),
    reason="megakernel uses manual HBM DMA (Ref.reshape) that interpret "
           "mode does not discharge; compiled Mosaic only",
)
@pytest.mark.parametrize("log_n,cols,inv", [(14, 128, False), (15, 128, True),
                                            (16, 256, False)])
def test_mega_pallas_bit_identical_on_device(monkeypatch, log_n, cols, inv):
    """One-pallas-call megakernel (r3 headline kernel) vs the per-step
    pipeline: bit-identical for forward/inverse, radix remainders, and
    multi-of-128 widths."""
    monkeypatch.setenv("VALIDA_TPU_MXU_NTT", "1")
    rng = np.random.default_rng(7)
    x = jnp.asarray(
        rng.integers(0, bb.P, size=(1 << log_n, cols), dtype=np.uint32)
    )
    monkeypatch.setenv("VALIDA_TPU_NTT_MEGA", "0")
    want = np.asarray(mxu_ntt.dif(x, inverse=inv))
    got = np.asarray(mxu_ntt._mega_pallas(x, log_n, inv, cols))
    assert (want == got).all()


def test_mega_supported_predicate():
    assert mxu_ntt._mega_supported(14, 128)
    assert mxu_ntt._mega_supported(19, 256)
    assert not mxu_ntt._mega_supported(13, 128)  # < 2 full steps
    assert not mxu_ntt._mega_supported(19, 64)   # lane tile violation
    assert not mxu_ntt._mega_supported(19, 120)
