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
