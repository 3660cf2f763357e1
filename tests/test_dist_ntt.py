"""Distributed four-step NTT (parallel/dist_ntt.py) on an 8-virtual-device
CPU mesh: bit-identical to the single-device transform, for both
directions and the full coset-LDE pipeline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from valida_tpu.field import babybear as bb
from valida_tpu.poly import ntt as nttm
from valida_tpu.parallel.mesh import make_mesh
from valida_tpu.parallel.dist_ntt import dist_dif, dist_coset_lde


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh(8, dp=1)


@pytest.mark.parametrize("log_n,cols", [(10, 4), (14, 3), (17, 5)])
@pytest.mark.parametrize("inverse", [False, True])
def test_dist_dif_matches_single_device(mesh, log_n, cols, inverse):
    rng = np.random.default_rng(21)
    x = rng.integers(0, bb.P, size=(1 << log_n, cols), dtype=np.uint32)
    ref = nttm.dif(x, inverse=inverse)
    got = np.asarray(dist_dif(jnp.asarray(x), mesh, inverse=inverse))
    assert (ref == got).all()


def test_dist_coset_lde_matches_single_device(mesh):
    rng = np.random.default_rng(22)
    x = rng.integers(0, bb.P, size=(1 << 11, 6), dtype=np.uint32)
    xm = bb.to_monty(x)
    ref = nttm.coset_lde(xm, 1, bb.GENERATOR, out_bitrev=True)
    got = np.asarray(
        dist_coset_lde(jnp.asarray(xm), mesh, 1, bb.GENERATOR)
    )
    assert (np.asarray(ref) == got).all()


def test_dist_dif_jits_under_mesh(mesh):
    """The full sharded transform must compile as one jitted program."""
    rng = np.random.default_rng(23)
    x = jnp.asarray(
        rng.integers(0, bb.P, size=(1 << 12, 4), dtype=np.uint32)
    )
    f = jax.jit(lambda a: dist_dif(a, mesh))
    got = np.asarray(f(x))
    assert (nttm.dif(np.asarray(x)) == got).all()
