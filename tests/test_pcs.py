"""End-to-end PCS tests: commit -> open -> verify, including mixed heights,
multiple rounds, shifted domains, and tamper rejection."""

import numpy as np
import pytest

from valida_tpu.field import babybear as bb
from valida_tpu.field import ext as extf
from valida_tpu.commit import FriConfig, TwoAdicFriPcs
from valida_tpu.commit.fri import FriError
from valida_tpu.crypto.challenger import DuplexChallenger

RNG = np.random.default_rng(1234)

# few queries for test speed; security params exercised in bench
CONFIG = FriConfig(log_blowup=1, num_queries=4, proof_of_work_bits=4)


def rand_mat(h, w):
    return RNG.integers(0, bb.P, size=(h, w), dtype=np.uint32)


def rand_ext():
    return tuple(int(x) for x in RNG.integers(0, bb.P, size=5))


def test_pcs_single_matrix_roundtrip():
    pcs = TwoAdicFriPcs(CONFIG)
    mat = rand_mat(16, 3)
    root, data = pcs.commit_batches([mat])

    z = rand_ext()
    ch = DuplexChallenger()
    ch.observe_digest(root)
    opened, proof = pcs.open_multi_batches([(data, [[z]])], ch)

    # opened value must equal naive evaluation of the interpolant
    coeffs = np.asarray(bb.from_monty(data.coeffs[0]))
    for c in range(3):
        want = extf.E_ZERO
        zp = extf.E_ONE
        for i in range(16):
            want = extf.e_add(want, extf.e_scale(zp, int(coeffs[i, c])))
            zp = extf.e_mul(zp, z)
        assert opened[0][0][0][c] == want

    vch = DuplexChallenger()
    vch.observe_digest(root)
    pcs.verify_multi_batches(
        [(root, [[z]])], [[(16, 3)]], opened, proof, vch
    )


def test_pcs_multi_round_mixed_heights():
    pcs = TwoAdicFriPcs(CONFIG)
    mats_a = [rand_mat(16, 2), rand_mat(4, 3)]
    mats_b = [rand_mat(8, 2)]
    root_a, data_a = pcs.commit_batches(mats_a)
    root_b, data_b = pcs.commit_batches(mats_b)

    g16 = bb.two_adic_generator(4)
    z = rand_ext()
    zg = extf.e_mul(z, extf.e_from_base(g16))
    points_a = [[z, zg], [z]]
    points_b = [[z]]

    ch = DuplexChallenger()
    ch.observe_digest(root_a)
    ch.observe_digest(root_b)
    opened, proof = pcs.open_multi_batches(
        [(data_a, points_a), (data_b, points_b)], ch
    )

    vch = DuplexChallenger()
    vch.observe_digest(root_a)
    vch.observe_digest(root_b)
    pcs.verify_multi_batches(
        [(root_a, points_a), (root_b, points_b)],
        [[(16, 2), (4, 3)], [(8, 2)]],
        opened,
        proof,
        vch,
    )


def test_pcs_shifted_domain():
    pcs = TwoAdicFriPcs(CONFIG)
    shift = pow(bb.GENERATOR, 2, bb.P)
    mat = rand_mat(8, 2)
    root, data = pcs.commit_batches([mat], domain_shifts=[shift])
    z = rand_ext()
    ch = DuplexChallenger()
    ch.observe_digest(root)
    opened, proof = pcs.open_multi_batches([(data, [[z]])], ch)
    # opened value = interpolant over coset shift·H
    coeffs = np.asarray(bb.from_monty(data.coeffs[0]))
    for c in range(2):
        want = extf.E_ZERO
        zp = extf.E_ONE
        for i in range(8):
            want = extf.e_add(want, extf.e_scale(zp, int(coeffs[i, c])))
            zp = extf.e_mul(zp, z)
        assert opened[0][0][0][c] == want
    vch = DuplexChallenger()
    vch.observe_digest(root)
    pcs.verify_multi_batches([(root, [[z]])], [[(8, 2)]], opened, proof, vch)


def test_pcs_rejects_tampered_value():
    pcs = TwoAdicFriPcs(CONFIG)
    mat = rand_mat(8, 2)
    root, data = pcs.commit_batches([mat])
    z = rand_ext()
    ch = DuplexChallenger()
    ch.observe_digest(root)
    opened, proof = pcs.open_multi_batches([(data, [[z]])], ch)

    bad = [[[list(pv) for pv in mv] for mv in rv] for rv in opened]
    val = list(bad[0][0][0][0])
    val[0] = (val[0] + 1) % bb.P
    bad[0][0][0][0] = tuple(val)
    bad[0][0][0] = [tuple(v) for v in bad[0][0][0]]

    vch = DuplexChallenger()
    vch.observe_digest(root)
    with pytest.raises((FriError, AssertionError)):
        pcs.verify_multi_batches([(root, [[z]])], [[(8, 2)]], bad, proof, vch)


def test_pcs_rejects_wrong_root():
    pcs = TwoAdicFriPcs(CONFIG)
    mat = rand_mat(8, 2)
    root, data = pcs.commit_batches([mat])
    z = rand_ext()
    ch = DuplexChallenger()
    ch.observe_digest(root)
    opened, proof = pcs.open_multi_batches([(data, [[z]])], ch)
    bad_root = np.asarray(root).copy()
    bad_root[0] ^= 1
    vch = DuplexChallenger()
    vch.observe_digest(bad_root)
    with pytest.raises(FriError):
        pcs.verify_multi_batches([(bad_root, [[z]])], [[(8, 2)]], opened, proof, vch)


def test_streamed_commit_matches_monolithic():
    """lde_commit_streamed root == MerkleTree over the full bitrev LDE
    (both hashers, blowup 1 and 2, with and without column tiling)."""
    import jax.numpy as jnp

    from valida_tpu.commit.streamed import lde_commit_streamed
    from valida_tpu.crypto.merkle import MerkleTree
    from valida_tpu.poly import ntt as nttm

    rng = np.random.default_rng(11)
    for log_blowup, hasher, col_tile, row_tile in [
        (1, "keccak", None, None), (1, "poseidon2", None, None),
        (2, "keccak", None, None), (1, "keccak", 4, None),
        (1, "keccak", None, 8), (2, "keccak", 4, 4),
    ]:
        evals = jnp.asarray(
            rng.integers(0, bb.P, size=(32, 8), dtype=np.uint32))
        lde = bb.from_monty(
            nttm.coset_lde(evals, log_blowup, bb.GENERATOR,
                           out_bitrev=True))
        want_tree = MerkleTree([np.asarray(lde)], hasher)
        root, levels = lde_commit_streamed(evals, log_blowup, bb.GENERATOR,
                                           hasher, col_tile=col_tile,
                                           row_tile=row_tile)
        np.testing.assert_array_equal(root, want_tree.root())
        for k, lvl in want_tree.levels.items():
            np.testing.assert_array_equal(np.asarray(levels[k]),
                                          np.asarray(lvl))
