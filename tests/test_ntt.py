"""NTT / LDE / domain tests against naive O(N^2) evaluation."""

import numpy as np
import jax.numpy as jnp

from valida_tpu.field import babybear as bb
from valida_tpu.poly import ntt as nttm
from valida_tpu.poly.domain import ZerofierOnCoset, coset_points

RNG = np.random.default_rng(7)


def naive_eval(coeffs, points):
    """Evaluate poly with canonical int coeffs at canonical points (host)."""
    out = []
    for x in points:
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * int(x) + int(c)) % bb.P
        out.append(acc)
    return np.array(out, dtype=np.uint32)


def to_m(x):
    return bb.to_monty(jnp.asarray(np.asarray(x, dtype=np.uint32)))


def from_m(x):
    return np.asarray(bb.from_monty(x))


def test_ntt_roundtrip():
    for log_n in [0, 1, 3, 6]:
        n = 1 << log_n
        a = RNG.integers(0, bb.P, size=(n, 3), dtype=np.uint32)
        am = to_m(a)
        back = from_m(nttm.intt(nttm.ntt(am)))
        np.testing.assert_array_equal(back, a)


def test_ntt_matches_naive():
    log_n = 4
    n = 1 << log_n
    coeffs = RNG.integers(0, bb.P, size=n, dtype=np.uint32)
    g = bb.two_adic_generator(log_n)
    points = [pow(g, i, bb.P) for i in range(n)]
    want = naive_eval(coeffs, points)
    got = from_m(nttm.ntt(to_m(coeffs)))
    np.testing.assert_array_equal(got, want)


def test_dif_dit_consistency():
    log_n = 5
    n = 1 << log_n
    a = RNG.integers(0, bb.P, size=(n, 2), dtype=np.uint32)
    am = to_m(a)
    rev = nttm.bitrev_indices(log_n)
    # dif = ntt followed by bitrev permutation
    got = from_m(nttm.dif(am))
    want = from_m(nttm.ntt(am))[rev]
    np.testing.assert_array_equal(got, want)
    # dit(bitrev input) == ntt
    got2 = from_m(nttm.dit(am[jnp.asarray(rev)]))
    np.testing.assert_array_equal(got2, from_m(nttm.ntt(am)))


def test_coset_lde():
    log_n, log_blowup, shift = 3, 1, bb.GENERATOR
    n = 1 << log_n
    coeffs = RNG.integers(0, bb.P, size=n, dtype=np.uint32)
    evals = nttm.ntt(to_m(coeffs))
    lde = from_m(nttm.coset_lde(evals, log_blowup, shift))
    pts = [
        shift * pow(bb.two_adic_generator(log_n + log_blowup), i, bb.P) % bb.P
        for i in range(n << log_blowup)
    ]
    want = naive_eval(coeffs, pts)
    np.testing.assert_array_equal(lde, want)


def test_coset_lde_bitrev():
    log_n, log_blowup, shift = 3, 1, bb.GENERATOR
    n = 1 << log_n
    coeffs = RNG.integers(0, bb.P, size=(n, 2), dtype=np.uint32)
    evals = nttm.ntt(to_m(coeffs))
    nat = from_m(nttm.coset_lde(evals, log_blowup, shift))
    rev = from_m(nttm.coset_lde(evals, log_blowup, shift, out_bitrev=True))
    perm = nttm.bitrev_indices(log_n + log_blowup)
    np.testing.assert_array_equal(rev, nat[perm])


def test_coset_intt():
    log_n, shift = 4, 7
    n = 1 << log_n
    coeffs = RNG.integers(0, bb.P, size=n, dtype=np.uint32)
    pts = coset_points(log_n, shift)
    pts_canon = ((np.asarray(pts).astype(np.uint64) * pow(2, -32, bb.P)) % bb.P).astype(np.uint32)
    evals_canon = naive_eval(coeffs, pts_canon)
    got = from_m(nttm.coset_intt(to_m(evals_canon), shift))
    np.testing.assert_array_equal(got, coeffs)


def test_zerofier():
    log_n, log_blowup, shift = 3, 1, bb.GENERATOR
    z = ZerofierOnCoset(log_n, log_blowup, shift)
    zs = from_m(z.zerofier_evals())
    n = 1 << log_n
    for j in range(n << log_blowup):
        x = shift * pow(bb.two_adic_generator(log_n + log_blowup), j, bb.P) % bb.P
        want = (pow(x, n, bb.P) - 1) % bb.P
        assert int(zs[j]) == want
    zinv = from_m(z.zerofier_inv_evals())
    assert all(int(a) * int(b) % bb.P == 1 for a, b in zip(zs, zinv))


def test_lagrange_selectors():
    log_n, log_blowup, shift = 3, 1, bb.GENERATOR
    z = ZerofierOnCoset(log_n, log_blowup, shift)
    n = 1 << log_n
    sel = from_m(z.lagrange_basis_unnormalized(0))
    g_big = bb.two_adic_generator(log_n + log_blowup)
    for j in range(n << log_blowup):
        x = shift * pow(g_big, j, bb.P) % bb.P
        zx = (pow(x, n, bb.P) - 1) % bb.P
        want = zx * pow((x - 1) % bb.P, bb.P - 2, bb.P) % bb.P
        assert int(sel[j]) == want


def test_mod_sum():
    x = RNG.integers(0, bb.P, size=(100, 3), dtype=np.uint32)
    got = from_m(nttm._mod_sum(to_m(x), axis=0))
    want = x.astype(object).sum(axis=0) % bb.P
    np.testing.assert_array_equal(got, want.astype(np.uint32))


def test_eval_at_ext_point():
    from valida_tpu.field import ext as extf

    n = 16
    coeffs = RNG.integers(0, bb.P, size=(n, 2), dtype=np.uint32)
    z = tuple(int(v) for v in RNG.integers(0, bb.P, size=5))
    zp = extf.e_powers(z, n)
    got = from_m(
        nttm.eval_at_ext_point(
            to_m(coeffs), to_m(np.array(zp, dtype=np.uint32))
        )
    )
    for c in range(2):
        want = extf.E_ZERO
        for i in range(n):
            want = extf.e_add(want, extf.e_scale(zp[i], int(coeffs[i, c])))
        np.testing.assert_array_equal(got[c], np.array(want, dtype=np.uint32))
