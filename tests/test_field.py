"""Field layer known-answer tests: device ops vs exact python-int arithmetic."""

import numpy as np
import jax.numpy as jnp

from valida_tpu.field import babybear as bb
from valida_tpu.field import ext

RNG = np.random.default_rng(0xBABE)


def rand_canonical(n):
    return RNG.integers(0, bb.P, size=n, dtype=np.uint32)


def test_monty_roundtrip():
    x = rand_canonical(1024)
    xm = bb.to_monty(jnp.asarray(x))
    back = np.asarray(bb.from_monty(xm))
    np.testing.assert_array_equal(back, x)


def test_mul_vs_int():
    a = rand_canonical(4096)
    b = rand_canonical(4096)
    am, bm = bb.to_monty(jnp.asarray(a)), bb.to_monty(jnp.asarray(b))
    got = np.asarray(bb.from_monty(bb.mul(am, bm)))
    want = (a.astype(object) * b.astype(object)) % bb.P
    np.testing.assert_array_equal(got, want.astype(np.uint32))


def test_mul_edge_cases():
    vals = np.array([0, 1, 2, bb.P - 1, bb.P - 2, 1 << 30, (1 << 31) - 1 - (1 << 27)],
                    dtype=np.uint32)
    a, b = np.meshgrid(vals, vals)
    a, b = a.ravel(), b.ravel()
    am, bm = bb.to_monty(jnp.asarray(a)), bb.to_monty(jnp.asarray(b))
    got = np.asarray(bb.from_monty(bb.mul(am, bm)))
    want = (a.astype(object) * b.astype(object)) % bb.P
    np.testing.assert_array_equal(got, want.astype(np.uint32))


def test_add_sub_neg():
    a = rand_canonical(4096)
    b = rand_canonical(4096)
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    np.testing.assert_array_equal(np.asarray(bb.add(aj, bj)), (a.astype(np.uint64) + b) % bb.P)
    np.testing.assert_array_equal(
        np.asarray(bb.sub(aj, bj)), (a.astype(np.int64) - b) % bb.P
    )
    np.testing.assert_array_equal(np.asarray(bb.neg(aj)), (-a.astype(np.int64)) % bb.P)


def test_inv():
    a = rand_canonical(512)
    a[0] = 0  # allowing-zero semantics: 0 -> 0
    am = bb.to_monty(jnp.asarray(a))
    got = np.asarray(bb.from_monty(bb.inv(am)))
    assert got[0] == 0
    for x, g in zip(a[1:], got[1:]):
        assert int(x) * int(g) % bb.P == 1


def test_exp():
    a = rand_canonical(64)
    am = bb.to_monty(jnp.asarray(a))
    got = np.asarray(bb.from_monty(bb.exp(am, 12345)))
    want = np.array([pow(int(x), 12345, bb.P) for x in a], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_two_adic_generators():
    for k in [1, 2, 10, 27]:
        g = bb.two_adic_generator(k)
        assert pow(g, 1 << k, bb.P) == 1
        assert pow(g, 1 << (k - 1), bb.P) != 1


def test_ext_mul_vs_host():
    a = rand_canonical(64 * 5).reshape(64, 5)
    b = rand_canonical(64 * 5).reshape(64, 5)
    am = bb.to_monty(jnp.asarray(a))
    bm = bb.to_monty(jnp.asarray(b))
    got = np.asarray(bb.from_monty(ext.ext_mul(am, bm)))
    for i in range(64):
        want = ext.e_mul(tuple(int(v) for v in a[i]), tuple(int(v) for v in b[i]))
        np.testing.assert_array_equal(got[i], np.array(want, dtype=np.uint32))


def test_ext_inv():
    a = rand_canonical(16 * 5).reshape(16, 5)
    am = bb.to_monty(jnp.asarray(a))
    inv = ext.ext_inv(am)
    prod = np.asarray(bb.from_monty(ext.ext_mul(am, inv)))
    want = np.zeros((16, 5), dtype=np.uint32)
    want[:, 0] = 1
    np.testing.assert_array_equal(prod, want)


def test_host_ext_inv():
    a = tuple(int(x) for x in rand_canonical(5))
    inv = ext.e_inv(a)
    assert ext.e_mul(a, inv) == ext.E_ONE


def test_frobenius_is_pth_power():
    a = tuple(int(x) for x in rand_canonical(5))
    am = bb.to_monty(jnp.asarray(np.array(a, dtype=np.uint32)))
    frob = np.asarray(bb.from_monty(ext.frobenius(am)))
    want = ext.e_exp(a, bb.P)
    np.testing.assert_array_equal(frob, np.array(want, dtype=np.uint32))


def test_inv_batch_matches_inv():
    """Product-tree batch inversion is bit-identical to exp-based inv,
    including zeros and non-power-of-two sizes."""
    import numpy as np
    from valida_tpu.field import babybear as bb

    rng = np.random.default_rng(31)
    a = rng.integers(0, bb.P, size=777, dtype=np.uint32)
    a[::13] = 0
    am = bb.to_monty(a)
    assert (bb.inv_batch(am) == bb.inv(am)).all()
    # 2-D shape and scalar-ish sizes
    b = am[:64].reshape(8, 8)
    assert (bb.inv_batch(b) == bb.inv(b)).all()
    assert (bb.inv_batch(am[:1]) == bb.inv(am[:1])).all()
