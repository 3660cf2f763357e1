"""Degree-5 binomial extension of BabyBear: F_p[x] / (x^5 - W), W = 2.

Mirrors the challenge field used by the reference
(`/root/reference/basic/src/bin/valida.rs:357`).  Device representation:
uint32 arrays with a trailing axis of length 5, coefficients in Montgomery
form (coefficient of x^0 first).  Host scalars are 5-tuples of canonical
python ints.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import babybear as bb
from ..backend import xp_of

D = 5  # extension degree
W = 2  # binomial nonresidue: x^5 = 2

_W_MONTY = bb.monty_scalar(W)


# ---------------------------------------------------------------------------
# Device-side (trailing axis = 5, Montgomery uint32)
# ---------------------------------------------------------------------------


def ext_add(a, b):
    return bb.add(a, b)


def ext_sub(a, b):
    return bb.sub(a, b)


def ext_neg(a):
    return bb.neg(a)


def ext_scale(a, s):
    """Multiply ext array by base-field array s (shape broadcastable, monty)."""
    return bb.mul(a, s[..., None] if s.ndim == a.ndim - 1 else s)


# All 25 partial products of an ext mul in ONE batched bb.mul call: pair
# (k, i) at flat position k*5+i takes a_i · b_{(k-i) mod 5}, doubled when
# the exponent wrapped (x^5 = W = 2, and monty doubling == mul by monty(2),
# so results are bit-identical to the scalar formula).  Keeping this to a
# single bb.mul makes ext-heavy prover stages ~20x cheaper to trace/lower
# (each scalar bb.mul is ~37 jaxpr eqns; openings/perm/quotient stages do
# thousands of ext muls).
_EM_I = np.array([i for k in range(D) for i in range(D)], dtype=np.int32)
_EM_J = np.array([(k - i) % D for k in range(D) for i in range(D)],
                 dtype=np.int32)
_EM_OVF = np.array([i + ((k - i) % D) >= D for k in range(D)
                    for i in range(D)])


def ext_mul(a, b):
    """Product modulo x^5 - W.  c_k = sum_{i+j=k} a_i b_j + W·sum_{i+j=k+5}."""
    xp = xp_of(a)
    prod = bb.mul(a[..., _EM_I], b[..., _EM_J])  # [..., 25]
    prod = xp.where(_EM_OVF, bb.add(prod, prod), prod)
    t = prod.reshape(prod.shape[:-1] + (D, D))
    c = t[..., 0]
    for m in range(1, D):
        c = bb.add(c, t[..., m])
    return c


def ext_mul_base(a, s):
    """ext · base (s is a base-field monty array broadcast over coeffs)."""
    return bb.mul(a, s[..., None])


def ext_exp(a, e: int):
    result = None
    base = a
    while e > 0:
        if e & 1:
            result = base if result is None else ext_mul(result, base)
        e >>= 1
        if e:
            base = ext_mul(base, base)
    if result is None:
        return ext_one_like(a)
    return result


def ext_one_like(a):
    xp = xp_of(a)
    z = xp.zeros(a.shape[:-1], dtype=np.uint32)
    one = xp.full(a.shape[:-1], np.uint32(bb.ONE), dtype=np.uint32)
    return xp.stack([one, z, z, z, z], axis=-1)


def ext_inv(a):
    """Inverse via a^(p^5 - 2) ≡ norm trick: a^{-1} = conj_prod / norm.

    Uses Frobenius: a^{p^i} are conjugates; prod of all 5 conjugates is the
    norm in F_p.  a^{-1} = (prod_{i=1..4} a^{p^i}) / norm.
    """
    # r = a^(p) * a^(p^2) * a^(p^3) * a^(p^4)
    conj = frobenius(a)
    r = conj
    for _ in range(3):
        conj = frobenius(conj)
        r = ext_mul(r, conj)
    # norm = a * r  (lands in base field: coefficient 0)
    norm = ext_mul(a, r)
    norm0 = norm[..., 0]
    inv_norm = bb.inv_batch(norm0)
    return ext_mul_base(r, inv_norm)


# Frobenius: x -> x^p.  x^p = x^(5q + r) where p = 5q + r... since x^5 = W,
# x^p = W^((p - (p mod 5))/5) * x^(p mod 5).  p mod 5 = 2013265921 mod 5 = 1.
# So x^p = W^((p-1)/5) * x, i.e. coefficient i scales by W^(i(p-1)/5).
_FROB_BASE = pow(W, (bb.P - 1) // 5, bb.P)
_FROB_COEFFS = [pow(_FROB_BASE, i, bb.P) for i in range(D)]
_FROB_COEFFS_MONTY = np.array(
    [bb.monty_scalar(c) for c in _FROB_COEFFS], dtype=np.uint32
)


def frobenius(a):
    return bb.mul(a, _FROB_COEFFS_MONTY)


def ext_from_base(a):
    """Base-field monty array -> ext array (a placed at coeff 0)."""
    xp = xp_of(a)
    z = xp.zeros(a.shape, dtype=np.uint32)
    return xp.stack([a, z, z, z, z], axis=-1)


# ---------------------------------------------------------------------------
# Host-side scalar mirror (tuples of canonical ints)
# ---------------------------------------------------------------------------

ExtScalar = tuple  # length-5 tuple of ints in [0, p)

E_ZERO = (0, 0, 0, 0, 0)
E_ONE = (1, 0, 0, 0, 0)


def e_add(a, b):
    return tuple(bb.h_add(x, y) for x, y in zip(a, b))


def e_sub(a, b):
    return tuple(bb.h_sub(x, y) for x, y in zip(a, b))


def e_neg(a):
    return tuple((bb.P - x) % bb.P for x in a)


def e_mul(a, b):
    c = [0] * D
    for i in range(D):
        if a[i] == 0:
            continue
        for j in range(D):
            k = i + j
            t = a[i] * b[j] % bb.P
            if k >= D:
                c[k - D] = (c[k - D] + t * W) % bb.P
            else:
                c[k] = (c[k] + t) % bb.P
    return tuple(c)


def e_scale(a, s: int):
    return tuple(x * s % bb.P for x in a)


def e_from_base(x: int):
    return (x % bb.P, 0, 0, 0, 0)


def e_exp(a, e: int):
    result = E_ONE
    base = a
    while e > 0:
        if e & 1:
            result = e_mul(result, base)
        e >>= 1
        base = e_mul(base, base)
    return result


def e_inv(a):
    # norm trick mirrors device version
    def frob(x):
        return tuple(x[i] * _FROB_COEFFS[i] % bb.P for i in range(D))

    conj = frob(a)
    r = conj
    for _ in range(3):
        conj = frob(conj)
        r = e_mul(r, conj)
    norm = e_mul(a, r)
    assert all(c == 0 for c in norm[1:]), "norm must be in base field"
    return e_scale(r, bb.h_inv(norm[0]))


def e_powers(a, n: int):
    """[1, a, a^2, ..., a^{n-1}]"""
    out = [E_ONE]
    for _ in range(n - 1):
        out.append(e_mul(out[-1], a))
    return out
