"""BabyBear prime field (p = 2^31 - 2^27 + 1) arithmetic for TPU.

All device-side values are `jnp.uint32` arrays in **Montgomery form** (x·R mod p,
R = 2^32).  Montgomery representation lets every modular multiply run as a short
sequence of 32-bit integer ops that XLA vectorizes onto the TPU VPU lanes — there
is no native 64-bit multiply-high on TPU, so the 64-bit products are assembled
from 16-bit limb partial products.

Reference semantics: p3-baby-bear / p3-field as consumed by the Valida reference
(`/root/reference/machine/src/config.rs:9-14`); our representation choices are
TPU-native, only canonical (non-Montgomery) u32 values appear in serialized
proofs and hashed transcripts.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..backend import xp_of

# ---------------------------------------------------------------------------
# Constants
# ---------------------------------------------------------------------------

P = 2013265921  # 2^31 - 2^27 + 1
TWO_ADICITY = 27
GENERATOR = 31  # multiplicative group generator (canonical form)
MONTY_MU = 2281701377  # p^{-1} mod 2^32
R1 = 268435454  # 2^32 mod p  ("one" in Montgomery form)
R2 = 1172168163  # 2^64 mod p (to_monty multiplier)

_U32 = np.uint32
_MASK16 = np.uint32(0xFFFF)

# two-adic generator chain: g[k] has order 2^k; g[27] = 31^15 mod p.
_G27 = 440564289
TWO_ADIC_GENERATORS = [1] * (TWO_ADICITY + 1)
TWO_ADIC_GENERATORS[TWO_ADICITY] = _G27
for _k in range(TWO_ADICITY - 1, -1, -1):
    TWO_ADIC_GENERATORS[_k] = (
        TWO_ADIC_GENERATORS[_k + 1] * TWO_ADIC_GENERATORS[_k + 1] % P
    )
assert TWO_ADIC_GENERATORS[0] == 1 and TWO_ADIC_GENERATORS[1] == P - 1


def two_adic_generator(bits: int) -> int:
    """Canonical-form generator of the order-2^bits subgroup."""
    return TWO_ADIC_GENERATORS[bits]


# ---------------------------------------------------------------------------
# Host-side (python int) helpers — exact mirrors used by the challenger and
# by tests; scalar work is never on the device hot path.
# ---------------------------------------------------------------------------


def h_mul(a: int, b: int) -> int:
    return a * b % P


def h_add(a: int, b: int) -> int:
    s = a + b
    return s - P if s >= P else s


def h_sub(a: int, b: int) -> int:
    d = a - b
    return d + P if d < 0 else d


def h_inv(a: int) -> int:
    return pow(a, P - 2, P)


def h_exp(a: int, e: int) -> int:
    return pow(a, e, P)


def to_monty_int(x: int) -> int:
    return (x << 32) % P


def from_monty_int(x: int) -> int:
    return x * pow(1 << 32, P - 2, P) % P


# ---------------------------------------------------------------------------
# Device-side primitives (jnp.uint32, Montgomery form)
# ---------------------------------------------------------------------------


def _mul64(a, b):
    """Full 64-bit product of uint32 inputs as (hi, lo) uint32 pair.

    Requires a < 2^31 or b < 2^31 is NOT assumed: handles full u32 range.
    Built from 16-bit limbs so every partial product fits in uint32.
    """
    a0 = a & _MASK16
    a1 = a >> np.uint32(16)
    b0 = b & _MASK16
    b1 = b >> np.uint32(16)
    ll = a0 * b0
    lh = a0 * b1  # < 2^32, fits
    hl = a1 * b0
    hh = a1 * b1
    # mid = lh + hl can overflow u32 for full-range inputs; track its carry.
    mid = lh + hl
    mid_carry = (mid < lh).astype(np.uint32)  # 1 iff wrapped
    lo = ll + (mid << np.uint32(16))
    lo_carry = (lo < ll).astype(np.uint32)
    hi = hh + (mid >> np.uint32(16)) + (mid_carry << np.uint32(16)) + lo_carry
    return hi, lo


def _umulh_p(m):
    """High 32 bits of m * P, exploiting P = 0x78000001 (low limb = 1)."""
    m0 = m & _MASK16
    m1 = m >> np.uint32(16)
    p1 = np.uint32(P >> 16)  # 0x7800
    lh = m0 * p1
    mid = lh + m1  # < 2^31 + 2^16, fits
    lo = m0 + (mid << np.uint32(16))
    lo_carry = (lo < m0).astype(np.uint32)
    return m1 * p1 + (mid >> np.uint32(16)) + lo_carry


def _monty_reduce(hi, lo):
    """(hi·2^32 + lo)·R^{-1} mod p, result in [0, p)."""
    m = lo * np.uint32(MONTY_MU)  # wrapping low product
    u_hi = _umulh_p(m)
    r = hi - u_hi
    return xp_of(hi).where(hi < u_hi, r + np.uint32(P), r)


def mul(a, b):
    """Montgomery product of Montgomery-form inputs."""
    hi, lo = _mul64(a, b)
    return _monty_reduce(hi, lo)


def add(a, b):
    s = a + b
    return xp_of(s).where(s >= np.uint32(P), s - np.uint32(P), s)


def sub(a, b):
    d = a - b
    return xp_of(d).where(a < b, d + np.uint32(P), d)


def neg(a):
    return xp_of(a).where(a == 0, a, np.uint32(P) - a)


def double(a):
    return add(a, a)


def to_monty(x):
    """Canonical uint32 (in [0, p)) -> Montgomery form."""
    hi, lo = _mul64(x.astype(np.uint32), np.uint32(R2))
    return _monty_reduce(hi, lo)


def from_monty(x):
    """Montgomery form -> canonical uint32 in [0, p)."""
    return _monty_reduce(xp_of(x).zeros_like(x), x)


def from_wrapped_u32(x):
    """Arbitrary u32 -> Montgomery form (value taken mod p)."""
    x = x.astype(np.uint32)
    xp = xp_of(x)
    x = xp.where(x >= np.uint32(P), x - np.uint32(P), x)  # x < 2^32 < 2p+…
    x = xp.where(x >= np.uint32(P), x - np.uint32(P), x)
    return to_monty(x)


def exp(a, e: int):
    """a^e for a static python-int exponent (square-and-multiply, unrolled)."""
    result = None
    base = a
    while e > 0:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = mul(base, base)
    if result is None:
        return xp_of(a).full_like(a, np.uint32(R1))
    return result


def inv(a):
    """a^{p-2}; maps 0 -> 0 (allowing-zero semantics, mirrors
    `/root/reference/util/src/lib.rs:21-43`)."""
    # p - 2 = 2013265919.  Addition-chain-ish square and multiply.
    return exp(a, P - 2)


def inv_batch(a):
    """Elementwise inverse with 0 -> 0 via a product-tree batch inversion.

    ~3 Montgomery multiplies per element (up-sweep products, one exp at
    the root, down-sweep unwinding inv(x0) = inv(x0*x1)*x1) instead of
    exp()'s ~31 square-and-multiply rounds — the device-side form of the
    reference's batch_multiplicative_inverse (`util/src/lib.rs:21-43`).
    Bit-identical results to inv()."""
    xp = xp_of(a)
    shape = a.shape
    flat = a.reshape(-1)
    n = int(flat.shape[0])
    if n <= 1:
        return inv(a)
    zero = flat == 0
    one = np.uint32(R1)  # Montgomery 1
    flat = xp.where(zero, one, flat)
    size = 1 << (n - 1).bit_length()
    if size != n:
        flat = xp.concatenate(
            [flat, xp.full((size - n,), one, dtype=flat.dtype)]
        )
    levels = [flat]
    while levels[-1].shape[0] > 1:
        x = levels[-1]
        levels.append(mul(x[0::2], x[1::2]))
    invs = inv(levels[-1])
    for x in levels[-2::-1]:
        left = x[0::2]
        right = x[1::2]
        pair = xp.stack([mul(invs, right), mul(invs, left)], axis=1)
        invs = pair.reshape(x.shape[0])
    out = xp.where(zero, np.uint32(0), invs[:n])
    return out.reshape(shape)


def monty_scalar(x: int) -> int:
    """Python-int canonical value -> Montgomery-form python int."""
    return (x << 32) % P


def const(x: int, shape=(), dtype=np.uint32):
    """Montgomery-form constant array from a canonical python int."""
    from ..backend import asarray
    import numpy as _np
    return asarray(_np.full(shape, monty_scalar(x % P), dtype=dtype))


ONE = R1  # Montgomery-form 1 as a python int
ZERO = 0
