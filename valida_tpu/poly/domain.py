"""Two-adic evaluation domains, zerofiers and selector polynomials.

Replaces Plonky3's `ZerofierOnCoset` / `cyclic_subgroup_coset_known_order`
as used by the quotient kernel (`/root/reference/machine/src/quotient.rs:63-108`)
with closed-form evaluations on the coset, exploiting the periodicity of
Z_H(x) = x^N - 1 on a coset of a larger subgroup.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from ..field import babybear as bb
from .ntt import shift_powers, _powers_host


@functools.lru_cache(maxsize=None)
def coset_points(log_n: int, shift: int) -> np.ndarray:
    """Canonical points shift·g^i of the coset (natural order), Montgomery form."""
    canon = _powers_host(bb.two_adic_generator(log_n), 1 << log_n)
    canon = canon.astype(np.uint64) * np.uint64(shift % bb.P) % np.uint64(bb.P)
    return ((canon << 32) % np.uint64(bb.P)).astype(np.uint32)


def coset_points_device(log_n: int, shift: int):
    """In-graph coset points, identical values to `coset_points` but built
    from log_n SCALAR constants (square-and-multiply over the iota bits)
    instead of a baked [2^log_n] array: a 2^23-point quotient stage bakes
    five such arrays, and the resulting ~160 MB StableHLO payload is
    rejected by the remote compile service (HTTP 413)."""
    n = 1 << log_n
    idx = jnp.arange(n, dtype=jnp.uint32)
    acc = jnp.full((n,), np.uint32(bb.monty_scalar(shift % bb.P)),
                   jnp.uint32)
    g = bb.two_adic_generator(log_n)
    for b in range(log_n):
        gb = np.uint32(bb.monty_scalar(bb.h_exp(g, 1 << b)))
        hit = ((idx >> np.uint32(b)) & np.uint32(1)).astype(bool)
        acc = jnp.where(hit, bb.mul(acc, gb), acc)
    return acc


class ZerofierOnCoset:
    """Z_H(x) = x^N - 1 (H of size N = 2^log_n) evaluated on the coset
    shift·K with K of size N·2^log_blowup.

    Z values repeat with period 2^log_blowup along the natural-order coset:
    Z(shift·k^j) = shift^N · (k^N)^j - 1 and k^N has order 2^log_blowup.
    """

    def __init__(self, log_n: int, log_blowup: int, shift: int):
        self.log_n = log_n
        self.log_blowup = log_blowup
        self.shift = shift % bb.P
        n = 1 << log_n
        b = 1 << log_blowup
        k = bb.two_adic_generator(log_n + log_blowup)
        kn = bb.h_exp(k, n)  # order 2^log_blowup
        sn = bb.h_exp(self.shift, n)
        zs = []
        for j in range(b):
            zs.append(bb.h_sub(sn * bb.h_exp(kn, j) % bb.P, 1))
        self._z_period = np.array(
            [bb.monty_scalar(z) for z in zs], dtype=np.uint32
        )
        self._zinv_period = np.array(
            [bb.monty_scalar(bb.h_inv(z)) for z in zs], dtype=np.uint32
        )

    def zerofier_evals(self):
        """Z_H over the full coset (natural order), shape [N·2^b]."""
        n = 1 << self.log_n
        return np.tile(self._z_period, n)

    def zerofier_inv_evals(self):
        n = 1 << self.log_n
        return np.tile(self._zinv_period, n)

    def lagrange_basis_unnormalized(self, i: int):
        """L_i(x) ∝ Z_H(x)/(x - g^i) over the coset (natural order).

        Matches Plonky3's `lagrange_basis_unnormalized` used for the
        is_first_row / is_last_row selectors.
        """
        x = coset_points(self.log_n + self.log_blowup, self.shift)
        gi = bb.h_exp(bb.two_adic_generator(self.log_n), i)
        denom = bb.sub(x, np.uint32(bb.monty_scalar(gi)))
        z = self.zerofier_evals()
        return bb.mul(z, bb.inv(denom))
