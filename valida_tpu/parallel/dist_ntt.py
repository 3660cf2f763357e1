"""Distributed four-step NTT over a device mesh (SURVEY §2.5/§7 "the
distributed transpose" — the key multi-chip component).

The matmul formulation (poly/mxu_ntt.py) makes the distributed radix-2
NTT collapse to ONE communication round.  For x viewed as [128, M]
(row-major over trace rows) sharded by contiguous rows (each device holds
128/D matrix rows):

  1. all_to_all #1: reshard to column (t) slices — device d now holds all
     128 matrix rows for t in its M/D slice;
  2. local fused step: the [128,128] modular matmul (first-radix DFT,
     bitrev and any small-radix kron embedding folded in) + pointwise
     twiddle, exactly poly/mxu_ntt's step A — zero communication;
  3. all_to_all #2: reshard to block (u) ranges — device d now holds
     128/D complete M-point sub-problems, contiguous in the output;
  4. local recursion: the remaining levels are independent M-point DIFs,
     batched as ONE local dif call with the blocks riding the trailing
     axis — on TPU these run as the fused MXU Pallas kernels.

Output is the standard bitrev-out dif result with contiguous-row
sharding, ready for sharded Merkle leaf hashing.  Bit-identical to
poly/ntt.dif (tested on an 8-virtual-device CPU mesh).

The reference's analogue is rayon parallelism inside Plonky3's
Radix2DitParallel (`basic/src/bin/valida.rs:379`); there is no
distributed prover in the reference — this component is new design per
SURVEY §5.8.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:  # jax >= 0.8 promotes shard_map out of experimental (check_vma arg)
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=check_rep)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..field import babybear as bb
from ..poly import ntt as nttm
from ..poly import mxu_ntt as mx


def dist_dif(a, mesh: Mesh, axis: str = "sp", inverse: bool = False):
    """Natural-in, bitrev-out DIF over axis 0 of [N, ...], sharded over
    `axis` of `mesh` by contiguous rows.  Bit-identical to ntt.dif."""
    n = int(a.shape[0])
    log_n = n.bit_length() - 1
    assert 1 << log_n == n and log_n >= mx._LOG_B
    d = mesh.shape[axis]
    m = n >> mx._LOG_B
    assert mx._B % d == 0, "device count must divide 128"
    assert m % d == 0, "M = N/128 must be divisible by the device count"
    rest = tuple(a.shape[1:])
    # the distributed step is ALWAYS radix-128: its 128 output blocks are
    # then >= D, so each device recurses on whole blocks; the local
    # recursion applies its own remainder-first schedule (every schedule
    # computes identical values — the arithmetic is exact)
    limbs = mx._matmul_limbs(log_n, inverse, mx._LOG_B)
    tw = mx._step_twiddles(log_n, inverse, mx._LOG_B)  # (M, 128) u32

    def local_fn(x_local, tw_local):
        # x_local: [N/D, *rest] = 128/D matrix rows of the [128, M] view
        x2 = x_local.reshape((mx._B // d, m) + rest)
        # 1. row slices -> column (t) slices
        x2 = jax.lax.all_to_all(x2, axis, split_axis=1, concat_axis=0,
                                tiled=True)  # [128, M/D, *rest]
        # 2. local fused step: matmul + twiddle (tw_local: [M/D, 128])
        y = mx._mod_matmul(limbs, x2)
        twb = tw_local.T.reshape((mx._B, m // d) + (1,) * len(rest))
        y = bb.mul(y, twb)
        # 3. column slices -> block (u) ranges
        y = jax.lax.all_to_all(y, axis, split_axis=0, concat_axis=1,
                               tiled=True)  # [128/D, M, *rest]
        # 4. local recursion: 128/D independent M-point DIFs, batched as
        # one transform with the blocks riding the trailing axis
        if m > 1:
            yt = jnp.moveaxis(y, 0, 1)  # [M, 128/D, *rest]
            yt = nttm.dif(yt, inverse=inverse)
            y = jnp.moveaxis(yt, 1, 0)
        return y.reshape((n // d,) + rest)

    fn = shard_map(
        local_fn, mesh,
        in_specs=(P(axis), P(axis, None)),
        out_specs=P(axis),
        check_rep=False,
    )
    return fn(a, jnp.asarray(tw))


def dist_coset_lde(evals, mesh: Mesh, log_blowup: int, shift: int,
                   axis: str = "sp"):
    """Sharded LDE: iNTT + zero-pad + coset NTT, rows sharded over `axis`.

    Matches poly/ntt.coset_lde(..., out_bitrev=True) bit-for-bit; the two
    transforms each cost one all_to_all round."""
    n = int(evals.shape[0])
    log_n = n.bit_length() - 1
    rest_nd = evals.ndim - 1
    # iNTT: inverse dif + bitrev gather + 1/N scale (ntt.intt), then the
    # shift/zero-pad/forward dif of ntt.coset_eval_from_coeffs
    coeffs_rev = dist_dif(evals, mesh, axis, inverse=True)
    br = nttm.bitrev_indices(log_n)
    coeffs = coeffs_rev[jnp.asarray(br)]
    coeffs = nttm._scale_inv_n(coeffs, log_n)
    sp = nttm.shift_powers(shift, log_n)
    scaled = bb.mul(coeffs, jnp.asarray(sp).reshape((n,) + (1,) * rest_nd))
    padded = jnp.concatenate(
        [scaled] + [jnp.zeros_like(scaled)] * ((1 << log_blowup) - 1), axis=0
    )
    return dist_dif(padded, mesh, axis, inverse=False)
