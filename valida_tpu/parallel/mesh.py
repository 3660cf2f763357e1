"""Device-mesh sharding for the prover's bulk stages.

The reference scales with rayon threads + SIMD lanes inside one process
(SURVEY.md §2.5); the TPU-native equivalents here are:
  * row sharding ("sp" axis): trace rows / LDE rows / Merkle leaves are
    partitioned across devices — the NTT's stage structure makes XLA insert
    all-to-all / collective-permute exchanges between butterfly stages,
    and the LogUp running sum is a sharded `associative_scan`;
  * batch sharding ("dp" axis): independent traces (chips, or machine
    instances) proved in parallel.

Everything is expressed as plain jnp ops under `jit` with NamedSharding
constraints; XLA GSPMD chooses the collectives (ICI within a slice).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import babybear as bb
from ..field import ext as extf
from ..poly import ntt as nttm
from ..crypto.keccak import keccak256_words


def make_mesh(n_devices: int | None = None, dp: int = 1) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    assert n % dp == 0
    arr = np.array(devices[:n]).reshape(dp, n // dp)
    return Mesh(arr, ("dp", "sp"))


def commit_step(traces):
    """Batched trace commit: [B, N, C] canonical -> per-trace Merkle roots.

    LDE (blowup 2) + bitrev + leaf hashing + tree reduction, all batched.
    """
    m = bb.to_monty(traces)
    lde = jax.vmap(
        lambda t: nttm.coset_lde(t, 1, bb.GENERATOR, out_bitrev=True)
    )(m)
    rows = bb.from_monty(lde)  # [B, 2N, C]
    b_sz, n2, c = rows.shape
    digests = keccak256_words(rows.reshape(b_sz * n2, c)).reshape(b_sz, n2, 8)
    while digests.shape[1] > 1:
        left = digests[:, 0::2]
        right = digests[:, 1::2]
        half = left.shape[1]
        pair = jnp.concatenate([left, right], axis=-1).reshape(b_sz * half, 16)
        digests = keccak256_words(pair).reshape(b_sz, half, 8)
    return digests[:, 0]


def logup_phi_step(q_cols, counts):
    """Sharded LogUp running sum: q [B, N, K, 5] monty, counts [B, N, K].

    phi = prefix sum over rows of sum_k q_k * count_k (modular); the scan
    distributes across the row-sharded axis.
    """
    terms = extf.ext_mul_base(q_cols, counts)  # [B, N, K, 5]
    summed = terms
    while summed.shape[2] > 1:
        half = summed.shape[2] // 2
        summed = bb.add(summed[:, :, :half], summed[:, :, half : 2 * half])
    summed = summed[:, :, 0]  # [B, N, 5]
    return jax.lax.associative_scan(bb.add, summed, axis=1)


def full_prove_step(traces, q_cols, counts):
    """One 'training step' of the prover pipeline: commit + LogUp scan.

    Returns (roots [B, 8], phi_last [B, 5]) — the two cross-device
    reductions of the pipeline (Merkle cap + cumulative sum).
    """
    roots = commit_step(traces)
    phi = logup_phi_step(q_cols, counts)
    return roots, phi[:, -1]


def sharded_prove_fn(mesh: Mesh):
    """jit full_prove_step with dp x sp shardings over the mesh."""
    t_sh = NamedSharding(mesh, P("dp", "sp", None))
    q_sh = NamedSharding(mesh, P("dp", "sp", None, None))
    out_root = NamedSharding(mesh, P("dp", None))
    out_phi = NamedSharding(mesh, P("dp", None))
    return jax.jit(
        full_prove_step,
        in_shardings=(t_sh, q_sh, t_sh),
        out_shardings=(out_root, out_phi),
    )
