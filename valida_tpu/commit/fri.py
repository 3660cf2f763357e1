"""Batch FRI low-degree proof over bit-reversed two-adic coset domains.

Plays the role of p3-fri's commit/fold/query machinery as consumed through
`open_multi_batches` / `verify_multi_batches`
(`/root/reference/derive/src/lib.rs:391-392,620-633`).  Self-consistent
design (prover and verifier in this framework):

* All committed evaluation vectors are in **bit-reversed** order, so fold
  pairs (x, -x) sit at adjacent indices (2i, 2i+1) and a Merkle query index
  is stable across layers via right-shifts.
* Commit phase: repeatedly fold by 2 with challenger-sampled beta; each
  layer is committed as a pair matrix [M/2, 2*5] (extension values
  flattened to base columns); "reduced openings" of smaller heights are
  injected as the fold reaches their size.
* After the final constant: proof-of-work grind, then query-index sampling.

Fold rule at pair (e0, e1) with x0 = the even point:
    p'(x0^2) = (e0 + e1)/2 + beta * (e0 - e1) / (2 x0)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..backend import xp_of
from ..field import babybear as bb
from ..field import ext as extf
from ..poly.ntt import bitrev_indices, _powers_host
from ..crypto.merkle import MerkleTree, verify_opening
from ..crypto import poseidon


@dataclasses.dataclass
class FriConfig:
    log_blowup: int = 1
    num_queries: int = 40
    proof_of_work_bits: int = 8
    hasher: str = "keccak"  # "keccak" | "poseidon2" (Merkle MMCS hasher)
    # Stop folding when the layer holds 2^(log_blowup + log_final) values and
    # ship the final polynomial's 2^log_final coefficients instead of folding
    # to a constant (0 = reference behavior: constant final poly).  Fewer
    # commit-phase layers means fewer Merkle trees, query paths, and
    # sequential fold rounds; the verifier evaluates the final poly directly.
    log_final: int = 0


@dataclasses.dataclass
class CommitPhaseOpening:
    pair_row: np.ndarray  # uint32 [10]: both pair values, base-flattened
    path: list


@dataclasses.dataclass
class FriQueryProof:
    # one entry per commit-phase layer
    commit_phase_openings: list


@dataclasses.dataclass
class FriProof:
    commit_phase_commits: list  # roots, np.uint32[8]
    # log_final == 0: one ext scalar (5-tuple of canonical ints) — the
    # constant final value (reference format).  log_final > 0: tuple of
    # 2^log_final ext tuples — the final polynomial's coefficients
    # (low-degree first).
    final_poly: tuple
    pow_witness: int
    query_proofs: list  # [FriQueryProof]


def final_poly_coeffs(final_poly) -> list:
    """Normalize either final_poly format to a coefficient list."""
    if final_poly and isinstance(final_poly[0], (tuple, list)):
        return [tuple(int(x) for x in c) for c in final_poly]
    return [tuple(int(x) for x in final_poly)]


def check_final_poly_shape(proof: "FriProof", config: FriConfig,
                           log_stop: int) -> None:
    """Soundness-critical shape check: the final polynomial must have
    EXACTLY 2^(log_stop - log_blowup) coefficients.  Without this, a
    malicious prover ships 2^log_stop coefficients that interpolate the
    final fold layer of arbitrary (non-low-degree) data, every fold check
    passes, and FRI's low-degree guarantee is void.  When log_final == 0
    the reference scalar format (a single constant, not a list) is also
    enforced so the proof byte format stays pinned."""
    nested = bool(proof.final_poly) and isinstance(
        proof.final_poly[0], (tuple, list)
    )
    if config.log_final == 0 and nested:
        raise FriError(
            "final polynomial must be a single constant when log_final == 0"
        )
    n = len(final_poly_coeffs(proof.final_poly))
    expect = 1 << max(0, log_stop - config.log_blowup)
    if n != expect:
        raise FriError(
            f"final polynomial has {n} coefficients, expected {expect}"
        )


def direct_open_threshold(config: FriConfig) -> int:
    """Matrices whose LDE height is <= 2^threshold are opened DIRECTLY:
    their full coefficient vector ships in the proof, the verifier
    evaluates it at the opening points (zeta side) and at every query's
    domain point against the Merkle-opened leaf row (commitment side) —
    same per-query soundness as a FRI fold, with no reduced opening, no
    fold participation, and no per-layer Merkle path.  Without this, one
    tiny chip (a 1-row static-data trace) would clamp fri_log_stop to its
    height and neutralize log_final for the whole machine.  -1 disables
    (log_final == 0 keeps the reference proof format exactly)."""
    if config.log_final <= 0:
        return -1
    return config.log_blowup + config.log_final


def is_direct_mat(log_lde: int, log_max: int, threshold: int) -> bool:
    """Direct-open predicate (must agree between prover and verifier):
    at or under the threshold, and never the largest matrix (FRI needs at
    least the top height)."""
    return log_lde <= threshold and log_lde < log_max


def fri_log_stop(config: FriConfig, log_max: int, min_height: int) -> int:
    """Size (log2) of the last committed... rather, of the final evaluation
    layer: folding stops once the layer holds 2^log_stop values.  Clamped so
    every reduced-opening height still gets folded in (heights below the
    final layer could otherwise never enter the transcript)."""
    return max(config.log_blowup,
               min(config.log_blowup + config.log_final, min_height, log_max))


# ---------------------------------------------------------------------------
# domain tables
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _x0_inv_table(log_m: int, shift: int) -> np.ndarray:
    """inv(x0) for each fold pair of a size-2^log_m layer with coset shift.

    x0(pair i) = shift * g_M^{brev_{M/2}(i)}; returns Montgomery uint32
    [M/2].  (brev of the even element of the pair.)
    """
    half = 1 << (log_m - 1)
    g = bb.two_adic_generator(log_m)
    pw = _powers_host(g, half).astype(np.uint64)  # g^j, j < M/2
    if log_m - 1 > 0:
        pw = pw[bitrev_indices(log_m - 1)]
    x0 = pw * np.uint64(shift % bb.P) % np.uint64(bb.P)
    inv = np.array([bb.h_inv(int(v)) for v in x0], dtype=np.uint64)
    return ((inv << 32) % np.uint64(bb.P)).astype(np.uint32)


def layer_shift(base_shift: int, layer: int) -> int:
    """Coset shift of fold layer `layer` (0 = input domain)."""
    s = base_shift % bb.P
    for _ in range(layer):
        s = s * s % bb.P
    return s


def _ext_to_base_matrix(v):
    """[M, 5] ext monty -> [M/2, 10] canonical pair matrix for commitment."""
    m = v.shape[0]
    return np.asarray(bb.from_monty(v)).reshape(m // 2, 10)


def fold_device(v, beta, x0_inv):
    """One FRI fold on device.

    v: [M, 5] ext monty (bitrev order); beta: [5] ext monty; x0_inv: [M/2]
    base monty.  Returns [M/2, 5].
    """
    e0 = v[0::2]
    e1 = v[1::2]
    xp = xp_of(v)
    s = bb.add(e0, e1)
    d = bb.sub(e0, e1)
    d = extf.ext_mul_base(d, x0_inv)
    d = extf.ext_mul(d, xp.broadcast_to(beta[None, :], d.shape))
    inv2 = np.uint32(bb.monty_scalar(bb.h_inv(2)))
    return bb.mul(bb.add(s, d), inv2)


def extract_final_poly(current, config: FriConfig, log_max: int,
                       log_stop: int, shift: int, challenger):
    """current: [2^log_stop, 5] ext monty evals (bitrev order) after the
    last fold, living on the squared coset.  Interpolates the final
    polynomial, enforces the degree bound (coefficients above 2^log_final
    must vanish — this is FRI's low-degree conclusion), observes the
    coefficients, and returns the proof's final_poly field."""
    from ..poly import ntt as nttm

    n_layers = log_max - log_stop
    m = 1 << log_stop
    vals = np.asarray(current)  # monty, bitrev order
    nat = vals[bitrev_indices(log_stop)] if log_stop > 0 else vals
    s_fin = layer_shift(shift, n_layers)
    coeffs_m = nttm.coset_intt(nat, s_fin)
    coeffs = np.asarray(bb.from_monty(coeffs_m))  # [m, 5] canonical
    n_keep = max(1, m >> config.log_blowup)
    assert not coeffs[n_keep:].any(), (
        "final FRI polynomial exceeds the degree bound"
    )
    if n_keep == 1:
        final_poly = tuple(int(v) for v in coeffs[0])
        challenger.observe_ext(final_poly)
        return final_poly
    final_poly = tuple(
        tuple(int(v) for v in row) for row in coeffs[:n_keep]
    )
    for c in final_poly:
        challenger.observe_ext(c)
    return final_poly


# ---------------------------------------------------------------------------
# proof-of-work grind (device-batched Poseidon search)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _grind_attempt_jit(batch: int, k: int, mask: int, _param_set: str):
    """One compiled grind attempt per (batch, buffer-len, mask) — a
    per-prove closure here recompiled ~2.4 s on EVERY prove (the single
    biggest steady-state stage at 2^13, VERDICT r3 #3).  _param_set keys
    the cache because permute_device bakes the active Poseidon constants
    in at trace time."""

    @jax.jit
    def attempt(state0_m, start):
        cand = start + jnp.arange(batch, dtype=jnp.uint32)
        st = state0_m.at[:, k].set(bb.to_monty(cand))
        out = poseidon.permute_device(st)
        last = bb.from_monty(out[:, poseidon.WIDTH - 1])
        ok = (last & jnp.uint32(mask)) == 0
        idx = jnp.argmax(ok)
        return jnp.where(jnp.any(ok), cand[idx], jnp.uint32(0xFFFFFFFF))

    return attempt


def grind_device(challenger, bits: int) -> int:
    """Find the smallest witness w such that observing w then sampling
    `bits` bits yields 0.  Batched Poseidon on device; falls back to the
    host loop for tiny state shapes.

    Mirrors DuplexChallenger.grind semantics exactly: observe(w) appends to
    the input buffer; sample() duplexes and pops state[WIDTH-1].
    """
    from ..backend import get_backend

    base_state = np.array(challenger.state, dtype=np.uint32)
    pending = list(challenger.input_buffer)
    k = len(pending)
    assert k + 1 < poseidon.WIDTH, "input buffer overflow during grind"
    mask = (1 << bits) - 1
    use_jax = get_backend() == "jax"

    def attempt_host(start, batch):
        state0 = np.tile(base_state, (batch, 1))
        for i, v in enumerate(pending):
            state0[:, i] = v
        if use_jax:
            fn = _grind_attempt_jit(batch, k, mask, poseidon.PARAM_SET)
            # Montgomery-convert in numpy: an eager device to_monty on the
            # [batch, 16] state was ~13 one-time remote compiles
            state0_m = jnp.asarray(bb.to_monty(state0))
            return int(fn(state0_m, jnp.uint32(start)))
        st = bb.to_monty(state0)
        cand = (start + np.arange(batch, dtype=np.uint64)).astype(np.uint32)
        st[:, k] = bb.to_monty(cand)
        out = poseidon.permute_device(st)
        last = bb.from_monty(out[:, poseidon.WIDTH - 1])
        ok = (last & np.uint32(mask)) == 0
        if not ok.any():
            return 0xFFFFFFFF
        return int(cand[np.argmax(ok)])

    # expected ~2^bits candidates: start small and grow the batch
    start = 0
    batch = max(64, min(1 << 14, 4 << bits))
    while start < (1 << 32):
        w = attempt_host(start, batch)
        if w != 0xFFFFFFFF:
            challenger.observe(w)
            assert challenger.sample_bits(bits) == 0
            return w
        start += batch
        batch = min(batch * 2, 1 << 16)
    raise RuntimeError("grind failed")


# ---------------------------------------------------------------------------
# prover
# ---------------------------------------------------------------------------


def fri_prove(reduced_openings: dict, config: FriConfig, shift: int, challenger):
    """Run the FRI commit + query phases.

    reduced_openings: {log_m: [2^log_m, 5] ext monty device array in bitrev
    order} — the alpha-combined opening quotients per LDE height.
    Returns (FriProof, query_indices, layer_trees) — trees kept so the
    caller can attach input openings per query.
    """
    log_max = max(reduced_openings)
    log_min = fri_log_stop(config, log_max, min(reduced_openings))
    current = reduced_openings[log_max]

    commits = []
    trees = []
    betas = []
    layer = 0
    for log_m in range(log_max, log_min, -1):
        pair_mat = _ext_to_base_matrix(current)
        tree = MerkleTree([pair_mat], hasher=config.hasher)
        trees.append(tree)
        commits.append(tree.root())
        challenger.observe_digest(tree.root())
        beta = challenger.sample_ext()
        betas.append(beta)
        xp = xp_of(current)
        beta_m = bb.to_monty(xp.asarray(np.array(beta, dtype=np.uint32)))
        x0inv = xp.asarray(_x0_inv_table(log_m, layer_shift(shift, layer)))
        current = fold_device(current, beta_m, x0inv)
        layer += 1
        nxt = log_m - 1
        if nxt in reduced_openings:
            current = bb.add(current, reduced_openings[nxt])

    final_poly = extract_final_poly(current, config, log_max, log_min, shift,
                                    challenger)

    pow_witness = grind_device(challenger, config.proof_of_work_bits)

    query_indices = [
        challenger.sample_bits(log_max) for _ in range(config.num_queries)
    ]

    # one batched open per layer tree (ONE device->host fetch each) —
    # per-query open() costs a tunnel round trip per path node
    per_layer = [
        tree.open_many([idx >> (layer_i + 1) for idx in query_indices])
        for layer_i, tree in enumerate(trees)
    ]
    query_proofs = []
    for qi in range(len(query_indices)):
        openings = [
            CommitPhaseOpening(pair_row=per_layer[layer_i][qi][0][0],
                               path=per_layer[layer_i][qi][1])
            for layer_i in range(len(trees))
        ]
        query_proofs.append(FriQueryProof(commit_phase_openings=openings))

    proof = FriProof(
        commit_phase_commits=commits,
        final_poly=final_poly,
        pow_witness=pow_witness,
        query_proofs=query_proofs,
    )
    return proof, query_indices


# ---------------------------------------------------------------------------
# verifier
# ---------------------------------------------------------------------------


class FriError(Exception):
    pass


def fri_verify_challenges(proof: FriProof, config: FriConfig, log_max: int,
                          challenger):
    """Replay the transcript: betas, pow check, query indices."""
    betas = []
    for root in proof.commit_phase_commits:
        challenger.observe_digest(root)
        betas.append(challenger.sample_ext())
    for c in final_poly_coeffs(proof.final_poly):
        challenger.observe_ext(c)
    if not challenger.check_witness(config.proof_of_work_bits, proof.pow_witness):
        raise FriError("proof-of-work check failed")
    indices = [
        challenger.sample_bits(log_max) for _ in range(config.num_queries)
    ]
    return betas, indices


def verify_queries_fold(query_proofs, proof: FriProof, config: FriConfig,
                        betas, indices, log_max: int, shift: int,
                        ros) -> None:
    """All queries at once: per commit-phase layer, ONE batched Merkle
    verification across the queries (lane-parallel hashing), then the
    (cheap) scalar fold arithmetic per query."""
    from ..crypto.merkle import verify_openings

    log_stop = fri_log_stop(config, log_max, min(ros[0]) if ros else log_max)
    n_layers = log_max - log_stop
    if len(proof.commit_phase_commits) != n_layers:
        raise FriError(
            f"wrong number of commit-phase layers: "
            f"{len(proof.commit_phase_commits)} != {n_layers}"
        )
    check_final_poly_shape(proof, config, log_stop)
    for qp in query_proofs:
        if len(qp.commit_phase_openings) != n_layers:
            raise FriError(
                f"query proof has {len(qp.commit_phase_openings)} "
                f"commit-phase openings, expected {n_layers}"
            )
    idx = np.asarray(indices, dtype=np.int64)
    for layer, log_m in enumerate(range(log_max, log_stop, -1)):
        pair_idx = idx >> 1
        rows = np.stack([
            np.asarray(qp.commit_phase_openings[layer].pair_row,
                       dtype=np.uint32)
            for qp in query_proofs
        ])
        paths = np.stack([
            np.asarray(qp.commit_phase_openings[layer].path, dtype=np.uint32)
            for qp in query_proofs
        ])
        if not verify_openings(
            proof.commit_phase_commits[layer], [(1 << (log_m - 1), 10)],
            pair_idx, [rows], paths, hasher=config.hasher,
        ):
            raise FriError(f"bad commit-phase Merkle path at layer {layer}")
        idx = pair_idx
    for qi, (qp, index, ro) in enumerate(zip(query_proofs, indices, ros)):
        _verify_query_fold_values(qp, proof, config, betas, int(index),
                                  log_max, shift, ro)


def verify_query_fold(query_proof: FriQueryProof, proof: FriProof,
                      config: FriConfig, betas, index: int, log_max: int,
                      shift: int, ro_at_index: dict) -> None:
    """Single-query form: per-layer Merkle verification + fold values."""
    log_stop = fri_log_stop(config, log_max, min(ro_at_index) if ro_at_index
                            else log_max)
    n_layers = log_max - log_stop
    if len(proof.commit_phase_commits) != n_layers:
        raise FriError(
            f"wrong number of commit-phase layers: "
            f"{len(proof.commit_phase_commits)} != {n_layers}"
        )
    check_final_poly_shape(proof, config, log_stop)
    if len(query_proof.commit_phase_openings) != n_layers:
        raise FriError(
            f"query proof has {len(query_proof.commit_phase_openings)} "
            f"commit-phase openings, expected {n_layers}"
        )
    idx = index
    for layer, log_m in enumerate(range(log_max, log_stop, -1)):
        opening = query_proof.commit_phase_openings[layer]
        root = proof.commit_phase_commits[layer]
        pair_index = idx >> 1
        dims = [(1 << (log_m - 1), 10)]
        if not verify_opening(root, dims, pair_index, [opening.pair_row],
                              opening.path, hasher=config.hasher):
            raise FriError(f"bad commit-phase Merkle path at layer {layer}")
        idx = pair_index
    _verify_query_fold_values(query_proof, proof, config, betas, index,
                              log_max, shift, ro_at_index)


def _verify_query_fold_values(query_proof: FriQueryProof, proof: FriProof,
                              config: FriConfig, betas, index: int,
                              log_max: int, shift: int,
                              ro_at_index: dict) -> None:
    log_stop = fri_log_stop(config, log_max, min(ro_at_index) if ro_at_index
                            else log_max)
    value = ro_at_index[log_max]
    idx = index
    layer = 0
    for log_m in range(log_max, log_stop, -1):
        opening = query_proof.commit_phase_openings[layer]
        pair_index = idx >> 1
        row = np.asarray(opening.pair_row, dtype=np.uint64)
        e0 = tuple(int(v) for v in row[0:5])
        e1 = tuple(int(v) for v in row[5:10])
        mine = e0 if (idx & 1) == 0 else e1
        if mine != tuple(value):
            raise FriError(f"fold value mismatch at layer {layer}")
        # fold
        s_j = layer_shift(shift, layer)
        g = bb.two_adic_generator(log_m)
        half_bits = log_m - 1
        pair_rev = _bitrev_int(pair_index, half_bits)
        x0 = s_j * pow(g, pair_rev, bb.P) % bb.P
        inv2 = bb.h_inv(2)
        s_ = extf.e_add(e0, e1)
        d_ = extf.e_sub(e0, e1)
        d_ = extf.e_scale(d_, bb.h_inv(x0))
        d_ = extf.e_mul(d_, betas[layer])
        value = extf.e_scale(extf.e_add(s_, d_), inv2)
        idx = pair_index
        layer += 1
        nxt = log_m - 1
        if nxt in ro_at_index:
            value = extf.e_add(value, ro_at_index[nxt])
    # evaluate the final polynomial at this query's point in the final
    # (squared-coset) domain: x = s_fin * g^{brev(idx)}
    coeffs = final_poly_coeffs(proof.final_poly)
    s_fin = layer_shift(shift, log_max - log_stop)
    x = (
        s_fin
        * pow(bb.two_adic_generator(log_stop), _bitrev_int(idx, log_stop),
              bb.P)
        % bb.P
    )
    ev = extf.E_ZERO
    for c in reversed(coeffs):
        ev = extf.e_add(extf.e_scale(ev, x), c)
    if tuple(value) != tuple(ev):
        raise FriError("final polynomial mismatch")


def _bitrev_int(x: int, bits: int) -> int:
    r = 0
    for _ in range(bits):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r
