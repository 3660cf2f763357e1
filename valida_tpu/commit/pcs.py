"""Two-adic FRI polynomial commitment scheme (batch commit / batch open).

API mirrors the Pcs surface the reference consumes
(`/root/reference/derive/src/lib.rs:283-392`): commit_batches,
commit_shifted_batches, get_ldes, open_multi_batches, verify_multi_batches,
coset_shift, log_blowup — re-designed TPU-first: LDEs and Merkle levels are
computed as batched device kernels; the sequential Fiat-Shamir transcript
runs host-side and is replicated deterministically on every process.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ..backend import asarray, xp_of
from ..field import babybear as bb
from ..field import ext as extf
from ..poly import ntt as nttm
from ..poly.ntt import bitrev_indices
from ..crypto.merkle import MerkleTree, verify_opening, verify_openings
from . import fri as frim
from .fri import FriConfig, FriProof, FriError


@dataclasses.dataclass
class ProverData:
    """Per-commitment prover state."""

    coeffs: list  # [h, w] natural-order coefficient matrices (monty)
    ldes: list  # [h*blowup, w] natural-order LDE matrices (monty)
    tree: MerkleTree  # commits bitrev canonical LDE rows
    log_heights: list  # trace log-heights


@dataclasses.dataclass
class BatchOpening:
    opened_rows: list  # canonical uint32 rows, one per matrix in the round
    path: list


@dataclasses.dataclass
class PcsQueryProof:
    input_openings: list  # one BatchOpening per round
    fri_query: frim.FriQueryProof


@dataclasses.dataclass
class PcsProof:
    fri: FriProof
    query_proofs: list  # [PcsQueryProof]
    # canonical [h, w] coefficient matrices of direct-opened tiny matrices
    # (round-major matrix order; empty unless log_final > 0 — see
    # fri.direct_open_threshold)
    direct_polys: list = dataclasses.field(default_factory=list)


def observe_direct_polys(challenger, direct_polys) -> None:
    """Bind direct-opened coefficient matrices into the transcript (every
    canonical u32, row-major, matrices in round-major order).  Called by
    prover and verifier at the same transcript position: after the opened
    values, before alpha — so the shipped coefficients are fixed before the
    FRI query indices are sampled."""
    for mat in direct_polys:
        for v in np.asarray(mat, dtype=np.uint32).reshape(-1):
            challenger.observe(int(v))


class TwoAdicFriPcs:
    def __init__(self, config: FriConfig | None = None, coset_shift: int = bb.GENERATOR):
        self.config = config or FriConfig()
        self.shift = coset_shift % bb.P

    @property
    def log_blowup(self) -> int:
        return self.config.log_blowup

    def coset_shift(self) -> int:
        return self.shift

    # -- commit ------------------------------------------------------------

    def commit_batches(self, matrices, domain_shifts=None):
        """Commit a batch of trace matrices (canonical uint32 [h, w], h a
        power of two, natural evaluation order over shift_i·H_h).

        domain_shifts: per-matrix evaluation-domain shift (default 1 =
        plain subgroup).  Returns (commitment root np.uint32[8], ProverData).
        """
        if domain_shifts is None:
            domain_shifts = [1] * len(matrices)
        coeffs_list = []
        ldes = []
        committed = []
        log_heights = []
        for mat, dshift in zip(matrices, domain_shifts):
            mat = asarray(mat)
            h = int(mat.shape[0])
            log_h = h.bit_length() - 1
            log_heights.append(log_h)
            m = bb.to_monty(mat)
            if dshift == 1:
                coeffs = nttm.intt(m)
            else:
                coeffs = nttm.coset_intt(m, dshift)
            xp = xp_of(coeffs)
            padded = xp.concatenate(
                [coeffs] + [xp.zeros_like(coeffs)] * ((1 << self.log_blowup) - 1),
                axis=0,
            )
            lde = nttm.coset_eval_from_coeffs(padded, self.shift)
            coeffs_list.append(coeffs)
            ldes.append(lde)
            rev = bitrev_indices(log_h + self.log_blowup)
            committed.append(np.asarray(bb.from_monty(lde[rev])))
        tree = MerkleTree(committed, hasher=self.config.hasher)
        data = ProverData(
            coeffs=coeffs_list, ldes=ldes, tree=tree, log_heights=log_heights
        )
        return tree.root(), data

    def get_ldes(self, data: ProverData):
        """Natural-order LDE matrices (monty) for quotient evaluation."""
        return data.ldes

    # -- open --------------------------------------------------------------

    def open_multi_batches(self, rounds, challenger):
        """rounds: [(ProverData, points_per_matrix)] with points given as
        ext scalars (tuples).  Returns (opened_values, PcsProof).

        opened_values[r][m][p] = list of ext tuples, one per column.
        """
        config = self.config
        # 1. evaluate openings from coefficient form
        opened_values = []
        for data, points in rounds:
            round_vals = []
            for coeffs, mat_points in zip(data.coeffs, points):
                mat_vals = []
                h = coeffs.shape[0]
                for z in mat_points:
                    zp = _ext_powers_device(z, h)
                    vals = nttm.eval_at_ext_point(coeffs, zp)  # [w, 5] monty
                    vals = np.asarray(bb.from_monty(vals))
                    mat_vals.append([tuple(int(x) for x in row) for row in vals])
                round_vals.append(mat_vals)
            opened_values.append(round_vals)

        # 2. direct-opened tiny matrices (round-major matrix order); their
        # full coefficient vectors ship in the proof, so they MUST be bound
        # into the transcript before alpha / the FRI query indices are
        # sampled — otherwise a cheating prover picks them after seeing the
        # queries and forges zeta openings
        threshold = frim.direct_open_threshold(config)
        log_max_all = max(
            lh + self.log_blowup
            for data, _p in rounds
            for lh in data.log_heights
        )
        direct_polys = []
        for data, _points in rounds:
            for coeffs, lh in zip(data.coeffs, data.log_heights):
                if frim.is_direct_mat(lh + self.log_blowup, log_max_all,
                                      threshold):
                    direct_polys.append(
                        np.asarray(bb.from_monty(coeffs), dtype=np.uint32)
                    )

        # 3. transcript: observe opened values + direct polys, sample alpha
        for round_vals in opened_values:
            for mat_vals in round_vals:
                for point_vals in mat_vals:
                    for val in point_vals:
                        challenger.observe_ext(val)
        observe_direct_polys(challenger, direct_polys)
        alpha = challenger.sample_ext()

        # 4. reduced openings per LDE height (bitrev order, ext monty);
        # direct matrices stay out of the FRI battery
        reduced = {}
        alpha_offset = 0
        for (data, points), round_vals in zip(rounds, opened_values):
            for mi, (coeffs, lde, mat_points) in enumerate(
                zip(data.coeffs, data.ldes, points)
            ):
                w = int(lde.shape[1])
                log_lde = int(lde.shape[0]).bit_length() - 1
                if frim.is_direct_mat(log_lde, log_max_all, threshold):
                    continue
                xp = xp_of(lde)
                apows = extf.e_powers(alpha, alpha_offset + w)[alpha_offset:]
                apows_m = bb.to_monty(
                    xp.asarray(np.array(apows, dtype=np.uint32))
                )  # [w, 5]
                lde_rev = lde[bitrev_indices(log_lde)]
                # combined(x) = sum_c alpha^{off+c} p_c(x): [H, 5]
                combined = _alpha_combine(lde_rev, apows_m)
                xs = xp.asarray(_coset_points_bitrev(log_lde, self.shift))
                acc = reduced.get(log_lde)
                for z, point_vals in zip(mat_points, round_vals[mi]):
                    comb_y = extf.E_ZERO
                    for c in range(w):
                        comb_y = extf.e_add(
                            comb_y, extf.e_mul(apows[c], point_vals[c])
                        )
                    num = bb.sub(
                        combined,
                        bb.to_monty(
                            xp.asarray(np.array(comb_y, dtype=np.uint32))
                        )[None, :],
                    )
                    # denominator (x - z): ext over [H]
                    z_m = bb.to_monty(xp.asarray(np.array(z, dtype=np.uint32)))
                    denom = bb.sub(extf.ext_from_base(xs), z_m[None, :])
                    quot = extf.ext_mul(num, extf.ext_inv(denom))
                    acc = quot if acc is None else bb.add(acc, quot)
                reduced[log_lde] = acc
                alpha_offset += w

        # 5. FRI
        fri_proof, query_indices = frim.fri_prove(
            reduced, config, self.shift, challenger
        )

        # 6. input openings per query — batched per round tree (one
        # device->host fetch each; see MerkleTree.open_many)
        log_max = max(reduced)
        per_round = [
            data.tree.open_many([
                idx >> (log_max - data.tree.log_max)
                for idx in query_indices
            ])
            for data, _points in rounds
        ]
        query_proofs = []
        for qi in range(len(query_indices)):
            input_openings = [
                BatchOpening(opened_rows=per_round[ri][qi][0],
                             path=per_round[ri][qi][1])
                for ri in range(len(rounds))
            ]
            query_proofs.append(
                PcsQueryProof(
                    input_openings=input_openings,
                    fri_query=fri_proof.query_proofs[qi],
                )
            )

        return opened_values, PcsProof(fri=fri_proof,
                                       query_proofs=query_proofs,
                                       direct_polys=direct_polys)

    # -- verify ------------------------------------------------------------

    def verify_multi_batches(self, rounds, dims, opened_values, proof: PcsProof,
                             challenger):
        """rounds: [(commit_root, points_per_matrix)]; dims[r][m] = (height,
        width) of the committed (trace) matrix; opened_values as produced by
        open_multi_batches."""
        config = self.config

        # structural validation up front: a malformed proof must fail with
        # a typed FriError, never an IndexError/ValueError deeper in
        if len(proof.query_proofs) != config.num_queries:
            raise FriError(
                f"wrong query count: {len(proof.query_proofs)} != "
                f"{config.num_queries}"
            )
        if len(proof.fri.query_proofs) != config.num_queries:
            raise FriError("wrong FRI query count")
        for qp in proof.query_proofs:
            if len(qp.input_openings) != len(rounds):
                raise FriError("wrong input-opening round count")
            for ri, rdims in enumerate(dims):
                opening = qp.input_openings[ri]
                if len(opening.opened_rows) != len(rdims):
                    raise FriError("wrong opened-row count")
                for (h, w), row in zip(rdims, opening.opened_rows):
                    if len(np.asarray(row).reshape(-1)) != int(w):
                        raise FriError("opened row width mismatch")

        log_max = max(
            (int(h).bit_length() - 1) + self.log_blowup
            for rdims in dims
            for (h, _w) in rdims
        )

        # direct-opened tiny matrices: full coefficients ship in the proof;
        # shape-validated and transcript-bound FIRST (before alpha and the
        # FRI query indices — see observe_direct_polys), then the claimed
        # zeta-side openings are checked against them here and the
        # commitment side per query below.  They carry no alpha powers and
        # no reduced opening.
        threshold = frim.direct_open_threshold(config)
        direct = {}  # (ri, mi) -> canonical [h, w] np.uint64 coeffs
        di = 0
        for ri, rdims in enumerate(dims):
            for mi, (h, w) in enumerate(rdims):
                log_lde = int(h).bit_length() - 1 + self.log_blowup
                if not frim.is_direct_mat(log_lde, log_max, threshold):
                    continue
                if di >= len(proof.direct_polys):
                    raise FriError("missing direct-opened polynomial")
                coeffs = np.asarray(proof.direct_polys[di], dtype=np.uint64)
                di += 1
                if coeffs.shape != (int(h), int(w)) or (coeffs >= bb.P).any():
                    raise FriError("malformed direct-opened polynomial")
                direct[(ri, mi)] = coeffs
        if di != len(proof.direct_polys):
            raise FriError("unexpected extra direct-opened polynomials")

        for round_vals in opened_values:
            for mat_vals in round_vals:
                for point_vals in mat_vals:
                    for val in point_vals:
                        challenger.observe_ext(val)
        observe_direct_polys(challenger, proof.direct_polys)
        alpha = challenger.sample_ext()

        betas, indices = frim.fri_verify_challenges(
            proof.fri, config, log_max, challenger
        )

        for (ri, mi), coeffs in direct.items():
            for z, point_vals in zip(rounds[ri][1][mi], opened_values[ri][mi]):
                zp = np.asarray(
                    extf.e_powers(z, coeffs.shape[0]), dtype=np.uint64
                )  # [h, 5]
                # vals[w, 5] = sum_i coeffs[i, c] * z^i  (base * ext)
                vals = np.zeros((coeffs.shape[1], 5), dtype=np.uint64)
                for d in range(5):
                    vals[:, d] = (
                        (coeffs * zp[:, d:d + 1]) % bb.P
                    ).sum(axis=0) % bb.P
                claimed = np.asarray(point_vals, dtype=np.uint64)
                if not np.array_equal(vals, claimed):
                    raise FriError(
                        "direct-opened polynomial disagrees with opened values"
                    )

        # precompute alpha powers + the query-independent point-side
        # combinations ONCE (the per-query loop below only combines the
        # opened leaf row; recomputing powers/comb_y per query was the
        # host verifier's dominant cost)
        total_width = 0
        for ri, (rdims, round_vals) in enumerate(zip(dims, opened_values)):
            assert len(rounds[ri][1]) == len(rdims) == len(round_vals)
            total_width += sum(
                w for mi, (_h, w) in enumerate(rdims)
                if (ri, mi) not in direct
            )
        apows_all = extf.e_powers(alpha, max(total_width, 1))
        apows_np = np.asarray(apows_all, dtype=np.uint64)  # [W, 5]
        comb_ys = []  # [round][mat][point] = Σ_c α^{off+c}·y_c
        off = 0
        for ri, ((root, points), rdims, round_vals) in enumerate(
            zip(rounds, dims, opened_values)
        ):
            round_comb = []
            for mi, ((h, w), mat_points, mat_vals) in enumerate(
                zip(rdims, points, round_vals)
            ):
                if (ri, mi) in direct:
                    round_comb.append(None)
                    continue
                apows = apows_all[off:off + w]
                mat_comb = []
                for point_vals in mat_vals:
                    comb_y = extf.E_ZERO
                    for c in range(w):
                        comb_y = extf.e_add(
                            comb_y, extf.e_mul(apows[c], point_vals[c])
                        )
                    mat_comb.append(comb_y)
                round_comb.append(mat_comb)
                off += w
            comb_ys.append(round_comb)

        # batched Merkle verification: all queries of a round-tree in one
        # lane-parallel hash chain
        idx_arr = np.asarray(indices, dtype=np.int64)
        for ri, ((root, points), rdims) in enumerate(zip(rounds, dims)):
            lde_dims = [(h << self.log_blowup, w) for (h, w) in rdims]
            tree_log_max = max(int(h).bit_length() - 1 for (h, _w) in lde_dims)
            rows_by_mat = [
                np.stack([
                    np.asarray(qp.input_openings[ri].opened_rows[mi],
                               dtype=np.uint32)
                    for qp in proof.query_proofs
                ])
                for mi in range(len(rdims))
            ]
            paths = np.stack([
                np.asarray(qp.input_openings[ri].path, dtype=np.uint32)
                for qp in proof.query_proofs
            ])
            if not verify_openings(
                root, lde_dims, idx_arr >> (log_max - tree_log_max),
                rows_by_mat, paths, hasher=config.hasher,
            ):
                raise FriError(f"bad input opening (round {ri})")

        ros = []
        for qi, idx in enumerate(indices):
            qp = proof.query_proofs[qi]
            ro = {}
            alpha_offset = 0
            for ri, ((root, points), rdims, round_vals) in enumerate(
                zip(rounds, dims, opened_values)
            ):
                opening = qp.input_openings[ri]
                for mi, ((h, w), mat_points) in enumerate(zip(rdims, points)):
                    log_lde = int(h).bit_length() - 1 + self.log_blowup
                    row = opening.opened_rows[mi]
                    mat_idx = idx >> (log_max - log_lde)
                    x = (
                        self.shift
                        * pow(
                            bb.two_adic_generator(log_lde),
                            frim._bitrev_int(mat_idx, log_lde),
                            bb.P,
                        )
                        % bb.P
                    )
                    if (ri, mi) in direct:
                        # commitment side of a direct opening: the
                        # Merkle-verified leaf row must equal the shipped
                        # polynomial evaluated at this query's point
                        coeffs = direct[(ri, mi)]
                        xpow = np.empty(coeffs.shape[0], dtype=np.uint64)
                        acc_x = 1
                        for i in range(coeffs.shape[0]):
                            xpow[i] = acc_x
                            acc_x = acc_x * x % bb.P
                        vals = (
                            (coeffs * xpow[:, None]) % bb.P
                        ).sum(axis=0) % bb.P
                        if not np.array_equal(
                            vals, np.asarray(row, dtype=np.uint64) % bb.P
                        ):
                            raise FriError(
                                "direct-opened polynomial disagrees with "
                                "committed row"
                            )
                        continue
                    # comb_row = Σ_c α^{off+c}·row_c, vectorized: per-term
                    # products < p² < 2^62 fit u64; reduce before the sum
                    ap = apows_np[alpha_offset:alpha_offset + w]
                    terms = ap * np.asarray(row, dtype=np.uint64)[:, None] % bb.P
                    comb_row = tuple(
                        int(v) for v in terms.sum(axis=0) % bb.P
                    )
                    acc = ro.get(log_lde, extf.E_ZERO)
                    for z, comb_y in zip(mat_points, comb_ys[ri][mi]):
                        num = extf.e_sub(comb_row, comb_y)
                        den = extf.e_sub(extf.e_from_base(x), z)
                        acc = extf.e_add(acc, extf.e_mul(num, extf.e_inv(den)))
                    ro[log_lde] = acc
                    alpha_offset += w
            ros.append(ro)
        frim.verify_queries_fold(
            [qp.fri_query for qp in proof.query_proofs], proof.fri, config,
            betas, indices, log_max, self.shift, ros,
        )


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _ext_powers_device(z: tuple, n: int):
    """[n, 5] monty powers of ext scalar z via log-doubling."""
    arr = np.zeros((1, 5), dtype=np.uint32)
    arr[0, 0] = 1
    arr_m = bb.to_monty(asarray(arr))
    xp = xp_of(arr_m)
    length = 1
    while length < n:
        step = extf.e_exp(z, length)
        step_m = bb.to_monty(xp.asarray(np.array(step, dtype=np.uint32)))
        nxt = extf.ext_mul(arr_m, xp.broadcast_to(step_m[None, :], arr_m.shape))
        arr_m = xp.concatenate([arr_m, nxt], axis=0)
        length *= 2
    return arr_m[:n]


def _alpha_combine(lde_rev, apows_m):
    """sum_c alpha^c * column_c: [H, w] base monty x [w, 5] ext -> [H, 5]."""
    out = []
    for d in range(5):
        prod = bb.mul(lde_rev, apows_m[None, :, d])  # [H, w]
        out.append(nttm._mod_sum(prod, axis=1))
    return xp_of(lde_rev).stack(out, axis=-1)


import functools


@functools.lru_cache(maxsize=None)
def _coset_points_bitrev(log_n: int, shift: int) -> np.ndarray:
    from ..poly.domain import coset_points

    pts = coset_points(log_n, shift)
    return pts[bitrev_indices(log_n)]
