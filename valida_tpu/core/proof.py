"""Proof objects (mirrors `machine/src/proof.rs:13-44`) + CBOR codec.

All values are host-side canonical ints / numpy arrays so proofs are
serializable and verifiable without a device.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Commitments:
    preprocessed: np.ndarray  # 8 x u32 root (extension over the reference,
    #                           which re-commits preprocessed on verify)
    main_trace: np.ndarray
    perm_trace: np.ndarray
    quotient_chunks: np.ndarray


@dataclasses.dataclass
class OpenedValues:
    preprocessed_local: list  # [ext tuple] per column ([] if no prep trace)
    preprocessed_next: list
    trace_local: list
    trace_next: list
    permutation_local: list
    permutation_next: list
    quotient_chunks: list


@dataclasses.dataclass
class ChipProof:
    log_degree: int
    opened_values: OpenedValues
    cumulative_sum: tuple  # ext


@dataclasses.dataclass
class MachineProof:
    commitments: Commitments
    opening_proof: object  # commit.pcs.PcsProof
    chip_proofs: list  # [ChipProof]
