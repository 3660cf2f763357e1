"""Prover configuration (mirrors `machine/src/config.rs` + the CLI's
concrete instantiation at `basic/src/bin/valida.rs:356-398`)."""

from __future__ import annotations

import dataclasses

from ..commit import FriConfig, TwoAdicFriPcs
from ..crypto.challenger import DuplexChallenger
from ..field import babybear as bb


@dataclasses.dataclass
class StarkConfig:
    pcs: TwoAdicFriPcs
    debug_checks: bool = True  # row-wise constraint + bus-balance checking

    def challenger(self) -> DuplexChallenger:
        return DuplexChallenger()


def default_config(num_queries: int = 40, proof_of_work_bits: int = 8,
                   log_blowup: int = 1, debug_checks: bool = True,
                   hasher: str = "keccak", log_final: int = 0) -> StarkConfig:
    """The reference CLI's parameters: blowup 2, 40 queries, 8-bit PoW.

    hasher selects the Merkle MMCS hash: "keccak" (reference parity) or
    "poseidon2" (arithmetic-friendly, usually faster on TPU).  log_final > 0
    stops FRI folding early and ships a 2^log_final-coefficient final
    polynomial (fewer layers / Merkle paths; same soundness regime)."""
    fri = FriConfig(
        log_blowup=log_blowup,
        num_queries=num_queries,
        proof_of_work_bits=proof_of_work_bits,
        hasher=hasher,
        log_final=log_final,
    )
    return StarkConfig(pcs=TwoAdicFriPcs(fri, coset_shift=bb.GENERATOR),
                       debug_checks=debug_checks)


def test_config(debug_checks: bool = True) -> StarkConfig:
    """Reduced-security config for fast tests."""
    return default_config(num_queries=4, proof_of_work_bits=2,
                          debug_checks=debug_checks)


test_config.__test__ = False  # not a pytest test when star-imported
