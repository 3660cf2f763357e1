"""Golden proof-interchange fixture: the CBOR byte format must be stable
across rounds (VERDICT r1 #9).

`tests/fixtures/mini_proof_v1.cbor` is a committed proof of the seed-3
48-pair MiniMachine under (num_queries=3, pow_bits=1).  The schema is the
reference `MachineProof` (`machine/src/proof.rs:13-44`) plus one
deliberate delta: a `preprocessed` commitment in `Commitments` (the
reference omits preprocessed openings entirely — `derive/src/lib.rs:
385-386` — which is the soundness gap documented in docs/deviations.md
§"Program bus enabled").

If a change breaks these assertions it changed the proof stream or the
encoding; that must be a conscious, documented decision (update the
fixture + docs/proof-format notes in tooling/serde.py).
"""

import os

from valida_tpu.core.config import default_config
from valida_tpu.machine.examples import random_mini_machine
from valida_tpu.machine.prover import prove
from valida_tpu.tooling.serde import (
    cbor_dumps, cbor_loads, proof_from_obj, proof_to_obj,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "mini_proof_v1.cbor")


def _machine_and_config():
    return (random_mini_machine(48, seed=3),
            default_config(num_queries=3, proof_of_work_bits=1))


def test_fixture_deserializes_and_verifies():
    blob = open(FIXTURE, "rb").read()
    proof = proof_from_obj(cbor_loads(blob))
    machine, config = _machine_and_config()
    machine.verify(config, proof)


def test_fixture_bytes_are_reproduced():
    """Byte-stability: proving the same machine today must reproduce the
    committed bytes exactly (deterministic transcript + stable codec)."""
    machine, config = _machine_and_config()
    proof = prove(machine, config)
    blob = cbor_dumps(proof_to_obj(proof))
    assert blob == open(FIXTURE, "rb").read()


def test_fixture_schema_shape():
    """Top-level schema mirrors machine/src/proof.rs:13-44 plus the
    `preprocessed` commitment delta."""
    obj = cbor_loads(open(FIXTURE, "rb").read())
    assert set(obj.keys()) == {"meta", "commitments", "fri", "pcs_queries",
                               "chip_proofs"}
    # transcript-configuration header (ADVICE r4): names the poseidon
    # scheme so a mismatched verifier fails actionably
    assert obj["meta"]["v"] == 1 and "poseidon" in obj["meta"]
    assert set(obj["commitments"].keys()) == {
        "preprocessed",  # DELTA vs reference Commitments (proof.rs:21-26)
        "main_trace", "perm_trace", "quotient_chunks",
    }
    for cp in obj["chip_proofs"]:
        assert set(cp.keys()) == {"log_degree", "opened",
                                  "cumulative_sum"}
        ov = cp["opened"]
        assert set(ov.keys()) == {
            "preprocessed_local", "preprocessed_next",
            "trace_local", "trace_next",
            "permutation_local", "permutation_next",
            "quotient_chunks",
        }
