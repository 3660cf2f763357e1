"""FRI early-stop (`log_final`): fold until the layer holds
2^(log_blowup + log_final) values and ship the final polynomial's
coefficients instead of folding to a constant.

The reference's p3-fri folds to a single constant
(`/root/reference/basic/src/bin/valida.rs:385-390` — blowup 2, 40 queries);
log_final=0 reproduces that exactly, while log_final>0 trades a short final
polynomial for log_final fewer commit-phase layers (fewer Merkle trees,
query paths and sequential fold rounds — the production-TPU default for
deep traces).
"""

import dataclasses

import numpy as np
import pytest

from valida_tpu.core.config import default_config
from valida_tpu.commit.fri import FriError, final_poly_coeffs, fri_log_stop
from valida_tpu.machine.examples import MiniMachine, random_mini_machine
from valida_tpu.machine import VerificationError
from valida_tpu.tooling.serde import serialize_proof, deserialize_proof

PAIRS = [(1, 2), (3, 4), (15, 0), (7, 7), (2, 2), (9, 1), (0, 0), (8, 8),
         (5, 5), (11, 2), (3, 3), (14, 1), (6, 9), (2, 13), (1, 1), (4, 4),
         (10, 3), (12, 2), (7, 0), (15, 15)]


def _cfg(log_final):
    return default_config(num_queries=3, proof_of_work_bits=1,
                          debug_checks=False, log_final=log_final)


def _machine():
    return MiniMachine(PAIRS)


def test_log_final_prove_verify_roundtrip():
    m = _machine()
    for log_final in (0, 1, 2):
        config = _cfg(log_final)
        proof = m.prove(config)
        m.verify(config, proof)


def test_log_final_reduces_layers_and_matches_formats():
    m = _machine()
    p0 = m.prove(_cfg(0))
    p2 = m.prove(_cfg(2))
    assert (
        len(p0.opening_proof.fri.commit_phase_commits)
        - len(p2.opening_proof.fri.commit_phase_commits)
        == 2
    )
    # log_final == 0 keeps the reference's scalar format
    assert isinstance(p0.opening_proof.fri.final_poly[0], int)
    # log_final == 2 ships 4 ext coefficients
    assert len(final_poly_coeffs(p2.opening_proof.fri.final_poly)) == 4


def test_log_final_beyond_min_height_goes_direct():
    # the range table is 16 rows (LDE height 32 = 2^5); the sender trace is
    # 32 rows (LDE 64 = 2^6).  With threshold = log_blowup + 6 = 7, every
    # sub-maximal matrix is opened directly and FRI degenerates to zero
    # fold layers with a fully-shipped final polynomial.
    m = _machine()
    config = _cfg(6)
    proof = m.prove(config)
    m.verify(config, proof)
    assert len(proof.opening_proof.fri.commit_phase_commits) == 0
    assert len(proof.opening_proof.direct_polys) > 0


def test_direct_openings_ship_and_verify():
    # log_final = 3 -> threshold 4: the range table (LDE 2^5) still folds,
    # but its preprocessed counterpart etc. — count whatever went direct
    # and make tampering any entry a verification failure
    m = _machine()
    config = _cfg(4)  # threshold 5: range-table mats (LDE 2^5) go direct
    proof = m.prove(config)
    assert len(proof.opening_proof.direct_polys) > 0
    m.verify(config, proof)
    bad = proof.opening_proof.direct_polys[0].copy()
    bad[0, 0] = (int(bad[0, 0]) + 1) % 2013265921
    proof.opening_proof.direct_polys[0] = bad
    with pytest.raises((VerificationError, FriError)):
        m.verify(config, proof)


def test_direct_openings_cbor_roundtrip():
    m = _machine()
    config = _cfg(4)
    proof = m.prove(config)
    back = deserialize_proof(serialize_proof(proof))
    assert len(back.opening_proof.direct_polys) == \
        len(proof.opening_proof.direct_polys)
    for a, b in zip(back.opening_proof.direct_polys,
                    proof.opening_proof.direct_polys):
        assert np.array_equal(a, b)
    m.verify(config, back)


def test_log_final_tampered_final_poly_rejected():
    m = _machine()
    config = _cfg(2)
    proof = m.prove(config)
    fp = [list(c) for c in proof.opening_proof.fri.final_poly]
    fp[1][0] = (fp[1][0] + 1) % 2013265921
    proof.opening_proof.fri.final_poly = tuple(tuple(c) for c in fp)
    with pytest.raises((VerificationError, FriError)):
        m.verify(config, proof)


def test_log_final_wrong_layer_count_rejected():
    m = _machine()
    c2 = _cfg(2)
    proof = m.prove(c2)
    # verifying a log_final=2 proof under a log_final=0 config must fail
    # with a typed verification error (layer-count / final-poly shape
    # checks), never an untyped crash like IndexError
    with pytest.raises((VerificationError, FriError)):
        m.verify(_cfg(0), proof)


def test_log_final_cbor_roundtrip():
    m = _machine()
    config = _cfg(2)
    proof = m.prove(config)
    blob = serialize_proof(proof)
    back = deserialize_proof(blob)
    assert back.opening_proof.fri.final_poly == proof.opening_proof.fri.final_poly
    m.verify(config, back)


def test_overlength_final_poly_rejected():
    """Soundness-critical (ADVICE r2 high #1): a final polynomial with MORE
    than 2^(log_stop - log_blowup) coefficients could interpolate the final
    fold layer of arbitrary non-low-degree data; the verifier must enforce
    the exact count."""
    m = _machine()
    config = _cfg(2)
    proof = m.prove(config)
    fp = list(proof.opening_proof.fri.final_poly)
    # even a zero pad (which evaluates identically) must be rejected —
    # the exact coefficient count is part of the soundness argument
    fp.append((0, 0, 0, 0, 0))
    proof.opening_proof.fri.final_poly = tuple(fp)
    with pytest.raises((VerificationError, FriError)):
        m.verify(config, proof)


def test_scalar_final_poly_enforced_at_log_final_zero():
    """log_final == 0 must enforce the reference scalar format: a 1-element
    list that decodes to the same coefficient is still rejected."""
    m = _machine()
    config = _cfg(0)
    proof = m.prove(config)
    scalar = tuple(proof.opening_proof.fri.final_poly)
    proof.opening_proof.fri.final_poly = (scalar,)  # list-of-one format
    with pytest.raises((VerificationError, FriError)):
        m.verify(config, proof)


def test_direct_polys_are_transcript_bound():
    """ADVICE r2 high #2: direct-opened coefficients must be observed by
    the challenger before alpha / query sampling, so a prover cannot pick
    them after seeing the queries."""
    from valida_tpu.commit.pcs import observe_direct_polys
    from valida_tpu.core.config import default_config as _dc

    c1 = _dc().challenger()
    c2 = _dc().challenger()
    mat_a = np.arange(12, dtype=np.uint32).reshape(4, 3)
    mat_b = mat_a.copy()
    mat_b[0, 0] += 1
    observe_direct_polys(c1, [mat_a])
    observe_direct_polys(c2, [mat_b])
    assert c1.sample() != c2.sample()


def test_tampered_direct_poly_rejected():
    m = _machine()
    config = _cfg(2)
    proof = m.prove(config)
    if not proof.opening_proof.direct_polys:
        pytest.skip("config produced no direct-opened matrices")
    dp = np.array(proof.opening_proof.direct_polys[0], dtype=np.uint32)
    dp[0, 0] = (int(dp[0, 0]) + 1) % 2013265921
    proof.opening_proof.direct_polys[0] = dp
    with pytest.raises((VerificationError, FriError)):
        m.verify(config, proof)
