"""KATs + stream pins for the reconstructed reference RNG chain
(crypto/p3_rng.py): SipHash core vs the official SipHash-2-4 vectors,
Lcg128Xsl64 vs the official PCG64 reference sequence, and cross-round
pins of the (unverifiable) SipRng-seeded "validia seed" stream.

Reference: `/root/reference/basic/src/bin/valida.rs:364-366`.
"""

import numpy as np

from valida_tpu.crypto.p3_rng import (
    Pcg64, SipHasher, coset_mds_matrix, poseidon_round_constants,
    sample_babybear, seeder_pcg64,
)
from valida_tpu.field import babybear as bb


def test_siphash24_official_vectors():
    k0 = int.from_bytes(bytes(range(8)), "little")
    k1 = int.from_bytes(bytes(range(8, 16)), "little")
    expected = {
        0: 0x726FDB47DD0E0E31,
        1: 0x74F839C593DC67FD,
        8: 0x93F5F5799A932462,
        15: 0xA129CA6149BE45E5,
    }
    for n, want in expected.items():
        h = SipHasher(k0, k1, c_rounds=2, d_rounds=4)
        h.write(bytes(range(n)))
        assert h.finish() == want, n


def test_pcg64_official_reference_sequence():
    # pcg64 demo (O'Neill reference implementation), seed 42, stream 54 —
    # the vector rand_pcg 0.3.1 pins in test_lcg128xsl64_true_values.
    rng = Pcg64.new(42, 54)
    got = [rng.next_u64() for _ in range(6)]
    assert got == [
        0x86B1DA1D72062B68,
        0x1304AA46C9853D39,
        0xA3670E9E0DD50358,
        0xF9090E529A7DAE00,
        0xC85B9FD837996F2C,
        0x606121F8E3919196,
    ]


def test_pcg64_from_seed_roundtrip():
    # from_seed reads state/increment as LE u128s and forces increment odd
    seed = bytes(range(32))
    rng = Pcg64.from_seed(seed)
    rng2 = Pcg64(int.from_bytes(seed[:16], "little"),
                 int.from_bytes(seed[16:], "little") | 1)
    assert [rng.next_u64() for _ in range(4)] == [
        rng2.next_u64() for _ in range(4)
    ]


def test_validia_seed_stream_pins():
    """Cross-round stability pin of the reconstructed stream (the SipRng
    conversion is unverifiable here; these values must not drift)."""
    rng = seeder_pcg64("validia seed")
    first = rng.next_u64()
    rng = seeder_pcg64("validia seed")
    raw = [sample_babybear(rng) for _ in range(4)]
    assert first == 0xAAC53993FEE55744
    assert raw == [354226436, 1277256803, 512324674, 227256118]
    assert all(0 <= x < bb.P for x in raw)


def test_round_constants_interpretations():
    raw = poseidon_round_constants(8, interpret="canonical")
    monty = poseidon_round_constants(8, interpret="monty")
    rinv = pow(1 << 32, bb.P - 2, bb.P)
    assert monty == [x * rinv % bb.P for x in raw]
    # deterministic across calls
    assert raw == poseidon_round_constants(8, interpret="canonical")


def test_coset_mds_is_mds_and_reed_solomon():
    """The matrix must be the RS coset-evaluation map: for input =
    evaluations of a degree<16 polynomial f over H, output = 16 * f(31*h)
    for h in H."""
    W = 16
    M = np.array(coset_mds_matrix(W), dtype=object)
    w = bb.two_adic_generator(4)
    s = bb.GENERATOR
    rng = np.random.default_rng(7)
    coeffs = [int(c) for c in rng.integers(0, bb.P, size=W)]

    def evalpoly(x):
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + c) % bb.P
        return acc

    evals = [evalpoly(pow(w, j, bb.P)) for j in range(W)]
    got = [
        sum(int(M[m][j]) * evals[j] for j in range(W)) % bb.P
        for m in range(W)
    ]
    want = [W * evalpoly(s * pow(w, m, bb.P) % bb.P) % bb.P
            for m in range(W)]
    assert got == want
    # invertibility (necessary for MDS): det != 0 via gaussian elim mod p
    A = [[int(x) for x in row] for row in M]
    n = W
    det = 1
    for col in range(n):
        piv = next((r for r in range(col, n) if A[r][col]), None)
        assert piv is not None, "singular"
        if piv != col:
            A[col], A[piv] = A[piv], A[col]
            det = (-det) % bb.P
        det = det * A[col][col] % bb.P
        inv = pow(A[col][col], bb.P - 2, bb.P)
        for r in range(col + 1, n):
            f = A[r][col] * inv % bb.P
            if f:
                for c in range(col, n):
                    A[r][c] = (A[r][c] - f * A[col][c]) % bb.P
    assert det != 0


def test_poseidon_p3rng_param_set_builds_and_permutes():
    """The flag-selected parameter set must produce a working permutation
    (host/device equality is covered by the existing poseidon KATs for
    the active set; here we exercise the p3rng build path directly)."""
    from valida_tpu.crypto import poseidon as pos

    rc, mds = pos._build_params("p3rng")
    assert rc.shape == (pos.NUM_ROUNDS, pos.WIDTH)
    assert mds.shape == (pos.WIDTH, pos.WIDTH)
    assert int(rc.max()) < bb.P and int(mds.max()) < bb.P
    # run a permutation with these params via a temporary swap
    old = pos.ROUND_CONSTANTS, pos.MDS
    try:
        pos.ROUND_CONSTANTS, pos.MDS = rc, mds
        out = pos.permute_host(list(range(16)))
        assert out.shape == (16,)
        assert all(0 <= int(x) < bb.P for x in out)
        out2 = pos.permute_host(list(range(16)))
        np.testing.assert_array_equal(out, out2)
    finally:
        pos.ROUND_CONSTANTS, pos.MDS = old


# -- the 8 candidate reference streams (VERDICT r2 #5) ----------------------
# 2 (sample interpretation) x 2 (SipRng conversion marker) x 2 (CosetMds
# orientation).  Each stream is pinned so that, once the true Plonky3
# output can be compared (rustc + crate sources), matching it is a variant
# flip (`--poseidon p3rng:<variant>`), not a code change.

P3RNG_RC_KAT = {
    # variant -> first 4 round constants (canonical)
    "monty-ee": (1595564039, 219175154, 1647284610, 522619295),
    "monty-ff": (481353737, 792520102, 290206328, 985368088),
    "canonical-ee": (354226436, 1277256803, 512324674, 227256118),
    "canonical-ff": (1523248861, 188338642, 1528376816, 1387542342),
}
MDS_KAT = {
    # orientation -> (row0[:4], M[1][0])
    "mj": ((1931644774, 1440541611, 1993397174, 1154163260), 1856233333),
    "jm": ((1931644774, 1856233333, 1058629850, 478008654), 1440541611),
}


def test_p3rng_all_variants_pinned():
    from valida_tpu.crypto.p3_rng import (
        P3RNG_VARIANTS, P3RNG_DEFAULT_VARIANT, p3rng_params,
    )

    assert len(P3RNG_VARIANTS) == 8
    assert P3RNG_DEFAULT_VARIANT in P3RNG_VARIANTS
    for variant in P3RNG_VARIANTS:
        interp, sip, mds = variant.split("-")
        rc, mat = p3rng_params(8, variant)
        assert tuple(rc[:4]) == P3RNG_RC_KAT[f"{interp}-{sip}"], variant
        row0, m10 = MDS_KAT[mds]
        assert tuple(mat[0][:4]) == row0, variant
        assert mat[1][0] == m10, variant
        assert all(0 <= x < bb.P for x in rc)


def test_p3rng_variant_selectable_via_param_set():
    from valida_tpu.crypto import poseidon as pos

    rc_a, mds_a = pos._build_params("p3rng:canonical-ff-jm")
    rc_b, mds_b = pos._build_params("p3rng")
    assert tuple(int(x) for x in rc_a[0][:4]) == P3RNG_RC_KAT["canonical-ff"]
    assert tuple(int(x) for x in rc_b[0][:4]) == P3RNG_RC_KAT["monty-ee"]
    assert int(mds_a[0][1]) != int(mds_b[0][1])  # transposed orientation


def test_p3rng_mds_orientations_are_transposes():
    from valida_tpu.crypto.p3_rng import coset_mds_matrix

    a = coset_mds_matrix(16, "mj")
    b = coset_mds_matrix(16, "jm")
    assert a == [list(r) for r in zip(*b)]
