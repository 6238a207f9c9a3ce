"""Distance spectrum + union bounds (harness/bounds.py) — validated
against published spectra and a brute-force enumeration, the same
anchoring role the reference's MATLAB distspec/bercoding pair plays
(berCurveCoded.m:46-51)."""

import numpy as np
import pytest

from convolutionalencdec_tpu.harness.bounds import (
    bound_curve, distance_spectrum, union_bound_ber)
from convolutionalencdec_tpu.params import (
    NASA_K7, REF_K7, TOY_K3, CodeSpec)


def test_nasa_k7_spectrum_matches_published():
    """(133,171) K=7: the Odenwalder/Proakis table, exact."""
    dfree, a, c = distance_spectrum(NASA_K7, 20)
    assert dfree == 10
    assert [int(a[d]) for d in (10, 12, 14, 16, 18, 20)] == \
        [11, 38, 193, 1331, 7275, 40406]
    assert [int(c[d]) for d in (10, 12, 14, 16, 18, 20)] == \
        [36, 211, 1404, 11633, 77433, 502690]
    assert all(int(a[d]) == 0 for d in range(20) if d % 2)  # odd-d free


def test_classic_57_spectrum():
    """K=3 (5,7): dfree 5, a_d = 2^(d-5), c_d = 1, 4, 12, 32, 80."""
    spec = CodeSpec(K=3, g=(0o5, 0o7))
    dfree, a, c = distance_spectrum(spec, 9)
    assert dfree == 5
    assert [int(a[d]) for d in range(5, 10)] == [1, 2, 4, 8, 16]
    assert [int(c[d]) for d in range(5, 10)] == [1, 4, 12, 32, 80]


def _brute_min_weight(spec, max_len=10):
    """Min Hamming weight over all nonzero terminated codewords —
    equals dfree for a non-catastrophic code once max_len covers the
    shortest error event."""
    from convolutionalencdec_tpu.ops.encode import encode_bits_np
    best = None
    for m in range(1, max_len + 1):
        for msg in range(1, 1 << m):
            bits = np.array([(msg >> i) & 1 for i in range(m)], np.uint8)
            if bits[0] == 0:
                continue                      # canonical: starts with 1
            segs = encode_bits_np(spec, bits)
            w = sum(bin(int(s)).count("1") for s in segs)
            best = w if best is None else min(best, w)
    return best


def test_toy_k3_spectrum_vs_brute_force():
    """The hand-traced (7,6) toy code has no published table — check
    dfree against exhaustive codeword enumeration."""
    dfree, a, _ = distance_spectrum(TOY_K3, 12)
    assert dfree == _brute_min_weight(TOY_K3)
    assert int(a[dfree]) >= 1


def test_ref_k7_spectrum_sane():
    """(113,171): weaker than (133,171) — the generator-discrepancy
    resolution (SURVEY §4) made quantitative: dfree 9 < 10."""
    dfree, a, _ = distance_spectrum(REF_K7, 14)
    assert dfree == 9
    assert int(a[9]) > 0


def test_catastrophic_code_rejected():
    # g share the factor (1 + D): the classic catastrophic case —
    # a zero-distance loop keeps paths in flight forever.
    with pytest.raises(ValueError, match="catastrophic"):
        distance_spectrum(CodeSpec(K=3, g=(0o6, 0o3)), 10)


def test_bounds_upper_bound_measured_hard():
    """The hard bound must sit ABOVE the measured kernel BER
    (RESULTS.md Eb/N0 table) and converge toward it with SNR."""
    measured = {4.0: 5.01e-3, 5.0: 5.00e-4, 6.0: 3.52e-5}
    for e, m in measured.items():
        b = union_bound_ber(NASA_K7, e, "hard")
        assert b >= m, (e, b, m)
        assert b <= 30 * m, (e, b, m)         # and not uselessly loose


def test_bounds_monotone_and_soft_gain():
    rows = bound_curve(NASA_K7, [5.0, 6.0, 7.0, 8.0, 9.0, 10.0])
    hard = [r["hard_ber_bound"] for r in rows]
    soft = [r["soft_ber_bound"] for r in rows]
    assert all(h2 < h1 for h1, h2 in zip(hard, hard[1:]))
    assert all(s2 < s1 for s1, s2 in zip(soft, soft[1:]))
    assert all(s < h for h, s in zip(hard, soft))   # ~2 dB coding gain
