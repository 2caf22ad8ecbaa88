"""Unit tests of the scalar primitives against reference-derived values."""

import numpy as np
import pytest

from supersampler_tpu.core import scalar as sc

# XXHash64(8 LE bytes, seed 1312) values produced by the reference's
# vendored implementation (include/xxhash64.h) — generated via a probe
# linked against the reference header.
REF_HASHES = {
    0: 2089024008308347993,
    1: 4806500305925943593,
    2: 15122316322305776385,
    3: 15217941700051678242,
    189: 796311527291385,
    1312: 309460215063019196,
    12345678: 14771125831824293293,
    4294967295: 13239754955832367860,
    1073741823: 8162471337011206963,
    987654321012345: 2612672842243063497,
}

# Thresholds printed by the reference's own compiled compute_threshold
# (Subsampler::selection_threshold, glibc powl at runtime).
REF_THRESHOLDS = [
    (31, 11, 1000.0, 878834950402620),
    (31, 11, 10.0, 92318620588483954),
    (31, 11, 2.0, 598932972098291232),
    (15, 5, 50.0, 33848377489998286),
    (21, 7, 5.0, 272387061669231132),
    (63, 15, 10.0, 39621845525636810),
    (31, 11, 1000000.0, 878416802756),
    (31, 11, 1.5, 940230584660068300),
]


def test_xxhash64_reference_values():
    for x, h in REF_HASHES.items():
        assert sc.xxhash64_u64(x) == h


def test_threshold_reference_values():
    for k, m, s, t in REF_THRESHOLDS:
        assert sc.compute_threshold(k, m, s) == t, (k, m, s)


def test_threshold_select_all():
    assert sc.compute_threshold(31, 11, 1.0) == sc.MASK64
    assert sc.compute_threshold(31, 11, 0.5) == sc.MASK64


def test_nuc_codes():
    assert [sc.nuc2int(c) for c in "ACTG"] == [0, 1, 2, 3]
    assert [sc.nuc2int(c) for c in "ACGT"] == [0, 1, 3, 2]
    assert [sc.nuc2intrc(c) for c in "ACTG"] == [2, 3, 0, 1]


def test_str2num_roundtrip():
    rng = np.random.default_rng(7)
    for n in [1, 5, 11, 31, 63]:
        for _ in range(20):
            s = "".join(rng.choice(list("ACGT"), n))
            assert sc.num2str(sc.str2num(s), n) == s


def test_revcomp_involution_and_string_agreement():
    rng = np.random.default_rng(8)
    for n in [5, 11, 31, 63]:
        for _ in range(20):
            s = "".join(rng.choice(list("ACGT"), n))
            x = sc.str2num(s)
            rc = sc.revcomp_code(x, n)
            assert sc.revcomp_code(rc, n) == x
            assert sc.num2str(rc, n) == sc.revcomp_str(s)


def test_canonize_matches_min():
    rng = np.random.default_rng(9)
    for n in [11, 31]:
        for _ in range(50):
            s = "".join(rng.choice(list("ACGT"), n))
            x = sc.str2num(s)
            assert sc.canonize(x, n) == min(x, sc.revcomp_code(x, n))


def test_str_compressor_roundtrip():
    rng = np.random.default_rng(10)
    for n in [0, 1, 2, 3, 4, 5, 7, 8, 40, 41, 99, 100]:
        s = "".join(rng.choice(list("ACGT"), n)) if n else ""
        assert sc.str_decompressor(sc.str_compressor(s)) == s


def test_str_compressor_layout():
    # 4 nucleotides pack big-endian-within-byte after a mod byte.
    out = sc.str_compressor("ACTG")
    assert out == bytes([0, (0 << 6) | (1 << 4) | (2 << 2) | 3])
    # Partial byte is left-shifted one extra time.
    out = sc.str_compressor("C")
    assert out == bytes([1, 1 << 2])


def test_int_to_string():
    assert sc.int_to_string(999) == "999"
    assert sc.int_to_string(1000) == "1,000"
    assert sc.int_to_string(1002003) == "1,002,003"
    assert sc.int_to_string(1000000) == "1,000,000"
    assert sc.int_to_string(12) == "12"
    assert sc.int_to_string(1023) == "1,023"
    assert sc.int_to_string(1003) == "1,003"


def test_format_g6_matches_cpp_ostream():
    assert sc.format_g6(0.5) == "0.5"
    assert sc.format_g6(1 / 3) == "0.333333"
    assert sc.format_g6(1e-7) == "1e-07"
    assert sc.format_g6(0.123456789, 3) == "0.123"
    assert sc.format_g6(1.0) == "1"


def test_parse_rate_arg_is_float32():
    assert sc.parse_rate_arg("1000") == 1000.0
    assert sc.parse_rate_arg("3.3") == float(np.float32("3.3"))
