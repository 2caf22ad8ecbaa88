"""C host finisher (csrc/spsp_finish.c) vs the Python oracle: bytes,
counters, uint8 count wrap, abundance filtering, both k-mer limb
layouts, repeats and multi-record files."""

import numpy as np
import pytest

from supersampler_tpu.native import NativeFinisher
from supersampler_tpu.oracle.subsampler import OracleSubsampler
from supersampler_tpu.sketch.pipeline import TpuSubsampler

pytestmark = pytest.mark.skipif(not NativeFinisher.available(),
                                reason="native library unavailable")


class NativeSub(TpuSubsampler):
    native_finisher = True
    device_dedup = False


def _rand(rng, n):
    return "".join("ACGT"[c] for c in rng.integers(0, 4, n))


@pytest.mark.parametrize("L,s,seed,k,m,a", [
    (20000, 100.0, 0, 31, 11, 1),
    (12000, 2.0, 1, 31, 11, 1),     # dense selection
    (8000, 5.0, 2, 63, 15, 1),      # hi-limb k-mers
    (8000, 5.0, 3, 15, 5, 1),       # lo-only k-mers
    (10000, 2.0, 4, 31, 11, 2),     # abundance filter
    (6000, 3.0, 5, 21, 7, 3),
])
def test_native_matches_oracle(L, s, seed, k, m, a):
    rng = np.random.default_rng(seed)
    unit = _rand(rng, 73)
    ref = (unit * 10) + _rand(rng, L) + (unit * 5)
    o = OracleSubsampler(k=k, m=m, s=s, abundance=a)
    o.scan_sequence(ref)
    t = NativeSub(k=k, m=m, s=s, abundance=a)
    t.scan_sequence(ref)
    assert t._nf_obj is not None
    assert t.serialize() == o.serialize()
    for attr in ("seen_kmers_at_reconstruction",
                 "seen_superkmers_at_reconstruction",
                 "seen_max_superkmers_at_reconstruction",
                 "seen_unique_kmers_at_reconstruction",
                 "total_kmer_number_at_reconstruction",
                 "actual_minimizer_number", "nb_mmer_selected",
                 "selected_kmer_number", "count_maximal_skmer"):
        assert getattr(t, attr) == getattr(o, attr), attr


def test_native_count_wrap():
    """>=256 occurrences of a k-mer must wrap the uint8 count exactly
    like the reference's kmer_info.count."""
    rng = np.random.default_rng(9)
    unit = _rand(rng, 61)
    ref = unit * 300 + _rand(rng, 400)
    o = OracleSubsampler(k=31, m=11, s=1.5)
    o.scan_sequence(ref)
    t = NativeSub(k=31, m=11, s=1.5)
    t.scan_sequence(ref)
    assert t.serialize() == o.serialize()


def test_native_multi_record_file(tmp_path):
    rng = np.random.default_rng(11)
    seqs = [_rand(rng, 7000), _rand(rng, 45), _rand(rng, 3000)]
    fa = tmp_path / "m.fa"
    fa.write_text("".join(f">r{i}\n{s}\n" for i, s in enumerate(seqs)))
    o = OracleSubsampler(k=31, m=11, s=80.0)
    want = o.sketch_file(str(fa))
    t = NativeSub(k=31, m=11, s=80.0)
    got = t.sketch_file(str(fa))
    assert got == want


def test_native_clean_codes_and_pack():
    """csrc/spsp_io.c clean+pack == the Python translate/fold path."""
    from supersampler_tpu.io.fasta import clean_dna
    from supersampler_tpu.native import (clean_codes_native,
                                         pack_halo_native)
    from supersampler_tpu.ops.minimizer import pack_ref_2bit

    raw = (b">x\nACGTnnNNacgtXYZ\nTTTgggCCCaaa\r\n" * 37
           + b"A\x00C*G-T")
    cc = clean_codes_native(raw)
    if cc is None:
        import pytest
        pytest.skip("native library unavailable")
    ref, codes = cc
    want_ref = clean_dna(raw)
    assert ref == want_ref
    lut = np.full(256, 255, np.uint8)
    for ch, v in zip(b"ACTG", range(4)):
        lut[ch] = v
    assert np.array_equal(codes, lut[np.frombuffer(ref, np.uint8)])
    for halo, padded in ((0, 2048), (128, 4096)):
        got = pack_halo_native(codes, padded, halo)
        want = pack_ref_2bit(ref, padded, halo)
        assert np.array_equal(got, want), (halo, padded)
