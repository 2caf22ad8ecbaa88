"""Chunked/streaming comparison: bounded memory + shard resume.

compare_sketches_chunked must reproduce compare_sketches exactly
(scores, denominators, CSVs) while holding only one minimizer-range
chunk at a time, and a killed run must resume from its manifest to
byte-identical CSVs. Reference memory model: the streaming N-way merge
holds only open buckets (/root/reference/Comparator.cpp:39-74).
"""

import json
import os
import random

import numpy as np
import pytest

from supersampler_tpu.compare.merge import TpuComparator

_GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "golden")
_FILES = [os.path.join(_GOLD, f"gfam_fam{i}.gz") for i in range(4)]


def _full(engine="numpy", query=None):
    c = TpuComparator(engine=engine)
    c.files_names = list(_FILES)
    c.compare_sketches(query if query is not None else len(_FILES))
    return c


@pytest.mark.parametrize("engine", ["numpy", "device"])
@pytest.mark.parametrize("chunk_bytes", [1 << 10, 1 << 14, 1 << 30])
def test_chunked_equals_full(engine, chunk_bytes):
    ref = _full(engine)
    c = TpuComparator(engine=engine)
    c.files_names = list(_FILES)
    assert c.compare_sketches_chunked(len(_FILES),
                                      chunk_bytes=chunk_bytes)
    assert c.score_A == ref.score_A
    assert c.nb_kmer_seen_infile == ref.nb_kmer_seen_infile
    assert c.containment_csv() == ref.containment_csv()
    assert c.jaccard_csv() == ref.jaccard_csv()
    if chunk_bytes == 1 << 10:
        # bounded memory really engaged: many small chunks
        assert c.max_chunk_pairs < sum(ref.nb_kmer_seen_infile)


def test_chunked_query_mode():
    ref = _full(query=2)
    c = TpuComparator()
    c.files_names = list(_FILES)
    assert c.compare_sketches_chunked(2, chunk_bytes=1 << 12)
    assert c.score_A == ref.score_A
    assert c.containment_csv() == ref.containment_csv()
    assert c.jaccard_csv() == ref.jaccard_csv()


def test_resume_after_kill(tmp_path):
    """Stop after 2 chunks (simulated kill), resume from the manifest,
    and require byte-identical CSVs to the one-shot run."""
    ref = _full()
    manifest = str(tmp_path / "resume.json")
    c1 = TpuComparator()
    c1.files_names = list(_FILES)
    done = c1.compare_sketches_chunked(len(_FILES),
                                       chunk_bytes=1 << 10,
                                       resume_path=manifest,
                                       max_chunks=2)
    assert not done and os.path.exists(manifest)
    man = json.load(open(manifest))
    assert man["chunk_idx"] == 2

    c2 = TpuComparator()
    c2.files_names = list(_FILES)
    assert c2.compare_sketches_chunked(len(_FILES),
                                       chunk_bytes=1 << 10,
                                       resume_path=manifest)
    assert not os.path.exists(manifest)     # completed => removed
    assert c2.score_A == ref.score_A
    assert c2.nb_kmer_seen_infile == ref.nb_kmer_seen_infile
    assert c2.containment_csv() == ref.containment_csv()
    assert c2.jaccard_csv() == ref.jaccard_csv()


def test_resume_manifest_guards_file_list(tmp_path):
    manifest = str(tmp_path / "resume.json")
    c1 = TpuComparator()
    c1.files_names = list(_FILES)
    c1.compare_sketches_chunked(len(_FILES), chunk_bytes=1 << 10,
                                resume_path=manifest, max_chunks=1)
    c2 = TpuComparator()
    c2.files_names = list(reversed(_FILES))
    with pytest.raises(ValueError):
        c2.compare_sketches_chunked(len(_FILES), chunk_bytes=1 << 10,
                                    resume_path=manifest)


def test_large_collection_bounded(tmp_path):
    """A couple hundred tiny sketches compare under a small chunk
    budget with results equal to the all-in-RAM engine."""
    import io

    from supersampler_tpu.oracle.subsampler import OracleSubsampler

    rng = random.Random(4242)
    base = "".join(rng.choice("ACGT") for _ in range(3000))
    paths = []
    for i in range(200):
        seq = "".join(c if rng.random() > 0.05 else rng.choice("ACGT")
                      for c in base)
        ss = OracleSubsampler(k=31, m=11, s=3.0)
        ss.log = io.StringIO()
        ss.scan_sequence(seq)
        p = str(tmp_path / f"s{i}.gz")
        from supersampler_tpu.io.gzip_exact import write_gzip_exact
        write_gzip_exact(p, ss.serialize(), 9)
        paths.append(p)

    ref = TpuComparator()
    ref.files_names = list(paths)
    ref.compare_sketches(len(paths))
    c = TpuComparator()
    c.files_names = list(paths)
    assert c.compare_sketches_chunked(len(paths), chunk_bytes=1 << 14)
    assert c.score_A == ref.score_A
    assert c.nb_kmer_seen_infile == ref.nb_kmer_seen_infile
    # memory proxy: the largest chunk held a small fraction of the
    # collection's total pair volume
    assert c.max_chunk_pairs < sum(ref.nb_kmer_seen_infile) // 4
