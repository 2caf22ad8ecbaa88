"""TpuComparator matches the oracle (and therefore the reference) exactly."""

import os

import numpy as np
import pytest

from supersampler_tpu.compare.merge import TpuComparator
from supersampler_tpu.oracle import OracleComparator, OracleSubsampler


def _golden_files(goldendir):
    return [os.path.join(goldendir, f"gfam_fam{i}.gz") for i in range(4)]


def test_allvsall_matches_oracle(goldendir):
    files = _golden_files(goldendir)
    o = OracleComparator()
    o.files_names = list(files)
    o.compare_sketches(len(files))
    t = TpuComparator()
    t.files_names = list(files)
    t.compare_sketches(len(files))
    assert t.nb_kmer_seen_infile == o.nb_kmer_seen_infile
    assert t.score_A == o.score_A
    assert t.containment_csv() == o.containment_csv()
    assert t.jaccard_csv() == o.jaccard_csv()


def test_query_mode_matches_oracle(goldendir):
    files = _golden_files(goldendir)
    o = OracleComparator(precision=3, min_threshold=0.05)
    o.files_names = files[:2] + files[2:]
    o.compare_sketches(2)
    t = TpuComparator(precision=3, min_threshold=0.05)
    t.files_names = files[:2] + files[2:]
    t.compare_sketches(2)
    assert t.nb_kmer_seen_infile == o.nb_kmer_seen_infile
    # Query-mode bank-bank scores are only accumulated in queryfound
    # buckets; both implementations must agree on the full score map.
    assert t.score_A == o.score_A
    assert t.containment_csv() == o.containment_csv()
    assert t.jaccard_csv() == o.jaccard_csv()


@pytest.mark.parametrize("config", [(21, 7, "5"), (15, 5, "2"), (63, 15, "3")])
def test_compare_other_k_configs(datadir, tmp_path, config):
    """Sketch the family at non-default k/m and compare both ways."""
    import gzip

    k, m, s = config
    sv = float(np.float32(s))
    files = []
    for i in range(3):
        ss = OracleSubsampler(k=k, m=m, s=sv)
        raw = ss.sketch_file(datadir[f"fam{i}"])
        p = str(tmp_path / f"sk{i}.gz")
        with gzip.open(p, "wb") as f:
            f.write(raw)
        files.append(p)
    o = OracleComparator()
    o.files_names = list(files)
    o.compare_sketches(3)
    t = TpuComparator()
    t.files_names = list(files)
    t.compare_sketches(3)
    assert t.nb_kmer_seen_infile == o.nb_kmer_seen_infile
    assert t.score_A == o.score_A
    assert t.jaccard_csv() == o.jaccard_csv()
