"""Auxiliary components: decycling set, eval harness, gzip container."""

import gzip
import os

import numpy as np
import pytest

from supersampler_tpu.core.decycling import DecyclingSet, mem_double_vec
from supersampler_tpu.io.gzip_exact import gzip_compress_exact


# Values from the reference DecyclingSet (Decycling.cpp) evaluated for
# m=11 on a few m-mers via a probe build.
def test_decycling_consistency():
    d = DecyclingSet(11)
    seqs = np.arange(0, 4 ** 6, 7, dtype=np.uint64)
    vec = mem_double_vec(seqs, 11)
    for s, v in zip(seqs[:200], vec[:200]):
        assert d.mem_double(int(s)) == int(v)
        if v == 2:
            assert d.mem(int(s))


def test_decycling_density():
    # The decycling set hits ~1/k of all k-mers (Mykkeltveit bound).
    k = 7
    seqs = np.arange(4 ** k, dtype=np.uint64)
    cls = mem_double_vec(seqs, k)
    frac = np.mean(cls == 2)
    assert 0.5 / k < frac < 2.0 / k


def test_gzip_exact_roundtrip():
    data = b"ACGT" * 1000
    for level in (1, 9):
        gz = gzip_compress_exact(data, level)
        assert gzip.decompress(gz) == data
        assert gz[9] == 3  # OS byte = Unix, as zlib writes


def test_eval_error_csv(tmp_path):
    import pandas as pd

    from supersampler_tpu.eval import stats

    simka = tmp_path / "simka.csv"
    pd.DataFrame({"name": ["a", "b"], "a": [0.0, 0.4], "b": [0.4, 0.0]}
                 ).to_csv(simka, sep=";", index=False)
    m1 = tmp_path / "spsp_1000_res.csv"
    pd.DataFrame({"a": [1.0, 0.5], "b": [0.5, 1.0]}).to_csv(m1, index=False)
    fof = tmp_path / "fof.txt"
    fof.write_text(str(m1) + "\n")
    out = tmp_path / "out.csv"
    stats.get_error(str(fof), str(simka), str(out))
    lines = out.read_text().strip().split("\n")
    assert lines[0] == "value,type,threshold,error,tool"
    val, typ, key, z, tool = lines[1].split(",")
    # mean(simka_sim)=mean(1-d)=0.8? simka read: 1-x on numeric cols
    assert typ == "error" and key == "1000" and tool == "SuperSampler_decycling"
    assert abs(float(val) - abs(0.8 - 0.75)) < 1e-12


def test_eval_norms_matches_notebook(tmp_path, capsys):
    """eval/norms.py == the reference notebook's lower-triangle stats,
    L1/L2 norms and harmonic means (Stats_SPSP.ipynb cells 1-14)."""
    import numpy as np

    from supersampler_tpu.eval import norms

    rng = np.random.default_rng(0)
    n = 6
    a = rng.random((n, n)); a = (a + a.T) / 2; np.fill_diagonal(a, 1)
    b = a + rng.normal(0, 0.01, (n, n)); b = (b + b.T) / 2
    np.fill_diagonal(b, 1)

    def write(p, mat):
        with open(p, "w") as f:
            f.write(",".join(f"f{i}.gz" for i in range(n)) + "\n")
            for row in mat:
                f.write(",".join(str(v) for v in row) + "\n")

    pa, pb = tmp_path / "a.csv", tmp_path / "b.csv"
    write(pa, a); write(pb, b)

    out = norms.compare_matrices(norms.load_matrix(str(pa)),
                                 norms.load_matrix(str(pb)))
    # notebook ground truth, computed directly
    la = a[np.tril_indices_from(a, k=-1)]
    lb = b[np.tril_indices_from(b, k=-1)]
    diff = np.abs(la - lb)
    assert abs(out["norm1"] - np.linalg.norm(diff, 1)) < 1e-12
    assert abs(out["norm2"] - np.linalg.norm(diff, 2)) < 1e-12
    assert abs(out["diff_mean"] - diff.mean()) < 1e-12
    # cells 2-3 formula incl. its **1/exp precedence quirk
    for e in (1, 2, 3):
        want = (diff.size / abs(np.sum(1 / diff**e))) ** 1 / e
        assert abs(out[f"harmonic_{e}"] - want) < 1e-9

    assert norms.main([str(pa), str(pb)]) == 0
    assert "norm1" in capsys.readouterr().out


def test_phase_timers_and_trace(tmp_path, monkeypatch):
    """Phase timers accumulate during sketch_file; device_trace is a
    no-op without SPSP_TRACE."""
    import numpy as np

    from supersampler_tpu.sketch.pipeline import TpuSubsampler
    from supersampler_tpu.utils.profiling import timers

    monkeypatch.delenv("SPSP_TRACE", raising=False)
    rng = np.random.default_rng(2)
    fa = tmp_path / "p.fa"
    fa.write_text(">r\n" + "".join(
        "ACGT"[c] for c in rng.integers(0, 4, 4000)) + "\n")
    timers.reset()
    TpuSubsampler(k=31, m=11, s=10.0).sketch_file(str(fa))
    # r5 phased pipeline: launch_scan split into upload + dispatch
    for name in ("parse", "upload", "dispatch", "device+fetch",
                 "assemble", "serialize"):
        assert name in timers.totals, name
    assert "parse" in timers.report()
