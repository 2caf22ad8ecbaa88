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


def test_stream_fasta_spans_matches_whole_file(tmp_path):
    """stream_fasta_spans must produce exactly read_fasta_spans'
    record bodies — across block boundaries, tiny windows, gzip input,
    wrapped lines, N-runs, empty records and headerless tails."""
    import gzip as gz
    import random

    import numpy as np

    from supersampler_tpu.io.fasta import (read_fasta_spans,
                                           stream_fasta_spans)

    rng = random.Random(77)
    recs = []
    for i in range(37):
        L = rng.choice([0, 3, 50, 1000, 9000])
        s = "".join(rng.choice("ACGTNacgt") for _ in range(L))
        recs.append((f">r{i} desc", s))
    body = []
    for hdr, s in recs:
        body.append(hdr)
        for j in range(0, max(len(s), 1), 61):
            body.append(s[j : j + 61])
    text = ("\n".join(body) + "\n").encode()
    plain = tmp_path / "s.fa"
    plain.write_bytes(text)
    gzp = tmp_path / "s.fa.gz"
    with gz.open(gzp, "wb") as f:
        f.write(text)

    for path in (plain, gzp):
        data, spans = read_fasta_spans(str(path))
        want = [bytes(data[s:e]) for s, e in spans]
        for window, maxrec in ((1 << 20, 4096), (256, 7), (64, 2)):
            got = []
            for blk, bspans in stream_fasta_spans(str(path), window,
                                                  maxrec):
                got.extend(blk[s:e] for s, e in bspans)
            assert got == want, (path, window, maxrec)


def test_stream_fasta_sketch_parity(tmp_path):
    """Tiny streaming windows through the full pipeline: sketch bytes
    must equal the whole-file oracle's."""
    import io as _io
    import random

    from supersampler_tpu.oracle.subsampler import OracleSubsampler
    from supersampler_tpu.sketch.pipeline import (TpuSubsampler,
                                                  _SharedSketchRun)

    rng = random.Random(5)
    fa = tmp_path / "g.fa"
    with open(fa, "w") as f:
        for i in range(9):
            L = rng.randrange(200, 4000)
            f.write(f">c{i}\n" + "".join(
                rng.choice("ACGT") for _ in range(L)) + "\n")
    oracle = OracleSubsampler(k=31, m=11, s=5.0)
    oracle.log = _io.StringIO()
    want = oracle.sketch_file(str(fa))

    class TinyChunks(TpuSubsampler):
        pass

    ss = TinyChunks(k=31, m=11, s=5.0)
    old_cb, old_cr = (_SharedSketchRun._CHUNK_BYTES,
                      _SharedSketchRun._CHUNK_RECS)
    _SharedSketchRun._CHUNK_BYTES, _SharedSketchRun._CHUNK_RECS = 600, 3
    try:
        got = ss.sketch_file(str(fa))
    finally:
        _SharedSketchRun._CHUNK_BYTES = old_cb
        _SharedSketchRun._CHUNK_RECS = old_cr
    assert got == want
