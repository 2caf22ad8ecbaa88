"""CLI parity: our CLIs reproduce the reference binaries' stdout and
output files byte-for-byte (compressed bytes included)."""

import gzip
import io
import os
import sys
from contextlib import redirect_stdout

import pytest

from supersampler_tpu.cli import comparator as cli_comparator
from supersampler_tpu.cli import sort_csv as cli_sort_csv
from supersampler_tpu.cli import sub_sampler as cli_sub_sampler


def test_sub_sampler_cli_full_parity(datadir, goldendir, tmp_path,
                                     monkeypatch):
    monkeypatch.chdir(tmp_path)
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli_sub_sampler.main(
            ["-i", datadir["simple"], "-s", "10", "-p", "cli_"])
    assert rc == 0
    with open(os.path.join(goldendir, "cli_sub_sampler_stdout.txt")) as f:
        ref_stdout = f.read()
    assert buf.getvalue() == ref_stdout
    ref_gz = open(os.path.join(goldendir, "cli_simple.gz"), "rb").read()
    mine_gz = open(tmp_path / "cli_simple.gz", "rb").read()
    assert mine_gz == ref_gz, "compressed sketch file differs"


def test_comparator_cli_parity(goldendir, tmp_path, monkeypatch):
    import json

    with open(os.path.join(goldendir, "meta.json")) as f:
        cfg = json.load(f)["compare"]
    for f_ in cfg["files"]:
        os.symlink(os.path.join(goldendir, f_), tmp_path / f_)
    monkeypatch.chdir(tmp_path)
    with open("fof.txt", "w") as f:
        f.write("\n".join(cfg["files"]) + "\n")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli_comparator.main(["-f", "fof.txt"])
    assert rc == 0
    for kind in ("containment", "jaccard"):
        ref = open(os.path.join(goldendir, f"allvsall_{kind}.csv.gz"),
                   "rb").read()
        mine = open(f"results_{kind}.csv.gz", "rb").read()
        assert mine == ref, f"{kind} csv.gz bytes differ"
    out = buf.getvalue()
    assert "No query file, I will perform a all versus all comparison" in out
    assert "I found 4 documents" in out


def test_sub_sampler_fof_threads_parity(datadir, goldendir, tmp_path,
                                        monkeypatch):
    """fof mode with -t 4: same sketch bytes as the golden per-file runs,
    out-fof and stdout in fof order, unreadable entries isolated."""
    monkeypatch.chdir(tmp_path)
    fof = tmp_path / "fof.txt"
    entries = [datadir[f"fam{i}"] for i in range(4)]
    entries.insert(2, str(tmp_path / "missing.fa"))  # unreadable entry
    fof.write_text("\n".join(entries) + "\n")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli_sub_sampler.main(
            ["-f", str(fof), "-s", "15", "-t", "4", "-p", "g_"])
    assert rc == 0
    for i in range(4):
        ref = open(os.path.join(goldendir, f"gfam_fam{i}.gz"), "rb").read()
        mine = open(tmp_path / f"g_fam{i}.gz", "rb").read()
        assert mine == ref, f"fam{i} sketch bytes differ under -t 4"
    out_fof = open(tmp_path / "g_fof.txt").read().splitlines()
    assert out_fof == ["g_fam0.gz", "g_fam1.gz", "g_missing.gz",
                       "g_fam2.gz", "g_fam3.gz"]
    out = buf.getvalue()
    # per-file blocks appear in fof order; the missing entry reports
    # the reference's messages in place
    idx = [out.index(p) for p in entries]
    assert idx == sorted(idx)
    assert "Problem with file opening" in out
    assert f"Can't open file: {entries[2]}" in out


def test_comparator_skips_unopenable(goldendir, tmp_path, monkeypatch):
    """An unopenable sketch drops out with the reference's message;
    the others still compare (reference Comparator.cpp:45-51)."""
    import json

    with open(os.path.join(goldendir, "meta.json")) as f:
        cfg = json.load(f)["compare"]
    for f_ in cfg["files"]:
        os.symlink(os.path.join(goldendir, f_), tmp_path / f_)
    monkeypatch.chdir(tmp_path)
    with open("fof_ok.txt", "w") as f:
        f.write("\n".join(cfg["files"]) + "\n")
    with open("fof_bad.txt", "w") as f:
        f.write(cfg["files"][0] + "\nno_such_sketch.gz\n"
                + "\n".join(cfg["files"][1:]) + "\n")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli_comparator.main(["-f", "fof_bad.txt", "-o", "bad"])
    assert rc == 0
    assert "Problem with file opening" in buf.getvalue()
    with redirect_stdout(io.StringIO()):
        cli_comparator.main(["-f", "fof_ok.txt", "-o", "ok"])
    for kind in ("containment", "jaccard"):
        ok = gzip.open(f"ok_{kind}.csv.gz", "rt").read()
        bad = gzip.open(f"bad_{kind}.csv.gz", "rt").read()
        # same scores; the header reproduces the reference's
        # names/indices misalignment (files_names[0:nb_files])
        ok_lines = ok.splitlines()
        bad_lines = bad.splitlines()
        assert bad_lines[1:] == ok_lines[1:]
        assert bad_lines[0].split(",")[1] == "no_such_sketch.gz"


def test_comparator_engines_agree(goldendir, tmp_path, monkeypatch):
    """The MXU presence-matmul engine and the numpy group enumeration
    produce identical CSVs, all-vs-all and N-vs-all (the CLI golden test
    already runs the device engine against golden bytes)."""
    import json

    from supersampler_tpu.compare.merge import TpuComparator

    with open(os.path.join(goldendir, "meta.json")) as f:
        cfg = json.load(f)["compare"]
    files = [os.path.join(goldendir, f_) for f_ in cfg["files"]]
    outs = {}
    for engine in ("numpy", "device"):
        comp = TpuComparator(engine=engine)
        comp.files_names = list(files)
        comp.compare_sketches(len(files))
        outs[engine] = (comp.containment_csv(), comp.jaccard_csv(),
                        comp.score_A)
        qcomp = TpuComparator(engine=engine, precision=3)
        qcomp.files_names = (
            [os.path.join(goldendir, f_) for f_ in cfg["query_files"]]
            + [os.path.join(goldendir, f_) for f_ in cfg["bank_files"]])
        qcomp.compare_sketches(len(cfg["query_files"]))
        outs[engine] += (qcomp.containment_csv(), qcomp.jaccard_csv())
    assert outs["numpy"] == outs["device"]


def test_sub_sampler_usage():
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli_sub_sampler.main([])
    assert rc == 0
    assert "Core arguments:" in buf.getvalue()


def test_sort_csv_roundtrip(goldendir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    # Build a small symmetric matrix CSV and a reordering fof.
    names = ["c.gz", "a.gz", "b.gz"]
    mat = [[1, 0.5, 0.25], [0.5, 1, 0.125], [0.25, 0.125, 1]]
    with open("in.csv", "w") as f:
        f.write(",".join(names) + "\n")
        for row in mat:
            f.write(",".join(str(v) for v in row) + "\n")
    with open("fof.txt", "w") as f:
        f.write("a.gz\nb.gz\nc.gz\n")
    buf = io.StringIO()
    with redirect_stdout(buf):
        cli_sort_csv.main(["in.csv", "out.csv", "fof.txt"])
    lines = open("out.csv").read().strip().split("\n")
    assert lines[0] == "a.gz,b.gz,c.gz"
    assert lines[1] == "1,0.125,0.5"
    assert lines[2] == "0.125,1,0.25"
    assert lines[3] == "0.5,0.25,1"
    assert "The end" in buf.getvalue()
