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
