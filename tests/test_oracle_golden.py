"""Golden-file parity: the Python oracle reproduces the compiled reference
binaries' outputs byte-for-byte (modulo the reference's documented
uninitialized-memory leak in strCompressor, pinned to 0 in goldens)."""

import gzip
import json
import os

import numpy as np
import pytest

from supersampler_tpu.oracle import OracleComparator, OracleSubsampler


def load_meta(goldendir):
    with open(os.path.join(goldendir, "meta.json")) as f:
        return json.load(f)


def test_sketch_goldens(datadir, goldendir):
    meta = load_meta(goldendir)
    assert meta["sketches"], "golden corpus missing"
    for cfg in meta["sketches"]:
        golden = gzip.open(
            os.path.join(goldendir, cfg["file"]), "rb").read()
        ss = OracleSubsampler(
            k=cfg["k"], m=cfg["m"], s=float(np.float32(cfg["s"])),
            abundance=cfg["a"])
        mine = ss.sketch_file(datadir[cfg["dataset"]])
        assert mine == golden, f"sketch mismatch for {cfg}"


@pytest.fixture()
def golden_cwd(goldendir, tmp_path, monkeypatch):
    """chdir into a tmpdir with the golden sketches symlinked under
    their original basenames, so CSV file-name columns match."""
    meta = load_meta(goldendir)
    for f in meta["compare"]["files"]:
        os.symlink(os.path.join(goldendir, f), tmp_path / f)
    monkeypatch.chdir(tmp_path)
    return meta["compare"]


def test_allvsall_goldens(goldendir, golden_cwd):
    cfg = golden_cwd
    comp = OracleComparator(precision=6, min_threshold=0.0)
    comp.files_names = list(cfg["files"])
    comp.compare_sketches(len(comp.files_names))
    for kind, fn in [("containment", comp.containment_csv),
                     ("jaccard", comp.jaccard_csv)]:
        ref = gzip.open(
            os.path.join(goldendir, f"allvsall_{kind}.csv.gz"), "rb"
        ).read().decode()
        assert fn() == ref, kind


def test_query_goldens(goldendir, golden_cwd):
    cfg = golden_cwd
    comp = OracleComparator(
        precision=cfg["query_precision"],
        min_threshold=cfg["query_min_threshold"])
    comp.files_names = list(cfg["query_files"])
    qs = len(comp.files_names)
    comp.files_names += list(cfg["bank_files"])
    comp.compare_sketches(qs)
    for kind, fn in [("containment", comp.containment_csv),
                     ("jaccard", comp.jaccard_csv)]:
        ref = gzip.open(
            os.path.join(goldendir, f"query_{kind}.csv.gz"), "rb"
        ).read().decode()
        assert fn() == ref, kind
