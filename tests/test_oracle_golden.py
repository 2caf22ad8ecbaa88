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


def test_allvsall_goldens(goldendir):
    meta = load_meta(goldendir)
    cfg = meta["compare"]
    comp = OracleComparator(precision=6, min_threshold=0.0)
    comp.files_names = [os.path.join(goldendir, f) for f in cfg["files"]]
    comp.compare_sketches(len(comp.files_names))
    # Goldens store basenames; ours are absolute paths.
    def normalize(txt):
        return txt.replace(goldendir + "/", "")
    ref_cont = gzip.open(
        os.path.join(goldendir, "allvsall_containment.csv.gz"), "rb"
    ).read().decode()
    ref_jac = gzip.open(
        os.path.join(goldendir, "allvsall_jaccard.csv.gz"), "rb"
    ).read().decode()
    # Reference goldens use the sketch filenames the reference wrote
    # (gfam_famN.gz); map ours to that naming for comparison.
    mine_cont = comp.containment_csv().replace(
        goldendir + "/", "").replace("fam", "gfam_fam").replace(
        ".sketch.gz", ".gz")
    mine_jac = comp.jaccard_csv().replace(
        goldendir + "/", "").replace("fam", "gfam_fam").replace(
        ".sketch.gz", ".gz")
    assert mine_cont == ref_cont
    assert mine_jac == ref_jac


def test_query_goldens(goldendir):
    meta = load_meta(goldendir)
    cfg = meta["compare"]
    comp = OracleComparator(
        precision=cfg["query_precision"],
        min_threshold=cfg["query_min_threshold"])
    comp.files_names = [os.path.join(goldendir, f)
                        for f in cfg["query_files"]]
    qs = len(comp.files_names)
    comp.files_names += [os.path.join(goldendir, f)
                         for f in cfg["bank_files"]]
    comp.compare_sketches(qs)
    for kind, fn in [("containment", comp.containment_csv),
                     ("jaccard", comp.jaccard_csv)]:
        ref = gzip.open(
            os.path.join(goldendir, f"query_{kind}.csv.gz"), "rb"
        ).read().decode()
        mine = fn().replace(goldendir + "/", "").replace(
            "fam", "gfam_fam").replace(".sketch.gz", ".gz")
        assert mine == ref, kind
