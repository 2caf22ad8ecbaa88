"""On-chip smoke set: run with SPSP_TEST_PLATFORM=tpu pytest tests/test_tpu_smoke.py.

Skipped on the default CPU suite; on a real TPU these execute the
compiled Mosaic kernels against the goldens — the guard against
miscompiles that interpret-mode testing cannot catch.
"""

import gzip
import json
import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="on-TPU smoke set (set SPSP_TEST_PLATFORM=tpu)")


def test_golden_sketch_on_tpu(datadir, goldendir):
    """Full pipeline (compiled scan + Mosaic walker) vs golden bytes."""
    from supersampler_tpu.sketch.pipeline import TpuSubsampler

    with open(os.path.join(goldendir, "meta.json")) as f:
        meta = json.load(f)["sketches"]
    done = 0
    for cfg in meta:
        if cfg["dataset"] != "simple":
            continue
        ss = TpuSubsampler(k=cfg["k"], m=cfg["m"], s=float(cfg["s"]),
                           abundance=cfg["a"])
        raw = ss.sketch_file(datadir[cfg["dataset"]])
        want = gzip.open(os.path.join(goldendir, cfg["file"]), "rb").read()
        assert raw == want, cfg["file"]
        done += 1
    assert done >= 2


def test_golden_sketch_field_engine_on_tpu(datadir, goldendir):
    """Field engine (Mosaic sweeps + list emission + resolve) vs golden
    bytes on the chip."""
    from supersampler_tpu.sketch.pipeline import TpuSubsampler

    class FieldSub(TpuSubsampler):
        scan_engine = "field"

    with open(os.path.join(goldendir, "meta.json")) as f:
        meta = json.load(f)["sketches"]
    done = 0
    for cfg in meta:
        if cfg["dataset"] != "simple":
            continue
        ss = FieldSub(k=cfg["k"], m=cfg["m"], s=float(cfg["s"]),
                      abundance=cfg["a"])
        raw = ss.sketch_file(datadir[cfg["dataset"]])
        want = gzip.open(os.path.join(goldendir, cfg["file"]), "rb").read()
        assert raw == want, cfg["file"]
        done += 1
    assert done >= 2


def test_golden_compare_on_tpu(goldendir, tmp_path, monkeypatch):
    """Device (MXU) comparator engine vs golden CSVs on the chip."""
    from supersampler_tpu.compare.merge import TpuComparator

    with open(os.path.join(goldendir, "meta.json")) as f:
        cfg = json.load(f)["compare"]
    comp = TpuComparator(engine="device")
    comp.files_names = [os.path.join(goldendir, f_) for f_ in cfg["files"]]
    comp.compare_sketches(len(cfg["files"]))
    for kind, csv in (("containment", comp.containment_csv()),
                      ("jaccard", comp.jaccard_csv())):
        want = gzip.open(os.path.join(
            goldendir, f"allvsall_{kind}.csv.gz"), "rt").read()
        # golden CSVs carry bare basenames; ours carry goldendir paths
        want_body = want.split("\n", 1)[1]
        got_body = csv.split("\n", 1)[1]
        assert got_body == want_body, kind


def test_mosaic_sweep_matches_xla_on_tpu():
    """The field engine's Mosaic sweep kernel == the XLA lax.scan sweep
    on the chip (the interpret path is too slow to run in the CPU
    suite; this is the kernel's correctness gate)."""
    import jax.numpy as jnp

    from supersampler_tpu.core.scalar import compute_threshold
    from supersampler_tpu.ops import field as F

    k, m, s = 31, 11, 5.0
    P, L = 8192, 7900
    W = k - m + 1
    rng = np.random.default_rng(3)
    codes = np.zeros(P, np.uint8)
    codes[:L] = rng.integers(0, 4, L, dtype=np.uint8)
    thr = compute_threshold(k, m, s)
    thi, tlo = jnp.uint32(thr >> 32), jnp.uint32(thr & 0xFFFFFFFF)
    t = jax.jit(F.scan_field_2d, static_argnums=(1, 2, 3, 5))(
        jnp.asarray(codes), k, m, P, jnp.int32(L), True)
    n_blk = P // F._B
    tT = F._transpose_tables(t, n_blk)
    sync2 = t.sync.reshape(n_blk, F._B)
    has_sync = jnp.any(sync2, axis=1)
    fs = jnp.where(has_sync,
                   jnp.argmax(sync2, axis=1).astype(jnp.int32), F._B)
    zst = F.FieldState(
        val=jnp.zeros((n_blk,), jnp.uint32),
        h_hi=jnp.full((n_blk,), 0xFFFFFFFF, jnp.uint32),
        h_lo=jnp.full((n_blk,), 0xFFFFFFFF, jnp.uint32),
        p=jnp.zeros((n_blk,), jnp.int32),
        last_ev=jnp.full((n_blk,), -1, jnp.int32),
        n_ev=jnp.zeros((n_blk,), jnp.int32))
    end = jnp.full((n_blk,), F._B, jnp.int32)
    capl = 16
    lane_base = jnp.arange(n_blk, dtype=jnp.int32) * F._B
    lastiv = jnp.broadcast_to(t.last_i, (n_blk,)).astype(jnp.int32)
    st_a, ev, pval, plast, isent = F._sweep(
        tT, lane_base, lastiv, W, n_blk, zst, fs, end, has_sync, True,
        thi, tlo)
    a = (st_a,) + F._lists_from_dense(ev, pval, plast, isent,
                                      lane_base, n_blk, capl)
    b = F._sweep_pallas(tT, lane_base, lastiv, W, n_blk, zst, fs, end,
                        has_sync, True, thi, tlo, capl,
                        interpret=False)
    for f, (xa, ya) in enumerate(zip(a[0], b[0])):
        assert np.all(np.asarray(xa) == np.asarray(ya)), ("state", f)
    for i in range(1, 5):
        assert np.all(np.asarray(a[i]) == np.asarray(b[i])), i


def test_mosaic_walker_matches_xla_on_tpu():
    """Compiled Mosaic walker == XLA while_loop walk on the chip."""
    import jax.numpy as jnp

    from supersampler_tpu.core.scalar import compute_threshold
    from supersampler_tpu.ops import u64 as U
    from supersampler_tpu.ops.minimizer import scan_tables_2d
    from supersampler_tpu.ops.walker import (_BP, _init5_from_tables,
                                             pack_succ, walk_pallas,
                                             walk_xla)

    k, m, s = 31, 11, 3.0
    P, L = 8192, 7777
    thr = compute_threshold(k, m, s)
    rng = np.random.default_rng(5)
    codes = np.zeros(P, np.uint8)
    codes[:L] = rng.integers(0, 4, L, dtype=np.uint8)
    t = jax.jit(scan_tables_2d, static_argnums=(1, 2, 3))(
        jnp.asarray(codes), k, m, P, jnp.int32(L),
        U.U64(jnp.uint32(thr >> 32), jnp.uint32(thr & 0xFFFFFFFF)))
    n = int(t.nxt_pos_a.shape[0])
    n_pad = ((n + _BP - 1) // _BP) * _BP
    packed = pack_succ(t, n_pad)
    init5 = _init5_from_tables(t)
    pe = walk_pallas(packed, init5, interpret=False)
    xe = walk_xla(packed, init5)
    assert int(jnp.sum(pe[3])) == int(xe[3][0])
    assert np.all(np.asarray(pe[4]) == np.asarray(xe[4]))
    ncnt = int(xe[3][0])
    cnts = np.asarray(pe[3])
    for pi, xi in zip(pe[:3], xe[:3]):
        want = np.asarray(xi).reshape(-1)[:ncnt]
        # pallas emit tiles are per block; valid rows are the first
        # cnt[b] of each block
        g2 = np.asarray(pi)
        ents = [g2[b].reshape(-1)[:c] for b, c in enumerate(cnts)]
        got = (np.concatenate(ents) if ents
               else np.zeros(0, dtype=want.dtype))
        assert np.all(got == want)


def test_batched_short_records_on_tpu(tmp_path):
    """Batched short-record engine (scan_resolve_batch with per-lane
    position frames in the compiled Mosaic sweep kernel) vs the oracle
    on the real chip — the r3 miscompile class that interpret mode
    cannot catch."""
    import io
    import random

    from supersampler_tpu.oracle.subsampler import OracleSubsampler
    from supersampler_tpu.sketch.pipeline import TpuSubsampler

    rng = random.Random(2026)
    fa = tmp_path / "reads.fa"
    with open(fa, "w") as f:
        for i in range(150):
            L = rng.randint(100, 2000)
            s = "".join(rng.choice("ACGT") for _ in range(L))
            f.write(f">r{i}\n{s}\n")
    for s_rate in (1.0, 4.0):
        oracle = OracleSubsampler(k=31, m=11, s=s_rate)
        oracle.log = io.StringIO()
        want = oracle.sketch_file(str(fa))
        tpu = TpuSubsampler(k=31, m=11, s=s_rate)
        tpu.log = io.StringIO()
        assert tpu.sketch_file(str(fa)) == want, s_rate


def test_tile_fallback_on_tpu():
    """Tile-granular walker fallback (field->walker->field state
    conversion) byte-exact on the chip."""
    from supersampler_tpu.oracle.subsampler import OracleSubsampler
    from supersampler_tpu.sketch.pipeline import TpuSubsampler

    OWN = 1 << 18

    class SmallTiles(TpuSubsampler):
        scan_engine = "field"
        _tile_own = OWN
        _tile_extra = 512

    rng = np.random.default_rng(7)
    mk = lambda n: "".join("ACGT"[c] for c in rng.integers(0, 4, n))
    ref = mk(OWN + 5000) + "A" * 4000 + mk(OWN - 5000)
    ss = SmallTiles(k=31, m=11, s=3.0)
    dc = ss._launch_scan(ref.encode())
    ss._finish_scan(ref, dc)
    assert dc.fallback_tiles and len(dc.fallback_tiles) < dc._n_tiles
    oracle = OracleSubsampler(k=31, m=11, s=3.0)
    oracle.scan_sequence(ref)
    assert ss.serialize() == oracle.serialize()


def test_kmer_set_parity_100mbp_vs_reference(tmp_path, monkeypatch):
    """Large-input content-level parity (VERDICT r4 #9): the k-mer SET
    decoded from our TPU sketch of a 100 Mbp genome equals the set
    from the reference binary's sketch, modulo the strCompressor
    quirk's single-end-base corruptions."""
    import io
    import subprocess

    from supersampler_tpu.cli.kmer_dump import dump
    from supersampler_tpu.io.gzip_exact import write_gzip_exact
    from supersampler_tpu.sketch.pipeline import TpuSubsampler
    from tests.test_kmer_dump import (REFBIN,
                                      assert_kmer_sets_quirk_equal)

    if not os.path.exists(REFBIN):
        pytest.skip("reference binary not built")
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(100_000_007)
    nuc = np.frombuffer(b"ACGT", np.uint8)
    L = 100_000_000
    with open("g.fa", "wb") as f:
        f.write(b">g\n")
        for off in range(0, L, 10_000_000):
            f.write(nuc[rng.integers(0, 4, 10_000_000,
                                     dtype=np.uint8)].tobytes())
        f.write(b"\n")
    subprocess.run(
        [REFBIN, "-i", "g.fa", "-k", "31", "-m", "11", "-s", "1000",
         "-p", "ref_", "-a", "1"], check=True, capture_output=True)
    ss = TpuSubsampler(k=31, m=11, s=float(np.float32(1000)))
    write_gzip_exact("tpu_g.gz", ss.sketch_file("g.fa"), 9)
    a, b = io.StringIO(), io.StringIO()
    n_ref = dump("ref_g.gz", a)
    n_tpu = dump("tpu_g.gz", b)
    assert n_ref == n_tpu and n_ref > 50_000
    assert_kmer_sets_quirk_equal(set(a.getvalue().split()),
                                 set(b.getvalue().split()))
