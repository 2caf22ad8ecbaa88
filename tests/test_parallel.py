"""Multi-device sharding: batched/sharded scan and psum'd compare matmul
on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supersampler_tpu.core.scalar import NUC2INT_LUT, compute_threshold
from supersampler_tpu.ops import u64 as U
from supersampler_tpu.ops.minimizer import walk_chain_host, ScanTables
from supersampler_tpu.parallel.compare_dist import (
    build_presence_chunks, score_matrix_device, scores_to_dict)
from supersampler_tpu.parallel.mesh import make_mesh, sharded_scan_fn


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices")


def _table_row(tables, i):
    return ScanTables(*[x[i] for x in tables])


def test_sharded_scan_matches_single(datadir):
    from supersampler_tpu.io.fasta import iter_fasta_records
    from supersampler_tpu.ops.minimizer import scan_tables

    k, m, P = 31, 11, 4096
    thr = compute_threshold(k, m, 10.0)
    rng = np.random.default_rng(11)
    B = 8
    codes = rng.integers(0, 4, size=(B, P), dtype=np.uint8)
    lengths = np.full(B, P - 7, np.int32)
    mesh = make_mesh(jax.devices()[:8])
    fn = sharded_scan_fn(mesh, k, m, P)
    t_hi = jnp.uint32(thr >> 32)
    t_lo = jnp.uint32(thr & 0xFFFFFFFF)
    batched = fn(jnp.asarray(codes), jnp.asarray(lengths), t_hi, t_lo)
    single = jax.jit(
        lambda c, l: scan_tables(c, k, m, P, l, U.U64(t_hi, t_lo)))
    for i in range(B):
        want = single(jnp.asarray(codes[i]), jnp.int32(lengths[i]))
        got = _table_row(batched, i)
        for a, b, name in zip(got, want, ScanTables._fields):
            assert np.array_equal(np.asarray(a), np.asarray(b)), name
        # chain walk agrees too
        pw = walk_chain_host(want)
        pg = walk_chain_host(got)
        for a, b in zip(pw, pg):
            assert np.array_equal(a, b)


def test_sharded_field_resolve_matches_single():
    """The mesh-sharded PRODUCT engine (fused batched field
    scan+resolve under shard_map) must equal the single-device batched
    program record-for-record."""
    from supersampler_tpu.ops.field import (parse_batched_array,
                                            scan_resolve_batch)
    from supersampler_tpu.ops.minimizer import pack_2bit_np
    from supersampler_tpu.parallel.mesh import sharded_field_resolve_fn

    k, m, s = 31, 11, 4.0
    P_rec, B, cap = 1024, 16, 2048
    thr = compute_threshold(k, m, s)
    thi = jnp.uint32(thr >> 32)
    tlo = jnp.uint32(thr & 0xFFFFFFFF)
    rng = np.random.default_rng(23)
    packed = np.zeros((B, P_rec // 4), np.uint8)
    lengths = rng.integers(100, 900, size=B).astype(np.int32)
    for b in range(B):
        codes = rng.integers(0, 4, size=P_rec, dtype=np.uint8)
        codes[lengths[b]:] = 0
        packed[b] = pack_2bit_np(codes)

    n_dev = 8
    mesh = make_mesh(jax.devices()[:n_dev])
    fn = sharded_field_resolve_fn(mesh, k, m, P_rec, cap)
    rows = np.asarray(fn(jnp.asarray(packed), jnp.asarray(lengths),
                         thi, tlo))
    assert rows.shape[0] == n_dev
    got = []
    for d in range(n_dev):
        g, n_total, comps, st = parse_batched_array(
            rows[d], cap, B // n_dev)
        assert g == 0 and comps is not None
        got.extend(comps)

    arr1 = jax.device_get(scan_resolve_batch(
        jnp.asarray(packed), k, m, P_rec, cap,
        jnp.asarray(lengths), thi, tlo))
    g, n_total, want, st = parse_batched_array(arr1, cap, B)
    assert g == 0
    for b in range(B):
        for i, (w, gg) in enumerate(zip(want[b], got[b])):
            assert np.array_equal(np.asarray(gg), np.asarray(w)), \
                (b, i)


def test_score_matmul_matches_reference_scores(goldendir):
    import os

    from supersampler_tpu.compare.merge import TpuComparator

    files = [os.path.join(goldendir, f"gfam_fam{i}.gz") for i in range(4)]
    gids, fids, n_groups, nb_seen, k, m = build_presence_chunks(files)
    mesh = make_mesh(jax.devices()[:8])
    score = score_matrix_device(gids, fids, n_groups, len(files),
                                mesh=mesh, chunk_groups=512)
    # diagonal = per-file distinct pair counts
    assert [int(score[i, i]) for i in range(4)] == nb_seen
    ref = TpuComparator()
    ref.files_names = list(files)
    ref.compare_sketches(4)
    assert scores_to_dict(score, 4) == ref.score_A
    # single-device path agrees with the sharded one
    score1 = score_matrix_device(gids, fids, n_groups, len(files),
                                 mesh=None, chunk_groups=512)
    assert np.array_equal(score, score1)
