"""Batched-records field engine vs per-record resolution.

scan_field_batched + resolve_field_batched must produce, for every
record in the batch, exactly the compact tuple the single-record
engine (scan_field_2d_packed + resolve_field) produces — including
tails, reverse flags and event counts. Reference semantics: each FASTA
record runs the same scan loop independently
(/root/reference/SubSampler.cpp:306-510, 334-347).
"""

import numpy as np
import pytest

import jax.numpy as jnp

import jax

from supersampler_tpu.core.scalar import compute_threshold
from supersampler_tpu.ops.field import (field_entry_init,
                                        parse_batched_array,
                                        parse_field_array,
                                        resolve_field,
                                        scan_field_2d_packed,
                                        scan_resolve_batch)
from supersampler_tpu.ops.minimizer import pack_2bit_np


def _single_comp(codes, L, k, m, P, thr):
    thi = jnp.uint32(thr >> 32)
    tlo = jnp.uint32(thr & 0xFFFFFFFF)
    c = np.zeros(P, np.uint8)
    c[:L] = codes[:L]
    ft = scan_field_2d_packed(jnp.asarray(pack_2bit_np(c)), k, m, P,
                              jnp.int32(L), True)
    entry = field_entry_init(ft, thi, tlo)
    arr = jax.device_get(resolve_field(ft, k, m, 4096, entry, thi, tlo))
    status, comp, n_sel = parse_field_array(arr, 4096)
    assert status == 0
    return comp


@pytest.mark.parametrize("seed,s", [(5, 4.0), (6, 1.0), (7, 50.0)])
def test_batched_matches_single(seed, s):
    k, m = 31, 11
    P_rec = 1024
    thr = compute_threshold(k, m, s)
    rng = np.random.default_rng(seed)
    lengths = [900, 31, 32, 200, 700, 64, 850, 500,
               33, 120, 0, 901]   # incl. L==k+1, dead pad (0)
    B = len(lengths)
    packed = np.zeros((B, P_rec // 4), np.uint8)
    codes_all = []
    for b, L in enumerate(lengths):
        codes = rng.integers(0, 4, size=P_rec, dtype=np.uint8)
        codes[L:] = 0
        codes_all.append(codes)
        packed[b] = pack_2bit_np(codes)

    thi = jnp.uint32(thr >> 32)
    tlo = jnp.uint32(thr & 0xFFFFFFFF)
    arr = jax.device_get(scan_resolve_batch(
        jnp.asarray(packed), k, m, P_rec, 4096,
        jnp.asarray(lengths, jnp.int32), thi, tlo))
    gstatus, n_total, comps, st_rec = parse_batched_array(arr, 4096, B)
    assert gstatus == 0 and comps is not None

    for b, L in enumerate(lengths):
        if L < k:
            continue    # callers skip sub-k records before batching
        want = _single_comp(codes_all[b], L, k, m, P_rec, thr)
        got = comps[b]
        for i, (w, g) in enumerate(zip(want, got)):
            np.testing.assert_array_equal(
                np.asarray(g), np.asarray(w),
                err_msg=f"record {b} field {i} (L={L})")


def test_batched_multirow_records():
    """Records spanning several (512-col) rows + several lanes."""
    k, m, s = 21, 9, 3.0
    P_rec = 4096
    thr = compute_threshold(k, m, s)
    rng = np.random.default_rng(99)
    lengths = [4000, 3000, 1025, 22, 3999]
    B = len(lengths)
    packed = np.zeros((B, P_rec // 4), np.uint8)
    codes_all = []
    for b, L in enumerate(lengths):
        codes = rng.integers(0, 4, size=P_rec, dtype=np.uint8)
        codes[L:] = 0
        codes_all.append(codes)
        packed[b] = pack_2bit_np(codes)
    thi = jnp.uint32(thr >> 32)
    tlo = jnp.uint32(thr & 0xFFFFFFFF)
    arr = jax.device_get(scan_resolve_batch(
        jnp.asarray(packed), k, m, P_rec, 8192,
        jnp.asarray(lengths, jnp.int32), thi, tlo))
    gstatus, n_total, comps, _ = parse_batched_array(arr, 8192, B)
    assert gstatus == 0
    for b, L in enumerate(lengths):
        if L < k:
            continue
        want = _single_comp(codes_all[b], L, k, m, P_rec, thr)
        got = comps[b]
        for i, (w, g) in enumerate(zip(want, got)):
            np.testing.assert_array_equal(
                np.asarray(g), np.asarray(w),
                err_msg=f"record {b} field {i} (L={L})")


def test_batched_cap_overflow_detection():
    """n_sel_total > sel_cap must be reported, not silently truncated."""
    k, m = 31, 11
    P_rec = 1024
    thr = compute_threshold(k, m, 1.0)   # select-all
    rng = np.random.default_rng(3)
    B = 8
    packed = np.zeros((B, P_rec // 4), np.uint8)
    for b in range(B):
        packed[b] = pack_2bit_np(
            rng.integers(0, 4, size=P_rec, dtype=np.uint8))
    lengths = jnp.full((B,), 900, jnp.int32)
    thi = jnp.uint32(thr >> 32)
    tlo = jnp.uint32(thr & 0xFFFFFFFF)
    arr = jax.device_get(scan_resolve_batch(
        jnp.asarray(packed), k, m, P_rec, 16, lengths, thi, tlo))
    gstatus, n_total, comps, _ = parse_batched_array(arr, 16, B)
    assert n_total > 16 and comps is None
