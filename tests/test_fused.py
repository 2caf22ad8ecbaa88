"""Parity of the v2 fused Mosaic path (ops/fused.py) vs the v1 split
path on identical inputs.

On CPU the v2 kernels only run in Pallas interpret mode, which costs
minutes per case — ALL interpret cases are gated behind
SPSP_HEAVY_TESTS=1. The product-path validation is compiled parity on
the real chip: test_tpu_compiled_parity (SPSP_TEST_PLATFORM=tpu) plus
the wider build/tpu_fused_check.py drive, against the v1 programs the
oracle/golden suites pin to the reference binaries
(/root/reference/SubSampler.cpp:81-169, 306-510)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from supersampler_tpu.core.scalar import compute_threshold
from supersampler_tpu.ops.field import (_scan_resolve_batch_v1,
                                        field_entry_init,
                                        resolve_field,
                                        scan_field_2d_packed)
from supersampler_tpu.ops.fused import fused_batch, fused_single
from supersampler_tpu.ops.minimizer import pack_2bit_np

K, M = 31, 11
THR = compute_threshold(K, M, 1000.0)
THI = jnp.uint32(THR >> 32)
TLO = jnp.uint32(THR & 0xFFFFFFFF)

HEAVY = os.environ.get("SPSP_HEAVY_TESTS", "0") != "0"
heavy = pytest.mark.skipif(
    not HEAVY, reason="interpret-mode fuzz (minutes per case); "
    "SPSP_HEAVY_TESTS=1 to run — the on-chip compiled parity below "
    "and build/tpu_fused_check.py cover the product path")
ON_TPU = os.environ.get("SPSP_TEST_PLATFORM", "cpu") == "tpu"
tpu_only = pytest.mark.skipif(not ON_TPU, reason="needs the real chip")

# the split per-stage programs (what the CPU pipeline dispatches; the
# one-shot _scan_resolve_single_v1 jit is compile-heavy on CPU)
_scan_split = jax.jit(scan_field_2d_packed, static_argnums=(1, 2, 3, 5))


def _v1_single(s, k, m, P, cap, L, thi, tlo):
    ft = _scan_split(s[32:], k, m, P, L, True)
    entry = field_entry_init(ft, thi, tlo)
    return np.asarray(resolve_field(ft, k, m, cap, entry, thi, tlo))


def _slab(codes: np.ndarray, P: int) -> np.ndarray:
    c = np.zeros(128 + P, np.uint8)
    c[128 : 128 + len(codes)] = codes
    return pack_2bit_np(c)


def _cmp_single(codes: np.ndarray, P: int, cap: int = 256,
                thr=(THI, TLO), k=K, m=M):
    s = jnp.asarray(_slab(codes, P))
    L = jnp.int32(len(codes))
    a1 = _v1_single(s, k, m, P, cap, L, *thr)
    a2 = np.asarray(fused_single(s, k, m, P, cap, True, L, *thr))
    np.testing.assert_array_equal(a1, a2)


@heavy
def test_single_random_small():
    rng = np.random.default_rng(0)
    _cmp_single(rng.integers(0, 4, size=450, dtype=np.uint8), 512)


@tpu_only
def test_tpu_compiled_parity():
    """Compiled (non-interpret) parity on the real chip: medium single
    records + a batch, v2 vs the fused v1 program."""
    from supersampler_tpu.ops.field import _scan_resolve_single_v1

    rng = np.random.default_rng(31)
    for glen in (2400, 997, K + 1):
        codes = rng.integers(0, 4, size=glen, dtype=np.uint8)
        s = jnp.asarray(_slab(codes, 2560))
        L = jnp.int32(glen)
        a1 = np.asarray(_scan_resolve_single_v1(
            s, K, M, 2560, 512, L, THI, TLO))
        a2 = np.asarray(fused_single(s, K, M, 2560, 512, False, L,
                                     THI, TLO))
        np.testing.assert_array_equal(a1, a2)
    B_n, P_rec = 64, 1024
    pack = np.zeros((B_n, P_rec >> 2), np.uint8)
    lengths = np.zeros(B_n, np.int32)
    for b in range(B_n):
        L = int(rng.integers(0, 1000))
        codes = np.zeros(P_rec, np.uint8)
        codes[:L] = rng.integers(0, 4, size=L, dtype=np.uint8)
        pack[b] = pack_2bit_np(codes)
        lengths[b] = L if L >= K else 0
    a1 = np.asarray(_scan_resolve_batch_v1(
        jnp.asarray(pack), K, M, P_rec, 4096, jnp.asarray(lengths),
        THI, TLO))
    a2 = np.asarray(fused_batch(
        jnp.asarray(pack), K, M, P_rec, 4096, False,
        jnp.asarray(lengths), THI, TLO))
    np.testing.assert_array_equal(a1, a2)


@heavy
def test_batched_small():
    rng = np.random.default_rng(5)
    B_n, P_rec = 8, 512
    pack = np.zeros((B_n, P_rec >> 2), np.uint8)
    lengths = np.zeros(B_n, np.int32)
    lens = [400, 0, K - 1, K + 2, 350, 71, 1, 440]
    for b, L in enumerate(lens):
        codes = np.zeros(P_rec, np.uint8)
        codes[:L] = rng.integers(0, 4, size=L, dtype=np.uint8)
        pack[b] = pack_2bit_np(codes)
        lengths[b] = L if L >= K else 0
    pk = jnp.asarray(pack)
    ln = jnp.asarray(lengths)
    a1 = np.asarray(_scan_resolve_batch_v1(pk, K, M, P_rec, 512, ln,
                                           THI, TLO))
    a2 = np.asarray(fused_batch(pk, K, M, P_rec, 512, True, ln, THI,
                                TLO))
    np.testing.assert_array_equal(a1, a2)


@heavy
@pytest.mark.parametrize("seed,glen", [(1, 2473), (2, 512), (3, 37)])
def test_single_random_heavy(seed, glen):
    rng = np.random.default_rng(seed)
    _cmp_single(rng.integers(0, 4, size=glen, dtype=np.uint8), 2560)


@heavy
def test_single_short_edges():
    rng = np.random.default_rng(9)
    _cmp_single(rng.integers(0, 4, size=K - 1, dtype=np.uint8), 512)
    _cmp_single(rng.integers(0, 4, size=K + 1, dtype=np.uint8), 512)


@heavy
def test_single_homopolymer_multipass():
    # megarun of one letter: no strict hash minima -> no syncs -> the
    # cond-gated prefix passes 2+ must run; both engines converge to
    # the same status/fallback signal
    codes = np.zeros(2400, np.uint8)
    _cmp_single(codes, 2560)


@heavy
def test_single_select_all():
    thr = compute_threshold(K, M, 1.0)
    t = (jnp.uint32(thr >> 32), jnp.uint32(thr & 0xFFFFFFFF))
    rng = np.random.default_rng(4)
    _cmp_single(rng.integers(0, 4, size=450, dtype=np.uint8), 512,
                cap=512, thr=t)


@heavy
def test_single_odd_params():
    k2, m2 = 21, 7
    thr = compute_threshold(k2, m2, 500.0)
    t = (jnp.uint32(thr >> 32), jnp.uint32(thr & 0xFFFFFFFF))
    rng = np.random.default_rng(8)
    _cmp_single(rng.integers(0, 4, size=460, dtype=np.uint8), 512,
                thr=t, k=k2, m=m2)


@heavy
def test_batched_homopolymer_mix():
    rng = np.random.default_rng(6)
    B_n, P_rec = 8, 1024
    pack = np.zeros((B_n, P_rec >> 2), np.uint8)
    lengths = np.zeros(B_n, np.int32)
    for b in range(B_n):
        L = 600 + 17 * b
        codes = np.zeros(P_rec, np.uint8)
        if b % 2 == 0:
            codes[:L] = 1       # homopolymer: syncless blocks
        else:
            codes[:L] = rng.integers(0, 4, size=L, dtype=np.uint8)
        pack[b] = pack_2bit_np(codes)
        lengths[b] = L
    pk = jnp.asarray(pack)
    ln = jnp.asarray(lengths)
    a1 = np.asarray(_scan_resolve_batch_v1(pk, K, M, P_rec, 2048, ln,
                                           THI, TLO))
    a2 = np.asarray(fused_batch(pk, K, M, P_rec, 2048, True, ln, THI,
                                TLO))
    np.testing.assert_array_equal(a1, a2)
