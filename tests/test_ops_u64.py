"""JAX u32-limb 64-bit ops and vectorized hash vs the scalar oracle."""

import numpy as np
import jax.numpy as jnp

from supersampler_tpu.core import scalar as sc
from supersampler_tpu.ops import u64 as U
from supersampler_tpu.ops.hashing import xxh64_u32, xxh64_u64

MASK64 = (1 << 64) - 1


def _rand64(rng, n):
    return rng.integers(0, 1 << 64, size=n, dtype=np.uint64)


def _pack(vals):
    vals = np.asarray(vals, dtype=np.uint64)
    return U.U64(jnp.asarray((vals >> np.uint64(32)).astype(np.uint32)),
                 jnp.asarray((vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)))


def _unpack(x):
    return (np.asarray(x.hi, dtype=np.uint64) << np.uint64(32)) | np.asarray(
        x.lo, dtype=np.uint64)


def test_mul_add_xor_shift_rot():
    rng = np.random.default_rng(3)
    a = _rand64(rng, 256)
    b = _rand64(rng, 256)
    A, B = _pack(a), _pack(b)
    assert (_unpack(U.mul(A, B)) == (a * b)).all()  # numpy u64 mul wraps
    assert (_unpack(U.add(A, B)) == (a + b)).all()
    assert (_unpack(U.xor(A, B)) == (a ^ b)).all()
    ai = [int(x) for x in a]
    for n in [1, 7, 31, 32, 33, 63]:
        assert (_unpack(U.shr(A, n)) == np.array(
            [x >> n for x in ai], dtype=np.uint64)).all(), f"shr {n}"
        assert (_unpack(U.shl(A, n)) == np.array(
            [(x << n) & MASK64 for x in ai], dtype=np.uint64)).all(), f"shl {n}"
        assert (_unpack(U.rotl(A, n)) == np.array(
            [sc.rotl64(x, n) for x in ai], dtype=np.uint64)).all(), f"rotl {n}"


def test_cmp():
    rng = np.random.default_rng(4)
    a = _rand64(rng, 512)
    b = _rand64(rng, 512)
    # include equal pairs
    b[:50] = a[:50]
    A, B = _pack(a), _pack(b)
    assert (np.asarray(U.lt(A, B)) == (a < b)).all()
    assert (np.asarray(U.le(A, B)) == (a <= b)).all()
    assert (np.asarray(U.eq(A, B)) == (a == b)).all()


def test_xxh64_u32_matches_scalar():
    rng = np.random.default_rng(5)
    xs = np.concatenate([
        np.array([0, 1, 2, 3, 189, 1312], dtype=np.uint32),
        rng.integers(0, 1 << 30, size=500, dtype=np.uint32),
    ])
    got = _unpack(xxh64_u32(jnp.asarray(xs)))
    want = np.array([sc.xxhash64_u64(int(x)) for x in xs], dtype=np.uint64)
    assert (got == want).all()


def test_xxh64_u64_matches_scalar():
    rng = np.random.default_rng(6)
    xs = _rand64(rng, 300)
    got = _unpack(xxh64_u64(_pack(xs)))
    want = np.array([sc.xxhash64_u64(int(x)) for x in xs], dtype=np.uint64)
    assert (got == want).all()
