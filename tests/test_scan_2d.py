"""The 2D-tiled scan produces identical tables to the 1D reference scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supersampler_tpu.core.scalar import compute_threshold
from supersampler_tpu.ops import u64 as U
from supersampler_tpu.ops.minimizer import (ScanTables, scan_tables,
                                            scan_tables_2d)


@pytest.mark.parametrize("k,m,P,L", [
    (31, 11, 2048, 1900),
    (21, 7, 2048, 2048 - 200),
    (63, 15, 4096, 3500),
    (15, 5, 1024, 600),
    (31, 11, 2048, 31),     # single k-mer
    (31, 11, 2048, 100),
])
def test_2d_matches_1d(k, m, P, L):
    rng = np.random.default_rng(k * 100 + m)
    codes = np.zeros(P, dtype=np.uint8)
    codes[:L] = rng.integers(0, 4, size=L, dtype=np.uint8)
    thr = compute_threshold(k, m, 5.0)
    t64 = U.from_scalar(thr)
    a = jax.jit(scan_tables, static_argnums=(1, 2, 3))(
        jnp.asarray(codes), k, m, P, jnp.int32(L), t64)
    b = jax.jit(scan_tables_2d, static_argnums=(1, 2, 3, 6))(
        jnp.asarray(codes), k, m, P, jnp.int32(L), t64, 512)
    n_valid = max(L - k, 0)
    for x, y, name in zip(a, b, ScanTables._fields):
        xa, ya = np.asarray(x), np.asarray(y)
        if xa.ndim == 0:
            assert xa == ya, name
        else:
            # successor positions past last_i are -1/masked in both
            assert np.array_equal(xa[:n_valid], ya[:n_valid]), name


@pytest.mark.parametrize("kind", ["random", "homopolymer_a",
                                  "homopolymer_t", "palindromes",
                                  "binary", "motif"])
def test_log_elections_match_fold(kind):
    """The O(log W) election reduction (_elect_log) is bit-identical to
    the exact fold on every content class, including the adversarial
    ones that exercise the mirrored-position tie rules: equal-value
    cross-strand runs, repeat motifs, homopolymers (the r5 negative
    perf result keeps the fold as the engine default, but the
    reduction's exactness stays pinned)."""
    import functools

    from supersampler_tpu.ops.minimizer import (_mmer_elect_block,
                                                _mmer_elect_block_log)

    @functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
    def both(c2, k, m, C, halo):
        ref = _mmer_elect_block(c2, k, m, C, halo)
        new = _mmer_elect_block_log(c2, k, m, C, halo)
        return (ref[3], ref[4], ref[5], ref[6].hi, ref[6].lo,
                new[3], new[4], new[5], new[6].hi, new[6].lo, new[8])

    rng = np.random.default_rng(hash(kind) % (2**32))
    for k, m in [(31, 11), (21, 9), (13, 11), (11, 11)]:
        W = k - m + 1
        halo = k + W
        C, R = 128, 3
        if kind == "random":
            codes = rng.integers(0, 4, (R, C + halo), dtype=np.uint8)
        elif kind == "homopolymer_a":
            codes = np.zeros((R, C + halo), np.uint8)
        elif kind == "homopolymer_t":
            codes = np.full((R, C + halo), 2, np.uint8)
        elif kind == "palindromes":
            codes = rng.integers(0, 4, (R, C + halo), dtype=np.uint8)
            for r in range(R):
                for _ in range(25):
                    p = int(rng.integers(0, C))
                    seg = codes[r, p : p + m]
                    rc = seg[::-1] ^ 2
                    q = p + int(rng.integers(1, max(W, 2)))
                    e = min(q + m, codes.shape[1])
                    codes[r, q:e] = rc[: e - q]
        elif kind == "binary":
            codes = rng.integers(0, 2, (R, C + halo), dtype=np.uint8)
        else:
            motif = rng.integers(0, 4, int(rng.integers(3, m + 2)),
                                 dtype=np.uint8)
            row = np.tile(motif, (C + halo) // len(motif) + 1)[: C + halo]
            codes = np.tile(row, (R, 1))
        outs = [np.asarray(a) for a in both(
            jnp.asarray(codes.astype(np.uint32)), k, m, C, halo)]
        for a, b, name in zip(outs[:5], outs[5:10],
                              ("em", "ep", "er", "eh_hi", "eh_lo")):
            assert np.array_equal(a, b), (kind, k, m, name)
        assert int(outs[10].sum()) == 0, (kind, k, m, "spurious flag")
