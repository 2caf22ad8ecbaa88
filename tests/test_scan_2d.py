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
