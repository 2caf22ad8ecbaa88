"""Chain walker (ops/walker.py) vs the pointer-doubling reference path.

The TPU Pallas kernel itself is exercised in interpret mode on a tiny
input (one grid block — interpret mode costs a Python dispatch per
serial step); the XLA while_loop fallback (what CPU runs) is checked
against ops/chain.compact_chain on larger fuzzed inputs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from supersampler_tpu.core.scalar import compute_threshold
from supersampler_tpu.ops import u64 as U
from supersampler_tpu.ops.chain import compact_chain
from supersampler_tpu.ops.minimizer import scan_tables_2d
from supersampler_tpu.ops.walker import (DeviceChain, make_init5,
                                         pack_succ, walk_pallas,
                                         walk_xla, _BP, _init5_from_tables)


def _tables(L, s, seed, k=31, m=11):
    P = 1024
    while P < L + 200:
        P *= 2
    thr = compute_threshold(k, m, s)
    rng = np.random.default_rng(seed)
    codes = np.zeros(P, np.uint8)
    codes[:L] = rng.integers(0, 4, L, dtype=np.uint8)
    return jax.jit(scan_tables_2d, static_argnums=(1, 2, 3))(
        jnp.asarray(codes), k, m, P, jnp.int32(L),
        U.U64(jnp.uint32(thr >> 32), jnp.uint32(thr & 0xFFFFFFFF)))


@pytest.mark.parametrize("L,s,seed", [
    (600, 10.0, 0), (1500, 2.0, 1), (900, 1.0, 2), (3000, 1000.0, 3),
    (5000, 5.0, 4),
])
def test_walker_matches_pointer_doubling(L, s, seed):
    t = _tables(L, s, seed)
    ref = compact_chain(t)
    got = DeviceChain(t).compact()
    for i, (a, b) in enumerate(zip(ref, got)):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape and np.all(a == b), (i, a, b)


def test_walker_overflow_retry():
    """A too-small speculative capacity must transparently re-compact."""
    t = _tables(2000, 1.0, 7)   # s=1: every boundary selected
    ref = compact_chain(t)
    dc = DeviceChain(t, sel_cap_guess=16)
    got = dc.compact()
    assert dc.n_sel > 16
    for a, b in zip(ref, got):
        assert np.all(np.asarray(a) == np.asarray(b))


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="compiled Mosaic kernel needs a TPU; interpret "
                           "mode costs minutes per serial step")
def test_pallas_kernel_matches_xla_walk():
    """The compiled Mosaic kernel == the XLA while_loop."""
    t = _tables(700, 3.0, 11)
    n = int(t.nxt_pos_a.shape[0])
    n_pad = ((n + _BP - 1) // _BP) * _BP
    packed = pack_succ(t, n_pad)
    args = (packed, _init5_from_tables(t))
    pe = walk_pallas(*args, interpret=False)
    xe = walk_xla(*args)
    # same per-block counts / scalars and the same emitted rows
    assert int(jnp.sum(pe[3])) == int(xe[3][0])
    assert np.all(np.asarray(pe[4]) == np.asarray(xe[4]))
    ncnt = int(xe[3][0])
    for pi, xi in zip(pe[:3], xe[:3]):
        # pallas tiles are (n_blocks, BP); single block here
        assert np.all(np.asarray(pi).reshape(-1)[:ncnt]
                      == np.asarray(xi).reshape(-1)[:ncnt])
