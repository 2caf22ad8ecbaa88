"""Phase split INSIDE resolve_field on the real chip (dev tool).

Times, by queue-drain difference: table transposes, one Mosaic sweep,
the full 5-sweep pass loop, and the emit-compaction tail, to find
where the ~40 ms/record goes.
"""
import functools
import time
import statistics
import numpy as np
import jax
import jax.numpy as jnp

from supersampler_tpu import enable_compilation_cache
enable_compilation_cache()

from supersampler_tpu.core.scalar import compute_threshold
from supersampler_tpu.ops.minimizer import pack_2bit_np
from supersampler_tpu.ops import field as F
from supersampler_tpu.sketch.pipeline import device_scan_field_packed

K, M, S = 31, 11, 1000.0
PAD = 1 << 22
NREC = 4
TRIALS = 3
W = K - M + 1
B = F._B

thr = compute_threshold(K, M, S)
thi, tlo = jnp.uint32(thr >> 32), jnp.uint32(thr & 0xFFFFFFFF)
rng = np.random.default_rng(1312)
glen = PAD - 512

ext_dev = []
for _ in range(NREC):
    c = np.zeros(PAD + 128, np.uint8)
    c[128 : 128 + glen] = rng.integers(0, 4, size=glen, dtype=np.uint8)
    ext_dev.append(jax.device_put(pack_2bit_np(c)))
for p in ext_dev:
    np.asarray(jnp.sum(p.astype(jnp.uint32)))

fts = [device_scan_field_packed(ext_dev[i][32:], K, M, PAD,
                                jnp.int32(glen), True)
       for i in range(NREC)]
entries = [F.field_entry_init(ft, thi, tlo) for ft in fts]
jax.block_until_ready(fts)
jax.block_until_ready(entries)

n_real = PAD // B


@jax.jit
def prep(t):
    """Transposes + sync/fs/lane setup (everything before sweep 1)."""
    tT = F._transpose_tables(t, n_real)
    sync2 = t.sync.reshape(n_real, B)
    has_sync = jnp.any(sync2, axis=1)
    fs = jnp.where(has_sync,
                   jnp.argmax(sync2, axis=1).astype(jnp.int32), B)
    return tuple(a + 0 for a in tT), has_sync, fs


def mk_state(n_blk):
    return F.FieldState(
        val=jnp.zeros((n_blk,), jnp.uint32),
        h_hi=jnp.full((n_blk,), 0xFFFFFFFF, jnp.uint32),
        h_lo=jnp.full((n_blk,), 0xFFFFFFFF, jnp.uint32),
        p=jnp.zeros((n_blk,), jnp.int32),
        last_ev=jnp.full((n_blk,), -1, jnp.int32),
        n_ev=jnp.zeros((n_blk,), jnp.int32))


@jax.jit
def sweep1(t):
    tT = F._transpose_tables(t, n_real)
    sync2 = t.sync.reshape(n_real, B)
    has_sync = jnp.any(sync2, axis=1)
    fs = jnp.where(has_sync,
                   jnp.argmax(sync2, axis=1).astype(jnp.int32), B)
    st, ev, pv, plast = F._sweep_pallas(
        tT, t.last_i, W, n_real, mk_state(n_real), fs,
        jnp.full((n_real,), B, jnp.int32), has_sync, True, thi, tlo)
    return st.n_ev.sum() + ev.sum() + pv.sum() + plast.sum()


@functools.partial(jax.jit, static_argnums=(2,))
def resolve_partial(t, entry, tail: bool):
    """resolve_field with the compaction tail optionally stubbed."""
    arr = F.resolve_field(t, K, M, 4096, entry, thi, tlo)
    return arr if tail else arr[:12]


def timed(name, fn, *a):
    def drain(n):
        t0 = time.perf_counter()
        r = None
        for i in range(n):
            r = fn(*(x[i % NREC] for x in a))
        jax.block_until_ready(r)
        return time.perf_counter() - t0
    drain(2)
    ts = statistics.median([drain(NREC) for _ in range(TRIALS)])
    tl = statistics.median([drain(2 * NREC) for _ in range(TRIALS)])
    dt = (tl - ts) / NREC
    print(f"{name:12s}: {dt*1e3:8.2f} ms/record")


timed("prep", prep, fts)
timed("sweep1", sweep1, fts)
timed("resolve", lambda t, e: resolve_partial(t, e, True), fts, entries)
timed("resolve-head", lambda t, e: resolve_partial(t, e, False),
      fts, entries)
