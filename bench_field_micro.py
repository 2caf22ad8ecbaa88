"""Micro-benchmark: field-engine phase split on the real chip.

Times (a) scan_field (tables build), (b) resolve_field (sweeps +
compaction), each by queue-drain difference so dispatch/fetch
constants cancel. Not part of bench.py's JSON contract — a dev tool
for the round-4 kernel-glue work.
"""
import time
import statistics
import numpy as np
import jax
import jax.numpy as jnp

from supersampler_tpu import enable_compilation_cache
enable_compilation_cache()

from supersampler_tpu.core.scalar import compute_threshold
from supersampler_tpu.ops.minimizer import pack_2bit_np
from supersampler_tpu.ops.field import field_entry_init, resolve_field
from supersampler_tpu.sketch.pipeline import device_scan_field_packed

K, M, S = 31, 11, 1000.0
PAD = 1 << 22
NREC = 4
TRIALS = 5

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


def med(f, n):
    ts = [f(n) for _ in range(TRIALS)]
    return statistics.median(ts)


# precompute tables once for the resolve-only timing
fts = [device_scan_field_packed(ext_dev[i][32:], K, M, PAD,
                                jnp.int32(glen), True)
       for i in range(NREC)]
entries = [field_entry_init(ft, thi, tlo) for ft in fts]
jax.block_until_ready(fts)
jax.block_until_ready(entries)


def drain_scan(n):
    t0 = time.perf_counter()
    ft = None
    for i in range(n):
        ft = device_scan_field_packed(ext_dev[i % NREC][32:], K, M, PAD,
                                      jnp.int32(glen), True)
    jax.block_until_ready(ft)
    return time.perf_counter() - t0


def drain_resolve(n):
    t0 = time.perf_counter()
    arr = None
    for i in range(n):
        arr = resolve_field(fts[i % NREC], K, M, 4096,
                            entries[i % NREC], thi, tlo)
    jax.device_get(arr)
    return time.perf_counter() - t0


def drain_both(n):
    t0 = time.perf_counter()
    arr = None
    for i in range(n):
        ft = device_scan_field_packed(ext_dev[i % NREC][32:], K, M, PAD,
                                      jnp.int32(glen), True)
        entry = field_entry_init(ft, thi, tlo)
        arr = resolve_field(ft, K, M, 4096, entry, thi, tlo)
    jax.device_get(arr)
    return time.perf_counter() - t0


for name, f in [("scan", drain_scan), ("resolve", drain_resolve),
                ("both", drain_both)]:
    f(2)  # warm/compile
    ts = med(f, NREC)
    tl = med(f, 2 * NREC)
    dt = (tl - ts) / NREC
    print(f"{name:8s}: {dt*1e3:8.2f} ms/record   "
          f"{glen/1e6/dt:8.1f} Mbases/s")
