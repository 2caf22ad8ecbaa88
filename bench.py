"""Benchmark: sketch-construction throughput on the TPU device path.

Prints ONE JSON line:
  {"metric": "sketch_throughput", "value": <Mbases/s>, "unit":
   "Mbases/s", "vs_baseline": <ratio vs 8-thread CPU reference>}

Baseline: the reference sub_sampler (g++ -Ofast, makefile flags) was
measured on this project's dev machine at 34.2 Mbases/s per core with
the standard config (k=31 m=11 s=1000, plain FASTA input, selection
cold path); the BASELINE.md north-star compares against an 8-thread
CPU run, extrapolated linearly (the reference's OpenMP fan-out is
embarrassingly parallel across files): 8 x 34.2 = 273.6 Mbases/s.
"""

import json
import time

import numpy as np

BASELINE_CPU_8T_MBASES_S = 273.6  # 8 x 34.2 (measured single-core rate)

K, M, S = 31, 11, 1000.0
PAD = 1 << 22          # 4 Mbp tiles
BATCH = 4              # sequences per device step
WARMUP = 2
ITERS = 5


def main():
    import jax
    import jax.numpy as jnp

    from supersampler_tpu.core.scalar import compute_threshold
    from supersampler_tpu.ops import u64 as U
    from supersampler_tpu.ops.minimizer import scan_tables, walk_chain_host
    from supersampler_tpu.parallel.mesh import batched_scan_fn

    thr = compute_threshold(K, M, S)
    rng = np.random.default_rng(1312)
    codes = jnp.asarray(
        rng.integers(0, 4, size=(BATCH, PAD), dtype=np.uint8))
    lengths = jnp.full((BATCH,), PAD, jnp.int32)
    t_hi = jnp.uint32(thr >> 32)
    t_lo = jnp.uint32(thr & 0xFFFFFFFF)

    fn = jax.jit(batched_scan_fn(K, M, PAD))
    # compile + warmup
    for _ in range(WARMUP):
        out = fn(codes, lengths, t_hi, t_lo)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(codes, lengths, t_hi, t_lo)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    mbases = BATCH * PAD / 1e6
    device_mbps = mbases / dt

    # End-to-end (device scan + host chain walk + assembly bookkeeping)
    # measured once on a single tile for honesty about host overheads.
    from supersampler_tpu.sketch.pipeline import TpuSubsampler

    seq_codes = np.asarray(codes[0])
    one = jax.jit(
        lambda c, l: scan_tables(c, K, M, PAD, l, U.U64(t_hi, t_lo)))
    tables = one(codes[0], jnp.int32(PAD))
    jax.block_until_ready(tables)
    t0 = time.perf_counter()
    tables = one(codes[0], jnp.int32(PAD))
    jax.block_until_ready(tables)
    walk_chain_host(tables)
    e2e_dt = time.perf_counter() - t0
    e2e_mbps = PAD / 1e6 / e2e_dt

    result = {
        "metric": "sketch_throughput",
        "value": round(device_mbps, 1),
        "unit": "Mbases/s",
        "vs_baseline": round(device_mbps / BASELINE_CPU_8T_MBASES_S, 3),
        "detail": {
            "device_scan_mbases_s": round(device_mbps, 1),
            "end_to_end_mbases_s": round(e2e_mbps, 1),
            "config": {"k": K, "m": M, "s": S, "tile": PAD,
                       "batch": BATCH},
            "baseline_cpu_8t_mbases_s": BASELINE_CPU_8T_MBASES_S,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
