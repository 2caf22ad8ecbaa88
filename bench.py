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

    from supersampler_tpu import enable_compilation_cache
    enable_compilation_cache()

    from supersampler_tpu.core.scalar import compute_threshold
    from supersampler_tpu.ops import u64 as U
    from supersampler_tpu.ops.minimizer import scan_tables_2d, walk_chain_host

    thr = compute_threshold(K, M, S)
    rng = np.random.default_rng(1312)
    usable = PAD - 256
    codes = jnp.asarray(
        rng.integers(0, 4, size=(BATCH, PAD), dtype=np.uint8))
    lengths = jnp.full((BATCH,), usable, jnp.int32)
    t_hi = jnp.uint32(thr >> 32)
    t_lo = jnp.uint32(thr & 0xFFFFFFFF)

    def one(c, l, hi, lo):
        return scan_tables_2d(c, K, M, PAD, l, U.U64(hi, lo))

    fn = jax.jit(jax.vmap(one, in_axes=(0, 0, None, None)))
    # compile + warmup
    for _ in range(WARMUP):
        out = fn(codes, lengths, t_hi, t_lo)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(codes, lengths, t_hi, t_lo)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    mbases = BATCH * usable / 1e6
    device_mbps = mbases / dt

    # End-to-end: full sketch of a synthetic genome through the public
    # pipeline (device scan + native chain walk + host assembly +
    # serialization), honest about every host overhead.
    from supersampler_tpu.sketch.pipeline import TpuSubsampler, padded_size

    genome_len = PAD - 512  # pads to the already-compiled tile size
    seq = "".join("ACGT"[c] for c in np.asarray(codes[0])[:genome_len])
    import os
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False) as f:
        f.write(">bench\n")
        f.write(seq)
        fa_path = f.name
    ss = TpuSubsampler(k=K, m=M, s=S)
    ss.sketch_file(fa_path)  # warmup (compile for this padded size)
    ss = TpuSubsampler(k=K, m=M, s=S)
    t0 = time.perf_counter()
    ss.sketch_file(fa_path)
    e2e_dt = time.perf_counter() - t0
    e2e_mbps = genome_len / 1e6 / e2e_dt
    os.unlink(fa_path)

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
