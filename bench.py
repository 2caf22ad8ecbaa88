"""Benchmark: sketch-construction throughput on the TPU device path.

Prints ONE JSON line:
  {"metric": "sketch_throughput", "value": <Mbases/s>, "unit":
   "Mbases/s", "vs_baseline": <ratio vs 8-thread CPU reference>}

Baseline: the reference sub_sampler (g++ -Ofast, makefile flags) was
measured on this project's dev machine at 34.2 Mbases/s per core with
the standard config (k=31 m=11 s=1000, plain FASTA input); the
BASELINE.md north-star compares against an 8-thread CPU run,
extrapolated linearly (the reference's OpenMP fan-out is
embarrassingly parallel across files): 8 x 34.2 = 273.6 Mbases/s.

Measurement notes for this TPU pod-slice tunnel:
  * jax.block_until_ready does NOT reliably block on the axon
    platform, so timings are forced by an actual result fetch;
  * the host link costs ~23 ms latency per device->host fetch and
    ~100 MB/s host->device, so two numbers are reported:
      - device_path: N records' scan+walk+compact enqueued back-to-back,
        wall-clocked to the final record's result fetch (the device
        executes its queue in order) — the per-chip sketching rate;
      - end_to_end: TpuSubsampler.sketch_file wall time including FASTA
        parsing, host link transfers, host assembly and serialization.
The headline value is the end-to-end rate (everything included).
"""

import json
import os
import tempfile
import time

import numpy as np

BASELINE_CPU_8T_MBASES_S = 273.6  # 8 x 34.2 (measured single-core rate)

K, M, S = 31, 11, 1000.0
PAD = 1 << 22          # 4 Mbp tiles
NREC = 8
WARMUP = 1
TRIALS = 3


def main():
    import jax
    import jax.numpy as jnp

    from supersampler_tpu import enable_compilation_cache
    enable_compilation_cache()

    from supersampler_tpu.core.scalar import compute_threshold
    from supersampler_tpu.ops import u64 as U
    from supersampler_tpu.ops.minimizer import (pack_2bit_np,
                                                scan_tables_2d_packed)
    from supersampler_tpu.ops.walker import DeviceChain
    from supersampler_tpu.sketch.pipeline import TpuSubsampler

    thr = compute_threshold(K, M, S)
    thrv = U.U64(jnp.uint32(thr >> 32), jnp.uint32(thr & 0xFFFFFFFF))
    scan = jax.jit(scan_tables_2d_packed, static_argnums=(1, 2, 3))
    rng = np.random.default_rng(1312)
    glen = PAD - 512

    # shared synthetic inputs
    record_codes = [rng.integers(0, 4, size=glen, dtype=np.uint8)
                    for _ in range(NREC)]

    # --- device path: queue-drain over NREC records --------------------
    packed_in = []
    for codes in record_codes:
        c = np.zeros(PAD, np.uint8)
        c[:glen] = codes
        packed_in.append(pack_2bit_np(c))
    t = scan(jax.device_put(packed_in[0]), K, M, PAD, jnp.int32(glen), thrv)
    DeviceChain(t).compact()     # compile + warm
    device_dt = 1e9
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        dcs = []
        for p in packed_in:
            t = scan(jax.device_put(p), K, M, PAD, jnp.int32(glen), thrv)
            dcs.append(DeviceChain(t))
        dcs[-1].compact()        # drains the in-order device queue
        device_dt = min(device_dt, time.perf_counter() - t0)
    device_mbps = NREC * glen / 1e6 / device_dt

    # --- end to end: full public pipeline over one FASTA ---------------
    nuc = np.frombuffer(b"ACGT", np.uint8)
    with tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False) as f:
        for i, codes in enumerate(record_codes):
            f.write(f">r{i}\n")
            f.write(nuc[codes].tobytes().decode())
            f.write("\n")
        fa_path = f.name
    try:
        TpuSubsampler(k=K, m=M, s=S).sketch_file(fa_path)   # warm
        e2e_dt = 1e9
        for _ in range(TRIALS):
            ss = TpuSubsampler(k=K, m=M, s=S)
            t0 = time.perf_counter()
            ss.sketch_file(fa_path)
            e2e_dt = min(e2e_dt, time.perf_counter() - t0)
    finally:
        os.unlink(fa_path)
    e2e_mbps = NREC * glen / 1e6 / e2e_dt

    result = {
        "metric": "sketch_throughput",
        "value": round(e2e_mbps, 1),
        "unit": "Mbases/s",
        "vs_baseline": round(e2e_mbps / BASELINE_CPU_8T_MBASES_S, 3),
        "detail": {
            "end_to_end_mbases_s": round(e2e_mbps, 1),
            "device_path_mbases_s": round(device_mbps, 1),
            "device_path_vs_baseline": round(
                device_mbps / BASELINE_CPU_8T_MBASES_S, 3),
            "config": {"k": K, "m": M, "s": S, "tile": PAD,
                       "records": NREC},
            "baseline_cpu_8t_mbases_s": BASELINE_CPU_8T_MBASES_S,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
