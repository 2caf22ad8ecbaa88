"""Phase profile of TpuSubsampler.sketch_file on the bench corpus
(dev tool): prints the process-wide phase timers after N runs."""

import os
import sys
import tempfile
import time

import numpy as np

from supersampler_tpu import enable_compilation_cache
enable_compilation_cache()

from supersampler_tpu.ops.minimizer import pack_2bit_np  # noqa: E402
from supersampler_tpu.sketch.pipeline import TpuSubsampler  # noqa: E402
from supersampler_tpu.utils.profiling import timers  # noqa: E402

K, M, S = 31, 11, 1000.0
PAD = 1 << 22
NREC = 8
RUNS = 3

rng = np.random.default_rng(1312)
glen = PAD - 512
nuc = np.frombuffer(b"ACGT", np.uint8)
tmpdir = tempfile.mkdtemp(prefix="spsp_phase_")
fa = os.path.join(tmpdir, "bench.fa")
with open(fa, "w") as f:
    for i in range(NREC):
        codes = rng.integers(0, 4, size=glen, dtype=np.uint8)
        f.write(f">r{i}\n" + nuc[codes].tobytes().decode() + "\n")

TpuSubsampler(k=K, m=M, s=S).sketch_file(fa)   # warm/compile
timers.reset()
ts = []
for _ in range(RUNS):
    ss = TpuSubsampler(k=K, m=M, s=S)
    t0 = time.perf_counter()
    ss.sketch_file(fa)
    ts.append(time.perf_counter() - t0)
print("wall per run:", [round(t, 4) for t in ts])
print(timers.report())
print(f"(totals over {RUNS} runs; {NREC * glen / 1e6:.1f} Mbases/run)",
      file=sys.stderr)
