"""TPU sketch-construction pipeline.

The per-position hash/election math runs on device (ops/minimizer.py);
the event chain (super-k-mer boundaries) is extracted from the device's
successor tables; the tiny tail of selected super-k-mers is assembled
and serialized on host with the exact reference semantics (reused from
the oracle implementation, which is the tested scalar spec).

Equivalent call stack in the reference: Subsampler::parse_fasta_test
(SubSampler.cpp:306-510).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from supersampler_tpu.core.scalar import NUC2INT_LUT
from supersampler_tpu.ops import u64 as U
from supersampler_tpu.ops.minimizer import device_scan, walk_chain_host
from supersampler_tpu.oracle.subsampler import OracleSubsampler

_PAD_BUCKETS = [1 << b for b in range(10, 31)]


def padded_size(n: int) -> int:
    for b in _PAD_BUCKETS:
        if n + 2 <= b:
            return b
    raise ValueError(f"sequence too long: {n}")


class TpuSubsampler(OracleSubsampler):
    """Sketch builder whose streaming scan runs on the TPU.

    Inherits bucket intake, greedy reconstruction, serialization and
    stats from the scalar spec; only scan_sequence is replaced.
    """

    def scan_sequence(self, ref: str) -> None:
        k, m = self.k, self.m
        L = len(ref)
        codes_np = NUC2INT_LUT[np.frombuffer(ref.encode(), dtype=np.uint8)]
        P = padded_size(L)
        codes = np.zeros(P, dtype=np.uint8)
        codes[:L] = codes_np
        tables = device_scan(
            jnp.asarray(codes), k, m, P, jnp.int32(L),
            U.from_scalar(self.threshold))
        pos, typ, val, rev, sel, init = walk_chain_host(tables)
        self._assemble(ref, pos, val, rev, sel, init)

    def _assemble(self, ref, pos, val, rev, sel, init):
        """Replay the boundary bookkeeping of the reference loop
        (SubSampler.cpp:401-454) over the event list."""
        k, m = self.k, self.m
        L = len(ref)
        last_position = 0
        pos_end = 0
        prev_val, prev_rev, prev_sel = init
        for n in range(len(pos)):
            i = int(pos[n])
            if prev_sel:
                if last_position + m - 2 > pos_end:
                    if pos_end > 0:
                        self.nb_mmer_selected -= m - 1
                    self.nb_mmer_selected += i + k - last_position
                    self.nb_mmer_selected -= k - m
                else:
                    self.nb_mmer_selected += i + k - (pos_end + 1)
                self.handle_superkmer(
                    ref[last_position : i + k], int(prev_val),
                    bool(prev_rev))
                pos_end = i + k - 1
            self.total_kmer_number += i - last_position + 1
            self.total_superkmer_number += 1
            last_position = i + 1
            prev_val, prev_rev, prev_sel = int(val[n]), bool(rev[n]), bool(
                sel[n])
        i = L - k
        if L - last_position > k - 1:
            if prev_sel:
                self.nb_mmer_selected -= m - 1
                self.handle_superkmer(
                    ref[last_position : i + k], int(prev_val),
                    bool(prev_rev))
                pos_end = i + k - 1
            self.total_kmer_number += i - last_position + 1
            self.total_superkmer_number += 1
