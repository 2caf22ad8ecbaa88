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

import functools

import jax

from supersampler_tpu.core.scalar import NUC2INT_LUT
from supersampler_tpu.ops import u64 as U
from supersampler_tpu.ops.minimizer import (pack_2bit_np, scan_tables_2d,
                                            scan_tables_2d_packed,
                                            walk_chain_host)
from supersampler_tpu.ops.walker import DeviceChain
from supersampler_tpu.oracle.subsampler import OracleSubsampler

_PAD_BUCKETS = [1 << b for b in range(10, 31)]

device_scan_2d = jax.jit(scan_tables_2d, static_argnums=(1, 2, 3, 6))
device_scan_2d_packed = jax.jit(scan_tables_2d_packed,
                                static_argnums=(1, 2, 3, 6))


def _scan_chain_packed(packed, k: int, m: int, P: int, length, thr_hi,
                       thr_lo, sel_cap_guess: int = 4096) -> DeviceChain:
    """2D scan + Pallas serial chain walk + speculative compaction —
    three asynchronous device dispatches, zero host syncs (the walk
    chases the event chain on the TPU scalar core; ops/walker.py).

    Kept as separate jit units: fusing them into one XLA program
    multiplies CPU-backend compile time ~10x for a ~1 ms dispatch win,
    and the intermediate ScanTables never leave the device either way."""
    t = device_scan_2d_packed(packed, k, m, P, length,
                              U.U64(thr_hi, thr_lo))
    return DeviceChain(t, sel_cap_guess=sel_cap_guess)


def padded_size(n: int, margin: int = 128) -> int:
    """Power-of-two padding with room for the 2D layout's halo
    (k + W lookahead columns wrap across rows)."""
    for b in _PAD_BUCKETS:
        if n + margin <= b:
            return b
    raise ValueError(f"sequence too long: {n}")


class TpuSubsampler(OracleSubsampler):
    """Sketch builder whose streaming scan runs on the TPU.

    Inherits bucket intake, greedy reconstruction, serialization and
    stats from the scalar spec; only scan_sequence is replaced.
    """

    _sel_cap_guess = 4096

    def _launch_scan(self, ref: bytes) -> DeviceChain:
        """Asynchronously dispatch the device scan + chain walk for one
        sequence (jax dispatch is non-blocking)."""
        k, m = self.k, self.m
        L = len(ref)
        if isinstance(ref, str):
            ref = ref.encode()
        codes_np = NUC2INT_LUT[np.frombuffer(ref, dtype=np.uint8)]
        margin = 2 * (2 * k - m + 2) + 128
        P = padded_size(L, margin)
        codes = np.zeros(P, dtype=np.uint8)
        codes[:L] = codes_np
        thr = self.threshold
        if self.s <= 1:
            # select-all: every boundary is selected; skip speculation
            guess = P
        else:
            guess = self._sel_cap_guess
        return _scan_chain_packed(
            jnp.asarray(pack_2bit_np(codes)), k, m, P, jnp.int32(L),
            jnp.uint32(thr >> 32), jnp.uint32(thr & 0xFFFFFFFF),
            sel_cap_guess=guess)

    def _finish_scan(self, ref: str, dc: DeviceChain) -> None:
        self._assemble_compact(ref, *dc.compact())
        # adapt the speculative compaction capacity to this input
        self._sel_cap_guess = max(4096, 2 * dc.n_sel)

    def scan_sequence(self, ref: str) -> None:
        self._finish_scan(ref, self._launch_scan(ref))

    def sketch_file(self, input_path: str):
        """Like OracleSubsampler.sketch_file but keeps a small window of
        sequences in flight on the device: the scan of record n+1..n+W
        overlaps with the host assembly of record n, and the compaction
        fetch (the host link has ~23 ms latency per transfer) runs on a
        background thread so it overlaps host work too."""
        import collections
        import concurrent.futures
        import os
        import sys

        from supersampler_tpu.io.fasta import iter_fasta_records
        from supersampler_tpu.core.scalar import MASK64

        k = self.k
        if not os.path.exists(input_path):
            log = self.log or sys.stdout
            print("Problem with file opening", file=log)
            print(f"Can't open file: {input_path}", file=log)
            return None
        window = 4
        pending = collections.deque()
        with concurrent.futures.ThreadPoolExecutor(1) as fetcher:
            for ref_bytes in iter_fasta_records(input_path):
                ref = ref_bytes
                if len(ref) < k:
                    ref = b""
                else:
                    self.read_kmer += len(ref) - k + 1
                if ref:
                    if len(pending) >= window:
                        r, fut = pending.popleft()
                        self._assemble_from(r, fut.result())
                    dc = self._launch_scan(ref)
                    pending.append((ref, fetcher.submit(self._fetch, dc)))
            while pending:
                r, fut = pending.popleft()
                self._assemble_from(r, fut.result())
        self.nb_mmer_selected = (self.nb_mmer_selected
                                 - (self.m - 1)) & MASK64
        return self.serialize()

    @staticmethod
    def _fetch(dc: DeviceChain):
        return dc.compact(), dc.n_sel

    def _assemble_from(self, ref: str, fetched) -> None:
        compact, n_sel = fetched
        self._assemble_compact(ref, *compact)
        self._sel_cap_guess = max(4096, 2 * n_sel)

    def _assemble_compact(self, ref, sel_pos, sel_last, sel_val, sel_rev,
                          n_ev, last_ev_pos, tail_val, tail_rev, tail_sel):
        """Replay the boundary loop (SubSampler.cpp:401-454) from the
        device-compacted selected boundaries.

        The aggregate counters telescope: each event n contributes
        pos[n]-pos[n-1] k-mers and the tail flush always fires (events
        are confined to i <= L-k-1), so the per-sequence totals are
        exactly L-k+1 k-mers and n_ev+1 super-k-mers.
        """
        k, m = self.k, self.m
        L = len(ref)
        self.total_kmer_number += L - k + 1
        self.total_superkmer_number += n_ev + 1
        pos_end = 0
        for j in range(len(sel_pos)):
            i = int(sel_pos[j])
            last_position = int(sel_last[j])
            if last_position + m - 2 > pos_end:
                if pos_end > 0:
                    self.nb_mmer_selected -= m - 1
                self.nb_mmer_selected += i + k - last_position
                self.nb_mmer_selected -= k - m
            else:
                self.nb_mmer_selected += i + k - (pos_end + 1)
            self.handle_superkmer(
                ref[last_position : i + k], int(sel_val[j]),
                bool(sel_rev[j]))
            pos_end = i + k - 1
        # tail flush (SubSampler.cpp:441-454); L - last_position > k-1
        # always holds since last_ev_pos <= L-k-1
        last_position = last_ev_pos + 1 if n_ev else 0
        if tail_sel:
            self.nb_mmer_selected -= m - 1
            self.handle_superkmer(ref[last_position:], int(tail_val),
                                  bool(tail_rev))

    def _assemble(self, ref, pos, val, rev, sel, init):
        """Replay the boundary bookkeeping of the reference loop
        (SubSampler.cpp:401-454) over the event list.

        Aggregate stats are vectorized; Python only touches the
        *selected* boundaries (the FHS-sampled tail).
        """
        k, m = self.k, self.m
        L = len(ref)
        n_ev = len(pos)
        # boundary n closes the super-k-mer started after boundary n-1,
        # carrying the PREVIOUS event's (or init's) payload
        last_positions = np.empty(n_ev, dtype=np.int64)
        prev_val = np.empty(n_ev, dtype=np.uint32)
        prev_rev = np.empty(n_ev, dtype=bool)
        prev_sel = np.empty(n_ev, dtype=bool)
        if n_ev:
            last_positions[0] = 0
            last_positions[1:] = pos[:-1] + 1
            prev_val[0], prev_rev[0], prev_sel[0] = init
            prev_val[1:] = val[:-1]
            prev_rev[1:] = rev[:-1]
            prev_sel[1:] = sel[:-1]
        self.total_kmer_number += int(np.sum(pos - last_positions + 1))
        self.total_superkmer_number += n_ev
        # selected boundaries: handle_superkmer + density bookkeeping
        # (pos_end is sequential but only across selected boundaries)
        pos_end = 0
        for n in np.nonzero(prev_sel)[0]:
            i = int(pos[n])
            last_position = int(last_positions[n])
            if last_position + m - 2 > pos_end:
                if pos_end > 0:
                    self.nb_mmer_selected -= m - 1
                self.nb_mmer_selected += i + k - last_position
                self.nb_mmer_selected -= k - m
            else:
                self.nb_mmer_selected += i + k - (pos_end + 1)
            self.handle_superkmer(
                ref[last_position : i + k], int(prev_val[n]),
                bool(prev_rev[n]))
            pos_end = i + k - 1
        # tail flush (SubSampler.cpp:441-454)
        if n_ev:
            last_position = int(pos[-1]) + 1
            t_val, t_rev, t_sel = int(val[-1]), bool(rev[-1]), bool(sel[-1])
        else:
            last_position = 0
            t_val, t_rev, t_sel = init
        i = L - k
        if L - last_position > k - 1:
            if t_sel:
                self.nb_mmer_selected -= m - 1
                self.handle_superkmer(
                    ref[last_position : i + k], t_val, t_rev)
            self.total_kmer_number += i - last_position + 1
            self.total_superkmer_number += 1
