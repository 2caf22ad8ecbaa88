"""Bounded-memory streaming comparison over sketch collections.

The reference comparator holds only the OPEN buckets of its N-way
merge in memory (reference Comparator.cpp:39-74); the batch engine in
compare/merge.py instead decodes every sketch fully and lexsorts the
global pair array — fine at N=8, not at large collections. This module
restores the bounded-memory profile for the vectorized engine:

* BucketStream: raw per-bucket cursor over one sketch file with
  byte-offset checkpointing (sketches are sorted by minimizer,
  reference SubSampler.h:62, so a global minimizer bound defines a
  clean chunk boundary);
* chunk_rounds: the N-way chunker — each round buffers raw buckets up
  to a payload budget per file, takes the MIN of the files' high-water
  minimizers as the chunk bound, and yields every file's buckets at or
  below it (all pairs of a minimizer land in exactly one chunk, so
  per-chunk grouping/dedup equals global);
* decode_bucket_pairs: vectorized decode of a chunk's buckets
  (batched across buckets exactly like compare.reader).

Chunks also give shard-resumable comparison (SURVEY §5): after each
chunk the comparator can persist {per-file offsets, partial scores}
and a restart seeks straight to the first unfinished chunk
(compare/merge.py TpuComparator.compare_sketches_chunked).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from supersampler_tpu.compare.reader import (blob_to_codes,
                                             canonical_kmers)
from supersampler_tpu.core.scalar import NUC2INT_LUT
from supersampler_tpu.io.fasta import open_maybe_gzip

U64 = np.uint64


class BucketStream:
    """Raw bucket cursor over one decompressed sketch.

    Buckets are yielded in file order (ascending minimizer). `offset`
    is the byte position of the NEXT unread bucket in the decompressed
    stream — a durable resume token (seeking = re-reading the gzip up
    to that offset, cheap next to decode+score).
    """

    def __init__(self, path: str, offset: Optional[int] = None):
        with open_maybe_gzip(path) as f:
            self.data = f.read()
        nl = self.data.index(b"\n")
        parts = self.data[:nl].split(b" ")
        self.skmer_size_hdr = int(parts[0])
        self.m = int(parts[1])
        self.k = (self.skmer_size_hdr + self.m) // 2
        self.offset = (nl + 1) if offset is None else offset
        self._buf: List[Tuple[int, bytes, List[bytes]]] = []
        self._buf_bytes = 0

    def exhausted(self) -> bool:
        return not self._buf and self.offset + self.m > len(self.data)

    def _read_one(self):
        """Parse one raw bucket at the cursor (reference bucket wire
        format, SubSampler.cpp:456-504)."""
        data, m = self.data, self.m
        start = self.offset
        pos = self.offset
        minstr = data[pos : pos + m]
        pos += m
        (size,) = struct.unpack_from("<I", data, pos)
        pos += 4
        blob = data[pos : pos + size]
        pos += size
        lines: List[bytes] = []
        while True:
            nl1 = data.index(b"\n", pos)
            l1 = data[pos:nl1]
            pos = nl1 + 1
            nl2 = data.index(b"\n", pos)
            l2 = data[pos:nl2]
            pos = nl2 + 1
            if not l1 and not l2:
                break
            lines.append(l1)
            lines.append(l2)
        self.offset = pos
        mcodes = NUC2INT_LUT[np.frombuffer(minstr, dtype=np.uint8)]
        mval = 0
        for c in mcodes:
            mval = (mval << 2) | int(c)
        self._buf.append((start, mval, blob, lines))
        self._buf_bytes += len(blob) + sum(len(x) for x in lines)

    def fill(self, target_bytes: int) -> None:
        """Buffer raw buckets until ~target_bytes of payload (or EOF)."""
        while (self._buf_bytes < target_bytes
               and self.offset + self.m <= len(self.data)):
            self._read_one()

    def high_minimizer(self) -> int:
        """Largest buffered minimizer; -1 with an empty buffer. When
        the file is exhausted the buffer covers everything, reported
        as +inf so it never constrains the chunk bound."""
        if self.offset + self.m > len(self.data):
            return 1 << 62
        return self._buf[-1][1] if self._buf else -1

    def take_until(self, bound: int):
        """Pop and return buffered (mval, blob, lines) buckets with
        minimizer <= bound."""
        out = []
        while self._buf and self._buf[0][1] <= bound:
            _off, mval, blob, lines = self._buf.pop(0)
            self._buf_bytes -= (len(blob)
                                + sum(len(x) for x in lines))
            out.append((mval, blob, lines))
        return out

    def resume_offset(self) -> int:
        """Byte offset of the first UNCONSUMED bucket — the durable
        resume token (buffered-but-untaken buckets must be re-read)."""
        return self._buf[0][0] if self._buf else self.offset


def decode_bucket_pairs(buckets, k: int, m: int):
    """Vectorized decode of raw buckets -> distinct
    (minimizer u64[], kmer_hi u64[], kmer_lo u64[]) pair arrays
    (dedup per bucket like the reference's color/skip maps,
    Comparator.cpp:97-264). Batched across buckets: all maximal
    super-k-mers share one row length; plaintext rows group by
    length."""
    half = k - m
    bucket_minimizers: List[int] = []
    max_rows: List[np.ndarray] = []
    max_bids: List[np.ndarray] = []
    plain: Dict[int, Tuple[list, list]] = {}
    for bid, (mval, blob, lines) in enumerate(buckets):
        bucket_minimizers.append(mval)
        mcodes = np.empty(m, dtype=np.uint8)
        v = mval
        for j in range(m - 1, -1, -1):
            mcodes[j] = v & 3
            v >>= 2
        codes = blob_to_codes(blob)
        n_sk = codes.size // (2 * half) if half > 0 else 0
        if n_sk > 0:
            halves = codes[: n_sk * 2 * half].reshape(n_sk, 2 * half)
            rows = np.concatenate(
                [halves[:, :half],
                 np.broadcast_to(mcodes, (n_sk, m)),
                 halves[:, half:]], axis=1)
            max_rows.append(rows)
            max_bids.append(np.full(n_sk, bid, np.int64))
        for i in range(0, len(lines), 2):
            left = NUC2INT_LUT[np.frombuffer(lines[i], dtype=np.uint8)]
            right = NUC2INT_LUT[np.frombuffer(lines[i + 1],
                                              dtype=np.uint8)]
            seq = np.concatenate([left, mcodes, right])
            if seq.size >= k:
                bids, rows = plain.setdefault(seq.size, ([], []))
                bids.append(bid)
                rows.append(seq)

    bid_l: List[np.ndarray] = []
    his_l: List[np.ndarray] = []
    los_l: List[np.ndarray] = []
    if max_rows:
        rows = np.concatenate(max_rows)
        bids = np.concatenate(max_bids)
        hi, lo = canonical_kmers(rows, k)
        nw = hi.shape[1]
        bid_l.append(np.repeat(bids, nw))
        his_l.append(hi.ravel())
        los_l.append(lo.ravel())
    for size, (bids, rows) in plain.items():
        arr = np.stack(rows)
        hi, lo = canonical_kmers(arr, k)
        nw = hi.shape[1]
        bid_l.append(np.repeat(np.asarray(bids, np.int64), nw))
        his_l.append(hi.ravel())
        los_l.append(lo.ravel())
    if not bid_l:
        z = np.zeros(0, dtype=U64)
        return z, z.copy(), z.copy()

    bids = np.concatenate(bid_l)
    his = np.concatenate(his_l)
    los = np.concatenate(los_l)
    order = np.lexsort((los, his, bids))
    bids, his, los = bids[order], his[order], los[order]
    keep = np.ones(his.size, dtype=bool)
    keep[1:] = ((bids[1:] != bids[:-1]) | (his[1:] != his[:-1])
                | (los[1:] != los[:-1]))
    bids, his, los = bids[keep], his[keep], los[keep]
    mins = np.asarray(bucket_minimizers, dtype=U64)[bids]
    return mins, his, los


def chunk_rounds(streams: List[BucketStream], chunk_bytes: int):
    """Yield chunks of the N-way bucket merge under a payload budget.

    Each yielded item is (chunk_index, per_file_buckets, offsets)
    where per_file_buckets[f] is file f's raw buckets for the chunk's
    minimizer range and offsets[f] is f's resume offset AFTER the
    chunk. Every minimizer's buckets across all files land in exactly
    one chunk (the bound is the min of the files' buffered high-water
    minimizers, so no file can still hold an unread bucket at or below
    it)."""
    per_file = max(chunk_bytes // max(len(streams), 1), 256)
    idx = 0
    while True:
        live = False
        for st in streams:
            st.fill(per_file)
            live = live or st._buf
        if not live:
            return
        bound = min(st.high_minimizer() for st in streams)
        chunk = [st.take_until(bound) for st in streams]
        offsets = [st.resume_offset() for st in streams]
        yield idx, chunk, offsets
        idx += 1
