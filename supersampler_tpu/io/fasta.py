"""FASTA input with the reference's exact parsing semantics.

The reference reads records with getLineFasta (reference utils.cpp:706-718):
discard the current line, then concatenate lines until the next '>' or EOF,
then clean_dna (reference utils.cpp:675-702) strips every non-ACGT character
-- JOINING the flanks (this creates chimeric k-mers across N-runs, which we
replicate) -- and uppercases.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator, List


def open_maybe_gzip(path: str) -> io.BufferedReader:
    """Open a file, auto-detecting gzip by magic bytes (zstr behavior,
    reference include/zstr.hpp)."""
    f = open(path, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == b"\x1f\x8b":
        return gzip.open(f, "rb")  # type: ignore[return-value]
    return f


_UPPER_TRANS = bytes.maketrans(b"acgt", b"ACGT")
_DELETE_NON_ACGT = bytes(c for c in range(256) if c not in b"ACGTacgt")


def clean_dna(s: bytes) -> bytes:
    """Strip non-ACGT and uppercase (reference utils.cpp:675-702) — one
    C-level translate call."""
    return s.translate(_UPPER_TRANS, _DELETE_NON_ACGT)


def iter_fasta_raw(path: str) -> Iterator[bytes]:
    """Yield RAW record bodies (header stripped, lines joined with
    their newlines still embedded); callers clean_dna them — possibly
    off-thread (the translate is the parse hot spot)."""
    with open_maybe_gzip(path) as f:
        data = f.read()
    pos = 0
    n = len(data)
    while pos < n:
        nl = data.find(b"\n", pos)   # discard the current (header) line
        if nl < 0:
            yield b""
            break
        nxt = data.find(b"\n>", nl)
        if nxt < 0:
            body = data[nl + 1:]
            pos = n
        else:
            body = data[nl + 1 : nxt]
            pos = nxt + 1
        yield body


def read_fasta_spans(path: str):
    """Read the whole file once and return (data, [(start, end), ...])
    where data[start:end] is each RAW record body (newlines embedded) —
    zero-copy record access for the native clean+pack path
    (reference getLineFasta semantics, utils.cpp:706-718)."""
    with open_maybe_gzip(path) as f:
        data = f.read()
    spans = []
    pos = 0
    n = len(data)
    while pos < n:
        nl = data.find(b"\n", pos)   # discard the current (header) line
        if nl < 0:
            spans.append((n, n))
            break
        nxt = data.find(b"\n>", nl)
        if nxt < 0:
            spans.append((nl + 1, n))
            pos = n
        else:
            spans.append((nl + 1, nxt))
            pos = nxt + 1
    return data, spans


def stream_fasta_spans(path: str, window_bytes: int = 4 << 20,
                       max_records: int = 4096):
    """Stream (data, spans) blocks with whole-record raw spans, reading
    the (possibly gzip) input incrementally with O(window + largest
    record) host memory — the bounded-memory analog of
    read_fasta_spans (the reference streams input through zstr with a
    fixed window, include/zstr.hpp:397-399 + utils.cpp:357-364, while
    holding one record; this holds one block of records).

    Span semantics are identical to read_fasta_spans: each span is one
    getLineFasta record body (header line dropped, newlines embedded,
    chimeric N-joins preserved downstream by clean_dna). A block
    closes when its payload reaches window_bytes or max_records; the
    partially-read tail carries into the next block's buffer."""
    from supersampler_tpu.utils.profiling import phase

    with open_maybe_gzip(path) as f:
        buf = bytearray()
        eof = False

        def refill():
            nonlocal eof
            with phase("parse"):
                chunk = f.read(window_bytes)
            if chunk:
                buf.extend(chunk)
            else:
                eof = True

        pos = 0
        spans = []
        payload = 0
        while True:
            nl = buf.find(b"\n", pos)
            while nl < 0 and not eof:
                refill()
                nl = buf.find(b"\n", pos)
            if nl < 0:
                # EOF inside the header line (or empty input):
                # read_fasta_spans emits an empty body span only when
                # any bytes remain
                if pos < len(buf):
                    spans.append((len(buf), len(buf)))
                break
            start = nl + 1
            sfrom = nl
            while True:
                nxt = buf.find(b"\n>", sfrom)
                if nxt >= 0:
                    end, pos = nxt, nxt + 1
                    break
                if eof:
                    end = pos = len(buf)
                    break
                # a "\n" at the buffer edge may pair with an unread
                # ">": re-scan from one byte back after refilling
                sfrom = max(nl, len(buf) - 1)
                refill()
            spans.append((start, end))
            payload += end - start
            at_eof = eof and pos >= len(buf)
            if (payload >= window_bytes or len(spans) >= max_records
                    or at_eof):
                yield bytes(buf), spans
                if at_eof:
                    return
                tail = bytes(buf[pos:])
                buf = bytearray(tail)
                pos = 0
                spans = []
                payload = 0
            if eof and pos >= len(buf):
                break
        if spans:
            yield bytes(buf), spans


def iter_fasta_records(path: str) -> Iterator[bytes]:
    """Yield cleaned sequences exactly as the reference's read loop does
    (reference SubSampler.cpp:334-347 + utils.cpp:706-718).

    Every yielded item corresponds to one getLineFasta call (possibly an
    empty sequence); the caller applies the length-k filter. Record
    bodies are cleaned as whole slabs: newlines are non-ACGT, so
    clean_dna concatenates the body lines exactly like the reference's
    line loop (a '>' only ends a record at line start, i.e. after
    b"\\n")."""
    for body in iter_fasta_raw(path):
        yield clean_dna(body)


def read_fof(path: str, min_len: int = 3) -> List[str]:
    """File-of-files reader: keeps lines longer than ``min_len`` chars.
    The subsampler keeps lines with size > 3 (reference
    SubSampler.cpp:780); the comparator keeps size > 2 (reference
    Comparator.cpp:17)."""
    out = []
    with open_maybe_gzip(path) as f:
        for raw in f.read().split(b"\n"):
            if len(raw) > min_len:
                out.append(raw.decode())
    return out


def get_out_name(path: str, prefix: str) -> str:
    """Output naming: prefix + basename up to the first '.', emitted in the
    CWD (reference SubSampler.cpp:196-221 ignores the directory part)."""
    base = path.rsplit("/", 1)[-1]
    stem = base.split(".", 1)[0]
    return prefix + stem
