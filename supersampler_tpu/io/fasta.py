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


import numpy as np

_KEEP_LUT = np.zeros(256, dtype=bool)
for _c in b"ACGTacgt":
    _KEEP_LUT[_c] = True
_UPPER_LUT = np.arange(256, dtype=np.uint8)
for _c in b"acgt":
    _UPPER_LUT[_c] = _c - 32


def clean_dna(s: bytes) -> bytes:
    """Strip non-ACGT and uppercase (reference utils.cpp:675-702)."""
    arr = np.frombuffer(s, dtype=np.uint8)
    kept = arr[_KEEP_LUT[arr]]
    return _UPPER_LUT[kept].tobytes()


def iter_fasta_records(path: str) -> Iterator[bytes]:
    """Yield cleaned sequences exactly as the reference's read loop does
    (reference SubSampler.cpp:334-347 + utils.cpp:706-718).

    Every yielded item corresponds to one getLineFasta call (possibly an
    empty sequence); the caller applies the length-k filter.
    """
    with open_maybe_gzip(path) as f:
        data = f.read()
    lines: List[bytes] = data.split(b"\n")
    # A trailing newline produces a final empty element that getline would
    # never return (eof); drop it.
    if lines and lines[-1] == b"":
        lines.pop()
    i = 0
    n = len(lines)
    while i < n:
        i += 1  # getLineFasta discards the current (header) line
        chunks: List[bytes] = []
        while i < n and not lines[i].startswith(b">"):
            chunks.append(lines[i])
            i += 1
        yield clean_dna(b"".join(chunks))


def read_fof(path: str) -> List[str]:
    """File-of-files reader. The subsampler keeps lines with size > 3
    (reference SubSampler.cpp:780); the comparator keeps size > 2
    (reference Comparator.cpp:17). Use min_len to select."""
    out = []
    with open_maybe_gzip(path) as f:
        for raw in f.read().split(b"\n"):
            out.append(raw.decode())
    return out


def get_out_name(path: str, prefix: str) -> str:
    """Output naming: prefix + basename up to the first '.', emitted in the
    CWD (reference SubSampler.cpp:196-221 ignores the directory part)."""
    base = path.rsplit("/", 1)[-1]
    stem = base.split(".", 1)[0]
    return prefix + stem
