"""Bit-exact scalar reimplementation of the sketch builder.

Follows the reference streaming scan (reference SubSampler.cpp:306-510),
minimizer election (SubSampler.cpp:81-169), greedy reconstruction
(SubSampler.cpp:512-620) and serialization (SubSampler.cpp:456-504),
including its quirks:

* every rescan forces a super-k-mer boundary via ``dump`` even when the
  re-elected minimizer value is unchanged (SubSampler.cpp:391-401);
* after a rescan, ``position_min += (i + 1)`` converts the in-window
  position to an absolute one -- including for reverse-strand elections
  whose in-window position follows different arithmetic
  (SubSampler.cpp:81-169, 397);
* ``dump``/``is_rev`` are uninitialized in the reference; the compiled
  binaries (-O2 and -Ofast agree) behave as if false, which we pin;
* ``kmer_info.seen`` is uninitialized on one insert path
  (SubSampler.cpp:283-287); observed behavior is false;
* k-mer counts are uint8 and wrap (SubSampler.h:24);
* buckets iterate in ascending 2-bit minimizer order (std::map,
  SubSampler.h:62); k-mers within a bucket iterate in first-insertion
  order (ankerl::unordered_dense keeps a dense append-only vector).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

from supersampler_tpu.core.scalar import (
    MASK64,
    canonize,
    compute_threshold,
    format_double,
    num2str,
    nuc2int,
    nuc2intrc,
    revcomp_code,
    revcomp_str,
    str2num,
    str_compressor,
    unrevhash,
)
from supersampler_tpu.io.fasta import iter_fasta_records


# bytes-level tables for super-k-mer intake (handle_superkmer works on
# bytes to avoid str<->bytes round trips on the hot path)
_B4_BYTES = bytes.maketrans(b"ACTG", b"0123")
_COMP_BYTES = bytes.maketrans(
    bytes(range(256)),
    bytes({65: 84, 67: 71, 71: 67, 84: 65}.get(c, 65) for c in range(256)))


class KmerInfo:
    __slots__ = ("count", "pos_min", "seen")

    def __init__(self, count: int, pos_min: int):
        self.count = count
        self.pos_min = pos_min
        self.seen = False


class OracleSubsampler:
    """Scalar sketcher with the exact reference semantics."""

    def __init__(self, k: int = 31, m: int = 11, s: float = 1000.0,
                 abundance: int = 1):
        self.k = k
        self.m = m
        self.s = s
        self.abundance = abundance
        self.minimizer_number = 1 << (2 * m)
        self.mask_k = (1 << (2 * k)) - 1
        self.mask_m = self.minimizer_number - 1
        self.max_superkmer_size = k - m + 1
        self.threshold = compute_threshold(k, m, s)
        # minimizer -> {kmer -> KmerInfo}; dicts preserve insertion order,
        # matching ankerl::unordered_dense iteration (SURVEY.md section 7.3).
        self.minimizer_map: Dict[int, Dict[int, KmerInfo]] = {}
        # diagnostics stream; fof-mode workers point this at a buffer so
        # per-file output stays contiguous under the thread fan-out
        self.log = None
        self._reset_stats()

    def _reset_stats(self):
        self.total_kmer_number = 0
        self.total_superkmer_number = 0
        self.selected_kmer_number = 0
        self.selected_superkmer_number = 0
        self.count_maximal_skmer = 0
        self.nb_mmer_selected = 0
        self.seen_kmers_at_reconstruction = 0
        self.seen_superkmers_at_reconstruction = 0
        self.seen_max_superkmers_at_reconstruction = 0
        self.seen_unique_kmers_at_reconstruction = 0
        self.total_kmer_number_at_reconstruction = 0
        self.actual_minimizer_number = 0
        self.read_kmer = 0

    # ------------------------------------------------------------------
    # Minimizer election over one k-mer window (SubSampler.cpp:81-169).
    # ------------------------------------------------------------------
    def regular_minimizer_pos(self, seq: int) -> Tuple[int, int, bool]:
        k, m = self.k, self.m
        is_rev = False
        mmer = seq & self.mask_m
        mini = canonize(mmer, m)
        position = k - m
        if mini != mmer:
            is_rev = True
            position = 0
        hash_mini = unrevhash(mini)
        for i in range(1, k - m + 1):
            seq >>= 2
            mmer = seq & self.mask_m
            canon_mmer = canonize(mmer, m)
            local_rev = canon_mmer != mmer
            mmer = canon_mmer
            h = unrevhash(mmer)
            if hash_mini > h:
                position = k - m - i
                mini = mmer
                is_rev = local_rev
                hash_mini = h
            elif mmer == mini:
                if local_rev != is_rev:
                    pass  # keep the 3'-5' order minimizer (SubSampler.cpp:136-148)
                else:
                    if is_rev and position > i:
                        position = i
                        mini = mmer
                        is_rev = local_rev
                        hash_mini = h
                    if (not is_rev) and position > k - m - i:
                        position = k - m - i
                        mini = mmer
                        is_rev = local_rev
                        hash_mini = h
        return mini, position, is_rev

    # ------------------------------------------------------------------
    # Super-k-mer intake (SubSampler.cpp:243-302).
    # ------------------------------------------------------------------
    def handle_superkmer(self, superkmer, input_minimizer: int,
                         inputrev: bool) -> None:
        k, m = self.k, self.m
        if isinstance(superkmer, str):
            superkmer = superkmer.encode()
        self.selected_superkmer_number += 1
        if inputrev:
            superkmer = superkmer.translate(_COMP_BYTES)[::-1]
        n = len(superkmer) - k + 1
        self.selected_kmer_number += n
        if len(superkmer) == 2 * k - m:
            self.count_maximal_skmer += 1
        minstr = num2str(input_minimizer, m).encode()
        # one pass over minimizer occurrences + big-int k-mer slicing
        # replaces the reference's per-k-mer find/str2num
        # (SubSampler.cpp:258-301); position_min = first occurrence
        # inside the k-mer, identical to kmerstr.find(minstr).
        occ = []
        p = superkmer.find(minstr)
        while p != -1:
            occ.append(p)
            p = superkmer.find(minstr, p + 1)
        big = int(superkmer.translate(_B4_BYTES), 4) if superkmer else 0
        mask_k = self.mask_k
        top = 2 * (len(superkmer) - k)
        bucket = self.minimizer_map.get(input_minimizer)
        if bucket is None:
            bucket = {}
            self.minimizer_map[input_minimizer] = bucket
        j = 0
        n_occ = len(occ)
        for i in range(n):
            while j < n_occ and occ[j] < i:
                j += 1
            if j >= n_occ or occ[j] > i + k - m:
                raise AssertionError(
                    "minimizer not found in k-mer (reference 'PB' trap)")
            seq = (big >> (top - 2 * i)) & mask_k
            info = bucket.get(seq)
            if info is None:
                bucket[seq] = KmerInfo(1, occ[j] - i)
            else:
                info.count = (info.count + 1) & 0xFF  # uint8 wrap

    # ------------------------------------------------------------------
    # Streaming scan over one cleaned sequence (SubSampler.cpp:350-454).
    # ------------------------------------------------------------------
    def scan_sequence(self, ref: str) -> None:
        k, m = self.k, self.m
        is_rev = False   # uninitialized in reference; pinned false
        dump = False     # uninitialized in reference; pinned false
        last_position = 0
        pos_end = 0
        seq = str2num(ref[:k])
        min_seq = str2num(ref[k - m : k])
        min_rcseq = revcomp_code(min_seq, m)
        minimizer, position_min, old_rev = self.regular_minimizer_pos(seq)
        old_minimizer = minimizer
        hash_min = unrevhash(minimizer)
        i = 0
        for i in range(len(ref) - k):
            c = ref[i + k]
            seq = ((seq << 2) + nuc2int(c)) & self.mask_k
            min_seq = ((min_seq << 2) + nuc2int(c)) & self.mask_m
            min_rcseq = (min_rcseq >> 2) + (nuc2intrc(c) << (2 * m - 2))
            min_canon = min(min_seq, min_rcseq)
            new_h = unrevhash(min_canon)
            if new_h < hash_min:
                minimizer = min_canon
                hash_min = new_h
                position_min = i + k - m + 1
                is_rev = min_canon != min_seq
            elif i >= position_min:
                minimizer, position_min, is_rev = self.regular_minimizer_pos(seq)
                dump = True
                hash_min = unrevhash(minimizer)
                position_min += i + 1
            if old_minimizer != minimizer or dump:
                dump = False
                if unrevhash(old_minimizer) <= self.threshold:
                    # density accounting (SubSampler.cpp:407-424)
                    if last_position + m - 2 > pos_end:
                        if pos_end > 0:
                            self.nb_mmer_selected -= m - 1
                        self.nb_mmer_selected += i + k - last_position
                        self.nb_mmer_selected -= k - m
                    else:
                        self.nb_mmer_selected += i + k - (pos_end + 1)
                    self.handle_superkmer(
                        ref[last_position : i + k], old_minimizer, old_rev)
                    pos_end = i + k - 1
                self.total_kmer_number += i - last_position + 1
                self.total_superkmer_number += 1
                last_position = i + 1
                old_minimizer = minimizer
                old_rev = is_rev
        else:
            pass
        i = len(ref) - k  # C++ loop variable after exit
        if len(ref) - last_position > k - 1:
            if unrevhash(old_minimizer) <= self.threshold:
                self.nb_mmer_selected -= m - 1
                self.handle_superkmer(
                    ref[last_position : i + k], old_minimizer, old_rev)
                pos_end = i + k - 1
            self.total_kmer_number += i - last_position + 1
            self.total_superkmer_number += 1

    # ------------------------------------------------------------------
    # Greedy reconstruction (SubSampler.cpp:512-620).
    # ------------------------------------------------------------------
    def find_first_kmer(self, bucket: Dict[int, KmerInfo]) -> Optional[int]:
        for km, info in bucket.items():
            if not info.seen and info.count >= self.abundance:
                self.total_kmer_number_at_reconstruction += info.count
                self.seen_unique_kmers_at_reconstruction += 1
                info.seen = True
                return km
        return None

    def find_next(self, start: int, bucket: Dict[int, KmerInfo],
                  left: bool) -> int:
        k = self.k
        for nuc in "ATCG":  # reference probe order (SubSampler.cpp:568)
            if left:
                nxt = (start >> 2) + (nuc2int(nuc) << (2 * k - 2))
            else:
                nxt = ((start << 2) + nuc2int(nuc)) % (1 << (2 * k))
            info = bucket.get(nxt)
            if info is not None and not info.seen and info.count >= self.abundance:
                info.seen = True
                self.seen_unique_kmers_at_reconstruction += 1
                self.total_kmer_number_at_reconstruction += info.count
                return nxt
        return start

    def reconstruct_superkmer(self, bucket: Dict[int, KmerInfo],
                              start: int) -> str:
        k, m = self.k, self.m
        superkmer = num2str(start, k)
        n_left = (k - m) - bucket[start].pos_min
        n_right = bucket[start].pos_min
        n_start = start
        while len(superkmer) != 2 * k - m:
            if n_left != 0:
                nxt = self.find_next(n_start, bucket, True)
                n_left -= 1
                if nxt != n_start:
                    superkmer = num2str(nxt, k)[0] + superkmer
                else:
                    n_left = 0
                n_start = start if n_left == 0 else nxt
            elif n_right != 0:
                nxt = self.find_next(n_start, bucket, False)
                n_right -= 1
                if nxt != n_start:
                    superkmer = superkmer + "ACTG"[nxt & 3]
                else:
                    break
                n_start = nxt
            else:
                break
        return superkmer

    # ------------------------------------------------------------------
    # Serialization (SubSampler.cpp:456-504).
    # ------------------------------------------------------------------
    def serialize(self) -> bytes:
        k, m = self.k, self.m
        out = bytearray()
        header = "{} {} {} {}\n".format(
            k - 1 + self.max_superkmer_size, m, self.selected_kmer_number,
            format_double(self.s))
        out += header.encode()
        for minimizer in sorted(self.minimizer_map):
            bucket = self.minimizer_map[minimizer]
            minstr = num2str(minimizer, m)
            out += minstr.encode()
            self.seen_kmers_at_reconstruction += len(bucket)
            max_skmers: List[str] = []
            skmers: List[str] = []
            i = 0
            while i <= len(bucket):
                start = self.find_first_kmer(bucket)
                if start is None:
                    break
                skmer_str = self.reconstruct_superkmer(bucket, start)
                if len(skmer_str) == 2 * k - m:
                    i += k - m + 1
                    self.seen_max_superkmers_at_reconstruction += 1
                    max_skmers.append(skmer_str[: k - m])
                    max_skmers.append(skmer_str[k : 2 * k - m])
                else:
                    i += len(skmer_str) - k + 1
                    p = skmer_str.find(minstr)
                    skmers.append(skmer_str[:p])
                    skmers.append("\n")
                    skmers.append(skmer_str[p + m :])
                    skmers.append("\n")
                self.seen_superkmers_at_reconstruction += 1
            compressed = str_compressor("".join(max_skmers))
            out += struct.pack("<I", len(compressed))
            out += compressed
            out += "".join(skmers).encode()
            out += b"\n\n"
        self.actual_minimizer_number = len(self.minimizer_map)
        return bytes(out)

    # ------------------------------------------------------------------
    def sketch_file(self, input_path: str) -> Optional[bytes]:
        """Full pipeline for one FASTA -> uncompressed sketch bytes.

        Unreadable input prints the reference's messages and returns
        None (reference utils.cpp:357-364, SubSampler.cpp:311-321)."""
        import os

        import sys

        k = self.k
        if not os.path.exists(input_path):
            log = self.log or sys.stdout
            print("Problem with file opening", file=log)
            print(f"Can't open file: {input_path}", file=log)
            return None
        for ref_bytes in iter_fasta_records(input_path):
            ref = ref_bytes.decode()
            if len(ref) < k:
                ref = ""
            else:
                self.read_kmer += len(ref) - k + 1
            if ref:
                self.scan_sequence(ref)
        self.nb_mmer_selected = (self.nb_mmer_selected - (self.m - 1)) & MASK64
        return self.serialize()
