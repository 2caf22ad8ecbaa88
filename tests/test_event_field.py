"""Sync-segment decomposition (ops/event_field.py) vs the scalar
oracle's streaming loop: identical event chains on fuzzed inputs —
random, repeat-heavy, homopolymer, and palindromic content (the cases
that exercise the tie rules and the mirrored-position quirk)."""

import numpy as np
import pytest

from supersampler_tpu.core.scalar import (canonize, nuc2int, nuc2intrc,
                                          str2num, unrevhash)
from supersampler_tpu.oracle.subsampler import OracleSubsampler
from supersampler_tpu.ops.event_field import precompute, resolve

_B4 = bytes.maketrans(b"ACTG", bytes([0, 1, 2, 3]))


def oracle_events(ref: str, k: int, m: int):
    """Instrumented replica of OracleSubsampler.scan_sequence's state
    machine (SubSampler.cpp:367-440): logs (i, minimizer, is_rev,
    position_min, hash) at every boundary, plus the final state."""
    o = OracleSubsampler(k=k, m=m, s=1.0)
    mask_k, mask_m = o.mask_k, o.mask_m
    seq = str2num(ref[:k])
    min_seq = str2num(ref[k - m : k])
    from supersampler_tpu.core.scalar import revcomp_code

    min_rcseq = revcomp_code(min_seq, m)
    minimizer, position_min, is_rev = o.regular_minimizer_pos(seq)
    hash_min = unrevhash(minimizer)
    dump = False
    old_minimizer, old_rev = minimizer, is_rev
    events = []
    for i in range(len(ref) - k):
        c = ref[i + k]
        seq = ((seq << 2) + nuc2int(c)) & mask_k
        min_seq = ((min_seq << 2) + nuc2int(c)) & mask_m
        min_rcseq = (min_rcseq >> 2) + (nuc2intrc(c) << (2 * m - 2))
        min_canon = min(min_seq, min_rcseq)
        new_h = unrevhash(min_canon)
        if new_h < hash_min:
            minimizer = min_canon
            hash_min = new_h
            position_min = i + k - m + 1
            is_rev = min_canon != min_seq
        elif i >= position_min:
            minimizer, position_min, is_rev = o.regular_minimizer_pos(seq)
            dump = True
            hash_min = unrevhash(minimizer)
            position_min += i + 1
        if old_minimizer != minimizer or dump:
            dump = False
            events.append((i, minimizer, is_rev, position_min, hash_min))
            old_minimizer = minimizer
            old_rev = is_rev
    return events, (minimizer, position_min, is_rev, hash_min)


def _run(ref: str, k: int, m: int):
    codes = np.frombuffer(ref.encode().translate(_B4), np.uint8)
    pc = precompute(codes, k, m)
    events, final = resolve(pc, len(ref), k, 0)
    got = [(e.i, e.val, e.rev, e.p, e.h) for e in events]
    want, wfinal = oracle_events(ref, k, m)
    assert len(got) == len(want), (len(got), len(want))
    for a, b in zip(got, want):
        assert a == b, (a, b)
    assert (final[0], final[1], final[2], final[3]) == (
        wfinal[0], wfinal[1], wfinal[2], wfinal[3])


def _rand(rng, n):
    return "".join("ACGT"[c] for c in rng.integers(0, 4, n))


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("k,m", [(31, 11), (21, 7), (63, 15), (15, 5)])
def test_event_field_random(seed, k, m):
    rng = np.random.default_rng(seed)
    _run(_rand(rng, 3000), k, m)


@pytest.mark.parametrize("k,m", [(31, 11), (21, 7), (15, 5)])
def test_event_field_repeats_and_ties(k, m):
    rng = np.random.default_rng(99)
    unit = _rand(rng, 37)
    ref = (unit * 20) + _rand(rng, 500) + (unit * 10)
    _run(ref, k, m)


@pytest.mark.parametrize("k,m", [(31, 11), (21, 7)])
def test_event_field_homopolymers(k, m):
    """Homopolymer runs maximize duplicate m-mer values and rev-strand
    ties (poly-T is its own sort of pathological: the canonical m-mer
    repeats at every offset)."""
    rng = np.random.default_rng(7)
    ref = (_rand(rng, 200) + "T" * 120 + _rand(rng, 200) + "A" * 90
           + _rand(rng, 200) + "AT" * 60 + _rand(rng, 200)
           + "GC" * 55 + _rand(rng, 200))
    _run(ref, k, m)


def test_event_field_short_sequences():
    rng = np.random.default_rng(3)
    for L in (31, 32, 40, 52, 75):
        _run(_rand(rng, L), 31, 11)
