"""Tiled long-sequence scan: the multi-tile carry chain must be
bit-identical to the single-tile path and to the scalar oracle.

The product tile is 4 Mbp (pipeline._TILE_OWN); tests shrink it to the
walker's block granularity (2048 positions) so a few-kbp sequence spans
many tiles and every cross-tile case fires: carried next-event pointer,
super-k-mers opening in one tile and closing 1..n tiles later, selected
boundaries whose payload event precedes the tile (fallback path), and a
final tile whose tail payload is carried.
"""

import numpy as np
import pytest

from supersampler_tpu.oracle.subsampler import OracleSubsampler
from supersampler_tpu.sketch.pipeline import TpuSubsampler

_TINY_OWN = 2048      # one walker block per tile
_TINY_EXTRA = 512


class TinyTiledSubsampler(TpuSubsampler):
    _tile_own = _TINY_OWN
    _tile_extra = _TINY_EXTRA


def _random_seq(rng, n):
    return "".join("ACGT"[c] for c in rng.integers(0, 4, n))


@pytest.mark.parametrize("L,s,seed,k,m", [
    (9000, 20.0, 0, 31, 11),
    (12345, 2.0, 1, 31, 11),
    (7003, 1.0, 2, 31, 11),      # select-all
    (30000, 1000.0, 3, 31, 11),  # sparse selection across 15 tiles
    (8192, 5.0, 4, 63, 15),      # max k: widest halo
    (6000, 5.0, 5, 15, 5),
])
def test_tiled_matches_oracle(L, s, seed, k, m):
    rng = np.random.default_rng(seed)
    ref = _random_seq(rng, L)
    oracle = OracleSubsampler(k=k, m=m, s=s)
    oracle.scan_sequence(ref)
    tiled = TinyTiledSubsampler(k=k, m=m, s=s)
    assert L + 2 * (2 * k - m + 2) + 128 > _TINY_OWN, "must take tiled path"
    tiled.scan_sequence(ref)
    assert tiled.serialize() == oracle.serialize()
    for attr in ("total_kmer_number", "total_superkmer_number",
                 "selected_kmer_number", "selected_superkmer_number",
                 "count_maximal_skmer", "nb_mmer_selected"):
        assert getattr(tiled, attr) == getattr(oracle, attr), attr


def test_tiled_matches_single_tile_path():
    """The same sequence through tiled and untiled pipelines."""
    rng = np.random.default_rng(7)
    ref = _random_seq(rng, 11000)
    one = TpuSubsampler(k=31, m=11, s=10.0)
    one.scan_sequence(ref)
    many = TinyTiledSubsampler(k=31, m=11, s=10.0)
    many.scan_sequence(ref)
    assert many.serialize() == one.serialize()


def test_tiled_sketch_file_multi_record(tmp_path):
    """Whole-file pipeline with a mix of tiled and single-tile records."""
    rng = np.random.default_rng(11)
    seqs = [_random_seq(rng, 9500), _random_seq(rng, 800),
            _random_seq(rng, 5000)]
    fa = tmp_path / "mix.fa"
    fa.write_text("".join(f">r{i}\n{s}\n" for i, s in enumerate(seqs)))
    oracle = OracleSubsampler(k=31, m=11, s=5.0)
    want = oracle.sketch_file(str(fa))
    tiled = TinyTiledSubsampler(k=31, m=11, s=5.0)
    got = tiled.sketch_file(str(fa))
    assert got == want
