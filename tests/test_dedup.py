"""Device-side k-mer dedup (ops/dedup.py) vs the scalar intake
(oracle handle_superkmer): same bucket maps — keys, counts (uint8
wrap), pos_min, and first-insertion order."""

import jax.numpy as jnp
import numpy as np
import pytest

from supersampler_tpu.oracle.subsampler import OracleSubsampler
from supersampler_tpu.ops.dedup import dedup_spans, merge_unique_host


def _spans_from_pipeline(ref, k, m, s):
    """Exact selected spans via the proven device scan+walk compact
    (includes the tail flush exactly as _assemble_compact applies it)."""
    ss = TpuSubsamplerSpans(k=k, m=m, s=s)
    ss.scan_sequence(ref)
    return ss.spans


class TpuSubsamplerSpans(__import__(
        "supersampler_tpu.sketch.pipeline", fromlist=["TpuSubsampler"]
).TpuSubsampler):
    def __init__(self, **kw):
        super().__init__(**kw)
        self.spans = []

    def handle_superkmer(self, superkmer, minimizer, rev):
        # record the span; _assemble_compact passes ref[last : i + k]
        self._last_call = (superkmer, minimizer, rev)
        super().handle_superkmer(superkmer, minimizer, rev)

    def _assemble_compact(self, ref, sel_pos, sel_last, sel_val, sel_rev,
                          n_ev, last_ev_pos, tail_val, tail_rev,
                          tail_sel, uniques_list=None):
        for j in range(len(sel_pos)):
            self.spans.append((int(sel_pos[j]), int(sel_last[j]),
                               int(sel_val[j]), bool(sel_rev[j])))
        if tail_sel:
            last = last_ev_pos + 1 if n_ev else 0
            self.spans.append((len(ref) - self.k, last, int(tail_val),
                               bool(tail_rev)))
        super()._assemble_compact(ref, sel_pos, sel_last, sel_val,
                                  sel_rev, n_ev, last_ev_pos, tail_val,
                                  tail_rev, tail_sel,
                                  uniques_list=uniques_list)


def _bucket_state(ss):
    out = {}
    for mv, bucket in ss.minimizer_map.items():
        out[mv] = [(km, info.count, info.pos_min)
                   for km, info in bucket.items()]
    return out


@pytest.mark.parametrize("L,s,seed,k,m", [
    (3000, 2.0, 0, 31, 11),
    (5000, 1.0, 1, 31, 11),       # select-all
    (4000, 1.0, 2, 21, 7),
    (2000, 1.0, 3, 63, 15),
    (2000, 1.0, 4, 15, 5),
])
def test_dedup_matches_oracle_intake(L, s, seed, k, m):
    rng = np.random.default_rng(seed)
    # mix of random + repeats to stress dedup counts and wrap
    unit = "".join("ACGT"[c] for c in rng.integers(0, 4, 100))
    ref = (unit * 6) + "".join(
        "ACGT"[c] for c in rng.integers(0, 4, L)) + (unit * 4)

    oracle = OracleSubsampler(k=k, m=m, s=s)
    oracle.scan_sequence(ref)
    want = _bucket_state(oracle)

    spans_list = _spans_from_pipeline(ref, k, m, s)
    pos_l = [sp[0] for sp in spans_list]
    last_l = [sp[1] for sp in spans_list]
    val_l = [sp[2] for sp in spans_list]
    rev_l = [sp[3] for sp in spans_list]

    P = 1 << (len(ref) + k + 64).bit_length()
    codes = np.zeros(P, np.uint8)
    codes[: len(ref)] = np.frombuffer(
        ref.encode().translate(bytes.maketrans(b"ACTG", bytes([0, 1, 2, 3]))),
        np.uint8)
    cap = 1 << max(4, (len(pos_l) or 1).bit_length())
    pad = lambda a, fill, dt: np.concatenate(
        [np.asarray(a, dt), np.full(cap - len(a), fill, dt)])
    spans = (jnp.asarray(pad(pos_l, -1, np.int32)),
             jnp.asarray(pad(last_l, -1, np.int32)),
             jnp.asarray(pad(val_l, 0, np.uint32)),
             jnp.asarray(pad(rev_l, False, bool)),
             jnp.int32(len(pos_l)))
    n_kmer_occ = sum(p - l + 1 for p, l in zip(pos_l, last_l))
    K = 1 << max(6, (2 * n_kmer_occ).bit_length())
    out = dedup_spans(jnp.asarray(codes), spans, k, m, P, K)
    n_kmers = int(out[0])
    assert n_kmers == n_kmer_occ
    fetched = (int(out[1]), np.asarray(out[2]), np.asarray(out[3]),
               np.asarray(out[4]), np.asarray(out[5]), np.asarray(out[6]))

    got_ss = OracleSubsampler(k=k, m=m, s=s)
    merge_unique_host(got_ss, fetched, k)
    got = _bucket_state(got_ss)

    assert set(got) == set(want)
    for mv in want:
        assert got[mv] == want[mv], f"bucket {mv} differs"


class DedupSubsampler(__import__(
        "supersampler_tpu.sketch.pipeline", fromlist=["TpuSubsampler"]
).TpuSubsampler):
    device_dedup = True


class DedupTiledSubsampler(DedupSubsampler):
    _tile_own = 2048
    _tile_extra = 512


@pytest.mark.parametrize("L,s,seed,k,m,a", [
    (3000, 2.0, 10, 31, 11, 1),
    (2500, 1.0, 11, 31, 11, 2),   # select-all + abundance
    (2000, 1.0, 12, 21, 7, 1),
    (1500, 5.0, 13, 63, 15, 1),
])
def test_dedup_pipeline_end_to_end(L, s, seed, k, m, a):
    """Full sketch through the device-dedup path == oracle bytes,
    including repeat-heavy content (counts, wrap, pos_min, order)."""
    rng = np.random.default_rng(seed)
    unit = "".join("ACGT"[c] for c in rng.integers(0, 4, 80))
    ref = (unit * 5) + "".join(
        "ACGT"[c] for c in rng.integers(0, 4, L)) + (unit * 3)
    oracle = OracleSubsampler(k=k, m=m, s=s, abundance=a)
    oracle.scan_sequence(ref)
    dd = DedupSubsampler(k=k, m=m, s=s, abundance=a)
    dd.scan_sequence(ref)
    assert dd.serialize() == oracle.serialize()
    for attr in ("total_kmer_number", "total_superkmer_number",
                 "selected_kmer_number", "selected_superkmer_number",
                 "count_maximal_skmer", "nb_mmer_selected"):
        assert getattr(dd, attr) == getattr(oracle, attr), attr


def test_dedup_tiled_end_to_end():
    """Tiled + dedup together: spans crossing tile boundaries hit the
    left-halo path."""
    rng = np.random.default_rng(21)
    ref = "".join("ACGT"[c] for c in rng.integers(0, 4, 9000))
    oracle = OracleSubsampler(k=31, m=11, s=3.0)
    oracle.scan_sequence(ref)
    dd = DedupTiledSubsampler(k=31, m=11, s=3.0)
    dd.scan_sequence(ref)
    assert dd.serialize() == oracle.serialize()


def test_dedup_overflow_retry():
    """Tiny speculative capacities must transparently re-dispatch."""
    rng = np.random.default_rng(31)
    ref = "".join("ACGT"[c] for c in rng.integers(0, 4, 3000))
    oracle = OracleSubsampler(k=31, m=11, s=2.0)
    oracle.scan_sequence(ref)
    dd = DedupSubsampler(k=31, m=11, s=2.0)   # ~half the k-mers selected
    dd._sel_cap_guess = 16
    dd._kmer_cap_guess = 32
    dd.scan_sequence(ref)
    assert dd.serialize() == oracle.serialize()
