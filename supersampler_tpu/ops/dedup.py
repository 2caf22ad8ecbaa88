"""Device-side k-mer extraction + dedup/count for selected super-k-mers.

The reference's hot selected-path cost is a per-k-mer hash-map insert
(reference SubSampler.cpp:258-301: for every k-mer of every selected
super-k-mer, find the minimizer offset, extract the oriented k-mer,
insert/count). This module replaces that host loop with the SURVEY
§7.2-3 plan: on device, expand the selected spans to per-position
oriented k-mers, `jax.lax.sort` them by (minimizer, k-mer, insertion
order), segment-unique, and ship ONLY the unique k-mers (with counts,
first-occurrence minimizer offsets and first-insertion order) to the
host, which bulk-merges them into the bucket maps for the greedy
reconstruction (oracle/subsampler.py).

Bit-exactness contract replicated:
  * the stored key is the ORIENTED k-mer (reverse-complemented when the
    super-k-mer's minimizer was reverse-strand, SubSampler.cpp:246-249);
  * enumeration order within a reversed span runs from the span's end
    (insertion order = first occurrence in that order — unordered_dense
    iteration order, SURVEY §7.3);
  * pos_min = first offset of the minimizer *string* inside the
    oriented k-mer (kmerstr.find(minstr), SubSampler.cpp:258-262),
    which can be a spurious textual match before the elected position;
  * counts are occurrence counts; the host merge wraps them to uint8
    like the reference's `count` field (SubSampler.h:24).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_I32 = jnp.int32
_U32 = jnp.uint32
_INVALID = jnp.uint32(0xFFFFFFFF)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def dedup_spans(codes, spans, k: int, m: int, P: int, K: int):
    """Extract + dedup the selected k-mers of one walk's spans.

    codes: uint8[P] 2-bit codes (the scan's input tile, device-resident).
    spans: (sel_pos i32[cap], sel_last i32[cap], sel_val u32[cap],
            sel_rev bool[cap], n_sel i32) — from walker._compact_emits.
    K: static k-mer-occurrence capacity (caller retries bigger on
       overflow; the true count comes back in the result).

    Returns (n_kmers, n_unique, minval u32[K], limbs u32[K,4] (l3..l0,
    big-endian), okey i32[K] first-insertion order, pos_min i32[K],
    count i32[K]) — rows beyond n_unique are garbage; rows are sorted
    by (minval, kmer); the host orders by okey.
    """
    sel_pos, sel_last, sel_val, sel_rev, n_sel = spans
    cap = sel_pos.shape[0]
    W = k - m + 1

    ok = (jnp.arange(cap, dtype=_I32) < n_sel) & (sel_pos >= 0)
    zero = jnp.zeros((P + 1,), _I32)
    pos_c = jnp.clip(sel_pos, 0, P - 1)
    last_c = jnp.clip(sel_last, 0, P - 1)
    starts = zero.at[jnp.where(ok, last_c, 0)].add(
        jnp.where(ok, 1, 0))
    ends = zero.at[jnp.where(ok, pos_c + 1, 0)].add(
        jnp.where(ok, 1, 0))
    in_span = (jnp.cumsum(starts) - jnp.cumsum(ends))[:P] > 0
    sid_scatter = jnp.full((P,), -1, _I32).at[
        jnp.where(ok, last_c, 0)].max(
        jnp.where(ok, jnp.arange(cap, dtype=_I32), -1))
    span_id = jax.lax.cummax(sid_scatter)
    sid_c = jnp.clip(span_id, 0, cap - 1)

    # pad so a slice starting at j<=k stays in bounds (dynamic_slice
    # CLAMPS out-of-range starts, silently aliasing all taps to 0)
    cs = jnp.concatenate([codes.astype(_U32), jnp.zeros((k,), _U32)])

    def tap(j, width):
        return jax.lax.dynamic_slice(cs, (j,), (width,))

    # oriented k-mer limbs: forward = codes[p..p+k) packed big-endian;
    # reverse = complemented codes packed in reverse order (RC)
    n_limb = (2 * k + 31) // 32
    fwd = [jnp.zeros((P,), _U32) for _ in range(4)]
    rc = [jnp.zeros((P,), _U32) for _ in range(4)]
    for j in range(k):
        c = tap(j, P)
        b = 2 * (k - 1 - j)
        fwd[b >> 5] = fwd[b >> 5] | (c << jnp.uint32(b & 31))
        b = 2 * j
        rc[b >> 5] = rc[b >> 5] | ((c ^ 2) << jnp.uint32(b & 31))
    del n_limb

    rev_at = sel_rev[sid_c]
    limbs = [jnp.where(rev_at, r, f) for f, r in zip(fwd, rc)]

    # minimizer-string matches: oriented m-mer at global q equals the
    # span's minimizer value (fwd m-mer for forward spans, rc m-mer for
    # reversed ones)
    fwd_m = jnp.zeros((P,), _U32)
    rc_m = jnp.zeros((P,), _U32)
    for j in range(m):
        c = tap(j, P)
        fwd_m = (fwd_m << 2) | c
        rc_m = rc_m | ((c ^ 2) << jnp.uint32(2 * j))
    minval_at = sel_val[sid_c]
    # the search window [g, g+k-m] of a k-mer can cross into the NEXT
    # span (spans may be adjacent), so the comparison must be against
    # the K-MER's span minimizer (indexed by g), not q's span: slide
    # the m-mer VALUE arrays and compare per-g. Out-of-range pad is a
    # never-matching sentinel (minimizers are < 2^30).
    fwd_m_pad = jnp.concatenate([fwd_m, jnp.full((W,), _INVALID)])
    rc_m_pad = jnp.concatenate([rc_m, jnp.full((W,), _INVALID)])

    def first_off(vals, back: bool):
        pm = jnp.full((P,), k, _I32)
        found = jnp.zeros((P,), bool)
        for o in range(W):
            q_off = (k - m - o) if back else o
            hit = jax.lax.dynamic_slice(
                vals, (q_off,), (P,)) == minval_at
            take = hit & ~found
            pm = jnp.where(take, o, pm)
            found = found | hit
        return pm

    pos_min_f = first_off(fwd_m_pad, back=False)
    pos_min_r = first_off(rc_m_pad, back=True)
    pos_min = jnp.where(rev_at, pos_min_r, pos_min_f)

    # first-insertion order: forward spans enumerate left-to-right,
    # reversed spans right-to-left (handle_superkmer runs over the RC'd
    # string, SubSampler.cpp:246-258)
    pidx = jnp.arange(P, dtype=_I32)
    j_or = jnp.where(rev_at, sel_pos[sid_c] - pidx, pidx - sel_last[sid_c])
    okey = span_id * 64 + j_or

    idx = jnp.nonzero(in_span, size=K, fill_value=P - 1)[0]
    n_kmers = jnp.sum(in_span).astype(_I32)
    valid = jnp.arange(K, dtype=_I32) < n_kmers
    g_min = jnp.where(valid, minval_at[idx], _INVALID)
    g_l = [jnp.where(valid, lm[idx], _INVALID) for lm in limbs]
    g_okey = jnp.where(valid, okey[idx], jnp.int32(2**31 - 1))
    g_pm = pos_min[idx]

    # sort by (minimizer, k-mer, insertion order); invalid rows sink
    g_min, l3, l2, l1, l0, g_okey, g_pm = jax.lax.sort(
        (g_min, g_l[3], g_l[2], g_l[1], g_l[0], g_okey, g_pm),
        num_keys=6)
    same = jnp.zeros((K,), bool).at[1:].set(
        (g_min[1:] == g_min[:-1]) & (l3[1:] == l3[:-1])
        & (l2[1:] == l2[:-1]) & (l1[1:] == l1[:-1])
        & (l0[1:] == l0[:-1]))
    row_valid = g_min != _INVALID
    new = ~same & row_valid
    gid = jnp.clip(jnp.cumsum(new) - 1, 0, K - 1).astype(_I32)
    counts = jnp.zeros((K,), _I32).at[gid].add(
        jnp.where(row_valid, 1, 0))
    n_unique = jnp.sum(new).astype(_I32)

    def firsts(a, fill):
        return jnp.full((K,), fill, a.dtype).at[
            jnp.where(new, gid, K - 1)].max(
            jnp.where(new, a, fill))

    # exactly one `new` row lands on each gid < n_unique, so a masked
    # scatter-max is a plain scatter of the group's first row
    u_min = firsts(g_min, jnp.uint32(0))
    u_l3 = firsts(l3, jnp.uint32(0))
    u_l2 = firsts(l2, jnp.uint32(0))
    u_l1 = firsts(l1, jnp.uint32(0))
    u_l0 = firsts(l0, jnp.uint32(0))
    u_okey = firsts(g_okey, jnp.int32(-1))
    u_pm = firsts(g_pm, jnp.int32(-1))
    return (n_kmers, n_unique, u_min,
            jnp.stack([u_l3, u_l2, u_l1, u_l0], axis=1), u_okey, u_pm,
            counts)


_HALO_LEFT = 128   # covers the longest span (2k-m-1 < 128 chars) of a
                   # boundary event near a tile's start


def _dedup_tail_arrays(outs, packed_ext, length, k: int, m: int,
                       P_ext: int, K: int):
    """Shared core: spans (+ tail span) -> dedup arrays for the fetch.

    packed_ext: 2-bit packed codes of [tile_start - 128, tile_start +
    P) — the left halo covers spans whose opening event precedes the
    walked region (tile carries / sequence starts get zero padding).
    length: local sequence length; include-tail is length >= 0 (pass
    -1 for non-final tiles whose tail flush belongs to a later tile).
    """
    from supersampler_tpu.ops.minimizer import unpack_2bit

    (pos, last, val, rev, n_sel, n_ev, last_pos, tail_val, tail_rev,
     tail_sel) = outs
    include_tail = length >= 0
    ns = n_sel.astype(_I32)
    add_tail = include_tail & tail_sel.astype(bool)
    pos_x = jnp.concatenate([pos, jnp.full((1,), -1, _I32)])
    last_x = jnp.concatenate([last, jnp.full((1,), -1, _I32)])
    val_x = jnp.concatenate([val, jnp.zeros((1,), jnp.uint32)])
    rev_x = jnp.concatenate([rev, jnp.zeros((1,), bool)])
    tail_p = (length - k).astype(_I32)
    tail_l = jnp.where(n_ev > 0, last_pos.astype(_I32) + 1, 0)
    pos_x = pos_x.at[ns].set(jnp.where(add_tail, tail_p, -1))
    last_x = last_x.at[ns].set(jnp.where(add_tail, tail_l, -1))
    val_x = val_x.at[ns].set(tail_val)
    rev_x = rev_x.at[ns].set(tail_rev.astype(bool))
    n_spans = ns + add_tail.astype(_I32)

    # shift spans into the halo'd coordinate frame; keep -1 sentinels
    off = _HALO_LEFT
    pos_h = jnp.where(pos_x >= 0, pos_x + off, -1)
    last_h = jnp.where(pos_x >= 0, last_x + off, -1)

    codes = unpack_2bit(packed_ext, P_ext)
    (n_kmers, n_unique, u_min, limbs, okey, pm, counts) = dedup_spans(
        codes, (pos_h, last_h, val_x, rev_x, n_spans), k, m, P_ext, K)

    dd_head = jnp.stack([n_kmers, n_unique])
    return jnp.concatenate([
        dd_head,
        jax.lax.bitcast_convert_type(u_min, _I32),
        jax.lax.bitcast_convert_type(limbs.T.reshape(-1), _I32),
        okey, pm, counts])


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def dedup_chain_packed(outs, scal, packed_ext, length, k: int, m: int,
                       P_ext: int, K: int):
    """Fused fetch for the legacy-walker dedup path: compact array
    (walker.pack_compact_outs) + this dispatch's unique k-mers in one
    device->host transfer."""
    from supersampler_tpu.ops.walker import pack_compact_outs

    tail = _dedup_tail_arrays(outs, packed_ext, length, k, m, P_ext, K)
    return jnp.concatenate([pack_compact_outs(outs, scal), tail])


@functools.partial(jax.jit, static_argnums=(1, 4, 5, 6, 7))
def field_dedup_packed(arr, cap: int, packed_ext, length, k: int,
                       m: int, P_ext: int, K: int):
    """Fused fetch for the sync-field dedup path: the resolve_field
    array + unique k-mers (ops/field.py layout, head of 12)."""
    H = 12
    pos = arr[H : H + cap]
    last = arr[H + cap : H + 2 * cap]
    val = jax.lax.bitcast_convert_type(
        arr[H + 2 * cap : H + 3 * cap], jnp.uint32)
    rev = arr[H + 3 * cap : H + 4 * cap] != 0
    n_sel = arr[1]
    n_ev = arr[2]
    last_pos = arr[3]
    tail_val = jax.lax.bitcast_convert_type(arr[4], jnp.uint32)
    tail_rev = arr[5] != 0
    tail_sel = arr[6] != 0
    outs = (pos, last, val, rev, n_sel, n_ev, last_pos, tail_val,
            tail_rev, tail_sel)
    tail = _dedup_tail_arrays(outs, packed_ext, length, k, m, P_ext, K)
    return jnp.concatenate([arr, tail])


def _parse_dedup_tail(arr: np.ndarray, base: int, K: int):
    n_kmers = int(arr[base])
    n_unique = int(arr[base + 1])
    base += 2
    u_min = arr[base : base + K].view(np.uint32)
    base += K
    limbs = arr[base : base + 4 * K].view(np.uint32).reshape(4, K).T
    base += 4 * K
    okey = arr[base : base + K]
    base += K
    pm = arr[base : base + K]
    base += K
    counts = arr[base : base + K]
    return n_kmers, (n_unique, u_min, limbs, okey, pm, counts)


def parse_dedup_array(arr: np.ndarray, cap: int, K: int):
    """Split a dedup_chain_packed fetch into (compact_9tuple, n_sel,
    n_kmers, uniques) where uniques feeds merge_unique_host."""
    from supersampler_tpu.ops.walker import parse_compact_array

    comp = parse_compact_array(arr, cap)
    n_sel = int(arr[0])
    n_kmers, uniques = _parse_dedup_tail(arr, 8 + 4 * cap, K)
    return comp, n_sel, n_kmers, uniques


def parse_field_dedup_array(arr: np.ndarray, cap: int, K: int):
    """Split a field_dedup_packed fetch into (status, compact_9tuple,
    n_sel, n_kmers, uniques)."""
    from supersampler_tpu.ops.field import parse_field_array

    status, comp, n_sel = parse_field_array(arr, cap)
    n_kmers, uniques = _parse_dedup_tail(arr, 12 + 4 * cap, K)
    return status, comp, n_sel, n_kmers, uniques


def merge_unique_host(ss, fetched, k: int):
    """Bulk-merge one dispatch's unique k-mers into the subsampler's
    bucket maps in first-insertion order (the host side of the device
    dedup; replaces the per-occurrence inserts of handle_superkmer)."""
    from supersampler_tpu.oracle.subsampler import KmerInfo

    n_unique, minv, limbs, okey, pos_min, counts = fetched
    if n_unique == 0:
        return
    order = np.argsort(okey[:n_unique], kind="stable")
    minv = minv[:n_unique][order]
    limbs = limbs[:n_unique][order]
    pos_min = pos_min[:n_unique][order]
    counts = counts[:n_unique][order]
    kmers = (
        (limbs[:, 0].astype(object) << 96)
        | (limbs[:, 1].astype(object) << 64)
        | (limbs[:, 2].astype(object) << 32)
        | limbs[:, 3].astype(object))
    mmap = ss.minimizer_map
    for mv, km, pm, c in zip(minv.tolist(), kmers, pos_min.tolist(),
                             counts.tolist()):
        bucket = mmap.get(mv)
        if bucket is None:
            bucket = {}
            mmap[mv] = bucket
        info = bucket.get(km)
        if info is None:
            info = KmerInfo(c & 0xFF, pm)
            info.count = c & 0xFF
            bucket[km] = info
        else:
            info.count = (info.count + c) & 0xFF
