"""Sync-field scan: gather-free, walker-free event extraction.

Replaces the successor-table + serial-walker pipeline (ops/minimizer.py
+ ops/walker.py) for the hot path. Uses the sync theorem proven in
ops/event_field.py: a position whose entering hash is strictly below
every hash in the preceding 2W positions forces an adoption regardless
of history, so the streaming machine's state there is locally known.

The sequence is split into fixed blocks of B loop positions. Each block
containing a sync resolves its suffix [first_sync, B) independently
(sweep 1), which also yields every block's EXIT state without knowing
its prefix; prefixes [0, first_sync) then resolve from the
predecessor's exit (sweep 2, iterated a bounded number of times for
runs of syncless blocks — vanishingly rare at B=256). All sweeps are
dense (n_blocks,)-lane vector ops inside a fori loop over columns: no
gathers, no scalar-core serialization. Blocks that remain unresolved
after the pass budget (pathological content, e.g. megabase
homopolymers) raise a status flag and the caller falls back to the
exact legacy walker path.

Emit/compact semantics replicate the reference boundary loop
(SubSampler.cpp:401-454) exactly as ops/walker.py does; outputs use the
same 9-tuple compact contract.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from supersampler_tpu.ops import u64 as U
from supersampler_tpu.ops.minimizer import elect_block_flagged, _sl, \
    _slh, unpack_2bit

_I32 = jnp.int32
_U32 = jnp.uint32
_FF = jnp.uint32(0xFFFFFFFF)
_B = 256                 # resolution block size (loop positions)
_MAX_PASSES = 4          # sweep-2 iterations (syncless-run budget)
_UNROLL = 8              # columns per fori iteration (TPU while_loop
                         # overhead is ~us-scale per iteration)


class FieldTables(NamedTuple):
    """Flat per-loop-position arrays, padded to a multiple of _B."""

    h_hi: jnp.ndarray    # entering m-mer hash at j (u32 x2)
    h_lo: jnp.ndarray
    cv: jnp.ndarray      # entering canon value | rev<<30
    em: jnp.ndarray      # election of window j+1: value | rev<<30
    ep: jnp.ndarray      # election in-window position (i32)
    eh_hi: jnp.ndarray   # election hash
    eh_lo: jnp.ndarray
    sync: jnp.ndarray    # bool: guaranteed adoption at j
    last_i: jnp.ndarray  # i32 scalar: final valid loop position
    init_val: jnp.ndarray   # u32 value | rev<<30 (window-0 election)
    init_p: jnp.ndarray     # i32 absolute position_min
    init_h_hi: jnp.ndarray
    init_h_lo: jnp.ndarray
    eflag: jnp.ndarray   # bool scalar: a consumed election hit a hash
                         # collision (log-election undefined -> the
                         # caller must take the exact fold fallback)


def _pow2_le(n: int) -> int:
    p = 1
    while p * 2 <= n:
        p *= 2
    return p


def _field_core(codes: jnp.ndarray, k: int, m: int, P: int, C: int,
                first_row):
    """Shared field-scan core on the (R, C) 2D layout: per-position
    entering hashes/values, window elections, and RAW sync flags
    (strict minimum vs the previous 2W entering hashes; position-bound
    masking is the caller's job).

    first_row: (R,) bool — rows with no predecessor row (their sync
    lookback pads +inf). One True for a single sequence; one per
    record for the batched layout.

    Returns (h0, cv, em_r, ep_r, eh_r, sync_raw, em, ep, er, eh,
    eflag) where eflag (R, C+1) flags windows whose O(log W) election
    hit a hash collision (window start w = r*C + c; see
    _mmer_elect_block_log — flagged tiles take the exact fold/walker
    fallback)."""
    W = k - m + 1
    halo = k + W
    assert C > halo and P % C == 0 and P % _B == 0
    R = P // C

    if jax.default_backend() == "tpu":
        from supersampler_tpu.ops.scan_kernel import field_core_mosaic

        return field_core_mosaic(codes, k, m, P, C, first_row)

    base = codes.reshape(R, C)
    c2 = jnp.concatenate(
        [base, jnp.roll(base, -1, axis=0)[:, :halo]],
        axis=1).astype(jnp.uint32)
    canon, rev, hh, em, ep, er, eh, h_ent, eflag = \
        elect_block_flagged(c2, k, m, C, halo)

    h0 = _slh(h_ent, 0, C)                       # entering hash per j
    c_ent = _sl(canon, k - m + 1, C)
    r_ent = _sl(rev, k - m + 1, C)
    cv = c_ent | (r_ent.astype(_U32) << 30)
    em_r = _sl(em, 1, C) | (_sl(er, 1, C).astype(_U32) << 30)
    ep_r = _sl(ep, 1, C)
    eh_r = _slh(eh, 1, C)
    sync = _sync_from_h0(h0, first_row, W, C)
    # elections are consumed for window starts [0, C] per row (em_r
    # slices [1, C+1); window 0 feeds the init election)
    return (h0, cv, em_r, ep_r, eh_r, sync, em, ep, er, eh,
            _sl(eflag, 0, C + 1))


def _sync_from_h0(h0, first_row, W: int, C: int):
    """Sync flags: strict minimum vs the previous 2W entering hashes,
    via log-step windowed mins on a left-halo'd layout (the previous
    row's tail supplies the lookback; predecessor-less rows pad
    +inf)."""
    R = h0.hi.shape[0]
    LH = 2 * W
    prev_tail_hi = jnp.roll(h0.hi, 1, axis=0)[:, C - LH:]
    prev_tail_lo = jnp.roll(h0.lo, 1, axis=0)[:, C - LH:]
    ff = jnp.broadcast_to(first_row[:, None], (R, LH))
    lh_hi = jnp.where(ff, _FF, prev_tail_hi)
    lh_lo = jnp.where(ff, _FF, prev_tail_lo)
    a_hi = jnp.concatenate([lh_hi, h0.hi], axis=1)
    a_lo = jnp.concatenate([lh_lo, h0.lo], axis=1)

    # build M_t over the halo'd array: M_t[x] = min a[x-t+1 .. x]
    t = _pow2_le(LH)
    m_hi, m_lo = a_hi, a_lo
    step = 1
    while step < t:
        w_ = a_hi.shape[1] - step
        b_hi = _sl(m_hi, 0, w_)
        b_lo = _sl(m_lo, 0, w_)
        c_hi = _sl(m_hi, step, w_)
        c_lo = _sl(m_lo, step, w_)
        lt = (b_hi < c_hi) | ((b_hi == c_hi) & (b_lo < c_lo))
        m_hi = jnp.concatenate(
            [m_hi[:, :step], jnp.where(lt, b_hi, c_hi)], axis=1)
        m_lo = jnp.concatenate(
            [m_lo[:, :step], jnp.where(lt, b_lo, c_lo)], axis=1)
        step *= 2
    # min over [c-2W, c-1] = min(M_t[c-1], M_t[c-(2W-t)-1]); in the
    # halo'd frame position j sits at column j_loc + 2W
    off1 = LH - 1
    off2 = LH - (LH - t) - 1      # = t - 1
    w1_hi, w1_lo = _sl(m_hi, off1, C), _sl(m_lo, off1, C)
    w2_hi, w2_lo = _sl(m_hi, off2, C), _sl(m_lo, off2, C)
    lt12 = (w2_hi < w1_hi) | ((w2_hi == w1_hi) & (w2_lo < w1_lo))
    mn_hi = jnp.where(lt12, w2_hi, w1_hi)
    mn_lo = jnp.where(lt12, w2_lo, w1_lo)
    return (h0.hi < mn_hi) | ((h0.hi == mn_hi) & (h0.lo < mn_lo))


def scan_field_2d(codes: jnp.ndarray, k: int, m: int, padded_len: int,
                  length: jnp.ndarray, first_tile: bool = True,
                  cols: int = 512) -> FieldTables:
    """Dense field scan (no successor tables): m-mers, hashes, window
    elections and sync flags in the 2D-tiled layout of
    scan_tables_2d."""
    P = padded_len
    C = cols
    W = k - m + 1
    R = P // C
    first_row = jnp.arange(R) == 0
    h0, cv, em_r, ep_r, eh_r, sync, em, ep, er, eh, efl = _field_core(
        codes, k, m, P, C, first_row)

    last_i = (length - k - 1).astype(_I32)
    j2d = (jax.lax.broadcasted_iota(_I32, (R, C), 0) * C
           + jax.lax.broadcasted_iota(_I32, (R, C), 1))
    # the first 2W positions' lookback would need hashes this layout
    # doesn't carry (window-0 m-mers for the first tile, the previous
    # tile's entering hashes otherwise): never flag them — the entry
    # state resolves that prefix exactly anyway
    sync = sync & (j2d <= last_i) & (j2d >= 2 * W)

    # collision flag: only windows whose elections are consumed matter
    # (window start w <= last_i + 1; w = 0 feeds the init election)
    w2d = (jax.lax.broadcasted_iota(_I32, (R, C + 1), 0) * C
           + jax.lax.broadcasted_iota(_I32, (R, C + 1), 1))
    eflag = jnp.any(efl & (w2d <= last_i + 1))

    flat = lambda a: a.reshape(-1)
    init_val = (em[0, 0] | (er[0, 0].astype(_U32) << 30))
    return FieldTables(
        h_hi=flat(h0.hi), h_lo=flat(h0.lo), cv=flat(cv), em=flat(em_r),
        ep=flat(ep_r), eh_hi=flat(eh_r.hi), eh_lo=flat(eh_r.lo),
        sync=flat(sync), last_i=last_i,
        init_val=init_val, init_p=ep[0, 0],
        init_h_hi=eh.hi[0, 0], init_h_lo=eh.lo[0, 0], eflag=eflag)


def scan_field_2d_packed(packed, k, m, padded_len, length,
                         first_tile: bool = True, cols: int = 512):
    codes = unpack_2bit(packed, padded_len)
    return scan_field_2d(codes, k, m, padded_len, length, first_tile,
                         cols)


class BatchedFieldTables(NamedTuple):
    """Field tables for a BATCH of independent records laid
    position-contiguously: record b owns flat positions
    [b*P_rec, (b+1)*P_rec). Per-record scalars become (B,) arrays."""

    h_hi: jnp.ndarray    # (B*P_rec,) flat per-position arrays
    h_lo: jnp.ndarray
    cv: jnp.ndarray
    em: jnp.ndarray
    ep: jnp.ndarray
    eh_hi: jnp.ndarray
    eh_lo: jnp.ndarray
    sync: jnp.ndarray
    last_i: jnp.ndarray      # (B,) i32 final valid LOCAL loop position
    init_val: jnp.ndarray    # (B,) u32 window-0 election value|rev<<30
    init_p: jnp.ndarray      # (B,) i32
    init_h_hi: jnp.ndarray   # (B,) u32
    init_h_lo: jnp.ndarray
    eflag: jnp.ndarray       # (B,) bool per-record collision flag


def scan_field_batched(packed, k: int, m: int, P_rec: int, lengths,
                       cols: int = 512) -> BatchedFieldTables:
    """Field scan of B records in ONE program: packed (B, P_rec//4)
    2-bit slabs, lengths (B,) i32 cleaned lengths (< k => record is
    inert). P_rec must be a multiple of cols and _B. The records share
    the (R, C) layout back-to-back; each record's rows are
    self-contained (its first row's sync lookback pads +inf, and
    positions past its last_i are masked by the per-lane bounds in
    resolve_field_batched).

    Replicates the reference's per-sequence scan loop semantics
    (SubSampler.cpp:306-510) for every record independently — the
    many-short-record analog of scan_field_2d."""
    B_n = packed.shape[0]
    C = cols
    W = k - m + 1
    P = B_n * P_rec
    R = P // C
    rpr = P_rec // C              # rows per record
    codes = unpack_2bit(packed.reshape(-1), P)
    row_idx = jnp.arange(R)
    first_row = (row_idx % rpr) == 0
    h0, cv, em_r, ep_r, eh_r, sync, em, ep, er, eh, efl = _field_core(
        codes, k, m, P, C, first_row)

    last_i = (lengths - k - 1).astype(_I32)          # (B,)
    jloc = ((row_idx % rpr)[:, None] * C
            + jax.lax.broadcasted_iota(_I32, (R, C), 1))
    li_row = last_i[row_idx // rpr]
    sync = sync & (jloc <= li_row[:, None]) & (jloc >= 2 * W)

    # per-record collision flag over consumed windows (local start
    # wloc <= last_i[b] + 1)
    wloc = ((row_idx % rpr)[:, None] * C
            + jax.lax.broadcasted_iota(_I32, (R, C + 1), 1))
    efl_m = efl & (wloc <= li_row[:, None] + 1)
    eflag = jnp.any(efl_m.reshape(B_n, rpr * (C + 1)), axis=1)

    flat = lambda a: a.reshape(-1)
    r0 = jnp.arange(B_n) * rpr
    init_val = em[r0, 0] | (er[r0, 0].astype(_U32) << 30)
    return BatchedFieldTables(
        h_hi=flat(h0.hi), h_lo=flat(h0.lo), cv=flat(cv), em=flat(em_r),
        ep=flat(ep_r), eh_hi=flat(eh_r.hi), eh_lo=flat(eh_r.lo),
        sync=flat(sync), last_i=last_i, init_val=init_val,
        init_p=ep[r0, 0], init_h_hi=eh.hi[r0, 0],
        init_h_lo=eh.lo[r0, 0], eflag=eflag)


class FieldState(NamedTuple):
    """Per-lane machine state (the reference loop's registers plus the
    previous-event bookkeeping the emits need)."""

    val: jnp.ndarray     # u32: value | rev<<30 | sel<<31 of held minimizer
    h_hi: jnp.ndarray
    h_lo: jnp.ndarray
    p: jnp.ndarray       # i32 absolute position_min
    last_ev: jnp.ndarray  # i32 absolute position of the last event (-1)
    n_ev: jnp.ndarray    # i32 events so far in this lane's resolved part


def _transpose_tables(t: FieldTables, n_blk: int):
    """Column-major (B, n_blk) views of the per-position arrays, so the
    sweep's lax.scan consumes one column per step with no in-loop
    slicing (a dynamic update on a loop-carried (n_blk, B) array costs
    a copy per column on TPU)."""
    tr = lambda a: a.reshape(n_blk, _B).T
    return (tr(t.h_hi), tr(t.h_lo), tr(t.cv), tr(t.em), tr(t.ep),
            tr(t.eh_hi), tr(t.eh_lo))


def _sweep(tT, j0, lastiv, W: int, n_blk: int, state0: FieldState,
           start, end, active_lane, force_entry: bool, thr_hi, thr_lo):
    """Run the machine over columns [start, end) of every active lane.

    tT: transposed tables from _transpose_tables. start/end: (n_blk,)
    i32 column bounds per lane. j0/lastiv: (n_blk,) i32 — each lane's
    absolute position base and final valid position (per-lane so a
    BATCH of independent records can share one sweep: every lane
    carries its own record's coordinate frame). When force_entry, an
    adoption is forced at column == start (the sync theorem's entry;
    its emit bookkeeping is deferred — the returned is_ent mask marks
    it).

    Returns (exit_state, ev(B, n_blk), prev_val(B, n_blk),
    prev_last(B, n_blk), is_ent(B, n_blk)): per-event flag + the
    PREVIOUS event's payload (val|rev<<30|sel<<31) and last_position —
    what boundary emits need — plus the explicit entry-event mask
    (cross-tile carries make last_ev arbitrarily negative, so no
    in-band plast sentinel can mark entries safely). Outputs are
    lax.scan-stacked; the caller merges sweeps (each position fires in
    exactly one ACTIVE sweep).
    """
    h_hiT, h_loT, cvT, emT, epT, eh_hiT, eh_loT = tT
    rs = jnp.arange(_B, dtype=_I32)

    def step(st, xs):
        r, nh_hi, nh_lo, cv_c, em_c, ep_c, ehh_c, ehl_c = xs
        j = j0 + r
        act = active_lane & (r >= start) & (r < end) & (j <= lastiv)
        is_entry = act & (r == start) if force_entry else \
            jnp.zeros_like(act)
        lt = (nh_hi < st.h_hi) | ((nh_hi == st.h_hi)
                                  & (nh_lo < st.h_lo))
        adopt = (act & lt) | is_entry
        expiry = act & ~adopt & (j >= st.p)
        ev = adopt | expiry

        new_hh = jnp.where(adopt, nh_hi, ehh_c)
        new_hl = jnp.where(adopt, nh_lo, ehl_c)
        sel = ((new_hh < thr_hi)
               | ((new_hh == thr_hi) & (new_hl <= thr_lo)))
        new_val = (jnp.where(adopt, cv_c, em_c)
                   | (sel.astype(_U32) << 31))
        new_p = jnp.where(adopt, j + W, ep_c + j + 1)

        prev_val = st.val
        prev_last = st.last_ev + 1
        st = FieldState(
            val=jnp.where(ev, new_val, st.val),
            h_hi=jnp.where(ev, new_hh, st.h_hi),
            h_lo=jnp.where(ev, new_hl, st.h_lo),
            p=jnp.where(ev, new_p, st.p),
            last_ev=jnp.where(ev, j, st.last_ev),
            n_ev=st.n_ev + ev.astype(_I32))
        return st, (ev, jnp.where(ev, prev_val, 0),
                    jnp.where(ev, prev_last, -1), is_entry)

    st, (ev, pval, plast, isent) = jax.lax.scan(
        step, state0, (rs, h_hiT, h_loT, cvT, emT, epT, eh_hiT, eh_loT),
        unroll=_UNROLL)
    return st, ev, pval, plast, isent


def _pow2_ge(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _rank_to_lane(offs, counts, sel_cap: int, n_blk: int):
    """lane index owning each output rank in [0, sel_cap) — the
    inverse of the per-lane count prefix sum.

    Equivalent to jnp.searchsorted(offs, arange(sel_cap), 'right') for
    ranks < offs[-1], but loop-free: searchsorted lowers to an XLA
    while loop whose ~15 iterations cost ~90 us EACH through this
    platform's remote runtime (docs/PERF.md) — ~1.3 ms per resolve.
    Scatter each non-empty lane's id at its start rank, then a running
    max fills the gaps (non-empty lanes have strictly increasing
    starts, so the scatter is collision-free). Ranks >= the total
    event count return the last non-empty lane — callers mask those
    ranks out, exactly as they clipped searchsorted's n_blk result."""
    starts = offs - counts
    lanes = jnp.arange(n_blk, dtype=_I32)
    tgt = jnp.where(counts > 0, starts, sel_cap)
    seed = jnp.zeros((sel_cap,), _I32).at[tgt].max(lanes, mode="drop")
    return jax.lax.cummax(seed)


def _lists_from_dense(ev, pval, plast, isent, j0, n_blk: int,
                      capl: int):
    """Per-lane compacted selected-event lists from dense (B, n_blk)
    sweep outputs — the XLA-backend path (the Mosaic kernel emits
    lists directly; materializing 16.7M-position dense event arrays
    and nonzero-compacting them costs ~38 ms/record on the chip,
    measured r4). Entry events (the isent mask) are excluded;
    resolve_field synthesizes them once the prefix payload is known.

    Returns (cnt(n_blk,), pos(capl, n_blk), pval(capl, n_blk),
    plast(capl, n_blk)); cnt is exact even when a lane overflows capl
    (extra events are dropped from the lists; callers detect cnt >
    capl and flag status).
    """
    emit = ev & ((pval >> 31) == 1) & ~isent
    cnt = jnp.sum(emit, axis=0).astype(_I32)
    slot = jnp.cumsum(emit.astype(_I32), axis=0) - 1
    rows = jax.lax.broadcasted_iota(_I32, (_B, n_blk), 0)
    lanes = jax.lax.broadcasted_iota(_I32, (_B, n_blk), 1)
    j = j0[None, :] + rows
    slot_c = jnp.where(emit, slot, capl)      # capl rows are dropped
    lp = jnp.zeros((capl, n_blk), _I32).at[slot_c, lanes].set(
        jnp.where(emit, j, 0), mode="drop")
    lv = jnp.zeros((capl, n_blk), _U32).at[slot_c, lanes].set(
        jnp.where(emit, pval, 0), mode="drop")
    ll = jnp.zeros((capl, n_blk), _I32).at[slot_c, lanes].set(
        jnp.where(emit, plast, 0), mode="drop")
    return cnt, lp, lv, ll


# ----------------------------------------------------------------------
# Mosaic sweep kernel: the XLA scan above costs ~90us per loop
# iteration through this TPU's remote runtime (measured r3); a Pallas
# kernel runs the same column loop natively on-core. Grid is
# (lane_chunks, col_chunks) with columns minor, so the per-lane machine
# state lives in VMEM scratch across a lane chunk's column sequence.
# Lanes are shaped (8, lc/8) so every vector op fills all VPU sublanes
# (the r3 kernel used (1, lc) rows at 1/8 utilization), and column
# chunks with no possibly-active lane skip their compute entirely —
# the prefix passes of resolve_field only touch columns [0, first
# sync), ~1/6 of each block, and passes 2+ are almost always empty.
# ----------------------------------------------------------------------

_LC = 2048               # lanes per chunk
_CC = 32                 # columns per grid step
_LANEMUL = 1024          # lane-count multiple: 8 sublanes x 128 lanes


def _sweep_kernel(li_ref, ca_ref, se_ref, st0_ref, hh_ref, hl_ref,
                  cv_ref, em_ref, ep_ref, ehh_ref, ehl_ref,
                  xs_ref, lp_ref, lv_ref, ll_ref, st, lps, lvs, lls,
                  *, W, B, lc_sz, d0, d1, n_cc, capl, force_entry,
                  tab3d):
    """One lane chunk x column chunk. Lane vectors are (d0, d1) tiles
    ((8, lc/8) for the classic 4D table layout; (16, 128) when the
    tables arrive as the scan kernel's (n_tiles, B, 128) blocks —
    tab3d — whose natural per-column read IS a (16, 128) tile)."""
    lci, cc = pl.program_id(0), pl.program_id(1)
    bc = lambda a, dt: jax.lax.bitcast_convert_type(a, dt)

    if tab3d:
        tread = lambda ref, u: ref[:, u, :]
    else:
        tread = lambda ref, u: ref[u, 0]

    @pl.when(cc == 0)
    def _():
        st[0:6] = st0_ref[:, 0]
        st[6] = jnp.zeros((d0, d1), _U32)
        lps[...] = jnp.zeros((capl, d0, d1), _I32)
        lvs[...] = jnp.zeros((capl, d0, d1), _U32)
        lls[...] = jnp.zeros((capl, d0, d1), _I32)

    @pl.when(ca_ref[lci, cc] != 0)
    def _():
        # all lane vectors are full (8, sub) tiles
        val = st[0]
        h_hi = st[1]
        h_lo = st[2]
        p = bc(st[3], _I32)
        last_ev = bc(st[4], _I32)
        n_ev = bc(st[5], _I32)
        cnt = bc(st[6], _I32)

        start = se_ref[0, 0]
        end = se_ref[1, 0]
        active = se_ref[2, 0] != 0
        lane_j0 = se_ref[3, 0]       # per-lane absolute position base
        lastiv = se_ref[4, 0]        # per-lane final valid position
        # scalar bitcast is not a Mosaic op; i32->u32 convert is
        # modular in XLA, so astype preserves the bit pattern
        thr_hi = li_ref[0].astype(_U32)
        thr_lo = li_ref[1].astype(_U32)

        for u in range(_CC):
            r = cc * _CC + u
            j = lane_j0 + r
            act = active & (r >= start) & (r < end) & (j <= lastiv)
            nh_hi = tread(hh_ref, u)
            nh_lo = tread(hl_ref, u)
            lt = (nh_hi < h_hi) | ((nh_hi == h_hi) & (nh_lo < h_lo))
            if force_entry:
                is_entry = act & (r == start)
                adopt = (act & lt) | is_entry
            else:
                adopt = act & lt
            expiry = act & (~adopt) & (j >= p)
            ev = adopt | expiry

            new_hh = jnp.where(adopt, nh_hi, tread(ehh_ref, u))
            new_hl = jnp.where(adopt, nh_lo, tread(ehl_ref, u))
            sel = ((new_hh < thr_hi)
                   | ((new_hh == thr_hi) & (new_hl <= thr_lo)))
            new_val = (jnp.where(adopt, tread(cv_ref, u),
                                 tread(em_ref, u))
                       | (sel.astype(_U32) << 31))
            new_p = jnp.where(adopt, j + W,
                              tread(ep_ref, u) + j + 1)

            # selected-emit list append: the event at j closes the
            # super-k-mer held in the PRE-update state; entry events
            # (unknown prefix payload) are synthesized by the caller
            emit = ev & ((val >> 31) == 1)
            if force_entry:
                emit = emit & ~is_entry
            pl_v = last_ev + 1
            for c0 in range(capl):
                hit = emit & (cnt == c0)
                lps[c0] = jnp.where(hit, j, lps[c0])
                lvs[c0] = jnp.where(hit, val, lvs[c0])
                lls[c0] = jnp.where(hit, pl_v, lls[c0])
            cnt = cnt + emit.astype(_I32)

            val = jnp.where(ev, new_val, val)
            h_hi = jnp.where(ev, new_hh, h_hi)
            h_lo = jnp.where(ev, new_hl, h_lo)
            p = jnp.where(ev, new_p, p)
            last_ev = jnp.where(ev, j, last_ev)
            n_ev = n_ev + ev.astype(_I32)

        st[0] = val
        st[1] = h_hi
        st[2] = h_lo
        st[3] = bc(p, _U32)
        st[4] = bc(last_ev, _U32)
        st[5] = bc(n_ev, _U32)
        st[6] = bc(cnt, _U32)

    @pl.when(cc == n_cc - 1)
    def _():
        xs_ref[0] = st[...]
        lp_ref[0] = lps[...]
        lv_ref[0] = lvs[...]
        ll_ref[0] = lls[...]


def _sweep_pallas(tT, j0, lastiv, W: int, n_blk: int,
                  state0: FieldState, start, end, active_lane,
                  force_entry: bool, thr_hi, thr_lo, capl: int = 16,
                  interpret: bool | None = None):
    """Pallas sweep emitting per-lane compacted selected-event lists —
    same contract as _sweep + _lists_from_dense: returns
    (exit_state, cnt(n_blk,), pos(capl, n_blk), pval(capl, n_blk),
    plast(capl, n_blk)). j0/lastiv: per-lane position base and bound
    (see _sweep).

    Lanes pad up to a _LANEMUL multiple with inactive lanes (they sit
    after the real ones, so predecessor chaining is unaffected);
    outputs slice back. The 4 Mbp production tiles (16384 lanes) are
    already aligned, so the pads only exist for small inputs.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = _B
    tab3d = tT[0].ndim == 3
    if tab3d:
        # tables arrive as the scan kernel's (n_tiles, B, 128) blocks
        # (ops/fused.py): physical lane l = 128*tile + within, lane
        # tiles are (16, 128) slices read straight from HBM — the
        # 2D->4D XLA relayout of 7 full tables measured ~2.5 ms per
        # resolve. Lanes must be pre-padded: 128*n_tiles == n_blk, a
        # multiple of _LC.
        nb = n_blk
        n_t = tT[0].shape[0]
        assert tT[0].shape == (n_t, B, 128) and 128 * n_t == nb, (
            tT[0].shape, nb)
        lc = min(_LC, nb)
        assert nb % lc == 0 and lc % 128 == 0
        d0, d1 = lc // 128, 128
        n_lc = nb // lc
    else:
        nb = -(-n_blk // _LANEMUL) * _LANEMUL
        lc = min(_LC, nb)
        while nb % lc:       # nb is a _LANEMUL multiple, lc a pow2:
            lc //= 2         # halving always terminates at a divisor
        assert nb % lc == 0 and lc % 8 == 0, (nb, lc)
        d0, d1 = 8, lc // 8
        n_lc = nb // lc

    def padl(a, fill=0):
        if nb == n_blk:
            return a
        pad_shape = a.shape[:-1] + (nb - n_blk,)
        return jnp.concatenate(
            [a, jnp.full(pad_shape, fill, a.dtype)], axis=-1)

    n_cc = B // _CC

    li = jnp.stack([jax.lax.bitcast_convert_type(
                        jnp.asarray(thr_hi, _U32), _I32).reshape(()),
                    jax.lax.bitcast_convert_type(
                        jnp.asarray(thr_lo, _U32), _I32).reshape(())])
    se = jnp.stack([padl(start.astype(_I32)), padl(end.astype(_I32)),
                    padl(active_lane.astype(_I32)),
                    padl(j0.astype(_I32)),
                    padl(lastiv.astype(_I32), -1)])
    st0 = jnp.stack([
        padl(state0.val), padl(state0.h_hi), padl(state0.h_lo),
        padl(jax.lax.bitcast_convert_type(state0.p, _U32)),
        padl(jax.lax.bitcast_convert_type(state0.last_ev, _U32)),
        padl(jax.lax.bitcast_convert_type(state0.n_ev, _U32))])

    # per-(lane-chunk, col-chunk) activity: a chunk whose columns can
    # produce no event for any of its lanes skips all compute.  The
    # j <= lastiv bound uses the chunk's smallest column (j grows with
    # r), so this is conservative (never skips a live chunk).
    ccs = jnp.arange(n_cc, dtype=_I32) * _CC
    la = (padl(active_lane)[:, None]
          & (se[0][:, None] < ccs[None, :] + _CC)
          & (se[1][:, None] > ccs[None, :])
          & (se[3][:, None] + ccs[None, :] <= se[4][:, None]))
    ca = jnp.any(la.reshape(n_lc, lc, n_cc), axis=1).astype(_I32)

    r4 = lambda a: a.reshape(a.shape[:-1] + (n_lc, d0, d1))
    kern = functools.partial(_sweep_kernel, W=W, B=B, lc_sz=lc,
                             d0=d0, d1=d1, n_cc=n_cc, capl=capl,
                             force_entry=force_entry, tab3d=tab3d)
    if tab3d:
        tabs = tT
        tab = lambda: pl.BlockSpec((d0, _CC, d1),
                                   lambda l, c: (l, c, 0))
    else:
        tabs = tuple(r4(padl(a)) for a in tT)
        tab = lambda: pl.BlockSpec((_CC, 1, d0, d1),
                                   lambda l, c: (c, l, 0, 0))
    lanes = lambda rows: pl.BlockSpec((rows, 1, d0, d1),
                                      lambda l, c: (0, l, 0, 0))
    perlane = lambda rows: pl.BlockSpec((1, rows, d0, d1),
                                        lambda l, c: (l, 0, 0, 0))
    xs, lp, lv, ll = pl.pallas_call(
        kern,
        grid=(n_lc, n_cc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # li scalars
            pl.BlockSpec(memory_space=pltpu.SMEM),   # ca chunk activity
            lanes(5),                           # start/end/active/j0/li
            lanes(6),                                # state0
            tab(), tab(), tab(), tab(), tab(), tab(), tab(),
        ],
        out_specs=(perlane(7), perlane(capl), perlane(capl),
                   perlane(capl)),
        out_shape=(
            jax.ShapeDtypeStruct((n_lc, 7, d0, d1), _U32),
            jax.ShapeDtypeStruct((n_lc, capl, d0, d1), _I32),
            jax.ShapeDtypeStruct((n_lc, capl, d0, d1), _U32),
            jax.ShapeDtypeStruct((n_lc, capl, d0, d1), _I32),
        ),
        scratch_shapes=[pltpu.VMEM((7, d0, d1), _U32),
                        pltpu.VMEM((capl, d0, d1), _I32),
                        pltpu.VMEM((capl, d0, d1), _U32),
                        pltpu.VMEM((capl, d0, d1), _I32)],
        interpret=interpret,
    )(li, ca, r4(se), r4(st0), *tabs)

    unlane = lambda a, rows: a.transpose(1, 0, 2, 3).reshape(
        rows, nb)[:, :n_blk]
    xs = unlane(xs, 7)
    stf = FieldState(
        val=xs[0], h_hi=xs[1], h_lo=xs[2],
        p=jax.lax.bitcast_convert_type(xs[3], _I32),
        last_ev=jax.lax.bitcast_convert_type(xs[4], _I32),
        n_ev=jax.lax.bitcast_convert_type(xs[5], _I32))
    cnt = jax.lax.bitcast_convert_type(xs[6], _I32)
    return (stf, cnt, unlane(lp, capl), unlane(lv, capl),
            unlane(ll, capl))


def _run_sweep(tT, j0, lastiv, W, n_blk, state0, start, end,
               active_lane, force_entry, thr_hi, thr_lo, capl):
    """Backend dispatch: Mosaic kernel on TPU (native column loop +
    in-kernel list emission), the XLA lax.scan + dense-to-list
    conversion elsewhere (this platform's XLA while-loop iterations
    cost ~90us through the remote runtime; Mosaic loops are on-core).

    Returns (exit_state, cnt, pos_list, pval_list, plast_list)."""
    if jax.default_backend() == "tpu":
        return _sweep_pallas(tT, j0, lastiv, W, n_blk, state0, start,
                             end, active_lane, force_entry, thr_hi,
                             thr_lo, capl)
    st, ev, pval, plast, isent = _sweep(tT, j0, lastiv, W, n_blk,
                                        state0, start, end, active_lane,
                                        force_entry, thr_hi, thr_lo)
    return (st,) + _lists_from_dense(ev, pval, plast, isent, j0, n_blk,
                                     capl)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def resolve_field(t: FieldTables, k: int, m: int, sel_cap: int,
                  entry, thr_hi, thr_lo):
    """Resolve the whole event chain from a FieldTables.

    entry: i32[8] machine state entering this region —
      [val|rev<<30 (bitcast), h_hi, h_lo, p, last_ev, n_ev_prior,
       unused, unused]; build with field_entry_init / carry rebasing.

    Returns one int32 fetch array:
      [status, n_sel, n_ev, last_ev_pos, tail_val, tail_rev, tail_sel,
       exit_val, exit_h_hi, exit_h_lo, exit_p, exit_last_ev,
       pos[cap], last[cap], val[cap], rev[cap]]
    status != 0 => unresolved blocks remain (caller must fall back).
    """
    W = k - m + 1
    P = t.h_hi.shape[0]
    n_real = P // _B
    B = _B
    # pad lanes once to the Mosaic kernel's lane-chunk multiple (the
    # pads sit after the real lanes, are never live, and cost nothing
    # downstream); every per-lane array below uses the padded count
    lc = min(_LC, n_real)
    n_blk = -(-n_real // lc) * lc
    lanes = jnp.arange(n_blk, dtype=_I32)
    lane_base = lanes * B

    sync2 = t.sync.reshape(n_real, B)
    if n_blk != n_real:
        sync2 = jnp.concatenate(
            [sync2, jnp.zeros((n_blk - n_real, B), bool)])
    has_sync = jnp.any(sync2, axis=1)
    fs = jnp.argmax(sync2, axis=1).astype(_I32)
    fs = jnp.where(has_sync, fs, B)
    # lanes with no valid loop position are inert: resolved by fiat,
    # their (meaningless) exits only feed equally-inert successors
    live = lane_base <= t.last_i

    thr_hi = jnp.asarray(thr_hi, _U32).reshape(())
    thr_lo = jnp.asarray(thr_lo, _U32).reshape(())
    zst = FieldState(
        val=jnp.zeros((n_blk,), _U32),
        h_hi=jnp.full((n_blk,), 0xFFFFFFFF, _U32),
        h_lo=jnp.full((n_blk,), 0xFFFFFFFF, _U32),
        p=jnp.zeros((n_blk,), _I32),
        last_ev=jnp.full((n_blk,), -1, _I32),
        n_ev=jnp.zeros((n_blk,), _I32))
    tT = _transpose_tables(t, n_real)
    if n_blk != n_real:
        tT = tuple(jnp.concatenate(
            [a, jnp.zeros((B, n_blk - n_real), a.dtype)], axis=1)
            for a in tT)

    # per-lane selected-event list capacity: sized so the expected
    # occupancy (sel_cap spread over the lanes) has ~8x headroom;
    # overflowing lanes raise status and the caller falls back
    capl = min(128, max(16, _pow2_ge(
        -((-8 * sel_cap) // max(n_real, 1)))))

    lastiv = jnp.broadcast_to(t.last_i, (n_blk,)).astype(_I32)

    # ---- sweep 1: suffixes from each block's first sync ----
    st1, c_suf, suf_p, suf_v, suf_l = _run_sweep(
        tT, lane_base, lastiv, W, n_blk, zst, fs,
        jnp.full((n_blk,), B, _I32), has_sync, True, thr_hi, thr_lo,
        capl)

    exit_val = st1.val
    exit_hh = st1.h_hi
    exit_hl = st1.h_lo
    exit_p = st1.p
    exit_le = st1.last_ev
    suffix_ev = st1.n_ev
    exit_known = has_sync | ~live

    # ---- sweep 2 (iterated): prefixes from the predecessor's exit ----
    ent_val = jax.lax.bitcast_convert_type(entry[0], _U32).reshape(())
    ent_hh = jax.lax.bitcast_convert_type(entry[1], _U32).reshape(())
    ent_hl = jax.lax.bitcast_convert_type(entry[2], _U32).reshape(())
    ent_p = entry[3]
    ent_le = entry[4]

    def pred(a, first):
        return jnp.concatenate([jnp.asarray(first, a.dtype)[None],
                                a[:-1]])

    prefix_done = ~live
    prefix_ev = jnp.zeros((n_blk,), _I32)
    # state at the end of each lane's prefix (== pred exit when the
    # prefix has no events): the payload the lane's sync event closes
    pre_val = jnp.zeros((n_blk,), _U32)
    pre_le = jnp.full((n_blk,), -1, _I32)
    c_pre = jnp.zeros((n_blk,), _I32)
    pre_p = jnp.zeros((capl, n_blk), _I32)
    pre_v = jnp.zeros((capl, n_blk), _U32)
    pre_l = jnp.zeros((capl, n_blk), _I32)
    for _ in range(_MAX_PASSES):
        pred_known = pred(exit_known, True)
        can = ~prefix_done & pred_known
        st0 = FieldState(
            val=pred(exit_val, ent_val),
            h_hi=pred(exit_hh, ent_hh),
            h_lo=pred(exit_hl, ent_hl),
            p=pred(exit_p, ent_p),
            last_ev=pred(exit_le, ent_le),
            n_ev=jnp.zeros((n_blk,), _I32))
        st2, c2, p2, v2, l2 = _run_sweep(
            tT, lane_base, lastiv, W, n_blk, st0,
            jnp.zeros((n_blk,), _I32), fs, can, False, thr_hi, thr_lo,
            capl)
        canw = can[None, :]
        pre_p = jnp.where(canw, p2, pre_p)
        pre_v = jnp.where(canw, v2, pre_v)
        pre_l = jnp.where(canw, l2, pre_l)
        c_pre = jnp.where(can, c2, c_pre)
        prefix_ev = jnp.where(can, st2.n_ev, prefix_ev)
        pre_val = jnp.where(can, st2.val, pre_val)
        pre_le = jnp.where(can, st2.last_ev, pre_le)
        # syncless blocks: the "prefix" is the whole block; its end
        # state is the block exit
        newly_exit = can & ~has_sync
        exit_val = jnp.where(newly_exit, st2.val, exit_val)
        exit_hh = jnp.where(newly_exit, st2.h_hi, exit_hh)
        exit_hl = jnp.where(newly_exit, st2.h_lo, exit_hl)
        exit_p = jnp.where(newly_exit, st2.p, exit_p)
        exit_le = jnp.where(newly_exit, st2.last_ev, exit_le)
        exit_known = exit_known | newly_exit
        prefix_done = prefix_done | can
    # unresolved lanes, any per-lane list overflow, or an election
    # hash-collision flag all force the caller's exact fallback
    status = (jnp.sum(~prefix_done) + jnp.sum(c_suf > capl)
              + jnp.sum(c_pre > capl)
              + t.eflag.astype(_I32)).astype(_I32)

    # ---- synthesize the deferred entry emits: each sync event closes
    # the super-k-mer carried at the end of ITS OWN prefix (which
    # equals the predecessor's exit when the prefix had no events) ----
    e_sel = has_sync & ((pre_val >> 31) == 1)
    e_pos = lane_base + fs
    e_val = pre_val
    e_last = pre_le + 1

    # ---- selected-boundary extraction (9-tuple compact contract) ----
    # per lane, position order is: prefix list, entry event, suffix
    # list; lanes ascend, so concatenation order == global position
    # order. Output rank i maps to (lane, section, slot) through the
    # per-lane count prefix sums — every array here is sel_cap- or
    # n_blk-sized (the dense 16.7M-position nonzero this replaces cost
    # ~38 ms/record on-chip).
    counts = c_pre + e_sel.astype(_I32) + c_suf
    n_sel = jnp.sum(counts).astype(_I32)
    n_ev = jnp.sum(suffix_ev) + jnp.sum(prefix_ev) + entry[5]

    offs = jnp.cumsum(counts)
    iidx = jnp.arange(sel_cap, dtype=_I32)
    lane_i = _rank_to_lane(offs, counts, sel_cap, n_blk)
    lane_c = jnp.clip(lane_i, 0, n_blk - 1).astype(_I32)
    base = offs[lane_c] - counts[lane_c]
    r_in = iidx - base
    cp = c_pre[lane_c]
    es = e_sel[lane_c]
    in_pre = r_in < cp
    is_ent = (r_in == cp) & es
    suf_slot = r_in - cp - es.astype(_I32)
    pre_idx = jnp.clip(r_in, 0, capl - 1) * n_blk + lane_c
    suf_idx = jnp.clip(suf_slot, 0, capl - 1) * n_blk + lane_c

    def pick(pre_a, e_a, suf_a):
        return jnp.where(
            in_pre, pre_a.reshape(-1)[pre_idx],
            jnp.where(is_ent, e_a[lane_c], suf_a.reshape(-1)[suf_idx]))

    ok = iidx < n_sel
    pos = jnp.where(ok, pick(pre_p, e_pos, suf_p), -1)
    last = jnp.where(ok, pick(pre_l, e_last, suf_l), -1)
    valw = jnp.where(ok, pick(pre_v, e_val, suf_v), 0)
    val = valw & ((1 << 30) - 1)
    rev = (valw >> 30) & 1

    # tail/carry: the LAST LIVE lane's exit (the machine state at
    # last_i); with no live lane the entry state passes through
    lane_q = jnp.clip(t.last_i // B, 0, n_blk - 1)
    no_live = t.last_i < 0
    x_val = jnp.where(no_live, ent_val, exit_val[lane_q])
    x_hh = jnp.where(no_live, ent_hh, exit_hh[lane_q])
    x_hl = jnp.where(no_live, ent_hl, exit_hl[lane_q])
    x_p = jnp.where(no_live, ent_p, exit_p[lane_q])
    x_le = jnp.where(no_live, ent_le, exit_le[lane_q])
    tail_val = x_val & ((1 << 30) - 1)
    tail_rev = (x_val >> 30) & 1
    tail_sel = (x_val >> 31) & 1
    last_ev_pos = x_le

    head = jnp.stack([
        status, n_sel, n_ev.astype(_I32), last_ev_pos,
        jax.lax.bitcast_convert_type(tail_val, _I32).reshape(()),
        tail_rev.astype(_I32), tail_sel.astype(_I32),
        jax.lax.bitcast_convert_type(x_val, _I32).reshape(()),
        jax.lax.bitcast_convert_type(x_hh, _I32).reshape(()),
        jax.lax.bitcast_convert_type(x_hl, _I32).reshape(()),
        x_p, x_le])
    return jnp.concatenate([
        head, pos, last,
        jax.lax.bitcast_convert_type(val, _I32), rev.astype(_I32)])


_HEAD = 12
_BHEAD = 8


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def resolve_field_batched(t: BatchedFieldTables, k: int, m: int,
                          sel_cap: int, P_rec: int, thr_hi, thr_lo):
    """Resolve the event chains of a whole record batch in one program.

    Every record is independent: lanes carry per-record local position
    frames (the generalized sweeps take per-lane j0/last_i), and the
    predecessor chaining of sweep 2 resets at record-head lanes to that
    record's window-0 entry election (reference SubSampler.cpp:359-365)
    instead of the previous lane's exit.

    Returns one int32 fetch array:
      [global_status, n_sel_total,
       B x _BHEAD per-record heads: (status, n_sel, n_ev, last_ev_pos,
                                     tail_val, tail_rev, tail_sel, 0),
       pos[sel_cap], last[sel_cap], val[sel_cap], rev[sel_cap]]
    where the sel lists are record-major (record b's events occupy the
    contiguous rank range given by the heads' n_sel prefix sums) and
    positions are LOCAL to each record. n_sel_total > sel_cap means
    truncated lists (caller re-dispatches with a bigger cap);
    status != 0 means unresolved/overflowed lanes in that record
    (caller falls back to the exact walker path for it)."""
    W = k - m + 1
    B = _B
    P = t.h_hi.shape[0]
    B_n = t.last_i.shape[0]
    lpr = P_rec // B             # lanes per record
    n_real = P // B
    lc = min(_LC, n_real)
    n_blk = -(-n_real // lc) * lc
    lanes = jnp.arange(n_blk, dtype=_I32)
    real = lanes < n_real
    lane_rec = jnp.clip(lanes // lpr, 0, B_n - 1)
    lane_base = (lanes % lpr) * B            # record-local
    lastiv = jnp.where(real, t.last_i[lane_rec], -1)
    is_head = (lanes % lpr == 0) & real

    sync2 = t.sync.reshape(n_real, B)
    if n_blk != n_real:
        sync2 = jnp.concatenate(
            [sync2, jnp.zeros((n_blk - n_real, B), bool)])
    has_sync = jnp.any(sync2, axis=1)
    fs = jnp.argmax(sync2, axis=1).astype(_I32)
    fs = jnp.where(has_sync, fs, B)
    live = (lane_base <= lastiv) & real

    thr_hi = jnp.asarray(thr_hi, _U32).reshape(())
    thr_lo = jnp.asarray(thr_lo, _U32).reshape(())
    zst = FieldState(
        val=jnp.zeros((n_blk,), _U32),
        h_hi=jnp.full((n_blk,), 0xFFFFFFFF, _U32),
        h_lo=jnp.full((n_blk,), 0xFFFFFFFF, _U32),
        p=jnp.zeros((n_blk,), _I32),
        last_ev=jnp.full((n_blk,), -1, _I32),
        n_ev=jnp.zeros((n_blk,), _I32))
    tT = _transpose_tables(t, n_real)
    if n_blk != n_real:
        tT = tuple(jnp.concatenate(
            [a, jnp.zeros((B, n_blk - n_real), a.dtype)], axis=1)
            for a in tT)

    capl = min(128, max(16, _pow2_ge(
        -((-8 * sel_cap) // max(n_real, 1)))))

    # ---- sweep 1: suffixes from each block's first sync ----
    st1, c_suf, suf_p, suf_v, suf_l = _run_sweep(
        tT, lane_base, lastiv, W, n_blk, zst, fs,
        jnp.full((n_blk,), B, _I32), has_sync, True, thr_hi, thr_lo,
        capl)

    exit_val = st1.val
    exit_hh = st1.h_hi
    exit_hl = st1.h_lo
    exit_p = st1.p
    exit_le = st1.last_ev
    suffix_ev = st1.n_ev
    exit_known = has_sync | ~live

    # ---- per-record entry elections (window 0, incl. sel bit) ----
    sel_e = ((t.init_h_hi < thr_hi)
             | ((t.init_h_hi == thr_hi) & (t.init_h_lo <= thr_lo)))
    ent_val_r = t.init_val | (sel_e.astype(_U32) << 31)   # (B_n,)
    ev_val = ent_val_r[lane_rec]
    ev_hh = t.init_h_hi[lane_rec]
    ev_hl = t.init_h_lo[lane_rec]
    ev_p = t.init_p[lane_rec]
    ev_le = jnp.full((n_blk,), -1, _I32)

    def pred(a, headv):
        sh = jnp.concatenate([a[:1], a[:-1]])
        return jnp.where(is_head, headv, sh)

    # ---- sweep 2 (iterated): prefixes from the predecessor's exit,
    # record-head lanes from their record's entry ----
    prefix_done = ~live
    prefix_ev = jnp.zeros((n_blk,), _I32)
    pre_val = jnp.zeros((n_blk,), _U32)
    pre_le = jnp.full((n_blk,), -1, _I32)
    c_pre = jnp.zeros((n_blk,), _I32)
    pre_p = jnp.zeros((capl, n_blk), _I32)
    pre_v = jnp.zeros((capl, n_blk), _U32)
    pre_l = jnp.zeros((capl, n_blk), _I32)
    true_head = jnp.ones((n_blk,), bool)
    for _ in range(_MAX_PASSES):
        pred_known = pred(exit_known, true_head)
        can = ~prefix_done & pred_known
        st0 = FieldState(
            val=pred(exit_val, ev_val),
            h_hi=pred(exit_hh, ev_hh),
            h_lo=pred(exit_hl, ev_hl),
            p=pred(exit_p, ev_p),
            last_ev=pred(exit_le, ev_le),
            n_ev=jnp.zeros((n_blk,), _I32))
        st2, c2, p2, v2, l2 = _run_sweep(
            tT, lane_base, lastiv, W, n_blk, st0,
            jnp.zeros((n_blk,), _I32), fs, can, False, thr_hi, thr_lo,
            capl)
        canw = can[None, :]
        pre_p = jnp.where(canw, p2, pre_p)
        pre_v = jnp.where(canw, v2, pre_v)
        pre_l = jnp.where(canw, l2, pre_l)
        c_pre = jnp.where(can, c2, c_pre)
        prefix_ev = jnp.where(can, st2.n_ev, prefix_ev)
        pre_val = jnp.where(can, st2.val, pre_val)
        pre_le = jnp.where(can, st2.last_ev, pre_le)
        newly_exit = can & ~has_sync
        exit_val = jnp.where(newly_exit, st2.val, exit_val)
        exit_hh = jnp.where(newly_exit, st2.h_hi, exit_hh)
        exit_hl = jnp.where(newly_exit, st2.h_lo, exit_hl)
        exit_p = jnp.where(newly_exit, st2.p, exit_p)
        exit_le = jnp.where(newly_exit, st2.last_ev, exit_le)
        exit_known = exit_known | newly_exit
        prefix_done = prefix_done | can

    bad_lane = ((~prefix_done) | (c_suf > capl)
                | (c_pre > capl)).astype(_I32)
    status_rec = jax.ops.segment_sum(bad_lane, lane_rec,
                                     num_segments=B_n)
    # election hash-collision flag: that record takes the exact
    # standalone fallback
    status_rec = status_rec + t.eflag.astype(_I32)

    # ---- deferred entry emits (sync events closing their own
    # prefix's payload) ----
    e_sel = has_sync & ((pre_val >> 31) == 1)
    e_pos = lane_base + fs
    e_val = pre_val
    e_last = pre_le + 1

    counts = c_pre + e_sel.astype(_I32) + c_suf
    n_sel = jnp.sum(counts).astype(_I32)
    n_sel_rec = jax.ops.segment_sum(counts, lane_rec,
                                    num_segments=B_n)
    n_ev_rec = jax.ops.segment_sum(suffix_ev + prefix_ev, lane_rec,
                                   num_segments=B_n)

    # ---- selected-boundary extraction (record-major global ranks) ----
    offs = jnp.cumsum(counts)
    iidx = jnp.arange(sel_cap, dtype=_I32)
    lane_i = _rank_to_lane(offs, counts, sel_cap, n_blk)
    lane_c = jnp.clip(lane_i, 0, n_blk - 1).astype(_I32)
    base = offs[lane_c] - counts[lane_c]
    r_in = iidx - base
    cp = c_pre[lane_c]
    es = e_sel[lane_c]
    in_pre = r_in < cp
    is_ent = (r_in == cp) & es
    suf_slot = r_in - cp - es.astype(_I32)
    pre_idx = jnp.clip(r_in, 0, capl - 1) * n_blk + lane_c
    suf_idx = jnp.clip(suf_slot, 0, capl - 1) * n_blk + lane_c

    def pick(pre_a, e_a, suf_a):
        return jnp.where(
            in_pre, pre_a.reshape(-1)[pre_idx],
            jnp.where(is_ent, e_a[lane_c], suf_a.reshape(-1)[suf_idx]))

    ok = iidx < n_sel
    pos = jnp.where(ok, pick(pre_p, e_pos, suf_p), -1)
    last = jnp.where(ok, pick(pre_l, e_last, suf_l), -1)
    valw = jnp.where(ok, pick(pre_v, e_val, suf_v), 0)
    val = valw & ((1 << 30) - 1)
    rev = (valw >> 30) & 1

    # ---- per-record tails: the LAST LIVE lane's exit ----
    lane_q = (jnp.arange(B_n, dtype=_I32) * lpr
              + jnp.clip(t.last_i // B, 0, lpr - 1))
    no_live = t.last_i < 0
    x_val = jnp.where(no_live, ent_val_r, exit_val[lane_q])
    x_le = jnp.where(no_live, jnp.int32(-1), exit_le[lane_q])
    tail_val = x_val & ((1 << 30) - 1)
    tail_rev = (x_val >> 30) & 1
    tail_sel = (x_val >> 31) & 1

    heads = jnp.stack([
        status_rec.astype(_I32), n_sel_rec.astype(_I32),
        n_ev_rec.astype(_I32), x_le,
        jax.lax.bitcast_convert_type(tail_val, _I32),
        tail_rev.astype(_I32), tail_sel.astype(_I32),
        jnp.zeros((B_n,), _I32)], axis=1)          # (B_n, _BHEAD)
    g = jnp.stack([jnp.sum(status_rec).astype(_I32), n_sel])
    return jnp.concatenate([
        g, heads.reshape(-1), pos, last,
        jax.lax.bitcast_convert_type(val, _I32), rev.astype(_I32)])


def parse_batched_heads(arr: np.ndarray, cap: int, B_n: int):
    """Zero-copy split of resolve_field_batched's fetch array:
    (global_status, n_sel_total, heads (B_n, _BHEAD) i32, pos, last,
    val u32, rev) — no per-record slicing (the batch-granular assembly
    path slices runs itself). Truncation (n_total > cap) returns None
    bodies; caller re-dispatches with a bigger cap."""
    gstatus = int(arr[0])
    n_total = int(arr[1])
    heads = arr[2 : 2 + _BHEAD * B_n].reshape(B_n, _BHEAD)
    if n_total > cap:
        return gstatus, n_total, heads, None, None, None, None
    body = arr[2 + _BHEAD * B_n:]
    return (gstatus, n_total, heads, body[:cap], body[cap : 2 * cap],
            body[2 * cap : 3 * cap].view(np.uint32),
            body[3 * cap : 4 * cap])


def parse_batched_array(arr: np.ndarray, cap: int, B_n: int):
    """Host-side split of resolve_field_batched's fetch array into
    (global_status, n_sel_total, per-record compact 9-tuples,
    per-record n_sel). Truncation (n_sel_total > cap) returns comps
    None — caller must re-dispatch with a bigger cap."""
    gstatus = int(arr[0])
    n_total = int(arr[1])
    if n_total > cap:
        return gstatus, n_total, None, None
    heads = arr[2 : 2 + _BHEAD * B_n].reshape(B_n, _BHEAD)
    body = arr[2 + _BHEAD * B_n:]
    pos = body[:cap]
    last = body[cap : 2 * cap]
    val = body[2 * cap : 3 * cap].view(np.uint32)
    rev = body[3 * cap : 4 * cap]
    n_sel_rec = heads[:, 1].astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(n_sel_rec)])
    comps = []
    for b in range(B_n):
        s, e = int(offs[b]), int(offs[b + 1])
        comps.append((
            pos[s:e].astype(np.int64), last[s:e].astype(np.int64),
            val[s:e], rev[s:e] != 0, int(heads[b, 2]),
            int(heads[b, 3]), int(np.int64(heads[b, 4]) & 0xFFFFFFFF),
            bool(heads[b, 5]), bool(heads[b, 6])))
    return gstatus, n_total, comps, heads[:, 0].astype(np.int64)


def _use_fused() -> bool:
    """Opt-in switch for the v2 fused kernels (ops/fused.py): set
    SPSP_FUSED=1. Parity-validated on-chip, but the resolve glue has
    not beaten the v1 path yet (build/var_results.txt); the default
    flips once it does."""
    import os

    return (jax.default_backend() == "tpu"
            and os.environ.get("SPSP_FUSED", "0") != "0")


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _scan_resolve_batch_v1(packed, k: int, m: int, P_rec: int,
                           sel_cap: int, lengths, thr_hi, thr_lo):
    t = scan_field_batched(packed, k, m, P_rec, lengths)
    return resolve_field_batched(t, k, m, sel_cap, P_rec, thr_hi,
                                 thr_lo)


def scan_resolve_batch(packed, k: int, m: int, P_rec: int,
                       sel_cap: int, lengths, thr_hi, thr_lo):
    """Fused batch dispatch: scan + resolve of a (B, P_rec//4) packed
    record batch as ONE program — one RPC and one D2H round-trip for
    the whole batch (the many-short-record path; reference streams any
    record shape through one loop, SubSampler.cpp:334-347). On TPU the
    v2 Mosaic path (ops/fused.py) runs by default."""
    if _use_fused():
        from supersampler_tpu.ops.fused import fused_batch

        return fused_batch(packed, k, m, P_rec, sel_cap, False,
                           lengths, thr_hi, thr_lo)
    return _scan_resolve_batch_v1(packed, k, m, P_rec, sel_cap,
                                  lengths, thr_hi, thr_lo)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _scan_resolve_single_v1(slab, k: int, m: int, P: int,
                            sel_cap: int, length, thr_hi, thr_lo):
    t = scan_field_2d_packed(slab[32:], k, m, P, length, True)
    entry = field_entry_init(t, thr_hi, thr_lo)
    return resolve_field(t, k, m, sel_cap, entry, thr_hi, thr_lo)


def scan_resolve_single(slab, k: int, m: int, P: int, sel_cap: int,
                        length, thr_hi, thr_lo):
    """Fused single-tile dispatch: unpack + field scan + entry + full
    resolution as ONE jit program (one RPC through the remote runtime
    instead of three; the intermediate FieldTables never materialize as
    separate dispatch boundaries).

    slab: the 128-position-halo'd packed byte array of a single-tile
    record ((128 + P) / 4 bytes); the halo is sliced off on device
    (XLA fuses the slice into the unpack). Returns resolve_field's
    fetch array. On TPU the v2 Mosaic path (ops/fused.py) runs by
    default."""
    if _use_fused():
        from supersampler_tpu.ops.fused import fused_single

        return fused_single(slab, k, m, P, sel_cap, False, length,
                            thr_hi, thr_lo)
    return _scan_resolve_single_v1(slab, k, m, P, sel_cap, length,
                                   thr_hi, thr_lo)


@jax.jit
def field_entry_init(t: FieldTables, thr_hi, thr_lo):
    """Entry state for the first region of a sequence: the window-0
    election (reference SubSampler.cpp:359-365), its sel bit included."""
    thr_hi = jnp.asarray(thr_hi, _U32).reshape(())
    thr_lo = jnp.asarray(thr_lo, _U32).reshape(())
    sel = ((t.init_h_hi < thr_hi)
           | ((t.init_h_hi == thr_hi) & (t.init_h_lo <= thr_lo)))
    val = t.init_val | (sel.astype(_U32) << 31)
    z = jnp.int32(0)
    return jnp.stack([
        jax.lax.bitcast_convert_type(val, _I32).reshape(()),
        jax.lax.bitcast_convert_type(t.init_h_hi, _I32).reshape(()),
        jax.lax.bitcast_convert_type(t.init_h_lo, _I32).reshape(()),
        t.init_p.astype(_I32), jnp.int32(-1), z, z, z])


@functools.partial(jax.jit, static_argnums=(1,))
def field_carry(arr, own: int):
    """Next tile's entry from this region's fetch array: the exit
    state re-based by -own (positions go local to the next tile)."""
    z = jnp.int32(0)
    return jnp.stack([
        arr[7], arr[8], arr[9], arr[10] - own, arr[11] - own, z, z, z])


@jax.jit
def field_entry_to_walker_init(t: FieldTables, entry):
    """Convert a field-machine entry state into the legacy walker's
    entering chain state (init5, fb) for the SAME region.

    The walker needs the position/type of the first event in the
    region; the field tables supply it directly: the first adoption is
    the first position whose entering hash strictly undercuts the held
    hash (reference SubSampler.cpp:374-388), the expiry fires at the
    first position >= position_min (SubSampler.cpp:391-399), and at a
    shared position adoption wins (the reference checks it first).
    Enables tile-granular fallback: a tile whose sync resolution
    overflows re-runs through the exact walker without re-running its
    predecessors."""
    P = t.h_hi.shape[0]
    hh = jax.lax.bitcast_convert_type(entry[1], _U32).reshape(())
    hl = jax.lax.bitcast_convert_type(entry[2], _U32).reshape(())
    j = jnp.arange(P, dtype=_I32)
    lt = (t.h_hi < hh) | ((t.h_hi == hh) & (t.h_lo < hl))
    valid = lt & (j <= t.last_i)
    big = jnp.int32(P)
    j_adopt = jnp.min(jnp.where(valid, j, big))
    p = entry[3]
    j_exp = jnp.where(p <= t.last_i, jnp.maximum(p, 0), big)
    npos = jnp.minimum(j_adopt, j_exp)
    ntyp = jnp.where(j_adopt <= j_exp, 0, 1).astype(_I32)
    has = npos <= t.last_i
    val_bits = jax.lax.bitcast_convert_type(entry[0], _U32).reshape(())
    sel = ((val_bits >> 31) & 1).astype(_I32)
    # cur_pos = the entry's (negative, local) last-event position: the
    # first emit's last_position is cur_pos + 1, i.e. the open
    # super-k-mer's start carried over from the previous tile
    init5 = jnp.stack([
        jnp.where(has, npos, -1).astype(_I32), ntyp, sel,
        entry[4].astype(_I32), jnp.int32(0)])
    fb = jnp.stack([
        jax.lax.bitcast_convert_type(
            val_bits & ((1 << 30) - 1), _I32).reshape(()),
        ((val_bits >> 30) & 1).astype(_I32)])
    return init5, fb


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def walker_exit_to_field_entry(t: FieldTables, scal, entry, k: int,
                               m: int, own: int, thr_hi, thr_lo):
    """Convert the walker's exit state after a fallback tile back into
    the NEXT tile's field entry (re-based by -own).

    scal: the walker's [n_ev, cur_pos, cur_typ, cur_sel, ...] final
    snapshot. The held minimizer's value/hash/position_min come from
    the field tables at the last event: an adoption at j holds the
    entering m-mer (val=cv[j], hash=h[j], p=j+W); a rescan holds the
    window election (em/eh[j], p=ep[j]+j+1 — the reference's
    position_min += i+1 quirk, SubSampler.cpp:397). With no event in
    the walk the entry passes through re-based."""
    W = k - m + 1
    P = t.h_hi.shape[0]
    cur_pos, cur_typ = scal[1], scal[2]
    no_ev = cur_pos < 0
    pc = jnp.clip(cur_pos, 0, P - 1)
    isA = cur_typ == 0
    val = jnp.where(isA, t.cv[pc], t.em[pc])
    hh = jnp.where(isA, t.h_hi[pc], t.eh_hi[pc])
    hl = jnp.where(isA, t.h_lo[pc], t.eh_lo[pc])
    p_new = jnp.where(isA, pc + W, t.ep[pc] + pc + 1)
    thr_hi = jnp.asarray(thr_hi, _U32).reshape(())
    thr_lo = jnp.asarray(thr_lo, _U32).reshape(())
    sel = ((hh < thr_hi) | ((hh == thr_hi) & (hl <= thr_lo)))
    valb = val | (sel.astype(_U32) << 31)
    e_val = jnp.where(no_ev,
                      jax.lax.bitcast_convert_type(entry[0], _U32)
                      .reshape(()), valb)
    e_hh = jnp.where(no_ev,
                     jax.lax.bitcast_convert_type(entry[1], _U32)
                     .reshape(()), hh)
    e_hl = jnp.where(no_ev,
                     jax.lax.bitcast_convert_type(entry[2], _U32)
                     .reshape(()), hl)
    e_p = jnp.where(no_ev, entry[3], p_new) - own
    e_le = jnp.where(no_ev, entry[4], cur_pos) - own
    z = jnp.int32(0)
    return jnp.stack([
        jax.lax.bitcast_convert_type(e_val, _I32).reshape(()),
        jax.lax.bitcast_convert_type(e_hh, _I32).reshape(()),
        jax.lax.bitcast_convert_type(e_hl, _I32).reshape(()),
        e_p.astype(_I32), e_le.astype(_I32), z, z, z])


def parse_field_array(arr: np.ndarray, cap: int):
    """Host-side split into (status, compact-9-tuple, n_sel)."""
    status = int(arr[0])
    n_sel = int(arr[1])
    body = arr[_HEAD : _HEAD + 4 * cap]
    sel_pos = body[:n_sel].astype(np.int64)
    sel_last = body[cap : cap + n_sel].astype(np.int64)
    sel_val = body[2 * cap : 2 * cap + n_sel].view(np.uint32)
    sel_rev = body[3 * cap : 3 * cap + n_sel] != 0
    comp = (sel_pos, sel_last, sel_val, sel_rev, int(arr[2]),
            int(arr[3]), int(np.int64(arr[4]) & 0xFFFFFFFF),
            bool(arr[5]), bool(arr[6]))
    return status, comp, n_sel
