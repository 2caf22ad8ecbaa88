"""Fused scan+resolve v2: the whole hot path in two Mosaic kernels.

Round-5 profiling (docs/PERF.md) split the 4 ms/record engine time
roughly half/half between the scan program and the resolver, with the
resolver dominated by work OUTSIDE its Mosaic sweep: 7 XLA transposes
re-laying the 16.7M-position tables into the sweep's (column, lane)
layout, P-sized argmax/any passes extracting per-lane sync data, and
up to 5 sweep dispatches each re-fetching all 7 tables from HBM.
Separately, the XLA sync log-min chain is one of the confirmed
triggers of the session-wide H2D degradation (docs/PERF.md, r5 probe
campaign).

This module removes all of it from XLA:

* `_scan2_kernel` extends the r5 fused scan kernel (ops/scan_kernel.py)
  to ALSO compute, on the same VMEM tile: the sync flags (the 2W-
  lookback windowed min, carried across row tiles through VMEM
  scratch), the per-256-block first-sync column, and the per-row
  window-0 election scalars — and writes the 7 per-position tables
  ALREADY TRANSPOSED into the sweep layout via in-kernel 2D
  transposes (supported by Mosaic; the reshape+3D-transpose form is
  not). After this kernel no P-sized XLA op remains in the hot path.
* `_resolve_fast` replays ops/field.py's resolve logic (sweep 1 over
  block suffixes from each first sync, iterated prefix passes chained
  through predecessor exits, deferred entry emits, compact
  extraction) directly on the kernel's outputs, with prefix passes
  2..4 gated behind `lax.cond` — they only run when a syncless-block
  run actually left lanes unresolved (vanishingly rare at B=256), so
  the common case stops paying 3 extra full-table HBM sweeps.

Semantics are identical to the v1 path (reference SubSampler.cpp:
81-169 elections, 306-510 streaming loop, 359-365 window-0 entry);
`tests/test_fused.py` fuzzes byte-equality of the fetch arrays against
the v1 XLA path on CPU (interpret mode), and the golden suites cover
the pipeline end-to-end.

Layout note: the scan kernel's (64, CP) row tile transposes its two
256-column halves separately, so the physical lane order of the table
columns is h*64 + r (half-major) per 128-lane tile while the resolver
thinks in position-block order 2*r + h. The two orders are views of
the same (tiles, 64, 2)/(tiles, 2, 64) array, so `_sweep_blocks`
converts per-lane vectors with a tiny reshape+swap (`_to_lane` /
`_to_blk`) around the sweep kernel — never a gather (TPU gathers run
~1 element/cycle and measured ~2x the whole v1 resolver) — and
everything else runs in block order exactly like ops/field.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from supersampler_tpu.ops.hashing import xxh64_u32
from supersampler_tpu.ops.field import (FieldState, _sweep_pallas, _B,
                                        _MAX_PASSES, _pow2_ge,
                                        _pow2_le, _rank_to_lane)
from supersampler_tpu.ops.minimizer import unpack_2bit

_I32 = jnp.int32
_U32 = jnp.uint32
_FF = 0xFFFFFFFF
_RB = 64                 # rows per scan grid step
_C = 512                 # columns per row (2 position blocks)


def _cdiv(a, b):
    return -(-a // b)


# ----------------------------------------------------------------------
# scan kernel v2
# ----------------------------------------------------------------------

def _scan2_kernel(c2_ref, thi, tlo, ocv, opem, oep, oehh, oehl, oaux,
                  carry, *, k: int, m: int, CP: int, rpr: int,
                  n_live: int):
    """One (64, CP) row tile -> transposed tables + sync/fs/init aux.

    thi/tlo: (256, 128) blocks of the entering-hash tables (transposed).
    ocv/opem/oep/oehh/oehl: transposed cv and election tables (election
    arrays pre-shifted by one window, ops/field.py em_r semantics).
    oaux: (64, 128) u32 — lane 0/1 = first-sync column of the row's
    half-0/half-1 block (256 = none), lanes 4..7 = the row's window-0
    election (val|rev<<30, pos, hash hi, hash lo).
    carry: (8, CP) u32 VMEM scratch persisting across sequential grid
    steps; rows 0/1 hold the previous row tile's LAST row of entering
    hashes (hi/lo) for the sync lookback.
    """
    g = pl.program_id(0)
    W = k - m + 1
    km = k - m
    LH = 2 * W
    C = _C

    @pl.when(g < n_live)
    def _():
        c2 = c2_ref[0]                       # (64, CP) u32 codes

        def sh(a, j):
            # left-shift by j columns (wrap lands in the invalid tail)
            return pltpu.roll(a, CP - j, 1) if j else a

        # rolling m-mers, canonical form, hashes (v1 kernel verbatim)
        fwd = jnp.zeros_like(c2)
        rc = jnp.zeros_like(c2)
        for j in range(m):
            c = sh(c2, j)
            fwd = (fwd << 2) | c
            rc = rc | ((c ^ 2) << (2 * j))
        rev = (rc < fwd).astype(_U32)
        canon = jnp.where(rev != 0, rc, fwd)
        hh = xxh64_u32(canon)
        hhi, hlo = hh.hi, hh.lo

        # exact election fold (regular_minimizer_pos, right-to-left;
        # reference SubSampler.cpp:81-169)
        mini = sh(canon, km)
        isr = sh(rev, km)
        pos = jnp.where(isr != 0, 0, km).astype(_I32)
        hmh, hml = sh(hhi, km), sh(hlo, km)
        for i in range(1, W):
            off = km - i
            mm = sh(canon, off)
            lr = sh(rev, off)
            nhh, nhl = sh(hhi, off), sh(hlo, off)
            repl = (hmh > nhh) | ((hmh == nhh) & (hml > nhl))
            same = (mm == mini) & ~repl & (lr == isr)
            isr_b = isr != 0
            tie_take = same & ((isr_b & (pos > i))
                               | (~isr_b & (pos > off)))
            take = repl | tie_take
            newp = jnp.where(repl, off,
                             jnp.where(isr_b, i, off)).astype(_I32)
            pos = jnp.where(take, newp, pos)
            mini = jnp.where(take, mm, mini)
            isr = jnp.where(take, lr, isr)
            hmh = jnp.where(take, nhh, hmh)
            hml = jnp.where(take, nhl, hml)

        # entering hash per loop position (offset k-m+1)
        oh_hi = sh(hhi, km + 1)
        oh_lo = sh(hlo, km + 1)

        # ---- sync flags: strict 64-bit min vs the previous LH
        # entering hashes (ops/field.py _sync_from_h0, in VMEM) ----
        rowg = (jax.lax.broadcasted_iota(_I32, (_RB, CP), 0)
                + g * _RB)                       # global row index
        lane = jax.lax.broadcasted_iota(_I32, (_RB, CP), 1)
        if rpr > 0:
            fr = (rowg % rpr) == 0
            jloc = (rowg % rpr) * C + lane
        else:
            fr = rowg == 0
            jloc = rowg * C + lane

        # previous row's hashes: sublane roll + cross-tile carry
        pv_hi = pltpu.roll(oh_hi, 1, 0)
        pv_lo = pltpu.roll(oh_lo, 1, 0)
        row0 = (jax.lax.broadcasted_iota(_I32, (_RB, CP), 0) == 0)
        pv_hi = jnp.where(row0,
                          jnp.broadcast_to(carry[0:1, :], (_RB, CP)),
                          pv_hi)
        pv_lo = jnp.where(row0,
                          jnp.broadcast_to(carry[1:2, :], (_RB, CP)),
                          pv_lo)
        # carry for the NEXT tile: this tile's last row (read before
        # overwrite is unnecessary — we already consumed carry)
        carry[0:1, :] = oh_hi[_RB - 1 : _RB, :]
        carry[1:2, :] = oh_lo[_RB - 1 : _RB, :]

        # halo'd frame: hal[x] = x < LH ? prev_row[C-LH+x] : oh[x-LH]
        cur_hi = pltpu.roll(oh_hi, LH, 1)
        cur_lo = pltpu.roll(oh_lo, LH, 1)
        pt_hi = pltpu.roll(pv_hi, (CP + LH - C) % CP, 1)
        pt_lo = pltpu.roll(pv_lo, (CP + LH - C) % CP, 1)
        in_lh = lane < LH
        ffv = jnp.full((_RB, CP), _FF, _U32)
        hal_hi = jnp.where(in_lh, jnp.where(fr, ffv, pt_hi), cur_hi)
        hal_lo = jnp.where(in_lh, jnp.where(fr, ffv, pt_lo), cur_lo)

        # log-step trailing-window min M_t[x] = min hal[x-t+1..x]
        t = _pow2_le(LH)
        m_hi, m_lo = hal_hi, hal_lo
        step = 1
        while step < t:
            s_hi = pltpu.roll(m_hi, step, 1)
            s_lo = pltpu.roll(m_lo, step, 1)
            lt = (s_hi < m_hi) | ((s_hi == m_hi) & (s_lo < m_lo))
            keep = lane >= step
            m_hi = jnp.where(keep & lt, s_hi, m_hi)
            m_lo = jnp.where(keep & lt, s_lo, m_lo)
            step *= 2
        w1_hi, w1_lo = sh(m_hi, LH - 1), sh(m_lo, LH - 1)
        w2_hi, w2_lo = sh(m_hi, t - 1), sh(m_lo, t - 1)
        lt12 = (w2_hi < w1_hi) | ((w2_hi == w1_hi) & (w2_lo < w1_lo))
        mn_hi = jnp.where(lt12, w2_hi, w1_hi)
        mn_lo = jnp.where(lt12, w2_lo, w1_lo)
        sync = ((oh_hi < mn_hi)
                | ((oh_hi == mn_hi) & (oh_lo < mn_lo)))
        sync = sync & (lane < C) & (jloc >= LH)

        # per-(row, half) first-sync column via a forward roll-min tree
        v = jnp.where(sync, (lane & (_B - 1)), _B)
        step = 1
        while step < _B:
            v = jnp.minimum(v, pltpu.roll(v, CP - step, 1))
            step *= 2

        # ---- aux assembly ----
        lane128 = jax.lax.broadcasted_iota(_I32, (_RB, 128), 1)
        b = lambda a: jnp.broadcast_to(a, (_RB, 128))
        fs0 = b(v[:, 0:1]).astype(_U32)
        fs1 = b(v[:, _B : _B + 1]).astype(_U32)
        em0 = b((mini | (isr << 30))[:, 0:1])
        ep0 = b(pos[:, 0:1]).astype(_U32)
        eh0 = b(hmh[:, 0:1])
        el0 = b(hml[:, 0:1])
        aux = jnp.where(lane128 == 0, fs0,
              jnp.where(lane128 == 1, fs1,
              jnp.where(lane128 == 4, em0,
              jnp.where(lane128 == 5, ep0,
              jnp.where(lane128 == 6, eh0,
              jnp.where(lane128 == 7, el0,
                        jnp.zeros((_RB, 128), _U32)))))))
        oaux[...] = aux

        # ---- transposed table outputs (two 2D transposes each, into
        # the (n_tiles, B, 128) block layout the sweep reads
        # directly) ----
        def wr(ref, a):
            ref[0, :, 0:64] = a[:, 0:_B].T
            ref[0, :, 64:128] = a[:, _B:C].T

        wr(thi, oh_hi)
        wr(tlo, oh_lo)
        wr(ocv, sh(canon, km + 1) | (sh(rev, km + 1) << 30))
        wr(opem, sh(mini | (isr << 30), 1))
        wr(oep, sh(pos, 1))
        wr(oehh, sh(hmh, 1))
        wr(oehl, sh(hml, 1))


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def _scan2(c2, k: int, m: int, CP: int, rpr: int, n_live: int,
           interpret: bool = False):
    """c2: (R8, CP) u32 halo'd codes, R8 a multiple of 64.

    Returns (tT, aux): tT the 7 sweep-layout tables, each
    (2*R8//128, 256, 128) — _transpose_tables order (h_hi, h_lo, cv,
    em, ep(i32), eh_hi, eh_lo), physical lane l = 128*tile + 64h + r
    — and aux (R8, 128) u32 per-row sync/init data. The sweep kernel
    (_sweep_pallas tab3d mode) reads this layout directly; no XLA
    relayout touches the tables."""
    R8 = c2.shape[0]
    assert R8 % _RB == 0 and c2.shape[1] == CP
    n_t = R8 // _RB
    c2b = c2.reshape(n_t, _RB, CP)
    tspec = pl.BlockSpec((1, _B, 128), lambda gg: (gg, 0, 0))
    shp = jax.ShapeDtypeStruct((n_t, _B, 128), _U32)
    shp_i = jax.ShapeDtypeStruct((n_t, _B, 128), _I32)
    outs = pl.pallas_call(
        functools.partial(_scan2_kernel, k=k, m=m, CP=CP, rpr=rpr,
                          n_live=n_live),
        grid=(n_t,),
        in_specs=[pl.BlockSpec((1, _RB, CP), lambda gg: (gg, 0, 0))],
        out_specs=tuple([tspec] * 7
                        + [pl.BlockSpec((_RB, 128),
                                        lambda gg: (gg, 0))]),
        out_shape=(shp, shp, shp, shp, shp_i, shp, shp,
                   jax.ShapeDtypeStruct((R8, 128), _U32)),
        scratch_shapes=[pltpu.VMEM((8, CP), _U32)],
        interpret=interpret,
    )(c2b)
    return outs[:7], outs[7]


# ----------------------------------------------------------------------
# lane permutations (physical transpose order <-> position-block order)
#
# Within each 128-lane tile the scan kernel's half-wise transposes
# store block 2r+h at physical column 64h+r, so the two orders are
# views of the same (n_tiles, 64, 2)/(n_tiles, 2, 64) array — the
# conversion is a tiny reshape+swap, never a gather (TPU gathers run
# ~1 element/cycle; 40 of them per resolve measured ~2x the whole v1
# resolver).
# ----------------------------------------------------------------------

def _to_lane(a):
    """Block-order -> physical lane order along the last axis."""
    n = a.shape[-1]
    lead = a.shape[:-1]
    return (a.reshape(lead + (n // 128, 64, 2))
            .swapaxes(-1, -2).reshape(lead + (n,)))


def _to_blk(a):
    """Physical lane order -> block order along the last axis."""
    n = a.shape[-1]
    lead = a.shape[:-1]
    return (a.reshape(lead + (n // 128, 2, 64))
            .swapaxes(-1, -2).reshape(lead + (n,)))


def _sweep_blocks(tT, j0, lastiv, W, n_blk, state0, start, end,
                  active, force_entry, thr_hi, thr_lo, capl,
                  interpret):
    """_sweep_pallas with block-order per-lane arrays: relayouts
    inputs into the tables' physical lane order and outputs back."""
    st0 = FieldState(*(_to_lane(x) for x in state0))
    st, cnt, lp, lv, ll = _sweep_pallas(
        tT, _to_lane(j0), _to_lane(lastiv), W, n_blk, st0,
        _to_lane(start), _to_lane(end), _to_lane(active), force_entry,
        thr_hi, thr_lo, capl, interpret=interpret)
    return (FieldState(*(_to_blk(x) for x in st)), _to_blk(cnt),
            _to_blk(lp), _to_blk(lv), _to_blk(ll))


# ----------------------------------------------------------------------
# fast resolver (block-order logic identical to ops/field.py)
# ----------------------------------------------------------------------

def _resolve_core(tT, fs_blk, lastiv, j0_blk, live, ent, is_head,
                  W: int, n_blk: int, n_real: int, sel_cap: int,
                  thr_hi, thr_lo, interpret: bool):
    """Shared sweep orchestration. ent: per-lane entry-state tuple
    (val, hh, hl, p, le) in block order (record heads' window-0
    elections, broadcast to their lanes). is_head: (n_blk,) bool —
    lanes whose predecessor is the record entry, not the previous
    lane. Returns everything the fetch-array assemblers need."""
    B = _B
    has_sync = fs_blk < B
    fs = jnp.where(has_sync, fs_blk, B).astype(_I32)

    thr_hi = jnp.asarray(thr_hi, _U32).reshape(())
    thr_lo = jnp.asarray(thr_lo, _U32).reshape(())
    zst = FieldState(
        val=jnp.zeros((n_blk,), _U32),
        h_hi=jnp.full((n_blk,), _FF, _U32),
        h_lo=jnp.full((n_blk,), _FF, _U32),
        p=jnp.zeros((n_blk,), _I32),
        last_ev=jnp.full((n_blk,), -1, _I32),
        n_ev=jnp.zeros((n_blk,), _I32))

    capl = min(128, max(16, _pow2_ge(
        -((-8 * sel_cap) // max(n_real, 1)))))

    # ---- sweep 1: suffixes from each block's first sync ----
    st1, c_suf, suf_p, suf_v, suf_l = _sweep_blocks(
        tT, j0_blk, lastiv, W, n_blk, zst, fs,
        jnp.full((n_blk,), B, _I32), has_sync, True, thr_hi, thr_lo,
        capl, interpret)

    exit_known0 = has_sync | ~live
    ev_val, ev_hh, ev_hl, ev_p, ev_le = ent

    def pred(a, headv):
        sh_ = jnp.concatenate([a[:1], a[:-1]])
        return jnp.where(is_head, headv, sh_)

    true_head = jnp.ones((n_blk,), bool)

    def one_pass(state):
        (exit_val, exit_hh, exit_hl, exit_p, exit_le, exit_known,
         prefix_done, prefix_ev, pre_val, pre_le, c_pre, pre_p,
         pre_v, pre_l) = state
        pred_known = pred(exit_known, true_head)
        can = ~prefix_done & pred_known
        st0 = FieldState(
            val=pred(exit_val, ev_val),
            h_hi=pred(exit_hh, ev_hh),
            h_lo=pred(exit_hl, ev_hl),
            p=pred(exit_p, ev_p),
            last_ev=pred(exit_le, ev_le),
            n_ev=jnp.zeros((n_blk,), _I32))
        st2, c2, p2, v2, l2 = _sweep_blocks(
            tT, j0_blk, lastiv, W, n_blk, st0,
            jnp.zeros((n_blk,), _I32), fs, can, False, thr_hi,
            thr_lo, capl, interpret)
        canw = can[None, :]
        pre_p = jnp.where(canw, p2, pre_p)
        pre_v = jnp.where(canw, v2, pre_v)
        pre_l = jnp.where(canw, l2, pre_l)
        c_pre = jnp.where(can, c2, c_pre)
        prefix_ev = jnp.where(can, st2.n_ev, prefix_ev)
        pre_val = jnp.where(can, st2.val, pre_val)
        pre_le = jnp.where(can, st2.last_ev, pre_le)
        newly = can & ~has_sync
        exit_val = jnp.where(newly, st2.val, exit_val)
        exit_hh = jnp.where(newly, st2.h_hi, exit_hh)
        exit_hl = jnp.where(newly, st2.h_lo, exit_hl)
        exit_p = jnp.where(newly, st2.p, exit_p)
        exit_le = jnp.where(newly, st2.last_ev, exit_le)
        exit_known = exit_known | newly
        prefix_done = prefix_done | can
        return (exit_val, exit_hh, exit_hl, exit_p, exit_le,
                exit_known, prefix_done, prefix_ev, pre_val, pre_le,
                c_pre, pre_p, pre_v, pre_l)

    state = (st1.val, st1.h_hi, st1.h_lo, st1.p, st1.last_ev,
             exit_known0, ~live, jnp.zeros((n_blk,), _I32),
             jnp.zeros((n_blk,), _U32), jnp.full((n_blk,), -1, _I32),
             jnp.zeros((n_blk,), _I32),
             jnp.zeros((capl, n_blk), _I32),
             jnp.zeros((capl, n_blk), _U32),
             jnp.zeros((capl, n_blk), _I32))
    state = one_pass(state)
    # passes 2..: only when a syncless-block RUN left lanes pending —
    # rare enough that the common case must not pay the table re-reads
    for _ in range(_MAX_PASSES - 1):
        need = jnp.any(~state[6] & pred(state[5], true_head))
        state = jax.lax.cond(need, one_pass, lambda s: s, state)
    (exit_val, exit_hh, exit_hl, exit_p, exit_le, exit_known,
     prefix_done, prefix_ev, pre_val, pre_le, c_pre, pre_p, pre_v,
     pre_l) = state

    status_lane = ((~prefix_done) | (c_suf > capl)
                   | (c_pre > capl)).astype(_I32)

    # deferred entry emits: each sync event closes ITS OWN prefix's
    # payload (ops/field.py resolve_field)
    e_sel = has_sync & ((pre_val >> 31) == 1)
    e_pos = j0_blk + fs
    e_val = pre_val
    e_last = pre_le + 1

    counts = c_pre + e_sel.astype(_I32) + c_suf
    n_sel = jnp.sum(counts).astype(_I32)

    # compact extraction (global ranks follow block order == position
    # order; every array here is sel_cap- or n_blk-sized)
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
            jnp.where(is_ent, e_a[lane_c],
                      suf_a.reshape(-1)[suf_idx]))

    ok = iidx < n_sel
    pos = jnp.where(ok, pick(pre_p, e_pos, suf_p), -1)
    last = jnp.where(ok, pick(pre_l, e_last, suf_l), -1)
    valw = jnp.where(ok, pick(pre_v, e_val, suf_v), 0)

    n_ev_lane = st1.n_ev + prefix_ev
    return (status_lane, counts, n_sel, pos, last, valw, n_ev_lane,
            exit_val, exit_hh, exit_hl, exit_p, exit_le)


def _aux_decode(aux, n_blk: int):
    """fs per block (position order: aux[:, :2] row-major flatten IS
    block order) padded/truncated to n_blk."""
    fs = aux[:, :2].reshape(-1).astype(_I32)
    if fs.shape[0] < n_blk:
        fs = jnp.concatenate(
            [fs, jnp.full((n_blk - fs.shape[0],), _B, _I32)])
    return fs[:n_blk]


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def fused_single(slab, k: int, m: int, P: int, sel_cap: int,
                 interpret: bool, length, thr_hi, thr_lo):
    """scan_resolve_single through the v2 kernels: same fetch-array
    contract as ops/field.py resolve_field (single region, window-0
    entry; reference SubSampler.cpp:306-510).

    slab: the 128-position-halo'd packed bytes ((128 + P)/4,); the
    halo is sliced off on device like scan_resolve_single."""
    W = k - m + 1
    halo = k + W
    C = _C
    assert P % C == 0
    R = P // C
    R8 = _cdiv(R, 1024) * 1024
    CP = _cdiv(C + halo, 128) * 128
    n_live = _cdiv(R, _RB)

    codes = unpack_2bit(slab[32:], P)
    base = codes.reshape(R, C)
    c2 = jnp.concatenate(
        [base, jnp.roll(base, -1, axis=0)[:, :halo]],
        axis=1).astype(_U32)
    if CP > C + halo:
        c2 = jnp.concatenate(
            [c2, jnp.zeros((R, CP - (C + halo)), _U32)], axis=1)
    if R8 != R:
        c2 = jnp.concatenate(
            [c2, jnp.zeros((R8 - R, CP), _U32)], axis=0)
    tT, aux = _scan2(c2, k, m, CP, 0, n_live, interpret)

    n_blk = 2 * R8
    n_real = P // _B
    fs_blk = _aux_decode(aux, n_blk)
    blk = jnp.arange(n_blk, dtype=_I32)
    j0_blk = blk * _B
    last_i = (length - k - 1).astype(_I32)
    lastiv = jnp.broadcast_to(last_i, (n_blk,))
    live = (j0_blk <= last_i) & (blk < n_real)
    # boundary fix-up: a first sync past last_i is no sync at all
    has = (fs_blk < _B) & (j0_blk + fs_blk <= last_i)
    fs_blk = jnp.where(has, fs_blk, _B)

    # entry = the window-0 election (reference SubSampler.cpp:359-365)
    thr_hi_ = jnp.asarray(thr_hi, _U32).reshape(())
    thr_lo_ = jnp.asarray(thr_lo, _U32).reshape(())
    i_em = aux[0, 4]
    i_ep = jax.lax.bitcast_convert_type(aux[0, 5], _I32).reshape(())
    i_hh = aux[0, 6]
    i_hl = aux[0, 7]
    sel0 = ((i_hh < thr_hi_) | ((i_hh == thr_hi_) & (i_hl <= thr_lo_)))
    ent_val = i_em | (sel0.astype(_U32) << 31)
    ent = (jnp.broadcast_to(ent_val, (n_blk,)),
           jnp.broadcast_to(i_hh, (n_blk,)),
           jnp.broadcast_to(i_hl, (n_blk,)),
           jnp.broadcast_to(i_ep, (n_blk,)),
           jnp.full((n_blk,), -1, _I32))
    is_head = blk == 0

    (status_lane, counts, n_sel, pos, last, valw, n_ev_lane,
     exit_val, exit_hh, exit_hl, exit_p, exit_le) = _resolve_core(
        tT, fs_blk, lastiv, j0_blk, live, ent, is_head, W, n_blk,
        n_real, sel_cap, thr_hi, thr_lo, interpret)

    status = jnp.sum(status_lane).astype(_I32)
    n_ev = jnp.sum(n_ev_lane).astype(_I32)
    val = valw & ((1 << 30) - 1)
    rev = (valw >> 30) & 1

    # tail/carry: the LAST LIVE block's exit; entry passes through
    # when nothing is live (ops/field.py resolve_field tail logic)
    lane_q = jnp.clip(last_i // _B, 0, n_blk - 1)
    no_live = last_i < 0
    x_val = jnp.where(no_live, ent_val, exit_val[lane_q])
    x_hh = jnp.where(no_live, i_hh, exit_hh[lane_q])
    x_hl = jnp.where(no_live, i_hl, exit_hl[lane_q])
    x_p = jnp.where(no_live, i_ep, exit_p[lane_q])
    x_le = jnp.where(no_live, jnp.int32(-1), exit_le[lane_q])
    tail_val = x_val & ((1 << 30) - 1)
    tail_rev = (x_val >> 30) & 1
    tail_sel = (x_val >> 31) & 1

    bc = lambda a: jax.lax.bitcast_convert_type(a, _I32).reshape(())
    head = jnp.stack([
        status, n_sel, n_ev, x_le,
        bc(tail_val), tail_rev.astype(_I32), tail_sel.astype(_I32),
        bc(x_val), bc(x_hh), bc(x_hl), x_p, x_le])
    return jnp.concatenate([
        head, pos, last,
        jax.lax.bitcast_convert_type(val, _I32), rev.astype(_I32)])


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def fused_batch(packed, k: int, m: int, P_rec: int, sel_cap: int,
                interpret: bool, lengths, thr_hi, thr_lo):
    """scan_resolve_batch through the v2 kernels: same fetch-array
    contract as ops/field.py resolve_field_batched (record-major
    compact lists + per-record heads)."""
    W = k - m + 1
    halo = k + W
    C = _C
    assert P_rec % C == 0
    B_n = packed.shape[0]
    rpr = P_rec // C
    bpr = P_rec // _B
    R = B_n * rpr
    R8 = _cdiv(R, 1024) * 1024
    CP = _cdiv(C + halo, 128) * 128
    n_live = _cdiv(R, _RB)

    codes = unpack_2bit(packed.reshape(-1), B_n * P_rec)
    base = codes.reshape(R, C)
    c2 = jnp.concatenate(
        [base, jnp.roll(base, -1, axis=0)[:, :halo]],
        axis=1).astype(_U32)
    if CP > C + halo:
        c2 = jnp.concatenate(
            [c2, jnp.zeros((R, CP - (C + halo)), _U32)], axis=1)
    if R8 != R:
        c2 = jnp.concatenate(
            [c2, jnp.zeros((R8 - R, CP), _U32)], axis=0)
    tT, aux = _scan2(c2, k, m, CP, rpr, n_live, interpret)

    n_blk = 2 * R8
    n_real = B_n * bpr
    fs_blk = _aux_decode(aux, n_blk)
    blk = jnp.arange(n_blk, dtype=_I32)
    real = blk < n_real
    blk_rec = jnp.clip(blk // bpr, 0, B_n - 1)
    j0_blk = (blk % bpr) * _B                  # record-local frames
    last_i = (lengths - k - 1).astype(_I32)    # (B_n,)
    lastiv = jnp.where(real, last_i[blk_rec], -1)
    live = (j0_blk <= lastiv) & real
    has = (fs_blk < _B) & (j0_blk + fs_blk <= lastiv)
    fs_blk = jnp.where(has, fs_blk, _B)

    # per-record entries: window-0 elections at record-head rows
    thr_hi_ = jnp.asarray(thr_hi, _U32).reshape(())
    thr_lo_ = jnp.asarray(thr_lo, _U32).reshape(())
    head_rows = jnp.arange(B_n, dtype=_I32) * rpr
    i_em = aux[head_rows, 4]
    i_ep = jax.lax.bitcast_convert_type(aux[head_rows, 5], _I32)
    i_hh = aux[head_rows, 6]
    i_hl = aux[head_rows, 7]
    sel0 = ((i_hh < thr_hi_) | ((i_hh == thr_hi_) & (i_hl <= thr_lo_)))
    ent_val_r = i_em | (sel0.astype(_U32) << 31)       # (B_n,)
    ent = (ent_val_r[blk_rec], i_hh[blk_rec], i_hl[blk_rec],
           i_ep[blk_rec], jnp.full((n_blk,), -1, _I32))
    is_head = (blk % bpr) == 0

    (status_lane, counts, n_sel, pos, last, valw, n_ev_lane,
     exit_val, exit_hh, exit_hl, exit_p, exit_le) = _resolve_core(
        tT, fs_blk, lastiv, j0_blk, live, ent, is_head, W, n_blk,
        n_real, sel_cap, thr_hi, thr_lo, interpret)

    seg = jnp.where(real, blk_rec, B_n)        # pad lanes -> dropped
    status_rec = jax.ops.segment_sum(status_lane, seg,
                                     num_segments=B_n + 1)[:B_n]
    n_sel_rec = jax.ops.segment_sum(counts, seg,
                                    num_segments=B_n + 1)[:B_n]
    n_ev_rec = jax.ops.segment_sum(n_ev_lane, seg,
                                   num_segments=B_n + 1)[:B_n]

    val = valw & ((1 << 30) - 1)
    rev = (valw >> 30) & 1

    # per-record tails: the LAST LIVE lane's exit
    lane_q = (jnp.arange(B_n, dtype=_I32) * bpr
              + jnp.clip(last_i // _B, 0, bpr - 1))
    no_live = last_i < 0
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
        jnp.zeros((B_n,), _I32)], axis=1)
    g = jnp.stack([jnp.sum(status_rec).astype(_I32), n_sel])
    return jnp.concatenate([
        g, heads.reshape(-1), pos, last,
        jax.lax.bitcast_convert_type(val, _I32), rev.astype(_I32)])
