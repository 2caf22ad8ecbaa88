"""Pallas TPU event-chain walker.

The minimizer scan (ops/minimizer.py) leaves per-position successor
tables in HBM; the super-k-mer boundary chain is their transitive walk
from the initial election (reference SubSampler.cpp:367-454).  Pointer
doubling extracts that chain in O(log n) rounds but each round is a full
random gather over every position — ~44 x 8M gathered elements for a
4 Mbp tile, seconds of device time at XLA's TPU gather throughput.

The chain itself is only ~n/10 dependent steps and every step looks at
most k-m+1 positions ahead, so this module walks it *serially* on the
TPU scalar core instead: successor entries are packed to one int32 per
position, streamed block-by-block into SMEM by the Pallas pipeline, and
a `while_loop` chases the chain within each block, emitting the
FHS-selected boundaries (the only data the host ever needs) into
per-block tiles.  ~400k scalar steps take milliseconds — two orders of
magnitude faster than the doubling, with no O(n log n) gather traffic.

Packed word layout (bit positions), per loop position j — the two
node types occupy symmetric 16-bit halves so the walker decodes with
ONE variable shift (h = w >> (typ*16)) instead of per-field selects:
  [0:6]   delta_a   next-event distance from the A(doption) node (0 = none)
  [6]     typ_a     next event type from the A node (0=A, 1=R(escan))
  [7]     sel_a     FHS-selected bit of the A node's payload
  [16:22] delta_r   same three fields for the R node
  [22]    typ_r
  [23]    sel_r
(k-m+1 <= 61 for k <= 63, so deltas fit 6 bits.)

Mosaic requires (8, 128)-aligned windows, so blocks are shaped
(8, _COLS) int32 = _BP positions; per-block emit counts land in an
(8, 128) window revisited for 8 consecutive grid steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from supersampler_tpu.ops.minimizer import ScanTables

_I32 = jnp.int32
_COLS = 256
_COLS_LOG2 = 8
_ROWS = 8
_BP = _ROWS * _COLS   # positions per grid step


def pack_succ(t: ScanTables, n_pad: int) -> jnp.ndarray:
    """Pack both successor tables + sel bits into one int32 per position,
    zero-padded (delta 0 = chain ends) or truncated to n_pad. Truncation
    is the tiled path: positions >= n_pad belong to the next tile's
    tables; successor targets may still point past n_pad (the carry)."""
    n = t.nxt_pos_a.shape[0]
    j = jnp.arange(n, dtype=_I32)
    da = jnp.where(t.nxt_pos_a >= 0, t.nxt_pos_a - j, 0)
    dr = jnp.where(t.nxt_pos_r >= 0, t.nxt_pos_r - j, 0)
    ta = jnp.where(t.nxt_adopt_a, 0, 1)
    tr = jnp.where(t.nxt_adopt_r, 0, 1)
    w = (da | (ta << 6) | (t.sel_a.astype(_I32) << 7)
         | (dr << 16) | (tr << 22) | (t.sel_r.astype(_I32) << 23))
    if n_pad > n:
        return jnp.concatenate([w, jnp.zeros((n_pad - n,), _I32)])
    return w[:n_pad]


def _walk_kernel(init_ref, packed_ref, ei_ref, el_ref, es_ref, cnt_ref,
                 scal_ref, st):
    """One grid step: chase the chain through this block of positions.

    init_ref (SMEM, 5 int32): the entering chain state — for the first
    tile of a sequence [init_nxt_pos, init_nxt_typ, init_sel, -1, 0]
    (virtual initial event); for subsequent tiles the previous tile's
    carry re-based to this tile's local coordinates (cur_pos negative =
    current super-k-mer started in an earlier tile; its payload is the
    fallback triple handled at compaction).

    st (SMEM scratch, persists across sequential grid steps):
      [0] cur_pos  [1] cur_typ  [2] cur_sel  [3] nxt_pos  [4] nxt_typ
      [5] n_ev
    """
    b = pl.program_id(0)
    block_start = b * _BP
    block_end = block_start + _BP

    @pl.when(b == 0)
    def _():
        st[0] = init_ref[3]     # current event position (<0 = virtual)
        st[1] = init_ref[4]     # current event type
        st[2] = init_ref[2]     # current payload's sel bit
        st[3] = init_ref[0]     # next event position (-1 = none)
        st[4] = init_ref[1]     # next event type
        st[5] = 0

    # chain state rides in loop-carry registers; SMEM only at block edges
    def cond(c):
        return (c[3] >= 0) & (c[3] < block_end)

    def body(c):
        cur_pos, cur_typ, cur_sel, npos, ntyp, n_ev, cnt = c

        # the transition into event (npos) closes a super-k-mer carrying
        # the *current* payload (SubSampler.cpp:401-426)
        @pl.when(cur_sel != 0)
        def _():
            r = cnt >> _COLS_LOG2
            cc = cnt & (_COLS - 1)
            ei_ref[r, cc] = npos
            el_ref[r, cc] = cur_pos + 1
            es_ref[r, cc] = jnp.where(cur_pos < 0, -1,
                                      2 * cur_pos + cur_typ)

        local = npos - block_start
        w = packed_ref[local >> _COLS_LOG2, local & (_COLS - 1)]
        h = w >> (ntyp << 4)     # one shift selects the node's half
        delta = h & 63
        return (npos, ntyp, (h >> 7) & 1,
                jnp.where(delta > 0, npos + delta, -1), (h >> 6) & 1,
                n_ev + 1, cnt + (cur_sel != 0).astype(_I32))

    init = (st[0], st[1], st[2], st[3], st[4], st[5], jnp.int32(0))
    (cur_pos, cur_typ, cur_sel, npos, ntyp, n_ev,
     cnt) = jax.lax.while_loop(cond, body, init)
    st[0] = cur_pos
    st[1] = cur_typ
    st[2] = cur_sel
    st[3] = npos
    st[4] = ntyp
    st[5] = n_ev
    cnt_ref[jax.lax.rem(b, 8), 0] = cnt
    # running final-state snapshot; the last grid step's write wins
    scal_ref[0, 0] = n_ev     # n_ev in this walk
    scal_ref[0, 1] = cur_pos  # last event position (<0 if none here)
    scal_ref[0, 2] = cur_typ  # last event type
    scal_ref[0, 3] = cur_sel  # tail payload sel
    scal_ref[0, 4] = npos     # next event beyond this walk (tile carry)
    scal_ref[0, 5] = ntyp


def make_init5(init_nxt_pos, init_nxt_typ, init_sel,
               cur_pos=-1, cur_typ=0) -> jnp.ndarray:
    """Entering chain state for a walk (see _walk_kernel)."""
    return jnp.stack([
        jnp.asarray(init_nxt_pos, _I32).reshape(()),
        jnp.asarray(init_nxt_typ, _I32).reshape(()),
        jnp.asarray(init_sel, _I32).reshape(()),
        jnp.asarray(cur_pos, _I32).reshape(()),
        jnp.asarray(cur_typ, _I32).reshape(()),
    ])


def walk_pallas(packed: jnp.ndarray, init5: jnp.ndarray,
                interpret: bool | None = None):
    """Run the chain walk. packed: int32[n_pad], n_pad % _BP == 0.

    Returns emit tiles (n_blocks, _ROWS, _COLS) int32 for (boundary
    position, last_position, source state) — rows beyond cnt[b] are
    garbage — plus cnt (n_blocks,) int32 and scal int32
    [n_ev, last_pos, last_typ, tail_sel, nxt_pos, nxt_typ].
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_pad = packed.shape[0]
    assert n_pad % _BP == 0, (n_pad, _BP)
    n_blocks = n_pad // _BP
    cnt_rows = ((n_blocks + 7) // 8) * 8

    init = init5

    out_shapes = (
        jax.ShapeDtypeStruct((n_blocks * _ROWS, _COLS), _I32),  # emit_i
        jax.ShapeDtypeStruct((n_blocks * _ROWS, _COLS), _I32),  # emit_last
        jax.ShapeDtypeStruct((n_blocks * _ROWS, _COLS), _I32),  # emit_src
        jax.ShapeDtypeStruct((cnt_rows, 128), _I32),            # cnt
        jax.ShapeDtypeStruct((8, 128), _I32),                   # scalars
    )
    blk = lambda b: (b, 0)
    out_specs = (
        pl.BlockSpec((_ROWS, _COLS), blk, memory_space=pltpu.SMEM),
        pl.BlockSpec((_ROWS, _COLS), blk, memory_space=pltpu.SMEM),
        pl.BlockSpec((_ROWS, _COLS), blk, memory_space=pltpu.SMEM),
        pl.BlockSpec((8, 128), lambda b: (b // 8, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((8, 128), lambda b: (0, 0), memory_space=pltpu.SMEM),
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                  # init
        pl.BlockSpec((_ROWS, _COLS), blk, memory_space=pltpu.SMEM),
    ]
    ei, el, es, cnt, scal = pl.pallas_call(
        _walk_kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.SMEM((8,), _I32)],
        interpret=interpret,
    )(init, packed.reshape(n_blocks * _ROWS, _COLS))
    shape3 = (n_blocks, _ROWS * _COLS)
    return (ei.reshape(shape3), el.reshape(shape3), es.reshape(shape3),
            cnt.reshape(-1)[: n_blocks * 128 : 128], scal[0, :6])


def walk_xla(packed: jnp.ndarray, init5: jnp.ndarray):
    """Serial chain walk as a single lax.while_loop — the non-TPU
    fallback (XLA CPU runs the loop at native speed; Pallas interpret
    mode costs a Python dispatch per step). Identical emit semantics to
    walk_pallas, with everything in one block."""
    n_pad = packed.shape[0]
    ei0 = jnp.full((n_pad,), -1, _I32)

    def cond(c):
        return (c[3] >= 0) & (c[3] < n_pad)

    def body(c):
        cur_pos, cur_typ, cur_sel, npos, ntyp, n_ev, cnt, ei, el, es = c
        emit = cur_sel != 0
        src = jnp.where(cur_pos < 0, -1, 2 * cur_pos + cur_typ)
        # O(1) conditional store: keep the old value when not emitting
        ei = ei.at[cnt].set(jnp.where(emit, npos, ei[cnt]))
        el = el.at[cnt].set(jnp.where(emit, cur_pos + 1, el[cnt]))
        es = es.at[cnt].set(jnp.where(emit, src, es[cnt]))
        w = packed[npos]
        h = w >> (ntyp << 4)
        delta = h & 63
        return (npos, ntyp, (h >> 7) & 1,
                jnp.where(delta > 0, npos + delta, -1), (h >> 6) & 1,
                n_ev + 1, cnt + emit.astype(_I32), ei, el, es)

    init = (init5[3], init5[4], init5[2], init5[0], init5[1],
            jnp.int32(0), jnp.int32(0), ei0, ei0, ei0)
    (cur_pos, cur_typ, cur_sel, npos, ntyp, n_ev, cnt, ei, el,
     es) = jax.lax.while_loop(cond, body, init)
    scal = jnp.stack([n_ev, cur_pos, cur_typ, cur_sel, npos, ntyp])
    return (ei.reshape(1, n_pad), el.reshape(1, n_pad),
            es.reshape(1, n_pad), cnt.reshape(1), scal)


def _walk_from_tables(t: ScanTables, init5, n_pad: int,
                      interpret: bool | None):
    packed = pack_succ(t, n_pad)
    if jax.default_backend() == "tpu":
        ei, el, es, cnt, scal = walk_pallas(packed, init5,
                                            interpret=interpret)
    else:
        ei, el, es, cnt, scal = walk_xla(packed, init5)
    n_sel = jnp.sum(cnt).astype(_I32)
    return ei, el, es, cnt, scal, n_sel


def pack_compact_outs(outs, scal):
    """Bundle _compact_emits outputs into one int32 fetch array:
    [n_sel, n_ev, last_pos, tail_val, tail_rev, tail_sel, nxt_pos,
     nxt_typ, pos[cap], last[cap], val[cap], rev[cap]].

    The host link has ~23 ms latency per fetch regardless of size, so
    everything the host needs per walk rides one array."""
    (pos, last, val, rev, n_sel, n_ev, last_pos, tail_val, tail_rev,
     tail_sel) = outs
    head = jnp.stack([
        n_sel.astype(_I32), n_ev.astype(_I32), last_pos.astype(_I32),
        jax.lax.bitcast_convert_type(tail_val, _I32).reshape(()),
        tail_rev.astype(_I32), tail_sel.astype(_I32),
        scal[4], scal[5],
    ])
    return jnp.concatenate([
        head, pos, last, jax.lax.bitcast_convert_type(val, _I32),
        rev.astype(_I32)])


def _compact_packed(ei, el, es, cnt, scal, t: ScanTables, sel_cap: int,
                    fb_val, fb_rev):
    outs = _compact_emits(ei, el, es, cnt, scal, t, sel_cap,
                          fb_val, fb_rev)
    return pack_compact_outs(outs, scal)


def _compact_emits(ei, el, es, cnt, scal, t: ScanTables, sel_cap: int,
                   fb_val, fb_rev):
    """Flatten the per-block emit tiles into sel_cap slots and gather the
    minimizer payloads (value/strand) of each selected boundary + tail.

    (fb_val, fb_rev) is the payload of super-k-mers whose opening event
    precedes this walk (src < 0): the scan's initial election for the
    first tile of a sequence, the carried payload for later tiles.
    """
    n_blocks, bp = ei.shape
    cum = jnp.cumsum(cnt)
    n_sel = cum[-1]
    s = jnp.arange(sel_cap, dtype=_I32)
    blk = jnp.searchsorted(cum, s, side="right").astype(_I32)
    blk_c = jnp.clip(blk, 0, n_blocks - 1)
    prev = jnp.where(blk_c > 0, cum[jnp.clip(blk_c - 1, 0, None)], 0)
    row = jnp.clip(s - prev, 0, bp - 1)
    ok = s < n_sel
    flat_idx = blk_c * bp + row
    pos = jnp.where(ok, ei.reshape(-1)[flat_idx], -1)
    last = jnp.where(ok, el.reshape(-1)[flat_idx], -1)
    src = jnp.where(ok, es.reshape(-1)[flat_idx], -1)

    fb_val = jnp.asarray(fb_val, jnp.uint32).reshape(())
    fb_rev = jnp.asarray(fb_rev, bool).reshape(())

    def payload(src_state):
        p = jnp.clip(src_state >> 1, 0, t.val_a.shape[0] - 1)
        is_a = (src_state & 1) == 0
        val = jnp.where(src_state < 0, fb_val,
                        jnp.where(is_a, t.val_a[p], t.val_r[p]))
        rev = jnp.where(src_state < 0, fb_rev,
                        jnp.where(is_a, t.rev_a[p], t.rev_r[p]))
        return val, rev

    val, rev = payload(src)
    # tail payload: the last event's in this walk (or the fallback)
    tail_src = jnp.where(scal[1] >= 0, 2 * scal[1] + scal[2], -1)
    tail_val, tail_rev = payload(tail_src.reshape(1))
    return (pos, last, val, rev, n_sel, scal[0], scal[1],
            tail_val[0], tail_rev[0], scal[3])


_compact_jit = jax.jit(_compact_emits, static_argnums=(6,))
_compact_packed_jit = jax.jit(_compact_packed, static_argnums=(6,))


@functools.partial(jax.jit, static_argnums=(2,))
def _walk_jit(t: ScanTables, init5, n_pad: int):
    return _walk_from_tables(t, init5, n_pad, interpret=None)


@jax.jit
def _init5_from_tables(t: ScanTables):
    """Entering state for the first walk of a sequence: the scan's
    initial election (reference SubSampler.cpp:359-365)."""
    return make_init5(t.init_nxt_pos, jnp.where(t.init_nxt_adopt, 0, 1),
                      t.init_sel.astype(_I32))


@functools.partial(jax.jit, static_argnums=(3,))
def _carry_next(scal, t: ScanTables, fb, own: int):
    """Re-base a walk's final state into the NEXT tile's local
    coordinates and resolve the carried payload by value.

    fb: [val(i32 bitcast), rev] fallback payload entering this walk.
    Returns (init5_next, fb_next[2]) — all device-side; chaining tiles
    never syncs the host.
    """
    n_ev, cur_pos, cur_typ, cur_sel, npos, ntyp = (
        scal[0], scal[1], scal[2], scal[3], scal[4], scal[5])
    p = jnp.clip(cur_pos, 0, t.val_a.shape[0] - 1)
    is_a = cur_typ == 0
    val = jnp.where(cur_pos < 0,
                    jax.lax.bitcast_convert_type(fb[0], jnp.uint32),
                    jnp.where(is_a, t.val_a[p], t.val_r[p]))
    rev = jnp.where(cur_pos < 0, fb[1].astype(bool),
                    jnp.where(is_a, t.rev_a[p], t.rev_r[p]))
    init5 = make_init5(jnp.where(npos >= 0, npos - own, -1), ntyp,
                       cur_sel, cur_pos - own, cur_typ)
    fb_next = jnp.stack([
        jax.lax.bitcast_convert_type(val, _I32).reshape(()),
        rev.astype(_I32).reshape(())])
    return init5, fb_next


def _pow2_ge(n: int) -> int:
    p = 16
    while p < n:
        p *= 2
    return p


def _fb_from_tables(t: ScanTables):
    """Fallback payload for a sequence's first walk: the initial
    election's (value, strand)."""
    return jnp.stack([
        jax.lax.bitcast_convert_type(
            t.init_val.astype(jnp.uint32), _I32).reshape(()),
        t.init_rev.astype(_I32).reshape(())])


_fb_jit = jax.jit(_fb_from_tables)


class DeviceChain:
    """Device-side walk + speculative compaction for one walk region.

    Everything is dispatched asynchronously at construction; `compact`
    performs exactly ONE host fetch (the link costs ~23 ms per fetch
    independent of size), re-dispatching only if the speculative
    capacity guess was exceeded.

    For a single-tile sequence, ``DeviceChain(t)`` walks the whole
    table from the scan's initial election. For the tiled path, pass
    the entering state explicitly: ``init5``/``fb`` from the previous
    tile's ``carry`` and ``n_pad`` = the owned region size.
    """

    def __init__(self, t: ScanTables, sel_cap_guess: int = 4096,
                 init5=None, fb=None, n_pad: int | None = None,
                 pack: bool = True):
        if n_pad is None:
            n = int(t.nxt_pos_a.shape[0])
            n_pad = ((n + _BP - 1) // _BP) * _BP
        if init5 is None:
            init5 = _init5_from_tables(t)
        if fb is None:
            fb = _fb_jit(t)
        self._t = t
        self._fb = fb
        self._n_pad = n_pad
        (self.ei, self.el, self.es, self.cnt, self.scal,
         self._n_sel_dev) = _walk_jit(t, init5, n_pad)
        self._cap = _pow2_ge(sel_cap_guess)
        self._packed = None
        if pack:
            self._packed = _compact_packed_jit(
                self.ei, self.el, self.es, self.cnt, self.scal, t,
                self._cap,
                jax.lax.bitcast_convert_type(fb[0], jnp.uint32),
                fb[1] != 0)
            # begin the D2H copy as soon as the compact materializes:
            # the host link costs ~23 ms latency per fetch, which this
            # hides behind subsequent dispatches
            self.start_fetch()

    def compact_outs(self, sel_cap: int):
        """Device-resident _compact_emits outputs (dedup path input)."""
        return _compact_jit(
            self.ei, self.el, self.es, self.cnt, self.scal, self._t,
            sel_cap,
            jax.lax.bitcast_convert_type(self._fb[0], jnp.uint32),
            self._fb[1] != 0)

    def carry(self, own: int):
        """(init5, fb) for the next tile's walk (device arrays; no host
        sync)."""
        return _carry_next(self.scal, self._t, self._fb, own)

    def start_fetch(self):
        """Begin the device->host copy of the compact array without
        blocking (overlaps the link latency with later dispatches)."""
        try:
            self._packed.copy_to_host_async()
        except AttributeError:
            pass

    def compact(self):
        """Fetch (sel_pos, sel_last, sel_val, sel_rev, n_ev, last_ev_pos,
        tail_val, tail_rev, tail_sel). Positions are local to this
        walk's coordinates (the tiled caller re-bases). Also sets
        self.n_sel for adaptive capacity guessing by the caller."""
        arr = jax.device_get(self._packed)
        n_sel = int(arr[0])
        if n_sel > self._cap:
            self._cap = _pow2_ge(n_sel)
            self._packed = _compact_packed_jit(
                self.ei, self.el, self.es, self.cnt, self.scal, self._t,
                self._cap,
                jax.lax.bitcast_convert_type(self._fb[0], jnp.uint32),
                self._fb[1] != 0)
            arr = jax.device_get(self._packed)
        self.n_sel = n_sel
        return parse_compact_array(arr, self._cap)


def parse_compact_array(arr: np.ndarray, cap: int):
    """Host-side split of a pack_compact_outs array into the 9-tuple
    compact contract (see DeviceChain.compact)."""
    n_sel = int(arr[0])
    body = arr[8 : 8 + 4 * cap]
    sel_pos = body[:n_sel].astype(np.int64)
    sel_last = body[cap : cap + n_sel].astype(np.int64)
    sel_val = body[2 * cap : 2 * cap + n_sel].view(np.uint32)
    sel_rev = body[3 * cap : 3 * cap + n_sel] != 0
    return (sel_pos, sel_last, sel_val, sel_rev, int(arr[1]),
            int(arr[2]), int(np.int64(arr[3]) & 0xFFFFFFFF),
            bool(arr[4]), bool(arr[5]))
