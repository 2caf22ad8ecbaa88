"""TPU-vectorized minimizer scan: the compute core of sketch construction.

The reference's per-nucleotide streaming loop (reference
SubSampler.cpp:367-440) is an inherently sequential state machine, but
its state has bounded memory: an *event* (minimizer adoption when a new
m-mer hash beats the current one, or a rescan when the minimizer
expires, SubSampler.cpp:374-399) occurs at least every k-m+1 positions,
and the post-event state is a pure function of the event's position and
type. We therefore:

 1. compute every per-position quantity in parallel (rolling m-mer
    codes, canonical forms, XXHash64 hashes, per-window elections with
    the exact regular_minimizer_pos tie-breaking,
    SubSampler.cpp:81-169);
 2. build *successor tables*: for each position j and event type
    (adopt/rescan), the position and type of the next event — a local
    computation looking at most k-m+1 positions ahead;
 3. extract the event chain by following successors (host walker or
    jit block-walk); every event is a super-k-mer boundary
    (adoption strictly lowers the hash => changes the minimizer;
    rescans force a boundary via the reference's `dump` flag,
    SubSampler.cpp:401).

All 64-bit hash math runs as uint32 limb pairs (ops/u64.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from supersampler_tpu.ops import u64 as U
from supersampler_tpu.ops.hashing import xxh64_u32

_I32 = jnp.int32
_U32 = jnp.uint32


class ScanTables(NamedTuple):
    """Device outputs: everything the chain walker needs.

    Arrays indexed by loop position i in [0, n_loop) unless noted;
    n_loop = P - k for padded length P (valid region is i <= L-k-1).
    """

    # successor tables, per event type (A=adoption, R=rescan):
    nxt_pos_a: jnp.ndarray   # int32, next event position or -1
    nxt_adopt_a: jnp.ndarray  # bool, next event is an adoption
    nxt_pos_r: jnp.ndarray
    nxt_adopt_r: jnp.ndarray
    # dense per-position event payloads (state set by an event there):
    val_a: jnp.ndarray       # uint32 minimizer value if adoption at i
    rev_a: jnp.ndarray       # bool strand
    sel_a: jnp.ndarray       # bool unrevhash(minimizer) <= threshold
    val_r: jnp.ndarray       # same for rescan at i (election of window i+1)
    rev_r: jnp.ndarray
    sel_r: jnp.ndarray
    # initial state (election of window 0): [next_pos, next_adopt,
    # val, rev, sel] packed as scalars
    init_nxt_pos: jnp.ndarray
    init_nxt_adopt: jnp.ndarray
    init_val: jnp.ndarray
    init_rev: jnp.ndarray
    init_sel: jnp.ndarray


def rolling_mmers(codes: jnp.ndarray, m: int, n_out: int):
    """Forward/RC m-mer codes at every start position s in [0, n_out).

    codes: uint8/uint32 2-bit codes, length >= n_out + m - 1.
    Returns (fwd, rc) uint32 arrays; 2m <= 30 bits fits uint32.
    """
    codes = codes.astype(_U32)
    fwd = jnp.zeros((n_out,), _U32)
    rc = jnp.zeros((n_out,), _U32)
    for j in range(m):
        c = jax.lax.dynamic_slice(codes, (j,), (n_out,))
        fwd = (fwd << 2) | c
        rc = rc | ((c ^ 2) << (2 * j))
    return fwd, rc


def window_elections(canon: jnp.ndarray, rev: jnp.ndarray, hh: U.U64,
                     k: int, m: int, n_w: int):
    """Exact regular_minimizer_pos (reference SubSampler.cpp:81-169) for
    every window w in [0, n_w), folding m-mers right-to-left.

    canon/rev/hash are indexed by m-mer start position (length >=
    n_w + k - m). Returns (EM value u32, EP rel position i32, ER bool,
    EH hash).
    """
    W = k - m + 1

    def sl(a, off):
        return jax.lax.dynamic_slice(a, (off,), (n_w,))

    def slh(h, off):
        return U.U64(sl(h.hi, off), sl(h.lo, off))

    # i = 0: rightmost m-mer (offset k-m)
    mini = sl(canon, k - m)
    is_rev = sl(rev, k - m)
    pos = jnp.where(is_rev, 0, k - m).astype(_I32)
    hmin = slh(hh, k - m)
    for i in range(1, W):
        off = k - m - i
        mmer = sl(canon, off)
        local_rev = sl(rev, off)
        h = slh(hh, off)
        replace = U.gt(hmin, h)
        tie = (mmer == mini) & ~replace
        same_dir = tie & (local_rev == is_rev)
        # reference tie rules: rev minimizers prefer larger i -> pos=i;
        # fwd prefer leftmost -> pos=k-m-i (SubSampler.cpp:149-165)
        tie_take = same_dir & jnp.where(is_rev, pos > i, pos > (k - m - i))
        take = replace | tie_take
        new_pos = jnp.where(replace, k - m - i,
                            jnp.where(is_rev, i, k - m - i)).astype(_I32)
        pos = jnp.where(take, new_pos, pos)
        mini = jnp.where(take, mmer, mini)
        is_rev = jnp.where(take, local_rev, is_rev)
        hmin = U.where(take, h, hmin)
    return mini, pos, is_rev, hmin


def _succ_table(h: U.U64, p: jnp.ndarray, j: jnp.ndarray,
                h_enter_pad: U.U64, W: int, last_i: jnp.ndarray):
    """Next event after an event at position j leaving state (h, p).

    The next event is the first i > j with H_enter[i] < h (adoption,
    checked first at every position, SubSampler.cpp:374) and otherwise
    the rescan at i == p (SubSampler.cpp:391). p - j <= W always.
    """
    n = j.shape[0]
    neg1 = jnp.full((n,), -1, _I32)
    best_pos = neg1
    best_adopt = jnp.zeros((n,), bool)
    found = jnp.zeros((n,), bool)
    for w in range(1, W + 1):
        i = j + w
        hi = U.U64(jax.lax.dynamic_slice(h_enter_pad.hi, (w,), (n,)),
                   jax.lax.dynamic_slice(h_enter_pad.lo, (w,), (n,)))
        adopt = (i <= p) & U.lt(hi, h) & (i <= last_i)
        rescan = (i == p) & ~U.lt(hi, h) & (i <= last_i)
        ev = adopt | rescan
        take = ev & ~found
        best_pos = jnp.where(take, i, best_pos)
        best_adopt = jnp.where(take, adopt, best_adopt)
        found = found | ev
    return best_pos, best_adopt


def scan_tables(codes: jnp.ndarray, k: int, m: int, padded_len: int,
                length: jnp.ndarray, threshold: U.U64) -> ScanTables:
    """Full vectorized scan of one 2-bit-coded sequence (pure function;
    vmap/shard_map-safe — see parallel/mesh.py for the batched form).

    codes: uint8 array of size padded_len (>= length + small margin).
    length: actual sequence length (int32 scalar).
    Returns ScanTables for the host/native chain walker.
    """
    P = padded_len
    W = k - m + 1
    n_m = P - m + 1       # m-mer start positions
    n_loop = P - k        # streaming loop positions
    n_w = P - k + 1       # k-mer windows

    fwd, rc = rolling_mmers(codes, m, n_m)
    canon = jnp.minimum(fwd, rc)
    rev = rc < fwd
    hh = xxh64_u32(canon)

    em, ep, er, eh = window_elections(canon, rev, hh, k, m, n_w)

    # Per-loop-position entering m-mer (starts at i + k - m + 1).
    def ent(a):
        return jax.lax.dynamic_slice(a, (k - m + 1,), (n_loop,))

    c_ent = ent(canon)
    r_ent = ent(rev)
    h_ent = U.U64(ent(hh.hi), ent(hh.lo))

    last_i = (length - k - 1).astype(_I32)
    j_idx = jnp.arange(n_loop, dtype=_I32)

    # Padded entering-hash array for lookahead slices: index by j + w.
    ones = jnp.full((W,), 0xFFFFFFFF, _U32)
    h_ent_pad = U.U64(jnp.concatenate([h_ent.hi, ones]),
                      jnp.concatenate([h_ent.lo, ones]))

    def h_ent_pad_from(j0):
        return U.U64(jax.lax.dynamic_slice(h_ent_pad.hi, (j0,),
                                           (n_loop + W,)),
                     jax.lax.dynamic_slice(h_ent_pad.lo, (j0,),
                                           (n_loop + W,)))

    # Adoption nodes: state (H_enter[j], p = j + W).
    pa = j_idx + W
    nxt_pos_a, nxt_adopt_a = _succ_table(h_ent, pa, j_idx, h_ent_pad, W,
                                         last_i)
    sel_a = U.le(h_ent, threshold)

    # Rescan nodes: election of window j+1; absolute position
    # p = EP[j+1] + j + 1 (the reference's position_min += (i+1),
    # SubSampler.cpp:397).
    em_r = jax.lax.dynamic_slice(em, (1,), (n_loop,))
    ep_r = jax.lax.dynamic_slice(ep, (1,), (n_loop,))
    er_r = jax.lax.dynamic_slice(er, (1,), (n_loop,))
    eh_r = U.U64(jax.lax.dynamic_slice(eh.hi, (1,), (n_loop,)),
                 jax.lax.dynamic_slice(eh.lo, (1,), (n_loop,)))
    pr = ep_r + j_idx + 1
    nxt_pos_r, nxt_adopt_r = _succ_table(eh_r, pr, j_idx, h_ent_pad, W,
                                         last_i)
    sel_r = U.le(eh_r, threshold)

    # Initial state: election of window 0, absolute position EP[0].
    init_h = U.U64(eh.hi[0:1], eh.lo[0:1])
    init_p = ep[0:1]
    init_j = jnp.full((1,), -1, _I32)
    init_pad = U.U64(h_ent_pad.hi[: 1 + W + 1], h_ent_pad.lo[: 1 + W + 1])
    # reuse _succ_table with a 1-element "array": lookahead slices need
    # h_ent_pad offset by j+w = w-1 -> build a shifted pad starting at -1.
    shift_pad = U.U64(
        jnp.concatenate([jnp.zeros((0,), _U32), h_ent_pad.hi]),
        jnp.concatenate([jnp.zeros((0,), _U32), h_ent_pad.lo]))
    neg1 = jnp.full((1,), -1, _I32)
    best_pos = neg1
    best_adopt = jnp.zeros((1,), bool)
    found = jnp.zeros((1,), bool)
    for w in range(1, W + 1):
        i = init_j + w  # = w - 1
        hi = U.U64(shift_pad.hi[w - 1: w], shift_pad.lo[w - 1: w])
        adopt = (i <= init_p) & U.lt(hi, init_h) & (i <= last_i)
        rescan = (i == init_p) & ~U.lt(hi, init_h) & (i <= last_i)
        ev = adopt | rescan
        take = ev & ~found
        best_pos = jnp.where(take, i, best_pos)
        best_adopt = jnp.where(take, adopt, best_adopt)
        found = found | ev

    return ScanTables(
        nxt_pos_a=nxt_pos_a, nxt_adopt_a=nxt_adopt_a,
        nxt_pos_r=nxt_pos_r, nxt_adopt_r=nxt_adopt_r,
        val_a=c_ent, rev_a=r_ent, sel_a=sel_a,
        val_r=em_r, rev_r=er_r, sel_r=sel_r,
        init_nxt_pos=best_pos[0], init_nxt_adopt=best_adopt[0],
        init_val=em[0], init_rev=er[0], init_sel=U.le(
            U.U64(eh.hi[0:1], eh.lo[0:1]), threshold)[0],
    )


device_scan = jax.jit(scan_tables, static_argnums=(1, 2, 3))


def walk_chain_host(t: ScanTables):
    """Follow successor links from the initial state (host numpy walker).

    Returns (event_positions int64[], event_types int8[] (0=A,1=R),
    values uint32[], revs bool[], sels bool[]) for the full event chain,
    plus the initial payload (val, rev, sel).
    """
    nxt_pos = [np.asarray(t.nxt_pos_a), np.asarray(t.nxt_pos_r)]
    nxt_ad = [np.asarray(t.nxt_adopt_a), np.asarray(t.nxt_adopt_r)]
    vals = [np.asarray(t.val_a), np.asarray(t.val_r)]
    revs = [np.asarray(t.rev_a), np.asarray(t.rev_r)]
    sels = [np.asarray(t.sel_a), np.asarray(t.sel_r)]

    pos_list, type_list = [], []
    p = int(t.init_nxt_pos)
    ty = 0 if bool(t.init_nxt_adopt) else 1
    while p >= 0:
        pos_list.append(p)
        type_list.append(ty)
        np_ = int(nxt_pos[ty][p])
        na = bool(nxt_ad[ty][p])
        p, ty = np_, 0 if na else 1
    pos = np.array(pos_list, dtype=np.int64)
    typ = np.array(type_list, dtype=np.int8)
    val = np.array([vals[t_][p_] for p_, t_ in zip(pos_list, type_list)],
                   dtype=np.uint32)
    rev = np.array([revs[t_][p_] for p_, t_ in zip(pos_list, type_list)],
                   dtype=bool)
    sel = np.array([sels[t_][p_] for p_, t_ in zip(pos_list, type_list)],
                   dtype=bool)
    init = (int(t.init_val), bool(t.init_rev), bool(t.init_sel))
    return pos, typ, val, rev, sel, init
