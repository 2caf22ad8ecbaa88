"""Fused Mosaic scan kernel: 2-bit codes -> per-position field tables.

The XLA formulation of the field scan (ops/field.py _field_core) runs
its m-mer build, XXHash64, election fold and slicing as dozens of
wide HBM-level ops — measured ~3.2 ms per 4.19 Mbp record on this
chip, ~10x off the ALU roofline, because every odd-offset slice is a
relayout copy between unfused op groups. This kernel runs the whole
per-position pipeline (rolling m-mers -> canonical form -> XXHash64
limbs -> exact election fold -> entering-hash/value extraction) on
one (8, CP) VMEM tile per grid step: shifted views become in-register
lane rotations and every intermediate stays on-core; only the packed
codes come in and the 7 table arrays go out (~150 MB/record, ~0.2 ms
of HBM traffic).

Semantics are IDENTICAL to the XLA path (the fold is the same code
shape as ops/minimizer._mmer_elect_block, reference
SubSampler.cpp:81-169); tests pin byte-equality through the engine
suites, plus an interpret-mode parity test on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from supersampler_tpu.ops import u64 as U
from supersampler_tpu.ops.hashing import xxh64_u32

_I32 = jnp.int32
_U32 = jnp.uint32


_RB = 64                 # rows per grid step (8-sublane multiple)


def _scan_block_kernel(c2_ref, ohi, olo, ocv, opem, oep, oehh, oehl,
                       *, k: int, m: int, CP: int):
    """One (RB, CP) row tile: tables for windows/positions [0, C]."""
    W = k - m + 1
    km = k - m
    c2 = c2_ref[0]                       # (8, CP) u32 codes

    def sh(a, j):
        # left-shift by j columns (wrap-around lands in the invalid
        # tail, never consumed); pltpu.roll requires a non-negative
        # rotate amount
        return pltpu.roll(a, CP - j, 1) if j else a

    # rolling m-mers (forward and reverse-complement), canonical form
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

    # exact election fold (regular_minimizer_pos, right-to-left)
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
        tie_take = same & ((isr_b & (pos > i)) | (~isr_b & (pos > off)))
        take = repl | tie_take
        newp = jnp.where(repl, off, jnp.where(isr_b, i, off)).astype(_I32)
        pos = jnp.where(take, newp, pos)
        mini = jnp.where(take, mm, mini)
        isr = jnp.where(take, lr, isr)
        hmh = jnp.where(take, nhh, hmh)
        hml = jnp.where(take, nhl, hml)

    # entering per-position arrays (offset k-m+1) + packed elections
    ohi[0] = sh(hhi, km + 1)
    olo[0] = sh(hlo, km + 1)
    ocv[0] = sh(canon, km + 1) | (sh(rev, km + 1) << 30)
    opem[0] = mini | (isr << 30)
    oep[0] = pos
    oehh[0] = hmh
    oehl[0] = hml


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _scan_tables_mosaic(c2p, k: int, m: int, C: int, CP: int,
                        interpret: bool = False):
    """c2p: (R, CP) u32 halo'd codes (valid cols [0, C + k + W)).
    Returns 7 (R, CP) arrays: h0.hi, h0.lo, cv (valid [0, C)) and
    packed-em, ep, eh.hi, eh.lo (valid window starts [0, C])."""
    R = c2p.shape[0]
    rb = min(_RB, R)
    assert R % rb == 0 and rb % 8 == 0 and CP % 128 == 0
    n_blk = R // rb
    c2b = c2p.reshape(n_blk, rb, CP)
    spec = pl.BlockSpec((1, rb, CP), lambda g: (g, 0, 0))
    shp_u = jax.ShapeDtypeStruct((n_blk, rb, CP), _U32)
    shp_i = jax.ShapeDtypeStruct((n_blk, rb, CP), _I32)
    outs = pl.pallas_call(
        functools.partial(_scan_block_kernel, k=k, m=m, CP=CP),
        grid=(n_blk,),
        in_specs=[spec],
        out_specs=tuple(spec for _ in range(7)),
        out_shape=(shp_u, shp_u, shp_u, shp_u, shp_i, shp_u, shp_u),
        interpret=interpret,
    )(c2b)
    return tuple(a.reshape(R, CP) for a in outs)


def field_core_mosaic(codes, k: int, m: int, P: int, C: int, first_row,
                      interpret: bool = False):
    """Drop-in replacement for ops/field._field_core on TPU: same
    return tuple, with the per-position pipeline in the fused Mosaic
    kernel and only the sync log-min chain left in XLA."""
    from supersampler_tpu.ops.field import _sync_from_h0

    W = k - m + 1
    halo = k + W
    assert C > halo and P % C == 0
    R = P // C
    CP = -(-(C + halo) // 128) * 128
    base = codes.reshape(R, C)
    c2 = jnp.concatenate(
        [base, jnp.roll(base, -1, axis=0)[:, :halo]],
        axis=1).astype(_U32)
    if CP > C + halo:
        c2 = jnp.concatenate(
            [c2, jnp.zeros((R, CP - (C + halo)), _U32)], axis=1)
    # row tiles are _RB rows (8-sublane multiples): pad up (pad rows
    # produce garbage tables that are sliced away before the sync
    # chain)
    R8 = -(-R // _RB) * _RB if R >= _RB else -(-R // 8) * 8
    if R8 != R:
        c2 = jnp.concatenate(
            [c2, jnp.zeros((R8 - R, CP), _U32)], axis=0)
    ohi, olo, ocv, opem, oep, oehh, oehl = (
        a[:R] for a in _scan_tables_mosaic(c2, k, m, C, CP, interpret))

    h0 = U.U64(ohi[:, :C], olo[:, :C])
    cv = ocv[:, :C]
    em_r = opem[:, 1 : C + 1]            # already value|rev<<30 packed
    ep_r = oep[:, 1 : C + 1]
    eh_r = U.U64(oehh[:, 1 : C + 1], oehl[:, 1 : C + 1])
    sync = _sync_from_h0(h0, first_row, W, C)
    # unshifted window-0 elections (callers read column 0 rows only)
    em = opem[:, : C + 1] & ((1 << 30) - 1)
    ep = oep[:, : C + 1]
    er = (opem[:, : C + 1] >> 30) != 0
    eh = U.U64(oehh[:, : C + 1], oehl[:, : C + 1])
    eflag = jnp.zeros((1, 1), bool)      # fold is exact: never flags
    return h0, cv, em_r, ep_r, eh_r, sync, em, ep, er, eh, eflag
