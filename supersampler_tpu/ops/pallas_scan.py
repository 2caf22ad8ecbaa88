"""Pallas TPU kernel for the fused minimizer scan.

One kernel pass per row-block computes rolling m-mer codes, canonical
forms, XXHash64 (uint32 limb math), exact window elections and both
successor tables entirely in VMEM, writing only the compact per-position
tables to HBM — the cross-stage intermediates (hashes, elections) never
round-trip through HBM as they can in the XLA-fused path.

Falls back to interpret mode off-TPU so the test-suite exercises the
same kernel logic on the CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from supersampler_tpu.ops import u64 as U
from supersampler_tpu.ops.minimizer import ScanTables, _block_tables

_I32 = jnp.int32


def _kernel(length_ref, thr_hi_ref, thr_lo_ref, c2_ref,
            na_pos_ref, na_adopt_ref, nr_pos_ref, nr_adopt_ref,
            c_ent_ref, r_ent_ref, sel_a_ref, em_r_ref, er_r_ref,
            sel_r_ref, *, k, m, C, halo, block_rows):
    b = pl.program_id(0)
    row0 = b * block_rows
    threshold = U.U64(thr_hi_ref[0], thr_lo_ref[0])
    (na_pos, na_adopt, nr_pos, nr_adopt, c_ent, r_ent, sel_a, em_r, er_r,
     sel_r, _em, _ep, _er, _eh, _h0) = _block_tables(
        c2_ref[:], row0, length_ref[0], threshold, k, m, C, halo)
    na_pos_ref[:] = na_pos
    na_adopt_ref[:] = na_adopt
    nr_pos_ref[:] = nr_pos
    nr_adopt_ref[:] = nr_adopt
    c_ent_ref[:] = c_ent
    r_ent_ref[:] = r_ent
    sel_a_ref[:] = sel_a
    em_r_ref[:] = em_r
    er_r_ref[:] = er_r
    sel_r_ref[:] = sel_r


def scan_tables_pallas(codes: jnp.ndarray, k: int, m: int,
                       padded_len: int, length: jnp.ndarray,
                       threshold: U.U64, cols: int = 512,
                       block_rows: int = 64,
                       interpret: bool | None = None) -> ScanTables:
    """Pallas-fused scan, bit-identical to scan_tables_2d."""
    P = padded_len
    C = cols
    W = k - m + 1
    halo = k + W
    assert P % C == 0
    R = P // C
    assert R % block_rows == 0, (R, block_rows)
    n_loop = P - k
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    base = codes.reshape(R, C)
    c2 = jnp.concatenate(
        [base, jnp.roll(base, -1, axis=0)[:, :halo]],
        axis=1).astype(jnp.uint32)

    grid = (R // block_rows,)
    Ce = C + halo
    out_shapes = [
        jax.ShapeDtypeStruct((R, C), _I32),       # na_pos
        jax.ShapeDtypeStruct((R, C), jnp.bool_),  # na_adopt
        jax.ShapeDtypeStruct((R, C), _I32),       # nr_pos
        jax.ShapeDtypeStruct((R, C), jnp.bool_),  # nr_adopt
        jax.ShapeDtypeStruct((R, C), jnp.uint32),  # c_ent
        jax.ShapeDtypeStruct((R, C), jnp.bool_),  # r_ent
        jax.ShapeDtypeStruct((R, C), jnp.bool_),  # sel_a
        jax.ShapeDtypeStruct((R, C), jnp.uint32),  # em_r
        jax.ShapeDtypeStruct((R, C), jnp.bool_),  # er_r
        jax.ShapeDtypeStruct((R, C), jnp.bool_),  # sel_r
    ]
    out_spec = pl.BlockSpec((block_rows, C), lambda b: (b, 0),
                            memory_space=pltpu.ANY
                            if interpret else pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # length
        pl.BlockSpec(memory_space=pltpu.SMEM),  # thr hi
        pl.BlockSpec(memory_space=pltpu.SMEM),  # thr lo
        pl.BlockSpec((block_rows, Ce), lambda b: (b, 0),
                     memory_space=pltpu.ANY if interpret else pltpu.VMEM),
    ]
    kernel = functools.partial(_kernel, k=k, m=m, C=C, halo=halo,
                               block_rows=block_rows)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple([out_spec] * 10),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(length.reshape(1).astype(_I32),
      threshold.hi.reshape(1), threshold.lo.reshape(1), c2)
    (na_pos, na_adopt, nr_pos, nr_adopt, c_ent, r_ent, sel_a, em_r,
     er_r, sel_r) = outs

    # init state (tiny): reuse the XLA block body on the first row only
    thr = threshold
    (_np2, _na2, _nr2, _nra2, _ce2, _re2, _sa2, _emr2, _err2, _srr2,
     em, ep, er, eh, h_ent0) = _block_tables(
        c2[:1], 0, length, thr, k, m, C, halo)
    last_i = (length - k - 1).astype(_I32)
    em0 = em[0, 0]
    ep0 = ep[0, 0]
    er0 = er[0, 0]
    eh0 = U.U64(eh.hi[0:1, 0], eh.lo[0:1, 0])
    hf = U.U64(h_ent0.hi[0], h_ent0.lo[0])
    init_pos = jnp.full((1,), -1, _I32)
    init_adopt = jnp.zeros((1,), bool)
    init_found = jnp.zeros((1,), bool)
    p0 = ep0[None]
    for w in range(1, W + 1):
        i = jnp.full((1,), w - 1, _I32)
        hi = U.U64(hf.hi[w - 1 : w], hf.lo[w - 1 : w])
        ltv = U.lt(hi, eh0)
        adopt = (i <= p0) & ltv & (i <= last_i)
        rescan = (i == p0) & ~ltv & (i <= last_i)
        ev = adopt | rescan
        take = ev & ~init_found
        init_pos = jnp.where(take, i, init_pos)
        init_adopt = jnp.where(take, adopt, init_adopt)
        init_found = init_found | ev

    def flat(a):
        return a.reshape(-1)[:n_loop]

    return ScanTables(
        nxt_pos_a=flat(na_pos), nxt_adopt_a=flat(na_adopt),
        nxt_pos_r=flat(nr_pos), nxt_adopt_r=flat(nr_adopt),
        val_a=flat(c_ent), rev_a=flat(r_ent), sel_a=flat(sel_a),
        val_r=flat(em_r), rev_r=flat(er_r), sel_r=flat(sel_r),
        init_nxt_pos=init_pos[0], init_nxt_adopt=init_adopt[0],
        init_val=em0, init_rev=er0,
        init_sel=U.le(eh0, threshold)[0],
    )
