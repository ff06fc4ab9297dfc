"""Pallas TPU helpers: one-hot matvec algebra + few-segment reduction.

The round-4 probe (tools/r4_bf16_probe.py) established that XLA's TPU row
gather costs ~11.4 ns per ROW regardless of width (64..128 lanes, f32 or
bf16) — per-row dispatch, not bandwidth. Two consequences shape the hot
matvec paths:

- x-row gathers (one row per block per matvec) move INSIDE kernels as
  one-hot MXU products against the tiny, VMEM-resident x table
  (`_expand_mv` + the gather loop in segsum_stream's matvec path);
- reductions with FEW destinations (pose rows) can keep the whole
  accumulator in VMEM and take destinations in ANY order via a
  transposed one-hot matmul (`block_matvec_stream`, used by b_schur) —
  no sort, no flush schedule, no scatter.

Precision: one-hot matrices are 0/1 (exact in bf16). Value-carrying dots
against f32 data run at HIGHEST (Mosaic lowers only DEFAULT/HIGHEST in
kernels): the multi-pass product reconstructs the f32 operand to ~2^-24
— effectively exact copies/sums. bf16 streams are single-pass exact for
their own precision. Sum-carrying dots (the G contraction and
destination reduces) always run HIGHEST.

Reference parity: the batched block matvec + atomicAdd kernels
(ops/schur.hpp:190-263) and the b_Schur product (schur.hpp:886-920).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# one-hot T-block: bounds the (TB, chunk) iota/one-hot temporaries
TB = 512
# x tables larger than this make the in-kernel gather's one-hot matmuls
# cost more than the XLA row gather they replace (cost ~ K * t_pad * 128
# MACs); callers fall back to gather-based paths above it
TABLE_ROWS_LIMIT = 4096


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def tpad(n: int, tb: int = TB) -> int:
    return max(_round_up(n, tb), tb)


def pack_chunk_ids(ids: np.ndarray, k_pad: int, chunk: int,
                   fill: int) -> np.ndarray:
    """(K,) int ids -> (ceil8(n_chunks), chunk) chunk-row layout (the
    compact HBM layout for per-chunk lane vectors, see segsum_stream)."""
    k = ids.shape[0]
    out = np.full(k_pad, fill, dtype=np.int32)
    out[:k] = ids.astype(np.int32)
    n_chunks = k_pad // chunk
    rows = out.reshape(n_chunks, chunk)
    n8 = _round_up(max(n_chunks, 1), 8)
    if n8 != n_chunks:
        rows = np.concatenate(
            [rows, np.repeat(rows[-1:], n8 - n_chunks, axis=0)], axis=0)
    return rows


# kill switch: fall back to Mosaic's HIGHEST f32 emulation for every
# value-carrying kernel dot (r4 default: 3-way bf16 split, half the passes)
_NO_SPLIT = bool(os.environ.get("GRAPHITE_TPU_NO_SPLIT_DOT"))


def f32_split3(x: jax.Array):
    """f32 -> 3 bf16 terms with h+m+l == x to ~2^-26 relative.

    bf16 shares f32's exponent range, so the residual subtractions are
    exact and each term captures the next ~8 mantissa bits; no
    overflow/underflow cliffs."""
    h = x.astype(jnp.bfloat16)
    r = x - h.astype(jnp.float32)
    m = r.astype(jnp.bfloat16)
    l = (r - m.astype(jnp.float32)).astype(jnp.bfloat16)
    return (h, m, l)


def value_parts(val: jax.Array):
    """Split an f32 value operand ONCE for reuse across several exact
    dots; bf16 operands (and the kill switch) pass through unsplit."""
    if _NO_SPLIT or val.dtype == jnp.bfloat16:
        return (val,)
    return f32_split3(val)


def parts_dot(parts, onehot, dn, onehot_left: bool = True):
    """dot_general where ``onehot`` is EXACTLY bf16-representable (0/1
    one-hot / mask matrices) and ``parts`` is value_parts(val).

    Every kernel dot in this module has one 0/1 operand, so instead of
    Mosaic's HIGHEST f32 emulation (6 bf16 passes: 3-way split of BOTH
    operands) we split only the value side: 3 single-pass bf16 dots,
    f32 accumulate — same ~2^-24 quality at half the MXU passes. bf16
    values take ONE pass. Always returns f32."""
    if len(parts) == 1 and parts[0].dtype != jnp.bfloat16:
        prec = jax.lax.Precision.HIGHEST  # kill-switch fallback
        oh = onehot.astype(parts[0].dtype)
    else:
        prec = jax.lax.Precision.DEFAULT
        oh = onehot.astype(jnp.bfloat16)
    out = None
    for p in parts:
        a, b = (oh, p) if onehot_left else (p, oh)
        t = jax.lax.dot_general(a, b, dn,
                                preferred_element_type=jnp.float32,
                                precision=prec)
        out = t if out is None else out + t
    return out


def exact_dot(onehot, val, dn, onehot_left: bool = True):
    """One-shot parts_dot for a value used in a single dot."""
    return parts_dot(value_parts(val), onehot, dn, onehot_left)


def onehot_gather(idx_row, xtab_ref, t_pad: int, chunk: int,
                  tb: int = TB):
    """right (chunk, xw) f32 = x_table[idx] via T-blocked one-hot MXU
    products. ``idx_row`` is a (1, chunk) int32 lane vector; ``xtab_ref``
    a (t_pad, xw) VMEM block (lanes beyond the live dim MUST be zero)."""
    out = None
    for t0 in range(0, t_pad, tb):
        rows = jax.lax.broadcasted_iota(jnp.int32, (tb, chunk), 0) + t0
        xt = xtab_ref[pl.ds(t0, tb), :]
        oh = (rows == idx_row).astype(jnp.bfloat16)
        part = exact_dot(oh, xt, (((0,), (0,)), ((), ())),
                         onehot_left=True)
        out = part if out is None else out + part
    return out


def _expand_mv(left, right, m: int, k: int, lw: int, xw: int,
               transpose: bool, off: int = 0):
    """Flat block matvec via expansion one-hots (no data relayout).

    forward: prod[c, a] = sum_b left[c, off + a*k+b] * right[c, b]
    transpose: prod[c, cc] = sum_r left[c, off + r*k+cc] * right[c, r]
    ``off`` selects an unaligned lane window of ``left`` (e.g. one
    arity slot of a multi-slot flat row) WITHOUT a Mosaic lane slice —
    the window is encoded in the expansion one-hots. Dead lanes outside
    [off, off + m*k) are excluded by the in-window iota mask."""
    j_row = jax.lax.broadcasted_iota(jnp.int32, (xw, lw), 1) - off
    r_row = jax.lax.broadcasted_iota(jnp.int32, (xw, lw), 0)
    inw_r = (j_row >= 0) & (j_row < m * k)
    if transpose:
        T = ((r_row == j_row // k) & inw_r).astype(jnp.bfloat16)
        d = k
    else:
        T = ((r_row == j_row % k) & inw_r).astype(jnp.bfloat16)
        d = m
    x_tiled = exact_dot(T, right, (((1,), (0,)), ((), ())),
                        onehot_left=False)
    term = left.astype(jnp.float32) * x_tiled
    j_col = jax.lax.broadcasted_iota(jnp.int32, (lw, d), 0) - off
    o_col = jax.lax.broadcasted_iota(jnp.int32, (lw, d), 1)
    inw_c = (j_col >= 0) & (j_col < m * k)
    if transpose:
        G = ((j_col % k == o_col) & inw_c).astype(jnp.bfloat16)
    else:
        G = ((j_col // k == o_col) & inw_c).astype(jnp.bfloat16)
    # the G contraction SUMS f32 terms: split term (3 bf16 passes, f32
    # accumulate) ≡ HIGHEST quality at half the passes
    return exact_dot(G, term, (((1,), (0,)), ((), ())),
                     onehot_left=False)


def _kernel_stream(left_ref, right_ref, dst_ref, out_ref, *, chunk, m, k,
                   lw, rw, npo, dw, nslot, d, transpose, bf16_reduce):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    sub = pl.ds(jax.lax.rem(i, jnp.int32(8)), 1)
    dst = dst_ref[sub, :]  # (1, chunk)
    left = left_ref[:]
    right = right_ref[:].astype(jnp.float32)
    prod = _expand_mv(left, right, m, k, lw, rw, transpose)
    packed_scatter(prod, dst, out_ref, npo, chunk, d, dw, nslot,
                   bf16_reduce=bf16_reduce)


@functools.partial(
    jax.jit, static_argnames=("chunk", "m", "k", "lw", "rw", "npo", "dw",
                              "nslot", "n_chunks", "transpose",
                              "bf16_reduce"))
def _run_stream(left_pad, right_pad, dst, *, chunk, m, k, lw, rw, npo, dw,
                nslot, n_chunks, transpose, bf16_reduce):
    d = k if transpose else m
    out = pl.pallas_call(
        functools.partial(
            _kernel_stream, chunk=chunk, m=m, k=k, lw=lw, rw=rw,
            npo=npo, dw=dw, nslot=nslot, d=d, transpose=transpose,
            bf16_reduce=bf16_reduce),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, lw), lambda i: (i, 0)),
            pl.BlockSpec((chunk, rw), lambda i: (i, 0)),
            pl.BlockSpec((8, chunk), lambda i: (i // 8, 0)),
        ],
        out_specs=pl.BlockSpec((npo, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((npo, 128), jnp.float32),
    )(left_pad, right_pad, dst)
    return out.reshape(-1, dw)[:, :d]


def plan_block_matvec(K: int, chunk: int = 1024) -> dict:
    k_pad = max(_round_up(K, chunk), chunk)
    return dict(K=K, k_pad=k_pad, chunk=chunk, n_chunks=k_pad // chunk)


def slot_geom(d: int):
    """Slot width / count for row lane-packing: d values live in a
    dw-lane slot, nslot = 128/dw slots per 128-lane packed row."""
    dw = next(w for w in (8, 16, 32, 64, 128) if d <= w)
    return dw, 128 // dw


def pack_rows(x2d: jax.Array, nslot: int):
    """(tp, dw) zero-padded row table -> (tp/nslot, 128) packed rows
    (row r at packed[r // nslot, (r % nslot) * dw : ... + dw])."""
    tp, dw = x2d.shape
    return x2d.reshape(tp // nslot, nslot * dw)


def _slot_mask(idx_row, dw: int, nslot: int, chunk: int):
    """(chunk, 128) 0/1 mask M[c, l] = (idx[c] % nslot == l // dw), built
    from the (1, chunk) LANE vector without a lane->sublane transpose:
    one (nslot)-contraction dot of two exact 0/1 bf16 operands."""
    s_row = jax.lax.broadcasted_iota(jnp.int32, (nslot, chunk), 0)
    ohs = (s_row == jax.lax.rem(idx_row, jnp.int32(nslot))).astype(
        jnp.bfloat16)
    e_s = jax.lax.broadcasted_iota(jnp.int32, (nslot, 128), 0)
    e_l = jax.lax.broadcasted_iota(jnp.int32, (nslot, 128), 1)
    E = (e_l // dw == e_s).astype(jnp.bfloat16)
    return jax.lax.dot_general(
        ohs, E, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)


def packed_gather(idx_row, ptab_ref, np_rows: int, chunk: int, dw: int,
                  nslot: int, tb: int = TB):
    """(chunk, dw) f32 = x_table[idx] from a PACKED (np_rows, 128) VMEM
    table: the one-hot contraction runs over nslot-times fewer rows with
    all 128 output lanes live (~8x fewer effective MACs than the
    unpacked `onehot_gather`), then a slot mask + fold select each row's
    own dw-lane slot."""
    prow = idx_row // jnp.int32(nslot)
    acc = None
    for t0 in range(0, np_rows, tb):
        nrow = min(tb, np_rows - t0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (nrow, chunk), 0) + t0
        oh = (rows == prow).astype(jnp.bfloat16)
        part = exact_dot(oh, ptab_ref[pl.ds(t0, nrow), :],
                         (((0,), (0,)), ((), ())), onehot_left=True)
        acc = part if acc is None else acc + part
    sel = acc * _slot_mask(idx_row, dw, nslot, chunk)
    f_l = jax.lax.broadcasted_iota(jnp.int32, (128, dw), 0)
    f_j = jax.lax.broadcasted_iota(jnp.int32, (128, dw), 1)
    F = (f_l % dw == f_j).astype(jnp.bfloat16)
    # fold sums one nonzero slot + zeros per row: exact copy via split
    return exact_dot(F, sel, (((1,), (0,)), ((), ())), onehot_left=False)


def packed_scatter(prod, dst_row, out_ref, np_rows: int, chunk: int,
                   d: int, dw: int, nslot: int, tb: int = TB,
                   bf16_reduce: bool = False):
    """out_packed[dst // nslot, (dst % nslot)*dw + j] += prod[c, j] at
    UNSORTED ids: slot-expand the (chunk, d) values to (chunk, 128),
    then tb-blocked transposed one-hot dots over the PACKED row range
    (~8x fewer effective MACs than the unpacked `_scatter_table`)."""
    t_j = jax.lax.broadcasted_iota(jnp.int32, (d, 128), 0)
    t_l = jax.lax.broadcasted_iota(jnp.int32, (d, 128), 1)
    T2 = (t_l % dw == t_j).astype(jnp.bfloat16)
    prod_t = exact_dot(T2, prod, (((1,), (0,)), ((), ())),
                       onehot_left=False)
    pexp = prod_t * _slot_mask(dst_row, dw, nslot, chunk)
    if bf16_reduce:
        pexp = pexp.astype(jnp.bfloat16)
    pparts = value_parts(pexp)
    prow = dst_row // jnp.int32(nslot)
    for t0 in range(0, np_rows, tb):
        nrow = min(tb, np_rows - t0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (nrow, chunk), 0) + t0
        oh = (rows == prow).astype(jnp.bfloat16)
        contr = parts_dot(pparts, oh, (((1,), (0,)), ((), ())),
                          onehot_left=True)
        cur = out_ref[pl.ds(t0, nrow), :]
        out_ref[pl.ds(t0, nrow), :] = cur + contr


def _kernel_sym(left_ref, xc_ref, xr_ref, cid_ref, rid_ref, rxi_ref,
                yr_ref, yc_ref, *, chunk, m, k, lw, dw, nslot, npc, npr,
                npor, npoc, xdt):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        yr_ref[:] = jnp.zeros_like(yr_ref)
        yc_ref[:] = jnp.zeros_like(yc_ref)

    sub = pl.ds(jax.lax.rem(i, jnp.int32(8)), 1)
    cid = cid_ref[sub, :]  # col ids: forward x index AND transposed dst
    rid = rid_ref[sub, :]  # row ids: forward dst
    rxi = rxi_ref[sub, :]  # masked row ids: transposed x index
    left = left_ref[:]
    # forward: y_r[rid] += A x_c[cid]; the gather is exact, so casting
    # back to the table dtype is lossless (bf16 tables -> 1-pass dots)
    xc = packed_gather(cid, xc_ref, npc, chunk, dw, nslot)
    pf = _expand_mv(left, xc.astype(xdt), m, k, lw, dw, transpose=False)
    packed_scatter(pf, rid, yr_ref, npor, chunk, m, dw, nslot)
    # transposed: y_c[cid] += A^T x_r[rxi] (diag blocks: rxi -> zero row)
    xr = packed_gather(rxi, xr_ref, npr, chunk, dw, nslot)
    pt = _expand_mv(left, xr.astype(xdt), m, k, lw, dw, transpose=True)
    packed_scatter(pt, cid, yc_ref, npoc, chunk, k, dw, nslot)


@functools.partial(
    jax.jit, static_argnames=("chunk", "m", "k", "lw", "dw", "nslot",
                              "npc", "npr", "npor", "npoc", "n_chunks"))
def _run_sym(left_pad, xc_tab, xr_tab, cid, rid, rxi, *, chunk, m, k, lw,
             dw, nslot, npc, npr, npor, npoc, n_chunks):
    yr, yc = pl.pallas_call(
        functools.partial(
            _kernel_sym, chunk=chunk, m=m, k=k, lw=lw, dw=dw,
            nslot=nslot, npc=npc, npr=npr, npor=npor, npoc=npoc,
            xdt=xc_tab.dtype),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, lw), lambda i: (i, 0)),
            pl.BlockSpec((npc, nslot * dw), lambda i: (0, 0)),
            pl.BlockSpec((npr, nslot * dw), lambda i: (0, 0)),
            pl.BlockSpec((8, chunk), lambda i: (i // 8, 0)),
            pl.BlockSpec((8, chunk), lambda i: (i // 8, 0)),
            pl.BlockSpec((8, chunk), lambda i: (i // 8, 0)),
        ],
        out_specs=[
            pl.BlockSpec((npor, 128), lambda i: (0, 0)),
            pl.BlockSpec((npoc, 128), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npor, 128), jnp.float32),
            jax.ShapeDtypeStruct((npoc, 128), jnp.float32),
        ],
    )(left_pad, xc_tab, xr_tab, cid, rid, rxi)
    return yr, yc


def matvec_sym_stream(left_pad, xc_rows, xr_rows, cid, rid, rxi, plan,
                      m: int, k: int, n_r: int, n_c: int):
    """SYMMETRIC block matvec: ONE natural-order read of the stored
    triangle computes both directions into VMEM-resident PACKED tables —

        y_r[rid] += A x_c[cid]        (all blocks)
        y_c[cid] += A^T x_r[rxi]      (rxi = rid off-diagonal, zero row
                                       for diagonal/pad rows)

    No destination ordering, no flush schedule, no per-solve permuted or
    transposed S copies (the r4 tbl path built TWO full S copies per
    solve and read both per matvec; this kernel reads the one stored S
    once per matvec). The x tables and y accumulators are slot-PACKED 8
    rows per 128-lane row, so every one-hot contraction runs with full
    output lanes (~8x fewer effective MACs than 9/16-lane tables).

    ``xc_rows`` / ``xr_rows``: (tpad(n+1), dw) zero-padded row tables
    with dw = slot_geom(max(m, k))[0] (packed internally). Feasible when
    both pose row tables fit the in-kernel gather limit
    (TABLE_ROWS_LIMIT). Returns ((n_r, m), (n_c, k)) f32.

    Reference parity: the symmetric S block matvec of the PCG-Schur
    solver (schur.hpp:307-393, pcg_schur.hpp:108-163) — the atomicAdd
    over both triangles restated as transposed one-hot MXU reductions.
    """
    dw, nslot = slot_geom(max(m, k))
    assert xc_rows.shape[1] == dw and xr_rows.shape[1] == dw
    tor_pad = tpad(n_r + 1)
    toc_pad = tpad(n_c + 1)
    yr, yc = _run_sym(
        left_pad, pack_rows(xc_rows, nslot), pack_rows(xr_rows, nslot),
        cid, rid, rxi,
        chunk=plan["chunk"], m=m, k=k, lw=left_pad.shape[1],
        dw=dw, nslot=nslot, npc=xc_rows.shape[0] // nslot,
        npr=xr_rows.shape[0] // nslot, npor=tor_pad // nslot,
        npoc=toc_pad // nslot, n_chunks=plan["n_chunks"])
    yr = yr.reshape(-1, dw)[:n_r, :m]
    yc = yc.reshape(-1, dw)[:n_c, :k]
    return yr, yc


def block_matvec_stream(left_pad, right_pad, plan, dst, m: int, k: int,
                        n_rows: int, transpose: bool = False,
                        bf16_reduce: bool = False):
    """Per-row block matvec (or transposed matvec) against a sequential
    right-hand STREAM + few-segment VMEM one-hot reduction; destination
    ids in ANY order (trash id = n_rows, out sliced off). Returns
    (n_rows, m|k) f32.

    ``bf16_reduce`` rounds each per-row product to bf16 before the
    destination reduce (f32 accumulation) — only for callers already in
    a bf16-stream policy. The accumulator is slot-PACKED (8 rows per
    128-lane row; see `packed_scatter`)."""
    d = k if transpose else m
    dw, nslot = slot_geom(d)
    to_pad = tpad(n_rows + 1)
    out = _run_stream(
        left_pad, right_pad, dst,
        chunk=plan["chunk"], m=m, k=k, lw=left_pad.shape[1],
        rw=right_pad.shape[1], npo=to_pad // nslot, dw=dw, nslot=nslot,
        n_chunks=plan["n_chunks"], transpose=transpose,
        bf16_reduce=bf16_reduce)
    return out[:n_rows]


def _kernel_wtbl(wblk_ref, left_ref, wt0_ref, wt1_ref, dst_ref, lid_ref,
                 out_ref, *, chunk, m, k, lw, dw, nslot, wbp, npo,
                 bf16_reduce):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    sub = pl.ds(jax.lax.rem(i, jnp.int32(8)), 1)
    dst = dst_ref[sub, :]
    lid = lid_ref[sub, :]
    # the two adjacent packed table blocks cover this chunk's whole
    # non-decreasing id window; rebase ids to the window
    lloc = lid - wblk_ref[i] * jnp.int32(wbp * nslot)
    ww = jnp.concatenate([wt0_ref[:], wt1_ref[:]], axis=0)
    # ids outside [0, 2*wbp*nslot) (masked/pad rows) match no one-hot row
    from .pcg_mf import _gather_v

    xg = _gather_v(lloc, ww, 2 * wbp, chunk, dw, nslot)
    left = left_ref[:]
    prod = _expand_mv(left, xg.astype(ww.dtype), m, k, lw, dw,
                      transpose=False)
    packed_scatter(prod, dst, out_ref, npo, chunk, m,
                   *slot_geom(m), bf16_reduce=bf16_reduce)


@functools.partial(
    jax.jit, static_argnames=("chunk", "m", "k", "lw", "dw", "nslot",
                              "wbp", "npo", "n_chunks", "bf16_reduce"))
def _run_wtbl(left_pad, wtab_p, wblk, dst, lid, *, chunk, m, k, lw, dw,
              nslot, wbp, npo, n_chunks, bf16_reduce):
    from jax.experimental.pallas import tpu as pltpu

    out = pl.pallas_call(
        functools.partial(
            _kernel_wtbl, chunk=chunk, m=m, k=k, lw=lw, dw=dw,
            nslot=nslot, wbp=wbp, npo=npo, bf16_reduce=bf16_reduce),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((chunk, lw), lambda i, wb: (i, 0)),
                pl.BlockSpec((wbp, 128), lambda i, wb: (wb[i], 0)),
                pl.BlockSpec((wbp, 128), lambda i, wb: (wb[i] + 1, 0)),
                pl.BlockSpec((8, chunk), lambda i, wb: (i // 8, 0)),
                pl.BlockSpec((8, chunk), lambda i, wb: (i // 8, 0)),
            ],
            out_specs=pl.BlockSpec((npo, 128), lambda i, wb: (0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((npo, 128), jnp.float32),
    )(wblk, left_pad, wtab_p, wtab_p, dst, lid)
    dwo, _ = slot_geom(m)
    return out.reshape(-1, dwo)[:, :m]


def plan_matvec_wtbl(lrow: np.ndarray, n_rows: int, K: int,
                     chunk: int = 1024, wbp: int = 64) -> dict | None:
    """Host plan for the WINDOWED-table block matvec: per-chunk packed
    table block index, or None when some chunk's id window exceeds the
    two-block coverage (ids must be non-decreasing)."""
    d_probe, nslot = 8, 16  # dl <= 8 tables (slot_geom(dl))
    lg = wbp * nslot  # logical rows per packed table block
    k_pad = max(_round_up(K, chunk), chunk)
    lr = np.concatenate([lrow.astype(np.int64),
                         np.full(k_pad - K, n_rows, np.int64)])
    n_chunks = k_pad // chunk
    first = lr[::chunk]
    last = np.maximum(lr[chunk - 1::chunk], first)  # pad rows -> n_rows
    wblk = first // lg
    # pad-row ids (n_rows) may exceed the live window: they match no
    # one-hot row, so only LIVE ids constrain coverage
    live_last = np.array([
        lr[i * chunk:(i + 1) * chunk][lr[i * chunk:(i + 1) * chunk]
                                      < n_rows].max(initial=0)
        for i in range(n_chunks)])
    if np.any(live_last >= (wblk + 2) * lg):
        return None
    # the packed table must cover every live id window AND the zero/fill
    # row n_rows (dynamic_update_slice needs n_rows <= table rows)
    n_tab = max(int(wblk.max()) + 2 if n_chunks else 2,
                -(-(n_rows + 1) // lg))
    return dict(K=K, k_pad=k_pad, chunk=chunk, n_chunks=n_chunks,
                wbp=wbp, lg=lg, wblk=wblk.astype(np.int32),
                n_tab_blocks=n_tab)


def block_matvec_wtbl(left_pad, w_rows, plan, dst, lid, m: int, k: int,
                      n_out: int, bf16_reduce: bool = False):
    """y[dst] += A_i @ w[lid_i] with NON-DECREASING lid served from a
    rolling two-block window of the slot-packed w table — the w rows are
    never expanded to a K-row stream (the repeat-expansion alternative
    writes+reads a (K, dl) 128-lane-padded buffer: ~5 GB at
    Venice-Final). ``w_rows``: (n_rows, k) solve-table rows; ``lid``:
    packed (8-row, chunk) ABSOLUTE row ids (fill = n_rows); ``dst``:
    packed pose row ids (fill = trash). Returns (n_out, m) f32.

    Reference parity: the b_schur product schur.hpp:886-920."""
    dw, nslot = slot_geom(k)
    assert dw == 8 and nslot == 16, "wtbl plans assume dl <= 8 tables"
    n_rows = w_rows.shape[0]
    lg = plan["lg"]
    t_rows = plan["n_tab_blocks"] * lg
    tab = jnp.zeros((t_rows, dw), w_rows.dtype)
    tab = jax.lax.dynamic_update_slice(
        tab, w_rows.astype(w_rows.dtype), (0, 0))
    wtab_p = pack_rows(tab, nslot)
    dwo, nso = slot_geom(m)
    npo = tpad(n_out + 1) // nso
    out = _run_wtbl(
        left_pad, wtab_p, jnp.asarray(plan["wblk"]), dst, lid,
        chunk=plan["chunk"], m=m, k=k, lw=left_pad.shape[1], dw=dw,
        nslot=nslot, wbp=plan["wbp"], npo=npo,
        n_chunks=plan["n_chunks"], bf16_reduce=bf16_reduce)
    return out[:n_out]
