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
        oh = (rows == idx_row).astype(jnp.float32)
        part = exact_dot(oh, xt, (((0,), (0,)), ((), ())),
                         onehot_left=True)
        out = part if out is None else out + part
    return out


def _expand_mv(left, right, m: int, k: int, lw: int, xw: int,
               transpose: bool):
    """Flat block matvec via expansion one-hots (no data relayout).

    forward: prod[c, a] = sum_b left[c, a*k+b] * right[c, b]
    transpose: prod[c, cc] = sum_r left[c, r*k+cc] * right[c, r]
    Dead lanes: forward excluded by G (j//k >= m never matches an output
    column); transpose excluded because right lanes >= m are zero (the x
    tables / wide rows are zero-padded)."""
    j_row = jax.lax.broadcasted_iota(jnp.int32, (xw, lw), 1)
    r_row = jax.lax.broadcasted_iota(jnp.int32, (xw, lw), 0)
    if transpose:
        T = (r_row == j_row // k).astype(jnp.float32)
        d = k
    else:
        T = (r_row == j_row % k).astype(jnp.float32)
        d = m
    x_tiled = exact_dot(T, right, (((1,), (0,)), ((), ())),
                        onehot_left=False)
    term = left.astype(jnp.float32) * x_tiled
    j_col = jax.lax.broadcasted_iota(jnp.int32, (lw, d), 0)
    o_col = jax.lax.broadcasted_iota(jnp.int32, (lw, d), 1)
    if transpose:
        G = (j_col % k == o_col).astype(jnp.float32)
    else:
        G = (j_col // k == o_col).astype(jnp.float32)
    # the G contraction SUMS f32 terms: split term (3 bf16 passes, f32
    # accumulate) ≡ HIGHEST quality at half the passes
    return exact_dot(G, term, (((1,), (0,)), ((), ())),
                     onehot_left=False)


def _kernel_stream(left_ref, right_ref, dst_ref, out_ref, *, chunk, m, k,
                   lw, rw, to_pad, tb, d, d_pad, transpose, bf16_reduce):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    sub = pl.ds(jax.lax.rem(i, jnp.int32(8)), 1)
    dst = dst_ref[sub, :]  # (1, chunk)
    left = left_ref[:]
    right = right_ref[:].astype(jnp.float32)
    prod = _expand_mv(left, right, m, k, lw, rw, transpose)
    if bf16_reduce:
        prod = prod.astype(jnp.bfloat16)
    pparts = value_parts(prod)
    for t0 in range(0, to_pad, tb):
        rows = jax.lax.broadcasted_iota(jnp.int32, (tb, chunk), 0) + t0
        oh = (rows == dst).astype(jnp.float32)
        contr = parts_dot(pparts, oh, (((1,), (0,)), ((), ())),
                          onehot_left=True)
        if d_pad != d:
            contr = jnp.concatenate(
                [contr, jnp.zeros((tb, d_pad - d), contr.dtype)], axis=1)
        cur = out_ref[pl.ds(t0, tb), :]
        out_ref[pl.ds(t0, tb), :] = cur + contr


@functools.partial(
    jax.jit, static_argnames=("chunk", "m", "k", "lw", "rw", "to_pad",
                              "tb", "n_chunks", "transpose",
                              "bf16_reduce"))
def _run_stream(left_pad, right_pad, dst, *, chunk, m, k, lw, rw, to_pad,
                tb, n_chunks, transpose, bf16_reduce):
    d = k if transpose else m
    d_pad = _round_up(d, 128)
    out = pl.pallas_call(
        functools.partial(
            _kernel_stream, chunk=chunk, m=m, k=k, lw=lw, rw=rw,
            to_pad=to_pad, tb=tb, d=d, d_pad=d_pad, transpose=transpose,
            bf16_reduce=bf16_reduce),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, lw), lambda i: (i, 0)),
            pl.BlockSpec((chunk, rw), lambda i: (i, 0)),
            pl.BlockSpec((8, chunk), lambda i: (i // 8, 0)),
        ],
        out_specs=pl.BlockSpec((to_pad, d_pad), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((to_pad, d_pad), jnp.float32),
    )(left_pad, right_pad, dst)
    return out[:, :d]


def plan_block_matvec(K: int, chunk: int = 1024) -> dict:
    k_pad = max(_round_up(K, chunk), chunk)
    return dict(K=K, k_pad=k_pad, chunk=chunk, n_chunks=k_pad // chunk)


def block_matvec_stream(left_pad, right_pad, plan, dst, m: int, k: int,
                        n_rows: int, transpose: bool = False,
                        bf16_reduce: bool = False):
    """Per-row block matvec (or transposed matvec) against a sequential
    right-hand STREAM + few-segment VMEM one-hot reduction; destination
    ids in ANY order (trash id = n_rows, out sliced off). Returns
    (n_rows, m|k) f32.

    ``bf16_reduce`` rounds each per-row product to bf16 before the
    destination reduce (f32 accumulation) — only for callers already in
    a bf16-stream policy."""
    to_pad = tpad(n_rows + 1)
    out = _run_stream(
        left_pad, right_pad, dst,
        chunk=plan["chunk"], m=m, k=k, lw=left_pad.shape[1],
        rw=right_pad.shape[1], to_pad=to_pad, tb=min(TB, to_pad),
        n_chunks=plan["n_chunks"], transpose=transpose,
        bf16_reduce=bf16_reduce)
    return out[:n_rows]
