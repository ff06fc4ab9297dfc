"""Pallas TPU kernel: sorted segmented reduction with HBM-streamed output.

Companion to `segsum.py` (windowed one-hot MXU reduction) for outputs too
large to stay VMEM-resident (the Venice-Final-scale Schur product scatter:
~1.6M S blocks x 81 floats ≈ 0.5 GB). Same math per chunk — values arrive
destination-sorted, each CHUNK of rows touches a window of at most W
consecutive segments, reduced as ``onehot(CHUNK, W)^T @ vals(CHUNK, D)``
on the MXU — but the output lives in HBM and the kernel keeps only a
**rolling accumulator** of A = W_pad + 2F rows in VMEM:

- windows advance monotonically (dst-sorted input), so rows behind the
  current window base are final;
- the host plan precomputes, per grid step, how many F-row blocks to
  flush (`nflush`) and the accumulator's base row (`bases`);
- a flush DMAs acc[0:F] to out[base:base+F] (each output row is written
  to HBM exactly once — the minimum possible traffic), shifts the
  accumulator down by F and zeroes the vacated tail;
- epilogue grid steps (input-compute masked off) flush the remaining
  accumulator rows.

Reference parity: this is the TPU analog of the atomicAdd scatter of the
Schur triple-product kernels (reference ops/schur.hpp:117-188), restated
as dense matmul + sequential streaming instead of random-access atomics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .segmv import TB, exact_dot, parts_dot, value_parts


def _window_reduce(parts, seg_row, w0, w_pad, chunk, d, d_pad, acc_ref,
                   slot, tb: int = TB):
    """acc[slot + t] += sum_c [seg[c] - w0 == t] * val[c] — the windowed
    destination reduce, TB-BLOCKED so the (rows, chunk) one-hot temporary
    is bounded at (tb, chunk) for ANY window width (a near-1:1 segment
    map makes w_pad ~ chunk, and a full (w_pad, chunk) one-hot blows the
    16 MB scoped-VMEM limit at Venice-Final scale)."""
    for t0 in range(0, w_pad, tb):
        nrow = min(tb, w_pad - t0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (nrow, chunk), 0) + t0
        oh = (seg_row - w0 == rows).astype(jnp.bfloat16)
        contr = parts_dot(parts, oh, (((1,), (0,)), ((), ())),
                          onehot_left=True)
        if d_pad != d:
            contr = jnp.concatenate(
                [contr, jnp.zeros((nrow, d_pad - d), contr.dtype)],
                axis=1)
        cur = acc_ref[pl.ds(slot + t0, nrow), :]
        acc_ref[pl.ds(slot + t0, nrow), :] = cur + contr


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _seg_rows(seg_pad: np.ndarray, n_chunks: int, chunk: int) -> np.ndarray:
    """(k_pad,) ids -> (ceil8(n_chunks), chunk) chunk-row layout (pad rows
    repeat the last chunk; epilogue/pad steps never read them)."""
    rows = seg_pad.reshape(n_chunks, chunk).astype(np.int32)
    n8 = _round_up(max(n_chunks, 1), 8)
    if n8 != n_chunks:
        pad = np.repeat(rows[-1:], n8 - n_chunks, axis=0)
        rows = np.concatenate([rows, pad], axis=0)
    return rows


def plan_streaming_segsum(seg_sorted: np.ndarray, num_segments: int,
                          chunk: int = 2048, flush_mult: int = 16,
                          vmem_rows: int = 8192) -> dict:
    """Freeze-time plan: per-step window starts, flush counts, bases.

    The accumulator A = W_pad + 2F is capped at `vmem_rows` (~4 MB at 128
    f32 lanes) by shrinking the flush block F; when even F = W_pad does
    not fit (window nearly as wide as a chunk — low segment multiplicity,
    where a one-hot matmul is the wrong tool anyway) the plan is marked
    ``feasible=False`` and the caller should use XLA's segment_sum.
    """
    k = seg_sorted.shape[0]
    k_pad = max(_round_up(k, chunk), chunk)
    # padding rows target a trailing TRASH segment (index num_segments), so
    # callers may pass k_pad-length value buffers with arbitrary pad rows
    seg_pad = np.concatenate(
        [seg_sorted, np.full(k_pad - k, num_segments,
                             dtype=seg_sorted.dtype)]
    ).astype(np.int32)
    n_chunks = k_pad // chunk
    first = seg_pad[::chunk].astype(np.int64)
    last = seg_pad[chunk - 1::chunk].astype(np.int64)
    w0 = (first // 8) * 8  # sublane-aligned window base per chunk
    w_pad = _round_up(int((last - w0).max()) + 1, 8) if n_chunks else 8
    f_cap = ((vmem_rows - w_pad) // 2) // 8 * 8
    if f_cap < 8:
        return dict(feasible=False, w_pad=w_pad)
    f = min(_round_up(flush_mult * w_pad, 8), f_cap)
    a = w_pad + 2 * f

    # host flush schedule: before chunk i, flush enough F-blocks that its
    # whole window [w0, w0+W) fits in [base, base+A); flushed rows are
    # strictly below w0 (final, since windows advance monotonically)
    nflush = np.zeros(n_chunks, dtype=np.int32)
    bases = np.zeros(n_chunks, dtype=np.int32)
    base = 0
    for i in range(n_chunks):
        need = int(w0[i]) + w_pad - a - base
        kf = max(0, -(-need // f))
        base += kf * f
        assert base <= int(w0[i]), "flush schedule would drop live rows"
        nflush[i] = kf
        bases[i] = base - kf * f  # base BEFORE this step's flushes
    # epilogue: flush ALL remaining A rows — ceil(A/F) blocks, one per
    # step (A = w_pad + 2F is generally not a multiple of F; flooring
    # here would leave up to w_pad trailing live rows unwritten). The
    # final flush block may extend past base + A, so out_alloc must
    # cover base + n_extra*F rows.
    n_extra = -(-a // f)
    nflush = np.concatenate([nflush, np.ones(n_extra, dtype=np.int32)])
    bases = np.concatenate(
        [bases, (base + np.arange(n_extra, dtype=np.int32) * f)
         .astype(np.int32)]
    )
    w0_steps = np.concatenate([w0.astype(np.int32),
                               np.zeros(n_extra, dtype=np.int32)])
    out_alloc = base + n_extra * f
    return dict(
        feasible=True,
        k=k, k_pad=k_pad, chunk=chunk, n_chunks=n_chunks,
        n_steps=n_chunks + n_extra, w_pad=w_pad, f=f, a=a,
        out_alloc=out_alloc, num_segments=num_segments,
        starts=w0_steps, nflush=nflush, bases=bases,
        # (ceil8(n_chunks), chunk) NOT (k_pad, 1): a single-lane int32
        # column gets a T(8,128) HBM layout — 128x padding, ~925 MB per
        # 1.9M-row plan at Venice-Final scale (observed OOM). Chunk-row
        # layout is compact; rows padded to a sublane multiple because
        # Mosaic blocks must have 8-divisible second-minor dims.
        seg_pad_2d=_seg_rows(seg_pad, n_chunks, chunk),
    )


def _kernel(starts_ref, nflush_ref, bases_ref, vals_ref, seg_ref, out_ref,
            acc_ref, sem, *, chunk, w_pad, f, a, n_chunks, d, d_pad):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # ---- flushes scheduled before this step's compute ----
    nf = nflush_ref[i]
    base0 = bases_ref[i]

    def flush(kf, carry):
        copy = pltpu.make_async_copy(
            acc_ref.at[pl.ds(0, f), :],
            out_ref.at[pl.ds(base0 + kf * f, f), :],
            sem,
        )
        copy.start()
        copy.wait()
        # shift the accumulator down by F and zero the vacated tail
        acc_ref[pl.ds(0, a - f), :] = acc_ref[pl.ds(f, a - f), :]
        acc_ref[pl.ds(a - f, f), :] = jnp.zeros((f, d_pad), acc_ref.dtype)
        return carry

    jax.lax.fori_loop(0, nf, flush, 0)

    # ---- chunk compute (masked off on epilogue steps) ----
    @pl.when(i < n_chunks)
    def _():
        base = base0 + nf * f
        w0 = starts_ref[i]
        # seg ids live in LANES of this step's row of the (8, chunk)
        # block; build the transposed one-hot (w_pad, chunk) by
        # broadcasting against a sublane iota — no in-kernel
        # lane->sublane transpose
        seg_row = seg_ref[pl.ds(jax.lax.rem(i, jnp.int32(8)), 1), :]  # (1, chunk)
        # one-hot side is exactly bf16-representable -> split only the
        # value side (segmv.parts_dot): 3 single-pass bf16 dots ≈ HIGHEST
        # quality at half the MXU passes (1 pass for bf16 streams)
        slot = w0 - base  # sublane-aligned: w0 and base are 8-multiples
        _window_reduce(value_parts(vals_ref[:]), seg_row, w0, w_pad,
                       chunk, d, d_pad, acc_ref, slot)


@functools.partial(
    jax.jit, static_argnames=("chunk", "w_pad", "f", "a", "n_chunks",
                              "n_steps", "k_pad", "out_alloc",
                              "num_segments")
)
def _run(vals_pad, seg_pad, starts, nflush, bases, *, chunk, w_pad, f, a,
         n_chunks, n_steps, k_pad, out_alloc, num_segments):
    d = vals_pad.shape[1]
    d_pad = _round_up(d, 128)  # acc/out lanes: DMA slices must align
    last = n_chunks - 1

    out = pl.pallas_call(
        functools.partial(_kernel, chunk=chunk, w_pad=w_pad, f=f, a=a,
                          n_chunks=n_chunks, d=d, d_pad=d_pad),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((chunk, d),
                             lambda i, *s: (jnp.minimum(i, last), 0)),
                pl.BlockSpec((8, chunk),
                             lambda i, *s: (jnp.minimum(i, last) // 8, 0)),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((a, d_pad), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((out_alloc, d_pad), jnp.float32),
    )(starts, nflush, bases, vals_pad, seg_pad)
    return out[:num_segments, :d]


def plan_streaming_segsum_common(seg_slices, ns_list, chunk: int = 2048,
                                 flush_mult: int = 16,
                                 vmem_rows: int = 8192):
    """Per-slice streaming plans with COMMON kernel geometry.

    For SPMD execution (shard_map) every device runs the same program, so
    the pallas_call statics (chunk, w_pad, f, a, k_pad, n_steps,
    out_alloc) must be equal across devices while the flush schedules
    (starts/nflush/bases) and segment ids remain per-device runtime
    arrays. Returns (plans, geometry) where each plan's arrays share the
    geometry's shapes, or (None, None) if any slice is infeasible.

    seg_slices: list of destination-sorted LOCAL segment id arrays (one
    per device, already rebased to each device's first segment);
    ns_list[i] = number of live segments of slice i.
    """
    n = len(seg_slices)
    k_pad = max(max((s.shape[0] for s in seg_slices), default=0), chunk)
    k_pad = _round_up(k_pad, chunk)
    n_chunks = k_pad // chunk
    # common window: max over slices of the per-slice span requirement
    w_pad = 8
    padded = []
    for seg, ns in zip(seg_slices, ns_list):
        seg_p = np.concatenate(
            [seg, np.full(k_pad - seg.shape[0], ns, dtype=np.int64)]
        ).astype(np.int64)
        padded.append(seg_p)
        first = seg_p[::chunk]
        last = seg_p[chunk - 1::chunk]
        w0 = (first // 8) * 8
        w_pad = max(w_pad, _round_up(int((last - w0).max()) + 1, 8))
    f_cap = ((vmem_rows - w_pad) // 2) // 8 * 8
    if f_cap < 8:
        return None, None
    f = min(_round_up(flush_mult * w_pad, 8), f_cap)
    a = w_pad + 2 * f
    n_extra = -(-a // f)
    n_steps = n_chunks + n_extra

    plans = []
    out_alloc = 0
    for seg_p, ns in zip(padded, ns_list):
        first = seg_p[::chunk]
        w0 = ((first // 8) * 8).astype(np.int64)
        nflush = np.zeros(n_chunks, dtype=np.int32)
        bases = np.zeros(n_chunks, dtype=np.int32)
        base = 0
        for i in range(n_chunks):
            need = int(w0[i]) + w_pad - a - base
            kf = max(0, -(-need // f))
            base += kf * f
            assert base <= int(w0[i]), "flush schedule would drop live rows"
            nflush[i] = kf
            bases[i] = base - kf * f
        nflush = np.concatenate([nflush, np.ones(n_extra, dtype=np.int32)])
        bases = np.concatenate(
            [bases, (base + np.arange(n_extra, dtype=np.int32) * f)
             .astype(np.int32)])
        starts = np.concatenate([w0.astype(np.int32),
                                 np.zeros(n_extra, dtype=np.int32)])
        out_alloc = max(out_alloc, base + n_extra * f)
        plans.append(dict(
            feasible=True, k=int((seg_p < ns).sum()), k_pad=k_pad,
            chunk=chunk, n_chunks=n_chunks, n_steps=n_steps, w_pad=w_pad,
            f=f, a=a, num_segments=ns, starts=starts, nflush=nflush,
            bases=bases,
            seg_pad_2d=_seg_rows(seg_p.astype(np.int32), n_chunks, chunk),
        ))
    for p in plans:
        p["out_alloc"] = out_alloc
    geometry = dict(chunk=chunk, w_pad=w_pad, f=f, a=a, k_pad=k_pad,
                    n_chunks=n_chunks, n_steps=n_steps, out_alloc=out_alloc)
    return plans, geometry


def _expansion_onehots_slice(m: int, kdim: int, n: int, b: int,
                             lw: int | None = None, rw: int | None = None):
    """Expansion-one-hot contraction slice: P_b (lw, m*n) with
    P_b[a*k+b, a*n+dd] = 1 and Q_b (rw, m*n) with Q_b[dd*k+b, a*n+dd] = 1,
    so prod = sum_b (L @ P_b) * (R @ Q_b). Slicing keeps the kernel's
    VMEM temporaries at (chunk, m*n) instead of (chunk, k*m*n) — the
    difference between fitting and blowing the scoped-VMEM limit at
    Venice-Final scale.

    ``lw``/``rw`` >= m*k / n*k allow WIDTH-PADDED factor rows (padding a
    27-float row to a fast-gather width): rows past the live block never
    match the iota comparison, so the dead lanes contribute exact zeros
    with no in-kernel slicing."""
    d = m * n
    lw = m * kdim if lw is None else lw
    rw = n * kdim if rw is None else rw
    row_l = jax.lax.broadcasted_iota(jnp.int32, (lw, d), 0)
    row_r = jax.lax.broadcasted_iota(jnp.int32, (rw, d), 0)
    col_l = jax.lax.broadcasted_iota(jnp.int32, (lw, d), 1)
    col_r = jax.lax.broadcasted_iota(jnp.int32, (rw, d), 1)
    P = (row_l == (col_l // n) * kdim + b).astype(jnp.bfloat16)
    Q = (row_r == (col_r % n) * kdim + b).astype(jnp.bfloat16)
    return P, Q


def _kernel_prod(starts_ref, nflush_ref, bases_ref, left_ref, right_ref,
                 seg_ref, out_ref, acc_ref, sem, *, chunk, w_pad, f, a,
                 n_chunks, m, kdim, n, d_pad, lw, rw):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    nf = nflush_ref[i]
    base0 = bases_ref[i]

    def flush(kf, carry):
        copy = pltpu.make_async_copy(
            acc_ref.at[pl.ds(0, f), :],
            out_ref.at[pl.ds(base0 + kf * f, f), :],
            sem,
        )
        copy.start()
        copy.wait()
        acc_ref[pl.ds(0, a - f), :] = acc_ref[pl.ds(f, a - f), :]
        acc_ref[pl.ds(a - f, f), :] = jnp.zeros((f, d_pad), acc_ref.dtype)
        return carry

    jax.lax.fori_loop(0, nf, flush, 0)

    @pl.when(i < n_chunks)
    def _():
        base = base0 + nf * f
        w0 = starts_ref[i]
        seg_row = seg_ref[pl.ds(jax.lax.rem(i, jnp.int32(8)), 1), :]  # (1, chunk)
        d = m * n
        # keep streams in storage dtype: value_parts passes bf16 through
        # (1 MXU pass) and 3-way-splits f32 (3 passes ≈ HIGHEST quality)
        left = left_ref[:]
        right = right_ref[:]
        if n == 1:
            # block-MATVEC fast path (prod = A(m,k) @ x(k,)): the
            # per-slice loop below keeps kdim live (chunk, d) temporary
            # pairs on the Mosaic stack — at kdim=9/chunk=2048 that is
            # ~18 MB and blows the 16 MB scoped-VMEM limit (observed at
            # Venice-Final). Instead: ONE expansion matmul tiles x's k
            # lanes into each of A's m row-slots (T[b, a*k+b] = 1, pure
            # copies), an exact f32 elementwise multiply, then a k-wise
            # one-hot reduction (G[a*k+b, a] = 1, f32 MXU accumulate) —
            # two matmuls and bounded (chunk, lw) temporaries. Dead
            # lanes past m*k hold zeros in the width-padded left rows,
            # and j >= m*k gives j//k >= m, so neither expansion needs
            # an explicit mask.
            row_t = jax.lax.broadcasted_iota(jnp.int32, (rw, lw), 0)
            col_t = jax.lax.broadcasted_iota(jnp.int32, (rw, lw), 1)
            T = (row_t == col_t % kdim).astype(jnp.bfloat16)
            x_tiled = exact_dot(T, right, (((1,), (0,)), ((), ())),
                                onehot_left=False)
            row_g = jax.lax.broadcasted_iota(jnp.int32, (lw, d), 0)
            col_g = jax.lax.broadcasted_iota(jnp.int32, (lw, d), 1)
            G = (row_g // kdim == col_g).astype(jnp.bfloat16)
            prod = exact_dot(
                G, left.astype(jnp.float32) * x_tiled,
                (((1,), (0,)), ((), ())), onehot_left=False)
        else:
            prod = None
        # in-kernel flat block product A @ B^T via per-slice expansion
        # matmuls (bounded (chunk, d) temporaries); split the value
        # operands ONCE, reuse across all kdim slices
        if n > 1:
            lparts = value_parts(left)
            rparts = value_parts(right)
        for b in range(kdim if n > 1 else 0):
            P, Q = _expansion_onehots_slice(m, kdim, n, b, lw=lw, rw=rw)
            lexp = parts_dot(lparts, P, (((1,), (0,)), ((), ())),
                             onehot_left=False)
            rexp = parts_dot(rparts, Q, (((1,), (0,)), ((), ())),
                             onehot_left=False)
            term = lexp * rexp
            prod = term if prod is None else prod + term

        slot = w0 - base
        _window_reduce(value_parts(prod), seg_row, w0, w_pad, chunk,
                       d, d_pad, acc_ref, slot)


@functools.partial(
    jax.jit, static_argnames=("chunk", "w_pad", "f", "a", "n_chunks",
                              "n_steps", "k_pad", "out_alloc",
                              "num_segments", "m", "kdim", "n", "lw", "rw")
)
def _run_prod(left_pad, right_pad, seg_pad, starts, nflush, bases, *, chunk,
              w_pad, f, a, n_chunks, n_steps, k_pad, out_alloc,
              num_segments, m, kdim, n, lw, rw):
    d = m * n
    d_pad = _round_up(d, 128)
    last = n_chunks - 1

    out = pl.pallas_call(
        functools.partial(_kernel_prod, chunk=chunk, w_pad=w_pad, f=f, a=a,
                          n_chunks=n_chunks, m=m, kdim=kdim, n=n,
                          d_pad=d_pad, lw=lw, rw=rw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((chunk, lw),
                             lambda i, *s: (jnp.minimum(i, last), 0)),
                pl.BlockSpec((chunk, rw),
                             lambda i, *s: (jnp.minimum(i, last), 0)),
                pl.BlockSpec((8, chunk),
                             lambda i, *s: (jnp.minimum(i, last) // 8, 0)),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((a, d_pad), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((out_alloc, d_pad), jnp.float32),
    )(starts, nflush, bases, left_pad, right_pad, seg_pad)
    return out[:num_segments, :d]


def streaming_segment_product_sum(left: jax.Array, right: jax.Array,
                                  plan: dict, m: int, k: int, n: int,
                                  seg_pad=None, starts=None, nflush=None,
                                  bases=None, out_dtype=None) -> jax.Array:
    """Fused flat-block-product + destination-sorted segmented reduction.

    ``left`` (k_pad, m*k) and ``right`` (k_pad, n*k) are the destination-
    sorted, pre-gathered factor rows; the kernel computes
    ``prod = A @ B^T`` per row (flat (m*k)x(n*k) -> m*n) on the MXU *inside*
    the streaming pass, so the (K, m*n) product buffer never exists in HBM
    (VERDICT r2 #1: deletes both ~5.5 GB passes of the scan_map ->
    streaming-scatter handoff at Venice-Final scale). Same rolling
    accumulator / flush plan as `streaming_segment_sum`.

    Reference parity: the fused form of the Schur triple-product +
    atomicAdd scatter kernels (ops/schur.hpp:117-188).
    """
    k_pad = plan["k_pad"]
    assert left.shape[0] == k_pad and right.shape[0] == k_pad, (
        "pass k_pad-padded gathered rows (pad rows -> trash segment)")
    lw, rw = left.shape[1], right.shape[1]
    assert lw >= m * k and rw >= n * k, "rows narrower than the block"
    if seg_pad is None:
        seg_pad = jnp.asarray(plan["seg_pad_2d"])
    if starts is None:
        starts = jnp.asarray(plan["starts"])
    if nflush is None:
        nflush = jnp.asarray(plan["nflush"])
    if bases is None:
        bases = jnp.asarray(plan["bases"])
    # inputs may be low-precision STREAMS (bf16 gathered copies — pure
    # bandwidth savings); the kernel loads->f32 and accumulates in f32, so
    # out_dtype (default: the input dtype) controls only the final cast
    return _run_prod(
        left, right, seg_pad, starts, nflush, bases,
        chunk=plan["chunk"], w_pad=plan["w_pad"], f=plan["f"], a=plan["a"],
        n_chunks=plan["n_chunks"], n_steps=plan["n_steps"],
        k_pad=k_pad, out_alloc=plan["out_alloc"],
        num_segments=plan["num_segments"], m=m, kdim=k, n=n, lw=lw, rw=rw,
    ).astype(out_dtype or left.dtype)


def _kernel_prod_rtbl(starts_ref, nflush_ref, bases_ref, wblk_ref,
                      left_ref, rt0_ref, rt1_ref, rid_ref, seg_ref,
                      out_ref, acc_ref, sem, *, chunk, w_pad, f, a,
                      n_chunks, m, kdim, n, d_pad, lw, wbp, dw, nslot):
    """`_kernel_prod` with the RIGHT operand served from a rolling
    two-block window of the slot-packed, destination-major-sorted right
    row table instead of a pre-gathered (k_pad, rw) stream.

    The triple-product pair list is dst-sorted by S code
    (col_major * n_pose + row), so the right operand's source rows —
    the Hpl-bearing blocks of the MAJOR pose — advance monotonically
    through a col-major-sorted table; each chunk's ids fit a 2-block
    window planned on the host (same rolling-window trick as the wtbl
    b_schur kernel). This deletes one of the two ~K-row XLA gathers
    (~11.4 ns/row dispatch-bound at any width) that dominate
    schur_values at Venice-Final scale."""
    from .pcg_mf import _gather_v

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    nf = nflush_ref[i]
    base0 = bases_ref[i]

    def flush(kf, carry):
        copy = pltpu.make_async_copy(
            acc_ref.at[pl.ds(0, f), :],
            out_ref.at[pl.ds(base0 + kf * f, f), :],
            sem,
        )
        copy.start()
        copy.wait()
        acc_ref[pl.ds(0, a - f), :] = acc_ref[pl.ds(f, a - f), :]
        acc_ref[pl.ds(a - f, f), :] = jnp.zeros((f, d_pad), acc_ref.dtype)
        return carry

    jax.lax.fori_loop(0, nf, flush, 0)

    @pl.when(i < n_chunks)
    def _():
        base = base0 + nf * f
        w0 = starts_ref[i]
        sub = pl.ds(jax.lax.rem(i, jnp.int32(8)), 1)
        seg_row = seg_ref[sub, :]  # (1, chunk)
        rid = rid_ref[sub, :]
        d = m * n
        # window-local right rows: ids outside [0, 2*wbp*nslot) (pad
        # rows) match no one-hot row -> zero right -> contribution
        # killed by the trash-segment window reduce anyway
        rloc = rid - wblk_ref[i] * jnp.int32(wbp * nslot)
        rtab = jnp.concatenate([rt0_ref[:], rt1_ref[:]], axis=0)
        right = _gather_v(rloc, rtab, 2 * wbp, chunk, dw, nslot)
        # exact copy of the table values -> cast back is lossless and
        # keeps bf16 streams on 1-pass dots
        right = right.astype(rtab.dtype)
        left = left_ref[:]
        lparts = value_parts(left)
        rparts = value_parts(right)
        prod = None
        for b in range(kdim):
            P, Q = _expansion_onehots_slice(m, kdim, n, b, lw=lw, rw=dw)
            lexp = parts_dot(lparts, P, (((1,), (0,)), ((), ())),
                             onehot_left=False)
            rexp = parts_dot(rparts, Q, (((1,), (0,)), ((), ())),
                             onehot_left=False)
            term = lexp * rexp
            prod = term if prod is None else prod + term

        slot = w0 - base
        _window_reduce(value_parts(prod), seg_row, w0, w_pad, chunk,
                       d, d_pad, acc_ref, slot)


@functools.partial(
    jax.jit, static_argnames=("chunk", "w_pad", "f", "a", "n_chunks",
                              "n_steps", "k_pad", "out_alloc",
                              "num_segments", "m", "kdim", "n", "lw",
                              "wbp", "dw", "nslot")
)
def _run_prod_rtbl(left_pad, rtab_p, seg_pad, rid, starts, nflush, bases,
                   wblk, *, chunk, w_pad, f, a, n_chunks, n_steps, k_pad,
                   out_alloc, num_segments, m, kdim, n, lw, wbp, dw,
                   nslot):
    d = m * n
    d_pad = _round_up(d, 128)
    last = n_chunks - 1

    out = pl.pallas_call(
        functools.partial(_kernel_prod_rtbl, chunk=chunk, w_pad=w_pad,
                          f=f, a=a, n_chunks=n_chunks, m=m, kdim=kdim,
                          n=n, d_pad=d_pad, lw=lw, wbp=wbp, dw=dw,
                          nslot=nslot),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((chunk, lw),
                             lambda i, *s: (jnp.minimum(i, last), 0)),
                pl.BlockSpec((wbp, 128),
                             lambda i, *s: (s[3][jnp.minimum(i, last)], 0)),
                pl.BlockSpec((wbp, 128),
                             lambda i, *s: (s[3][jnp.minimum(i, last)] + 1,
                                            0)),
                pl.BlockSpec((8, chunk),
                             lambda i, *s: (jnp.minimum(i, last) // 8, 0)),
                pl.BlockSpec((8, chunk),
                             lambda i, *s: (jnp.minimum(i, last) // 8, 0)),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((a, d_pad), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((out_alloc, d_pad), jnp.float32),
    )(starts, nflush, bases, wblk, left_pad, rtab_p, rtab_p, rid, seg_pad)
    return out[:num_segments, :d]


def streaming_segment_product_sum_rtbl(left, rtab_packed, plan, m: int,
                                       k: int, n: int, seg_pad, rid,
                                       starts, nflush, bases, wblk,
                                       wbp: int, out_dtype=None):
    """Fused triple-product streaming reduction with the RIGHT operand
    windowed from a slot-packed dst-major row table (see
    `_kernel_prod_rtbl`). ``left`` is the pre-gathered (k_pad, lw)
    stream; ``rtab_packed`` the (rows/nslot, 128) packed right table;
    ``rid``/``wblk`` the host-planned window ids per chunk.

    Reference parity: the same Schur triple-product + atomicAdd scatter
    (ops/schur.hpp:117-188) as `streaming_segment_product_sum`, minus
    one K-row gather."""
    from .segmv import slot_geom

    k_pad = plan["k_pad"]
    assert left.shape[0] == k_pad, "pass k_pad-padded gathered left rows"
    dw, nslot = slot_geom(n * k)
    return _run_prod_rtbl(
        left, rtab_packed, seg_pad, rid, starts, nflush, bases, wblk,
        chunk=plan["chunk"], w_pad=plan["w_pad"], f=plan["f"],
        a=plan["a"], n_chunks=plan["n_chunks"], n_steps=plan["n_steps"],
        k_pad=k_pad, out_alloc=plan["out_alloc"],
        num_segments=plan["num_segments"], m=m, kdim=k, n=n,
        lw=left.shape[1], wbp=wbp, dw=dw, nslot=nslot,
    ).astype(out_dtype or left.dtype)


def _kernel_mv_tbl(starts_ref, nflush_ref, bases_ref, left_ref, xtab_ref,
                   idx_ref, seg_ref, out_ref, acc_ref, sem, *, chunk,
                   w_pad, f, a, n_chunks, m, kdim, d, d_pad, lw, xw,
                   npx, nslot, transpose):
    from .segmv import _expand_mv, packed_gather

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    nf = nflush_ref[i]
    base0 = bases_ref[i]

    def flush(kf, carry):
        copy = pltpu.make_async_copy(
            acc_ref.at[pl.ds(0, f), :],
            out_ref.at[pl.ds(base0 + kf * f, f), :],
            sem,
        )
        copy.start()
        copy.wait()
        acc_ref[pl.ds(0, a - f), :] = acc_ref[pl.ds(f, a - f), :]
        acc_ref[pl.ds(a - f, f), :] = jnp.zeros((f, d_pad), acc_ref.dtype)
        return carry

    jax.lax.fori_loop(0, nf, flush, 0)

    @pl.when(i < n_chunks)
    def _():
        base = base0 + nf * f
        w0 = starts_ref[i]
        sub = pl.ds(jax.lax.rem(i, jnp.int32(8)), 1)
        seg_row = seg_ref[sub, :]  # (1, chunk)
        idx_row = idx_ref[sub, :]
        # in-kernel x gather from the slot-PACKED VMEM table — replaces
        # the per-matvec XLA row gather (row-bound at ~11.4 ns/row,
        # tools/r4_bf16_probe.py); packing keeps all 128 one-hot output
        # lanes live (segmv.packed_gather)
        right = packed_gather(idx_row, xtab_ref, npx, chunk, xw, nslot)
        left = left_ref[:]
        prod = _expand_mv(left, right.astype(xtab_ref.dtype), m, kdim,
                          lw, xw, transpose)
        slot = w0 - base
        _window_reduce(value_parts(prod), seg_row, w0, w_pad, chunk,
                       d, d_pad, acc_ref, slot)


@functools.partial(
    jax.jit, static_argnames=("chunk", "w_pad", "f", "a", "n_chunks",
                              "n_steps", "k_pad", "out_alloc",
                              "num_segments", "m", "kdim", "lw", "xw",
                              "npx", "nslot", "transpose"))
def _run_mv_tbl(left_pad, xtab, idx_pad, seg_pad, starts, nflush, bases,
                *, chunk, w_pad, f, a, n_chunks, n_steps, k_pad,
                out_alloc, num_segments, m, kdim, lw, xw, npx, nslot,
                transpose):
    d = kdim if transpose else m
    d_pad = _round_up(d, 128)
    last = n_chunks - 1

    out = pl.pallas_call(
        functools.partial(_kernel_mv_tbl, chunk=chunk, w_pad=w_pad, f=f,
                          a=a, n_chunks=n_chunks, m=m, kdim=kdim, d=d,
                          d_pad=d_pad, lw=lw, xw=xw, npx=npx,
                          nslot=nslot, transpose=transpose),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((chunk, lw),
                             lambda i, *s: (jnp.minimum(i, last), 0)),
                pl.BlockSpec((npx, nslot * xw), lambda i, *s: (0, 0)),
                pl.BlockSpec((8, chunk),
                             lambda i, *s: (jnp.minimum(i, last) // 8, 0)),
                pl.BlockSpec((8, chunk),
                             lambda i, *s: (jnp.minimum(i, last) // 8, 0)),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((a, d_pad), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((out_alloc, d_pad), jnp.float32),
    )(starts, nflush, bases, left_pad, xtab, idx_pad, seg_pad)
    return out[:num_segments, :d]


def streaming_matvec_tbl(left: jax.Array, xtab: jax.Array, idx_pad,
                         plan: dict, m: int, k: int,
                         transpose: bool = False, seg_pad=None,
                         starts=None, nflush=None, bases=None
                         ) -> jax.Array:
    """Destination-sorted streaming block matvec with IN-KERNEL x gather.

    ``left`` (k_pad, >= m*k) destination-sorted flat blocks (lanes past
    m*k may hold anything for the forward direction; the transposed
    direction relies on the x TABLE's dead lanes being zero, not on
    left's). ``xtab`` (tx_pad, xw) is the full x row table, VMEM-resident
    in every grid step, with tx_pad a multiple of segmv.TB and all lanes
    >= the live dim zeroed — pad-row gathers and masked rows are pointed
    at a zero row; it is slot-PACKED here (segmv.pack_rows) so the
    in-kernel gather runs with full one-hot output lanes. ``idx_pad``:
    (ceil8(n_chunks), chunk) packed int32 x row ids
    (segmv.pack_chunk_ids). transpose=False computes y[seg] += A x;
    transpose=True computes y[seg] += A^T x.

    Replaces: the per-matvec XLA x-row gathers AND (for the transposed
    direction) the per-solve lane-transposed S copy of the r3 design.
    Reference: the S block matvec of schur.hpp:307-393.
    """
    from .segmv import pack_rows, slot_geom

    k_pad = plan["k_pad"]
    assert left.shape[0] == k_pad, "pass k_pad-padded left rows"
    if seg_pad is None:
        seg_pad = jnp.asarray(plan["seg_pad_2d"])
    if starts is None:
        starts = jnp.asarray(plan["starts"])
    if nflush is None:
        nflush = jnp.asarray(plan["nflush"])
    if bases is None:
        bases = jnp.asarray(plan["bases"])
    xd = m if transpose else k  # live x row dim
    dw, nslot = slot_geom(xd)
    if xtab.shape[1] > dw:  # lanes >= live dim are zero: slicing is safe
        xtab = xtab[:, :dw]
    elif xtab.shape[1] < dw:
        xtab = jnp.concatenate(
            [xtab, jnp.zeros((xtab.shape[0], dw - xtab.shape[1]),
                             xtab.dtype)], axis=1)
    return _run_mv_tbl(
        left, pack_rows(xtab, nslot), idx_pad, seg_pad, starts, nflush,
        bases,
        chunk=plan["chunk"], w_pad=plan["w_pad"], f=plan["f"], a=plan["a"],
        n_chunks=plan["n_chunks"], n_steps=plan["n_steps"], k_pad=k_pad,
        out_alloc=plan["out_alloc"], num_segments=plan["num_segments"],
        m=m, kdim=k, lw=left.shape[1], xw=dw,
        npx=xtab.shape[0] // nslot, nslot=nslot, transpose=transpose)


def streaming_segment_sum(values: jax.Array, plan: dict, seg_pad=None,
                          starts=None, nflush=None, bases=None) -> jax.Array:
    """(K, D) destination-sorted values -> (num_segments, D), output
    streamed to HBM (no VMEM-resident output size limit)."""
    k, k_pad, chunk = plan["k"], plan["k_pad"], plan["chunk"]
    d = values.shape[1]
    if values.shape[0] == k_pad:
        # caller already provides k_pad rows (pad rows land on the trash
        # segment, so their content is irrelevant) — no copy
        vals_pad = values
    else:
        vals_pad = jnp.zeros((k_pad, d), dtype=values.dtype)
        vals_pad = jax.lax.dynamic_update_slice(vals_pad, values, (0, 0))
    if seg_pad is None:
        seg_pad = jnp.asarray(plan["seg_pad_2d"])
    if starts is None:
        starts = jnp.asarray(plan["starts"])
    if nflush is None:
        nflush = jnp.asarray(plan["nflush"])
    if bases is None:
        bases = jnp.asarray(plan["bases"])
    return _run(
        vals_pad, seg_pad, starts, nflush, bases,
        chunk=chunk, w_pad=plan["w_pad"], f=plan["f"], a=plan["a"],
        n_chunks=plan["n_chunks"], n_steps=plan["n_steps"],
        k_pad=k_pad, out_alloc=plan["out_alloc"],
        num_segments=plan["num_segments"],
    ).astype(values.dtype)
