"""Round-4 matvec kernels: in-kernel one-hot x gather (streaming_matvec_tbl)
and the few-segment VMEM block-matvec reduction (block_matvec_stream).
CPU coverage via Pallas interpret mode."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import graphite_tpu.ops.pallas.segmv as segmv_mod
import graphite_tpu.ops.pallas.segsum_stream as ss_mod
from graphite_tpu.ops.blockfmt import flat_block_mv, flat_block_mv_t
from graphite_tpu.ops.pallas.segmv import (
    block_matvec_stream,
    pack_chunk_ids,
    plan_block_matvec,
    tpad,
)
from graphite_tpu.ops.pallas.segsum_stream import (
    plan_streaming_segsum,
    streaming_matvec_tbl,
)


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    interp = functools.partial(jax.experimental.pallas.pallas_call,
                               interpret=True)
    monkeypatch.setattr(ss_mod.pl, "pallas_call", interp)
    monkeypatch.setattr(segmv_mod.pl, "pallas_call", interp)


def _xtab(x_rows, xw, tb=segmv_mod.TB):
    n, d = x_rows.shape
    out = np.zeros((tpad(n + 1, tb), xw), np.float32)
    out[:n, :d] = x_rows
    return jnp.asarray(out)


@pytest.mark.parametrize("m,kk,transpose", [
    (9, 9, False),   # S matvec forward (square pose blocks)
    (9, 9, True),    # S matvec transposed direction
    (9, 3, True),    # backsub: Hpl^T dx_p
    (6, 2, False),   # rectangular
])
def test_streaming_matvec_tbl(m, kk, transpose):
    rng = np.random.default_rng(m * 10 + kk + transpose)
    K, ns, n_x, chunk = 3_000, 250, 137, 512
    seg = np.sort(rng.integers(0, ns, size=K)).astype(np.int32)
    left = rng.standard_normal((K, m * kk)).astype(np.float32)
    x_rows = rng.standard_normal((n_x, m if transpose else kk)).astype(
        np.float32)
    idx = rng.integers(0, n_x, size=K).astype(np.int32)
    # some rows masked: idx -> the zero row (n_x) must contribute nothing
    masked = rng.random(K) < 0.1
    idx_eff = np.where(masked, n_x, idx).astype(np.int32)

    plan = plan_streaming_segsum(seg, ns, chunk=chunk)
    assert plan["feasible"]
    k_pad = plan["k_pad"]
    left_pad = np.full((k_pad, m * kk), 1e10, np.float32)  # garbage pad
    left_pad[:K] = left
    xw = max(m, kk) + 3  # deliberately over-wide; dead lanes zero
    xtab = _xtab(x_rows, xw)
    idx_pack = pack_chunk_ids(idx_eff, k_pad, chunk, fill=n_x)

    out = streaming_matvec_tbl(
        jnp.asarray(left_pad), xtab, jnp.asarray(idx_pack), plan, m, kk,
        transpose=transpose)

    xg = np.where(masked[:, None], 0.0, x_rows[idx])
    if transpose:
        y = flat_block_mv_t(jnp.asarray(left), jnp.asarray(xg), m, kk,
                            acc_dtype=jnp.float32)
    else:
        y = flat_block_mv(jnp.asarray(left), jnp.asarray(xg), m, kk,
                          acc_dtype=jnp.float32)
    ref = jax.ops.segment_sum(y, jnp.asarray(seg), num_segments=ns)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_streaming_matvec_tbl_bf16_stream():
    """bf16 left stream + bf16 x table: result must match the f32
    reference computed from the bf16-rounded operands closely (one-hot
    copies exact; f32 accumulation)."""
    rng = np.random.default_rng(7)
    m = kk = 9
    K, ns, n_x, chunk = 2_500, 200, 97, 512
    seg = np.sort(rng.integers(0, ns, size=K)).astype(np.int32)
    left16 = jnp.asarray(rng.standard_normal((K, m * kk)), jnp.bfloat16)
    x16 = jnp.asarray(rng.standard_normal((n_x, kk)), jnp.bfloat16)
    idx = rng.integers(0, n_x, size=K).astype(np.int32)
    plan = plan_streaming_segsum(seg, ns, chunk=chunk)
    k_pad = plan["k_pad"]
    left_pad = jnp.zeros((k_pad, m * kk), jnp.bfloat16)
    left_pad = jax.lax.dynamic_update_slice(left_pad, left16, (0, 0))
    xtab = jnp.zeros((tpad(n_x + 1), 16), jnp.bfloat16)
    xtab = jax.lax.dynamic_update_slice(xtab, x16, (0, 0))
    idx_pack = pack_chunk_ids(idx, k_pad, chunk, fill=n_x)

    out = streaming_matvec_tbl(left_pad, xtab, jnp.asarray(idx_pack),
                               plan, m, kk, transpose=False)
    y = flat_block_mv(left16.astype(jnp.float32),
                      x16.astype(jnp.float32)[jnp.asarray(idx)], m, kk,
                      acc_dtype=jnp.float32)
    ref = jax.ops.segment_sum(y, jnp.asarray(seg), num_segments=ns)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("m,kk,transpose,bf16_reduce", [
    (9, 3, False, False),  # b_schur: Hpl @ w
    (9, 3, False, True),
    (9, 3, True, False),
])
def test_block_matvec_stream_unsorted_dst(m, kk, transpose, bf16_reduce):
    """Few-segment VMEM reduction: destinations in arbitrary order."""
    rng = np.random.default_rng(3 + m + transpose)
    K, n_rows, chunk = 3_100, 300, 512
    dst = rng.integers(0, n_rows, size=K).astype(np.int32)  # UNSORTED
    left = rng.standard_normal((K, m * kk)).astype(np.float32)
    xdim = m if transpose else kk
    right = rng.standard_normal((K, xdim)).astype(np.float32)

    plan = plan_block_matvec(K, chunk=chunk)
    k_pad = plan["k_pad"]
    lp = np.zeros((k_pad, m * kk), np.float32)
    lp[:K] = left
    rp = np.zeros((k_pad, xdim + 2), np.float32)  # over-wide, zero lanes
    rp[:K, :xdim] = right
    dst_pack = pack_chunk_ids(dst, k_pad, chunk, fill=n_rows)

    out = block_matvec_stream(
        jnp.asarray(lp), jnp.asarray(rp), plan, jnp.asarray(dst_pack),
        m, kk, n_rows, transpose=transpose, bf16_reduce=bf16_reduce)
    if transpose:
        y = flat_block_mv_t(jnp.asarray(left), jnp.asarray(right), m, kk,
                            acc_dtype=jnp.float32)
    else:
        y = flat_block_mv(jnp.asarray(left), jnp.asarray(right), m, kk,
                          acc_dtype=jnp.float32)
    ref = jax.ops.segment_sum(y, jnp.asarray(dst), num_segments=n_rows)
    tol = 2e-2 if bf16_reduce else 1e-4
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=tol, atol=tol)


@pytest.mark.parametrize("m,kk", [(9, 9), (6, 9)])
def test_matvec_sym_stream(m, kk):
    """Symmetric single-pass matvec: one stored-triangle read computes
    y_r[rid] += A x_c[cid] (all blocks) and y_c[cid] += A^T x_r[rid]
    (off-diagonal), destinations in ANY order."""
    from graphite_tpu.ops.pallas.segmv import matvec_sym_stream, slot_geom

    rng = np.random.default_rng(11 + m)
    K, n_r, n_c, chunk = 3_000, 210, 180, 512
    rid = rng.integers(0, n_r, size=K).astype(np.int32)  # UNSORTED
    cid = rng.integers(0, n_c, size=K).astype(np.int32)
    # a sprinkle of "diagonal" blocks (same vertex) when square
    diag = (rng.random(K) < 0.15) if m == kk else np.zeros(K, bool)
    left = rng.standard_normal((K, m * kk)).astype(np.float32)
    xc_rows = rng.standard_normal((n_c, kk)).astype(np.float32)
    xr_rows = rng.standard_normal((n_r, m)).astype(np.float32)

    plan = plan_block_matvec(K, chunk=chunk)
    k_pad = plan["k_pad"]
    lp = np.full((k_pad, m * kk), 1e10, np.float32)  # garbage pad rows
    lp[:K] = left
    xw = slot_geom(max(m, kk))[0]  # slot width; dead lanes zero
    xc_tab = _xtab(xc_rows, xw)
    xr_tab = _xtab(xr_rows, xw)
    rxi = np.where(diag, n_r, rid).astype(np.int32)
    cid_p = pack_chunk_ids(cid, k_pad, chunk, fill=n_c)
    rid_p = pack_chunk_ids(rid, k_pad, chunk, fill=n_r)
    rxi_p = pack_chunk_ids(rxi, k_pad, chunk, fill=n_r)

    yr, yc = matvec_sym_stream(
        jnp.asarray(lp), xc_tab, xr_tab, jnp.asarray(cid_p),
        jnp.asarray(rid_p), jnp.asarray(rxi_p), plan, m, kk, n_r, n_c)

    pf = flat_block_mv(jnp.asarray(left), jnp.asarray(xc_rows[cid]),
                       m, kk, acc_dtype=jnp.float32)
    yr_ref = jax.ops.segment_sum(pf, jnp.asarray(rid), num_segments=n_r)
    xg = np.where(diag[:, None], 0.0, xr_rows[rid])
    pt = flat_block_mv_t(jnp.asarray(left), jnp.asarray(xg), m, kk,
                         acc_dtype=jnp.float32)
    yc_ref = jax.ops.segment_sum(pt, jnp.asarray(cid), num_segments=n_c)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yr_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(yc), np.asarray(yc_ref),
                               rtol=1e-4, atol=1e-4)
