"""Streaming (HBM-output) Pallas segmented sum — CPU coverage via
Pallas interpret mode (the real-kernel path is exercised on hardware by
tools/tpu_checks.py checks 2b/2c)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import graphite_tpu.ops.pallas.segsum_stream as ss_mod
from graphite_tpu.ops.pallas.segsum_stream import (
    plan_streaming_segsum,
    streaming_segment_sum,
)


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(
        ss_mod.pl, "pallas_call",
        functools.partial(jax.experimental.pallas.pallas_call,
                          interpret=True))


@pytest.mark.parametrize("k,ns,d,chunk", [
    (5_000, 500, 81, 512),     # multi-flush
    (700, 64, 81, 512),        # single chunk + epilogue only
    (4_096, 40, 36, 512),      # heavy multiplicity, small D
    (3_000, 2_900, 8, 256),    # near-unique segments (wide windows)
])
def test_matches_segment_sum(k, ns, d, chunk):
    rng = np.random.default_rng(k)
    seg = np.sort(rng.integers(0, ns, size=k)).astype(np.int32)
    vals = rng.standard_normal((k, d)).astype(np.float32)
    plan = plan_streaming_segsum(seg, ns, chunk=chunk)
    assert plan["feasible"]
    out = streaming_segment_sum(jnp.asarray(vals), plan)
    ref = jax.ops.segment_sum(jnp.asarray(vals), jnp.asarray(seg),
                              num_segments=ns)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_prepadded_rows_hit_trash_segment():
    """Callers may pass k_pad rows; pad-row content must not leak."""
    rng = np.random.default_rng(9)
    k, ns, d, chunk = 1_000, 100, 16, 256
    seg = np.sort(rng.integers(0, ns, size=k)).astype(np.int32)
    vals = rng.standard_normal((k, d)).astype(np.float32)
    plan = plan_streaming_segsum(seg, ns, chunk=chunk)
    garbage = np.full((plan["k_pad"] - k, d), 1e30, dtype=np.float32)
    vals_pad = jnp.asarray(np.concatenate([vals, garbage]))
    out = streaming_segment_sum(vals_pad, plan)
    ref = jax.ops.segment_sum(jnp.asarray(vals), jnp.asarray(seg),
                              num_segments=ns)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_epilogue_flushes_trailing_partial_block():
    """Regression: a = w_pad + 2f is generally not a multiple of f, so the
    epilogue must flush ceil(a/f) blocks — flooring left up to w_pad
    trailing segments uninitialized (advisor r2 high finding)."""
    rng = np.random.default_rng(0)
    k, ns, d, chunk = 22_997, 3_095, 81, 256
    seg = np.sort(rng.integers(0, ns, size=k)).astype(np.int32)
    vals = rng.standard_normal((k, d)).astype(np.float32)
    plan = plan_streaming_segsum(seg, ns, chunk=chunk)
    assert plan["feasible"]
    assert plan["a"] % plan["f"] != 0  # the shape the bug needs
    assert seg.max() == ns - 1  # live segments at the very tail
    out = streaming_segment_sum(jnp.asarray(vals), plan)
    ref = jax.ops.segment_sum(jnp.asarray(vals), jnp.asarray(seg),
                              num_segments=ns)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("m,kk,n,k,ns,chunk", [
    (9, 3, 9, 5_000, 500, 512),   # BAL camera-landmark Schur products
    (3, 3, 3, 1_200, 80, 256),    # small blocks
    (6, 3, 2, 900, 64, 256),      # rectangular
])
def test_fused_product_matches_flat_block_mm(m, kk, n, k, ns, chunk):
    """streaming_segment_product_sum == segment_sum(flat_block_mm_nt)."""
    from graphite_tpu.ops.blockfmt import flat_block_mm_nt
    from graphite_tpu.ops.pallas.segsum_stream import (
        streaming_segment_product_sum,
    )

    rng = np.random.default_rng(m * 1000 + k)
    seg = np.sort(rng.integers(0, ns, size=k)).astype(np.int32)
    left = rng.standard_normal((k, m * kk)).astype(np.float32)
    right = rng.standard_normal((k, n * kk)).astype(np.float32)
    plan = plan_streaming_segsum(seg, ns, chunk=chunk)
    assert plan["feasible"]
    pad = plan["k_pad"] - k
    # finite garbage: pad-row products (1e10^2 = 1e20) must land on the
    # trash segment and be sliced off; inf would NaN the one-hot matmul
    garbage_l = np.full((pad, m * kk), 1e10, dtype=np.float32)
    garbage_r = np.full((pad, n * kk), 1e10, dtype=np.float32)
    out = streaming_segment_product_sum(
        jnp.asarray(np.concatenate([left, garbage_l])),
        jnp.asarray(np.concatenate([right, garbage_r])),
        plan, m, kk, n)
    ref = jax.ops.segment_sum(
        flat_block_mm_nt(jnp.asarray(left), jnp.asarray(right), m, kk, n),
        jnp.asarray(seg), num_segments=ns)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_fused_product_width_padded_rows():
    """Factor rows padded to a fast-gather width: dead lanes must
    contribute exact zeros (expansion one-hot rows never match)."""
    from graphite_tpu.ops.blockfmt import flat_block_mm_nt
    from graphite_tpu.ops.pallas.segsum_stream import (
        streaming_segment_product_sum,
    )

    m = n = 9
    kk = 3
    k, ns, chunk = 3_000, 220, 512
    lw = rw = 81  # live width 27, padded to the fast-gather width
    rng = np.random.default_rng(5)
    seg = np.sort(rng.integers(0, ns, size=k)).astype(np.int32)
    left = rng.standard_normal((k, m * kk)).astype(np.float32)
    right = rng.standard_normal((k, n * kk)).astype(np.float32)
    plan = plan_streaming_segsum(seg, ns, chunk=chunk)
    assert plan["feasible"]

    def padw(a, w, rows):
        out = np.full((rows, w), 7.7, dtype=np.float32)  # poison lanes
        out[:a.shape[0], :a.shape[1]] = a
        return out

    out = streaming_segment_product_sum(
        jnp.asarray(padw(left, lw, plan["k_pad"])),
        jnp.asarray(padw(right, rw, plan["k_pad"])),
        plan, m, kk, n)
    ref = jax.ops.segment_sum(
        flat_block_mm_nt(jnp.asarray(left), jnp.asarray(right), m, kk, n),
        jnp.asarray(seg), num_segments=ns)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_fused_product_bf16_streams_f32_accumulate():
    """bf16 gathered streams (round-4 bandwidth lever): the kernel loads
    -> f32 and accumulates in f32, so with out_dtype=f32 the result must
    equal the f32 reference computed from the bf16-ROUNDED operands
    exactly (no further precision loss inside the kernel)."""
    from graphite_tpu.ops.blockfmt import flat_block_mm_nt
    from graphite_tpu.ops.pallas.segsum_stream import (
        streaming_segment_product_sum,
    )

    m = n = 9
    kk = 3
    k, ns, chunk = 4_000, 360, 512
    rng = np.random.default_rng(11)
    seg = np.sort(rng.integers(0, ns, size=k)).astype(np.int32)
    left16 = jnp.asarray(
        rng.standard_normal((k, m * kk)), jnp.bfloat16)
    right16 = jnp.asarray(
        rng.standard_normal((k, n * kk)), jnp.bfloat16)
    plan = plan_streaming_segsum(seg, ns, chunk=chunk)
    assert plan["feasible"]
    pad = plan["k_pad"] - k
    gl = jnp.full((pad, m * kk), 100.0, jnp.bfloat16)
    gr = jnp.full((pad, n * kk), 100.0, jnp.bfloat16)
    out = streaming_segment_product_sum(
        jnp.concatenate([left16, gl]), jnp.concatenate([right16, gr]),
        plan, m, kk, n, out_dtype=jnp.float32)
    assert out.dtype == jnp.float32
    ref = jax.ops.segment_sum(
        flat_block_mm_nt(left16.astype(jnp.float32),
                         right16.astype(jnp.float32), m, kk, n),
        jnp.asarray(seg), num_segments=ns)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_infeasible_plan_reports():
    seg = np.arange(100_000, dtype=np.int32)  # multiplicity 1
    plan = plan_streaming_segsum(seg, 100_000, chunk=2048, vmem_rows=64)
    assert not plan["feasible"]
