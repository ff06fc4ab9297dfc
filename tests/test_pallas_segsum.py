"""Pallas windowed-one-hot segmented reduction: plan logic + kernel-vs-XLA
agreement in interpret mode (CPU-runnable, mirroring the streaming
variant's fixture in test_segsum_stream.py); the real-kernel path is also
exercised on hardware by the benchmark and tools/tpu_checks.py."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import graphite_tpu.ops.pallas.segsum as segsum_mod
from graphite_tpu.ops.pallas.segsum import plan_sorted_segsum


@pytest.fixture
def interpret_mode(monkeypatch):
    monkeypatch.setattr(
        segsum_mod.pl, "pallas_call",
        functools.partial(jax.experimental.pallas.pallas_call,
                          interpret=True))
    # the jitted _run caches a trace of the real pallas_call; drop it
    segsum_mod._run.clear_cache()
    yield
    segsum_mod._run.clear_cache()


def test_plan_windows_cover_chunks():
    rng = np.random.default_rng(0)
    for k, ns, chunk in [(1000, 37, 128), (5000, 513, 512), (130, 5, 256)]:
        seg = np.sort(rng.integers(0, ns, k)).astype(np.int32)
        plan = plan_sorted_segsum(seg, ns, chunk=chunk)
        assert plan["k_pad"] % chunk == 0
        n8 = -(-plan["n_chunks"] // 8) * 8
        assert plan["seg_pad_2d"].shape == (n8, chunk)
        # every chunk's aligned window must cover all its segments
        for c in range(plan["n_chunks"]):
            rows = plan["seg_pad_2d"][c]
            w0 = (plan["starts"][c] // 8) * 8
            assert rows.min() >= w0
            assert rows.max() < w0 + plan["window"]
            assert w0 + plan["window"] <= plan["out_pad"]


def test_plan_padding_targets_last_segment():
    seg = np.asarray([0, 0, 1, 2], dtype=np.int32)
    plan = plan_sorted_segsum(seg, 3, chunk=8)
    assert np.all(plan["seg_pad_2d"][0, 4:] == 2)


@pytest.mark.parametrize("k,ns,d,chunk", [
    (4096, 100, 81, 512),   # the Schur product-scatter shape
    (1000, 37, 16, 128),    # window smaller than a sublane group
    (130, 5, 8, 256),       # single chunk
])
def test_kernel_matches_xla_segment_sum(interpret_mode, k, ns, d, chunk):
    from graphite_tpu.ops.pallas.segsum import sorted_segment_sum

    rng = np.random.default_rng(1)
    seg = np.sort(rng.integers(0, ns, k)).astype(np.int32)
    vals = jnp.asarray(rng.normal(size=(k, d)), jnp.float32)
    plan = plan_sorted_segsum(seg, ns, chunk=chunk)
    out = sorted_segment_sum(vals, plan)
    ref = jax.ops.segment_sum(vals, jnp.asarray(seg), num_segments=ns)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-6,
                               atol=1e-4)
