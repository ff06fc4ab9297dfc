"""Pallas windowed-one-hot segmented reduction: plan logic + (when a TPU is
reachable) kernel-vs-XLA agreement. On the CPU test backend only the plan
and the fallback path are exercised — the TPU path is covered by the
end-to-end benchmark and the Schur oracle suite run on hardware."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graphite_tpu.ops.pallas.segsum import plan_sorted_segsum


def test_plan_windows_cover_chunks():
    rng = np.random.default_rng(0)
    for k, ns, chunk in [(1000, 37, 128), (5000, 513, 512), (130, 5, 256)]:
        seg = np.sort(rng.integers(0, ns, k)).astype(np.int32)
        plan = plan_sorted_segsum(seg, ns, chunk=chunk)
        assert plan["k_pad"] % chunk == 0
        assert plan["seg_pad_2d"].shape == (plan["k_pad"], 1)
        # every chunk's aligned window must cover all its segments
        for c in range(plan["n_chunks"]):
            rows = plan["seg_pad_2d"][c * chunk:(c + 1) * chunk, 0]
            w0 = (plan["starts"][c] // 8) * 8
            assert rows.min() >= w0
            assert rows.max() < w0 + plan["window"]
            assert w0 + plan["window"] <= plan["out_pad"]


def test_plan_padding_targets_last_segment():
    seg = np.asarray([0, 0, 1, 2], dtype=np.int32)
    plan = plan_sorted_segsum(seg, 3, chunk=8)
    assert np.all(plan["seg_pad_2d"][4:, 0] == 2)


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="Pallas TPU kernel needs a TPU backend")
def test_kernel_matches_xla_segment_sum():
    from graphite_tpu.ops.pallas.segsum import sorted_segment_sum

    rng = np.random.default_rng(1)
    k, ns, d = 4096, 100, 81
    seg = np.sort(rng.integers(0, ns, k)).astype(np.int32)
    vals = jnp.asarray(rng.normal(size=(k, d)), jnp.float32)
    plan = plan_sorted_segsum(seg, ns, chunk=512)
    out = sorted_segment_sum(vals, plan)
    ref = jax.ops.segment_sum(vals, jnp.asarray(seg), num_segments=ns)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-6,
                               atol=1e-4)
