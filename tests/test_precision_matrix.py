"""All supported T x S precision policies converge on the same problem
(the reference's CLI combos, examples/bal.cu:311-314: FP64-FP64, FP64-FP32,
FP64-BF16, FP32-FP32, FP32-BF16; plus FP32-FP16)."""

import numpy as np
import pytest

import graphite_tpu as gt
from graphite_tpu.io import bal as bal_io
from graphite_tpu.io import synthetic
from graphite_tpu.optimizers import (
    LevenbergMarquardtOptions,
    levenberg_marquardt,
)
from graphite_tpu.solvers import PCGSchurSolver

# Final-cost tolerance per policy: precision changes LM's accept/reject
# trajectory (the reference notes the same divergence — its chi2 is even
# non-deterministic, levenberg_marquardt.hpp:372), so costs agree only to
# the basin floor, not bitwise.
# (name, policy, rtol_to_fp64_cost or None). Low-precision Jacobian storage
# (bf16/fp16: 8/11-bit mantissa) stalls LM measurably above the fp64 floor
# on tiny problems — those policies assert bounded degradation (< 2x the
# fp64 cost and >= 99% of the initial cost removed) instead of agreement;
# on large problems the gap shrinks (Venice-52: bf16 within 0.5% of f32).
POLICIES = [
    ("fp64-fp64", gt.FP64_FP64, 1e-9),
    ("fp64-fp32", gt.FP64_FP32, 1e-2),
    ("fp64-bf16", gt.FP64_BF16, None),
    ("fp32-fp32", gt.FP32_FP32, 1e-2),
    ("fp32-bf16", gt.FP32_BF16, None),
    ("fp32-fp16", gt.FP32_FP16, None),
]


@pytest.mark.parametrize("name,precision,rtol", POLICIES,
                         ids=[p[0] for p in POLICIES])
def test_policy_converges_to_same_cost(name, precision, rtol):
    ds = synthetic.make_bal("mini", seed=0, noise=0.5)
    g, *_ = bal_io.build_graph(ds, precision=precision)
    problem = g.freeze()
    assert problem.precision.inv_dtype == precision.inv_dtype
    solver = PCGSchurSolver(max_iter=30, tol=1e-10, rejection_ratio=1e6)
    res = levenberg_marquardt(
        problem, solver,
        options=LevenbergMarquardtOptions(iterations=40,
                                          initial_damping=1e-4),
    )
    # fp64-fp64 reference cost computed once
    key = "ref_cost"
    if key not in test_policy_converges_to_same_cost.__dict__:
        g2, *_ = bal_io.build_graph(ds, precision=gt.FP64_FP64)
        p2 = g2.freeze()
        r2 = levenberg_marquardt(
            p2, solver,
            options=LevenbergMarquardtOptions(iterations=40,
                                              initial_damping=1e-4),
        )
        test_policy_converges_to_same_cost.ref_cost = r2.chi2
    ref = test_policy_converges_to_same_cost.ref_cost
    if rtol is None:  # low-precision storage: bounded degradation
        assert res.chi2 < 2.0 * ref, (res.chi2, ref)
        assert res.chi2 < 0.01 * res.initial_chi2
    else:
        np.testing.assert_allclose(res.chi2, ref, rtol=rtol)


def test_inv_dtype_never_low_precision():
    assert gt.FP32_BF16.inv_dtype == gt.FP32_BF16.graph_dtype
    assert gt.FP64_BF16.inv_dtype == gt.FP64_BF16.graph_dtype
    assert gt.FP32_FP16.inv_dtype == gt.FP32_FP16.graph_dtype
    assert gt.FP64_FP32.inv_dtype == gt.FP64_FP32.solver_dtype
