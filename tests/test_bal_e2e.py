"""End-to-end bundle adjustment: LM + PCG-Schur converges on synthetic BAL
(the reference's BAL app as integration test, examples/bal.cu)."""

import numpy as np

import graphite_tpu as gt
from graphite_tpu.io import bal as bal_io
from graphite_tpu.io import synthetic
from graphite_tpu.optimizers import (
    LevenbergMarquardtOptions,
    levenberg_marquardt,
)
from graphite_tpu.solvers import PCGSchurSolver
from graphite_tpu.solvers.dense_cholesky_schur import DenseCholeskySchurSolver


def _optimize(solver, name="mini", iters=30, jit_loop=False, precision=None):
    ds = synthetic.make_bal(name, seed=0, noise=0.5)
    g, *_ = bal_io.build_graph(ds, precision=precision or gt.FP64_FP64)
    problem = g.freeze()
    opts = LevenbergMarquardtOptions(iterations=iters, initial_damping=1e-4,
                                     jit_loop=jit_loop)
    return ds, levenberg_marquardt(problem, solver, options=opts)


def test_bal_lm_pcg_schur_converges():
    ds, res = _optimize(
        PCGSchurSolver(max_iter=10, tol=1.0, rejection_ratio=5.0)
    )
    # With obs noise 0.5 the MSE floor is ~noise^2 per residual dim; the
    # initial perturbed chi2 is orders of magnitude higher.
    assert res.chi2 < 0.05 * res.initial_chi2
    assert res.accepted_steps >= 5


def test_bal_lm_dense_schur_matches_pcg():
    _, res_pcg = _optimize(
        PCGSchurSolver(max_iter=200, tol=1e-12, rejection_ratio=1e6)
    )
    _, res_direct = _optimize(DenseCholeskySchurSolver())
    # Same final cost to 1e-6 relative (BASELINE.json criterion).
    np.testing.assert_allclose(res_pcg.chi2, res_direct.chi2, rtol=1e-6)


def test_bal_jit_loop_matches_python_loop():
    _, res_py = _optimize(DenseCholeskySchurSolver(), iters=15)
    _, res_jit = _optimize(DenseCholeskySchurSolver(), iters=15, jit_loop=True)
    np.testing.assert_allclose(res_jit.chi2, res_py.chi2, rtol=1e-10)
    assert res_jit.iterations == res_py.iterations
    # jit_loop observability parity: the lax.scan-captured trace must
    # reproduce the python-loop per-iteration history (VERDICT r2 #8)
    assert len(res_jit.history) == len(res_py.history)
    for hj, hp in zip(res_jit.history, res_py.history):
        assert hj["iteration"] == hp["iteration"]
        assert hj["accepted"] == hp["accepted"]
        np.testing.assert_allclose(hj["chi2"], hp["chi2"], rtol=1e-10)
        np.testing.assert_allclose(hj["chi2_before"], hp["chi2_before"],
                                   rtol=1e-10)
        np.testing.assert_allclose(hj["mu"], hp["mu"], rtol=1e-10)
        np.testing.assert_allclose(hj["rho"], hp["rho"], rtol=1e-10)


def test_bal_fp32_bf16_converges():
    ds, res = _optimize(
        PCGSchurSolver(max_iter=10, tol=1.0, rejection_ratio=5.0),
        precision=gt.FP32_BF16, iters=30,
    )
    assert res.chi2 < 0.10 * res.initial_chi2


def test_bal_file_roundtrip(tmp_path):
    ds = synthetic.make_bal("toy", seed=1)
    path = str(tmp_path / "toy.txt")
    bal_io.save(path, ds)
    ds2 = bal_io.load(path)
    np.testing.assert_allclose(ds2.cameras, ds.cameras, rtol=1e-15)
    np.testing.assert_allclose(ds2.points, ds.points, rtol=1e-15)
    np.testing.assert_array_equal(ds2.cam_idx, ds.cam_idx)
    np.testing.assert_array_equal(ds2.point_idx, ds.point_idx)
    np.testing.assert_allclose(ds2.observations, ds.observations, rtol=1e-15)
