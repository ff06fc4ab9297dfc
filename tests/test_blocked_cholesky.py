"""Blocked on-device Cholesky (VERDICT r1 item 5).

Oracle ladder: factor/solve parity vs NumPy at sizes that exercise every
recursion shape (base-size, odd, non-power-of-two), NaN propagation for
the LM rejected-step contract, and cross-path agreement of the direct
Schur solver's on-device vs host-callback modes
(reference: cudss_schur.hpp:190-233, tests/schur.cu:291-338).
"""

import jax.numpy as jnp
import numpy as np

import graphite_tpu as gt
from graphite_tpu.io import bal as bal_io
from graphite_tpu.io import synthetic
from graphite_tpu.ops.blocked_cholesky import (
    blocked_cho_solve,
    blocked_cholesky,
    cholesky_solve,
)
from graphite_tpu.optimizers import (
    LevenbergMarquardtOptions,
    levenberg_marquardt,
)
from graphite_tpu.solvers.sparse_direct_schur import SparseDirectSchurSolver


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    return A @ A.T + n * np.eye(n)


def test_factor_matches_numpy():
    for n in (7, 64, 65, 130, 300, 513, 1030):
        S = _spd(n)
        L = np.asarray(blocked_cholesky(jnp.asarray(S), base=64))
        np.testing.assert_allclose(L, np.linalg.cholesky(S),
                                   rtol=1e-12, atol=1e-12)
        assert np.allclose(np.triu(L, 1), 0.0)


def test_solve_matches_numpy():
    for n in (65, 300, 1030):
        S = _spd(n, seed=n)
        b = np.random.default_rng(1).standard_normal(n)
        L = blocked_cholesky(jnp.asarray(S), base=64)
        x = np.asarray(blocked_cho_solve(L, jnp.asarray(b), base=64))
        np.testing.assert_allclose(x, np.linalg.solve(S, b), rtol=1e-9)
        x2 = np.asarray(cholesky_solve(jnp.asarray(S), jnp.asarray(b),
                                       base=64))
        np.testing.assert_allclose(x2, x, rtol=1e-12)


def test_non_spd_propagates_nan():
    S = np.eye(300)
    S[200, 200] = -1.0  # indefinite: NaNs must reach the output
    L = np.asarray(blocked_cholesky(jnp.asarray(S), base=64))
    assert not np.isfinite(L).all()


def _optimize(solver, iters=12):
    ds = synthetic.make_bal("mini", seed=0, noise=0.5)
    g, *_ = bal_io.build_graph(ds, precision=gt.FP64_FP64)
    problem = g.freeze()
    opts = LevenbergMarquardtOptions(iterations=iters, initial_damping=1e-4)
    return levenberg_marquardt(problem, solver, options=opts)


def test_direct_schur_on_device_matches_host_callback():
    res_dev = _optimize(SparseDirectSchurSolver())  # on-device blocked chol
    res_host = _optimize(SparseDirectSchurSolver(on_device_dim_p=0))
    np.testing.assert_allclose(res_dev.chi2, res_host.chi2, rtol=1e-8)
    assert res_dev.iterations == res_host.iterations


def test_direct_full_on_device_matches_host_callback():
    """Full-H on-device direct (densify + blocked Cholesky, the cudss
    full-matrix analog, cudss.hpp:53-269) vs the host sparse-LU callback
    — at a size that takes the BLOCKED factorization path (dim_h >= 1024),
    the same path the raised on_device_limit uses at Ladybug scale."""
    from graphite_tpu.solvers.sparse_direct import SparseDirectSolver

    ds = synthetic.make_bal((4, 400, 1400), seed=3, noise=0.5)
    g, *_ = bal_io.build_graph(ds, precision=gt.FP64_FP64)
    problem = g.freeze()
    assert problem.dim_h >= 1024
    opts = LevenbergMarquardtOptions(iterations=8, initial_damping=1e-4)
    res_dev = levenberg_marquardt(
        problem, SparseDirectSolver(on_device=True), options=opts)
    res_host = levenberg_marquardt(
        problem, SparseDirectSolver(on_device=False), options=opts)
    np.testing.assert_allclose(res_dev.chi2, res_host.chi2, rtol=1e-8)
    assert res_dev.iterations == res_host.iterations
