"""End-to-end LM on the circle-fit problem (examples/circle.cu as smoke
test, reference CI workflows/testing.yaml:28-29)."""

import numpy as np

import graphite_tpu as gt
from graphite_tpu.optimizers import (
    AdamOptions,
    GradientDescentOptions,
    LevenbergMarquardtOptions,
    adam,
    gradient_descent,
    levenberg_marquardt,
    levenberg_marquardt2,
)
from graphite_tpu.preconditioners import IdentityPreconditioner
from graphite_tpu.solvers import DenseCholeskySolver, PCGSolver

from common import build_circle_graph

RNG = np.random.default_rng(42)
R = 4.0
ANGLES = RNG.uniform(0, 2 * np.pi, size=5)
PTS = np.stack(
    [R * np.cos(ANGLES) + RNG.normal(0, 0.3, 5),
     R * np.sin(ANGLES) + RNG.normal(0, 0.3, 5)], axis=1
)


def radii(params):
    return np.sqrt((np.asarray(params["point2"]) ** 2).sum(axis=1))


def _solve(jit_loop, manual=False, solver=None):
    g, *_ = build_circle_graph(PTS, fixed_ids=(14,), disabled=(2,),
                               manual=manual)
    problem = g.freeze()
    solver = solver or PCGSolver(max_iter=50, tol=1e-20, rejection_ratio=10.0,
                                 preconditioner=IdentityPreconditioner())
    opts = LevenbergMarquardtOptions(iterations=100, initial_damping=1e-6,
                                     jit_loop=jit_loop)
    return problem, levenberg_marquardt(problem, solver, options=opts)


def _check(problem, result):
    # The fixed point's factor stays active, so chi2 converges to that
    # factor's irreducible residual, not zero.
    fixed_resid = (PTS[4] ** 2).sum() - R**2
    floor = fixed_resid**2
    assert result.chi2 < result.initial_chi2
    np.testing.assert_allclose(result.chi2, floor, rtol=1e-6)
    r = radii(result.params)
    # active, non-fixed points land on the circle
    for i in (0, 1, 3):
        np.testing.assert_allclose(r[i], R, rtol=1e-6)
    # fixed point (id 14 -> local 4) and deactivated point 2 unchanged
    np.testing.assert_array_equal(
        np.asarray(result.params["point2"])[4], PTS[4]
    )
    np.testing.assert_array_equal(
        np.asarray(result.params["point2"])[2], PTS[2]
    )


def test_circle_python_loop():
    problem, result = _solve(jit_loop=False)
    _check(problem, result)
    assert result.accepted_steps > 0
    assert len(result.history) > 0


def test_circle_jit_loop():
    problem, result = _solve(jit_loop=True)
    _check(problem, result)


def test_circle_manual_jacobian():
    problem, result = _solve(jit_loop=False, manual=True)
    _check(problem, result)


def test_circle_dense_direct():
    problem, result = _solve(jit_loop=False, solver=DenseCholeskySolver())
    _check(problem, result)


def test_lm2_early_stop():
    g, *_ = build_circle_graph(PTS)
    problem = g.freeze()
    solver = DenseCholeskySolver()
    opts = LevenbergMarquardtOptions(iterations=100, initial_damping=1e-6)
    res = levenberg_marquardt2(problem, solver, options=opts)
    # early stop triggers well before 100 iterations once converged
    assert res.iterations < 100
    assert res.chi2 <= res.initial_chi2


def test_gradient_descent_descends():
    g, *_ = build_circle_graph(PTS)
    problem = g.freeze()
    params, hist = gradient_descent(
        problem, options=GradientDescentOptions(iterations=200,
                                                learning_rate=2e-3)
    )
    chi2 = np.asarray(hist)
    assert chi2[-1] < chi2[0]


def test_adam_descends():
    g, *_ = build_circle_graph(PTS)
    problem = g.freeze()
    params, hist = adam(
        problem, options=AdamOptions(iterations=300, learning_rate=5e-2)
    )
    chi2 = np.asarray(hist)
    assert chi2[-1] < chi2[0]
