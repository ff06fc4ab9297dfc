"""BA-scale oracles for gradient descent and Adam (VERDICT r1 item 9).

The reference exercises these optimizers through the same graph machinery
as LM (optimizer/gradient_descent.hpp:94-123, optimizer/adam.hpp:104-135);
circle-scale tests alone don't cover the badly-scaled BAL geometry or the
scan-based fused step. Oracles here:

- convergence on a small synthetic BAL problem (chi2 drops by >50x / >20x),
- trajectory identity against a straight-line Python reimplementation of
  the reference update rules (catches scan-carry / bias-correction bugs).
"""

import jax.numpy as jnp
import numpy as np

import graphite_tpu as gt
from graphite_tpu.io import bal as bal_io
from graphite_tpu.io import synthetic
from graphite_tpu.linearize import apply_update, linearize
from graphite_tpu.optimizers import (
    AdamOptions,
    GradientDescentOptions,
    adam,
    gradient_descent,
)


def _problem():
    ds = synthetic.make_bal("mini", seed=0, noise=0.5)
    g, *_ = bal_io.build_graph(ds, precision=gt.FP64_FP64)
    return g.freeze()


def test_gd_converges_on_bal():
    problem = _problem()
    _, hist = gradient_descent(
        problem,
        options=GradientDescentOptions(iterations=100, learning_rate=0.1),
    )
    h = np.asarray(hist)
    assert h[-1] < 0.02 * h[0]
    # With Jacobi scaling, alpha*b is a descent step at this rate for the
    # overwhelming majority of iterations (reference has no line search).
    assert np.mean(np.diff(h) < 0) > 0.9


def test_adam_converges_on_bal():
    problem = _problem()
    _, hist = adam(
        problem, options=AdamOptions(iterations=300, learning_rate=0.3)
    )
    h = np.asarray(hist)
    assert h[-1] < 0.05 * h[0]


def test_gd_trajectory_matches_python_reimplementation():
    """delta_x = alpha * b each iteration (gradient_descent.hpp:94-123)."""
    problem = _problem()
    lr, iters = 0.1, 20
    _, hist = gradient_descent(
        problem,
        options=GradientDescentOptions(iterations=iters, learning_rate=lr),
    )
    p = problem.params0
    ref = []
    for _ in range(iters):
        lin = linearize(problem, p)
        ref.append(float(lin.chi2))
        p = apply_update(problem, p, lin, lr * lin.b)
    np.testing.assert_allclose(np.asarray(hist), np.asarray(ref), rtol=1e-12)


def test_adam_trajectory_matches_python_reimplementation():
    """g = -b, bias-corrected moments, step = -lr*m_hat/(sqrt(v_hat)+eps)
    (adam.hpp:104-135, fused kernel ops/vector.hpp:89-121)."""
    problem = _problem()
    lr, b1, b2, eps, iters = 0.3, 0.9, 0.999, 1e-8, 25
    _, hist = adam(
        problem,
        options=AdamOptions(iterations=iters, learning_rate=lr,
                            beta1=b1, beta2=b2, epsilon=eps),
    )
    p = problem.params0
    m = jnp.zeros(problem.dim_x, dtype=jnp.float64)
    v = jnp.zeros(problem.dim_x, dtype=jnp.float64)
    ref = []
    for t in range(iters):
        lin = linearize(problem, p)
        ref.append(float(lin.chi2))
        g = -lin.b
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        m_hat = m / (1 - b1 ** (t + 1))
        v_hat = v / (1 - b2 ** (t + 1))
        p = apply_update(problem, p, lin,
                         -lr * m_hat / (jnp.sqrt(v_hat) + eps))
    np.testing.assert_allclose(np.asarray(hist), np.asarray(ref), rtol=1e-10)
