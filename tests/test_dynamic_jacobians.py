"""Dynamic (storage-free) Jacobian mode.

Reference parity: ``set_jacobian_storage(false)`` makes every matvec
recompute J on the fly instead of materializing it (factor.hpp:632-650,
ops/product.hpp:101-142, ops/linearize.hpp:305-374) — the rematerialization
trade analogous to activation checkpointing."""

import jax.numpy as jnp
import numpy as np

import graphite_tpu as gt
from graphite_tpu.linearize import Jv, JtPv, hessian_matvec, linearize
from graphite_tpu.optimizers import (
    LevenbergMarquardtOptions,
    levenberg_marquardt,
)
from graphite_tpu.preconditioners import IdentityPreconditioner
from graphite_tpu.solvers import PCGSolver

from common import build_circle_graph
from test_lm_circle import PTS


def _problems():
    g1, *_ = build_circle_graph(PTS, fixed_ids=(14,))
    p_stored = g1.freeze()
    g2, vs, fs, _ = build_circle_graph(PTS, fixed_ids=(14,))
    fs.set_jacobian_storage(False)
    p_dynamic = g2.freeze()
    assert p_dynamic.factor_meta["circle_auto"].store_jacobians is False
    return p_stored, p_dynamic


def test_dynamic_matvec_matches_stored():
    ps, pd = _problems()
    lin_s = linearize(ps, ps.params0)
    lin_d = linearize(pd, pd.params0)
    assert lin_d.jacobians["circle_auto"] is None
    np.testing.assert_allclose(np.asarray(lin_d.b), np.asarray(lin_s.b),
                               rtol=1e-12)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=ps.dim_x))
    y_s = hessian_matvec(ps, lin_s, x)
    y_d = hessian_matvec(pd, lin_d, x, params=pd.params0)
    np.testing.assert_allclose(np.asarray(y_d), np.asarray(y_s), rtol=1e-11,
                               atol=1e-13)


def test_dynamic_matvec_requires_params():
    _, pd = _problems()
    lin_d = linearize(pd, pd.params0)
    x = jnp.zeros(pd.dim_x)
    try:
        hessian_matvec(pd, lin_d, x)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "dynamic" in str(e)


def test_dynamic_lm_converges():
    _, pd = _problems()
    solver = PCGSolver(max_iter=50, tol=1e-20, rejection_ratio=10.0,
                       preconditioner=IdentityPreconditioner())
    opts = LevenbergMarquardtOptions(iterations=60, initial_damping=1e-6)
    res = levenberg_marquardt(pd, solver, options=opts)
    assert res.chi2 < res.initial_chi2
    r = np.sqrt((np.asarray(res.params["point2"])[:4] ** 2).sum(axis=1))
    np.testing.assert_allclose(r, 4.0, rtol=1e-6)
