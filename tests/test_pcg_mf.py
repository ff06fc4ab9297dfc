"""Whole-PCG matrix-free Pallas kernel (ops/pallas/pcg_mf.py) vs the XLA
run_pcg path, on a small SE3 pose graph (CPU interpret mode).

Reference parity: solver/pcg.hpp:61-232 (PCG loop + implicit
J^T dL P (J p) products)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import graphite_tpu as gt
import graphite_tpu.ops.pallas.pcg_mf as mf_mod
import graphite_tpu.ops.streamreduce as sr_mod
from graphite_tpu.io import g2o, synthetic
from graphite_tpu.preconditioners import BlockJacobiPreconditioner
from graphite_tpu.solvers import PCGSolver


@pytest.fixture
def _force_mf(monkeypatch):
    interp = functools.partial(jax.experimental.pallas.pallas_call,
                               interpret=True)
    monkeypatch.setattr(mf_mod.pl, "pallas_call", interp)
    always = lambda problem, dtype, sharded_ok=False: True  # noqa: E731
    monkeypatch.setattr(sr_mod, "use_pallas", always)
    import graphite_tpu.solvers.pcg as pcg_mod  # noqa: F401
    monkeypatch.delenv("GRAPHITE_TPU_NO_PCG_MF", raising=False)


def _setup(poses=60):
    ds = synthetic.make_sphere_se3(poses, seed=3)
    g, *_ = g2o.build_graph(ds, precision=gt.FP32_FP32)
    problem = g.freeze()
    from graphite_tpu.linearize import linearize

    lin = linearize(problem, problem.params0)
    return problem, lin


@pytest.mark.parametrize("precond", ["bj", "identity"])
def test_pcg_mf_matches_run_pcg(_force_mf, monkeypatch, precond):
    problem, lin = _setup()
    kw = {}
    if precond == "bj":
        kw["preconditioner"] = BlockJacobiPreconditioner()
    solver = PCGSolver(max_iter=8, tol=1e-12, rejection_ratio=1e8, **kw)
    st = solver.prepare(problem, lin)
    damping = jnp.asarray(1e-3, jnp.float32)

    site = mf_mod.plan_pcg_mf(problem, lin)
    assert site is not None, "fused matrix-free PCG site did not engage"
    dx1, ok1 = solver.solve(problem, lin, st, damping, False)

    monkeypatch.setenv("GRAPHITE_TPU_NO_PCG_MF", "1")
    problem2, lin2 = _setup()
    st2 = solver.prepare(problem2, lin2)
    assert mf_mod.plan_pcg_mf(problem2, lin2) is None
    dx2, ok2 = solver.solve(problem2, lin2, st2, damping, False)

    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx2),
                               rtol=2e-4, atol=2e-5)


def test_pcg_mf_infeasible_multitype(_force_mf):
    """BAL problems (two vertex types) must not engage the fused path."""
    from graphite_tpu.io import bal as bal_io
    from graphite_tpu.linearize import linearize

    ds = synthetic.make_bal("mini", seed=0)
    g, *_ = bal_io.build_graph(ds, precision=gt.FP32_FP32)
    problem = g.freeze()
    lin = linearize(problem, problem.params0)
    assert mf_mod.plan_pcg_mf(problem, lin) is None
