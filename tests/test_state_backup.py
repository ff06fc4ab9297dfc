"""Partial-state backup/restore semantics and misc API parity
(reference tests/vertex.cu:299-341 partial State, :343 clear)."""

import jax.numpy as jnp
import numpy as np

import graphite_tpu as gt
from graphite_tpu.linearize import (
    backup_parameters,
    restore_parameters,
)
from graphite_tpu.optimizers import (
    LevenbergMarquardtOptions,
    levenberg_marquardt,
)
from graphite_tpu.solvers import DenseCholeskySolver

from common import CIRCLE_AUTO, POINT2


# Vertex with a partial State: only the FIRST component is backed up, so a
# revert restores x[0] but keeps the current x[1] (reference: when
# State=float only `x` is restored, tests/vertex.cu:299-341).
PARTIAL = gt.vertex_type(
    "partial2", 2,
    save_state=lambda x: x[:1],
    load_state=lambda x, s: x.at[:1].set(s),
)


def test_partial_state_restore():
    g = gt.Graph(precision=gt.FP64_FP64)
    vs = g.add_vertex_set(PARTIAL)
    vs.add(0, [1.0, 2.0])
    ft = gt.factor_type("f", 1, [PARTIAL],
                        lambda p, o: jnp.array([p[0] + p[1] - o]),
                        obs_shape=())
    fs = g.add_factor_set(ft)
    fs.add([0], obs=5.0)
    problem = g.freeze()

    params = problem.params0
    backup = backup_parameters(problem, params)
    moved = {"partial2": jnp.asarray([[10.0, 20.0]])}
    restored = restore_parameters(problem, moved, backup)
    # x[0] restored from backup, x[1] keeps the moved value
    np.testing.assert_allclose(np.asarray(restored["partial2"])[0],
                               [1.0, 20.0])


def test_lm_with_partial_state_still_converges():
    g = gt.Graph(precision=gt.FP64_FP64)
    vs = g.add_vertex_set(POINT2)
    for i in range(4):
        vs.add(i, [3.0 + 0.1 * i, 0.5 * i])
    fs = g.add_factor_set(CIRCLE_AUTO)
    for i in range(4):
        fs.add([i], obs=2.0)
    problem = g.freeze()
    res = levenberg_marquardt(
        problem, DenseCholeskySolver(),
        options=LevenbergMarquardtOptions(iterations=80,
                                          initial_damping=1e-6),
    )
    # NOTE: one 1-D residual per 2-DoF point makes each Gauss-Newton block
    # rank-1 (singular); LM converges to a damped optimum, not machine
    # precision — identical behavior to the reference's circle setup.
    r = np.sqrt((np.asarray(res.params["point2"]) ** 2).sum(axis=1))
    np.testing.assert_allclose(r, 2.0, rtol=5e-3)
    assert res.chi2 < 1e-3


def test_get_vertex_by_global_id():
    g = gt.Graph(precision=gt.FP64_FP64)
    vs = g.add_vertex_set(POINT2)
    vs.add(42, [1.0, 2.0])
    vs.add(7, [3.0, 4.0])
    fs = g.add_factor_set(CIRCLE_AUTO)
    fs.add([42], obs=1.0)
    fs.add([7], obs=1.0)
    problem = g.freeze()
    np.testing.assert_allclose(
        np.asarray(problem.get_vertex(problem.params0, "point2", 7)),
        [3.0, 4.0],
    )


def test_clear():
    g = gt.Graph(precision=gt.FP64_FP64)
    vs = g.add_vertex_set(POINT2)
    vs.add(0, [1.0, 2.0])
    fs = g.add_factor_set(CIRCLE_AUTO)
    fs.add([0], obs=1.0)
    vs.clear()
    fs.clear()
    assert vs.count == 0 and fs.count == 0
    # re-add works and handles restart at 0
    vs.add(0, [5.0, 6.0])
    assert fs.add([0], obs=2.0) == 0


def test_huber_zero_delta_no_nan():
    loss = gt.HuberLoss()
    x = jnp.asarray([0.0, 1.0, 100.0])
    d = jnp.zeros(3)
    assert np.all(np.isfinite(np.asarray(loss.value(x, d))))
    assert np.all(np.isfinite(np.asarray(loss.derivative(x, d))))


def test_checkpoint_roundtrip(tmp_path):
    from graphite_tpu.io import checkpoint

    g = gt.Graph(precision=gt.FP64_FP64)
    vs = g.add_vertex_set(POINT2)
    vs.add(0, [1.5, -2.5])
    fs = g.add_factor_set(CIRCLE_AUTO)
    fs.add([0], obs=1.0)
    problem = g.freeze()
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(path, problem.params0, mu=np.asarray(1e-4), iteration=7)
    params, extra = checkpoint.load(path)
    np.testing.assert_allclose(np.asarray(params["point2"]),
                               np.asarray(problem.params0["point2"]))
    assert float(extra["mu"]) == 1e-4
    assert int(extra["iteration"]) == 7
