"""Covariance recovery vs a dense NumPy inverse oracle.

Beyond-reference extension (see graphite_tpu/covariance.py); oracle pattern
follows tests/schur.cu's dense-reference ladder: assemble the scaled dense
H in NumPy, invert, unscale with the Jacobi column scales, compare blocks.
"""

import numpy as np
import pytest

import graphite_tpu as gt
from graphite_tpu.covariance import joint_covariance, marginal_covariances
from graphite_tpu.hessian import (
    apply_damping,
    build_hessian_structure,
    compute_hessian_values,
    hessian_to_dense,
)
from graphite_tpu.io import synthetic
from graphite_tpu.io.bal import build_graph
from graphite_tpu.linearize import linearize

from common import CIRCLE_AUTO, COUPLED, POINT2

MU = 1e-2


def _sigma_oracle(problem, lin, damping=0.0):
    """Dense NumPy Sigma = S inv(H_scaled) S over active columns."""
    hs = build_hessian_structure(problem)
    hv = compute_hessian_values(problem, hs, lin)
    if damping:
        hv = apply_damping(problem, hs, hv, lin.diag, damping, False)
    H = hessian_to_dense(problem, hs, hv)
    s = np.asarray(lin.scales, dtype=np.float64)[: problem.dim_h]
    return s[:, None] * np.linalg.inv(H) * s[None, :]


def _cols_of(problem, vname, gid):
    local = problem.host_local_index(vname, gid)
    c0 = int(problem.host.vertex_col_offset[vname][local])
    d = problem.vertex_meta[vname].vtype.dim
    return slice(c0, c0 + d)


def _circle_problem():
    # CIRCLE alone is rank-1 per 2-dof point; COUPLED (invertible 2x2 J)
    # makes the undamped H SPD so damping=0 covariance is well defined.
    g = gt.Graph(precision=gt.FP64_FP64)
    vs = g.add_vertex_set(POINT2)
    pts = [(2.0, 1.0), (-1.5, 2.5), (3.0, -0.5), (0.5, 3.5), (-2.0, -2.0)]
    for i, p in enumerate(pts):
        vs.add(10 + i, np.asarray(p))
    fc = g.add_factor_set(CIRCLE_AUTO)
    fk = g.add_factor_set(COUPLED)
    for i in range(len(pts)):
        fc.add([10 + i], obs=4.0)
        fk.add([10 + i])
    return g.freeze()


def test_dense_marginals_match_numpy_oracle():
    problem = _circle_problem()
    lin = linearize(problem, problem.params0)
    sig = _sigma_oracle(problem, lin)

    targets = [("point2", 10), ("point2", 12), ("point2", 14)]
    out = marginal_covariances(problem, lin, targets, method="dense")
    for t in targets:
        ref = sig[_cols_of(problem, *t), _cols_of(problem, *t)]
        np.testing.assert_allclose(np.asarray(out[t]), ref,
                                   rtol=1e-9, atol=1e-12)


def test_joint_covariance_cross_blocks():
    problem = _circle_problem()
    lin = linearize(problem, problem.params0)
    sig = _sigma_oracle(problem, lin)

    targets = [("point2", 11), ("point2", 13)]
    joint = np.asarray(joint_covariance(problem, lin, targets,
                                        method="dense"))
    a = _cols_of(problem, "point2", 11)
    b = _cols_of(problem, "point2", 13)
    ref = np.block([[sig[a, a], sig[a, b]], [sig[b, a], sig[b, b]]])
    np.testing.assert_allclose(joint, ref, rtol=1e-9, atol=1e-12)


def _bal_problem():
    ds = synthetic.make_bal("toy", seed=0, noise=0.5)
    g, *_ = build_graph(ds, precision=gt.FP64_FP64)
    return g.freeze()


def test_schur_matches_dense_and_oracle_on_ba():
    problem = _bal_problem()
    lin = linearize(problem, problem.params0)
    # toy BA is gauge-deficient undamped; the Tikhonov-regularized inverse
    # (damping, identical augmentation to the LM step) is the well-posed
    # quantity both paths and the oracle agree on.
    sig = _sigma_oracle(problem, lin, damping=MU)

    targets = [("bal_camera", 0), ("bal_camera", 1), ("bal_point", 2),
               ("bal_point", 4)]
    joint_d = np.asarray(joint_covariance(problem, lin, targets,
                                          method="dense", damping=MU))
    joint_s = np.asarray(joint_covariance(problem, lin, targets,
                                          method="schur", damping=MU))
    cols = np.concatenate([
        np.arange(_cols_of(problem, *t).start, _cols_of(problem, *t).stop)
        for t in targets])
    ref = sig[np.ix_(cols, cols)]
    np.testing.assert_allclose(joint_d, ref, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(joint_s, ref, rtol=1e-8, atol=1e-12)

    # marginals are the joint's diagonal blocks (both target types: the
    # schur path exercises pose AND eliminated-landmark back-substitution)
    marg = marginal_covariances(problem, lin, targets, method="schur",
                                damping=MU)
    off = 0
    for t in targets:
        d = problem.vertex_meta[t[0]].vtype.dim
        np.testing.assert_allclose(np.asarray(marg[t]),
                                   ref[off:off + d, off:off + d],
                                   rtol=1e-8, atol=1e-12)
        off += d


def test_auto_method_selection():
    ba = _bal_problem()
    lin = linearize(ba, ba.params0)
    a = joint_covariance(ba, lin, [("bal_camera", 0)], damping=MU)
    b = joint_covariance(ba, lin, [("bal_camera", 0)], method="schur",
                         damping=MU)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)

    circle = _circle_problem()
    with pytest.raises(ValueError, match="eliminated"):
        joint_covariance(circle, linearize(circle, circle.params0),
                         [("point2", 10)], method="schur")


def test_fixed_vertex_rejected():
    g = gt.Graph(precision=gt.FP64_FP64)
    vs = g.add_vertex_set(POINT2)
    vs.add(0, np.array([1.0, 2.0]))
    vs.add(1, np.array([0.5, -1.0]))
    vs.set_fixed(0, True)
    fk = g.add_factor_set(COUPLED)
    fk.add([0])
    fk.add([1])
    problem = g.freeze()
    lin = linearize(problem, problem.params0)
    with pytest.raises(ValueError, match="fixed or inactive"):
        marginal_covariances(problem, lin, [("point2", 0)])
    out = marginal_covariances(problem, lin, [("point2", 1)])
    assert np.asarray(out[("point2", 1)]).shape == (2, 2)
