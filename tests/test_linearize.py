"""Linearization engine correctness against closed forms and NumPy.

Mirrors the reference's factor tests (tests/factor.cu): residual values,
autodiff-vs-analytic Jacobians, chi2 + Huber reweighting, b accumulation,
scaling, and activity masking.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import graphite_tpu as gt
from graphite_tpu.linearize import linearize, compute_residuals_block

from common import (
    BINARY,
    CIRCLE_AUTO,
    CIRCLE_MANUAL,
    COUPLED,
    HUBER_CIRCLE,
    POINT2,
    build_circle_graph,
)

PTS = np.array([[3.0, 0.5], [0.2, 4.1], [-3.5, 1.0], [1.0, -3.8], [2.5, 2.5]])
R = 4.0


def dense_from_blocks(problem, lin):
    """NumPy dense J / H / b reference from per-factor Jacobian blocks."""
    n = problem.dim_h
    H = np.zeros((n, n))
    b = np.zeros(n)
    for name, fm in problem.factor_meta.items():
        fa = problem.data.factors[name]
        E = fm.ftype.residual_dim
        J = [
            np.asarray(j, dtype=np.float64).reshape(fm.count, E, -1)
            for j in lin.jacobians[name]
        ]
        r = np.asarray(lin.residuals[name], dtype=np.float64)
        dL = np.asarray(lin.chi2_deriv[name], dtype=np.float64)
        P = (
            np.asarray(fa.precision, dtype=np.float64).reshape(
                fm.count, E, E
            )
            if fa.precision is not None
            else np.tile(np.eye(E), (fm.count, 1, 1))
        )
        cols_base = np.asarray(fa.cols_base)
        for f in range(fm.count):
            Jrow = []
            cols = []
            for s, vt in enumerate(fm.ftype.vertex_types):
                Jrow.append(J[s][f])
                base = cols_base[f, s]
                cols.extend(range(base, base + vt.dim))
            Jf = np.concatenate(Jrow, axis=1)  # (E, sum d)
            cols = np.asarray(cols)
            in_range = cols < n
            W = dL[f] * P[f]
            Hf = Jf.T @ W @ Jf
            bf = -Jf.T @ W @ r[f]
            sel = np.ix_(in_range, in_range)
            H[np.ix_(cols[in_range], cols[in_range])] += Hf[sel]
            b[cols[in_range]] += bf[in_range]
    return H, b


def test_residual_values():
    g, vs, fs, _ = build_circle_graph(PTS)
    problem = g.freeze()
    r = compute_residuals_block(problem, problem.params0, "circle_auto")
    expected = (PTS**2).sum(axis=1) - R**2
    np.testing.assert_allclose(np.asarray(r)[:, 0], expected, rtol=1e-12)


def test_autodiff_matches_analytic():
    ga, *_ = build_circle_graph(PTS, manual=False)
    gm, *_ = build_circle_graph(PTS, manual=True)
    pa, pm = ga.freeze(), gm.freeze()
    la, lm_ = linearize(pa, pa.params0), linearize(pm, pm.params0)
    np.testing.assert_allclose(
        np.asarray(la.jacobians["circle_auto"][0]),
        np.asarray(lm_.jacobians["circle_manual"][0]),
        rtol=1e-12,
    )
    np.testing.assert_allclose(np.asarray(la.b), np.asarray(lm_.b), rtol=1e-12)


def test_chi2_identity_precision():
    g, *_ = build_circle_graph(PTS)
    problem = g.freeze()
    lin = linearize(problem, problem.params0)
    expected = (((PTS**2).sum(axis=1) - R**2) ** 2).sum()
    np.testing.assert_allclose(float(lin.chi2), expected, rtol=1e-12)
    np.testing.assert_allclose(
        float(gt.compute_chi2(problem, problem.params0)), expected, rtol=1e-12
    )


def test_chi2_custom_precision():
    g = gt.Graph(precision=gt.FP64_FP64)
    vs = g.add_vertex_set(POINT2)
    vs.add(0, [1.0, 2.0])
    vs.add(1, [0.5, -1.0])
    fs = g.add_factor_set(BINARY)
    P = np.array([[2.0, 0.5], [0.5, 1.0]])
    fs.add([0, 1], obs=[0.1, 0.2], precision=P)
    problem = g.freeze()
    lin = linearize(problem, problem.params0)
    r = np.array([1.0 - 0.5 - 0.1, 2.0 + 1.0 - 0.2])
    np.testing.assert_allclose(float(lin.chi2), r @ P @ r, rtol=1e-12)


def test_huber_loss_values():
    """Closed-form Huber reweighting (reference tests/factor.cu:468-509)."""
    g = gt.Graph(precision=gt.FP64_FP64)
    vs = g.add_vertex_set(POINT2)
    vs.add(0, [3.0, 4.0])  # r = 25 - 4 = 21, chi2_raw = 441
    fs = g.add_factor_set(HUBER_CIRCLE)
    delta = 10.0
    fs.add([0], obs=2.0, loss_param=delta)
    problem = g.freeze()
    lin = linearize(problem, problem.params0)
    raw = 441.0
    assert raw > delta**2
    expected_chi2 = 2 * np.sqrt(raw) * delta - delta**2
    expected_deriv = delta / np.sqrt(raw)
    np.testing.assert_allclose(float(lin.chi2), expected_chi2, rtol=1e-12)
    np.testing.assert_allclose(
        float(lin.chi2_deriv["circle_huber"][0]), expected_deriv, rtol=1e-12
    )
    # b must be reweighted by dL: b = -J^T dL r
    J = np.array([6.0, 8.0])
    s = np.asarray(lin.scales)[:2]
    expected_b = -J * s * expected_deriv * 21.0
    np.testing.assert_allclose(
        np.asarray(lin.b)[:2], expected_b, rtol=1e-12
    )


def test_b_and_diag_match_dense_reference():
    g, *_ = build_circle_graph(PTS, fixed_ids=(14,), disabled=(2,))
    problem = g.freeze()
    lin = linearize(problem, problem.params0)
    H, b = dense_from_blocks(problem, lin)
    np.testing.assert_allclose(np.asarray(lin.b)[: problem.dim_h], b,
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(
        np.asarray(lin.diag)[: problem.dim_h], np.diag(H), rtol=1e-10,
        atol=1e-14,
    )


def test_scales_formula():
    g, *_ = build_circle_graph(PTS, scale=True)
    problem = g.freeze()
    lin = linearize(problem, problem.params0)
    # diag(H_scaled) = diag_raw * s^2, s = 1/(eps + sqrt(diag_raw))
    J = 2.0 * PTS  # (F,2) one factor per point, each owning its own columns
    diag_raw = (J**2).reshape(-1)
    eps = np.finfo(np.float64).eps
    s = 1.0 / (eps + np.sqrt(diag_raw))
    np.testing.assert_allclose(
        np.asarray(lin.scales)[: problem.dim_h], s, rtol=1e-12
    )


def test_fixed_vertex_masked():
    g, *_ = build_circle_graph(PTS, fixed_ids=(14,))
    problem = g.freeze()
    assert problem.dim_h == 8  # 4 active points x 2
    lin = linearize(problem, problem.params0)
    # The fixed vertex's Jacobian block is zeroed.
    J = np.asarray(lin.jacobians["circle_auto"][0])
    fixed_local = 4
    np.testing.assert_array_equal(J[fixed_local], 0.0)
    # chi2 still counts its factor (residual is unaffected by fixing).
    expected = (((PTS**2).sum(axis=1) - R**2) ** 2).sum()
    np.testing.assert_allclose(float(lin.chi2), expected, rtol=1e-12)


def test_inactive_factor_masked():
    g, *_ = build_circle_graph(PTS, disabled=(2,))
    problem = g.freeze()
    lin = linearize(problem, problem.params0)
    J = np.asarray(lin.jacobians["circle_auto"][0])
    np.testing.assert_array_equal(J[2], 0.0)
    # Inactive factor excluded from chi2 (active-only kernel, ops/chi2.hpp).
    resid = (PTS**2).sum(axis=1) - R**2
    expected = (resid**2).sum() - resid[2] ** 2
    np.testing.assert_allclose(float(lin.chi2), expected, rtol=1e-12)
    # Its vertex becomes unreferenced => no Hessian column.
    assert problem.dim_h == 8


def test_level_gating():
    """Optimization levels (active.hpp:11-15): level<=opt_level is active."""
    g, vs, fs, handles = build_circle_graph(PTS)
    fs.set_active(handles[1], 0x2)
    p0 = g.freeze(opt_level=0)
    p2 = g.freeze(opt_level=2)
    assert p0.factor_meta["circle_auto"].n_active == 4
    assert p2.factor_meta["circle_auto"].n_active == 5
    # MSB disables at any level.
    fs.set_active(handles[0], 0x80)
    p3 = g.freeze(opt_level=7)
    assert p3.factor_meta["circle_auto"].n_active == 4


def test_coupled_jacobian_jacfwd():
    g = gt.Graph(precision=gt.FP64_FP64)
    vs = g.add_vertex_set(POINT2)
    vs.add(0, [2.0, 5.0])
    fs = g.add_factor_set(COUPLED)
    fs.add([0])
    problem = g.freeze()
    g.scale_system(False)
    problem = g.freeze()
    lin = linearize(problem, problem.params0)
    J = np.asarray(lin.jacobians["coupled"][0][0]).reshape(2, 2)
    np.testing.assert_allclose(J, [[5.0, 2.0], [1.0, 3.0]], rtol=1e-12)
